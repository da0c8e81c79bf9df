"""Shared setup for the examples: repo path + CPU/f64 defaults."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def setup(cpu=True, x64=True):
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)
