"""Test configuration: CPU backend with a virtual 8-device mesh + float64.

Correctness oracles run in f64 on CPU (TPU f32 is the performance path and is
exercised separately by bench.py / TPU-marked tests).

Note: the environment's sitecustomize registers a TPU ("axon") PJRT plugin at
interpreter startup and forces jax_platforms="axon,cpu", so plain env vars are
not enough — we override the config after import, before any backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags +
                               " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
