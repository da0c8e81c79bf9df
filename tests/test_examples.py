"""Smoke-run the example scripts end-to-end.

The reference's examples/ notebooks are its de-facto integration tests
(SURVEY §4: "example notebooks ... act as de-facto integration/regression
tests with stored outputs"); this runs the ported scripts as subprocesses
so a user-facing breakage in any example is caught by CI, not by a user.
Plot-producing examples write into a tmp cwd.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

# (script, expected substring of stdout)
CASES = [
    ("getting_started.py", "Below min. SOC"),
    ("model_inputs_and_outputs.py", ""),
    ("variable_input_functions.py", ""),
    ("multichip_sweep.py", "completed 512/512"),
]


@pytest.mark.parametrize("script,expect", CASES)
def test_example_runs(script, expect, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(EXAMPLES)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.abspath(EXAMPLES), script)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    if expect:
        assert expect in r.stdout, r.stdout[-2000:]
