"""Smoke-run ALL example scripts end-to-end.

The reference's examples/ notebooks are its de-facto integration tests
(SURVEY §4: "example notebooks ... act as de-facto integration/regression
tests with stored outputs"); this runs the ported scripts as subprocesses
so a user-facing breakage in any example is caught by CI, not by a user.
Plot-producing examples write into a tmp cwd. Every script in examples/
must appear in exactly one tier below (test_all_examples_covered enforces).
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

# (script, expected substring of stdout)
FAST_CASES = [
    ("getting_started.py", "Below min. SOC"),
    ("model_inputs_and_outputs.py", ""),
    ("variable_input_functions.py", ""),
    ("multichip_sweep.py", "completed 512/512"),
    ("cc_cv.py", "exit reasons:"),
    ("gitt.py", "saved gitt_V.png"),
]

# multi-minute scripts (thermal protocol search / Gauss-Newton fit loops)
SLOW_CASES = [
    ("fast_charging_cc_ct_cv.py", ""),
    ("parameter_estimation.py", "fitted="),
    ("updating_parameters.py", "batched sweep"),
]


def _run_example(script, expect, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(EXAMPLES)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.abspath(EXAMPLES), script)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    if expect:
        assert expect in r.stdout, r.stdout[-2000:]


@pytest.mark.parametrize("script,expect", FAST_CASES)
def test_example_runs(script, expect, tmp_path):
    _run_example(script, expect, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("script,expect", SLOW_CASES)
def test_example_runs_slow(script, expect, tmp_path):
    _run_example(script, expect, tmp_path)


def test_all_examples_covered():
    scripts = {f for f in os.listdir(EXAMPLES)
               if f.endswith(".py") and not f.startswith("_")}
    covered = {s for s, _ in FAST_CASES} | {s for s, _ in SLOW_CASES}
    assert scripts == covered, (
        f"uncovered examples: {scripts - covered}; "
        f"stale cases: {covered - scripts}")
