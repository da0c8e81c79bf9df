"""Trace-level fidelity vs a stored converged oracle (BASELINE target #1).

The oracle (tests/data/oracle_lco_1c.npz, built by tools/make_oracle.py) is
a CPU-f64 rtol=1e-8/abstol=1e-10 LCO 1C discharge evaluated on a fixed
512-point grid. Every comparison here is POINTWISE over the whole trace
(max-over-trace error), not an endpoint check — a run whose accepted-step
V(t) deviates anywhere fails. The reference trace itself cannot be
regenerated without Julia (oracle source: examples/getting_started.ipynb
recorded outputs); `test_tolerance_order` establishes the self-oracle is
converged by showing the solver's trace error contracts with rtol down to
the 1e-6 BASELINE criterion.
"""

import os

import numpy as np
import pytest

import petlion_tpu as pt

pytestmark = pytest.mark.fast

ORACLE = os.path.join(os.path.dirname(__file__), "data", "oracle_lco_1c.npz")


@pytest.fixture(scope="module")
def oracle():
    assert os.path.exists(ORACLE), "run tools/make_oracle.py"
    return np.load(ORACLE)


@pytest.fixture(scope="module")
def p():
    return pt.petlion(pt.LCO)


def _trace_err(sol, oracle, key="V"):
    """Max-over-trace relative error of a saved quantity on the oracle grid."""
    dense = sol(oracle["t"])
    ref = oracle[key]
    got = dense.V if key == "V" else dense.arrays[key]
    return float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12)))


def test_default_tolerance_trace(p, oracle):
    """The default-tolerance f64 run tracks the converged oracle pointwise —
    V(t) and c_e(x, t) everywhere, not just the endpoint."""
    sol = pt.simulate(p, I=-1, SOC=1, outputs=("t", "V", "c_e", "c_s_avg"),
                      max_save=2048)
    assert sol.final_exit_reason() == "Below min. SOC"
    assert _trace_err(sol, oracle, "V") < 1e-3
    assert _trace_err(sol, oracle, "c_e") < 5e-3
    # c_s_avg carries the largest default-tolerance discretization error
    # (measured 5.3e-3 at rtol=1e-3, contracting to 1.0e-3 at rtol=1e-4 —
    # genuine solver convergence, so the bound is 10x rtol)
    assert _trace_err(sol, oracle, "c_s_avg") < 1e-2
    # exit time converged to the oracle's
    assert abs(sol.t[-1] - float(oracle["t_end"])) < 1.0


def test_tolerance_order(p, oracle):
    """Tightening rtol contracts the max-over-trace V error down to the
    1e-6 BASELINE fidelity criterion (trace matches 'within solver
    tolerance')."""
    errs = {}
    for rtol in (1e-3, 1e-4, 1e-5, 1e-6):
        sol = pt.simulate(p, I=-1, SOC=1, outputs=("t", "V"),
                          reltol=rtol, abstol=rtol * 1e-2, max_save=8192)
        assert sol.final_exit_reason() == "Below min. SOC"
        assert not sol.results[-1].truncated
        errs[rtol] = _trace_err(sol, oracle, "V")
    # monotone contraction, and each error within a small multiple of rtol
    assert errs[1e-4] < errs[1e-3]
    assert errs[1e-6] < errs[1e-4]
    for rtol, e in errs.items():
        assert e < 50 * rtol, (rtol, errs)
    # the 1e-6 run matches the oracle at trace level to ~1e-5 or better
    assert errs[1e-6] < 1e-5, errs


def test_fd_vs_spectral_trace(p, oracle):
    """The Chebyshev-spectral radial scheme agrees with the FD scheme
    POINTWISE over the whole discharge (both converge to the same
    trajectory; scheme discretization error dominates)."""
    psp = pt.petlion(pt.LCO, Fickian_method="spectral")
    sol = pt.simulate(psp, I=-1, SOC=1, outputs=("t", "V"), max_save=2048)
    assert sol.final_exit_reason() == "Below min. SOC"
    assert _trace_err(sol, oracle, "V") < 5e-3


def test_f32_trace(p, oracle):
    """The f32 (TPU-native dtype) path tracks the f64 oracle pointwise to a
    few mV over the full discharge."""
    import jax.numpy as jnp
    sol = pt.simulate(p, I=-1, SOC=1, outputs=("t", "V"),
                      abstol=1e-3, reltol=1e-3, dtype=jnp.float32,
                      max_save=2048)
    assert sol.final_exit_reason() == "Below min. SOC"
    dense = sol(oracle["t"])
    assert float(np.max(np.abs(dense.V - oracle["V"]))) < 8e-3  # volts
