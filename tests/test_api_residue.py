"""API-surface parity & failure-path surfacing tests (round-3 items).

Covers: deprecated-name aliases (reference PETLION.jl:65-80), reset_t
(save_outputs.jl:57-58), calc_OCV / calc_R_internal accessors
(scalar_residual.jl:74-165), max_save overflow surfaced as `truncated`,
maxiters exhaustion surfaced as a solver failure, and the cubic-Hermite
Y-interpolation path.
"""

import warnings

import numpy as np
import pytest

import petlion_tpu as pt

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def p():
    return pt.petlion(pt.LCO)


def test_deprecated_aliases_importable():
    # the reference keeps these importable with deprecation shims
    assert pt.Params is pt.petlion
    assert pt.run_model is pt.simulate
    assert pt.run_model_cont is pt.simulate_cont
    assert pt.options_model is pt.SimOptions
    assert pt.model_output is pt.Solution
    assert pt.boundary_stop_conditions is pt.Bounds
    assert pt.options_simulation is pt.SimOptions
    assert pt.discretizations_per_section is pt.Discretizations


def test_reset_t(p):
    sol = pt.simulate(p, 100.0, I=-1, SOC=1)
    sol = pt.simulate_cont(sol, p, 100.0, I="rest")
    t1 = sol.t.copy()
    assert t1[0] == 0.0
    # shift the whole solution and reset it back
    sol.arrays["t"] = sol.arrays["t"] + 50.0
    out = pt.reset_t(sol)
    assert out is sol
    np.testing.assert_allclose(sol.t, t1, atol=1e-12)
    assert sol.t[0] == 0.0


def test_calc_R_internal(p):
    sol = pt.simulate(p, 600.0, I=-1, SOC=1, outputs=("t", "V"))
    y = sol.Y_final
    U_p, U_n = pt.calc_OCV(y, p)
    assert U_p.shape == (p.N.p,) and U_n.shape == (p.N.n,)
    R = float(pt.calc_R_internal(y, p))
    # plausible apparent internal resistance for the LCO cell: the 1C
    # overpotential V − OCV is tens of mV at ~30 A/m²
    assert 1e-4 < R < 1e-1
    # consistency: R ≈ |V − OCV| / |I·I1C|
    V = p.layout.V(y)
    I = p.layout.I(y) * p.I1C
    np.testing.assert_allclose(R, abs((V - (U_p[0] - U_n[-1])) / I),
                               rtol=1e-12)


def test_max_save_overflow_surfaced(p):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sol = pt.simulate(p, 600.0, I=-1, SOC=1, max_save=4)
    assert sol.results[-1].truncated
    assert any("max_save" in str(x.message) for x in w)
    # the solver itself was unaffected: the run still completed
    assert sol.final_exit_reason() == "Final time reached"
    assert sol.t[-1] == pytest.approx(600.0, abs=1e-6)
    # and a roomy buffer does not set the flag
    sol2 = pt.simulate(p, 600.0, I=-1, SOC=1)
    assert not sol2.results[-1].truncated


def test_maxiters_exhaustion_surfaced(p):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sol = pt.simulate(p, 3600.0, I=-1, SOC=1, maxiters=5)
    assert sol.results[-1].flag == -2
    assert sol.final_exit_reason() == "Solver failure"
    assert any("solver failure" in str(x.message) for x in w)
    assert sol.t[-1] < 3600.0


def test_hermite_Y_interpolation(p):
    """sol(t) uses cubic Hermite on Y when YP is saved: the interpolated Y
    must be at least as accurate as the spline path against a dense rerun."""
    sol = pt.simulate(p, 600.0, I=-1, SOC=1, outputs=("all",))
    assert "Y" in sol.arrays and "YP" in sol.arrays
    tq = np.linspace(30.0, 570.0, 17)
    out = sol(tq)
    # oracle: tight-tolerance run evaluated through its own saved points
    ref = pt.simulate(p, list(tq), I=-1, SOC=1, outputs=("all",),
                      reltol=1e-7, abstol=1e-9)
    # bounded by the default-tolerance run's own trajectory error (reltol
    # 1e-3), not the interpolation order
    err = np.max(np.abs(out.arrays["Y"] - ref.arrays["Y"])
                 / (1.0 + np.abs(ref.arrays["Y"])))
    assert err < 5e-3
    # V (spline path) also agrees
    err_V = np.max(np.abs(out.V - ref.V))
    assert err_V < 5e-3
    # the Hermite interpolant reproduces the saved knots exactly
    out_k = sol(sol.t[3:6])
    np.testing.assert_allclose(out_k.arrays["Y"], sol.arrays["Y"][3:6],
                               rtol=0, atol=1e-10)
    # and beats the spline on the same data (both vs the tight oracle)
    from petlion_tpu.utils.interp import spline_interp
    y_sp = spline_interp(sol.t, sol.arrays["Y"], tq)
    err_sp = np.max(np.abs(y_sp - ref.arrays["Y"])
                    / (1.0 + np.abs(ref.arrays["Y"])))
    assert err <= err_sp * 1.5


def test_model_repr_structured(p):
    """Model repr carries the reference's information set (structures.jl:
    496-566): electrodes+closures, options, capacity+limiting electrode,
    active bounds, node points."""
    r = repr(p)
    for frag in ("Cathode: LCO", "Anode:   LiC6", "rxn_BV", "OCV_LCO",
                 "---Options---", "Temperature:     False",
                 "Solid diffusion: Fickian, finite_difference",
                 "Aging:           None",
                 "Total capacity:", "-limited",
                 "---Node Points---", "Pos. electrode:", "Neg. particles:",
                 "N_tot=301"):
        assert frag in r, frag
    # isothermal repr shows no tab node rows; thermal does
    assert "Pos. tab" not in r
    rth = repr(pt.petlion(pt.LCO, temperature=True))
    assert "Pos. tab" in rth and "Neg. tab" in rth
    # bounds render with units when set
    assert "V]" in r or "V users" not in r


def test_verbose_run_header(p, capsys):
    """verbose=True prints a start-of-run header (reference prints the run
    object before solve!, model_evaluation.jl:73-74) and the final summary."""
    pt.simulate(p, 50.0, I=-1, SOC=1, verbose=True)
    out = capsys.readouterr().out
    assert "Run for I = -1C" in out
    assert "SOC 1.0000" in out
    # the end-of-run solution summary still prints after it
    assert "PETLION" in out
