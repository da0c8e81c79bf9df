"""End-to-end simulation tests against the reference's recorded outputs.

Golden oracles come from PETLION.jl's stored artifacts:
- examples/getting_started.ipynb: LCO 1C discharge → exit "Below min. SOC"
  at 1.0 hr, final V 2.9357 (at reltol=1e-3; our converged value is 2.9411)
- README.md:20-36: thermal CC-CT-CV fast charge → 1865.61 s simulated,
  final 0.1959C, 4.1 V, 25.6963 °C, SOC 1.0, exit "Above max. SOC"

Plus the intended test assertions from the reference's (commented-out)
test/runtests.jl:10-51.
"""

import numpy as np
import pytest

import petlion_tpu as pt


@pytest.fixture(scope="module")
def p_iso():
    return pt.petlion(pt.LCO)


@pytest.fixture(scope="module")
def p_therm():
    return pt.petlion(pt.LCO, temperature=True)


@pytest.mark.fast
def test_1c_discharge_golden(p_iso):
    sol = pt.simulate(p_iso, I=-1, SOC=1)
    assert sol.final_exit_reason() == "Below min. SOC"
    # 1C from SOC=1 to SOC=0 must take exactly one hour
    assert abs(sol.t[-1] - 3600.0) < 1.0
    assert abs(sol.SOC[-1]) < 1e-6
    # final V: reference records 2.9357 at reltol 1e-3 (IDA); allow 1%
    assert abs(sol.V[-1] - 2.9357) / 2.9357 < 0.01
    # voltage is monotonically... not strictly, but decreasing overall
    assert sol.V[0] > 4.0 and sol.V[-1] < 3.0


@pytest.mark.fast
def test_1c_discharge_jac_reuse(p_iso):
    """IDA-style Jacobian reuse (jac_reuse=6: factor once per chunk, stale-
    matrix Newton damped by cjratio) must reproduce the golden within
    integration tolerance. Default is 0 (refactor each attempt) — measured
    faster on TPU where the Schur factorization is MXU-cheap — but the
    reuse path must stay correct for the configs where it wins."""
    sol = pt.simulate(p_iso, I=-1, SOC=1, fast_solver=True, jac_reuse=6)
    assert sol.final_exit_reason() == "Below min. SOC"
    assert abs(sol.t[-1] - 3600.0) < 1.0
    assert abs(sol.V[-1] - 2.9357) / 2.9357 < 0.01


@pytest.mark.fast
def test_1c_discharge_ida_step_control(p_iso):
    """IDA-style step-growth hysteresis (step_control="ida": grow only when
    the estimate clears 2x, hold h in [1,2) — Sundials IDACompleteStep)
    must reproduce the golden, with fewer rejected attempts than the greedy
    policy (the motivation: ~26% of round-4 solver work was rejections)."""
    sol = pt.simulate(p_iso, I=-1, SOC=1, step_control="ida")
    assert sol.final_exit_reason() == "Below min. SOC"
    assert abs(sol.t[-1] - 3600.0) < 1.0
    assert abs(sol.V[-1] - 2.9357) / 2.9357 < 0.01


def test_cc_ct_cv_protocol_golden(p_therm):
    """README.md:20-36 — the flagship correctness trace."""
    sol = pt.simulate(p_therm, I=4, SOC=0, V_max=4.1, T_max=40 + 273.15,
                      outputs=("t", "V", "T"))
    assert sol.final_exit_reason() == "Above max. temperature"
    sol = pt.simulate_cont(sol, p_therm, dT="hold", V_max=4.1)
    assert sol.final_exit_reason() == "Above max. voltage"
    sol = pt.simulate_cont(sol, p_therm, V="hold")
    assert sol.final_exit_reason() == "Above max. SOC"
    assert [r.method for r in sol.results] == ["I", "dT", "V"]

    assert abs(sol.t[-1] - 1865.61) / 1865.61 < 0.005      # 0.23% observed
    # our tolerance-converged final I is 0.19989 (rtol 1e-6 == 1e-3 to 5
    # digits); the reference's recorded 0.1959 is its own tolerance-level
    # value, 2.0% away — hence the 2.5% band around the reference number
    assert abs(sol.I[-1] - 0.1959) / 0.1959 < 0.025
    assert abs(sol.V[-1] - 4.1) < 1e-3
    assert abs(sol.SOC[-1] - 1.0) < 1e-3
    from petlion_tpu.solver.events import _mean_T
    Tm = float(_mean_T(np.asarray(sol.Y_final)[p_therm.layout.sl("T")],
                       p_therm._theta_dev(), p_therm.cfg))
    assert abs(Tm - (25.6963 + 273.15)) < 0.1               # 2 mK observed


def test_cc_ct_cv_protocol_f32(p_therm):
    """The flagship protocol must run in single precision (the TPU dtype).

    Round-1 failure mode: ulp(313 K) ≈ 3e-5 K quantization noise in the
    thermal stencils broke the dT-hold re-initialization at t≈354 s. Fixed by
    carrying T − T_amb in the state (residuals.build_auxiliary)."""
    import jax.numpy as jnp
    kw = dict(dtype=jnp.float32, abstol=5e-4, reltol=1e-3,
              outputs=("t", "V", "I"))
    sol = pt.simulate(p_therm, I=4, SOC=0, V_max=4.1, T_max=313.15, **kw)
    assert sol.final_exit_reason() == "Above max. temperature"
    sol = pt.simulate_cont(sol, p_therm, dT="hold", V_max=4.1, **kw)
    assert sol.final_exit_reason() == "Above max. voltage"
    sol = pt.simulate_cont(sol, p_therm, V="hold", **kw)
    assert sol.final_exit_reason() == "Above max. SOC"
    # vs the f64 tolerance-converged trajectory (1861.4 s, I=0.1999). The f32
    # trajectory reaches SOC=1 up to ~1% later in t; the CV taper
    # (dI/I ≈ -dt/443 s here) turns that into ~4-5% lower exit current, so
    # the I band is the t band amplified by the taper slope.
    assert abs(sol.t[-1] - 1861.4) / 1861.4 < 0.01
    assert abs(sol.I[-1] - 0.1999) / 0.1999 < 0.06
    assert abs(sol.V[-1] - 4.1) < 1e-3
    assert abs(sol.SOC[-1] - 1.0) < 1e-3


def test_constant_vs_function_input_equal(p_iso):
    """runtests.jl:38-39: I=1 must equal I=(t)->1."""
    import jax.numpy as jnp
    s1 = pt.simulate(p_iso, 600.0, I=-1, SOC=1)
    s2 = pt.simulate(p_iso, 600.0, I=lambda t: -1.0, SOC=1)
    np.testing.assert_allclose(s1.V[-1], s2.V[-1], rtol=1e-8)
    np.testing.assert_allclose(s1.t[-1], s2.t[-1], rtol=1e-8)


def test_function_input_differs_from_constant(p_iso):
    """runtests.jl:32-35: I=1 vs I=cos(t) give different results."""
    import jax.numpy as jnp
    s1 = pt.simulate(p_iso, 600.0, I=-1, SOC=1)
    s2 = pt.simulate(p_iso, 600.0, I=lambda t: -jnp.cos(2 * jnp.pi * t / 600),
                     SOC=1)
    assert abs(s1.V[-1] - s2.V[-1]) > 1e-3
    assert abs(s1.SOC[-1] - s2.SOC[-1]) > 1e-2


@pytest.mark.fast
def test_constant_voltage_and_power(p_iso):
    """runtests.jl:20-26 exercise V= and P= runs."""
    sV = pt.simulate(p_iso, 600.0, V=3.5, SOC=0.5)
    assert sV.final_exit_reason() == "Final time reached"
    assert abs(sV.V[-1] - 3.5) < 1e-6
    sP = pt.simulate(p_iso, 600.0, P=-10.0, SOC=0.5)
    assert abs(sP.P[-1] + 10.0) < 1e-6


def test_cc_cv_hold_and_I_min_stop(p_iso):
    """runtests.jl:41-48: hold across runs; I_min stop clamps final current;
    power continuity across the run boundary."""
    sol = pt.simulate(p_iso, I=2, SOC=0, V_max=4.1, outputs=("t", "V"))
    assert sol.final_exit_reason() == "Above max. voltage"
    sol = pt.simulate_cont(sol, p_iso, V="hold", I_min=0.05, SOC_max=1.0)
    # either the taper reaches I_min or SOC tops out; with I_min=0.05 the
    # reference's analogous run ends at |I| ≈ 0.05
    if sol.final_exit_reason() == "Below min. C-rate":
        assert abs(sol.I[-1] - 0.05) < 5e-3
    # power continuity across boundary (reference asserts ≈ between segments).
    # With dense-output (BDF-polynomial) event localization the jump is
    # ~1e-4 at default tolerances (linear back-interp, the reference
    # semantics, gave 6e-3)
    r0, r1 = sol.results[0], sol.results[1]
    P_end_0 = sol.P[r0.run_index][-1]
    P_start_1 = sol.P[r1.run_index][0]
    np.testing.assert_allclose(P_end_0, P_start_1, rtol=1e-3)


def test_outputs_all(p_iso):
    """runtests.jl:29: outputs=:all yields a populated solution."""
    sol = pt.simulate(p_iso, 60.0, I=-1, SOC=1, outputs=("all",))
    for k in ("t", "V", "I", "P", "SOC", "c_e", "c_s_avg", "j", "Phi_e",
              "Phi_s", "Y", "YP"):
        assert k in sol.arrays and len(sol.arrays[k]) > 1, k


def test_rest_run(p_iso):
    sol = pt.simulate(p_iso, I=-1, SOC=1)
    sol = pt.simulate_cont(sol, p_iso, 900.0, I="rest")
    assert sol.final_exit_reason() == "Final time reached"
    assert abs(sol.I[-1]) < 1e-10
    # voltage relaxes upward toward OCV after discharge
    r = sol.results[-1].run_index
    assert sol.V[r][-1] > sol.V[r][0]


def test_eta_plating_control(p_iso):
    """η_p (plating overpotential) control mode runs."""
    sol = pt.simulate(p_iso, 60.0, eta_p=0.05, SOC=0.5)
    assert sol.final_exit_reason() == "Final time reached"
    L = p_iso.layout
    eta = L.eta_plating(np.asarray(sol.Y_final))
    assert abs(eta - 0.05) < 1e-6


def test_initial_states_roundtrip(p_iso):
    """initial_states= starts from an explicit state vector
    (model_evaluation.jl:102-110)."""
    s1 = pt.simulate(p_iso, 600.0, I=-1, SOC=1, outputs=("t", "V", "Y"))
    y_mid = s1.arrays["Y"][len(s1.t) // 2]
    s2 = pt.simulate(p_iso, 60.0, I=-1, initial_states=y_mid)
    assert s2.final_exit_reason() == "Final time reached"
    assert abs(s2.V[0] - s1.V[len(s1.t) // 2]) < 1e-6


def test_tolerance_convergence(p_iso):
    """Tightening tolerances converges the final voltage (self-consistency
    oracle for integrator accuracy)."""
    v = {}
    for rtol, atol in ((1e-3, 1e-6), (1e-6, 1e-8), (1e-8, 1e-10)):
        sol = pt.simulate(p_iso, I=-1, SOC=1, reltol=rtol, abstol=atol)
        v[rtol] = sol.V[-1]
    # final-point V sits on the steep end-of-discharge cliff; dense-output
    # event localization makes the final point solver-order accurate
    # (observed: 5.1e-5 and 6.4e-8)
    assert abs(v[1e-3] - v[1e-8]) < 2e-4
    assert abs(v[1e-6] - v[1e-8]) < 1e-6
