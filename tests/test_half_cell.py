"""Half-cell (lithium-foil anode) tests.

The reference defines Li_metal θ values and a `lithium_foil` marker
(params.jl:854-922, structures.jl:24, checks.jl:391) but never wires a
half-cell system, so there is no reference trace to match; the oracles here
are physical invariants of the configuration itself:
- the state vector has no anode-domain states (foil = separator boundary);
- a 1C discharge from SOC 1 to 0 takes exactly one hour (cathode-limited);
- at rest the cell voltage equals the cathode OCV vs Li/Li⁺ (Φ_foil ≡ 0);
- the structured (Schur) solver path matches the dense path.
"""

import numpy as np
import pytest

import petlion_tpu as pt

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def p_hc():
    return pt.petlion(pt.LCO, anode="Li_metal")


def test_layout_has_no_anode_states(p_hc):
    L = p_hc.layout
    assert p_hc.cfg.half_cell
    # 20 c_e + 100 c_s_p differential; 10 j + 20 Φ_e + 10 Φ_s + 1 I algebraic
    assert (L.N_tot, L.N_diff, L.N_alg) == (161, 120, 41)
    for name in ("c_s_avg", "j", "Phi_s"):
        s = L.sl(name, "n")
        assert s.stop - s.start == 0, name


def test_rest_state_is_equilibrium(p_hc):
    """The initial guess at zero current solves the algebraic system exactly."""
    import jax.numpy as jnp
    from petlion_tpu.physics.initial_guess import initial_guess
    from petlion_tpu.physics.residuals import residual_core
    th = p_hc._theta_dev()
    y0 = initial_guess(0.5, th, p_hc.cfg, jnp.float64)
    r = residual_core(0.0, y0, jnp.zeros_like(y0), th, p_hc.cfg)
    L = p_hc.layout
    assert float(jnp.max(jnp.abs(r[L.N_diff:-1]))) < 1e-10


def test_1c_discharge_is_one_hour(p_hc):
    """Coulomb counting: the 1C rate is cathode-limited by construction."""
    sol = pt.simulate(p_hc, I=-1, SOC=1.0)
    assert sol.final_exit_reason() == "Below min. SOC"
    assert abs(sol.t[-1] - 3600.0) < 2.0
    assert sol.V[0] > sol.V[-1]


def test_rest_voltage_equals_cathode_ocv(p_hc):
    """V = Φ_s_p(0) − Φ_foil → at rest V = U_p vs Li/Li⁺ (the defining
    property of a half-cell)."""
    import jax.numpy as jnp
    from petlion_tpu.physics import ocv
    sol = pt.simulate(p_hc, 600.0, I=-1, SOC=1.0)
    sol = pt.simulate_cont(sol, p_hc, 3600.0, I="rest")
    y = np.asarray(sol.Y_final)
    L = p_hc.layout
    c_s_p = y[L.sl("c_s_avg", "p")].reshape(p_hc.N.p, p_hc.N.r_p)
    theta_p = c_s_p.mean(axis=1) / p_hc.theta["c_max_p"]
    th = p_hc._theta_dev()
    U_p = np.asarray(ocv.OCV_LCO(jnp.asarray(theta_p), 298.15, th)[0])
    assert abs(sol.V[-1] - U_p.mean()) < 5e-3


def test_fast_solver_matches_dense(p_hc):
    s_fast = pt.simulate(p_hc, 600.0, I=-1, SOC=1.0, fast_solver=True)
    s_dense = pt.simulate(p_hc, 600.0, I=-1, SOC=1.0, fast_solver=False)
    np.testing.assert_allclose(s_fast.V[-1], s_dense.V[-1], rtol=1e-8)


def test_validation_errors():
    with pytest.raises(ValueError, match="does not support temperature"):
        pt.petlion(pt.LCO, anode="Li_metal", temperature=True)
    with pytest.raises(ValueError, match="does not support aging"):
        pt.petlion(pt.LCO, anode="Li_metal", aging="SEI")
