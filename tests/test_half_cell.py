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
    with pytest.raises(ValueError, match="does not support aging"):
        pt.petlion(pt.LCO, anode="Li_metal", aging="SEI")


# ---------------------------------------------------------------------------
# thermal half-cell (round 3): the foil is a boundary heat source on the
# (a,p,s,z) grid — residuals._res_T. No reference counterpart exists (the
# reference's half-cell is never runnable at all); oracles are invariants.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def p_hct():
    return pt.petlion(pt.LCO, anode="Li_metal", temperature=True)


def test_thermal_layout(p_hct):
    """T lives on (a,p,s,z): no anode-section temperature states."""
    L = p_hct.layout
    s = L.sl("T")
    assert s.stop - s.start == (p_hct.N.a + p_hct.N.p + p_hct.N.s
                                + p_hct.N.z)
    assert L.sl("T", "n").stop - L.sl("T", "n").start == 0


def test_thermal_discharge_heats_up(p_hct):
    """1C thermal discharge completes; the cell warms monotonically in the
    mean (all heat sources are positive on discharge) and stays warmer with
    convective cooling OFF (h_cell=0, adiabatic) than with the default."""
    sol = pt.simulate(p_hct, 1800.0, I=-1, SOC=1.0, outputs=("t", "V", "T"))
    assert sol.final_exit_reason() in ("Final time reached", "Below min. SOC")
    T_mean = np.asarray(sol.T).mean(axis=1)
    assert T_mean[-1] > T_mean[0] + 0.05          # it actually heats
    # entropic heat can be transiently negative — no strict monotonicity,
    # but no save-to-save drop should exceed 0.05 K at 1C
    assert np.all(np.diff(T_mean) > -0.05)

    p_ad = pt.petlion(pt.LCO, anode="Li_metal", temperature=True)
    p_ad.theta["h_cell"] = 0.0
    sol_ad = pt.simulate(p_ad, 1800.0, I=-1, SOC=1.0,
                         outputs=("t", "V", "T"))
    assert np.asarray(sol_ad.T)[-1].mean() > T_mean[-1] + 0.01


def test_thermal_energy_balance_adiabatic():
    """Adiabatic global energy balance (the defining invariant of the
    thermal PDE): m_th·d⟨T⟩/dt = ∫Q dx, where the generated heat over a
    short window equals the electrical dissipation I_density·(OCV_surf − V)
    + entropic heat to leading order. Here we assert the integral form
    computed from the solver's own heat-generation kernel: the
    thickness-weighted mean T̃ rise matches ∫(ΣQ)dt/Σ(ρCp·h) along the
    trajectory to <1% — a discretization-exact identity apart from time
    integration of the saved trace."""
    import jax.numpy as jnp
    from petlion_tpu.physics import residuals as res
    p = pt.petlion(pt.LCO, anode="Li_metal", temperature=True)
    p.theta["h_cell"] = 0.0
    sol = pt.simulate(p, 900.0, I=-1, SOC=1.0, outputs=("all",))
    th = p._theta_dev()
    cfg = p.cfg
    h = np.asarray(res.cell_widths_thermal(cfg.N, th, True))
    N = cfg.N
    rho_cp = np.concatenate([
        np.full(N.a, p.theta["rho_a"] * p.theta["Cp_a"]),
        np.full(N.p, p.theta["rho_p"] * p.theta["Cp_p"]),
        np.full(N.s, p.theta["rho_s"] * p.theta["Cp_s"]),
        np.full(N.z, p.theta["rho_z"] * p.theta["Cp_z"])])
    Y = np.asarray(sol.Y)
    t = np.asarray(sol.t)
    L = cfg.layout

    def total_Q(y):
        # recorded Y carries absolute T; the solver state carries T − T_amb
        y = np.asarray(y).copy()
        y[L.sl("T")] -= float(p.theta["T_amb"])
        aux = res.build_auxiliary(0.0, jnp.asarray(y), th, cfg)
        Q_rev, Q_rxn, Q_ohm = res._heat_generation(aux, th, cfg)
        q = np.asarray(Q_rev + Q_rxn + Q_ohm).copy()
        # foil interfacial heat (added inside _res_T, mirrored here)
        eta_foil = -float(aux["Phi_e"][-1])
        i_z0 = N.a + N.p + N.s
        q[i_z0] += -float(aux["I_density"]) * eta_foil / h[i_z0]
        return float(np.sum(q * h))

    Q_t = np.array([total_Q(Y[k]) for k in range(len(t))])
    heat_in = np.trapezoid(Q_t, t)                   # J/m²
    E_stored = np.sum(rho_cp * h * (Y[-1, L.sl("T")] - Y[0, L.sl("T")]))
    assert heat_in > 0
    assert abs(E_stored - heat_in) / heat_in < 0.01


def test_thermal_fast_solver_matches_dense(p_hct):
    s_fast = pt.simulate(p_hct, 600.0, I=-1, SOC=1.0, fast_solver=True)
    s_dense = pt.simulate(p_hct, 600.0, I=-1, SOC=1.0, fast_solver=False)
    np.testing.assert_allclose(s_fast.V[-1], s_dense.V[-1], rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_fast.Y_final[p_hct.layout.sl("T")]),
        np.asarray(s_dense.Y_final[p_hct.layout.sl("T")]), atol=1e-8)
