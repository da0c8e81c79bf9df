"""Stress-driven LAM aging (aging="stress") tests.

The reference names this mode and ships its θ (params.jl:701
`aging = :stress, # unused`; m_LAM/β_LAM at params.jl:785-786; E/ν/Ω/σ_crit
in the LGM50 tables) but implements no physics — so the oracles here are the
model's own invariants:
- ε_s states exist, start at the BOL active-material fraction;
- ε_s is monotonically non-increasing (LAM only destroys material);
- β_LAM = 0 reproduces the no-aging trajectory exactly;
- cycling with LAM loses capacity (same-voltage-window discharge shortens).
"""

import numpy as np
import pytest

import petlion_tpu as pt

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def p_lam():
    return pt.petlion(pt.NMC_LGM50, aging="stress", temperature=False)


def test_layout_and_initial_guess(p_lam):
    L = p_lam.layout
    assert "eps_s" in L
    s = L.sl("eps_s")
    assert s.stop - s.start == p_lam.N.p + p_lam.N.n
    import jax.numpy as jnp
    from petlion_tpu.physics.initial_guess import initial_guess
    y0 = initial_guess(0.5, p_lam._theta_dev(), p_lam.cfg, jnp.float64)
    eps0_p = 1.0 - (p_lam.theta["eps_fp"] + p_lam.theta["eps_p"])
    np.testing.assert_allclose(np.asarray(y0[L.sl("eps_s", "p")]), eps0_p)


def test_eps_s_monotone_nonincreasing(p_lam):
    # amplify the LAM rate so a single 600 s pulse shows measurable loss —
    # 105× amplified: strong loss (Δε_s ≈ 0.6) with the run still completing
    # (at ≥3e-4 the active material is driven to ~0 and the solver rightly
    # fails; the exit-reason assertion below guards against silently
    # validating such a truncated trajectory)
    p_lam.theta["beta_LAM"] = 2e-4
    sol = pt.simulate(p_lam, 600.0, I=-2, SOC=1.0,
                      outputs=("t", "V", "eps_s"))
    assert sol.final_exit_reason() == "Final time reached"
    eps = np.asarray(sol.arrays["eps_s"])
    assert eps.shape[1] == p_lam.N.p + p_lam.N.n
    assert np.all(np.diff(eps, axis=0) <= 1e-12)
    assert eps[-1].min() < eps[0].max() - 0.1   # strong loss actually happened
    # the ε_s>0 rate gate keeps the fraction physical even amplified
    assert eps.min() >= -1e-6
    p_lam.theta["beta_LAM"] = 1.9e-6


def test_zero_beta_matches_no_aging(p_lam):
    # the physics is identical at β=0, but the 20 extra ε_s states change
    # the wRMS error-norm denominator → a slightly different adaptive-step
    # sequence; trajectories agree to integration tolerance, not bit-exactly
    p_plain = pt.petlion(pt.NMC_LGM50, temperature=False)
    p_lam.theta["beta_LAM"] = 0.0
    s_lam = pt.simulate(p_lam, 600.0, I=-1, SOC=1.0)
    s_ref = pt.simulate(p_plain, 600.0, I=-1, SOC=1.0)
    np.testing.assert_allclose(s_lam.V[-1], s_ref.V[-1], rtol=1e-4)
    p_lam.theta["beta_LAM"] = 1.9e-6


def test_missing_theta_message():
    with pytest.raises(ValueError, match="stress-driven LAM"):
        pt.petlion(pt.LCO, aging="stress")


def test_spectral_volume_weights_exact():
    """Clenshaw–Curtis weights reproduce the analytic moments of
    c̄ = 3∫₀¹ c ρ² dρ on the Chebyshev grid (storage order)."""
    from petlion_tpu.physics.residuals import (
        _spectral_volume_weights_np, cheb_matrix)
    for n_r in (6, 10, 16):
        w = _spectral_volume_weights_np(n_r)
        _, x = cheb_matrix(n_r)
        rho = ((x + 1.0) / 2.0)[::-1]
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-14)
        np.testing.assert_allclose(w @ rho**2, 3.0 / 5.0, atol=1e-12)
        np.testing.assert_allclose(w @ rho**4, 3.0 / 7.0, rtol=2e-4)


def test_spectral_stress_lam_matches_fdm():
    """aging='stress' on the spectral radial grid agrees with the FDM grid
    (both resolve the same surface stress physics; schemes converge to the
    same trajectory)."""
    p_fdm = pt.petlion(pt.NMC_LGM50, aging="stress", temperature=False)
    p_sp = pt.petlion(pt.NMC_LGM50, aging="stress", temperature=False,
                      Fickian_method="spectral")
    for q in (p_fdm, p_sp):
        q.theta["beta_LAM"] = 5e-5      # amplified so loss is measurable,
                                        # mild enough that both runs complete
    s_fdm = pt.simulate(p_fdm, 600.0, I=-1, SOC=1.0,
                        outputs=("t", "V", "eps_s"))
    s_sp = pt.simulate(p_sp, 600.0, I=-1, SOC=1.0,
                       outputs=("t", "V", "eps_s"))
    assert s_fdm.final_exit_reason() == "Final time reached"
    assert s_sp.final_exit_reason() == "Final time reached"
    np.testing.assert_allclose(s_sp.V[-1], s_fdm.V[-1], rtol=2e-3)
    loss_fdm = (np.asarray(s_fdm.arrays["eps_s"])[0]
                - np.asarray(s_fdm.arrays["eps_s"])[-1])
    loss_sp = (np.asarray(s_sp.arrays["eps_s"])[0]
               - np.asarray(s_sp.arrays["eps_s"])[-1])
    assert loss_sp.max() > 0
    np.testing.assert_allclose(loss_sp.max(), loss_fdm.max(), rtol=0.1)
