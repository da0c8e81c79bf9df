"""Physics residual unit tests (oracle: physical invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from petlion_tpu.chemistry import LCO, NMC, NMC_LGM50
from petlion_tpu.physics.initial_guess import initial_guess
from petlion_tpu.physics.residuals import (ModelConfig, calc_I1C,
                                           residual_core)

pytestmark = pytest.mark.fast


def make_cfg(chem=LCO, **kw):
    theta, bounds, opts, N, numerics = chem(**kw)
    th = {k: jnp.asarray(v, jnp.float64) for k, v in theta.items()}
    return th, ModelConfig.build(N, numerics)


@pytest.mark.parametrize("soc", [0.2, 0.5, 1.0])
def test_equilibrium_residual_is_zero(soc):
    """At open circuit with uniform concentrations, Φ_s=U, Φ_e=0, j=0, I=0,
    every residual row must vanish identically (the guess IS a steady state
    of the isothermal model)."""
    th, cfg = make_cfg()
    y = initial_guess(soc, th, cfg)
    yp = jnp.zeros_like(y)
    r = residual_core(0.0, y, yp, th, cfg)
    assert np.max(np.abs(np.asarray(r))) < 1e-10


def test_equilibrium_thermal_and_variants():
    for kw in (dict(temperature=True), dict(aging="SEI"),
               dict(solid_diffusion="polynomial"),
               dict(solid_diffusion="quadratic")):
        th, cfg = make_cfg(**kw)
        y = initial_guess(1.0, th, cfg)
        r = residual_core(0.0, y, jnp.zeros_like(y), th, cfg)
        assert np.max(np.abs(np.asarray(r))) < 1e-9, kw


def test_equilibrium_other_chemistries():
    for chem in (NMC, NMC_LGM50):
        th, cfg = make_cfg(chem)
        y = initial_guess(1.0, th, cfg)
        r = residual_core(0.0, y, jnp.zeros_like(y), th, cfg)
        assert np.max(np.abs(np.asarray(r))) < 1e-9, chem.__name__


def test_i1c_value():
    """1C current density for the default LCO cell — limiting electrode math
    (auxiliary...jl:631-647). Cross-check with hand calculation."""
    th, cfg = make_cfg()
    I1C = float(calc_I1C(th))
    eps_sp = 1 - 0.025 - 0.385
    eps_sn = 1 - 0.0326 - 0.485
    byhand = 96485.3321233 / 3600 * min(
        eps_sp * 80e-6 * 51554.0 * (0.99174 - 0.49550),
        eps_sn * 88e-6 * 30555.0 * (0.85510 - 0.01429))
    assert abs(I1C - byhand) < 1e-10
    assert 29 < I1C < 31  # ≈ 30 A/m² for this cell


def test_electrolyte_mass_conservation():
    """The FVM electrolyte operator must conserve lithium: with j=0 the
    volume-integrated rhs of c_e is zero for any c_e profile (fluxes
    telescope; zero-flux outer boundaries)."""
    th, cfg = make_cfg()
    L = cfg.layout
    rng = np.random.default_rng(1)
    y = np.array(initial_guess(1.0, th, cfg))
    y[L.sl("c_e")] = 1000.0 + 200.0 * rng.random(30)
    y = jnp.asarray(y)
    r = residual_core(0.0, y, jnp.zeros_like(y), th, cfg)
    # rhs of c_e = r rows (yp=0); undo the 1/eps and weight by eps*h
    from petlion_tpu.physics.residuals import cell_widths_psn
    h = np.asarray(cell_widths_psn(cfg.N, th))
    eps_sp = 1 - 0.025 - 0.385
    eps_sn = 1 - 0.0326 - 0.485
    eps = np.concatenate([np.full(10, 1 - (0.025 + eps_sp)),
                          np.full(10, 0.724),
                          np.full(10, 1 - (0.0326 + eps_sn))])
    rhs = np.asarray(r[L.sl("c_e")])
    total = np.sum(rhs * eps * h)   # d/dt ∫ eps c_e dx
    assert abs(total) < 1e-12 * np.sum(np.abs(rhs * eps * h) + 1e-30)


def test_residual_jacobian_finite_and_structured():
    """jacfwd at the initial guess: finite entries; diff rows depend on yp
    with coefficient -1 (res = rhs - yp)."""
    th, cfg = make_cfg()
    y = initial_guess(1.0, th, cfg)
    yp = jnp.zeros_like(y)
    Jy = jax.jacfwd(lambda yy: residual_core(0.0, yy, yp, th, cfg))(y)
    Jyp = jax.jacfwd(lambda pp: residual_core(0.0, y, pp, th, cfg))(yp)
    assert np.all(np.isfinite(np.asarray(Jy)))
    nd = cfg.layout.N_diff
    # ∂res_diff/∂yp_diff = -I
    np.testing.assert_allclose(np.asarray(Jyp)[:nd, :nd], -np.eye(nd),
                               atol=1e-12)
    # algebraic rows don't involve yp
    assert np.max(np.abs(np.asarray(Jyp)[nd:, :])) == 0.0


def test_vmap_over_theta():
    """Batched θ sweep: residual must vmap over parameter leaves."""
    th, cfg = make_cfg()
    y = initial_guess(1.0, th, cfg)
    yp = jnp.zeros_like(y)

    def r_of_Dsp(D_sp):
        th2 = dict(th)
        th2["D_sp"] = D_sp
        return residual_core(0.0, y, yp, th2, cfg)

    out = jax.vmap(r_of_Dsp)(jnp.array([1e-14, 2e-14, 5e-14]))
    assert out.shape == (3, cfg.layout.N_tot)
    assert np.all(np.isfinite(np.asarray(out)))
