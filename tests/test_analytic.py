"""Analytic Jacobian assembly == colored-AD Jacobian (ops/analytic.py).

The analytic assembler replaces the ~10 colored JVP sweeps with closed-form
stencil algebra; these tests pin it row-for-row against the colored AD
Jacobian (the correctness oracle, itself pinned to dense jacfwd by
test_structured.py) at 1e-12 per-row-relative accuracy in f64, across
chemistries, transport closures, radial schemes, and leading coefficients.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from petlion_tpu.chemistry import LCO, NMC, NMC_LGM50
from petlion_tpu.ops.plan import get_plan
from petlion_tpu.physics import transport
from petlion_tpu.physics.initial_guess import initial_guess
from petlion_tpu.physics.residuals import ModelConfig
from petlion_tpu.solver import control

pytestmark = pytest.mark.fast


def _dense(JS, colored):
    """Reconstruct the (masked) dense physics rows from the compressed form."""
    Jhat = np.asarray(JS)[colored.colors, :].T * colored._mask_body
    return Jhat


def _sample(th, cfg, seed):
    L = cfg.layout
    rng = np.random.default_rng(seed)
    thj = {k: jnp.asarray(float(v), jnp.float64) for k, v in th.items()}
    y = np.asarray(initial_guess(0.52, thj, cfg, jnp.float64)).copy()
    y *= 1.0 + 0.04 * rng.standard_normal(y.shape)
    y[L.sl("Phi_e")] = 0.02 * rng.standard_normal(y[L.sl("Phi_e")].shape)
    y[L.sl("j")] = 2e-6 * rng.standard_normal(y[L.sl("j")].shape)
    y[L.sl("I").start] = 0.9
    return jnp.asarray(y), thj


def _check(theta, numerics, N, seed=0, method="I"):
    cfg = ModelConfig.build(N, numerics)
    plan = get_plan(cfg, theta)
    assert plan.analytic is not None, "analytic assembly not built"
    y, th = _sample(theta, cfg, seed)
    rng = np.random.default_rng(seed + 77)
    c0 = jnp.asarray(rng.uniform(0.2, 40.0), jnp.float64)
    psi = jnp.asarray(1e-3 * rng.standard_normal(y.shape))
    const = psi - c0 * y
    spec = control.ControlSpec(method)
    value = jnp.asarray(0.8, jnp.float64)

    def g(yy):
        return control.full_residual(spec, value, 3.3, yy, c0 * yy + const,
                                     th, cfg)

    JS_c, last_c = plan.colored.compressed(g, y)
    JS_a, last_a = plan.analytic.compressed(3.3, y, c0, th, g)
    Jc = _dense(JS_c, plan.colored)
    Ja = _dense(JS_a, plan.colored)
    np.testing.assert_allclose(np.asarray(last_a), np.asarray(last_c),
                               rtol=1e-12, atol=1e-15)
    for i in range(Jc.shape[0] - 1):
        scale = np.max(np.abs(Jc[i])) + 1e-300
        err = np.max(np.abs(Ja[i] - Jc[i])) / scale
        assert err < 1e-12, (i, err)


def test_lco_default():
    theta, bounds, opts, N, numerics = LCO()
    _check(theta, numerics, N, seed=1)
    _check(theta, numerics, N, seed=2, method="V")


def test_lco_nonlinear_transport():
    theta, bounds, opts, N, numerics = LCO()
    numerics = dataclasses.replace(
        numerics, D_eff=transport.D_eff,
        thermodynamic_factor=transport.thermodynamic_factor)
    _check(theta, numerics, N, seed=3)


def test_lco_spectral():
    theta, bounds, opts, N, numerics = LCO(Fickian_method="spectral")
    _check(theta, numerics, N, seed=4)


def test_lco_film_resistance():
    theta, bounds, opts, N, numerics = LCO()
    theta = dict(theta, R_film_n=5e-4)
    _check(theta, numerics, N, seed=5)


def test_nmc():
    theta, bounds, opts, N, numerics = NMC()
    _check(theta, numerics, N, seed=6)


def test_lgm50_isothermal():
    theta, bounds, opts, N, numerics = NMC_LGM50(temperature=False)
    _check(theta, numerics, N, seed=7)


def test_alg_block_matches_colored():
    """Consistent-init algebraic Jacobian: analytic == colored (via the
    solve they produce on random right-hand sides)."""
    from petlion_tpu.solver import linsolve

    theta, bounds, opts, N, numerics = LCO()
    cfg = ModelConfig.build(N, numerics)
    plan = get_plan(cfg, theta)
    assert plan.analytic is not None
    y, th = _sample(theta, cfg, 11)
    nd = cfg.layout.N_diff
    y_diff, y_alg = y[:nd], y[nd:]
    spec = control.ControlSpec("I")
    value = jnp.asarray(0.8, jnp.float64)
    yp0 = jnp.zeros_like(y)

    def alg_res(ya, yd):
        yy = jnp.concatenate([yd, ya])
        r = control.full_residual(spec, value, 0.0, yy, yp0, th, cfg)
        yp_eff = yp0.at[:nd].set(r[:nd])
        r2 = control.full_residual(spec, value, 0.0, yy, yp_eff, th, cfg)
        return jnp.concatenate([r[nd:-1], r2[-1:]])

    lu_a = plan.factor_alg(alg_res, y_alg, y_diff, th=th)
    analytic_save, plan.analytic = plan.analytic, None
    try:
        lu_c = plan.factor_alg(alg_res, y_alg, y_diff, th=th)
    finally:
        plan.analytic = analytic_save
    rng = np.random.default_rng(0)
    for _ in range(3):
        b = jnp.asarray(rng.standard_normal(y_alg.shape[0]))
        xa = np.asarray(linsolve.equilibrated_inv_solve(lu_a, b))
        xc = np.asarray(linsolve.equilibrated_inv_solve(lu_c, b))
        np.testing.assert_allclose(xa, xc, rtol=1e-9, atol=1e-12)


def test_unsupported_falls_back():
    """Thermal / SEI / quadratic configs must not build an analytic plan."""
    for kw in (dict(temperature=True), dict(aging="SEI"),
               dict(solid_diffusion="quadratic")):
        theta, bounds, opts, N, numerics = LCO(**kw)
        cfg = ModelConfig.build(N, numerics)
        plan = get_plan(cfg, theta)
        assert plan.analytic is None
