"""Direct unit tests of the structured (multi-group + nested) Schur
factorization against the dense pivoted LU on REAL Newton matrices.

The end-to-end goldens exercise this path implicitly; these tests pin the
linear algebra itself: for each model family, factor_compressed's solve must
match numpy's pivoted dense solve of the same matrix to near machine
precision (f64). Covers the round-3 nested in-core elimination (j, then
Φ_s — core 71 -> 31 on the default mesh; see ops/structured.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import petlion_tpu as pt
from petlion_tpu.ops.plan import get_plan
from petlion_tpu.physics.initial_guess import initial_guess
from petlion_tpu.solver import control as ctrl

pytestmark = pytest.mark.fast


def _newton_solve_err(p, seed=0, soc=0.7, i_val=-1.0, t=100.0):
    """Relative error of plan.solve vs numpy dense solve at a realistic
    Newton state, plus the plan for structural assertions."""
    plan = get_plan(p.cfg, p.theta)
    cfg = p.cfg
    dtype = jnp.float64
    th = {k: jnp.asarray(float(v), dtype) for k, v in p.theta.items()}
    spec = ctrl.ControlSpec("I")
    value = jnp.asarray(i_val, dtype)

    rng = np.random.default_rng(seed)
    y = np.asarray(initial_guess(soc, th, cfg, dtype)).copy()
    y *= 1.0 + 0.02 * rng.standard_normal(y.shape)
    L = cfg.layout
    y[L.sl("Phi_e")] = 0.01 * rng.standard_normal(y[L.sl("Phi_e")].shape)
    y[L.sl("j")] = 1e-6 * rng.standard_normal(y[L.sl("j")].shape)
    y[L.sl("I").start] = i_val
    y = jnp.asarray(y, dtype)
    yp = jnp.asarray(1e-3 * rng.standard_normal(y.shape), dtype)
    c0 = jnp.asarray(1.3, dtype)
    const = yp - c0 * y

    def g(yy):
        return ctrl.full_residual(spec, value, t, yy, c0 * yy + const,
                                  th, cfg)

    J = np.asarray(plan.colored(g, y))
    fac = jax.jit(lambda yy: plan.factor_compressed(g, yy))(y)
    _LAST_FAC_TYPE[0] = type(fac).__name__
    b = jnp.asarray(rng.standard_normal(y.shape), dtype)
    x = np.asarray(plan.solve(fac, b))
    x_ref = np.linalg.solve(J, np.asarray(b))
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    return err, plan


_LAST_FAC_TYPE = [None]   # factor-type probe for the fused-route test


import contextlib
import os


@contextlib.contextmanager
def _nested_on():
    """Opt into the nested in-core elimination (default OFF since r04 —
    measured 3-4% slower on hardware, measurements_r04/ab_head_n0.log)
    with a fresh plan cache, restoring both on exit."""
    from petlion_tpu.ops import plan as planmod
    old = os.environ.get("PETLION_NESTED")
    os.environ["PETLION_NESTED"] = "1"
    planmod._PLAN_CACHE.clear()
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("PETLION_NESTED", None)
        else:
            os.environ["PETLION_NESTED"] = old
        planmod._PLAN_CACHE.clear()


def test_nested_specs_opt_in():
    """LCO isothermal with PETLION_NESTED=1: groups eliminate c_s+c_e
    (core 301->71), nested levels eliminate j then Φ_s (71->51->31)."""
    with _nested_on():
        p = pt.petlion(pt.LCO)
        plan = get_plan(p.cfg, p.theta)
    cspecs, spec_D, nested, pinfo = plan._specs
    assert len(plan.split.i_core) == 71
    assert len(nested) == 2
    e0, r0 = nested[0]
    e1, r1 = nested[1]
    assert len(e0) == 20 and len(r0) == 51   # j out
    assert len(e1) == 20 and len(r1) == 31   # Phi_s out
    # the control row stays in the final core
    assert plan.split.i_core[r0[r1[-1]]] == p.cfg.layout.N_tot - 1


@pytest.mark.parametrize("kw", [
    dict(),                                   # LCO isothermal
    dict(temperature=True),                   # thermal (T joins the core)
    dict(aging="SEI"),                        # j_s joins the core
    dict(chem="NMC_LGM50", aging="stress"),   # eps_s states (LGM50 θ)
    dict(anode="Li_metal"),                   # half-cell
    dict(anode="Li_metal", temperature=True),  # thermal half-cell (round 3)
    dict(solid_diffusion="polynomial"),       # 1x1 particle blocks + Q
])
def test_schur_solve_matches_dense_lu(kw):
    # bound: the raw P2D Newton matrix has cond ~1e8-1e9 (c_s rows ~5e4 vs
    # j rows ~1e-5), so numpy's unequilibrated solve itself carries
    # ~cond*eps ≈ 1e-8; the measured discrepancy is 8.2e-9 IDENTICALLY for
    # nested levels off/j/both — i.e. it is the reference's own error floor,
    # not elimination-induced
    kw = dict(kw)
    chem = getattr(pt, kw.pop("chem", "LCO"))
    p = pt.petlion(chem, **kw)
    err, _ = _newton_solve_err(p)
    assert err < 1e-7, err


def test_schur_solve_nmc():
    p = pt.petlion(pt.NMC)
    err, _ = _newton_solve_err(p, seed=3, soc=0.55)
    assert err < 1e-7, err


def test_perm_info_opt_in():
    """The fused-kernel permutation must cover the core exactly, with the
    level sizes matching the nested specs and the control row landing in
    the final (unpermuted-last) core block."""
    with _nested_on():
        p = pt.petlion(pt.LCO)
        plan = get_plan(p.cfg, p.theta)
    _, _, nested, pinfo = plan._specs
    perm, sizes = pinfo
    n_core = len(plan.split.i_core)
    assert sorted(perm.tolist()) == list(range(n_core))
    assert sizes == (20, 20)
    # control row (core position n_core-1) must stay in the final block
    assert int(np.nonzero(perm == n_core - 1)[0][0]) >= sum(sizes)


def test_fused_dchain_matches_xla_path():
    """Force the Pallas D-chain route (interpret mode) and pin the full
    factor+solve against the XLA nested path and the dense numpy LU on a
    real Newton matrix — the fused kernel is exact block algebra, so f64
    agreement must be at the same error floor as the XLA path."""
    from petlion_tpu.ops import pallas_schur
    from petlion_tpu.solver import linsolve
    if not pallas_schur.HAVE_PALLAS:
        pytest.skip("pallas unavailable")

    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    from petlion_tpu.ops import plan as planmod

    from petlion_tpu.ops import structured

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        with _nested_on(), \
             mock.patch.object(linsolve, "_use_pallas_gj",
                               lambda J, min_n=17: J.ndim == 2
                               and J.shape[-1] >= min_n), \
             mock.patch.object(structured, "_PALLAS_DCHAIN", True):
            p = pt.petlion(pt.LCO)
            err, plan = _newton_solve_err(p, seed=5)
            # the forced route must actually have produced the fused type
            assert _LAST_FAC_TYPE[0] == "SparseSchurP"
            assert err < 1e-7, err
    finally:
        pl.pallas_call = orig
        planmod._PLAN_CACHE.clear()
