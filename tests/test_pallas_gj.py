"""Pallas blocked-GJ kernel test (runs in interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.fast


def test_pallas_gj_interpret_matches_xla():
    from petlion_tpu.ops import pallas_gj
    from petlion_tpu.solver import linsolve
    if not pallas_gj.HAVE_PALLAS:
        pytest.skip("pallas unavailable")

    import functools
    from jax.experimental import pallas as pl

    # run the kernel in interpreter mode on CPU by monkeypatching pallas_call
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        rng = np.random.default_rng(0)
        outs, refs = [], []
        for B, n in ((8, 37), (5, 71)):   # B=5 exercises batch padding
            A = jnp.asarray(rng.standard_normal((B, n, n)) + 20 * np.eye(n))
            A = A.astype(jnp.float32)
            outs.append(pallas_gj.gj_inverse_pallas(A))
            refs.append((A, np.linalg.inv(np.asarray(A, np.float64))))
    finally:
        pl.pallas_call = orig
    for out, (A, ref) in zip(outs, refs):
        n = A.shape[-1]
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
        resid = np.abs(np.asarray(A, np.float64) @ np.asarray(out, np.float64)
                       - np.eye(n)).max()
        assert resid < 1e-3


def test_pallas_gj_blocks_vmap_collapses():
    """The (m, n, n) block-stack entry under vmap must equal per-matrix
    inverses — covering the factorization's group/nested-level routing
    (particles n=10 exercise the 16-pad path, c_e n=30 the 32-pad path)."""
    from petlion_tpu.ops import pallas_gj
    if not pallas_gj.HAVE_PALLAS:
        pytest.skip("pallas unavailable")

    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        rng = np.random.default_rng(3)
        for B, m, n in ((6, 20, 10), (4, 1, 30), (5, 2, 20)):
            A = jnp.asarray(
                rng.standard_normal((B, m, n, n)) + 15 * np.eye(n),
                jnp.float32)
            out = jax.vmap(pallas_gj.gj_inverse_hot_blocks)(A)
            ref = np.linalg.inv(np.asarray(A, np.float64))
            np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
    finally:
        pl.pallas_call = orig
