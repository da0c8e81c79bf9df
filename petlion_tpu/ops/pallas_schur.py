"""Pallas TPU kernel: fused nested-elimination chain of the Schur core.

After the level-1 group eliminations assemble the dense Schur core D
(71×71 on the default LCO mesh), the XLA path eliminates the j and Φ_s
families sequentially (ops/structured.py `sparse_schur_factor`): two
equilibrated 20×20 inverses, four batched matmuls, two Schur updates and
the final core inverse — each a separate XLA op streaming the (B, n, n)
stacks through HBM (~10 round-trips per factorization).

This kernel runs the WHOLE chain for a batch tile inside VMEM: HBM sees
one read of D and one write of the factorization pieces. The core is
consumed in *permuted* coordinates (levels first, final core last —
`make_sparse_specs` precomputes the permutation) so every level split is
a contiguous slice. Cell-major tiles: matmuls hit the MXU via batched
`dot_general`; the per-level inverses use the same pivot-free equilibrated
Gauss-Jordan as the XLA path (numerically identical algorithm).

Reference par: this plays KLU's supernodal elimination role on the P2D
arrowhead core (model_evaluation.jl:271, scalar_residual.jl:489-507).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas is TPU-only in this environment; import lazily/safely
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TB = 16  # batch tile (cells per grid program)


def _bdot(a, b):
    """Batched (TB, m, k) @ (TB, k, n) at full f32 precision (TPU f32 dots
    default to bf16 multiplies — not enough for elimination algebra)."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype)


def _gj_pair(M, n):
    """Unrolled pivot-free GJ — same update order as linsolve.gj_inverse
    (callers equilibrate first), but run on TWO lockstep (..., n, n) stacks
    (the matrix and the inverse accumulator) instead of one augmented
    (..., n, 2n) matrix: Mosaic rejects minor-dim concatenates on shapes
    whose trailing dims are not tile-aligned ("result/input offset mismatch
    on non-concat dimension" for 20→40). The elementwise updates are
    bit-identical to the augmented form."""
    E = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for k in range(n):
        piv = M[..., k, k]
        rowM = M[..., k, :] / piv[..., None]
        rowE = E[..., k, :] / piv[..., None]
        col = M[..., :, k]
        M = M - col[..., :, None] * rowM[..., None, :]
        E = E - col[..., :, None] * rowE[..., None, :]
        M = jnp.where(rows_i == k, rowM[..., None, :], M)
        E = jnp.where(rows_i == k, rowE[..., None, :], E)
    return E


def _inv_equil(A, n):
    """Row/col-equilibrated explicit inverse with scalings folded back
    (matches structured._equilibrated_inv numerics)."""
    colA = jnp.maximum(jnp.max(jnp.abs(A), axis=-2), 1e-30)
    As = A / colA[..., None, :]
    rowA = jnp.maximum(jnp.max(jnp.abs(As), axis=-1), 1e-30)
    As = As / rowA[..., :, None]
    inv_s = _gj_pair(As, n)
    return inv_s / colA[..., :, None] / rowA[..., None, :]


def _dchain_kernel(d_ref, *out_refs, sizes: tuple, n: int):
    """sizes = per-level eliminated widths; the final core is what's left.
    Outputs per level: invA, AinvB, C; then the folded core inverse."""
    D = d_ref[:, :, :]
    it = iter(out_refs)
    off = n
    for nk in sizes:
        A = D[:, :nk, :nk]
        B = D[:, :nk, nk:]
        C = D[:, nk:, :nk]
        invA = _inv_equil(A, nk)
        AinvB = _bdot(invA, B)
        D = D[:, nk:, nk:] - _bdot(C, AinvB)
        next(it)[:, :, :] = invA
        next(it)[:, :, :] = AinvB
        next(it)[:, :, :] = C
        off -= nk
    next(it)[:, :, :] = _inv_equil(D, off)


def dchain_pallas(D, sizes: tuple):
    """D: (B, n, n) permuted core stacks → per-level (invA, AinvB, C)
    triples + folded core inverse, all (B, ...). B pads to a TB multiple
    with identity matrices (their factors are discarded)."""
    B, n, _ = D.shape
    B_pad = ((B + TB - 1) // TB) * TB
    if B_pad != B:
        pad = jnp.broadcast_to(jnp.eye(n, dtype=D.dtype),
                               (B_pad - B, n, n))
        D = jnp.concatenate([D, pad], axis=0)
    shapes = []
    rest = n
    for nk in sizes:
        rest_k = rest - nk
        shapes += [(nk, nk), (nk, rest_k), (rest_k, nk)]
        rest = rest_k
    shapes.append((rest, rest))
    grid = (B_pad // TB,)

    def spec(shape):
        return pl.BlockSpec((TB,) + shape, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        partial(_dchain_kernel, sizes=sizes, n=n),
        grid=grid,
        in_specs=[spec((n, n))],
        out_specs=tuple(spec(s) for s in shapes),
        out_shape=tuple(jax.ShapeDtypeStruct((B_pad,) + s, D.dtype)
                        for s in shapes),
    )(D)
    return tuple(o[:B] for o in outs)


if HAVE_PALLAS:
    from jax.custom_batching import custom_vmap as _custom_vmap

    def make_dchain_hot(sizes: tuple):
        """(n, n) → chain factors; batches fuse into one VMEM-resident
        kernel under vmap (the hot-path entry, like gj_inverse_hot)."""
        sizes = tuple(int(s) for s in sizes)

        @_custom_vmap
        def dchain_hot(Dp):
            return tuple(o[0] for o in dchain_pallas(Dp[None], sizes))

        @dchain_hot.def_vmap
        def _dchain_hot_vmap(axis_size, in_batched, Dp):
            (d_batched,) = in_batched
            if not d_batched:  # pragma: no cover
                Dp = jnp.broadcast_to(Dp, (axis_size,) + Dp.shape)
            outs = dchain_pallas(Dp, sizes)
            return outs, tuple(True for _ in outs)

        return dchain_hot
else:  # pragma: no cover
    def make_dchain_hot(sizes):
        return None
