"""Pallas TPU kernel: VMEM-resident blocked Gauss-Jordan inversion.

The XLA version of the blocked GJ (`linsolve.gj_inverse_blocked`) makes one
HBM round-trip over the (B, n, 2n) augmented matrix per block step — ~13
passes for the n≈101 P2D Schur core. This kernel keeps the whole augmented
matrix for a batch tile in VMEM across every block step, so HBM sees exactly
one read of A and one write of A⁻¹, and all eliminations run from VMEM
through the MXU/VPU.

Each grid program inverts the matrices of one batch tile. n is padded to a
multiple of the block size with an identity tail (the inverse restricts).
Pivot-free (callers equilibrate; the P2D core is diagonally dominant).
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

BS = 8  # elimination block width


def _blocks_tile(n: int) -> int:
    """Batch-tile width for stacks of small matrices: bigger tiles amortize
    DMA granularity when n is tiny (a 10x10 block is only 400 B in HBM),
    capped so the augmented VMEM scratch stays small."""
    n_pad = ((n + BS - 1) // BS) * BS
    return max(8, min(64, 512 // n_pad))


def _tiny_gj(blk):
    """Unrolled pivot-free GJ inverse of a (..., BS, BS) block."""
    n = BS
    eye = jnp.broadcast_to(jnp.eye(n, dtype=blk.dtype),
                           blk.shape[:-2] + (n, n))
    M = jnp.concatenate([blk, eye], axis=-1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for k in range(n):
        piv = M[..., k, k]
        row = M[..., k, :] / piv[..., None]
        col = M[..., :, k]
        M = M - col[..., :, None] * row[..., None, :]
        M = jnp.where(rows_i == k, row[..., None, :], M)
    return M[..., :, n:]


def _gj_kernel(a_ref, out_ref, m_ref, *, n_pad: int, tile_b: int):
    nb = n_pad // BS
    # load A | I into the VMEM scratch
    m_ref[:, :, :n_pad] = a_ref[:, :, :]
    eye = jnp.broadcast_to(jnp.eye(n_pad, dtype=a_ref.dtype),
                           (tile_b, n_pad, n_pad))
    m_ref[:, :, n_pad:] = eye
    for kb in range(nb):
        c0 = kb * BS
        rows = m_ref[:, c0:c0 + BS, :]                  # (TB, BS, 2n)
        blk = rows[:, :, c0:c0 + BS]
        inv = _tiny_gj(blk)
        # precision HIGHEST: TPU f32 dots default to bf16 multiplies, which
        # is not enough for an explicit inverse (no residual correction)
        R = jax.lax.dot_general(
            inv, rows, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)         # (TB, BS, 2n)
        C = m_ref[:, :, c0:c0 + BS]                     # (TB, n, BS)
        upd = jax.lax.dot_general(
            C, R, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)         # (TB, n, 2n)
        m_ref[:, :, :] = m_ref[:, :, :] - upd
        m_ref[:, c0:c0 + BS, :] = R
    out_ref[:, :, :] = m_ref[:, :, n_pad:]


def gj_inverse_pallas(A, tile_b: int = 8):
    """A: (B, n, n) f32 → (B, n, n) inverses. B is padded up to a multiple
    of tile_b with identity matrices (their inverses are discarded)."""
    B, n, _ = A.shape
    n_pad = ((n + BS - 1) // BS) * BS
    if n_pad != n:
        Ap = jnp.zeros((B, n_pad, n_pad), A.dtype)
        Ap = Ap.at[:, :n, :n].set(A)
        ar = jnp.arange(n, n_pad)
        Ap = Ap.at[:, ar, ar].set(1.0)
        A = Ap
    B_pad = ((B + tile_b - 1) // tile_b) * tile_b
    if B_pad != B:
        pad = jnp.broadcast_to(jnp.eye(n_pad, dtype=A.dtype),
                               (B_pad - B, n_pad, n_pad))
        A = jnp.concatenate([A, pad], axis=0)
    grid = (B_pad // tile_b,)
    out = pl.pallas_call(
        partial(_gj_kernel, n_pad=n_pad, tile_b=tile_b),
        grid=grid,
        in_specs=[pl.BlockSpec((tile_b, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_b, n_pad, n_pad),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, n_pad, n_pad), A.dtype),
        scratch_shapes=[pltpu.VMEM((tile_b, n_pad, 2 * n_pad), A.dtype)],
    )(A)
    return out[:B, :n, :n]


# ---------------------------------------------------------------------------
# hot-path entry: a single-matrix function whose *vmap* rule collapses the
# whole cell batch into one pallas_call — this is how the kernel plugs into
# the vmapped BDF loop (linsolve.equilibrated_inv_factor) without the caller
# knowing about batching.
# ---------------------------------------------------------------------------

if HAVE_PALLAS:
    from jax.custom_batching import custom_vmap as _custom_vmap

    @_custom_vmap
    def gj_inverse_hot(A):
        """(n, n) → (n, n) inverse; batches fuse into one VMEM-resident
        kernel under vmap."""
        return gj_inverse_pallas(A[None])[0]

    @gj_inverse_hot.def_vmap
    def _gj_inverse_hot_vmap(axis_size, in_batched, A):
        (a_batched,) = in_batched
        if not a_batched:  # pragma: no cover
            A = jnp.broadcast_to(A, (axis_size,) + A.shape)
        return gj_inverse_pallas(A), True

    @_custom_vmap
    def gj_inverse_hot_blocks(A):
        """(m, n, n) → (m, n, n) block inverses; under vmap the whole
        (B, m, n, n) stack collapses into ONE VMEM-resident kernel over
        B·m matrices — the factorization's per-group inverses (particle
        blocks, c_e block, nested-level blocks) all route here so each is
        a single HBM read + write instead of n scalar-GJ passes."""
        m, n = A.shape[0], A.shape[1]
        return gj_inverse_pallas(A.reshape(m, n, n), tile_b=_blocks_tile(n))

    @gj_inverse_hot_blocks.def_vmap
    def _gj_inverse_hot_blocks_vmap(axis_size, in_batched, A):
        (a_batched,) = in_batched
        if not a_batched:  # pragma: no cover
            A = jnp.broadcast_to(A, (axis_size,) + A.shape)
        B, m, n = A.shape[0], A.shape[1], A.shape[2]
        inv = gj_inverse_pallas(A.reshape(B * m, n, n), tile_b=_blocks_tile(n))
        return inv.reshape(B, m, n, n), True
else:  # pragma: no cover
    gj_inverse_hot = None
    gj_inverse_hot_blocks = None
