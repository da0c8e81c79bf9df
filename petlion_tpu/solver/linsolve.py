"""Linear-solver backends for the Newton iterations.

Replaces the reference's KLU/UMFPACK sparse LU (scalar_residual.jl:489-507,
model_evaluation.jl:417-428). The P2D Jacobian is small (N_tot ≈ 301) and
block-structured; the default backend is a batched dense LU (fine on one
TensorCore and fully vmappable). Structured backends that exploit the
"arrowhead + block-banded + per-particle dense" sparsity live in
petlion_tpu.ops and plug in through the same (factor, solve) pair.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def dense_factor(J):
    return jax.scipy.linalg.lu_factor(J)


def dense_solve(lu, b):
    return jax.scipy.linalg.lu_solve(lu, b)


def equilibrated_factor(J):
    """Row/column-equilibrated dense LU.

    The P2D Jacobian mixes magnitudes from c_s (~5e4) down to j (~1e-5), a
    condition-number killer in f32 (the TPU-native dtype). Scaling rows and
    columns to unit max-norm before factorization keeps the f32 LU accurate;
    in f64 it is practically free insurance. This replaces the reference's
    reliance on KLU's internal scaling (scalar_residual.jl:489-499).
    """
    col = jnp.maximum(jnp.max(jnp.abs(J), axis=0), 1e-30)
    Jc = J / col[None, :]
    row = jnp.maximum(jnp.max(jnp.abs(Jc), axis=1), 1e-30)
    Js = Jc / row[:, None]
    return (jax.scipy.linalg.lu_factor(Js), row, col)


def equilibrated_solve(fac, b):
    lu, row, col = fac
    return jax.scipy.linalg.lu_solve(lu, b / row) / col


def gj_inverse(A):
    """Explicit inverse by pivot-free Gauss-Jordan with a static trip count.

    TPU-first design: `lax.linalg.lu` + triangular solves lower to long
    sequential pivoting loops that batch terribly on TPU; Gauss-Jordan is n
    fused rank-1 updates on the full (batched) matrix, and once the inverse
    is materialized every Newton solve is a single MXU matmul. Pivot-free is
    safe here because callers equilibrate first and the P2D Newton matrix is
    strongly diagonally dominant (same assumption KLU exploits with its
    static pivot ordering in the reference).
    """
    n = A.shape[-1]
    M = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape[:-2] + (n, n))],
        axis=-1)

    def body(k, M):
        piv = M[..., k, k]
        row = M[..., k, :] / piv[..., None]
        col = M[..., :, k]
        M = M - col[..., :, None] * row[..., None, :]
        M = M.at[..., k, :].set(row)
        return M

    M = jax.lax.fori_loop(0, n, body, M, unroll=8)
    return M[..., :, n:]


def gj_inverse_blocked(A, bs: int = 8):
    """Blocked pivot-free Gauss-Jordan inversion.

    The scalar GJ makes n passes over the (batched) augmented matrix — pure
    HBM traffic. Blocking by `bs` columns turns each pass into a rank-bs
    MXU matmul update and cuts the number of passes (and HBM bytes) by bs.
    n is padded to a multiple of bs with an identity tail (inverse of the
    padded matrix restricts to the inverse of A).
    """
    n = A.shape[-1]
    n_pad = ((n + bs - 1) // bs) * bs
    batch = A.shape[:-2]
    if n_pad != n:
        Ap = jnp.zeros(batch + (n_pad, n_pad), A.dtype)
        Ap = Ap.at[..., :n, :n].set(A)
        pad_idx = jnp.arange(n, n_pad)
        Ap = Ap.at[..., pad_idx, pad_idx].set(1.0)
        A = Ap
    m = n_pad
    M = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(m, dtype=A.dtype),
                             batch + (m, m))], axis=-1)
    eye_bs = jnp.eye(bs, dtype=A.dtype)
    for kb in range(m // bs):
        c0, c1 = kb * bs, (kb + 1) * bs
        Drows = M[..., c0:c1, :]                       # (bs, 2m)
        Dblk = Drows[..., :, c0:c1]                    # (bs, bs)
        Dinv = gj_inverse(Dblk)                        # tiny, unrolled
        R = jnp.matmul(Dinv, Drows, precision="highest")   # normalized rows
        C = M[..., :, c0:c1]                           # (m, bs)
        # fuse the pivot-row write into the rank-bs update: replacing the
        # pivot-block rows of C with (Dblk − I) makes M − C'@R equal to
        # M − C@R on the other rows and exactly R on the pivot rows
        # (Drows − (Dblk − I)·Dinv·Drows = R) — one pass over M per block
        Cp = C.at[..., c0:c1, :].set(Dblk - eye_bs)
        M = M - jnp.matmul(Cp, R, precision="highest")
    inv = M[..., :, m:]
    if n_pad != n:
        inv = inv[..., :n, :n]
    return inv


def _best_bs(n: int) -> int:
    """Block width minimizing the blocked-GJ HBM traffic ∝ passes·n_pad²
    (each of the ceil(n/bs) block steps sweeps the padded augmented matrix)."""
    def cost(bs):
        nb = -(-n // bs)
        return nb * (nb * bs) ** 2
    return min((32, 24, 16), key=cost)


def _use_pallas_gj(J, min_n: int = 17) -> bool:
    """Route large inverses to the VMEM-resident Pallas kernel when tracing
    for TPU. Decided at trace time: tests/CPU runs fall back to the XLA
    blocked GJ, which is also the autodiff/interpret reference."""
    if J.dtype != jnp.float32 or J.shape[-1] < min_n:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        # a `with jax.default_device(cpu)` context overrides the backend
        # without changing default_backend() — honor it (mixed-device
        # processes: CPU oracle runs alongside the TPU session)
        dd = jax.config.jax_default_device
        if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
            return False
        from ..ops.pallas_gj import gj_inverse_hot
        return gj_inverse_hot is not None
    except Exception:  # pragma: no cover
        return False


def equilibrated_inv_factor(J):
    """Row/col-equilibrated explicit inverse; solve is one matvec."""
    col = jnp.maximum(jnp.max(jnp.abs(J), axis=-2), 1e-30)
    Jc = J / col[..., None, :]
    row = jnp.maximum(jnp.max(jnp.abs(Jc), axis=-1), 1e-30)
    Js = Jc / row[..., :, None]
    n = J.shape[-1]
    if n <= 16:
        inv = gj_inverse(Js)
    elif _use_pallas_gj(J) and Js.ndim == 2:
        from ..ops.pallas_gj import gj_inverse_hot
        inv = gj_inverse_hot(Js)
    else:
        inv = gj_inverse_blocked(Js, bs=_best_bs(n))
    return (inv, row, col)


def equilibrated_inv_solve(fac, b):
    if isinstance(fac, RefinedLU):
        return refined_lu_solve(fac, b)
    inv, row, col = fac
    return jnp.matmul(inv, (b / row)[..., None],
                      precision="highest")[..., 0] / col


class RefinedLU(NamedTuple):
    """Row/col-equilibrated pivoted LU + the original matrix, so every solve
    runs one iterative-refinement step: x += M⁻¹(b − J x), with the residual
    matvec at precision="highest".

    This is the f32-thermal backend: cond(J) reaches 1e14-1e16 on dT-hold
    thermal systems, where (a) pivot-free elimination loses everything and
    (b) even the pivoted f32 LU solve (~2e-4 relative on TPU) leaves Newton
    riding the edge — one refinement step pulls the solve to ~1e-6-1e-7,
    comfortably inside Newton's convergence region. Costs one matvec + one
    extra triangular solve; only the f32+temperature configs pay it."""
    lu: tuple
    row: jax.Array
    col: jax.Array
    J: jax.Array


def refined_lu_factor(J):
    col = jnp.maximum(jnp.max(jnp.abs(J), axis=-2), 1e-30)
    Jc = J / col[..., None, :]
    row = jnp.maximum(jnp.max(jnp.abs(Jc), axis=-1), 1e-30)
    Js = Jc / row[..., :, None]
    return RefinedLU(lu=jax.scipy.linalg.lu_factor(Js), row=row, col=col, J=J)


def refined_lu_solve(fac: RefinedLU, b):
    def base(rhs):
        return jax.scipy.linalg.lu_solve(fac.lu, rhs / fac.row) / fac.col

    x = base(b)
    r = b - jnp.matmul(fac.J, x[..., None], precision="highest")[..., 0]
    return x + base(r)


def make_dense_jacfwd(F):
    """jac_and_factor closure for `bdf.make_stepper` using dense jacfwd.

    J = ∂F/∂y + c0 ∂F/∂yp is obtained in ONE forward-mode pass by
    differentiating y ↦ F(t, y, c0·y + const) — the chain rule composes the
    two Jacobians exactly (replaces the reference's symbolic J_y!,
    generate_functions.jl:270-307).
    """
    def jac_and_factor(t, y_pred, c0, psi_over_h):
        const = psi_over_h - c0 * y_pred

        def composed(y):
            return F(t, y, c0 * y + const)

        J = jax.jacfwd(composed)(y_pred)
        return dense_factor(J)

    return jac_and_factor
