"""Linear-solver backends for the Newton iterations.

Replaces the reference's KLU/UMFPACK sparse LU (scalar_residual.jl:489-507,
model_evaluation.jl:417-428). The P2D Jacobian is small (N_tot ≈ 301) and
block-structured; the default backend is a batched dense LU (fine on one
TensorCore and fully vmappable). Structured backends that exploit the
"arrowhead + block-banded + per-particle dense" sparsity live in
petlion_tpu.ops and plug in through the same (factor, solve) pair.
"""

from __future__ import annotations

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
