"""Consistent DAE initialization — Newton on the algebraic states.

Port of the reference's `newtons_method!` (model_evaluation.jl:430-480):

1. With YP = 0, iterate Newton on the algebraic sub-vector Y_alg using the
   algebraic-algebraic Jacobian block (+ control row), damped-free, until
   ‖ΔY‖ < reltol_init (≤ init_maxiter iterations).
2. YP_diff ← differential residual evaluated at YP = 0 (the residual is
   rhs − YP, so the residual at YP=0 *is* the rhs).
3. Estimate YP_alg by a finite-difference probe: advance Y by Δt·YP, solve
   the linearized algebraic system once, divide by Δt
   (model_evaluation.jl:462-477) — improves BDF startup stability.

Instead of raising after 100 iterations, a `converged` flag is returned so a
diverging cell inside a vmapped batch cannot abort the whole batch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import linsolve


class InitResult(NamedTuple):
    y: jax.Array
    yp: jax.Array
    converged: jax.Array
    iterations: jax.Array


def consistent_init(F: Callable, y0, n_diff: int, *, reltol_init=1e-3,
                    maxiter=100, c_e0=1000.0,
                    init_algebraic_derivatives=True, t0=0.0,
                    jac_plan=None, th=None) -> InitResult:
    """F(t, y, yp) -> full residual (with control row). y0: initial guess.
    `t0` is the initialization time (0 for fresh runs; the post-discontinuity
    time for mid-run re-initializations). With `jac_plan`, the algebraic
    Jacobian uses the plan's column coloring (~n_colors JVP sweeps instead of
    n_alg dense jacfwd columns — the init was ~27% of a batched discharge)."""
    dtype = y0.dtype
    n_tot = y0.shape[-1]
    n_alg = n_tot - n_diff
    yp0 = jnp.zeros_like(y0)

    def alg_res(y_alg, y_diff):
        y = jnp.concatenate([y_diff, y_alg])
        r = F(t0, y, yp0)
        # Controls that reference YP (dT / dc_* holds, user residuals) would
        # see yp=0 here and leave the scalar row unconstrained. The reference
        # substitutes YP_diff -> residual RHS inside the scalar row for
        # initialization (scalar_residual.jl:347-365); since res = rhs - yp,
        # the rhs at yp=0 IS the residual, so one extra evaluation with
        # yp_diff := r_diff reproduces that substitution exactly.
        yp_eff = yp0.at[:n_diff].set(r[:n_diff])
        r2 = F(t0, y, yp_eff)
        return jnp.concatenate([r[n_diff:-1], r2[-1:]])

    def body(carry):
        it, y, dnorm, _lu = carry
        y_diff, y_alg = y[:n_diff], y[n_diff:]
        r = alg_res(y_alg, y_diff)
        if jac_plan is not None:
            lu = jac_plan.factor_alg(alg_res, y_alg, y_diff, th=th)
        else:
            J = jax.jacfwd(alg_res)(y_alg, y_diff)
            lu = linsolve.equilibrated_inv_factor(J)
        step = linsolve.equilibrated_inv_solve(lu, r)
        # trust-region cap: a near-singular row (f32 noise floors, extreme
        # setpoints) can produce astronomically long Newton steps whose
        # overflow poisons the whole batch with NaN; cap the relative step
        # length — convergent iterations are far below the cap and unchanged
        rel = jnp.sqrt(jnp.mean((step / (1.0 + jnp.abs(y_alg))) ** 2))
        step = step * jnp.minimum(1.0, 10.0 / jnp.maximum(rel, 1e-30))
        step = jnp.nan_to_num(step, nan=0.0, posinf=0.0, neginf=0.0)
        y_alg_new = y_alg - step
        dnorm = jnp.linalg.norm(step)
        return (it + 1, jnp.concatenate([y_diff, y_alg_new]), dnorm, lu)

    def cond(carry):
        it, y, dnorm, _lu = carry
        return (it < maxiter) & (dnorm >= reltol_init)

    # one unconditional iteration to materialize an LU for the carry
    carry = body((jnp.asarray(0, jnp.int32), y0,
                  jnp.asarray(jnp.inf, dtype), _dummy_lu(n_alg, dtype)))
    it, y, dnorm, lu = jax.lax.while_loop(cond, body, carry)
    converged = dnorm < reltol_init

    # differential derivatives: residual rows at YP=0 equal the rhs
    yp = jnp.zeros_like(y0)
    r_full = F(t0, y, yp)
    yp = yp.at[:n_diff].set(r_full[:n_diff])

    if init_algebraic_derivatives:
        # finite-difference estimate of dY_alg/dt (model_evaluation.jl:462-477)
        dt = jnp.maximum(10.0 * reltol_init,
                         jnp.sqrt(jnp.finfo(dtype).eps * c_e0))
        y_t = y + dt * yp
        r_alg = F(t0 + dt, y_t, yp)[n_diff:]
        yp = yp.at[n_diff:].set(-linsolve.equilibrated_inv_solve(lu, r_alg) / dt)

    return InitResult(y=y, yp=yp, converged=converged, iterations=it)


def _dummy_lu(n, dtype):
    return (jnp.eye(n, dtype=dtype),
            jnp.ones((n,), dtype), jnp.ones((n,), dtype))
