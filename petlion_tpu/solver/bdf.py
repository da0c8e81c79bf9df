"""Adaptive variable-order BDF integrator for implicit DAEs — in-JAX.

TPU-native replacement for Sundials IDA (the reference's L0 backend,
model_evaluation.jl:259-333): a variable-order (1..5), variable-step BDF with
a modified-Newton inner loop and weighted-RMS error control, expressed as a
pure single-step transition function so the whole time loop lives inside one
`lax.while_loop` (jit-compiled once, vmap-batchable over cells with per-cell
step size, order, and difference history).

Formulation (backward-difference form, after Shampine/Reichelt's ode15s and
SciPy's BDF, with the NDF κ terms set to 0, i.e. pure BDF like IDA):

    state carries D[j] = ∇ʲ y_n  (j = 0..order+2) at the current step size h.
    predictor     y_pred = Σ_{j≤k} D[j]
    corrector     y = y_pred + d solves F(t+h, y, yp(d)) = 0,
                  yp = (γ_k d + Σ_{j=1..k} γ_j D[j]) / h,  γ_j = Σ_{i≤j} 1/i
    Newton matrix J = ∂F/∂y + (γ_k/h) ∂F/∂yp  — evaluated by jacfwd of the
                  composed map y ↦ F(t+h, y, c0·y + const), one AD pass.
    LTE estimate  err = d / (k+1);  wRMS-normed against atol + rtol·|y|.
    order/step    after k+1 equal steps, choose among k-1, k, k+1 by the
                  standard difference-array error proxies; rescale D on any
                  step-size change with the pascal-triangle matrix R(factor).

All order-dependent reductions are masked (never shape-dependent) so `order`
can differ per batched cell under vmap. The linear solve is pluggable
(`linsolve`): dense LU by default, structured P2D solvers in petlion_tpu.ops.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_ORDER = 5
_D_ROWS = MAX_ORDER + 3

MIN_FACTOR = 0.2
MAX_FACTOR = 10.0
SAFETY = 0.9

# Jacobian-reuse policy (IDA semantics: the Newton matrix is kept across
# steps until the BDF leading coefficient drifts — cjratio outside
# [3/10, 10/3] — or Newton degrades; stale-matrix Newton steps are damped
# by con = 2/(1+cjratio)). Sundials ida.c uses exactly these constants.
CJ_LO = 0.3
CJ_HI = 10.0 / 3.0

# status codes
OK = 0
UNRECOVERABLE = 2


def _gammas(dtype):
    g = np.hstack([0.0, np.cumsum(1.0 / np.arange(1, MAX_ORDER + 2))])
    return jnp.asarray(g, dtype)


def _error_const(dtype):
    # pure BDF: err_const[k] = 1/(k+1)
    return jnp.asarray(1.0 / np.arange(1, MAX_ORDER + 3, dtype=np.float64),
                       dtype)  # index k -> 1/(k+1)


def wrms(x, scale):
    return jnp.sqrt(jnp.mean((x / scale) ** 2, axis=-1))


def _R_matrix(factor, dtype):
    """R[i,j] = Π_{m=1..i} (m-1-factor·j)/m, R[0,:]=1, R[i>0,0]=0."""
    i = jnp.arange(1, _D_ROWS, dtype=dtype)[:, None]
    j = jnp.arange(1, _D_ROWS, dtype=dtype)[None, :]
    M = jnp.zeros((_D_ROWS, _D_ROWS), dtype)
    M = M.at[1:, 1:].set((i - 1.0 - factor * j) / i)
    M = M.at[0, :].set(1.0)
    return jnp.cumprod(M, axis=0)


def change_D(D, order, factor):
    """Rescale the difference array for a step change h -> h·factor.

    Masked full-size version of SciPy BDF's R/U trick: rows 0..order are
    transformed, higher rows are left untouched.
    """
    dtype = D.dtype
    R = _R_matrix(jnp.asarray(factor, dtype), dtype)
    U = _R_matrix(jnp.asarray(1.0, dtype), dtype)
    mask = (jnp.arange(_D_ROWS) <= order)
    # RU[j,i] = Σ_{m<=order} R[j,m] U[m,i]
    # precision=highest: bf16-multiply matmuls (TPU f32 default) would
    # corrupt the difference array, whose rows span ~1e5 dynamic range
    RU = jnp.matmul(R * mask[None, :], U * mask[:, None],
                    precision="highest")
    Dm = jnp.where(mask[:, None], D, 0.0)
    D_new = jnp.matmul(RU.T, Dm, precision="highest")
    return jnp.where(mask[:, None], D_new, D)


class BDFState(NamedTuple):
    t: jax.Array            # current time
    h: jax.Array            # next step size
    order: jax.Array        # current order (int32)
    D: jax.Array            # (MAX_ORDER+3, N) difference array at step h
    n_equal: jax.Array      # accepted steps since last h/order change
    status: jax.Array      # OK / UNRECOVERABLE
    yp: jax.Array           # derivative at t (for saving/back-interp)
    n_steps: jax.Array
    n_rejected: jax.Array
    n_fails: jax.Array      # consecutive failures at the current point

    @property
    def y(self):
        return self.D[..., 0, :]


def bdf_init(t0, y0, yp0, h0):
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    D = jnp.zeros((_D_ROWS, y0.shape[-1]), dtype)
    D = D.at[0].set(y0)
    D = D.at[1].set(jnp.asarray(yp0, dtype) * h0)
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    return BDFState(
        t=jnp.asarray(t0, dtype), h=jnp.asarray(h0, dtype),
        order=i32(1), D=D, n_equal=i32(0), status=i32(OK),
        yp=jnp.asarray(yp0, dtype), n_steps=i32(0), n_rejected=i32(0),
        n_fails=i32(0))


def initial_step_size(y0, yp0, atol, rtol, t_span):
    """SciPy-style h0 heuristic, clipped to the run horizon."""
    scale = atol + rtol * jnp.abs(y0)
    d0 = wrms(y0, scale)
    d1 = wrms(yp0, scale)
    h0 = 0.01 * d0 / jnp.maximum(d1, 1e-10)
    h0 = jnp.where(jnp.isfinite(h0) & (h0 > 0), h0, 1e-4)
    return jnp.clip(h0, 1e-10, 0.1 * t_span)


def dense_eval(D, h, order, t_head, t):
    """Dense output: evaluate the BDF interpolating polynomial (and its
    derivative) at time `t` inside the last accepted step.

    The difference array D at step size h represents the Newton
    backward-difference interpolant through the last `order`+1 solution
    points ending at t_head:

        y(t_head + θh) = Σ_{j≤k} c_j(θ) ∇ʲy,   c_0 = 1,
        c_j(θ) = c_{j-1}(θ) · (θ + j − 1) / j

    (θ = 0 reproduces D[0]; θ = −1 the previous point). This replaces the
    reference's *linear* final-point back-interpolation
    (interp_final_points!, model_evaluation.jl:369-382) with the integrator's
    own order-k polynomial — the event-crossing state is then accurate to the
    integration tolerance instead of O(h²).
    """
    dtype = D.dtype
    theta = (t - t_head) / h
    y = D[0]
    yp = jnp.zeros_like(D[0])
    c = jnp.asarray(1.0, dtype)
    dc = jnp.asarray(0.0, dtype)
    ar = jnp.arange(_D_ROWS)
    for j in range(1, _D_ROWS):
        dc = (dc * (theta + j - 1.0) + c) / j
        c = c * (theta + j - 1.0) / j
        take = (j <= order)
        y = y + jnp.where(take, c, 0.0) * D[j]
        yp = yp + jnp.where(take, dc, 0.0) * D[j]
    del ar
    return y, yp / h


def predict(state: BDFState, t_bound, hmin, hmax):
    """Attempt prologue shared with the chunk-level factorization: clip h,
    rescale D, and form the predictor and BDF leading coefficient."""
    dtype = state.D.dtype
    gam = _gammas(dtype)
    k = state.order
    ar = jnp.arange(_D_ROWS)
    h = jnp.clip(state.h, hmin, hmax)
    h = jnp.minimum(h, jnp.maximum(t_bound - state.t, hmin))
    D = change_D(state.D, k, h / state.h)
    t_new = state.t + h
    y_pred = jnp.sum(jnp.where((ar <= k)[:, None], D, 0.0), axis=0)
    gmask = ((ar >= 1) & (ar <= k))
    S = jnp.sum(jnp.where(gmask[:, None], gam[ar][:, None] * D, 0.0), axis=0)
    c0 = gam[k] / h
    return h, D, t_new, y_pred, c0, S / h


def cj_ok(st: BDFState, t_bound, c0_f, hmin=1e-10, hmax=np.inf):
    """Is the next attempt's BDF leading coefficient within the stale-matrix
    trust range of the factorization's (IDA cjratio ∈ [3/10, 10/3])?"""
    dtype = st.D.dtype
    h = jnp.clip(st.h, hmin, hmax)
    h = jnp.minimum(h, jnp.maximum(t_bound - st.t, hmin))
    rat = (_gammas(dtype)[st.order] / h) / c0_f
    return (rat > CJ_LO) & (rat < CJ_HI)


def make_stepper(F: Callable,
                 jac_and_factor: Callable,
                 linsolve: Callable,
                 atol, rtol,
                 newton_maxiter: int = 4,
                 hmin: float = 1e-10,
                 hmax: float = np.inf,
                 max_attempts: int = 100,
                 step_control: str = "greedy"):
    """Build `step(state, t_bound, J_lu, c0_fac) -> (state, accepted)`.

    F(t, y, yp) -> residual (N,).
    jac_and_factor(t, y_pred, c0, psi_over_h) -> factorization object.
    linsolve(factorization, b) -> x solving (Fy + c0·Fyp) x = b.

    `J_lu` is the Newton-matrix factorization made at leading coefficient
    `c0_fac` (possibly several accepted steps old — the caller owns the
    IDA-style reuse policy); stale-matrix Newton updates are damped by
    con = 2/(1+c0/c0_fac) (Sundials ida.c `cjratio` correction). Pass
    `J_lu=None` to recompute the factorization inside every attempt (the
    pre-reuse behavior)."""
    newton_tol = max(10 * np.finfo(np.float64).eps / rtol,
                     min(0.03, rtol ** 0.5))

    def _newton(t_new, y_pred, c0, psi_over_h, J_lu, scale, con):
        def g(d):
            return F(t_new, y_pred + d, c0 * d + psi_over_h)

        def body(carry):
            it, d, dnorm_old, conv, div = carry
            r = g(d)
            delta = con * linsolve(J_lu, -r)
            d_new = d + delta
            dnorm = wrms(delta, scale)
            rate = dnorm / jnp.maximum(dnorm_old, 1e-300)
            have_rate = it > 0
            conv_now = jnp.where(
                have_rate & (rate < 1.0),
                rate / (1.0 - rate) * dnorm < newton_tol,
                dnorm == 0.0)
            # also accept an immediately tiny first update
            conv_now = conv_now | (dnorm < 0.01 * newton_tol)
            # stall acceptance: in f32 the update plateaus at the linear-
            # solve noise floor with rate ≈ 1; if that plateau is already far
            # below the integration-error budget (wrms 1.0), the iterate is
            # as converged as the arithmetic allows — without this, cells on
            # the end-of-discharge voltage cliff h-shrink to underflow
            conv_now = conv_now | (have_rate & (dnorm < newton_tol))
            div_now = have_rate & (rate >= 1.0) & (dnorm > newton_tol)
            return (it + 1, d_new, dnorm, conv | conv_now, div | div_now)

        def cond(carry):
            it, d, dnorm_old, conv, div = carry
            return (it < newton_maxiter) & (~conv) & (~div)

        init = (jnp.asarray(0, jnp.int32), jnp.zeros_like(y_pred),
                jnp.asarray(0.0, y_pred.dtype), jnp.asarray(False),
                jnp.asarray(False))
        it, d, _, conv, div = jax.lax.while_loop(cond, body, init)
        return conv & (~div), d

    def attempt(state: BDFState, t_bound, J_lu, c0_f):
        dtype = state.D.dtype
        errc = _error_const(dtype)
        k = state.order
        kf = k.astype(dtype)
        ar = jnp.arange(_D_ROWS)

        h, D, t_new, y_pred, c0, psi_over_h = predict(state, t_bound,
                                                      hmin, hmax)

        scale = atol + rtol * jnp.abs(y_pred)
        if J_lu is None:
            J_lu = jac_and_factor(t_new, y_pred, c0, psi_over_h)
            con = jnp.asarray(1.0, dtype)
        else:
            con = 2.0 / (1.0 + c0 / c0_f)
        conv, d = _newton(t_new, y_pred, c0, psi_over_h, J_lu, scale, con)

        y = y_pred + d
        yp = c0 * d + psi_over_h
        scale_y = atol + rtol * jnp.abs(y)
        errnorm = jnp.where(conv, wrms(errc[k] * d, scale_y), jnp.inf)
        accept = errnorm <= 1.0

        # ---------- rejected: shrink h, rescale D --------------------------
        shrink = jnp.where(
            conv,
            jnp.clip(SAFETY * errnorm ** (-1.0 / (kf + 1.0)), MIN_FACTOR, 0.9),
            jnp.asarray(0.25, dtype))
        n_fails = state.n_fails + 1
        # IDA-style order-1 restart after repeated failures at one point:
        # high-order BDF is unstable through sharp kinks (end-of-discharge
        # voltage cliff); rebuild the history as a fresh first-order start
        # from the last accepted (y, yp) with a strongly reduced step.
        restart = n_fails >= 3
        h_restart = h * jnp.asarray(0.1, dtype)
        yp_cur = state.yp
        D_restart = jnp.zeros_like(D)
        D_restart = D_restart.at[0].set(state.D[0])
        D_restart = D_restart.at[1].set(yp_cur * h_restart)
        st_rej = state._replace(
            h=jnp.where(restart, h_restart, h * shrink),
            D=jnp.where(restart, D_restart, change_D(D, k, shrink)),
            order=jnp.where(restart, jnp.asarray(1, jnp.int32), k),
            n_equal=jnp.asarray(0, jnp.int32),
            n_rejected=state.n_rejected + 1,
            n_fails=jnp.where(restart, jnp.asarray(0, jnp.int32), n_fails))

        # ---------- accepted: update differences ---------------------------
        D1 = D.at[k + 2].set(d - D[k + 1])
        D1 = D1.at[k + 1].set(d)
        # suffix-sum rows 0..k over rows i..k+1
        Dm = jnp.where((ar <= k + 1)[:, None], D1, 0.0)
        suffix = jnp.cumsum(Dm[::-1], axis=0)[::-1]
        D_acc = jnp.where((ar <= k)[:, None], suffix, D1)

        n_equal = state.n_equal + 1

        def adapt(args):
            D_a, k_, h_ = args
            kf_ = k_.astype(dtype)
            em = jnp.where(k_ > 1,
                           wrms(errc[k_ - 1] * D_a[k_], scale_y), jnp.inf)
            ep = jnp.where(k_ < MAX_ORDER,
                           wrms(errc[k_ + 1] * D_a[k_ + 2], scale_y), jnp.inf)
            tiny = jnp.asarray(1e-300, dtype)
            fm = jnp.maximum(em, tiny) ** (-1.0 / kf_)
            f0 = jnp.maximum(errnorm, tiny) ** (-1.0 / (kf_ + 1.0))
            fp = jnp.maximum(ep, tiny) ** (-1.0 / (kf_ + 2.0))
            fs = jnp.stack([fm, f0, fp])
            best = jnp.argmax(fs).astype(jnp.int32)
            k_new = k_ + best - 1
            raw = SAFETY * fs[best]
            if step_control == "ida":
                # Sundials ida.c IDACompleteStep semantics: after the
                # startup phase, grow h only when the estimate clears 2×
                # (capped at 2), HOLD h when the proposed ratio lands in
                # [1, 2) — the hysteresis band that stops the
                # grow-then-reject churn of the greedy policy — and shrink
                # gently (≥ 0.5) on an accepted step. During startup the
                # greedy growth is kept so h can climb from the small h0
                # without paying ~17 doubling steps (IDA's large initial
                # eta_max plays the same role).
                startup = state.n_steps < 20
                grown = jnp.minimum(raw, jnp.asarray(2.0, dtype))
                held = jnp.where(raw >= 2.0, grown,
                                 jnp.where(raw >= 1.0,
                                           jnp.asarray(1.0, dtype),
                                           jnp.clip(raw, 0.5, 1.0)))
                factor = jnp.where(startup,
                                   jnp.clip(raw, MIN_FACTOR, MAX_FACTOR),
                                   held)
            else:
                factor = jnp.clip(raw, MIN_FACTOR, MAX_FACTOR)
            D_new = change_D(D_a, k_new, factor)
            # exact no-op when h is held (change_D(·, 1.0) is identity only
            # up to rounding; the hold must not perturb the history)
            D_new = jnp.where(factor == 1.0, D_a, D_new)
            return (D_new, k_new, h_ * factor,
                    jnp.asarray(0, jnp.int32))

        def no_adapt(args):
            D_a, k_, h_ = args
            return D_a, k_, h_, n_equal

        D_fin, k_fin, h_fin, n_eq_fin = jax.lax.cond(
            n_equal > k + 1, adapt, no_adapt, (D_acc, k, h))

        st_acc = BDFState(
            t=t_new, h=h_fin, order=k_fin, D=D_fin, n_equal=n_eq_fin,
            status=state.status, yp=yp,
            n_steps=state.n_steps + 1, n_rejected=state.n_rejected,
            n_fails=jnp.asarray(0, jnp.int32))

        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), st_acc, st_rej)
        underflow = (~accept) & (new_state.h <= 2 * hmin)
        new_state = new_state._replace(
            status=jnp.where(underflow, jnp.asarray(UNRECOVERABLE, jnp.int32),
                             new_state.status))
        return new_state, accept

    def cj_in_range(st: BDFState, t_bound, c0_f):
        return cj_ok(st, t_bound, c0_f, hmin, hmax)

    def step(state: BDFState, t_bound, J_lu=None, c0_f=None):
        """Advance by one accepted step (internally retries failed attempts).

        Returns (state, accepted). With a (J_lu, c0_f) factorization, the
        retry loop also stops when a rejection shrinks h far enough that the
        stale matrix is out of its cjratio trust range — then `accepted` is
        False with status still OK, and the caller refactors and re-enters.
        Without a factorization (J_lu=None) an un-accepted exit is terminal
        (status=UNRECOVERABLE), as is running out of attempts."""
        reuse = J_lu is not None

        def cond(carry):
            st, accepted, tries = carry
            ok = (~accepted) & (st.status == OK) & (tries < max_attempts)
            if reuse:
                ok = ok & cj_in_range(st, t_bound, c0_f)
            return ok

        def body(carry):
            st, _, tries = carry
            st2, acc = attempt(st, t_bound, J_lu, c0_f)
            return st2, acc, tries + 1

        st0, acc0 = attempt(state, t_bound, J_lu, c0_f)
        st, acc, _ = jax.lax.while_loop(
            cond, body, (st0, acc0, jnp.asarray(1, jnp.int32)))
        if reuse:
            # drift exit is recoverable (caller refactors); everything else
            # that ends un-accepted is a genuine failure
            genuine_fail = (~acc) & cj_in_range(st, t_bound, c0_f)
            st = st._replace(status=jnp.where(
                genuine_fail, jnp.asarray(UNRECOVERABLE, jnp.int32),
                st.status))
        else:
            st = st._replace(status=jnp.where(
                acc, st.status, jnp.asarray(UNRECOVERABLE, jnp.int32)))
        return st, acc

    return step
