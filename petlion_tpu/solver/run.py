"""Single-run driver: consistent init → BDF loop → events → back-interp.

The in-jit counterpart of the reference's run machinery
(model_evaluation.jl: initialize_simulation! :174-232, solve! :312-333,
exit_simulation!/interp_final_points! :335-382). One call = one "run" (one
control mode, like one `simulate` in the reference); protocol chaining either
re-enters (host chaining, like `simulate!`) or uses solver.protocol for
fully-in-jit multi-step protocols.

Everything here is a pure function of (y_start, soc0, value, tf, θ, bounds)
given static (cfg, spec, opts) — so it jits once per model/method/options and
vmaps over cells for batched sweeps.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import EXIT_SIMULATING, EXIT_FAILED, SimOptions
from ..physics.initial_guess import initial_guess
from ..physics.residuals import ModelConfig, calc_I1C
from . import bdf, control, events, linsolve
from .newton import consistent_init

# outputs that can be recorded per accepted step; scalars are always kept
SCALAR_OUTPUTS = ("t", "V", "I", "P", "SOC")
VECTOR_OUTPUTS = ("c_e", "c_s_avg", "T", "film", "Q", "j", "j_s",
                  "Phi_e", "Phi_s", "SOH", "eps_s", "Y", "YP")


class RunnerState(NamedTuple):
    bdf: bdf.BDFState
    soc: jax.Array
    prev: events.BoundsPrev
    flag: jax.Array
    save_idx: jax.Array
    bufs: dict
    y_prev: jax.Array
    yp_prev: jax.Array
    t_prev: jax.Array
    soc_prev: jax.Array


class RunResultDev(NamedTuple):
    """Device-side result of one run."""
    bufs: dict
    n_saved: jax.Array
    flag: jax.Array
    y0_run: jax.Array          # state after consistent initialization
    y_final: jax.Array
    yp_final: jax.Array
    soc_final: jax.Array
    t_final: jax.Array
    n_steps: jax.Array
    n_rejected: jax.Array
    init_converged: jax.Array
    truncated: jax.Array       # output ring overflowed: tail overwritten


def _vector_outputs(opts: SimOptions, cfg: ModelConfig):
    L = cfg.layout
    want_all = "all" in opts.outputs
    outs = []
    for name in VECTOR_OUTPUTS:
        present = name in ("Y", "YP") or name in L
        if present and (want_all or name in opts.outputs):
            outs.append(name)
    return tuple(outs)


def _record(bufs, idx, t, y, yp, soc, th, cfg: ModelConfig, vec_outs):
    # mode="drop": a deliberately out-of-bounds idx makes the write a no-op —
    # the chunked runner uses that to skip recording on trips that ended in
    # a refactor-needed drift exit instead of an accepted step
    L = cfg.layout
    V = L.V(y)
    I = L.I(y)
    upd = dict(bufs)
    upd["t"] = bufs["t"].at[idx].set(t, mode="drop")
    upd["V"] = bufs["V"].at[idx].set(V, mode="drop")
    upd["I"] = bufs["I"].at[idx].set(I, mode="drop")
    upd["P"] = bufs["P"].at[idx].set(I * calc_I1C(th) * V, mode="drop")
    upd["SOC"] = bufs["SOC"].at[idx].set(soc, mode="drop")
    # external convention: recorded states carry absolute T [K]; the solver
    # state carries T − T_amb (residuals.build_auxiliary). YP is a rate,
    # identical in both. Y_final (continuation carry) stays internal.
    has_T = cfg.numerics.temperature
    for name in vec_outs:
        if name == "Y":
            val = y.at[L.sl("T")].add(th["T_amb"]) if has_T else y
        elif name == "YP":
            val = yp
        elif name == "T":
            val = L.get(y, name) + th["T_amb"]
        else:
            val = L.get(y, name)
        upd[name] = bufs[name].at[idx].set(val, mode="drop")
    return upd


def _make_bufs(opts: SimOptions, cfg: ModelConfig, vec_outs, dtype):
    n = opts.max_save
    L = cfg.layout
    bufs = {k: jnp.zeros((n,), dtype) for k in SCALAR_OUTPUTS}
    for name in vec_outs:
        if name in ("Y", "YP"):
            m = L.N_tot
        else:
            s = L.sl(name)
            m = s.stop - s.start
        bufs[name] = jnp.zeros((n, m), dtype)
    return bufs


def initial_current_guess(spec: control.ControlSpec, value, y0, soc0, th,
                          cfg: ModelConfig, prev_I, has_prev):
    """Seed Y0[I] per control method (input_methods.jl).

    `prev_I` / `has_prev` implement the continuation branches (reuse the last
    current when chaining runs).
    """
    L = cfg.layout
    m = spec.method
    v0 = control.control_value(spec, value, 0.0, y0, jnp.zeros_like(y0), th)
    if m == "I":
        I_guess = v0
    elif m == "P":
        I_guess = jnp.where(has_prev, prev_I,
                            v0 / (L.V(y0) * calc_I1C(th)))
    elif m in ("V", "eta_p"):
        ocv = L.V(y0)
        sign_guess = jnp.where(v0 > ocv, 1.0, -1.0)
        I_guess = jnp.where(has_prev & (prev_I != 0), prev_I, sign_guess)
    else:  # res
        I_guess = jnp.where(has_prev, prev_I, 1.0)
    return y0.at[L.sl("I").start].set(I_guess)


def run_once(*,
             y_start, soc0, value, tf, th, bounds: dict,
             cfg: ModelConfig, spec: control.ControlSpec, opts: SimOptions,
             is_rest: bool = False, is_temperature_hold: bool = False,
             prev_I=None, has_prev=None,
             linear_solver=None, jac_plan=None,
             tstops=None) -> RunResultDev:
    """Execute one run. `y_start=None`-like fresh starts are handled by the
    caller passing the initial guess; here y_start is always a concrete state
    vector whose algebraic part is re-initialized by Newton.
    """
    L = cfg.layout
    dtype = y_start.dtype
    nd = L.N_diff

    # per-run control setup (ControlSpec.init_aux): e.g. the dc_*-hold modes
    # select their extremal node from the starting state, per cell
    if spec.init_aux is not None:
        th = dict(th)
        th["_ctrl_aux"] = spec.init_aux(y_start, th)

    # equilibrated LU by default: required for f32 (TPU) conditioning,
    # near-free in f64
    if jac_plan is not None:
        factor, solve = jac_plan.factor, jac_plan.solve
    elif linear_solver is not None:
        factor, solve = linear_solver
    else:
        factor, solve = (linsolve.equilibrated_factor,
                         linsolve.equilibrated_solve)

    def F(t, y, yp):
        return control.full_residual(spec, value, t, y, yp, th, cfg)

    if prev_I is None:
        prev_I = jnp.asarray(0.0, dtype)
        has_prev = jnp.asarray(False)

    # ---- consistent initialization -----------------------------------------
    y0 = initial_current_guess(spec, value, y_start, soc0, th, cfg,
                               prev_I, has_prev)
    init = consistent_init(F, y0, nd,
                           reltol_init=opts.reltol_init_,
                           maxiter=opts.init_maxiter,
                           c_e0=float(1000.0), jac_plan=jac_plan, th=th)
    y0, yp0 = init.y, init.yp

    # ---- integrator setup ---------------------------------------------------
    # per-component absolute tolerance (IDASVtolerances analogue): a scalar
    # atol cannot serve both concentrations (~1e4 mol/m³) and temperature
    # (~K offsets) in f32 — opts.abstol_T relaxes the T block only
    if opts.abstol_T is not None and cfg.numerics.temperature:
        atol = jnp.full((L.N_tot,), opts.abstol, dtype)
        atol = atol.at[L.sl("T")].set(jnp.asarray(opts.abstol_T, dtype))
    else:
        atol = opts.abstol
    h0 = (opts.dt0 if opts.dt0 is not None
          else bdf.initial_step_size(y0, yp0, atol, opts.reltol, tf))
    state0 = bdf.bdf_init(0.0, y0, yp0, h0)

    def jac_and_factor(t, y_pred, c0, psi_over_h):
        const = psi_over_h - c0 * y_pred

        def composed(y):
            return F(t, y, c0 * y + const)

        if jac_plan is not None:
            return jac_plan.factor_compressed(composed, y_pred,
                                              t=t, c0=c0, th=th)
        return factor(jax.jacfwd(composed)(y_pred))

    hmax = opts.dtmax if opts.dtmax is not None else float("inf")
    step = bdf.make_stepper(F, jac_and_factor, solve,
                            atol, opts.reltol,
                            newton_maxiter=opts.newton_maxiter, hmax=hmax,
                            step_control=opts.step_control)

    vec_outs = _vector_outputs(opts, cfg)
    bufs = _make_bufs(opts, cfg, vec_outs, dtype)

    # record the initial point + t=0 bound check (model_evaluation.jl:225-230)
    bufs = _record(bufs, 0, jnp.asarray(0.0, dtype), y0, yp0, soc0, th, cfg,
                   vec_outs)
    prev0 = events.BoundsPrev.init(dtype)
    flag0 = jnp.asarray(EXIT_SIMULATING, jnp.int32)
    prev0, flag0 = events.check_stop(
        jnp.asarray(0.0, dtype), y0, yp0, soc0, prev0, flag0, bounds, th, cfg,
        spec.method, reltol=opts.reltol, tf=tf,
        check_bounds=opts.check_bounds, is_rest=is_rest,
        is_temperature_hold=is_temperature_hold,
        stop_fn=opts.stop_function)
    flag0 = jnp.where(~init.converged, EXIT_FAILED, flag0)

    rs0 = RunnerState(
        bdf=state0, soc=jnp.asarray(soc0, dtype), prev=prev0, flag=flag0,
        save_idx=jnp.asarray(1, jnp.int32), bufs=bufs,
        y_prev=y0, yp_prev=yp0, t_prev=jnp.asarray(0.0, dtype),
        soc_prev=jnp.asarray(soc0, dtype))

    def cond(rs: RunnerState):
        return ((rs.flag == EXIT_SIMULATING)
                & (rs.bdf.t < tf)
                & (rs.bdf.status == bdf.OK)
                & (rs.bdf.n_steps < opts.maxiters))

    # explicit solver stops (reference tstops/tdiscon handling,
    # model_evaluation.jl:288-310): each step's bound is the next stop time
    if tstops is not None:
        tstops_arr = jnp.asarray(tstops, dtype)
    else:
        tstops_arr = None

    def t_bound_of(st):
        if tstops_arr is not None:
            nxt = jnp.min(jnp.where(tstops_arr > st.t + 1e-9, tstops_arr,
                                    jnp.inf))
            return jnp.minimum(tf, nxt)
        return tf

    def trip(rs: RunnerState, J_lu, c0_f):
        """One accepted-step attempt bundle + bookkeeping.

        Returns (new_rs, keep_going): `keep_going` False ends the current
        reuse chunk (drift exit, failure, or post-discontinuity re-init).
        On a drift exit the solver state keeps its shrunk h / rejection
        counts but nothing is recorded and no events fire."""
        y_prev = rs.bdf.D[0]
        yp_prev = rs.bdf.yp
        t_prev = rs.bdf.t
        soc_prev = rs.soc

        t_bound = t_bound_of(rs.bdf)
        st, acc = step(rs.bdf, t_bound, J_lu, c0_f)
        y = st.D[0]
        yp = st.yp
        t = st.t
        keep = acc

        # discontinuity handling for function inputs (checks.jl:341-364 +
        # IDAReInit): probe the control at t + reltol; on a jump, re-run the
        # consistent (algebraic) initialization at the post-jump time and
        # restart the BDF history at order 1 — the jump is absorbed into the
        # initial state instead of being misread as truncation error
        if spec.func is not None:
            v_now = spec.func(t, y, yp, th)
            t_jump = t + opts.reltol
            v_probe = spec.func(t_jump, y, yp, th)
            jumped = acc & (jnp.abs(v_probe - v_now)
                            > (opts.abstol + opts.reltol * jnp.abs(v_now)))

            def rescue(st):
                init2 = consistent_init(
                    F, st.D[0], nd, reltol_init=opts.reltol_init_,
                    maxiter=opts.init_maxiter, t0=t_jump, jac_plan=jac_plan,
                    th=th)
                # fresh-start step-size heuristic at the post-jump state
                # (the reference relies on IDASetInitStep after IDAReInit)
                h_new = bdf.initial_step_size(init2.y, init2.yp, atol,
                                              opts.reltol,
                                              jnp.maximum(tf - t_jump, 1.0))
                D_new = jnp.zeros_like(st.D)
                D_new = D_new.at[0].set(init2.y)
                D_new = D_new.at[1].set(init2.yp * h_new)
                return st._replace(
                    t=t_jump, D=D_new, h=h_new, yp=init2.yp,
                    order=jnp.asarray(1, jnp.int32),
                    n_equal=jnp.asarray(0, jnp.int32))

            st = jax.lax.cond(jumped, rescue, lambda s: s, st)
            y = st.D[0]
            yp = st.yp
            t = st.t
            keep = keep & ~jumped   # re-init invalidates the factorization

        # trapezoidal SOC update (scalar_residual.jl:103-111)
        soc = jnp.where(
            acc,
            rs.soc + 0.5 * (t - t_prev) * (L.I(y) + L.I(y_prev)) / 3600.0,
            rs.soc)

        # ring-clamp: if the save buffer fills, keep integrating and
        # overwrite the last slot (solver progress is not IO-bound);
        # un-accepted trips record nothing (out-of-bounds idx → dropped)
        rec_idx = jnp.where(acc,
                            jnp.minimum(rs.save_idx, opts.max_save - 1),
                            jnp.asarray(opts.max_save, jnp.int32))
        bufs = _record(rs.bufs, rec_idx, t, y, yp, soc, th, cfg, vec_outs)
        prev, flag = events.check_stop(
            t, y, yp, soc, rs.prev, rs.flag, bounds, th, cfg, spec.method,
            reltol=opts.reltol, tf=tf, check_bounds=opts.check_bounds,
            is_rest=is_rest, is_temperature_hold=is_temperature_hold,
            stop_fn=opts.stop_function)
        prev = jax.tree_util.tree_map(
            lambda a, b: jnp.where(acc, a, b), prev, rs.prev)
        flag = jnp.where(acc, flag, rs.flag)
        flag = jnp.where(st.status != bdf.OK, EXIT_FAILED, flag)

        new_rs = RunnerState(
            bdf=st, soc=soc, prev=prev, flag=flag,
            save_idx=rs.save_idx + acc.astype(jnp.int32), bufs=bufs,
            y_prev=jnp.where(acc, y_prev, rs.y_prev),
            yp_prev=jnp.where(acc, yp_prev, rs.yp_prev),
            t_prev=jnp.where(acc, t_prev, rs.t_prev),
            soc_prev=jnp.where(acc, soc_prev, rs.soc_prev))
        return new_rs, keep

    K_REUSE = int(getattr(opts, "jac_reuse", 0))

    if K_REUSE == 0:
        # legacy: a fresh factorization inside every step attempt
        def body(rs: RunnerState):
            return trip(rs, None, None)[0]
    else:
        # IDA-style reuse: factor once per chunk, take up to K_REUSE
        # accepted steps with it (stale-matrix Newton damped by cjratio),
        # refactor when the leading coefficient drifts / Newton degrades /
        # a discontinuity re-init fires. Under vmap the while_loop batching
        # rule freezes per-cell carries whose cond is False, so cells drift
        # out of a chunk independently at no extra cost.
        def body(rs: RunnerState):
            _, _, t_new, y_pred, c0_f, psi_over_h = bdf.predict(
                rs.bdf, t_bound_of(rs.bdf), 1e-10, hmax)
            J_lu = jac_and_factor(t_new, y_pred, c0_f, psi_over_h)

            def icond(carry):
                rs_, j, keep = carry
                return (keep & (j < K_REUSE) & cond(rs_)
                        & bdf.cj_ok(rs_.bdf, t_bound_of(rs_.bdf), c0_f,
                                    hmax=hmax))

            def ibody(carry):
                rs_, j, _ = carry
                rs2, keep2 = trip(rs_, J_lu, c0_f)
                return rs2, j + 1, keep2

            rs1, keep1 = trip(rs, J_lu, c0_f)
            rs2, _, _ = jax.lax.while_loop(
                icond, ibody, (rs1, jnp.asarray(1, jnp.int32), keep1))
            return rs2

    rs = jax.lax.while_loop(cond, body, rs0)

    # ---- exit handling -------------------------------------------------------
    flag = rs.flag
    # ran out of iterations / buffer without hitting any condition
    flag = jnp.where(flag == EXIT_SIMULATING,
                     jnp.where(rs.bdf.t >= tf, 0, EXIT_FAILED), flag)

    y_last = rs.bdf.D[0]
    yp_last = rs.bdf.yp
    t_last = rs.bdf.t
    soc_last = rs.soc
    last_idx = jnp.minimum(rs.save_idx - 1, opts.max_save - 1)

    # back-interpolate the final point to the bound crossing. The reference
    # interpolates *linearly* inside the firing step (interp_final_points!,
    # model_evaluation.jl:369-382); here the crossing is re-localized on the
    # BDF dense-output polynomial (solver-order accurate), with the linear
    # t_frac point as fallback when the bracket is degenerate.
    do_interp = (opts.interp_final & (flag > 0) & (t_last > 1.0)
                 & (rs.save_idx > 1))
    frac = rs.prev.t_frac
    t_lin = rs.t_prev + frac * (t_last - rs.t_prev)

    def soc_at(t, y):
        # same trapezoid rule as the in-loop SOC update
        return (rs.soc_prev
                + 0.5 * (t - rs.t_prev) * (L.I(y) + L.I(rs.y_prev)) / 3600.0)

    # "crossed" margin g(t) per exit code (checks.jl flag codes 1-11);
    # g > 0 once the bound is exceeded. Branches for inactive physics are
    # stubbed (their codes can never fire).
    def _stub(t, y, yp, soc):
        return jnp.asarray(1.0, dtype)

    def _g_T(t, y, yp, soc):
        return (events._mean_T(L.get(y, "T"), th, cfg) + th["T_amb"]
                - bounds["T_max"])

    def _g_dfilm(t, y, yp, soc):
        return jnp.max(yp[L.sl("film")]) - bounds["dfilm_max"]

    # a signed-margin stop_function (events.py flag 12) localizes exactly
    # like the built-in bounds; boolean hooks keep reference semantics
    # (stop on the accepted step, no bisection). Decided at trace time.
    stop_is_margin = False
    if opts.stop_function is not None:
        probe = jnp.asarray(opts.stop_function(
            jnp.asarray(0.0, dtype), y0, yp0, jnp.asarray(soc0, dtype), th))
        stop_is_margin = probe.dtype != jnp.bool_

    def _g_stop(t, y, yp, soc):
        return jnp.asarray(opts.stop_function(t, y, yp, soc, th), dtype)

    g_branches = [
        lambda t, y, yp, soc: bounds["V_min"] - L.V(y),                # 1
        lambda t, y, yp, soc: L.V(y) - bounds["V_max"],                # 2
        lambda t, y, yp, soc: bounds["SOC_min"] - soc,                 # 3
        lambda t, y, yp, soc: soc - bounds["SOC_max"],                 # 4
        _g_T if cfg.numerics.temperature else _stub,                   # 5
        (lambda t, y, yp, soc: (jnp.max(L.c_s_surf(y, "n"))
                                - bounds["c_s_n_max"] * th["c_max_n"]))
        if not L.half_cell else _stub,                                 # 6
        lambda t, y, yp, soc: L.I(y) - bounds["I_max"],                # 7
        lambda t, y, yp, soc: bounds["I_min"] - L.I(y),                # 8
        lambda t, y, yp, soc: bounds["c_e_min"] - jnp.min(L.get(y, "c_e")),  # 9
        _g_dfilm if cfg.numerics.aging == "SEI" else _stub,            # 10
        lambda t, y, yp, soc: bounds["eta_plating_min"] - L.eta_plating(y),  # 11
        _g_stop if stop_is_margin else _stub,                          # 12
    ]
    code_idx = jnp.clip(flag - 1, 0, 11)

    def g_at(t):
        y, yp = bdf.dense_eval(rs.bdf.D, rs.bdf.h, rs.bdf.order, t_last, t)
        return jax.lax.switch(code_idx, g_branches, t, y, yp, soc_at(t, y))

    localizable = (flag >= 1) & (flag <= (12 if stop_is_margin else 11))
    g_lo = g_at(rs.t_prev)
    use_bisect = do_interp & localizable & (g_lo < 0)

    def bisect_body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        crossed = g_at(mid) > 0
        return (jnp.where(crossed, lo, mid), jnp.where(crossed, mid, hi))

    lo0 = jnp.where(use_bisect, rs.t_prev, t_lin)
    hi0 = jnp.where(use_bisect, t_last, t_lin)
    _, t_ref = jax.lax.fori_loop(0, 40, bisect_body, (lo0, hi0))

    t_f = jnp.where(do_interp, jnp.where(use_bisect, t_ref, t_lin), t_last)
    y_f, yp_f = bdf.dense_eval(rs.bdf.D, rs.bdf.h, rs.bdf.order, t_last, t_f)
    # dense_eval at t_last reproduces (y_last, yp_last) exactly (θ = 0)
    soc_f = jnp.where(do_interp, soc_at(t_f, y_f), soc_last)

    bufs = jax.tree_util.tree_map(lambda b: b, rs.bufs)
    bufs = _record(bufs, last_idx, t_f, y_f, yp_f, soc_f, th, cfg, vec_outs)

    return RunResultDev(
        bufs=bufs, n_saved=jnp.minimum(rs.save_idx, opts.max_save), flag=flag,
        y0_run=y0,
        y_final=y_f, yp_final=yp_f, soc_final=soc_f, t_final=t_f,
        n_steps=rs.bdf.n_steps, n_rejected=rs.bdf.n_rejected,
        init_converged=init.converged,
        # the ring-clamp overwrote the last slot at least once: save_idx
        # counts 1 (initial point) + accepted steps, so exceeding max_save
        # means accepted points were dropped from the record (the solver
        # trajectory itself is unaffected)
        truncated=rs.save_idx > opts.max_save)
