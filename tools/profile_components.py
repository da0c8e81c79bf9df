"""Component-level TPU timing of the hot path (round-3 perf analysis).

Times, per batch of B cells (vmapped, f32, fresh-random inputs per rep,
results kept on device, cumulative wall over many reps — the tunnel-safe
methodology from bench.py; inputs are prebuilt before each timed loop so the
clock sees only the kernel executions):

  residual   one residual evaluation
  factor     factor_compressed (10 colored JVP sweeps + sparse Schur factor
             + core inverse)
  solve      one sparse_schur_solve against a stored factorization
  newton4    4 × (residual + solve) — the Newton loop body without control
  init       consistent initialization
  run        the full discharge (reference point; per-attempt wall derived
             from mean attempts)

Prints one JSON line. Run alone (no other TPU/CPU jobs).

`--only NAME[,NAME...]` restricts to those components — the tunnel degrades
~10x when one process interleaves several compiled programs (CLAUDE.md), so
trustworthy absolute numbers come from one fresh process per component:

    for c in residual factor solve newton4 init run; do
        python tools/profile_components.py --only $c
    done
"""

import json
import sys
import time

import numpy as np

B = 1024
REPS = 20
WARM = 12


def _selected():
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1]
        return set(names.split(","))
    return None


def main():
    only = _selected()
    import jax
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    import petlion_tpu as pt
    from petlion_tpu.ops.plan import get_plan
    from petlion_tpu.physics.initial_guess import initial_guess
    from petlion_tpu.solver import control as ctrl
    from petlion_tpu.solver.newton import consistent_init

    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    plan = get_plan(p.cfg, p.theta)
    cfg = p.cfg
    spec = ctrl.ControlSpec("I")
    dtype = jnp.float32
    th0 = p._theta_dev(dtype)
    AXES = {k: None for k in th0}
    for k in ("D_sp", "D_sn", "k_p", "k_n"):
        AXES[k] = 0
    value = jnp.asarray(-1.0, dtype)

    def mkbatch(seed):
        """Fresh per-cell states + θ leaves (memoization-proof)."""
        rng = np.random.default_rng(seed)
        th = dict(th0)
        for k, v in (("D_sp", 1e-14), ("D_sn", 3.9e-14),
                     ("k_p", 2.334e-11), ("k_n", 5.031e-11)):
            th[k] = jnp.asarray(v * (1 + 0.05 * rng.standard_normal(B)),
                                dtype)
        soc = jnp.asarray(rng.uniform(0.4, 0.9, B), dtype)

        def guess(th_, soc_):
            y = initial_guess(soc_, th_, cfg, dtype)
            return y.at[cfg.layout.sl("I").start].set(-1.0)

        y = jax.vmap(guess, in_axes=(AXES, 0))(th, soc)
        yp = jnp.asarray(
            1e-3 * rng.standard_normal((B, cfg.layout.N_tot)), dtype)
        c0 = jnp.asarray(rng.uniform(0.5, 2.0, B), dtype)
        b = jnp.asarray(rng.standard_normal((B, cfg.layout.N_tot)), dtype)
        return th, y, yp, c0, b

    def F_of(th_):
        def F(t, y, yp):
            return ctrl.full_residual(spec, value, t, y, yp, th_, cfg)
        return F

    # ---- jitted component kernels ----------------------------------------
    @jax.jit
    def k_residual(th, y, yp):
        def one(th_, y_, yp_):
            return F_of(th_)(100.0, y_, yp_)
        return jax.vmap(one, in_axes=(AXES, 0, 0))(th, y, yp).sum()

    def _factor_one(th_, y_, yp_, c0_):
        F = F_of(th_)
        const = yp_ - c0_ * y_

        def g(yy):
            return F(100.0, yy, c0_ * yy + const)
        return plan.factor_compressed(g, y_)

    @jax.jit
    def k_factor(th, y, yp, c0):
        fac = jax.vmap(_factor_one, in_axes=(AXES, 0, 0, 0))(th, y, yp, c0)
        return jax.tree_util.tree_map(lambda a: a.sum(), fac)

    @jax.jit
    def k_factor_full(th, y, yp, c0):
        return jax.vmap(_factor_one, in_axes=(AXES, 0, 0, 0))(th, y, yp, c0)

    @jax.jit
    def k_solve(fac, b):
        return jax.vmap(plan.solve)(fac, b).sum()

    @jax.jit
    def k_newton4(th, y, yp, c0, fac, b):
        def one(th_, y_, yp_, c0_, fac_, b_):
            F = F_of(th_)
            d = b_ * 0.0

            def body(i, d):
                r = F(100.0, y_ + d, c0_ * d + yp_)
                return d + plan.solve(fac_, -r)
            return jax.lax.fori_loop(0, 4, body, d)
        return jax.vmap(one, in_axes=(AXES, 0, 0, 0, 0, 0))(
            th, y, yp, c0, fac, b).sum()

    @jax.jit
    def k_init(th, y):
        def one(th_, y_):
            return consistent_init(F_of(th_), y_, cfg.layout.N_diff,
                                   reltol_init=1e-3, maxiter=100,
                                   jac_plan=plan)
        r = jax.vmap(one, in_axes=(AXES, 0))(th, y)
        return r.y.sum() + r.yp.sum()

    out = {"batch": B, "reps": REPS}

    def time_kernel(name, fn, need_fac=False):
        if only is not None and name not in only:
            return
        seeds = list(range(hash(name) % 1000 * 10,
                           hash(name) % 1000 * 10 + WARM + REPS))
        ins = []
        for s in seeds:
            t_ = mkbatch(s)
            fac = k_factor_full(t_[0], t_[1], t_[2], t_[3]) if need_fac \
                else None
            jax.block_until_ready(t_[1])
            ins.append((t_, fac))
        if need_fac:
            jax.block_until_ready(ins[-1][1])
        for t_, fac in ins[:WARM]:
            jax.block_until_ready(fn(t_, fac))
        t0 = time.time()
        for t_, fac in ins[WARM:]:
            r = fn(t_, fac)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / REPS
        out[name + "_ms"] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms/batch", flush=True)

    time_kernel("residual", lambda t_, fac: k_residual(t_[0], t_[1], t_[2]))
    time_kernel("factor", lambda t_, fac: k_factor(t_[0], t_[1], t_[2],
                                                   t_[3]))
    time_kernel("solve", lambda t_, fac: k_solve(fac, t_[4]), need_fac=True)
    time_kernel("newton4", lambda t_, fac: k_newton4(
        t_[0], t_[1], t_[2], t_[3], fac, t_[4]), need_fac=True)
    time_kernel("init", lambda t_, fac: k_init(t_[0], t_[1]))

    # ---- full run reference ----------------------------------------------
    if only is not None and "run" not in only:
        print(json.dumps(out), flush=True)
        return

    from bench import make_runner
    k_run = make_runner(p, B)   # the canonical timed program (bench.py)

    k_run(0)
    for i in range(10):
        k_run(1 + i)
    runs = 5
    kept = []
    t0 = time.time()
    for i in range(runs):
        kept.append(k_run(50 + i))
    wall = (time.time() - t0) / runs
    atts = sum(int(np.asarray(r.n_steps).sum()
                   + np.asarray(r.n_rejected).sum()) for r in kept)
    out["run_ms"] = round(wall * 1e3, 1)
    out["attempts_per_cell"] = round(atts / runs / B, 1)
    out["per_attempt_us_batch"] = round(wall * 1e6 / (atts / runs / B), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
