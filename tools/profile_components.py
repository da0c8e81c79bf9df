"""Component-level TPU timing of the hot path — dispatch-free differential
methodology (round 4).

Round-3's version timed ONE component execution per dispatch, which through
the remote-TPU tunnel measures mostly per-execution overhead (measured
r04: one batched residual "took" 1.6 ms while the full factorization —
which contains 10 residual-sized JVP sweeps — "took" 0.1 ms; both numbers
are dispatch artifacts, not device time).

Here each component runs K times INSIDE one jitted `lax.fori_loop` (inputs
perturbed per iteration so no two iterations are identical, accumulator
carried so nothing is DCE'd), the whole execution is timed at two loop
lengths, and the per-component device cost is the slope:

    cost = (wall(K_big) - wall(K_small)) / (K_big - K_small)

which cancels dispatch/roundtrip exactly. Components, per batch of B=1024
cells (vmapped, f32, fresh-random inputs per rep):

  residual   one full-system residual evaluation
  sweeps     the 10 colored JVP sweeps + exact control row (compressed J)
  factor     factor_compressed = sweeps + multi-group sparse Schur factor
  solve      one sparse_schur_solve against a stored factorization
  newton4    4 x (residual + solve) — the Newton body without control flow
  init       consistent initialization (own inner Newton while_loop)
  run        the full discharge (reference point; per-attempt wall derived
             from mean attempts)

Prints one JSON line. Run alone (no other TPU/CPU jobs). The tunnel
degrades a process that interleaves several compiled programs, so
trustworthy numbers come from one fresh process per component:

    for c in residual sweeps factor solve newton4 init run; do
        python tools/profile_components.py --only $c
    done
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1024
REPS = 10
WARM = 6
K_SMALL = 4
K_BIG = 20


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

    def _factor_one(th_, y_, yp_, c0_):
        F = F_of(th_)
        const = yp_ - c0_ * y_

        def g(yy):
            return F(100.0, yy, c0_ * yy + const)
        return plan.factor_compressed(g, y_)

    def _sweeps_one(th_, y_, yp_, c0_):
        F = F_of(th_)
        const = yp_ - c0_ * y_

        def g(yy):
            return F(100.0, yy, c0_ * yy + const)
        JS, last = plan.colored.compressed(g, y_)
        return JS.sum() + last.sum()

    @jax.jit
    def k_factor_full(th, y, yp, c0):
        return jax.vmap(_factor_one, in_axes=(AXES, 0, 0, 0))(th, y, yp, c0)

    def _tree_sum(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))

    # ---- K-looped component programs --------------------------------------
    # Each body perturbs its inputs with the loop index (no two iterations
    # identical, nothing hoistable) and folds the result into the carried
    # accumulator (nothing DCE-able). Returned value is one scalar.

    def make_residual(K):
        @jax.jit
        def k(th, y, yp):
            def body(i, acc):
                yi = y * (1.0 + 1e-5 * (i + 1).astype(dtype))
                r = jax.vmap(lambda th_, y_, yp_: F_of(th_)(100.0, y_, yp_),
                             in_axes=(AXES, 0, 0))(th, yi, yp)
                return acc + r.sum()
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
        return k

    def make_sweeps(K):
        @jax.jit
        def k(th, y, yp, c0):
            def body(i, acc):
                yi = y * (1.0 + 1e-5 * (i + 1).astype(dtype))
                s = jax.vmap(_sweeps_one, in_axes=(AXES, 0, 0, 0))(
                    th, yi, yp, c0)
                return acc + s.sum()
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
        return k

    def make_factor(K):
        @jax.jit
        def k(th, y, yp, c0):
            def body(i, acc):
                yi = y * (1.0 + 1e-5 * (i + 1).astype(dtype))
                fac = jax.vmap(_factor_one, in_axes=(AXES, 0, 0, 0))(
                    th, yi, yp, c0)
                return acc + _tree_sum(fac)
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
        return k

    def make_solve(K):
        @jax.jit
        def k(fac, b):
            def body(i, acc):
                bi = b * (1.0 + 1e-5 * (i + 1).astype(dtype))
                x = jax.vmap(plan.solve)(fac, bi)
                return acc + x.sum()
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
        return k

    def make_newton4(K):
        @jax.jit
        def k(th, y, yp, c0, fac, b):
            def body(i, acc):
                yi = y * (1.0 + 1e-5 * (i + 1).astype(dtype))

                def one(th_, y_, yp_, c0_, fac_, b_):
                    d = b_ * 0.0

                    def nbody(j, d):
                        r = F_of(th_)(100.0, y_ + d, c0_ * d + yp_)
                        return d + plan.solve(fac_, -r)
                    return jax.lax.fori_loop(0, 4, nbody, d)
                dd = jax.vmap(one, in_axes=(AXES, 0, 0, 0, 0, 0))(
                    th, yi, yp, c0, fac, b)
                return acc + dd.sum()
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
        return k

    def make_init(K):
        @jax.jit
        def k(th, y):
            def body(i, acc):
                yi = y * (1.0 + 1e-5 * (i + 1).astype(dtype))

                def one(th_, y_):
                    return consistent_init(F_of(th_), y_, cfg.layout.N_diff,
                                           reltol_init=1e-3, maxiter=100,
                                           jac_plan=plan)
                r = jax.vmap(one, in_axes=(AXES, 0))(th, yi)
                return acc + r.y.sum() + r.yp.sum()
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))
        return k

    MAKERS = {
        "residual": (make_residual, lambda t_, fac: (t_[0], t_[1], t_[2]),
                     False),
        "sweeps": (make_sweeps, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3]),
                   False),
        "factor": (make_factor, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3]),
                   False),
        "solve": (make_solve, lambda t_, fac: (fac, t_[4]), True),
        "newton4": (make_newton4,
                    lambda t_, fac: (t_[0], t_[1], t_[2], t_[3], fac, t_[4]),
                    True),
        "init": (make_init, lambda t_, fac: (t_[0], t_[1]), False),
    }

    out = {"batch": B, "reps": REPS, "k_small": K_SMALL, "k_big": K_BIG}

    def time_component(name):
        if only is not None and name not in only:
            return
        maker, pick, need_fac = MAKERS[name]
        kfns = {K: maker(K) for K in (K_SMALL, K_BIG)}
        base = abs(hash(name)) % 1000 * 100
        walls = {}
        for K in (K_SMALL, K_BIG):
            ins = []
            for s in range(base, base + WARM + REPS):
                t_ = mkbatch(s + K)
                fac = (k_factor_full(t_[0], t_[1], t_[2], t_[3])
                       if need_fac else None)
                jax.block_until_ready(t_[1])
                ins.append(pick(t_, fac))
            if need_fac:
                jax.block_until_ready(ins[-1][0])
            for args in ins[:WARM]:
                jax.block_until_ready(kfns[K](*args))
            ws = []
            for args in ins[WARM:]:
                t0 = time.time()
                jax.block_until_ready(kfns[K](*args))
                ws.append(time.time() - t0)
            walls[K] = float(np.median(ws))
        cost = (walls[K_BIG] - walls[K_SMALL]) / (K_BIG - K_SMALL)
        overhead = walls[K_SMALL] - K_SMALL * cost
        out[name + "_ms"] = round(cost * 1e3, 4)
        out[name + "_dispatch_ms"] = round(overhead * 1e3, 3)
        print(f"{name}: {cost*1e3:.4f} ms/batch "
              f"(dispatch {overhead*1e3:.2f} ms)", flush=True)

    for name in MAKERS:
        time_component(name)

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
