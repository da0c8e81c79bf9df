"""Component-level TPU timing of the hot path — chained-fetch differential
methodology (round 4, rev 2).

Two failed methodologies led here (keep for the archaeology):
  * rev 0 (round 3) timed ONE component execution per dispatch — through
    the remote-TPU tunnel that measures per-execution overhead (~25 ms),
    not device time.
  * rev 1 timed per-call `block_until_ready` on a K-iteration fori_loop.
    Measured walls of 0.03-0.08 ms for programs that must cost ≥ one
    tunnel round trip prove the sync does NOT reliably block for fetchless
    submissions (bench.py's round-4 calibration found the same: queued
    work drains into later calls). Slopes came out ~0 or negative.

rev 2 uses the methodology bench.py's canary validated: every call CARRIES
a scalar accumulator (call i+1 consumes call i's output, so the chain
serializes on device), the session is timed around N chained calls plus
ONE final scalar fetch, and the per-iteration device cost is the slope
between two loop lengths K:

    cost = (wall_chain(K_big) - wall_chain(K_small)) / (N * (K_big - K_small))

The fetch and all dispatch overheads are K-independent and cancel in the
slope. Inputs are fresh-random per call (memoization-proof), staged on
device before the clock starts.

Because one device→host fetch can poison a program's subsequent in-process
performance (bench.py calibration: program-specific, 13k/s → 1.1k/s), each
(component, K) session runs in a FRESH subprocess; the parent orchestrates
and computes slopes without importing jax. Each child emits 3 chained
blocks (fetch per block) so poisoning-after-first-fetch would be visible
as block-1-fast / blocks-2-3-slow; the child reports min-block wall.

Components, per batch of B=1024 cells (vmapped, f32):

  residual   one full-system residual evaluation
  sweeps     the 10 colored JVP sweeps + exact control row (compressed J)
  factor     factor_compressed = sweeps + multi-group sparse Schur factor
  solve      one sparse_schur_solve against a stored factorization
  newton4    4 x (residual + solve) — the Newton body without control flow
  init       consistent initialization (own inner Newton while_loop)
  run        the full discharge (reference point; per-attempt wall derived
             from mean attempts; timed exactly like bench.py)

Usage:
    python tools/profile_components.py                 # all components
    python tools/profile_components.py --only factor   # one component
    python tools/profile_components.py --child factor 4   # internal
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROFILE_B", "1024"))
N_CHAIN = int(os.environ.get("PROFILE_N_CHAIN", "8"))   # calls per block
BLOCKS = int(os.environ.get("PROFILE_BLOCKS", "3"))     # blocks per child
K_SMALL = int(os.environ.get("PROFILE_K_SMALL", "4"))
K_BIG = int(os.environ.get("PROFILE_K_BIG", "24"))

COMPONENTS = ("residual", "sweeps", "jaca", "factor", "factora", "solve",
              "newton4", "init")


def _build(name, K):
    """Build (kfn, inputs) for one component child. kfn(acc, *args) -> acc'
    folds the component's K-iteration result into the carried scalar."""
    import jax
    jax.config.update("jax_enable_x64", False)
    if os.environ.get("PROFILE_PLATFORM"):   # CPU smoke-testing hook
        jax.config.update("jax_platforms", os.environ["PROFILE_PLATFORM"])
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

    def _jaca_one(th_, y_, yp_, c0_):
        """Analytic assembly of the same compressed Jacobian (r05)."""
        F = F_of(th_)
        const = yp_ - c0_ * y_

        def g(yy):
            return F(100.0, yy, c0_ * yy + const)
        JS, last = plan.analytic.compressed(100.0, y_, c0_, th_, g)
        return JS.sum() + last.sum()

    def _factora_one(th_, y_, yp_, c0_):
        """factor_compressed on the analytic path (r05)."""
        F = F_of(th_)
        const = yp_ - c0_ * y_

        def g(yy):
            return F(100.0, yy, c0_ * yy + const)
        return plan.factor_compressed(g, y_, t=100.0, c0=c0_, th=th_)

    @jax.jit
    def k_factor_full(th, y, yp, c0):
        return jax.vmap(_factor_one, in_axes=(AXES, 0, 0, 0))(th, y, yp, c0)

    def _tree_sum(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))

    # ---- acc-carried K-looped component programs --------------------------
    # The loop body perturbs its inputs with BOTH the loop index and the
    # carried acc (so no iteration is hoistable/CSE-able and consecutive
    # chained calls are data-dependent), and folds the result back into acc.

    def _perturb(x, i, acc):
        # acc is O(sum of residuals); tanh keeps the perturbation bounded
        return x * (1.0 + 1e-6 * (i + 1).astype(x.dtype)
                    + 1e-9 * jnp.tanh(acc))

    def make_residual():
        @jax.jit
        def k(acc, th, y, yp):
            def body(i, a):
                yi = _perturb(y, i, a)
                r = jax.vmap(lambda th_, y_, yp_: F_of(th_)(100.0, y_, yp_),
                             in_axes=(AXES, 0, 0))(th, yi, yp)
                return a + jnp.tanh(r.sum())
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1], t_[2]), False

    def make_sweeps():
        @jax.jit
        def k(acc, th, y, yp, c0):
            def body(i, a):
                yi = _perturb(y, i, a)
                s = jax.vmap(_sweeps_one, in_axes=(AXES, 0, 0, 0))(
                    th, yi, yp, c0)
                return a + jnp.tanh(s.sum())
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3]), False

    def make_factor():
        @jax.jit
        def k(acc, th, y, yp, c0):
            def body(i, a):
                yi = _perturb(y, i, a)
                fac = jax.vmap(_factor_one, in_axes=(AXES, 0, 0, 0))(
                    th, yi, yp, c0)
                return a + jnp.tanh(_tree_sum(fac))
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3]), False

    def make_jaca():
        @jax.jit
        def k(acc, th, y, yp, c0):
            def body(i, a):
                yi = _perturb(y, i, a)
                s = jax.vmap(_jaca_one, in_axes=(AXES, 0, 0, 0))(
                    th, yi, yp, c0)
                return a + jnp.tanh(s.sum())
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3]), False

    def make_factora():
        @jax.jit
        def k(acc, th, y, yp, c0):
            def body(i, a):
                yi = _perturb(y, i, a)
                fac = jax.vmap(_factora_one, in_axes=(AXES, 0, 0, 0))(
                    th, yi, yp, c0)
                return a + jnp.tanh(_tree_sum(fac))
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3]), False

    def make_solve():
        @jax.jit
        def k(acc, fac, b):
            def body(i, a):
                bi = _perturb(b, i, a)
                x = jax.vmap(plan.solve)(fac, bi)
                return a + jnp.tanh(x.sum())
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (fac, t_[4]), True

    def make_newton4():
        @jax.jit
        def k(acc, th, y, yp, c0, fac, b):
            def body(i, a):
                yi = _perturb(y, i, a)

                def one(th_, y_, yp_, c0_, fac_, b_):
                    d = b_ * 0.0

                    def nbody(j, d):
                        r = F_of(th_)(100.0, y_ + d, c0_ * d + yp_)
                        return d + plan.solve(fac_, -r)
                    return jax.lax.fori_loop(0, 4, nbody, d)
                dd = jax.vmap(one, in_axes=(AXES, 0, 0, 0, 0, 0))(
                    th, yi, yp, c0, fac, b)
                return a + jnp.tanh(dd.sum())
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1], t_[2], t_[3], fac, t_[4]), \
            True

    def make_init():
        @jax.jit
        def k(acc, th, y):
            def body(i, a):
                yi = _perturb(y, i, a)

                def one(th_, y_):
                    return consistent_init(F_of(th_), y_, cfg.layout.N_diff,
                                           reltol_init=1e-3, maxiter=100,
                                           jac_plan=plan)
                r = jax.vmap(one, in_axes=(AXES, 0))(th, yi)
                return a + jnp.tanh(r.y.sum() + r.yp.sum())
            return jax.lax.fori_loop(0, K, body, acc)
        return k, lambda t_, fac: (t_[0], t_[1]), False

    makers = {"residual": make_residual, "sweeps": make_sweeps,
              "jaca": make_jaca, "factor": make_factor,
              "factora": make_factora, "solve": make_solve,
              "newton4": make_newton4, "init": make_init}
    kfn, pick, need_fac = makers[name]()

    # one extra block of inputs for the compile+warm chain (never reused in
    # a timed block — the tunnel memoizes identical (program, inputs))
    base = (COMPONENTS.index(name) + 1) * 100_000 + K * 1000
    staged = []
    for s in range(base, base + (BLOCKS + 1) * N_CHAIN):
        t_ = mkbatch(s)
        fac = (k_factor_full(t_[0], t_[1], t_[2], t_[3])
               if need_fac else None)
        staged.append(pick(t_, fac))
    # force the staging (incl. the fac programs) to finish before timing
    import jax as _jax
    probe = sum(float(np.asarray(_jax.numpy.sum(args[1][..., :1])))
                for args in staged[:1])
    assert np.isfinite(probe)
    return kfn, staged


def child(name, K):
    import jax
    import jax.numpy as jnp
    kfn, staged = _build(name, K)
    dtype = jnp.float32

    # compile + warm: a full chained block on dedicated inputs (the last
    # staged block), one fetch — drains the staging queue and reaches the
    # tunnel's steady state before the timed blocks
    t0 = time.time()
    acc = jnp.asarray(0.0, dtype)
    for args in staged[BLOCKS * N_CHAIN:]:
        acc = kfn(acc, *args)
    float(acc)
    compile_s = time.time() - t0

    walls = []
    for b in range(BLOCKS):
        args_block = staged[b * N_CHAIN:(b + 1) * N_CHAIN]
        acc = jnp.asarray(0.0, dtype)
        t0 = time.time()
        for args in args_block:
            acc = kfn(acc, *args)
        v = float(acc)          # the one sync of the block
        walls.append(time.time() - t0)
        assert np.isfinite(v), (name, K, b)
    print(json.dumps({"component": name, "K": K, "batch": B,
                      "n_chain": N_CHAIN,
                      "block_walls_s": [round(w, 4) for w in walls],
                      "wall_s": round(min(walls), 4),
                      "compile_s": round(compile_s, 1)}), flush=True)


def run_reference(out):
    """Full-discharge reference point, timed exactly like bench.py
    (fetch-free blocks, fetch after the clock)."""
    import jax
    jax.config.update("jax_enable_x64", False)
    import petlion_tpu as pt
    from bench import make_runner
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    k_run = make_runner(p, B)
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


def _last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        return child(sys.argv[i + 1], int(sys.argv[i + 2]))

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    out = {"batch": B, "n_chain": N_CHAIN, "k_small": K_SMALL,
           "k_big": K_BIG}
    me = os.path.abspath(__file__)
    for name in COMPONENTS:
        if only is not None and name not in only:
            continue
        walls = {}
        detail = {}
        for K in (K_SMALL, K_BIG):
            r = subprocess.run([sys.executable, me, "--child", name, str(K)],
                               capture_output=True, text=True, timeout=1800)
            j = _last_json(r.stdout)
            if r.returncode != 0 or j is None:
                print(json.dumps({"component": name, "K": K, "error":
                                  (r.stdout[-800:] + r.stderr[-800:])}),
                      flush=True)
                walls = None
                break
            walls[K] = j["wall_s"]
            detail[K] = j
            time.sleep(15)   # let the tunnel settle between children
        if not walls:
            continue
        cost = (walls[K_BIG] - walls[K_SMALL]) / (
            N_CHAIN * (K_BIG - K_SMALL))
        out[name + "_ms"] = round(cost * 1e3, 4)
        out[name + "_blocks"] = {str(K): detail[K]["block_walls_s"]
                                 for K in (K_SMALL, K_BIG)}
        print(f"{name}: {cost*1e3:.4f} ms/batch  "
              f"(chain walls {walls[K_SMALL]:.3f}s @K={K_SMALL}, "
              f"{walls[K_BIG]:.3f}s @K={K_BIG})", flush=True)

    if only is None or "run" in (only or set()):
        r = subprocess.run([sys.executable, me, "--run-child"],
                           capture_output=True, text=True, timeout=1800)
        j = _last_json(r.stdout)
        if j:
            out.update(j)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--run-child" in sys.argv:
        run_reference({})
    else:
        main()
