"""Single-cell latency: wall time for ONE full 1C discharge (BASELINE
target #3 — the reference's ~3 ms/discharge on one laptop core,
/root/reference/README.md:8, getting_started.ipynb @benchmark median
2.616 ms).

Two honest numbers, because the remote-TPU tunnel adds a per-execution
round-trip that a locally-attached chip would not pay:

  * latency_b1_ms      — median wall per B=1 execution (cumulative wall
                         over reps/“queue depth”; fresh θ each rep to
                         defeat the tunnel's (program, inputs)
                         memoization). Upper bound: includes tunnel RTT.
  * amortized_b1024_ms — per-cell wall at B=1024 in the same process
                         (the deployment-relevant number for sweeps).
  * single_cell_latency_on_device_ms — the ON-DEVICE per-discharge wall
                         with the tunnel RTT cancelled (round-4 VERDICT
                         directive 6): K SEQUENTIAL B=1 discharges are
                         chained inside ONE jit (lax.fori_loop over a
                         (K,)-batched θ table, each iteration a full
                         run_once), so one execution pays the RTT once.
                         Two chain lengths K_small/K_big each run in their
                         OWN fresh process (one program per process — the
                         tunnel plateau is per-(process, program)); the
                         slope (wall_big − wall_small)/(K_big − K_small)
                         cancels RTT + dispatch exactly.

On CPU (JAX_PLATFORMS=cpu) there is no tunnel; latency_b1_ms is a true
local latency for the same code path.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_MS = 2.616

# chain lengths for the on-device slope (each in its own child process)
K_SMALL = int(os.environ.get("LATENCY_K_SMALL", "8"))
K_BIG = int(os.environ.get("LATENCY_K_BIG", "40"))


def _make_p(pt):
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    return p


def chain_child(K: int):
    """One fresh process timing a K-long sequential chain of B=1 discharges
    inside one jit. Emits {"K": K, "wall_s_per_exec": median}."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", False)
    from bench import backend_is_live, fresh_theta
    if not backend_is_live():
        jax.config.update("jax_platforms", "cpu")
    import petlion_tpu as pt
    from petlion_tpu.parallel.batch import _prepare_batch
    from petlion_tpu.solver.run import run_once

    platform = jax.devices()[0].platform
    p = _make_p(pt)
    rng0 = np.random.default_rng(0)
    args, statics = _prepare_batch(p, 3.9e3, I=-1.0, SOC=1.0,
                                   theta_batch=fresh_theta(rng0, K),
                                   outputs=("t", "V"))
    y_start, soc_b, value, tf, th, bdict, _ = args
    th_axes = dict(statics["th_axes"])
    batched = sorted(k for k, a in th_axes.items() if a == 0)

    def chain(y0s, socs, th_):
        def body(i, acc):
            th_i = {k: (v[i] if th_axes.get(k) == 0 else v)
                    for k, v in th_.items()}
            r = run_once(y_start=y0s[i], soc0=socs[i], value=value,
                         tf=tf, th=th_i, bounds=bdict,
                         cfg=statics["cfg"], spec=statics["spec"],
                         opts=statics["opts"],
                         is_rest=statics["is_rest"],
                         is_temperature_hold=statics["is_temperature_hold"],
                         jac_plan=statics["jac_plan"])
            return acc + r.t_final + r.n_steps.astype(r.t_final.dtype)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), y0s.dtype))

    jitted = jax.jit(chain)

    def run(seed):
        # fresh θ per execution — the tunnel memoizes (program, inputs)
        rng = np.random.default_rng(seed)
        f = fresh_theta(rng, K)
        th2 = {**th, **{k: jnp.asarray(f[k], y_start.dtype)
                        for k in batched if k in f}}
        out = jitted(y_start, soc_b, th2)
        jax.block_until_ready(out)
        return out

    t0 = time.time()
    run(0)
    compile_s = time.time() - t0
    # warm until the per-exec wall stabilizes (last-3 spread < 10%)
    warm = []
    for i in range(20 if platform != "cpu" else 2):
        t0 = time.time()
        run(1 + i)
        warm.append(time.time() - t0)
        if len(warm) >= 8 and max(warm[-3:]) / min(warm[-3:]) < 1.10:
            break
    blocks, reps = (5, 4) if platform != "cpu" else (1, 1)
    walls = []
    for b in range(blocks):
        t0 = time.time()
        for i in range(reps):
            run(1000 + b * reps + i)
        walls.append((time.time() - t0) / reps)
    print(json.dumps({"K": K, "wall_s_per_exec": float(np.median(walls)),
                      "walls_s": [round(w, 4) for w in walls],
                      "compile_s": round(compile_s, 1),
                      "warmup_reps": len(warm), "platform": platform}))


def _chain_slope():
    """Run the two chain children serially; return the slope record."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    recs = {}
    for K in (K_SMALL, K_BIG):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--chain-child", str(K)],
                capture_output=True, text=True, timeout=1800, env=env)
        except subprocess.TimeoutExpired:
            return {"error": f"chain child K={K} timed out"}
        line = next((ln for ln in reversed(r.stdout.strip().splitlines())
                     if ln.startswith("{")), None)
        if line is None:
            return {"error": f"chain child K={K} emitted no JSON",
                    "stderr_tail": r.stderr[-400:]}
        recs[K] = json.loads(line)
    dw = recs[K_BIG]["wall_s_per_exec"] - recs[K_SMALL]["wall_s_per_exec"]
    per = dw / (K_BIG - K_SMALL)
    return {"single_cell_latency_on_device_ms": round(per * 1e3, 3),
            "chain_K": [K_SMALL, K_BIG],
            "chain_wall_s_per_exec": [
                round(recs[K_SMALL]["wall_s_per_exec"], 4),
                round(recs[K_BIG]["wall_s_per_exec"], 4)],
            "chain_walls_s": {str(k): recs[k]["walls_s"] for k in recs}}


def main():
    # the on-device chain slope runs FIRST, in child processes, before this
    # process claims the TPU tunnel (ONE process may hold it at a time)
    chain = _chain_slope()

    import jax
    jax.config.update("jax_enable_x64", False)
    from bench import backend_is_live, make_runner
    if not backend_is_live():
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"warning": "TPU backend probe timed out; "
                          "falling back to CPU"}), flush=True)
    import petlion_tpu as pt

    platform = jax.devices()[0].platform
    p = _make_p(pt)

    _runners = {}

    def run(B, seed):
        # canonical program (bench.make_runner), one runner per batch size
        if B not in _runners:
            _runners[B] = make_runner(p, B)
        return _runners[B](seed)

    # ---- B=1 latency ------------------------------------------------------
    reps = 30 if platform != "cpu" else 5
    run(1, 0)                         # compile
    for i in range(10 if platform != "cpu" else 2):   # tunnel warmup
        run(1, 1 + i)
    # cumulative wall over blocks of reps (per-call timers lie through the
    # tunnel); median block
    block_ms = []
    for b in range(5):
        t0 = time.time()
        for i in range(reps):
            run(1, 100 + b * reps + i)
        block_ms.append((time.time() - t0) * 1e3 / reps)
    lat_b1 = float(np.median(block_ms))

    # ---- amortized at B=1024 ---------------------------------------------
    B = 1024 if platform != "cpu" else 32
    run(B, 0)
    for i in range(8 if platform != "cpu" else 1):
        run(B, 1 + i)
    t0 = time.time()
    nrep = 10 if platform != "cpu" else 2
    for i in range(nrep):
        run(B, 200 + i)
    amort = (time.time() - t0) * 1e3 / (nrep * B)

    out = {
        "metric": "single_cell_latency",
        "value": round(lat_b1, 2),
        "unit": "ms",
        "vs_baseline": round(REF_MS / lat_b1, 3),   # >1 = faster than ref
        "latency_b1_ms": round(lat_b1, 2),
        "latency_b1_blocks_ms": [round(t, 2) for t in block_ms],
        "amortized_b1024_ms": round(amort, 4),
        "amortized_batch": B,
        "platform": platform,
        "note": "b1 includes remote-tunnel RTT on TPU; on_device is the "
                "RTT-cancelled chained slope; amortized is the "
                "sweep-deployment number",
        **chain,
    }
    if "single_cell_latency_on_device_ms" in out:
        odv = out["single_cell_latency_on_device_ms"]
        out["vs_baseline_on_device"] = round(REF_MS / max(odv, 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--chain-child" in sys.argv:
        chain_child(int(sys.argv[sys.argv.index("--chain-child") + 1]))
    else:
        main()
