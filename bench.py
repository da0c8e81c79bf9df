"""Benchmark: batched full P2D 1C discharges per second on TPU.

Headline metric, matching BASELINE.md's throughput target: complete LCO
isothermal 1C CC discharges (301-DAE cells, SOC 1 → V_min/SOC_min exit, the
reference's getting_started benchmark config) per wall-clock second, batched
over cells with perturbed parameters.

vs_baseline compares against the reference's single-cell rate: PETLION.jl's
BenchmarkTools median of 2.616 ms/discharge on one laptop core
(examples/getting_started.ipynb) → 382.3 discharges/s.

Measurement methodology (hard-won; the remote-TPU tunnel breaks naive
timing in BOTH directions — full notes in CLAUDE.md):
  * fresh-random θ for every swept leaf, every execution (identical
    (program, inputs) pairs can be memoized → phantom-fast);
  * `block_until_ready` does NOT actually block through the tunnel
    (measured: a 1-TFLOP program "completes" in 0.1 ms; the result fetch
    blocks) — but executions of one program serialize at the tunnel's
    queue depth, so CUMULATIVE wall over ≥15 reps is correct to ±1 rep;
    never trust per-call timers;
  * results stay on device during timed blocks (one device→host fetch
    costs ~0.5 s and knocks the tunnel out of its steady-state path);
  * the tunnel's throughput drifts between plateaus over minutes
    (measured round 3: the same program + same step counts spans
    6.7k–13k/s across sessions, and a process that interleaves several
    compiled programs degrades ~10x until restarted) — so this benchmark
    MUST run in a fresh single-program process, and the headline is the
    MEDIAN over many blocks, all block rates emitted for audit.

Prints ONE JSON line.
"""

import json
import subprocess
import sys
import time

import numpy as np

REFERENCE_RATE = 1000.0 / 2.616   # discharges/s, reference median

# the θ leaves every harness perturbs (GITT-style ±5% sweep)
SWEPT_THETA = {"D_sp": 1e-14, "D_sn": 3.9e-14,
               "k_p": 2.334e-11, "k_n": 5.031e-11}


def fresh_theta(rng, B):
    """±5% perturbed values for every swept θ leaf — fresh per execution
    (the tunnel memoizes identical (program, inputs) pairs)."""
    return {k: v * (1 + 0.05 * rng.standard_normal(B))
            for k, v in SWEPT_THETA.items()}


def make_runner(p, B, mesh=None):
    """The canonical timed program, shared by every benchmark harness
    (bench_suite, bench_multichip, tools/*): one batched LCO 1C discharge
    (tf=3.9e3, outputs t/V) with fresh-random θ per call. Harnesses must
    use this one definition so their rates compare the same program."""
    import jax
    from petlion_tpu.parallel.batch import batch_simulate

    def run(seed):
        rng = np.random.default_rng(seed)
        res = batch_simulate(p, 3.9e3, I=-1.0, SOC=1.0,
                             theta_batch=fresh_theta(rng, B),
                             mesh=mesh, outputs=("t", "V"))
        jax.block_until_ready(res.flag)
        return res

    return run


CANARY_N, CANARY_ITERS = 2048, 60   # 2*60*2048^3 ~ 1.03 TFLOP per call


def make_canary():
    """Fixed pure-MXU reference program (fresh inputs per call — the tunnel
    memoizes identical (program, inputs) pairs). Its per-call TFLOP/s is the
    tunnel-speed covariate: if the tunnel drifts to a slow plateau, the
    canary slows with it (proportional degradation verified on hardware,
    tools/canary_probe.py round-4 run), so block rates can be audited
    against the canary instead of trusted blindly."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def canary(x):
        return jax.lax.fori_loop(
            0, CANARY_ITERS, lambda i, a: jnp.tanh(a @ x), x)

    flops = 2.0 * CANARY_ITERS * CANARY_N ** 3

    def run_canary(seed):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((CANARY_N, CANARY_N)) * 0.01,
                        jnp.float32)
        jax.block_until_ready(x)
        t0 = time.time()
        jax.block_until_ready(canary(x))
        return flops / (time.time() - t0) / 1e12

    return run_canary


def backend_is_live(timeout_s: float = 300.0) -> bool:
    """Probe the default JAX backend in a SUBPROCESS with a timeout.

    The remote-TPU (axon) tunnel has been observed to hang indefinitely in
    its pool-claim leg when down — an in-process `jax.devices()` would then
    hang this benchmark forever and the driver would record nothing. A dead
    probe → fall back to CPU so the one JSON line is always emitted."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax
    jax.config.update("jax_enable_x64", False)  # f32: TPU-native dtype
    if not backend_is_live():
        # env JAX_PLATFORMS cannot override the sitecustomize-forced axon
        # platform; the config update after import can.
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"warning": "TPU backend probe timed out; "
                          "falling back to CPU"}), file=sys.stderr)
    import petlion_tpu as pt

    platform = jax.devices()[0].platform
    n_dev = len(jax.devices())

    # f32 needs a realistic absolute tolerance (1e-6 is below the f32 noise
    # floor of the linear solves); accuracy vs f64 is checked in tests.
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    # outputs minimal: the bench measures solver throughput, not IO

    B = 1024 if platform != "cpu" else 32
    run = make_runner(p, B)

    # compile
    t0 = time.time()
    run(0)
    compile_s = time.time() - t0

    # tunnel-speed canary (pure-MXU, known FLOPs): one call per measured
    # block is the covariate that lets a reviewer ATTRIBUTE block-rate
    # drift to the tunnel (canary slow too) vs the code (canary steady).
    # Round-3's 12% bench regression on perf-neutral code could not be
    # attributed for lack of exactly this.
    on_tpu = platform != "cpu"
    run_canary = make_canary() if on_tpu else None
    if on_tpu:
        run_canary(0)   # compile

    # warm until the per-rep time STABILIZES: last-3 spread < 10%. (The
    # round-3 rule — "best-of-last-3 stopped improving" — also fires while
    # the tunnel is *degrading*, which is exactly what r03's monotonically
    # rising warmup times were.) Min 10 reps, max 25.
    warm_times = []
    warm_stable = False
    for i in range(25):
        t0 = time.time()
        run(1 + i)
        warm_times.append(time.time() - t0)
        if len(warm_times) >= 10:
            last3 = warm_times[-3:]
            if max(last3) / min(last3) < 1.10:
                warm_stable = True
                break

    # measured phase: cumulative wall per block of fresh-input reps, over
    # MANY blocks (the plateau-drift defense); headline = median over
    # canary-clean blocks
    blocks = 6 if on_tpu else 1
    reps = 15 if on_tpu else 3
    kept = []
    block_walls = []
    block_canary = []
    for b in range(blocks):
        if on_tpu:
            block_canary.append(run_canary(50 + b))
        t0 = time.time()
        for i in range(reps):
            r = run(10_000 + b * reps + i)
            kept.append((r.flag, r.n_steps))
        block_walls.append(time.time() - t0)
    ok_total = sum(int(np.isin(np.asarray(f), (0, 1, 3)).sum())
                   for f, _ in kept)
    steps_total = sum(int(np.asarray(s).sum()) for _, s in kept)

    block_rates = [reps * B / w for w in block_walls]
    # canary-based block screening: a block whose canary ran >20% off the
    # session median saw a different tunnel plateau — exclude it from the
    # headline median (kept in the audit trail), flag drift if any occurred
    if on_tpu and block_canary:
        can_med = float(np.median(block_canary))
        clean = [i for i, c in enumerate(block_canary)
                 if abs(c - can_med) <= 0.2 * can_med]
    else:
        clean = list(range(len(block_rates)))
    drift_flag = (len(clean) < len(block_rates)) or not warm_stable
    headline_blocks = clean if len(clean) >= 3 else list(
        range(len(block_rates)))
    rate = float(np.median([block_rates[i] for i in headline_blocks]))
    out = {
        "metric": "batched_p2d_1c_discharges_per_s",
        "value": round(rate, 2),
        "unit": "discharges/s",
        "vs_baseline": round(rate / REFERENCE_RATE, 3),
        "batch": B,
        "reps": reps,
        "blocks": blocks,
        "headline": "median_canary_clean_block",
        "block_rates_per_s": [round(r, 1) for r in block_rates],
        "block_canary_tflops": [round(c, 2) for c in block_canary],
        "canary_clean_blocks": clean,
        "drift_flag": drift_flag,
        "warmup_stable": warm_stable,
        "best_block_rate_per_s": round(max(block_rates), 1),
        "platform": platform,
        "devices": n_dev,
        "wall_s_per_batch": round(np.median(block_walls) / reps, 4),
        "compile_s": round(compile_s, 1),
        "warmup_reps": len(warm_times),
        "warmup_times_s": [round(t, 3) for t in warm_times],
        "completed_frac": round(ok_total / (blocks * reps * B), 4),
        "mean_steps": round(steps_total / (blocks * reps * B), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
