"""Benchmark: batched full P2D 1C discharges per second on TPU.

Headline metric, matching BASELINE.md's throughput target: complete LCO
isothermal 1C CC discharges (301-DAE cells, SOC 1 → V_min/SOC_min exit, the
reference's getting_started benchmark config) per wall-clock second, batched
over cells with perturbed parameters.

vs_baseline compares against the reference's single-cell rate: PETLION.jl's
BenchmarkTools median of 2.616 ms/discharge on one laptop core
(examples/getting_started.ipynb) → 382.3 discharges/s.

Measurement methodology (the remote-TPU tunnel makes naive timing wrong in
BOTH directions): every repetition uses fresh-random θ for all four swept
leaves (identical (program, inputs) pairs can be memoized → phantom-fast);
and the first several post-compile executions run far slower than steady
state (~0.9 s vs ~0.07 s per batch), so the run warms up until the per-rep
time stabilizes and then reports CUMULATIVE wall over many reps — a number
that cannot be faked by per-call timer anomalies. Correctness is guarded by
exit-flag and step-count checks on the measured reps.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

REFERENCE_RATE = 1000.0 / 2.616   # discharges/s, reference median


def main():
    import jax
    jax.config.update("jax_enable_x64", False)  # f32: TPU-native dtype
    import petlion_tpu as pt
    from petlion_tpu.parallel.batch import batch_simulate

    platform = jax.devices()[0].platform
    n_dev = len(jax.devices())

    # f32 needs a realistic absolute tolerance (1e-6 is below the f32 noise
    # floor of the linear solves); accuracy vs f64 is checked in tests.
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    # outputs minimal: the bench measures solver throughput, not IO

    B = 1024 if platform != "cpu" else 32

    def run(seed):
        # fresh-random values for every swept θ leaf, every single execution
        rng = np.random.default_rng(seed)
        tb = {
            "D_sp": 1e-14 * (1 + 0.05 * rng.standard_normal(B)),
            "D_sn": 3.9e-14 * (1 + 0.05 * rng.standard_normal(B)),
            "k_p": 2.334e-11 * (1 + 0.05 * rng.standard_normal(B)),
            "k_n": 5.031e-11 * (1 + 0.05 * rng.standard_normal(B)),
        }
        res = batch_simulate(p, 3.9e3, I=-1.0, SOC=1.0, theta_batch=tb,
                             outputs=("t", "V"))
        jax.block_until_ready(res.flag)
        return res

    # compile
    t0 = time.time()
    run(0)
    compile_s = time.time() - t0

    # warm until the per-rep time stabilizes (the tunnel's first several
    # executions are far slower than steady state); max 15 warmup reps
    warm_times = []
    for i in range(15):
        t0 = time.time()
        run(1 + i)
        warm_times.append(time.time() - t0)
        if len(warm_times) >= 3 and \
           max(warm_times[-2:]) < 1.5 * min(warm_times):
            break

    # measured phase: cumulative wall over many fresh-input reps. Results
    # stay on device during the loop — a device→host fetch through the
    # remote-TPU tunnel costs ~0.5 s regardless of size and would knock the
    # tunnel out of its steady-state execution path; all correctness
    # stats are fetched after the clock stops.
    reps = 25 if platform != "cpu" else 3
    kept = []
    t0 = time.time()
    for i in range(reps):
        r = run(10_000 + i)
        kept.append((r.flag, r.n_steps))
    dt_total = time.time() - t0
    ok_total = sum(int(np.isin(np.asarray(f), (0, 1, 3)).sum())
                   for f, _ in kept)
    steps_total = sum(int(np.asarray(s).sum()) for _, s in kept)

    rate = reps * B / dt_total
    out = {
        "metric": "batched_p2d_1c_discharges_per_s",
        "value": round(rate, 2),
        "unit": "discharges/s",
        "vs_baseline": round(rate / REFERENCE_RATE, 3),
        "batch": B,
        "reps": reps,
        "platform": platform,
        "devices": n_dev,
        "wall_s_total": round(dt_total, 3),
        "wall_s_per_batch": round(dt_total / reps, 4),
        "compile_s": round(compile_s, 1),
        "warmup_reps": len(warm_times),
        "warmup_times_s": [round(t, 3) for t in warm_times],
        "completed_frac": round(ok_total / (reps * B), 4),
        "mean_steps": round(steps_total / (reps * B), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
