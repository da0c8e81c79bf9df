"""Multi-chip DP scaling benchmark — runnable unchanged on a real v5e-8.

Shards B = n_devices × 1024 cells over a 1-D `jax.sharding.Mesh` of all
visible devices (pure data parallelism over ICI; zero collectives in the hot
loop) and reports the aggregate rate, per-device rate, and scaling efficiency
vs a single-device run of the same per-device batch.

On the current 1-TPU-chip environment this measures n_devices=1 (trivially
100% efficiency); the measurement logic is validated for correctness (not
speed) on an 8-virtual-device CPU mesh by `--cpu-mesh 8` and continuously by
`tests/test_batch.py::test_multichip_measurement_logic`, so the day real
hardware appears the scaling claim is one command away:

    python bench_multichip.py              # real devices (TPU)
    python bench_multichip.py --cpu-mesh 8 # virtual 8-device CPU mesh

Timing methodology per CLAUDE.md: fresh-random θ every rep, warm until
stable, cumulative wall over all reps, no device→host fetches inside the
timed loop.
"""

import argparse
import json
import time

import numpy as np


def run_batch(p, B, mesh, seed):
    """One batched discharge with fresh-random θ leaves (memoization-proof).
    The program is bench.make_runner's canonical one — all harnesses share
    that single definition."""
    from bench import make_runner
    return make_runner(p, B, mesh)(seed)


def measure(p, B, mesh, tag, reps=10, keep_results=False):
    """Warm until per-rep stabilizes, then cumulative wall over reps."""
    import jax  # noqa: F401
    for i in range(12):
        t0 = time.time()
        run_batch(p, B, mesh, 1000 + i)
        if time.time() - t0 < 0.5 and i >= 2:
            break
    kept = []
    t0 = time.time()
    for i in range(reps):
        kept.append(run_batch(p, B, mesh, 10_000 + i))
    dt = time.time() - t0
    ok = float(np.mean([np.isin(np.asarray(r.flag), (0, 1, 3)).mean()
                        for r in kept]))
    row = {"tag": tag, "batch": B, "wall_s": round(dt, 3),
           "rate_per_s": round(reps * B / dt, 1), "ok": ok}
    return (row, kept) if keep_results else row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force an N-virtual-device CPU mesh (validation)")
    ap.add_argument("--per-device-batch", type=int, default=0,
                    help="cells per device (default: 1024 TPU / 16 CPU)")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import os
    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu_mesh}")
    import jax
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    import petlion_tpu as pt
    from petlion_tpu.parallel.batch import make_cell_mesh

    devices = jax.devices()
    n_dev = len(devices)
    platform = devices[0].platform
    pdb = args.per_device_batch or (1024 if platform == "tpu" else 16)

    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)

    # single-device baseline (same per-device batch, no mesh)
    base = measure(p, pdb, None, "single_device", reps=args.reps)
    results = [base]
    print(json.dumps({**base, "platform": platform}), flush=True)

    if n_dev > 1:
        mesh = make_cell_mesh("cells")
        multi = measure(p, pdb * n_dev, mesh, f"mesh_{n_dev}dev",
                        reps=args.reps)
        eff = multi["rate_per_s"] / (base["rate_per_s"] * n_dev)
        multi["scaling_efficiency"] = round(eff, 3)
        multi["per_device_rate"] = round(multi["rate_per_s"] / n_dev, 1)
        results.append(multi)
        print(json.dumps({**multi, "platform": platform}), flush=True)
    else:
        print(json.dumps({"note": f"only {n_dev} device visible; "
                          "run on a v5e-8 for the scaling row"}), flush=True)

    with open("BENCH_MULTICHIP.json", "w") as f:
        json.dump({"platform": platform, "devices": n_dev,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
