"""Batch-size sweep of the canonical bench program (fresh process per B).

The headline bench pins B=1024 (CLAUDE.md's round-2 rule "keep one
execution under ~2 s" was set when a B=2048 discharge took 6.5 s; at
round-4 speeds B=1024 runs in 0.06 s). Per-cell work is mostly small
batched ops whose dispatch/HBM overheads amortize with B, so throughput
may rise well past 1024 before the multi-second tunnel degradation
returns. This sweep measures discharges/s at several B, each in its own
fresh single-program process (bench.py methodology: fetch-free timed
blocks, fresh-random inputs per rep, median block).

    python tools/bench_bsweep.py              # sweep 1024..8192
    python tools/bench_bsweep.py --child 2048 # internal
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BS = (1024, 2048, 4096, 8192)


def child(B):
    import jax
    jax.config.update("jax_enable_x64", False)
    import petlion_tpu as pt
    from bench import make_runner

    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    run = make_runner(p, B)

    t0 = time.time()
    run(0)
    compile_s = time.time() - t0

    warm_times = []
    for i in range(25):
        t0 = time.time()
        run(1 + i)
        warm_times.append(time.time() - t0)
        if len(warm_times) >= 8 and \
                max(warm_times[-3:]) / min(warm_times[-3:]) < 1.10:
            break

    # scale reps so each block is ~1 s of device time regardless of B
    reps = max(2, int(round(15 * 1024 / B)))
    blocks = 6
    kept = []
    walls = []
    for b in range(blocks):
        t0 = time.time()
        for i in range(reps):
            kept.append(run(10_000 + b * reps + i).flag)
        walls.append(time.time() - t0)
    ok = sum(int(np.isin(np.asarray(f), (0, 1, 3)).sum()) for f in kept)

    rates = [reps * B / w for w in walls]
    print(json.dumps({
        "batch": B, "reps": reps, "blocks": blocks,
        "rate_per_s": round(float(np.median(rates)), 1),
        "block_rates_per_s": [round(r, 1) for r in rates],
        "wall_s_per_exec": round(float(np.median(walls)) / reps, 4),
        "completed_frac": round(ok / (blocks * reps * B), 4),
        "compile_s": round(compile_s, 1),
        "warmup_reps": len(warm_times),
    }), flush=True)


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
        return child(int(sys.argv[sys.argv.index("--child") + 1]))
    me = os.path.abspath(__file__)
    rows = []
    for B in BS:
        r = subprocess.run([sys.executable, me, "--child", str(B)],
                           capture_output=True, text=True, timeout=2400)
        j = _last_json(r.stdout)
        if r.returncode != 0 or j is None:
            j = {"batch": B,
                 "error": (r.stdout[-800:] + r.stderr[-800:])}
        rows.append(j)
        print(json.dumps(j), flush=True)
        time.sleep(20)
    best = max((r for r in rows if "rate_per_s" in r),
               key=lambda r: r["rate_per_s"], default=None)
    print(json.dumps({"sweep": rows, "best": best}), flush=True)


if __name__ == "__main__":
    main()
