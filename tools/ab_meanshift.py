"""A/B wall-clock: mean-shift (PETLION_MEANSHIFT=1, HEAD default) vs off.

VERDICT round-2 item 1a: rule the radial-stencil mean-shift (+ its
optimization_barrier) in or out as the source of the 2.2x gap between the
driver-captured rate (BENCH_r02: 6,674/s) and the README claim (14.7k/s).

Runs ALTERNATING subprocesses (A,B,A,B,...) in ONE session so tunnel
plateau drift affects both variants equally; each subprocess warms to
steady state and reports one block's cumulative-wall rate. Prints a JSON
summary with per-block rates and the paired ratio.

Usage:  python tools/ab_meanshift.py [n_pairs=3]
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", False)
import petlion_tpu as pt
from bench import make_runner   # the canonical timed program (run from repo root)

p = pt.petlion(pt.LCO)
p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2, maxiters=500)
B = 1024
run = make_runner(p, B)

t0 = time.time(); run(0); compile_s = time.time() - t0
warm = []
for i in range(20):
    t0 = time.time(); run(1 + i); warm.append(time.time() - t0)
    if len(warm) >= 10 and min(warm[-3:]) > 0.95 * min(warm):
        break
reps = 15
kept = []
t0 = time.time()
for i in range(reps):
    kept.append(run(10_000 + i))
dt = time.time() - t0
ok = float(np.mean([np.isin(np.asarray(r.flag), (0, 1, 3)).mean()
                    for r in kept]))
steps = float(np.mean([np.asarray(r.n_steps).mean() for r in kept]))
print(json.dumps({
    "meanshift": os.environ.get("PETLION_MEANSHIFT", "1"),
    "rate_per_s": round(reps * B / dt, 1),
    "wall_s_per_batch": round(dt / reps, 4), "ok": ok,
    "mean_steps": round(steps, 1), "compile_s": round(compile_s, 1),
    "warm_best": round(min(warm), 3), "n_warm": len(warm)}))
"""


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = []
    for k in range(n_pairs):
        for ms in ("1", "0"):
            env = dict(os.environ, PETLION_MEANSHIFT=ms)
            try:
                out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                                     capture_output=True, text=True,
                                     timeout=900)
                line = (out.stdout.strip().splitlines()[-1]
                        if out.stdout else "")
                try:
                    row = json.loads(line)
                except Exception:
                    row = {"meanshift": ms, "error": out.stderr[-500:]}
            except subprocess.TimeoutExpired:
                # dead-tunnel pool-claim hang: record and keep going
                row = {"meanshift": ms, "error": "timeout (900 s): backend "
                       "hang — is the TPU tunnel up?"}
            row["pair"] = k
            rows.append(row)
            print(json.dumps(row), flush=True)
    on = [r["rate_per_s"] for r in rows
          if r.get("meanshift") == "1" and "rate_per_s" in r]
    off = [r["rate_per_s"] for r in rows
           if r.get("meanshift") == "0" and "rate_per_s" in r]
    if on and off:
        import numpy as np
        summary = {"median_on": float(np.median(on)),
                   "median_off": float(np.median(off)),
                   "off_over_on": round(float(np.median(off))
                                        / float(np.median(on)), 3)}
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
