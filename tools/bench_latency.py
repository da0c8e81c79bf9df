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

On CPU (JAX_PLATFORMS=cpu) there is no tunnel; latency_b1_ms is a true
local latency for the same code path.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_MS = 2.616


def main():
    import jax
    jax.config.update("jax_enable_x64", False)
    from bench import backend_is_live, make_runner
    if not backend_is_live():
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"warning": "TPU backend probe timed out; "
                          "falling back to CPU"}), flush=True)
    import petlion_tpu as pt

    platform = jax.devices()[0].platform
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)

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
        "note": "b1 includes remote-tunnel RTT on TPU; amortized is the "
                "sweep-deployment number",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
