"""In-process paired A/B of hot-path variants on TPU.

The remote-TPU tunnel drifts between throughput plateaus over minutes
(measured: identical programs + identical step counts swing 7.3k-13.0k
discharges/s across subprocesses — tools/ab_meanshift.py round-3 run), so
subprocess-level A/B cannot resolve <40% effects. This harness compiles ALL
variants in ONE process and interleaves their timed blocks back-to-back, so
every block-local comparison shares the same plateau; the median of
per-block ratios is the drift-immune statistic.

Variants (mean-shift x nested elimination x pallas blocks x pallas dchain):
  head     mean-shift on, nested j+Phi_s (core 31), all pallas routing
  pb0      head but ALL pallas block routing off (round-2 XLA behavior)
  dc0      head but only the fused D-chain kernel off
  ms1_n0   head but nested elimination off (core 71)

Usage: python tools/ab_paired.py [blocks=5] [reps=8]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1024


def main():
    blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8


    import jax
    jax.config.update("jax_enable_x64", False)
    from bench import backend_is_live
    if not backend_is_live():
        print(json.dumps({"error": "TPU backend probe timed out; paired "
                          "A/B is only meaningful on real hardware"}))
        sys.exit(1)
    import petlion_tpu as pt
    import petlion_tpu.physics.residuals as residuals
    from petlion_tpu.ops import plan as planmod
    from petlion_tpu.ops import structured

    VARIANTS = [   # (name, mean_shift, nested, pallas_blocks, pallas_dchain)
        ("head", True, "1", True, True),
        ("pb0", True, "1", False, False),
        ("dc0", True, "1", True, False),
        ("ms1_n0", True, "0", True, True),
    ]

    from bench import make_runner

    def make_variant_runner(mean_shift, nested, pallas_blocks, pallas_dchain):
        residuals._MEAN_SHIFT = mean_shift
        structured._PALLAS_BLOCKS = pallas_blocks
        structured._PALLAS_DCHAIN = pallas_dchain
        os.environ["PETLION_NESTED"] = nested
        planmod._PLAN_CACHE.clear()
        p = pt.petlion(pt.LCO)   # fresh plan object => fresh jit entry
        p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                                maxiters=500)
        return make_runner(p, B)   # the canonical timed program (bench.py)

    runners = []
    for name, ms, nested, pb, dc in VARIANTS:
        t0 = time.time()
        run = make_variant_runner(ms, nested, pb, dc)
        r = run(0)   # compile
        ok = float(np.isin(np.asarray(r.flag), (0, 1, 3)).mean())
        steps = float(np.asarray(r.n_steps).mean())
        print(json.dumps({"variant": name, "compile_s":
                          round(time.time() - t0, 1), "ok": ok,
                          "mean_steps": round(steps, 1)}), flush=True)
        runners.append((name, run))

    # warm all variants into the tunnel's steady state
    for w in range(10):
        for _, run in runners:
            run(100 + w)

    rates = {name: [] for name, _ in runners}
    for b in range(blocks):
        for name, run in runners:
            t0 = time.time()
            for i in range(reps):
                run(10_000 + 100 * b + i)
            dt = time.time() - t0
            rates[name].append(reps * B / dt)
        row = {n: round(rates[n][-1], 0) for n in rates}
        print(json.dumps({"block": b, **row}), flush=True)

    base = VARIANTS[0][0]
    summary = {"headline_variant": base,
               "median_rate": {n: round(float(np.median(r)), 1)
                               for n, r in rates.items()}}
    for n, r in rates.items():
        if n != base:
            ratios = [a / b_ for a, b_ in zip(rates[base], r)]
            summary[f"{base}_over_{n}"] = round(float(np.median(ratios)), 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
