"""Zero-fetch in-process paired A/B of hot-path variants on TPU.

Round-4 calibration (measurements_r04/) re-diagnosed round 3's failed A/B:
the "multi-program degraded regime" that sank tools/ab_paired.py (~770/s)
was actually FETCH poisoning — one device→host fetch knocks that process's
batch program ~10x off the tunnel fast path permanently, and ab_paired
fetched flag arrays after every variant compile. A two-program process with
ZERO fetches stays on the fast plateau (canary_probe: 9.7-10.6k/s
interleaved; canary_cal2: 13-14k/s warm). Fresh-process A/B
(tools/ab_fresh.py) hits a different wall: each process lands on its own
plateau (±8% scatter, head/head sanity = 0.89), which no canary can remove.

So: compile BOTH variants in one process, interleave their timed blocks
back-to-back on the SHARED plateau, fetch nothing until all timing is done.
Statistic of record: median of per-block A/B rate ratios. Sanity gate:
`head head` must report 1.00 ± 0.03.

Usage: python tools/ab_inproc.py A B [blocks=8] [reps=10] [batch=1024]
       variants: head n0 nj pb1 dc1 pbdc ms0  (same table as ab_fresh)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ab_fresh import VARIANTS  # noqa: E402  (same variant table)


def main():
    a, b = sys.argv[1], sys.argv[2]
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1024
    assert a in VARIANTS and b in VARIANTS, (a, b, list(VARIANTS))

    import jax
    jax.config.update("jax_enable_x64", False)
    from bench import backend_is_live, make_runner
    if not backend_is_live():
        print(json.dumps({"error": "TPU backend probe timed out"}))
        sys.exit(1)
    import petlion_tpu as pt
    import petlion_tpu.physics.residuals as residuals
    from petlion_tpu.ops import plan as planmod
    from petlion_tpu.ops import structured

    def make(vname):
        env = VARIANTS[vname]
        residuals._MEAN_SHIFT = env.get("PETLION_MEANSHIFT", "1") != "0"
        structured._PALLAS_BLOCKS = \
            env.get("PETLION_PALLAS_BLOCKS", "0") != "0"
        structured._PALLAS_DCHAIN = \
            env.get("PETLION_PALLAS_DCHAIN", "0") != "0"
        os.environ["PETLION_NESTED"] = env.get("PETLION_NESTED", "0")
        os.environ["PETLION_JACA"] = env.get("PETLION_JACA", "1")
        planmod._PLAN_CACHE.clear()
        p = pt.petlion(pt.LCO)   # fresh plan object => fresh jit entry
        p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                                maxiters=500,
                                jac_reuse=int(env.get("PETLION_JACREUSE",
                                                      "0")),
                                step_control=env.get("PETLION_STEPCTL",
                                                     "greedy"))
        return make_runner(p, batch)

    # slot 0 = variant a, slot 1 = variant b (a==b is the sanity mode).
    # Compile + warm with ZERO fetches; correctness flags are fetched only
    # after every timed block is done.
    runners, compile_s, last_res = {}, {}, {}
    for slot, v in ((0, a), (1, b)):
        t0 = time.time()
        run = make(v)
        last_res[slot] = run(slot)
        compile_s[slot] = round(time.time() - t0, 1)
        runners[slot] = run
    print(json.dumps({"compile_s": compile_s}), flush=True)

    for w in range(10):
        for slot in (0, 1):
            runners[slot](10 + 2 * w + slot)

    rates = {0: [], 1: []}
    for blk in range(blocks):
        order = (0, 1) if blk % 2 == 0 else (1, 0)
        for slot in order:
            t0 = time.time()
            for i in range(reps):
                last_res[slot] = runners[slot](
                    10_000 + 100 * blk + 10 * slot + i)
            rates[slot].append(reps * batch / (time.time() - t0))
        print(json.dumps({"block": blk,
                          a + "(0)": round(rates[0][-1], 0),
                          b + "(1)": round(rates[1][-1], 0)}), flush=True)

    # post-timing correctness fetch (safe now)
    ok = {slot: float(np.isin(np.asarray(r.flag), (0, 1, 3)).mean())
          for slot, r in last_res.items()}
    steps = {slot: float(np.asarray(r.n_steps).mean())
             for slot, r in last_res.items()}
    attempts = {slot: float((np.asarray(r.n_steps)
                             + np.asarray(r.n_rejected)).mean())
                for slot, r in last_res.items()}
    ratios = [ra / rb for ra, rb in zip(rates[0], rates[1])]
    print(json.dumps({
        "a": a, "b": b, "blocks": blocks, "reps": reps, "batch": batch,
        f"{a}_over_{b}": round(float(np.median(ratios)), 3),
        "ratios": [round(r, 3) for r in ratios],
        "median_rate_a": round(float(np.median(rates[0])), 1),
        "median_rate_b": round(float(np.median(rates[1])), 1),
        "ok": ok, "mean_steps": steps, "mean_attempts": attempts,
    }), flush=True)


if __name__ == "__main__":
    main()
