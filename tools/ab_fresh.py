"""Fresh-process, canary-normalized A/B of hot-path variants on TPU.

Round-3 lesson (VERDICT r3, weak #4): in-process interleaving of several
compiled programs lands the remote-TPU tunnel in a ~7.6x-degraded
multi-program regime, where tunnel overhead swamps kernel differences — a 2x
factorization speedup shows as a few percent. So this harness runs ONE
single-program subprocess per timed block (the regime bench.py's number of
record is measured in), alternating A/B/A/B... across subprocesses with the
order flipped every pair (cancels slow monotone drift), and normalizes every
block by an adjacent fixed-canary subprocess (a pure-MXU matmul loop with
known FLOPs). The statistic of record is the median canary-normalized A/B
ratio across pairs.

Acceptance gate (VERDICT r3 item 3): run twice back-to-back on a no-op
change (`head head`) — must report 1.00 +/- 0.03.

Children strictly serialize (ONE process may hold the TPU tunnel at a time)
and opt into JAX's persistent compilation cache so repeat compiles of the
same program are cheap if the axon backend supports serialization.

Usage: python tools/ab_fresh.py A B [pairs=4] [reps=15] [batch=1024]
       variants: head n0 nj pb1 dc1 pbdc ms0  (see VARIANTS)
Child modes (internal): --child VARIANT reps batch seed | --canary
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE_DIR = os.path.join(REPO, ".jax_cache")

# env deltas vs HEAD defaults (NESTED=0, PALLAS_BLOCKS=0, PALLAS_DCHAIN=0,
# MEANSHIFT=1, JACREUSE=0)
VARIANTS = {
    "head": {},
    "n0": {"PETLION_NESTED": "0"},        # = head since r04 (default off)
    "n1": {"PETLION_NESTED": "1"},        # nested elimination on (core 31)
    "nj": {"PETLION_NESTED": "j"},        # j-level only
    "pb1": {"PETLION_PALLAS_BLOCKS": "1"},
    "dc1": {"PETLION_PALLAS_DCHAIN": "1"},
    "pbdc": {"PETLION_PALLAS_BLOCKS": "1", "PETLION_PALLAS_DCHAIN": "1"},
    "ms0": {"PETLION_MEANSHIFT": "0"},
    # IDA-style chunked Jacobian reuse (opts.jac_reuse, run.py:346): factor
    # once per chunk of K accepted steps instead of inside every attempt
    "jr6": {"PETLION_JACREUSE": "6"},
    "jr12": {"PETLION_JACREUSE": "12"},
    # round-5: analytic Jacobian assembly (default ON since r05; jc0 = the
    # colored-sweep path it replaced) and IDA-style step-growth hysteresis
    "jc0": {"PETLION_JACA": "0"},
    "ida": {"PETLION_STEPCTL": "ida"},
    "jc0ida": {"PETLION_JACA": "0", "PETLION_STEPCTL": "ida"},
}

CANARY_N, CANARY_ITERS = 2048, 60       # 2*60*2048^3 ~ 1.03 TFLOP per call


def _child_env(extra=None):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    env.update(extra or {})
    return env


def _last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def run_child(args, extra_env=None, timeout=1500):
    r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                       env=_child_env(extra_env), capture_output=True,
                       text=True, timeout=timeout)
    out = _last_json(r.stdout)
    if r.returncode != 0 or out is None:
        return {"error": (r.stdout[-1500:] + r.stderr[-1500:])}
    return out


# ---------------------------------------------------------------- children

def child_canary():
    """Fresh-process pure-MXU probe. `block_until_ready` does NOT block
    through the tunnel and fetchless submissions never backpressure
    (measurements_r04/canary_cal2.log) — so each timing submits K calls and
    fetches ONE scalar to force a true sync. Fetching is safe ONLY because
    this process exits afterwards: a fetch inside a timing process knocks
    its batch program ~10x off the fast path permanently."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", False)

    @jax.jit
    def canary(x):
        return jax.lax.fori_loop(
            0, CANARY_ITERS, lambda i, a: jnp.tanh(a @ x), x)[0, 0]

    K = 16
    flops = 2.0 * CANARY_ITERS * CANARY_N ** 3

    def one(seed):
        rng = np.random.default_rng(seed)
        xs = [jnp.asarray(rng.standard_normal((CANARY_N, CANARY_N)) * 0.01,
                          jnp.float32) for _ in range(K)]
        for x in xs:
            jax.block_until_ready(x)
        t0 = time.time()
        outs = [canary(x) for x in xs]
        float(outs[-1])
        return K * flops / (time.time() - t0) / 1e12

    t0 = time.time()
    one(0)   # compile + first (slow) sync
    compile_s = time.time() - t0
    rates = [one(1 + i) for i in range(3)]
    print(json.dumps({"canary_tflops": round(max(rates), 1),
                      "compile_s": round(compile_s, 1)}))


def child_variant(variant, reps, batch, seed0):
    # env deltas were applied by the parent BEFORE python started, so the
    # import-time module flags (structured._PALLAS_*) picked them up
    import jax
    jax.config.update("jax_enable_x64", False)
    import petlion_tpu as pt
    from bench import make_runner

    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500,
                            jac_reuse=int(os.environ.get("PETLION_JACREUSE",
                                                         "0")))
    run = make_runner(p, batch)

    t0 = time.time()
    r0 = run(seed0)
    compile_s = time.time() - t0

    # warm until the last-3 spread is <10% (not merely "stopped improving" —
    # that also fires while the tunnel degrades); min 6, max 15.
    # NO device->host fetch happens anywhere before or inside the timed
    # block: a single fetch knocks this process's batch program ~10x off
    # the tunnel fast path permanently (measurements_r04/canary_cal*.log).
    warm = []
    for i in range(15):
        t0 = time.time()
        run(seed0 + 1 + i)
        warm.append(time.time() - t0)
        if len(warm) >= 6:
            last3 = warm[-3:]
            if max(last3) / min(last3) < 1.10:
                break

    t0 = time.time()
    kept = []
    for i in range(reps):
        r = run(seed0 + 100 + i)
        kept.append((r.flag, r.n_steps))
    wall = time.time() - t0
    # fetches only after the clock stopped
    ok = float(np.isin(np.asarray(r0.flag), (0, 1, 3)).mean())
    kept_steps = sum(int(np.asarray(s).sum()) for _, s in kept)
    print(json.dumps({
        "variant": variant, "rate": round(reps * batch / wall, 1),
        "compile_s": round(compile_s, 1), "ok": ok,
        "mean_steps": round(kept_steps / (reps * batch), 2),
        "warm_reps": len(warm),
        "warm_spread": round(max(warm[-3:]) / min(warm[-3:]), 3),
    }))


# ------------------------------------------------------------------ parent

def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--canary":
        return child_canary()
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child_variant(sys.argv[2], int(sys.argv[3]),
                             int(sys.argv[4]), int(sys.argv[5]))

    a, b = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 15
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1024
    assert a in VARIANTS and b in VARIANTS, (a, b, list(VARIANTS))

    ratios, raw_ratios = [], []
    rates_a, rates_b = [], []
    for pair in range(pairs):
        # slot 0 is always variant `a`, slot 1 variant `b`; only the RUN
        # ORDER flips per pair (a==b is the no-op sanity mode)
        order = ((0, a), (1, b)) if pair % 2 == 0 else ((1, b), (0, a))
        slot = {}
        for idx, v in order:
            can = run_child(["--canary"])
            res = run_child(["--child", v, str(reps), str(batch),
                             str(20_000 + 1000 * pair + 500 * idx)],
                            extra_env=VARIANTS[v])
            if "error" in can or "error" in res:
                print(json.dumps({"pair": pair, "variant": v,
                                  "canary": can, "result": res}), flush=True)
                return
            slot[idx] = (res["rate"], can["canary_tflops"])
            print(json.dumps({"pair": pair, "variant": v, "slot": idx,
                              "rate": res["rate"],
                              "canary_tflops": can["canary_tflops"],
                              "compile_s": res["compile_s"],
                              "ok": res["ok"],
                              "mean_steps": res["mean_steps"]}), flush=True)
        (ra, ca), (rb, cb) = slot[0], slot[1]
        ratios.append((ra / ca) / (rb / cb))
        raw_ratios.append(ra / rb)
        rates_a.append(ra)
        rates_b.append(rb)

    print(json.dumps({
        "a": a, "b": b, "pairs": pairs, "reps": reps, "batch": batch,
        f"{a}_over_{b}_canary_norm": round(float(np.median(ratios)), 3),
        f"{a}_over_{b}_raw": round(float(np.median(raw_ratios)), 3),
        "ratios_canary_norm": [round(r, 3) for r in ratios],
        "ratios_raw": [round(r, 3) for r in raw_ratios],
        "median_rate_a": round(float(np.median(rates_a)), 1),
        "median_rate_b": round(float(np.median(rates_b)), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
