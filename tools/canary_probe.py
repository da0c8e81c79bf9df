"""Probe: does the tunnel's slow plateau hit all programs proportionally?

Interleaves (a) a pure-MXU canary (fori_loop of 2048x2048 f32 matmuls,
fresh inputs per call, known FLOPs) with (b) the batched discharge program,
for several minutes. If both degrade together, canary normalization makes
bench.py plateau-proof; if only (b) degrades, the plateau is program-
specific and the bench must instead detect-and-reject slow blocks.

Usage: python tools/canary_probe.py [cycles=8]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1024
CANARY_N = 2048
CANARY_ITERS = 60   # ~2*60*2048^3 = 1.03 TFLOP per call


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", False)
    import petlion_tpu as pt

    @jax.jit
    def canary(x):
        def body(i, a):
            return jnp.tanh(a @ x)
        return jax.lax.fori_loop(0, CANARY_ITERS, body, x)

    def run_canary(seed):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((CANARY_N, CANARY_N)) * 0.01,
                        jnp.float32)
        jax.block_until_ready(x)
        t0 = time.time()
        jax.block_until_ready(canary(x))
        return time.time() - t0

    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)

    from bench import make_runner
    _runner = make_runner(p, B)   # the canonical timed program (bench.py)

    def run_batch(seed):
        t0 = time.time()
        _runner(seed)
        return time.time() - t0

    # compile both
    run_canary(0)
    run_batch(0)
    flops = 2.0 * CANARY_ITERS * CANARY_N**3

    for c in range(cycles):
        can = [run_canary(10 + 3 * c + i) for i in range(3)]
        bat = [run_batch(100 + 5 * c + i) for i in range(5)]
        print(json.dumps({
            "cycle": c,
            "canary_tflops": round(flops / min(can) / 1e12, 2),
            "canary_s": [round(x, 3) for x in can],
            "batch_s": [round(x, 3) for x in bat],
            "batch_rate": round(B / np.mean(bat[1:]), 0),
        }), flush=True)


if __name__ == "__main__":
    main()
