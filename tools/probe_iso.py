"""Tunnel-recovery probe: run the canonical isothermal batched program
(bench.make_runner, B=256) a few times with live prints.

The remote-TPU tunnel wedges after crashes (pool-claim hang: device
enumeration and tiny eager ops succeed while real program executions
block forever — observed 2026-08-20). Run this under `timeout 560` to
decide whether the tunnel is usable before launching a long benchmark.
"""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_enable_x64", False)
import petlion_tpu as pt
from bench import make_runner

t0 = time.time()
p = pt.petlion(pt.LCO)
p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2, maxiters=500)
run = make_runner(p, 256)
print("constructed", round(time.time()-t0, 1), flush=True)
for i in range(4):
    t0 = time.time()
    r = run(100 + i)
    print("exec", i, round(time.time()-t0, 2), "s ok",
          float(np.isin(np.asarray(r.flag), (0, 1, 3)).mean()), flush=True)
print("PROBE OK", flush=True)
