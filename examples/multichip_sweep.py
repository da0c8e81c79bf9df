"""Data-parallel parameter sweep over a device mesh.

The reference achieves parameter sweeps by re-running `simulate` in a user
loop (examples/updating_parameters.ipynb cell 4); here the whole fleet is
ONE jitted program sharded over every visible chip — cells never couple, so
the hot loop contains zero collectives and DP scaling is linear (SURVEY
§2.3). By default this bootstraps an 8-virtual-device CPU mesh so it is
runnable anywhere; on a real multi-chip TPU slice run it with
PETLION_REAL_TPU=1 and the mesh picks up the physical chips instead:

    python examples/multichip_sweep.py                  # 8 virtual CPU devices
    PETLION_REAL_TPU=1 python examples/multichip_sweep.py   # real slice
"""
import os

_REAL = os.environ.get("PETLION_REAL_TPU", "0") != "0"
if not _REAL:
    # 8 virtual devices BEFORE jax import
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
from _common import setup; setup(cpu=not _REAL, x64=False)

import jax
import numpy as np
from jax.sharding import Mesh

import petlion_tpu as pt
from petlion_tpu.parallel.batch import batch_simulate

devs = jax.devices()
mesh = Mesh(np.array(devs), ("cells",))
print(f"mesh: {len(devs)} × {devs[0].platform}")

p = pt.petlion(pt.LCO)
p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2)

B = 64 * len(devs)                      # batch divisible by the mesh
rng = np.random.default_rng(0)
theta_batch = {                         # per-cell sweep of 4 θ leaves
    "D_sp": 1e-14 * (1 + 0.1 * rng.standard_normal(B)),
    "k_p": 2.334e-11 * (1 + 0.1 * rng.standard_normal(B)),
    "D_sn": 3.9e-14 * (1 + 0.1 * rng.standard_normal(B)),
    "k_n": 5.031e-11 * (1 + 0.1 * rng.standard_normal(B)),
}
res = batch_simulate(p, 3.9e3, I=-1.0, SOC=1.0, theta_batch=theta_batch,
                     mesh=mesh, outputs=("t", "V"))

ok = np.isin(np.asarray(res.flag), (0, 1, 3))
n_saved = int(np.asarray(res.n_saved).min())
V = np.asarray(res.bufs["V"])[:, n_saved - 1]   # per-cell final voltage
print(f"completed {ok.sum()}/{B} discharges;"
      f" end-of-discharge V spread {V.min():.4f}-{V.max():.4f} V"
      f" (the θ sweep drives the polarization spread)")
