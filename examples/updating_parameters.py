"""Port of examples/updating_parameters.ipynb: θ hot-swap without recompile,
and the vmapped equivalent of the reference's manual sweep loop."""
from _common import setup; setup()
import numpy as np
import petlion_tpu as pt
from petlion_tpu.parallel.batch import batch_simulate

p = pt.petlion(pt.LCO)

# single-cell hot swap (no retrace)
for D_sp in (0.5e-14, 1e-14, 2e-14):
    p.theta["D_sp"] = D_sp
    sol = pt.simulate(p, I=-1, SOC=1)
    print(f"D_sp={D_sp:g}: V_end={sol.V[-1]:.4f} t_end={sol.t[-1]:.0f}s")
p.theta["D_sp"] = 1e-14

# batched sweep: all cells in one device program
B = 64
res = batch_simulate(p, I=-1.0, SOC=1.0, outputs=("t", "V"), max_save=4,
                     theta_batch={"D_sp": 1e-14 * np.logspace(-0.5, 0.5, B)})
iV = np.asarray(res.n_saved) - 1
V_end = np.asarray(res.bufs["V"])[np.arange(B), iV]
print(f"batched sweep of {B} cells: V_end in [{V_end.min():.4f}, {V_end.max():.4f}]")
