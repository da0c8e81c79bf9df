"""Port of examples/model_inputs_and_outputs.ipynb: output selection,
indexing runs, interpolation, and state access."""
from _common import setup; setup()
import numpy as np
import petlion_tpu as pt

p = pt.petlion(pt.LCO)
sol = pt.simulate(p, I=-1, SOC=1, outputs=("all",))
print("recorded outputs:", sorted(sol.arrays))
print("c_e trace shape:", sol.c_e.shape)

# interpolate onto a uniform grid (reference sol(0:60:3600))
si = sol(np.arange(0, 3601, 60))
print("interpolated V at t=1800:", float(si.V[30]))

# per-run views
sol2 = pt.simulate_cont(sol, p, 900.0, I="rest")
print("run 0:", sol2[0].final_exit_reason(), "| run 1:", sol2[1].final_exit_reason())
