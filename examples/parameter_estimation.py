"""Gradient-based parameter estimation — a capability beyond the reference.

The reference fits parameters by re-running simulate in derivative-free
loops (examples/updating_parameters.ipynb). Here the whole adaptive solve is
differentiable, so exact dV/dθ sensitivities drive Gauss-Newton."""
from _common import setup; setup()
import numpy as np
import petlion_tpu as pt
from petlion_tpu import estimation

p = pt.petlion(pt.LCO)

# synthetic "measured" discharge curve at hidden true parameters
true = {"D_sp": 1.7e-14, "k_n": 3.1e-11}
t_data = np.linspace(60.0, 1700.0, 24)
for k, v in true.items():
    p.theta[k] = v
voltage, th_true = estimation.make_voltage_model(p, list(true), t_eval=t_data,
                                                 I_crate=-1.0, SOC=0.9)
V_data = np.asarray(voltage(th_true))

# start from a badly perturbed guess and fit
p.theta["D_sp"], p.theta["k_n"] = 1e-14, 5.031e-11
fitted = estimation.fit(p, list(true), t_data, V_data, I_crate=-1.0, SOC=0.9,
                        iters=10, verbose=True)
for k in true:
    print(f"{k}: true={true[k]:.4g} fitted={fitted[k]:.4g} "
          f"err={abs(fitted[k]-true[k])/true[k]:.2e}")
