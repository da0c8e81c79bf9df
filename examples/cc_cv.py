"""Port of examples/CC-CV.ipynb: constant-current charge then voltage hold."""
from _common import setup; setup()
import petlion_tpu as pt

p = pt.petlion(pt.LCO)
sol = pt.simulate(p, I=2, SOC=0, V_max=4.1, outputs=("t", "V"))
sol = pt.simulate_cont(sol, p, V="hold", I_min=1/20)   # taper to C/20
print(sol)
print("exit reasons:", pt.exit_reasons(sol))
