"""Port of examples/fast_charging_CC-CT-CV.ipynb (the README protocol):
4C charge -> temperature hold -> voltage hold, in ONE jit."""
from _common import setup; setup()
import petlion_tpu as pt
from petlion_tpu.protocols import simulate_protocol

p = pt.petlion(pt.LCO, temperature=True)
sol = simulate_protocol(p, [
    dict(I=4, V_max=4.1, T_max=40 + 273.15),
    dict(dT="hold", V_max=4.1),
    dict(V="hold"),
], SOC=0.0, outputs=("t", "V", "T"))
print(sol)   # reference: 1865.61 s, 0.1959C, 25.6963 °C, Above max. SOC
