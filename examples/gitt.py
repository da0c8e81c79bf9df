"""Port of examples/GITT.ipynb: galvanostatic intermittent titration —
alternating discharge pulses and rests, as one in-jit protocol."""
from _common import setup; setup()
import petlion_tpu as pt
from petlion_tpu.protocols import simulate_protocol

p = pt.petlion(pt.LCO)
n_pulses = 10
segments = []
for _ in range(n_pulses):
    segments.append(dict(I=-0.5, tf=360.0))   # 0.5C pulse, 6 min
    segments.append(dict(I="rest", tf=600.0))  # 10 min relaxation
sol = simulate_protocol(p, segments, SOC=1.0, outputs=("t", "V"))
print(sol)
print("pulses:", len(sol.results) // 2, " final SOC:", round(float(sol.SOC[-1]), 4))
sol.plot("V").figure.savefig("gitt_V.png", dpi=120)
print("saved gitt_V.png")
