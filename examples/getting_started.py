"""Port of the reference examples/getting_started.ipynb: build the default
LCO model and run a 1C discharge."""
from _common import setup; setup()
import time
import petlion_tpu as pt

p = pt.petlion(
    pt.LCO,
    N_p=10, N_s=10, N_n=10, N_r_p=10, N_r_n=10,
    temperature=False,
    solid_diffusion="Fickian",
)
print(p)

t0 = time.time()
sol = pt.simulate(p, I=-1, SOC=1)
print(f"first call (trace+compile): {time.time()-t0:.1f} s")
print(sol)

t0 = time.time()
for _ in range(5):
    sol = pt.simulate(p, I=-1, SOC=1)
print(f"warm: {(time.time()-t0)/5*1000:.1f} ms/run")

sol.plot("V").figure.savefig("getting_started_V.png", dpi=120)
print("saved getting_started_V.png")
