"""Port of examples/variable_input_functions.ipynb: time-dependent inputs.
Control functions must be JAX-traceable (use jnp)."""
from _common import setup; setup()
import jax.numpy as jnp
import petlion_tpu as pt

p = pt.petlion(pt.LCO)

# sinusoidal current
sol = pt.simulate(p, 600.0, I=lambda t: -jnp.cos(2 * jnp.pi * t / 600), SOC=0.5)
print("sinusoidal I:", sol)

# ramped power
sol = pt.simulate(p, 600.0, P=lambda t: -10.0 - t / 60.0, SOC=0.8)
print("ramped P:", sol)

# state-feedback current: f(t, y, yp, th) sees the full state vector
def feedback(t, y, yp, th):
    V = y[280] - y[299]          # Φ_s ends (layout of the default model)
    return 5.0 * (V - 4.0)       # push toward 4.0 V
sol = pt.simulate(p, 600.0, I=feedback, SOC=0.5)
print("feedback I:", sol)
