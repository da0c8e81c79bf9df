"""Open-circuit-voltage curves U(θ) and their temperature sensitivities.

Pure-JAX ports of the OCV library (reference custom_functions.jl:122-174 and
the chemistry-local OCVs in params.jl:565-573, 632-640, 907-915). Every curve
returns ``(U, dU/dT)`` and applies the reference's `temperature_switch`
semantics: the (T - T_ref)·dU/dT correction is skipped exactly when T==T_ref.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import T_REF


def _sqrt_relu(x, minval=0.0):
    """sqrt(max(minval, x)) — clamps momentary non-physical concentrations
    (reference custom_functions.jl:210)."""
    return jnp.sqrt(jnp.maximum(minval, x))


def _temp_correct(U, dUdT, T):
    return U + jnp.where(T == T_REF, 0.0, dUdT * (T - T_REF))


def OCV_LCO(theta_p, T, th=None):
    """LiCoO2 cathode OCV (custom_functions.jl:123-136)."""
    x = theta_p
    U = (
        (-4.656 + 88.669 * x**2 - 401.119 * x**4 + 342.909 * x**6
         - 462.471 * x**8 + 433.434 * x**10)
        / (-1.0 + 18.933 * x**2 - 79.532 * x**4 + 37.311 * x**6
           - 73.083 * x**8 + 95.96 * x**10)
    )
    dUdT = -0.001 * (
        (0.199521039 - 0.928373822 * x + 1.364550689000003 * x**2
         - 0.6115448939999998 * x**3)
        / (1.0 - 5.661479886999997 * x + 11.47636191 * x**2
           - 9.82431213599998 * x**3 + 3.048755063 * x**4)
    )
    return _temp_correct(U, dUdT, T), dUdT


def OCV_LiC6(theta_n, T, th=None):
    """Graphite anode OCV (custom_functions.jl:139-152)."""
    x = theta_n
    U = (0.7222 + 0.1387 * x + 0.029 * _sqrt_relu(x) - 0.0172 / x
         + 0.0019 / (_sqrt_relu(x, minval=1e-4) * x)
         + 0.2808 * jnp.exp(0.9 - 15.0 * x)
         - 0.7984 * jnp.exp(0.4465 * x - 0.4108))
    num = (0.005269056 + 3.299265709 * x - 91.79325798 * x**2
           + 1004.911008 * x**3 - 5812.278127 * x**4 + 19329.7549 * x**5
           - 37147.8947 * x**6 + 38379.18127 * x**7 - 16515.05308 * x**8)
    den = (1.0 - 48.09287227 * x + 1017.234804 * x**2 - 10481.80419 * x**3
           + 59431.3 * x**4 - 195881.6488 * x**5 + 374577.3152 * x**6
           - 385821.1607 * x**7 + 165705.8597 * x**8)
    dUdT = 0.001 * num / den
    return _temp_correct(U, dUdT, T), dUdT


def OCV_NMC(theta_p, T, th=None):
    """NMC cathode OCV (custom_functions.jl:154-162)."""
    x = theta_p
    U = -10.72 * x**4 + 23.88 * x**3 - 16.77 * x**2 + 2.595 * x + 4.563
    return U, jnp.zeros_like(U)


def OCV_LiC6_with_NMC(theta_n, T, th=None):
    """Graphite OCV paired with NMC (custom_functions.jl:164-174)."""
    x = theta_n
    U = (0.1493 + 0.8493 * jnp.exp(-61.79 * x) + 0.3824 * jnp.exp(-665.8 * x)
         - jnp.exp(39.42 * x - 41.92)
         - 0.03131 * jnp.arctan(25.59 * x - 4.099)
         - 0.009434 * jnp.arctan(32.49 * x - 15.74))
    return U, jnp.zeros_like(U)


def OCV_NMC_LGM50(theta_p, T, th=None):
    """LG M50 NMC811 cathode OCV (params.jl:565-573)."""
    x = theta_p
    U = (-0.8090 * x + 4.4875 - 0.0428 * jnp.tanh(18.5138 * (x - 0.5542))
         - 17.7326 * jnp.tanh(15.7890 * (x - 0.3117))
         + 17.5842 * jnp.tanh(15.9308 * (x - 0.3120)))
    return U, jnp.zeros_like(U)


def OCV_LiC6_LGM50(theta_n, T, th=None):
    """LG M50 graphite anode OCV (params.jl:632-640; also Li_metal's curve,
    params.jl:907-915)."""
    x = theta_n
    U = (1.9793 * jnp.exp(-39.3631 * x) + 0.15561
         - 0.0909 * jnp.tanh(29.8538 * (x - 0.1234))
         - 0.04478 * jnp.tanh(14.9159 * (x - 0.2769))
         - 0.0205 * jnp.tanh(30.4444 * (x - 0.6103))
         - 0.09259 * jnp.tanh(17.08 * (x - 1.0)))
    return U, jnp.zeros_like(U)


OCV_Li_metal = OCV_LiC6_LGM50
