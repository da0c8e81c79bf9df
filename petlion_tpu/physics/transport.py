"""Transport-property closures (electrolyte/solid diffusion, conductivity).

Pure-JAX ports of the swappable transport library in the reference
(src/physics_equations/custom_functions.jl:1-203). Each function takes
section-wise arrays plus the parameter dict ``th`` (θ) and is fully
vmap/jit-transparent. The `temperature_switch` trick of the reference
(custom_functions.jl:1) — skip Arrhenius work when T == T_ref exactly —
is reproduced with `jnp.where` so isothermal runs keep exact parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import IDEAL_GAS as R, T_REF


def _arrhenius(Ea, T):
    """exp(-Ea/R (1/T - 1/T_ref)), with the T==T_ref shortcut."""
    return jnp.where(T == T_REF, 1.0, jnp.exp(-Ea / R * (1.0 / T - 1.0 / T_REF)))


# -- Solid diffusion coefficients [m²/s] (custom_functions.jl:4-31) ---------

def D_s_eff_isothermal(c_s_p, c_s_n, T_p, T_n, th):
    return (th["D_sp"] * jnp.ones_like(T_p), th["D_sn"] * jnp.ones_like(T_n))


def D_s_eff(c_s_p, c_s_n, T_p, T_n, th):
    D_sp = th["D_sp"] * _arrhenius(th["Ea_D_sp"], T_p)
    D_sn = th["D_sn"] * _arrhenius(th["Ea_D_sn"], T_n)
    return D_sp, D_sn


# -- Reaction-rate constants [m^2.5/(m^0.5 s)] (custom_functions.jl:33-57) --

def rxn_rate_isothermal(T_p, T_n, c_s_p, c_s_n, th):
    return th["k_p"] * jnp.ones_like(T_p), th["k_n"] * jnp.ones_like(T_n)


def rxn_rate(T_p, T_n, c_s_p, c_s_n, th):
    k_p = th["k_p"] * _arrhenius(th["Ea_k_p"], T_p)
    k_n = th["k_n"] * _arrhenius(th["Ea_k_n"], T_n)
    return k_p, k_n


# -- Electrolyte diffusion [m²/s] (custom_functions.jl:59-94) ---------------

def D_eff_linear(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (
        th["D_p"] * th["eps_p"] ** th["brugg_p"] * jnp.ones_like(c_e_p),
        th["D_s"] * th["eps_s"] ** th["brugg_s"] * jnp.ones_like(c_e_s),
        th["D_n"] * th["eps_n"] ** th["brugg_n"] * jnp.ones_like(c_e_n),
    )


def D_eff_linear_one_term(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    De = th["D_e"]
    return (
        De * th["eps_p"] ** th["brugg_p"] * jnp.ones_like(c_e_p),
        De * th["eps_s"] ** th["brugg_s"] * jnp.ones_like(c_e_s),
        De * th["eps_n"] ** th["brugg_n"] * jnp.ones_like(c_e_n),
    )


def _D_eff_scalar(c_e, T):
    # empirical correlation, custom_functions.jl:83
    return 1e-4 * 10.0 ** (-4.43 - 54.0 / (T - 229.0 - 5e-3 * c_e) - 0.22e-3 * c_e)


def D_eff(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (
        th["eps_p"] ** th["brugg_p"] * _D_eff_scalar(c_e_p, T_p),
        th["eps_s"] ** th["brugg_s"] * _D_eff_scalar(c_e_s, T_s),
        th["eps_n"] ** th["brugg_n"] * _D_eff_scalar(c_e_n, T_n),
    )


def _D_eff_LGM50_scalar(c_e, T, th):
    # params.jl:649
    x = c_e / 1000.0
    return th["D_e"] * (x * x - 4.516715942688196 * x + 5.5287696156470325)


def D_eff_LGM50(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (
        th["eps_p"] ** th["brugg_p"] * _D_eff_LGM50_scalar(c_e_p, T_p, th),
        th["eps_s"] ** th["brugg_s"] * _D_eff_LGM50_scalar(c_e_s, T_s, th),
        th["eps_n"] ** th["brugg_n"] * _D_eff_LGM50_scalar(c_e_n, T_n, th),
    )


# -- Electrolyte conductivity [S/m] (custom_functions.jl:96-120) ------------

def _K_eff_scalar(c_e, T):
    return 1e-4 * c_e * (
        (-10.5 + 0.668e-3 * c_e + 0.494e-6 * c_e**2)
        + (0.074 - 1.78e-5 * c_e - 8.86e-10 * c_e**2) * T
        + (-6.96e-5 + 2.8e-8 * c_e) * T**2
    ) ** 2


def K_eff(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (
        th["eps_p"] ** th["brugg_p"] * _K_eff_scalar(c_e_p, T_p),
        th["eps_s"] ** th["brugg_s"] * _K_eff_scalar(c_e_s, T_s),
        th["eps_n"] ** th["brugg_n"] * _K_eff_scalar(c_e_n, T_n),
    )


def _K_eff_iso_scalar(c_e):
    return (4.1253e-2 + 5.007e-4 * c_e - 4.7212e-7 * c_e**2
            + 1.5094e-10 * c_e**3 - 1.6018e-14 * c_e**4)


def K_eff_isothermal(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (
        th["eps_p"] ** th["brugg_p"] * _K_eff_iso_scalar(c_e_p),
        th["eps_s"] ** th["brugg_s"] * _K_eff_iso_scalar(c_e_s),
        th["eps_n"] ** th["brugg_n"] * _K_eff_iso_scalar(c_e_n),
    )


def _K_eff_LGM50_scalar(c_e):
    x = c_e / 1000.0
    return 0.1297 * x**3 - 2.51 * x**1.5 + 3.329 * x


def K_eff_LGM50(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (
        th["eps_p"] ** th["brugg_p"] * _K_eff_LGM50_scalar(c_e_p),
        th["eps_s"] ** th["brugg_s"] * _K_eff_LGM50_scalar(c_e_s),
        th["eps_n"] ** th["brugg_n"] * _K_eff_LGM50_scalar(c_e_n),
    )


# -- Thermodynamic factor ν (custom_functions.jl:177-203) --------------------

def thermodynamic_factor_linear(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (jnp.ones_like(c_e_p), jnp.ones_like(c_e_s), jnp.ones_like(c_e_n))


def _tf_scalar(c_e, T):
    x = c_e / 1000.0
    return 0.601 - 0.24 * jnp.sqrt(x) + 0.982 * (1 - 0.0052 * (T - 293.0)) * x**1.5


def thermodynamic_factor(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th):
    return (_tf_scalar(c_e_p, T_p), _tf_scalar(c_e_s, T_s), _tf_scalar(c_e_n, T_n))
