"""Initial state-vector guess (reference states_definition.jl:80-121)."""

from __future__ import annotations

import jax.numpy as jnp

from .residuals import ModelConfig


def initial_guess(SOC, th, cfg: ModelConfig, dtype=None):
    """Build Y0 for a fresh run at state-of-charge `SOC`.

    Differential states at equilibrium values; algebraic states at their
    zero-current solution (Φ_s = OCV, Φ_e = 0, j = 0, I = 0).
    """
    N, num, L = cfg.N, cfg.numerics, cfg.layout
    dtype = dtype or jnp.zeros(0).dtype
    SOC = jnp.asarray(SOC, dtype)

    c_s_p = th["c_max_p"] * (SOC * (th["theta_max_p"] - th["theta_min_p"])
                             + th["theta_min_p"])
    c_s_n = th["c_max_n"] * (SOC * (th["theta_max_n"] - th["theta_min_n"])
                             + th["theta_min_n"])

    T0 = jnp.asarray(th["T0"], dtype)
    U_p, _ = num.OCV_p(c_s_p / th["c_max_p"], T0, th)
    U_n, _ = num.OCV_n(c_s_n / th["c_max_n"], T0, th)

    y = jnp.zeros((L.N_tot,), dtype)
    y = y.at[L.sl("c_e")].set(th["c_e0"])
    y = y.at[L.sl("c_s_avg", "p")].set(c_s_p)
    y = y.at[L.sl("c_s_avg", "n")].set(c_s_n)
    if num.temperature:
        # the state carries T − T_amb (see residuals.build_auxiliary)
        y = y.at[L.sl("T")].set(th["T0"] - th["T_amb"])
    if num.aging == "SEI":
        y = y.at[L.sl("SOH")].set(1.0)
        # film and j_s stay 0
    if num.aging == "stress":
        y = y.at[L.sl("eps_s", "p")].set(1.0 - (th["eps_fp"] + th["eps_p"]))
        y = y.at[L.sl("eps_s", "n")].set(1.0 - (th["eps_fn"] + th["eps_n"]))
    # Q stays 0 (polynomial); j, Φ_e stay 0
    y = y.at[L.sl("Phi_s", "p")].set(U_p)
    y = y.at[L.sl("Phi_s", "n")].set(U_n)
    # I stays 0 — overwritten by the run's initial_current
    return y
