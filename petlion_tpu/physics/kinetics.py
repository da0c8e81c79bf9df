"""Electrode reaction-rate (kinetics) models.

Pure-JAX ports of the kinetics library (reference custom_functions.jl:209-321):
Butler-Volmer (α=1/2 fast path), Marcus-Hush-Chidsey, and the
activity-modified Butler-Volmer variant. All use the reference's
`sqrt_ReLU`/`log_ReLU` clamps so a momentarily non-physical concentration in
one batched cell cannot NaN the whole batch.

Common signature (matches the reference call sites residuals.jl:511-512):
    rxn(c_s_star, c_e, T, eta, k_eff, lambda_MHC, c_s_max, th) -> j
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erf

from ..constants import FARADAY as F, IDEAL_GAS as R


def _sqrt_relu(x, minval=0.0):
    return jnp.sqrt(jnp.maximum(minval, x))


def _log_relu(x, minval=1e-4):
    return jnp.log(jnp.maximum(minval, x))


def rxn_BV(c_s_star, c_e, T, eta, k_i, lambda_MHC, c_s_max, th):
    """Butler-Volmer with α=0.5 (custom_functions.jl:212-231).

    The sinh argument is clamped to ±30 (η ≈ ±1.5 V): far beyond any
    physical operating point, but it keeps a diverging Newton iterate from
    overflowing f32 (sinh(90) > f32 max) and poisoning the batch with NaN —
    the batched-robustness analogue of the reference's sqrt_ReLU clamps.
    """
    arg = jnp.clip(0.5 * F * eta / (R * T), -30.0, 30.0)
    return (2.0 * k_i
            * _sqrt_relu(c_e * c_s_star * (c_s_max - c_s_star))
            * jnp.sinh(arg))


def MHC_kfunc(eta, lam):
    """Zeng-Smith-Bai-Bazant MHC rate helper (custom_functions.jl:233-239)."""
    a = 1.0 + jnp.sqrt(lam)
    return (jnp.sqrt(jnp.pi * lam)
            * (1.0 - erf((lam - jnp.sqrt(a + eta**2)) / (2.0 * jnp.sqrt(lam))))
            / (1.0 + jnp.exp(-eta)))


def rxn_MHC(c_s_star, c_e, T, eta, k_i, lambda_MHC, c_s_max, th):
    """Marcus-Hush-Chidsey kinetics, α=0.5 branch (custom_functions.jl:241-298)."""
    eta_hat = eta * (F / (R * T))
    theta_i = c_s_star / c_s_max
    c_e0 = th["c_e0"]
    c_e_hat = c_e / c_e0

    eta_f = eta_hat + _log_relu(c_e_hat / theta_i, minval=1e-4)

    lam = lambda_MHC
    a = 1.0 + jnp.sqrt(lam)
    k0 = k_i / ((1.0 - erf((lam - jnp.sqrt(a)) / (2.0 * jnp.sqrt(lam)))) / 2.0)
    coeff_rd_ox = k0 * (1.0 - erf((lam - jnp.sqrt(a + eta_f**2))
                                  / (2.0 * jnp.sqrt(lam))))
    j_i = (coeff_rd_ox
           * (1.0 / (1.0 + jnp.exp(-eta_f)) * c_e0 * c_s_star
              - 1.0 / (1.0 + jnp.exp(+eta_f)) * c_e * c_s_max)
           * _sqrt_relu((1.0 - c_s_star / c_s_max) / c_e0))
    return j_i


def rxn_BV_gamma_mod_01(c_s_star, c_e, T, eta, k_i, lambda_MHC, c_s_max, th):
    """Activity-corrected Butler-Volmer (custom_functions.jl:300-321)."""
    alpha = 0.5
    theta_i = c_s_star / c_s_max
    c_e_hat = c_e / th["c_e0"]
    eta_hat = eta * (F / (R * T))
    act_R = theta_i / (1.0 - theta_i)
    gamma_ts = 1.0 / (theta_i * (1.0 - theta_i))
    ecd = k_i * c_e_hat ** (1 - alpha) * act_R**alpha / gamma_ts
    j_i = ecd * (jnp.exp(-alpha * eta_hat) - jnp.exp((1.0 - alpha) * eta_hat))
    return j_i * (-th["c_e0"] ** (1.0 - alpha) * c_s_max)


# Backwards-compatible alias matching the reference export name.
rxn_BV_gMod_01 = rxn_BV_gamma_mod_01
