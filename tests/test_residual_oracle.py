"""Reference-independent residual oracle (round-4 VERDICT directive 5).

A deliberately slow, loop/matrix-based **numpy** re-implementation of every
residual family, written fresh from the reference's discretization math
(residuals.jl:6-703, auxiliary_states_and_coefficients.jl:6-518,
numerical_tools.jl:8-217, custom_functions.jl) in the reference's own
*matrix-assembly* style — a different program shape from the repo's
flux-stencil `residual_core` — and evaluated at randomized off-equilibrium
states.  Agreement at ~1e-12 (relative to each family's scale) pins the
coefficient-level transcription of:

  * harmonic interface means and the interface β's     (numerical_tools.jl:106-189)
  * the Φ_e migration (concentration) term             (residuals.jl:631-645)
  * the radial FD / Chebyshev-spectral operators + BCs (residuals.jl:128-235)
  * the thermal interface rows, Robin BCs, Q sources   (residuals.jl:299-489,
                                                        auxiliary:344-518)
  * every kinetics / transport / OCV polynomial        (custom_functions.jl)

which the equilibrium-invariant tests (test_residuals.py) cannot see — a
transcription error that preserves equilibrium and shifts endpoints <1% would
slip through them but not through this pointwise oracle.

Documented deviations from the reference (kept deliberately, matched here):
  * polynomial-model Q relaxation uses -30·D_s·Q (Subramanian's coefficient;
    the reference drops the 30 — see residuals._res_Q docstring);
  * quadratic/polynomial c_s_star uses D_s_eff evaluated at c_s_avg, then
    refreshes D_s_eff at c_s_star for downstream users (residuals.
    build_auxiliary docstring);
  * half-cell (Li_metal) and stress-LAM physics are beyond-reference; their
    oracle is re-derived from the repo's documented equations.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from petlion_tpu.chemistry import LCO, NMC, NMC_LGM50
from petlion_tpu.physics import kinetics, ocv, transport
from petlion_tpu.physics.initial_guess import initial_guess
from petlion_tpu.physics.residuals import ModelConfig, residual_core

pytestmark = pytest.mark.fast

F = 96485.3321233
R = 8.31446261815324
T_REF = 298.15


# ---------------------------------------------------------------------------
# numpy re-typed closures (independent transcription of custom_functions.jl)
# ---------------------------------------------------------------------------

def _arr(Ea, T):
    T = np.asarray(T, float)
    return np.where(T == T_REF, 1.0, np.exp(-Ea / R * (1.0 / T - 1.0 / T_REF)))


def np_D_s_eff(cp, cn, Tp, Tn, th):
    return (th["D_sp"] * _arr(th["Ea_D_sp"], Tp),
            th["D_sn"] * _arr(th["Ea_D_sn"], Tn))


def np_D_s_eff_iso(cp, cn, Tp, Tn, th):
    return (th["D_sp"] * np.ones_like(Tp), th["D_sn"] * np.ones_like(Tn))


def np_rxn_rate(Tp, Tn, cp, cn, th):
    return (th["k_p"] * _arr(th["Ea_k_p"], Tp),
            th["k_n"] * _arr(th["Ea_k_n"], Tn))


def np_rxn_rate_iso(Tp, Tn, cp, cn, th):
    return th["k_p"] * np.ones_like(Tp), th["k_n"] * np.ones_like(Tn)


def np_D_eff_linear(cp, cs, cn, Tp, Ts, Tn, th):
    return (th["D_p"] * th["eps_p"] ** th["brugg_p"] * np.ones_like(cp),
            th["D_s"] * th["eps_s"] ** th["brugg_s"] * np.ones_like(cs),
            th["D_n"] * th["eps_n"] ** th["brugg_n"] * np.ones_like(cn))


def np_D_eff(cp, cs, cn, Tp, Ts, Tn, th):
    def d(c, T):
        return 1e-4 * 10.0 ** (-4.43 - 54.0 / (T - 229.0 - 5e-3 * c)
                               - 0.22e-3 * c)
    return (th["eps_p"] ** th["brugg_p"] * d(cp, Tp),
            th["eps_s"] ** th["brugg_s"] * d(cs, Ts),
            th["eps_n"] ** th["brugg_n"] * d(cn, Tn))


def np_D_eff_LGM50(cp, cs, cn, Tp, Ts, Tn, th):
    def d(c):
        x = c / 1000.0
        return th["D_e"] * (x * x - 4.516715942688196 * x
                            + 5.5287696156470325)
    return (th["eps_p"] ** th["brugg_p"] * d(cp),
            th["eps_s"] ** th["brugg_s"] * d(cs),
            th["eps_n"] ** th["brugg_n"] * d(cn))


def np_K_eff(cp, cs, cn, Tp, Ts, Tn, th):
    def k(c, T):
        return 1e-4 * c * ((-10.5 + 0.668e-3 * c + 0.494e-6 * c**2)
                           + (0.074 - 1.78e-5 * c - 8.86e-10 * c**2) * T
                           + (-6.96e-5 + 2.8e-8 * c) * T**2) ** 2
    return (th["eps_p"] ** th["brugg_p"] * k(cp, Tp),
            th["eps_s"] ** th["brugg_s"] * k(cs, Ts),
            th["eps_n"] ** th["brugg_n"] * k(cn, Tn))


def np_K_eff_LGM50(cp, cs, cn, Tp, Ts, Tn, th):
    def k(c):
        x = c / 1000.0
        return 0.1297 * x**3 - 2.51 * x**1.5 + 3.329 * x
    return (th["eps_p"] ** th["brugg_p"] * k(cp),
            th["eps_s"] ** th["brugg_s"] * k(cs),
            th["eps_n"] ** th["brugg_n"] * k(cn))


def np_tf_linear(cp, cs, cn, Tp, Ts, Tn, th):
    return np.ones_like(cp), np.ones_like(cs), np.ones_like(cn)


def np_tf(cp, cs, cn, Tp, Ts, Tn, th):
    def f(c, T):
        x = c / 1000.0
        return (0.601 - 0.24 * np.sqrt(x)
                + 0.982 * (1 - 0.0052 * (T - 293.0)) * x**1.5)
    return f(cp, Tp), f(cs, Ts), f(cn, Tn)


def np_rxn_BV(c_s, c_e, T, eta, k, lam, c_max, th):
    arg = np.clip(0.5 * F * eta / (R * T), -30.0, 30.0)
    return (2.0 * k * np.sqrt(np.maximum(0.0, c_e * c_s * (c_max - c_s)))
            * np.sinh(arg))


def np_rxn_MHC(c_s, c_e, T, eta, k, lam, c_max, th):
    from scipy.special import erf
    eta_hat = eta * F / (R * T)
    theta = c_s / c_max
    c_e0 = th["c_e0"]
    eta_f = eta_hat + np.log(np.maximum(1e-4, (c_e / c_e0) / theta))
    a = 1.0 + np.sqrt(lam)
    k0 = k / ((1.0 - erf((lam - np.sqrt(a)) / (2.0 * np.sqrt(lam)))) / 2.0)
    coeff = k0 * (1.0 - erf((lam - np.sqrt(a + eta_f**2))
                            / (2.0 * np.sqrt(lam))))
    return (coeff * (c_e0 * c_s / (1.0 + np.exp(-eta_f))
                     - c_e * c_max / (1.0 + np.exp(eta_f)))
            * np.sqrt(np.maximum(0.0, (1.0 - c_s / c_max) / c_e0)))


def np_OCV_LCO(x, T, th=None):
    U = ((-4.656 + 88.669 * x**2 - 401.119 * x**4 + 342.909 * x**6
          - 462.471 * x**8 + 433.434 * x**10)
         / (-1.0 + 18.933 * x**2 - 79.532 * x**4 + 37.311 * x**6
            - 73.083 * x**8 + 95.96 * x**10))
    dUdT = -0.001 * ((0.199521039 - 0.928373822 * x
                      + 1.364550689000003 * x**2 - 0.6115448939999998 * x**3)
                     / (1.0 - 5.661479886999997 * x + 11.47636191 * x**2
                        - 9.82431213599998 * x**3 + 3.048755063 * x**4))
    return U + np.where(T == T_REF, 0.0, dUdT * (T - T_REF)), dUdT


def np_OCV_LiC6(x, T, th=None):
    U = (0.7222 + 0.1387 * x + 0.029 * np.sqrt(np.maximum(0.0, x))
         - 0.0172 / x
         + 0.0019 / (np.sqrt(np.maximum(1e-4, x)) * x)
         + 0.2808 * np.exp(0.9 - 15.0 * x)
         - 0.7984 * np.exp(0.4465 * x - 0.4108))
    num = (0.005269056 + 3.299265709 * x - 91.79325798 * x**2
           + 1004.911008 * x**3 - 5812.278127 * x**4 + 19329.7549 * x**5
           - 37147.8947 * x**6 + 38379.18127 * x**7 - 16515.05308 * x**8)
    den = (1.0 - 48.09287227 * x + 1017.234804 * x**2 - 10481.80419 * x**3
           + 59431.3 * x**4 - 195881.6488 * x**5 + 374577.3152 * x**6
           - 385821.1607 * x**7 + 165705.8597 * x**8)
    dUdT = 0.001 * num / den
    return U + np.where(T == T_REF, 0.0, dUdT * (T - T_REF)), dUdT


def np_OCV_NMC(x, T, th=None):
    U = -10.72 * x**4 + 23.88 * x**3 - 16.77 * x**2 + 2.595 * x + 4.563
    return U, np.zeros_like(U)


def np_OCV_LiC6_with_NMC(x, T, th=None):
    U = (0.1493 + 0.8493 * np.exp(-61.79 * x) + 0.3824 * np.exp(-665.8 * x)
         - np.exp(39.42 * x - 41.92)
         - 0.03131 * np.arctan(25.59 * x - 4.099)
         - 0.009434 * np.arctan(32.49 * x - 15.74))
    return U, np.zeros_like(U)


def np_OCV_NMC_LGM50(x, T, th=None):
    U = (-0.8090 * x + 4.4875 - 0.0428 * np.tanh(18.5138 * (x - 0.5542))
         - 17.7326 * np.tanh(15.7890 * (x - 0.3117))
         + 17.5842 * np.tanh(15.9308 * (x - 0.3120)))
    return U, np.zeros_like(U)


def np_OCV_LiC6_LGM50(x, T, th=None):
    U = (1.9793 * np.exp(-39.3631 * x) + 0.15561
         - 0.0909 * np.tanh(29.8538 * (x - 0.1234))
         - 0.04478 * np.tanh(14.9159 * (x - 0.2769))
         - 0.0205 * np.tanh(30.4444 * (x - 0.6103))
         - 0.09259 * np.tanh(17.08 * (x - 1.0)))
    return U, np.zeros_like(U)


NP_FN = {
    transport.D_s_eff: np_D_s_eff,
    transport.D_s_eff_isothermal: np_D_s_eff_iso,
    transport.rxn_rate: np_rxn_rate,
    transport.rxn_rate_isothermal: np_rxn_rate_iso,
    transport.D_eff_linear: np_D_eff_linear,
    transport.D_eff: np_D_eff,
    transport.D_eff_LGM50: np_D_eff_LGM50,
    transport.K_eff: np_K_eff,
    transport.K_eff_LGM50: np_K_eff_LGM50,
    transport.thermodynamic_factor_linear: np_tf_linear,
    transport.thermodynamic_factor: np_tf,
    kinetics.rxn_BV: np_rxn_BV,
    kinetics.rxn_MHC: np_rxn_MHC,
    ocv.OCV_LCO: np_OCV_LCO,
    ocv.OCV_LiC6: np_OCV_LiC6,
    ocv.OCV_NMC: np_OCV_NMC,
    ocv.OCV_LiC6_with_NMC: np_OCV_LiC6_with_NMC,
    ocv.OCV_NMC_LGM50: np_OCV_NMC_LGM50,
    ocv.OCV_LiC6_LGM50: np_OCV_LiC6_LGM50,
}


# ---------------------------------------------------------------------------
# grid helpers in the reference's form (numerical_tools.jl)
# ---------------------------------------------------------------------------

def _widths_psn(N, th, hc):
    h = [th["l_p"] / N.p] * N.p + [th["l_s"] / N.s] * N.s
    if not hc:
        h += [th["l_n"] / N.n] * N.n
    return np.array(h)


def _edge_harmonic(vals, h):
    """Harmonic mean at each internal edge: β = h_l/2 / (h_l/2 + h_r/2)."""
    out = np.zeros(len(vals) - 1)
    for i in range(len(vals) - 1):
        beta = (h[i] / 2.0) / (h[i] / 2.0 + h[i + 1] / 2.0)
        out[i] = vals[i] * vals[i + 1] / (beta * vals[i + 1]
                                          + (1.0 - beta) * vals[i])
    return out


def _edge_gradient(vals, h):
    out = np.zeros(len(vals) - 1)
    for i in range(len(vals) - 1):
        out[i] = (vals[i + 1] - vals[i]) / (h[i] / 2.0 + h[i + 1] / 2.0)
    return out


# ---------------------------------------------------------------------------
# radial operators, built independently (numerical_tools.jl:8-76 tables,
# residuals.jl:193-203 Chebyshev)
# ---------------------------------------------------------------------------

def _fd1_matrix(n):
    dx = 1.0 / (n - 1)
    M = np.zeros((n, n))
    M[0, :9] = [-109584, 322560, -564480, 752640, -705600, 451584,
                -188160, 46080, -5040]
    M[1, :9] = [-5040, -64224, 141120, -141120, 117600, -70560,
                28224, -6720, 720]
    M[2, :9] = [720, -11520, -38304, 80640, -50400, 26880, -10080, 2304, -240]
    M[3, :9] = [-240, 2880, -20160, -18144, 50400, -20160, 6720, -1440, 144]
    mid = [144, -1536, 8064, -32256, 0, 32256, -8064, 1536, -144]
    for r, i in enumerate(range(4, n - 4)):
        M[i, r:r + 9] = mid
    M[n - 4, -9:] = [-144, 1440, -6720, 20160, -50400, 18144,
                     20160, -2880, 240]
    M[n - 3, -9:] = [240, -2304, 10080, -26880, 50400, -80640,
                     38304, 11520, -720]
    M[n - 2, -9:] = [-720, 6720, -28224, 70560, -117600, 141120,
                     -141120, 64224, 5040]
    M[n - 1, -9:] = [5040, -46080, 188160, -451584, 705600, -752640,
                     564480, -322560, 109584]
    return M, 1.0 / (40320.0 * dx), dx


def _fd2_matrix(n):
    dx = 1.0 / (n - 1)
    M = np.zeros((n, n))
    M[0, :6] = [-415.0 / 6, 96, -36, 32.0 / 3, -1.5, 0]
    M[1, :6] = [10, -15, -4, 14, -6, 1]
    mid = [-1, 16, -30, 16, -1]
    for r, i in enumerate(range(2, n - 2)):
        M[i, r:r + 5] = mid
    M[n - 2, -6:] = [1, -6, 14, -4, -15, 10]
    M[n - 1, -6:] = [0, -1.5, 32.0 / 3, -36, 96, -415.0 / 6]
    return M, 1.0 / (12.0 * dx * dx), dx


def _cheb(N):
    x = np.cos(np.linspace(0.0, np.pi, N + 1))
    c = np.concatenate([[2.0], np.ones(N - 1), [2.0]]) \
        * (-1.0) ** np.arange(N + 1)
    X = np.tile(x[:, None], (1, N + 1))
    dX = X - X.T
    D = np.outer(c, 1.0 / c) / (dX + np.eye(N + 1))
    D = D - np.diag(D.sum(axis=1))
    return D, x


def _radial_rhs_fd(c_s, j, Rp, D_s, n_el, n_r):
    M1, c1, dx = _fd1_matrix(n_r)
    M2, c2, _ = _fd2_matrix(n_r)
    rhs = np.zeros(n_el * n_r)
    r_nodes = np.linspace(1.0 / (n_r - 1), 1.0, n_r - 1)
    for i in range(n_el):
        c = c_s[i * n_r:(i + 1) * n_r]
        d1 = c1 * (M1 @ c)
        d1[-1] = -j[i] / D_s[i] * Rp
        d1[0] = 0.0
        d2 = c2 * (M2 @ c)
        d2[-1] += 50.0 * dx * d1[-1] * c2
        inner = np.concatenate([[3.0 * d2[0]],
                                d2[1:] + (2.0 / r_nodes) * d1[1:]])
        rhs[i * n_r:(i + 1) * n_r] = (D_s[i] / Rp**2) * inner
    return rhs


def _radial_rhs_spectral(c_s, j, Rp, D_s, n_el, n_r):
    D, x = _cheb(n_r - 1)
    rhs = np.zeros(n_el * n_r)
    for i in range(n_el):
        c = c_s[i * n_r:(i + 1) * n_r]
        dcr = D @ c[::-1]
        dcr[0] = -j[i] * Rp * 0.5 / D_s[i]
        dcr[-1] = 0.0
        num = (D @ (4.0 * D_s[i] * (x + 1.0) ** 2 * dcr / Rp**2))[::-1]
        lim = (4.0 * D_s[i] / Rp**2) * 3.0 * (D @ dcr)
        rhs[i * n_r:(i + 1) * n_r] = np.concatenate(
            [[lim[-1]], num[1:] / (x[:-1][::-1] + 1.0) ** 2])
    return rhs


# ---------------------------------------------------------------------------
# the oracle residual
# ---------------------------------------------------------------------------

def oracle_residual(t, y, yp, th, cfg: ModelConfig):
    N, num, L = cfg.N, cfg.numerics, cfg.layout
    hc = cfg.half_cell
    n_n = 0 if hc else N.n
    th = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v, float))
          for k, v in th.items()}
    y = np.asarray(y, float)
    yp = np.asarray(yp, float)

    def g(name, sec=None):
        return y[L.sl(name, sec)]

    # ---- auxiliary states (auxiliary_states_and_coefficients.jl:6-52) -----
    c_e = g("c_e")
    c_e_p, c_e_s, c_e_n = c_e[:N.p], c_e[N.p:N.p + N.s], c_e[N.p + N.s:]
    j = g("j")
    Phi_e, Phi_s = g("Phi_e"), g("Phi_s")
    I1C = (F / 3600.0) * min(
        (1 - th["eps_fp"] - th["eps_p"]) * th["l_p"] * th["c_max_p"]
        * (th["theta_min_p"] - th["theta_max_p"]),
        (1 - th["eps_fn"] - th["eps_n"]) * th["l_n"] * th["c_max_n"]
        * (th["theta_max_n"] - th["theta_min_n"]))
    I_density = y[L.sl("I").start] * I1C

    if num.temperature:
        T_full = g("T") + th["T_amb"]        # state carries the offset
    else:
        T_full = np.full(N.a + N.p + N.s + n_n + N.z, th["T0"])
    T_p = T_full[N.a:N.a + N.p]
    T_s = T_full[N.a + N.p:N.a + N.p + N.s]
    T_n = T_full[N.a + N.p + N.s:N.a + N.p + N.s + n_n]

    if num.aging == "SEI":
        j_s = g("j_s")
        j_tot = j.copy()
        j_tot[N.p:] += j_s
    else:
        j_s = np.zeros(n_n)
        j_tot = j

    if num.aging == "stress":
        eps_sp = np.maximum(g("eps_s", "p"), 0.0)
        eps_sn = np.maximum(g("eps_s", "n"), 0.0)
    else:
        eps_sp = (1 - th["eps_fp"] - th["eps_p"]) * np.ones(N.p)
        eps_sn = (1 - th["eps_fn"] - th["eps_n"]) * np.ones(n_n)
    a_p = 3.0 * eps_sp / th["Rp_p"]
    a_n = 3.0 * eps_sn / th["Rp_n"]
    porosity = np.concatenate([1.0 - th["eps_fp"] - eps_sp,
                               th["eps_s"] * np.ones(N.s),
                               1.0 - th["eps_fn"] - eps_sn])
    sigma_eff_p = th["sigma_p"] * eps_sp
    sigma_eff_n = th["sigma_n"] * eps_sn

    np_D_s = NP_FN[num.D_s_eff]
    if num.solid_diffusion == "Fickian":
        c_star_p = g("c_s_avg", "p").reshape(-1, N.r_p)[:, -1]
        c_star_n = (g("c_s_avg", "n").reshape(-1, N.r_n)[:, -1]
                    if not hc else np.zeros(0))
        D_s_p, D_s_n = np_D_s(c_star_p, c_star_n, T_p, T_n, th)
    else:
        cav_p, cav_n = g("c_s_avg", "p"), g("c_s_avg", "n")
        D_s_p, D_s_n = np_D_s(cav_p, cav_n, T_p, T_n, th)
        jp, jn = j[:N.p], j[N.p:]
        if num.solid_diffusion == "quadratic":
            c_star_p = cav_p - th["Rp_p"] / (5.0 * D_s_p) * jp
            c_star_n = cav_n - th["Rp_n"] / (5.0 * D_s_n) * jn
        else:
            Qp, Qn = g("Q", "p"), g("Q", "n")
            c_star_p = cav_p + th["Rp_p"] / (35.0 * D_s_p) * (
                -jp + 8.0 * D_s_p * Qp)
            c_star_n = cav_n + th["Rp_n"] / (35.0 * D_s_n) * (
                -jn + 8.0 * D_s_n * Qn)
        # refresh at the surface concentration (repo-documented order)
        D_s_p, D_s_n = np_D_s(c_star_p, c_star_n, T_p, T_n, th)

    np_OCVp, np_OCVn = NP_FN[num.OCV_p], NP_FN[num.OCV_n]
    U_p, dUdT_p = np_OCVp(c_star_p / th["c_max_p"], T_p, th)
    U_n, dUdT_n = np_OCVn(c_star_n / th["c_max_n"], T_n, th)
    eta_p = Phi_s[:N.p] - Phi_e[:N.p] - U_p
    eta_n = Phi_s[N.p:] - Phi_e[N.p + N.s:] - U_n
    if "R_film_n" in th:
        eta_n = eta_n - j[N.p:] * F * th["R_film_n"]
    if num.aging == "SEI":
        R_film = th["R_SEI"] + g("film") / th["k_n_aging"]
        eta_n = eta_n - F * j[N.p:] * R_film

    K_p, K_s, K_n = NP_FN[num.K_eff](c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th)
    D_p, D_sep, D_n = NP_FN[num.D_eff](c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th)
    nu_p, nu_s, nu_n = NP_FN[num.thermodynamic_factor](
        c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th)

    h = _widths_psn(N, th, hc)
    n_ce = len(h)
    parts = {}

    # ---- c_e (residuals.jl:6-106) ------------------------------------------
    D_all = np.concatenate([D_p, D_sep] + ([] if hc else [D_n]))
    D_edge = _edge_harmonic(D_all, h)
    grad = _edge_gradient(c_e, h)
    rhs = np.zeros(n_ce)
    for i in range(n_ce):
        fl = D_edge[i - 1] * grad[i - 1] if i > 0 else 0.0
        fr = D_edge[i] * grad[i] if i < n_ce - 1 else 0.0
        rhs[i] = (fr - fl) / h[i]
    src = np.zeros(n_ce)
    src[:N.p] = (1 - th["t_plus"]) * nu_p * a_p * j_tot[:N.p]
    if not hc:
        src[N.p + N.s:] = (1 - th["t_plus"]) * nu_n * a_n * j_tot[N.p:]
    else:
        j_foil = -I_density / F
        src[-1] += (1 - th["t_plus"]) * nu_s[-1] * j_foil / h[-1]
    parts["c_e"] = (rhs + src) / porosity - yp[L.sl("c_e")]

    # ---- c_s_avg (residuals.jl:108-235) ------------------------------------
    if num.solid_diffusion == "Fickian":
        radial = (_radial_rhs_fd if num.Fickian_method == "finite_difference"
                  else _radial_rhs_spectral)
        rhs_p = radial(g("c_s_avg", "p"), j[:N.p], th["Rp_p"], D_s_p,
                       N.p, N.r_p)
        rhs_n = radial(g("c_s_avg", "n"), j[N.p:], th["Rp_n"], D_s_n,
                       n_n, N.r_n)
        rhs_cs = np.concatenate([rhs_p, rhs_n])
    else:
        rhs_cs = np.concatenate([-3.0 * j[:N.p] / th["Rp_p"],
                                 -3.0 * j[N.p:] / th["Rp_n"]])
    parts["c_s_avg"] = rhs_cs - yp[L.sl("c_s_avg")]

    # ---- T (residuals.jl:299-489 + auxiliary:344-518) ----------------------
    if num.temperature:
        hT = np.array([th["l_a"] / N.a] * N.a + [th["l_p"] / N.p] * N.p
                      + [th["l_s"] / N.s] * N.s
                      + ([th["l_n"] / N.n] * N.n if not hc else [])
                      + [th["l_z"] / N.z] * N.z)
        lam = np.concatenate([np.full(N.a, th["lam_a"]),
                              np.full(N.p, th["lam_p"]),
                              np.full(N.s, th["lam_s"]),
                              np.full(0 if hc else N.n, th["lam_n"]),
                              np.full(N.z, th["lam_z"])])
        rho_cp = np.concatenate([
            np.full(N.a, th["rho_a"] * th["Cp_a"]),
            np.full(N.p, th["rho_p"] * th["Cp_p"]),
            np.full(N.s, th["rho_s"] * th["Cp_s"]),
            np.full(0 if hc else N.n, th["rho_n"] * th["Cp_n"]),
            np.full(N.z, th["rho_z"] * th["Cp_z"])])
        nT = len(hT)
        A = np.zeros((nT, nT))
        lam_edge = _edge_harmonic(lam, hT)
        for i in range(nT):
            if i > 0:
                d = hT[i - 1] / 2 + hT[i] / 2
                A[i, i - 1] += lam_edge[i - 1] / (d * hT[i])
                A[i, i] -= lam_edge[i - 1] / (d * hT[i])
            if i < nT - 1:
                d = hT[i] / 2 + hT[i + 1] / 2
                A[i, i + 1] += lam_edge[i] / (d * hT[i])
                A[i, i] -= lam_edge[i] / (d * hT[i])
        # heat sources (auxiliary:344-518): section-aware FD derivatives
        h_p, h_s = th["l_p"] / N.p, th["l_s"] / N.s
        h_n = th["l_n"] / N.n

        def fdl(x, hh):
            return (-3 * x[0] + 4 * x[1] - x[2]) / (2 * hh)

        def fdr(x, hh):
            return (3 * x[-1] - 4 * x[-2] + x[-3]) / (2 * hh)

        def central(x, hh):
            return (x[2:] - x[:-2]) / (2 * hh)

        def acd_r(xl, hl, xr, hr):
            return 2 * (xr[0] - xl[-2]) / (3 * hl + hr)

        def acd_l(xl, hl, xr, hr):
            return 2 * (xr[1] - xl[-1]) / (hl + 3 * hr)

        Phi_e_p, Phi_e_s = Phi_e[:N.p], Phi_e[N.p:N.p + N.s]
        Phi_e_n = Phi_e[N.p + N.s:]
        dPe_p = np.concatenate([[fdl(Phi_e_p, h_p)], central(Phi_e_p, h_p),
                                [acd_r(Phi_e_p, h_p, Phi_e_s, h_s)]])
        if hc:
            dPe_s = np.concatenate([[acd_l(Phi_e_p, h_p, Phi_e_s, h_s)],
                                    central(Phi_e_s, h_s),
                                    [fdr(Phi_e_s, h_s)]])
            dPe_n = np.zeros(0)
        else:
            dPe_s = np.concatenate([[acd_l(Phi_e_p, h_p, Phi_e_s, h_s)],
                                    central(Phi_e_s, h_s),
                                    [acd_r(Phi_e_s, h_s, Phi_e_n, h_n)]])
            dPe_n = np.concatenate([[acd_l(Phi_e_s, h_s, Phi_e_n, h_n)],
                                    central(Phi_e_n, h_n),
                                    [fdr(Phi_e_n, h_n)]])
        dce_p = np.concatenate([[fdl(c_e_p, h_p)], central(c_e_p, h_p),
                                [acd_r(c_e_p, h_p, c_e_s, h_s)]])
        if hc:
            dce_s = np.concatenate([[acd_l(c_e_p, h_p, c_e_s, h_s)],
                                    central(c_e_s, h_s), [fdr(c_e_s, h_s)]])
            dce_n = np.zeros(0)
        else:
            dce_s = np.concatenate([[acd_l(c_e_p, h_p, c_e_s, h_s)],
                                    central(c_e_s, h_s),
                                    [acd_r(c_e_s, h_s, c_e_n, h_n)]])
            dce_n = np.concatenate([[acd_l(c_e_s, h_s, c_e_n, h_n)],
                                    central(c_e_n, h_n), [fdr(c_e_n, h_n)]])
        Phi_s_p, Phi_s_n = Phi_s[:N.p], Phi_s[N.p:]
        dPs_p = np.concatenate([[fdl(Phi_s_p, h_p)], central(Phi_s_p, h_p),
                                [fdr(Phi_s_p, h_p)]])
        dPs_n = (np.zeros(0) if hc else
                 np.concatenate([[fdl(Phi_s_n, h_n)], central(Phi_s_n, h_n),
                                 [fdr(Phi_s_n, h_n)]]))
        tp = 1 - th["t_plus"]
        Q_ohm_p = (K_p * dPe_p**2
                   + 2 * R * K_p * T_p * tp * nu_p / F * (dce_p / c_e_p)
                   * dPe_p + sigma_eff_p * dPs_p**2)
        Q_ohm_s = (K_s * dPe_s**2
                   + 2 * R * K_s * T_s * tp * nu_s / F * (dce_s / c_e_s)
                   * dPe_s)
        Q_ohm_n = (K_n * dPe_n**2
                   + 2 * R * K_n * T_n * tp * nu_n / F * (dce_n / c_e_n)
                   * dPe_n + sigma_eff_n * dPs_n**2)
        Q_rev = np.concatenate([np.zeros(N.a),
                                F * a_p * j_tot[:N.p] * T_p * dUdT_p,
                                np.zeros(N.s),
                                F * a_n * j_tot[N.p:] * T_n * dUdT_n,
                                np.zeros(N.z)])
        Q_rxn = np.concatenate([np.zeros(N.a),
                                F * a_p * j_tot[:N.p] * eta_p,
                                np.zeros(N.s),
                                F * a_n * j_tot[N.p:] * eta_n,
                                np.zeros(N.z)])
        Q_ohm = np.concatenate([
            np.full(N.a, I_density**2 / th["sigma_a"]),
            Q_ohm_p, Q_ohm_s, Q_ohm_n,
            np.full(N.z, I_density**2 / th["sigma_z"])])
        if hc:
            i_z0 = N.a + N.p + N.s
            Q_rxn[i_z0] += -I_density * (-Phi_e[-1]) / hT[i_z0]
        bc = np.zeros(nT)
        bc[0] = th["h_cell"] * (th["T_amb"] - T_full[0]) / hT[0]
        bc[-1] = -th["h_cell"] * (T_full[-1] - th["T_amb"]) / hT[-1]
        rhsT = (A @ T_full + Q_rev + Q_rxn + Q_ohm + bc) / rho_cp
        parts["T"] = rhsT - yp[L.sl("T")]

    # ---- film / SOH (residuals.jl:260-297) ----------------------------------
    if num.aging == "SEI":
        parts["film"] = -j_s * th["M_n"] / th["rho_n"] - yp[L.sl("film")]
        # SOH: trapz of j_s extended by quadratic extrapolation to the
        # section edges (external.jl:469-523)
        centers = (np.arange(N.n) + 0.5) / N.n
        x = np.concatenate([[0.0], centers, [1.0]]) * th["l_n"]
        pl = np.polyfit(centers[:3], j_s[:3], 2)
        prr = np.polyfit(centers[:3], j_s[::-1][:3], 2)
        yv = np.concatenate([[np.polyval(pl, 0.0)], j_s,
                             [np.polyval(prr, 0.0)]])
        trapz = np.sum(0.5 * np.diff(x) * (yv[1:] + yv[:-1]))
        j_s_int = -trapz * F * a_n[0] / (3600.0 * I1C)  # a_n uniform (SEI)
        parts["SOH"] = np.atleast_1d(-j_s_int) - yp[L.sl("SOH")]

    # ---- stress-LAM eps_s (repo-documented model) ---------------------------
    if num.aging == "stress":
        if num.solid_diffusion == "Fickian":
            if num.Fickian_method == "finite_difference":
                def wgt(n_r):
                    r = np.linspace(0.0, 1.0, n_r)
                    w = 3.0 * r * r
                    w[0] *= 0.5
                    w[-1] *= 0.5
                    return w / w.sum()
            else:
                def wgt(n_r):
                    # Clenshaw-Curtis ∫(x+1)²/8·3 dx on cheb nodes, reversed
                    Nn = n_r - 1
                    xs = np.cos(np.linspace(0, np.pi, Nn + 1))
                    w_cc = np.zeros(Nn + 1)
                    for k in range(Nn + 1):
                        s = 0.0
                        for jj in range(1, Nn // 2 + 1):
                            b = 1.0 if 2 * jj == Nn else 2.0
                            s += b / (4 * jj * jj - 1) * np.cos(
                                2 * jj * k * np.pi / Nn)
                        cc = 1.0 if k in (0, Nn) else 2.0
                        w_cc[k] = (cc / Nn) * (1.0 - s)
                    w = (3.0 / 8.0) * w_cc * (xs + 1.0) ** 2
                    w = w[::-1].copy()
                    return w / w.sum()
            cbar_p = g("c_s_avg", "p").reshape(-1, N.r_p) @ wgt(N.r_p)
            cbar_n = g("c_s_avg", "n").reshape(-1, N.r_n) @ wgt(N.r_n)
        else:
            cbar_p, cbar_n = g("c_s_avg", "p"), g("c_s_avg", "n")
        sig_h_p = (2 * th["Omega_p"] * th["E_p"]
                   / (9 * (1 - th["nu_p"]))) * (cbar_p - c_star_p)
        sig_h_n = (2 * th["Omega_n"] * th["E_n"]
                   / (9 * (1 - th["nu_n"]))) * (cbar_n - c_star_n)
        rate = np.concatenate([
            -th["beta_LAM"] * (np.maximum(sig_h_p, 0.0)
                               / th["sigma_critical_p"]) ** th["m_LAM"],
            -th["beta_LAM"] * (np.maximum(sig_h_n, 0.0)
                               / th["sigma_critical_n"]) ** th["m_LAM"]])
        rate = np.where(y[L.sl("eps_s")] > 0.0, rate, 0.0)
        parts["eps_s"] = rate - yp[L.sl("eps_s")]

    # ---- Q (polynomial; Subramanian coefficient, repo-documented) ----------
    if num.solid_diffusion == "polynomial":
        Qp, Qn = g("Q", "p"), g("Q", "n")
        parts["Q"] = np.concatenate([
            (-30.0 * D_s_p * Qp - 22.5 * j[:N.p]) / th["Rp_p"]**2,
            (-30.0 * D_s_n * Qn - 22.5 * j[N.p:]) / th["Rp_n"]**2,
        ]) - yp[L.sl("Q")]

    # ---- j (residuals.jl:491-517) -------------------------------------------
    np_rate = NP_FN[num.rxn_rate]
    k_p, k_n = np_rate(T_p, T_n, c_star_p, c_star_n, th)
    lam_p = th.get("lambda_MHC_p", 0.0)
    lam_n = th.get("lambda_MHC_n", 0.0)
    j_p_calc = NP_FN[num.rxn_p](c_star_p, c_e_p, T_p, eta_p, k_p, lam_p,
                                th["c_max_p"], th)
    j_n_calc = NP_FN[num.rxn_n](c_star_n, c_e[N.p + N.s:], T_n, eta_n, k_n,
                                lam_n, th["c_max_n"], th)
    parts["j"] = np.concatenate([j_p_calc, j_n_calc]) - j

    # ---- Phi_e (residuals.jl:554-654) ---------------------------------------
    K_all = np.concatenate([K_p, K_s] + ([] if hc else [K_n]))
    K_edge = _edge_harmonic(K_all, h)
    T_psn = T_full[N.a:N.a + N.p + N.s + n_n]
    T_edge = _edge_harmonic(T_psn, h)
    c_edge = _edge_harmonic(c_e, h)
    dc_edge = _edge_gradient(c_e, h)
    dPhi_edge = _edge_gradient(Phi_e, h)
    nu_all = np.concatenate([nu_p, nu_s] + ([] if hc else [nu_n]))
    res_pe = np.zeros(n_ce)
    prod = K_edge * T_edge * dc_edge / c_edge
    for i in range(n_ce):
        fl = K_edge[i - 1] * dPhi_edge[i - 1] if i > 0 else 0.0
        fr = K_edge[i] * dPhi_edge[i] if i < n_ce - 1 else 0.0
        pl = prod[i - 1] if i > 0 else 0.0
        pr = prod[i] if i < n_ce - 1 else 0.0
        Kfac = 2.0 * R * (1 - th["t_plus"]) * nu_all[i] / F
        f_i = -Kfac * (pr - pl)
        if i < N.p:
            f_i += h[i] * F * a_p[i] * j_tot[i]
        elif not hc and i >= N.p + N.s:
            f_i += h[i] * F * a_n[i - N.p - N.s] * j_tot[N.p + i - N.p - N.s]
        res_pe[i] = -(fr - fl) - f_i
    if hc:
        # foil charge-balance row (repo-documented half-cell ground)
        c_s_ref = 0.5 * th["c_max_n"]
        _, k_nf = np_rate(T_p, T_psn[-1], c_star_p, c_s_ref, th)
        j_foil = NP_FN[num.rxn_n](c_s_ref, c_e[-1], T_psn[-1], -Phi_e[-1],
                                  k_nf, th.get("lambda_MHC_n", 0.0),
                                  th["c_max_n"], th)
        res_pe[-1] = F * j_foil + I_density
    else:
        res_pe[-1] = Phi_e[-1]
    parts["Phi_e"] = res_pe

    # ---- Phi_s (residuals.jl:656-703) ---------------------------------------
    h_p = th["l_p"] / N.p

    def electrode_rows(Phi, f):
        n = len(Phi)
        out = np.zeros(n)
        for i in range(n):
            lap = 0.0
            if i > 0:
                lap += Phi[i - 1] - Phi[i]
            if i < n - 1:
                lap += Phi[i + 1] - Phi[i]
            out[i] = lap - f[i]
        return out

    f_p = h_p**2 * a_p * F * j_tot[:N.p]
    f_p[0] += -I_density * h_p
    f_p = f_p / sigma_eff_p
    if hc:
        parts["Phi_s"] = electrode_rows(Phi_s[:N.p], f_p)
    else:
        h_nn = th["l_n"] / N.n
        f_n = h_nn**2 * a_n * F * j_tot[N.p:]
        f_n[-1] += I_density * h_nn
        f_n = f_n / sigma_eff_n
        parts["Phi_s"] = np.concatenate([
            electrode_rows(Phi_s[:N.p], f_p),
            electrode_rows(Phi_s[N.p:], f_n)])

    # ---- j_s (residuals.jl:519-552) -----------------------------------------
    if num.aging == "SEI":
        R_film = th["R_SEI"] + g("film") / th["k_n_aging"]
        eta_s = (Phi_s[N.p:] - Phi_e[N.p + N.s:] - th["Uref_s"]
                 - F * j_tot[N.p:] * R_film)
        j_s_calc = -np.abs(th["i_0_jside"] * (I_density / I1C) ** th["w"] / F
                           * (-np.exp(-0.5 * F / (R * T_n) * eta_s)))
        j_s_calc = np.where(I_density > 0, j_s_calc, 0.0)
        parts["j_s"] = j_s - j_s_calc

    parts["I"] = np.zeros(1)   # control row: left 0 by residual_core
    order = [name for name, _ in L._entries]
    return np.concatenate([parts[name] for name in order]), parts


# ---------------------------------------------------------------------------
# state sampler + the comparison
# ---------------------------------------------------------------------------

def sample_state(th, cfg, seed, i_val=0.7, soc=0.47):
    L = cfg.layout
    rng = np.random.default_rng(seed)
    thj = {k: jnp.asarray(float(v), jnp.float64) for k, v in th.items()}
    y = np.asarray(initial_guess(soc, thj, cfg, jnp.float64)).copy()
    y *= 1.0 + 0.05 * rng.standard_normal(y.shape)
    y[L.sl("Phi_e")] = 0.02 * rng.standard_normal(y[L.sl("Phi_e")].shape)
    y[L.sl("j")] = 2e-6 * rng.standard_normal(y[L.sl("j")].shape)
    if "T" in L:
        y[L.sl("T")] = y[L.sl("T")] + 3.0 * rng.standard_normal(
            y[L.sl("T")].shape)
    if "j_s" in L:
        y[L.sl("j_s")] = -1e-7 * rng.random(y[L.sl("j_s")].shape)
    if "film" in L:
        y[L.sl("film")] = 1e-9 * rng.random(y[L.sl("film")].shape)
    if "Q" in L:
        y[L.sl("Q")] = 1e4 * rng.standard_normal(y[L.sl("Q")].shape)
    if "eps_s" in L:
        y[L.sl("eps_s")] = np.abs(y[L.sl("eps_s")])
    y[L.sl("I").start] = i_val
    return y


VARIANTS = {
    "lco_fd": lambda: LCO(),
    "lco_spectral": lambda: LCO(Fickian_method="spectral"),
    "lco_quadratic": lambda: LCO(solid_diffusion="quadratic"),
    "lco_polynomial": lambda: LCO(solid_diffusion="polynomial"),
    "lco_thermal": lambda: LCO(temperature=True),
    "lco_sei": lambda: LCO(aging="SEI"),
    "lco_thermal_sei": lambda: LCO(temperature=True, aging="SEI"),
    "lco_half_cell": lambda: LCO(anode="Li_metal"),
    "lco_half_cell_thermal": lambda: LCO(anode="Li_metal", temperature=True),
    "nmc": lambda: NMC(),
    "nmc_sei": lambda: NMC(aging="SEI"),
    "lgm50": lambda: NMC_LGM50(),
    "lgm50_quadratic": lambda: NMC_LGM50(solid_diffusion="quadratic"),
    "lgm50_stress": lambda: NMC_LGM50(aging="stress", temperature=False),
    "lgm50_stress_spectral": lambda: NMC_LGM50(
        aging="stress", temperature=False, Fickian_method="spectral"),
}


def _compare(th, cfg, seed, i_val):
    L = cfg.layout
    y = sample_state(th, cfg, seed, i_val=i_val)
    thj = {k: jnp.asarray(float(v), jnp.float64) for k, v in th.items()}

    for yp_seed in (None, seed + 1000):
        if yp_seed is None:
            yp = np.zeros_like(y)
        else:
            # yp scaled per family to the family's rhs magnitude, so the
            # -yp terms neither vanish nor drown the rhs being checked
            rng = np.random.default_rng(yp_seed)
            yp = np.zeros_like(y)
            r0, parts0 = oracle_residual(13.7, y, np.zeros_like(y), th, cfg)
            for name, _ in L._entries:
                s = L.sl(name)
                scale = np.max(np.abs(parts0[name])) + 1e-30
                yp[s] = scale * rng.standard_normal(s.stop - s.start)
        got = np.asarray(residual_core(
            13.7, jnp.asarray(y), jnp.asarray(yp), thj, cfg))
        want, parts = oracle_residual(13.7, y, yp, th, cfg)
        assert got.shape == want.shape
        for name, _ in L._entries:
            s = L.sl(name)
            scale = np.max(np.abs(want[s])) + 1e-300
            err = np.max(np.abs(got[s] - want[s])) / scale
            assert err < 1e-12, (name, err, "yp=0" if yp_seed is None
                                 else "yp!=0")


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_oracle_all_families(variant):
    theta, bounds, opts, N, numerics = VARIANTS[variant]()
    cfg = ModelConfig.build(N, numerics)
    for seed, i_val in ((1, 0.8), (2, -1.3)):
        _compare(theta, cfg, seed, i_val)


def test_oracle_mhc_kinetics():
    """MHC kinetics through the j rows (custom_functions.jl:233-298)."""
    pytest.importorskip("scipy")
    theta, bounds, opts, N, numerics = LCO()
    numerics = dataclasses.replace(numerics, rxn_p=kinetics.rxn_MHC,
                                   rxn_n=kinetics.rxn_MHC)
    theta = dict(theta, lambda_MHC_p=8.0, lambda_MHC_n=8.0)
    cfg = ModelConfig.build(N, numerics)
    _compare(theta, cfg, 3, 0.9)


def test_oracle_nonlinear_transport():
    """Exercise every nonlinear transport closure at once: empirical D_eff,
    nonlinear thermodynamic factor, Arrhenius rates, thermal."""
    theta, bounds, opts, N, numerics = LCO(temperature=True)
    numerics = dataclasses.replace(
        numerics, D_eff=transport.D_eff,
        thermodynamic_factor=transport.thermodynamic_factor)
    cfg = ModelConfig.build(N, numerics)
    _compare(theta, cfg, 4, -0.6)
