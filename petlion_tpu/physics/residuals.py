"""The P2D (DFN) residual as one pure JAX function.

TPU-native re-derivation of the reference physics
(src/physics_equations/residuals.jl, auxiliary_states_and_coefficients.jl,
numerical_tools.jl). Instead of symbolically tracing an in-place dict-of-views
program (reference scalar_residual.jl:28-66), the residual here is a pure
function

    residual_core(t, y, yp, th, cfg) -> r        (N_tot,)

of a flat state vector, suitable for `jax.jacfwd`, `vmap`, and `jit`. All
matrix FVM assembly in the reference is replaced by flux-difference stencils
(mathematically identical, verified row-by-row against residuals.jl) so that
XLA sees fused elementwise ops instead of dense matmuls with tiny matrices.
The only real matmuls are the per-particle radial FD derivative operators,
which are batched over electrode volumes — an MXU-friendly shape.

The last DAE row (the control/scalar residual, reference scalar_residual.jl)
is NOT set here; `solver.control` fills it. `residual_core` leaves it 0.
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# A/B toggle for the radial-stencil mean-shift (benchmark regression
# analysis; on by default — the shift is mathematically exact and required
# for f32 accuracy, see _fickian_rhs)
_MEAN_SHIFT = os.environ.get("PETLION_MEANSHIFT", "1") != "0"


def _shift_particle_mean(C):
    """Subtract the per-particle mean concentration before the radial
    derivative matmuls (exact: both operators annihilate constants).
    optimization_barrier: the plainly-fused subtract trips an XLA-TPU
    memory-assignment CHECK crash in the batched while_loop program (remote
    tpu_compile_helper SIGABRT); the barrier keeps the shifted operand out
    of the offending fusion."""
    if not _MEAN_SHIFT:
        return C
    return C - jax.lax.optimization_barrier(
        jnp.mean(C, axis=1, keepdims=True))

from ..constants import FARADAY as F, IDEAL_GAS as R
from ..config import Discretizations, Numerics
from ..layout import StateLayout


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static bundle: mesh + numerics + computed layout. Hashable for jit."""

    N: Discretizations
    numerics: Numerics
    layout: StateLayout

    @staticmethod
    def build(N: Discretizations, numerics: Numerics) -> "ModelConfig":
        return ModelConfig(N=N, numerics=numerics,
                           layout=StateLayout.build(N, numerics))

    @property
    def half_cell(self) -> bool:
        """Lithium-foil anode: no porous anode domain (the configuration the
        reference gestures at with `lithium_foil`/Li_metal — structures.jl:24,
        params.jl:854-922, checks.jl:391 — but never wires)."""
        return self.numerics.anode == "Li_metal"


# ---------------------------------------------------------------------------
# 1C current density (auxiliary...jl:631-647)
# ---------------------------------------------------------------------------

def active_material(th):
    """Active-material fractions (auxiliary...jl:537-545)."""
    eps_sp = 1.0 - (th["eps_fp"] + th["eps_p"])
    eps_sn = 1.0 - (th["eps_fn"] + th["eps_n"])
    return eps_sp, eps_sn


def calc_I1C(th):
    """1C current density [A/m²] from the limiting electrode
    (auxiliary...jl:631-647)."""
    eps_sp, eps_sn = active_material(th)
    return (F / 3600.0) * jnp.minimum(
        eps_sp * th["l_p"] * th["c_max_p"] * (th["theta_min_p"] - th["theta_max_p"]),
        eps_sn * th["l_n"] * th["c_max_n"] * (th["theta_max_n"] - th["theta_min_n"]),
    )


# ---------------------------------------------------------------------------
# grid helpers (numerical_tools.jl:106-217)
# ---------------------------------------------------------------------------

def harmonic_mean(beta, x1, x2):
    """β-weighted harmonic mean (numerical_tools.jl:156)."""
    return x1 * x2 / (beta * x2 + (1.0 - beta) * x1)


def cell_widths_psn(N: Discretizations, th, half_cell: bool = False):
    """Per-CV widths h over the concatenated (p,s,n) grid [m].
    Half-cell: the anode is a foil boundary, not a domain — (p,s) only."""
    parts = [
        jnp.full((N.p,), th["l_p"] / N.p),
        jnp.full((N.s,), th["l_s"] / N.s),
    ]
    if not half_cell:
        parts.append(jnp.full((N.n,), th["l_n"] / N.n))
    return jnp.concatenate(parts)


def cell_widths_thermal(N: Discretizations, th, half_cell: bool = False):
    """Per-CV widths over the thermal grid [m]: (a,p,s,n,z) for a full
    cell; (a,p,s,z) for the half-cell, where the lithium foil is a
    boundary heat source at the s|z interface (its 25 µm of metal adds
    negligible conduction resistance — λ_Li ≈ 85 W/mK)."""
    parts = [jnp.full((N.a,), th["l_a"] / N.a),
             jnp.full((N.p,), th["l_p"] / N.p),
             jnp.full((N.s,), th["l_s"] / N.s)]
    if not half_cell:
        parts.append(jnp.full((N.n,), th["l_n"] / N.n))
    parts.append(jnp.full((N.z,), th["l_z"] / N.z))
    return jnp.concatenate(parts)


def edge_interp(x, h):
    """Harmonic-mean interpolation of cell values to internal edges.

    Reproduces interpolate_electrolyte_grid / _concentration
    (numerical_tools.jl:106-189): β=1/2 inside a section and half-width
    weighted at interfaces — both equal β = h_l/(h_l+h_r) on this mesh.
    """
    beta = h[:-1] / (h[:-1] + h[1:])
    return harmonic_mean(beta, x[..., :-1], x[..., 1:])


def edge_grad(x, h):
    """Finite-difference gradient at internal edges with center distances
    d = (h_l+h_r)/2 (numerical_tools.jl:193-215)."""
    d = 0.5 * (h[:-1] + h[1:])
    return (x[..., 1:] - x[..., :-1]) / d


def flux_divergence(flux, h):
    """(flux_R - flux_L)/h per cell, zero flux at the outer boundaries.

    `flux` has one entry per internal edge (n-1,), returns (n,).
    """
    z = jnp.zeros(flux.shape[:-1] + (1,), flux.dtype)
    padded = jnp.concatenate([z, flux, z], axis=-1)
    return (padded[..., 1:] - padded[..., :-1]) / h


# ---------------------------------------------------------------------------
# radial FD operators for Fickian solid diffusion (numerical_tools.jl:8-87)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def fd_first_order(n: int):
    """8th-order first-derivative matrix on n uniform nodes over [0,1].

    Returns (M, coeff, dx) with d/dr ≈ coeff · (M @ c); see
    numerical_tools.jl:8-42.
    """
    assert n >= 9, "Fickian radial FD requires N_r >= 9"
    dx = 1.0 / (n - 1)
    coeff = 1.0 / (40320.0 * dx)
    first = np.array([
        [-109584.0, 322560, -564480, 752640, -705600, 451584, -188160, 46080, -5040],
        [-5040.0, -64224, 141120, -141120, 117600, -70560, 28224, -6720, 720],
        [720.0, -11520, -38304, 80640, -50400, 26880, -10080, 2304, -240],
        [-240.0, 2880, -20160, -18144, 50400, -20160, 6720, -1440, 144],
    ])
    mid = np.array([144.0, -1536, 8064, -32256, 0, 32256, -8064, 1536, -144])
    last = np.array([
        [-144.0, 1440, -6720, 20160, -50400, 18144, 20160, -2880, 240],
        [240.0, -2304, 10080, -26880, 50400, -80640, 38304, 11520, -720],
        [-720.0, 6720, -28224, 70560, -117600, 141120, -141120, 64224, 5040],
        [5040.0, -46080, 188160, -451584, 705600, -752640, 564480, -322560, 109584],
    ])
    M = np.zeros((n, n))
    M[:4, :9] = first
    for r, i in enumerate(range(4, n - 4)):
        M[i, r + 1 - 1:r + 9] = mid  # rows 5..n-4 (1-based), window starts at row idx
    M[-4:, -9:] = last
    return M, coeff, dx


@lru_cache(maxsize=None)
def cheb_matrix(n_r: int):
    """Chebyshev differentiation matrix + nodes for the spectral radial
    scheme (reference residuals.jl:193-203, Trefethen's `cheb`)."""
    N = n_r - 1
    x = np.cos(np.linspace(0.0, np.pi, N + 1))
    c = np.hstack([2.0, np.ones(N - 1), 2.0]) * (-1.0) ** np.arange(N + 1)
    X = np.tile(x[:, None], (1, N + 1))
    dX = X - X.T
    D = np.outer(c, 1.0 / c) / (dX + np.eye(N + 1))
    D -= np.diag(D.sum(axis=1))
    return D, x


def _spectral_rhs(c_s, j, Rp, D_s, n_el: int, n_r: int):
    """Chebyshev-spectral radial diffusion RHS (residuals.jl:181-235).

    Storage matches the FDM layout (node n_r−1 = particle surface); the
    Chebyshev grid runs surface→center, hence the reversals.
    """
    Dm, x = cheb_matrix(n_r)
    Dm = jnp.asarray(Dm, c_s.dtype)
    xj = jnp.asarray(x, c_s.dtype)

    C = c_s.reshape(n_el, n_r)
    # ∂ᵣc on the cheb grid of reversed concentrations. Mean-shift as in
    # `_fickian_rhs`: `cheb_matrix` builds D with exactly-zero row sums
    # (D -= diag(D.sum())), so subtracting a per-particle reference is
    # exact and removes the ~5e4-scale cancellation noise in f32
    Cv = _shift_particle_mean(C)
    dcr = jnp.matmul(Cv[:, ::-1], Dm.T, precision="highest")
    dcr = dcr.at[:, 0].set(-j * Rp * 0.5 / D_s)   # surface BC (cheb scheme)
    dcr = dcr.at[:, -1].set(0.0)                  # center: no flux
    inner = jnp.matmul(4.0 * D_s[:, None] * ((xj + 1.0) ** 2)[None, :] * dcr
                       / Rp**2, Dm.T, precision="highest")
    rhs_num = inner[:, ::-1]
    rhs_limit = (4.0 * D_s[:, None] / Rp**2) * 3.0 * jnp.matmul(
        dcr, Dm.T, precision="highest")
    denom = (xj[:-1][::-1] + 1.0) ** 2
    rhs = jnp.concatenate([
        rhs_limit[:, -1:],                     # L'Hôpital at the center
        rhs_num[:, 1:] / denom[None, :],
    ], axis=1)
    return rhs.reshape(-1)


@lru_cache(maxsize=None)
def fd_second_order(n: int):
    """4th-order second-derivative matrix (numerical_tools.jl:44-76)."""
    assert n >= 6
    dx = 1.0 / (n - 1)
    coeff = 1.0 / (12.0 * dx * dx)
    first = np.array([
        [-415.0 / 6, 96, -36, 32.0 / 3, -3.0 / 2, 0],
        [10.0, -15, -4, 14, -6, 1],
    ])
    mid = np.array([-1.0, 16, -30, 16, -1])
    last = np.array([
        [1.0, -6, 14, -4, -15, 10],
        [0.0, -3.0 / 2, 32.0 / 3, -36, 96, -415.0 / 6],
    ])
    M = np.zeros((n, n))
    M[:2, :6] = first
    for r, i in enumerate(range(2, n - 2)):
        M[i, r:r + 5] = mid
    M[-2:, -6:] = last
    return M, coeff, dx


# ---------------------------------------------------------------------------
# auxiliary states (auxiliary_states_and_coefficients.jl:6-52)
# ---------------------------------------------------------------------------

def build_auxiliary(t, y, th, cfg: ModelConfig):
    """Derived fields needed by the residual kernels."""
    N, num, L = cfg.N, cfg.numerics, cfg.layout

    c_e = L.get(y, "c_e")
    c_e_p, c_e_s, c_e_n = (L.get(y, "c_e", s) for s in ("p", "s", "n"))
    j = L.get(y, "j")
    Phi_e = L.get(y, "Phi_e")
    Phi_s = L.get(y, "Phi_s")

    # temperature field over (a,p,s,n,z). The STATE carries the offset
    # T̃ = T − T_amb (not absolute kelvin): in f32, ulp(313 K) ≈ 3e-5 K would
    # swamp the mK-scale intra-cell gradients the thermal stencils and the
    # dT-hold re-initialization depend on; offsets (≲ tens of K) keep ~4
    # extra digits. Absolute T is reconstructed here for every physical
    # consumer (Arrhenius factors, kinetics, heat sources); _res_T works on
    # the offset directly. yp is a rate, identical in both representations.
    n_eff = 0 if cfg.half_cell else N.n   # anode CVs (0: foil boundary)
    if num.temperature:
        T_off = L.get(y, "T")
        T_full = T_off + th["T_amb"]
    else:
        n_all = N.a + N.p + N.s + n_eff + N.z
        T_off = jnp.zeros((n_all,), y.dtype)
        T_full = jnp.full((n_all,), th["T0"], dtype=y.dtype)
    T_p = T_full[N.a:N.a + N.p]
    T_s = T_full[N.a + N.p:N.a + N.p + N.s]
    T_n = T_full[N.a + N.p + N.s:N.a + N.p + N.s + n_eff]

    # j_total = j + j_s on the anode (auxiliary:160-178)
    if num.aging == "SEI":
        j_s = L.get(y, "j_s")
        j_total = j.at[N.p:].add(j_s)
    else:
        j_s = jnp.zeros((n_eff,), y.dtype)
        j_total = j

    I1C = calc_I1C(th)
    I_density = L.I(y) * I1C  # [A/m²] (auxiliary:54-70)

    eps_sp, eps_sn = active_material(th)
    if num.aging == "stress":
        # active-material fractions are per-CV states under stress-LAM;
        # clamp ≥0 so a single-step overshoot past the ε_s>0 rate gate
        # cannot produce a negative interfacial area
        eps_sp = jnp.maximum(L.get(y, "eps_s", "p"), 0.0)
        eps_sn = jnp.maximum(L.get(y, "eps_s", "n"), 0.0)
    a_p = 3.0 * eps_sp / th["Rp_p"]
    a_n = 3.0 * eps_sn / th["Rp_n"]

    porosity = jnp.concatenate([
        jnp.broadcast_to(1.0 - (th["eps_fp"] + eps_sp), (N.p,)).astype(y.dtype),
        jnp.full((N.s,), th["eps_s"], dtype=y.dtype) * jnp.ones((N.s,), y.dtype),
        jnp.broadcast_to(1.0 - (th["eps_fn"] + eps_sn), (n_eff,)).astype(y.dtype),
    ])

    sigma_eff_p = th["sigma_p"] * eps_sp
    sigma_eff_n = th["sigma_n"] * eps_sn

    # surface concentration c_s_star (auxiliary:193-249)
    if num.solid_diffusion == "Fickian":
        c_s_star_p = L.c_s_surf(y, "p")
        c_s_star_n = L.c_s_surf(y, "n")
        D_s_p, D_s_n = num.D_s_eff(c_s_star_p, c_s_star_n, T_p, T_n, th)
    else:
        c_s_avg_p = L.get(y, "c_s_avg", "p")
        c_s_avg_n = L.get(y, "c_s_avg", "n")
        # D_s_eff is evaluated at the surface concentration in the reference
        # (auxiliary:330-342 passes states[:c_s_star]); but c_s_star itself
        # needs D_s_eff. The reference resolves this because for the
        # quadratic/polynomial models build_c_s_star! runs before
        # build_D_s_eff! using D_s_eff evaluated inside... it actually calls
        # build_c_s_star! (line 34) before build_D_s_eff! (line 49), and
        # build_c_s_star! reads states[:D_s_eff]. Order in
        # build_auxiliary_states! computes D_s_eff last, so c_s_star must use
        # a D_s_eff computed from c_s_avg here. We mirror LIONSIMBA: evaluate
        # D_s_eff at the volume-average concentration.
        D_s_p, D_s_n = num.D_s_eff(c_s_avg_p, c_s_avg_n, T_p, T_n, th)
        j_p, j_n = j[:N.p], j[N.p:]
        if num.solid_diffusion == "quadratic":
            c_s_star_p = c_s_avg_p - (th["Rp_p"] / (5.0 * D_s_p)) * j_p
            c_s_star_n = c_s_avg_n - (th["Rp_n"] / (5.0 * D_s_n)) * j_n
        else:  # polynomial
            Q_p = L.get(y, "Q", "p")
            Q_n = L.get(y, "Q", "n")
            c_s_star_p = c_s_avg_p + (th["Rp_p"] / (35.0 * D_s_p)) * (-j_p + 8.0 * D_s_p * Q_p)
            c_s_star_n = c_s_avg_n + (th["Rp_n"] / (35.0 * D_s_n)) * (-j_n + 8.0 * D_s_n * Q_n)
        # refresh D_s_eff at the surface concentration for downstream users
        D_s_p, D_s_n = num.D_s_eff(c_s_star_p, c_s_star_n, T_p, T_n, th)

    # OCV and entropy coefficient (auxiliary:251-270)
    U_p, dUdT_p = num.OCV_p(c_s_star_p / th["c_max_p"], T_p, th)
    U_n, dUdT_n = num.OCV_n(c_s_star_n / th["c_max_n"], T_n, th)

    # overpotential (auxiliary:272-300)
    eta_p = Phi_s[:N.p] - Phi_e[:N.p] - U_p
    eta_n = Phi_s[N.p:] - Phi_e[N.p + N.s:] - U_n
    if "R_film_n" in th:
        eta_n = eta_n - j[N.p:] * F * th["R_film_n"]
    if num.aging == "SEI":
        film = L.get(y, "film")
        R_film = th["R_SEI"] + film / th["k_n_aging"]
        eta_n = eta_n - F * j[N.p:] * R_film

    K_eff = jnp.concatenate(num.K_eff(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th))
    D_eff = jnp.concatenate(num.D_eff(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th))
    nu = num.thermodynamic_factor(c_e_p, c_e_s, c_e_n, T_p, T_s, T_n, th)

    # surface hydrostatic particle stress (stress-LAM aging). Christensen-
    # Newman simplified shell stress at the particle surface:
    #   σ_h = (2 Ω E)/(9(1−ν)) · (c̄ − c_surf)
    # (tensile σ_h > 0 when the surface is depleted relative to the bulk).
    sigma_h_p = sigma_h_n = None
    if num.aging == "stress":
        if num.solid_diffusion == "Fickian":
            _weights = (_spectral_volume_weights
                        if num.Fickian_method == "spectral"
                        else _radial_volume_weights)
            w = _weights(N.r_p, y.dtype)
            cbar_p = jnp.matmul(
                L.get(y, "c_s_avg", "p").reshape(-1, N.r_p), w,
                precision="highest")
            w_n = _weights(N.r_n, y.dtype)
            cbar_n = jnp.matmul(
                L.get(y, "c_s_avg", "n").reshape(-1, N.r_n), w_n,
                precision="highest")
        else:
            cbar_p = L.get(y, "c_s_avg", "p")
            cbar_n = L.get(y, "c_s_avg", "n")
        sigma_h_p = (2.0 * th["Omega_p"] * th["E_p"]
                     / (9.0 * (1.0 - th["nu_p"]))) * (cbar_p - c_s_star_p)
        sigma_h_n = (2.0 * th["Omega_n"] * th["E_n"]
                     / (9.0 * (1.0 - th["nu_n"]))) * (cbar_n - c_s_star_n)

    return dict(
        sigma_h_p=sigma_h_p, sigma_h_n=sigma_h_n,
        c_e=c_e, j=j, j_s=j_s, j_total=j_total, Phi_e=Phi_e, Phi_s=Phi_s,
        T_full=T_full, T_off=T_off, T_p=T_p, T_s=T_s, T_n=T_n,
        I1C=I1C, I_density=I_density,
        a_p=a_p, a_n=a_n, porosity=porosity,
        sigma_eff_p=sigma_eff_p, sigma_eff_n=sigma_eff_n,
        c_s_star_p=c_s_star_p, c_s_star_n=c_s_star_n,
        D_s_p=D_s_p, D_s_n=D_s_n,
        U_p=U_p, U_n=U_n, dUdT_p=dUdT_p, dUdT_n=dUdT_n,
        eta_p=eta_p, eta_n=eta_n,
        K_eff=K_eff, D_eff=D_eff, nu=nu,
    )


# ---------------------------------------------------------------------------
# residual kernels
# ---------------------------------------------------------------------------

def _res_c_e(aux, yp, th, cfg: ModelConfig):
    """Electrolyte diffusion (residuals.jl:6-106).

    Half-cell: the porous-anode source becomes a boundary molar flux at the
    foil face of the last separator CV — the foil strips/plates Li at
    j_foil = −I_density/F (Faraday's law; sign: discharge I<0 strips Li into
    the electrolyte), of which the (1−t₊) fraction is the net source, exactly
    the same treatment a porous anode source receives per unit length.
    """
    N, L = cfg.N, cfg.layout
    h = cell_widths_psn(N, th, cfg.half_cell)
    c_e = aux["c_e"]
    D_edge = edge_interp(aux["D_eff"], h)
    flux = D_edge * edge_grad(c_e, h)
    rhs = flux_divergence(flux, h)

    nu_p, nu_s, nu_n = aux["nu"]
    src = jnp.concatenate([
        (1.0 - th["t_plus"]) * nu_p * aux["a_p"] * aux["j_total"][:N.p],
        jnp.zeros((N.s,), c_e.dtype),
        (1.0 - th["t_plus"]) * nu_n * aux["a_n"] * aux["j_total"][N.p:],
    ])
    if cfg.half_cell:
        j_foil = -aux["I_density"] / F
        src = src.at[-1].add((1.0 - th["t_plus"]) * nu_s[-1] * j_foil / h[-1])
    rhs = (rhs + src) / aux["porosity"]
    return rhs - yp[L.sl("c_e")]


def _fickian_rhs(c_s, j, Rp, D_s, n_el: int, n_r: int):
    """Radial Fickian diffusion RHS for one electrode — batched over volumes
    (residuals.jl:128-180). c_s: (n_el*n_r,), j/D_s: (n_el,)."""
    M1, coef1, dr = fd_first_order(n_r)
    M2, coef2, _ = fd_second_order(n_r)
    M1 = jnp.asarray(M1, c_s.dtype)
    M2 = jnp.asarray(M2, c_s.dtype)

    C = c_s.reshape(n_el, n_r)
    # precision=highest: TPU f32 matmuls default to bf16 multiplies, which
    # is catastrophic for FD stencils on ~5e4-magnitude concentrations.
    # Mean-shift: the stencil rows are integer-valued (exact in f32) and sum
    # to zero, so subtracting a per-particle reference concentration changes
    # NOTHING in exact arithmetic but shrinks the matmul intermediates from
    # the ~5e4 absolute-concentration scale to the intra-particle variation
    # scale — ~100x less cancellation noise in the f32 radial rhs (the noise
    # was amplified by 1/c0 through the near-singular Neumann operator at
    # large step sizes, inflating the f32 LTE estimate and rejections).
    Cv = _shift_particle_mean(C)
    d1 = jnp.matmul(Cv, M1.T, precision="highest") * coef1
    # BCs on the first derivative (residuals.jl:150-156)
    d1 = d1.at[:, -1].set(-j / D_s * Rp)
    d1 = d1.at[:, 0].set(0.0)
    d2 = jnp.matmul(Cv, M2.T, precision="highest") * coef2
    # Neumann correction at r=1 (residuals.jl:162)
    d2 = d2.at[:, -1].add(50.0 * dr * d1[:, -1] * coef2)

    r_nodes = jnp.asarray(np.linspace(1.0 / (n_r - 1), 1.0, n_r - 1), c_s.dtype)
    inner = jnp.concatenate([
        3.0 * d2[:, :1],
        d2[:, 1:] + (2.0 / r_nodes) * d1[:, 1:],
    ], axis=1)
    rhs = (D_s / Rp**2)[:, None] * inner
    return rhs.reshape(-1)


def _res_c_s_avg(aux, y, yp, th, cfg: ModelConfig):
    """Solid diffusion (residuals.jl:108-235)."""
    N, num, L = cfg.N, cfg.numerics, cfg.layout
    j = aux["j"]
    n_eff = 0 if cfg.half_cell else N.n
    if num.solid_diffusion == "Fickian":
        radial = (_fickian_rhs if num.Fickian_method == "finite_difference"
                  else _spectral_rhs)
        rhs_p = radial(L.get(y, "c_s_avg", "p"), j[:N.p], th["Rp_p"],
                       aux["D_s_p"], N.p, N.r_p)
        rhs_n = radial(L.get(y, "c_s_avg", "n"), j[N.p:], th["Rp_n"],
                       aux["D_s_n"], n_eff, N.r_n)
        rhs = jnp.concatenate([rhs_p, rhs_n])
    else:
        # quadratic / polynomial: dc_s/dt = -3 j / Rp (residuals.jl:108-127)
        rhs = jnp.concatenate([
            -3.0 * j[:N.p] / th["Rp_p"],
            -3.0 * j[N.p:] / th["Rp_n"],
        ])
    return rhs - yp[L.sl("c_s_avg")]


@lru_cache(maxsize=None)
def _radial_volume_weights_np(n_r: int):
    """Trapezoid weights for the particle volume average c̄ = 3∫₀¹ c r² dr
    on the uniform radial grid, normalized so a constant c gives c̄ = c."""
    r = np.linspace(0.0, 1.0, n_r)
    w = 3.0 * r * r
    w[0] *= 0.5
    w[-1] *= 0.5
    w /= w.sum()
    return w


def _radial_volume_weights(n_r: int, dtype):
    return jnp.asarray(_radial_volume_weights_np(n_r), dtype)


@lru_cache(maxsize=None)
def _spectral_volume_weights_np(n_r: int):
    """Clenshaw–Curtis weights for the particle volume average on the
    Chebyshev radial grid of `_spectral_rhs`.

    With nodes x_k = cos(kπ/N) and radius ρ = (x+1)/2 (x=+1 is the particle
    surface), c̄ = 3∫₀¹ c ρ² dρ = (3/8)∫₋₁¹ c(x)(x+1)² dx, evaluated by
    Clenshaw–Curtis quadrature (exact for the polynomial weight), then
    reversed into storage order (index n_r−1 = surface, matching
    `_spectral_rhs`) and normalized so a constant c gives c̄ = c.
    """
    N = n_r - 1
    x = np.cos(np.linspace(0.0, np.pi, N + 1))
    w_cc = np.zeros(N + 1)
    for k in range(N + 1):
        s = 0.0
        for j in range(1, N // 2 + 1):
            b = 1.0 if 2 * j == N else 2.0
            s += b / (4.0 * j * j - 1.0) * np.cos(2.0 * j * k * np.pi / N)
        c = 1.0 if k in (0, N) else 2.0
        w_cc[k] = (c / N) * (1.0 - s)
    w = (3.0 / 8.0) * w_cc * (x + 1.0) ** 2
    w = w[::-1].copy()          # cheb order (surface first) → storage order
    w /= w.sum()
    return w


def _spectral_volume_weights(n_r: int, dtype):
    return jnp.asarray(_spectral_volume_weights_np(n_r), dtype)


def _res_eps_s(aux, y, yp, th, cfg: ModelConfig):
    """Stress-driven loss of active material (LAM):

        dε_s/dt = −β_LAM · (⟨σ_h⟩₊ / σ_critical)^m_LAM · 1[ε_s > 0]

    per electrode CV, with σ_h the surface hydrostatic stress from
    `build_auxiliary`. This is the standard stress-LAM degradation model
    (Reniers-Mulder-Howey 2019 / O'Kane et al. 2022); the reference names
    the mode and ships its θ (params.jl:701 `aging = :stress, # unused`,
    m_LAM/β_LAM at params.jl:785-786) but implements no physics for it.
    The ε_s > 0 gate (same pattern as the j_s charge gate) keeps the
    fraction physical — LAM cannot destroy more than all the material.
    """
    L = cfg.layout
    rate_p = -th["beta_LAM"] * (jnp.maximum(aux["sigma_h_p"], 0.0)
                                / th["sigma_critical_p"]) ** th["m_LAM"]
    rate_n = -th["beta_LAM"] * (jnp.maximum(aux["sigma_h_n"], 0.0)
                                / th["sigma_critical_n"]) ** th["m_LAM"]
    rhs = jnp.concatenate([rate_p, rate_n])
    rhs = jnp.where(y[L.sl("eps_s")] > 0.0, rhs, 0.0)
    return rhs - yp[L.sl("eps_s")]


def _res_Q(aux, y, yp, th, cfg: ModelConfig):
    """Polynomial-model flux state (reference residuals.jl:237-258).

    Deliberate deviation: Subramanian et al.'s 3-parameter model (and
    LIONSIMBA, which the reference adapted) has dQ/dt = (-30·D_s·Q -
    45/2·j)/Rp²; the reference drops the factor 30 on the relaxation term,
    which breaks the steady-state surface-concentration limit (it no longer
    reduces to the quadratic model). We keep the correct coefficient —
    verified by polynomial ≈ quadratic ≈ Fickian agreement at low C-rate.
    """
    N, L = cfg.N, cfg.layout
    Q_p, Q_n = L.get(y, "Q", "p"), L.get(y, "Q", "n")
    j = aux["j"]
    rhs = jnp.concatenate([
        (-30.0 * aux["D_s_p"] * Q_p - 22.5 * j[:N.p]) / th["Rp_p"]**2,
        (-30.0 * aux["D_s_n"] * Q_n - 22.5 * j[N.p:]) / th["Rp_n"]**2,
    ])
    return rhs - yp[L.sl("Q")]


def _res_film(aux, yp, th, cfg: ModelConfig):
    """SEI film growth (residuals.jl:260-276)."""
    L = cfg.layout
    rhs = -aux["j_s"] * th["M_n"] / th["rho_n"]
    return rhs - yp[L.sl("film")]


def _extrap_x0(x, ys):
    """Quadratic extrapolation to x=0 (external.jl:496-498)."""
    x1, x2, x3 = x[0], x[1], x[2]
    y1, y2, y3 = ys[..., 0], ys[..., 1], ys[..., 2]
    t1 = (y3 - y1 - ((x3 - x1) / (x2 - x1)) * (y2 - y1))
    den = (x3**2 - x1**2 - ((x2**2 - x1**2) / (x2 - x1)) * (x3 - x1))
    a = t1 / den
    b = (y2 - y1 - a * (x2**2 - x1**2)) / (x2 - x1)
    return y1 - a * x1**2 - b * x1


def _res_SOH(aux, yp, th, cfg: ModelConfig):
    """State-of-health capacity-loss integral (residuals.jl:278-297)."""
    N, L = cfg.N, cfg.layout
    j_s = aux["j_s"]
    # extrapolate_section over the anode (external.jl:499-523)
    n = N.n
    centers = np.linspace(1.0 / (2 * n), 1.0 - 1.0 / (2 * n), n)
    x_range = jnp.asarray(np.concatenate([[0.0], centers, [1.0]]),
                          j_s.dtype) * th["l_n"]
    x_interp = np.array([centers[0], centers[1], centers[2]])
    y_left = _extrap_x0(x_interp, j_s[:3])
    y_right = _extrap_x0(x_interp, j_s[::-1][:3])
    y_range = jnp.concatenate([y_left[None], j_s, y_right[None]])
    trapz = jnp.sum(0.5 * (x_range[1:] - x_range[:-1])
                    * (y_range[1:] + y_range[:-1]))
    j_s_int = -trapz * F * aux["a_n"] / (3600.0 * aux["I1C"])
    rhs = -j_s_int
    return rhs - yp[L.sl("SOH")]


def _res_j(aux, th, cfg: ModelConfig):
    """Butler-Volmer / MHC intercalation flux (residuals.jl:491-517)."""
    N, num = cfg.N, cfg.numerics
    # reaction-rate coefficients k_eff (auxiliary:571-579) — note: the
    # reference passes c_s_avg, not c_s_star; default rate laws only use T.
    k_p, k_n = num.rxn_rate(aux["T_p"], aux["T_n"],
                            aux["c_s_star_p"], aux["c_s_star_n"], th)
    lam_p = th.get("lambda_MHC_p", 0.0)
    lam_n = th.get("lambda_MHC_n", 0.0)
    j_p_calc = num.rxn_p(aux["c_s_star_p"], aux["c_e"][:N.p], aux["T_p"],
                         aux["eta_p"], k_p, lam_p, th["c_max_p"], th)
    j_n_calc = num.rxn_n(aux["c_s_star_n"], aux["c_e"][N.p + N.s:], aux["T_n"],
                         aux["eta_n"], k_n, lam_n, th["c_max_n"], th)
    return jnp.concatenate([j_p_calc, j_n_calc]) - aux["j"]


def _res_j_s(aux, y, th, cfg: ModelConfig):
    """SEI side-reaction flux, active on charge only (residuals.jl:519-552)."""
    N, L = cfg.N, cfg.layout
    film = L.get(y, "film")
    R_film = th["R_SEI"] + film / th["k_n_aging"]
    Phi_s_n = aux["Phi_s"][N.p:]
    Phi_e_n = aux["Phi_e"][N.p + N.s:]
    eta_s = Phi_s_n - Phi_e_n - th["Uref_s"] - F * aux["j_total"][N.p:] * R_film
    alpha = 0.5
    I_density = aux["I_density"]
    j_s_calc = -jnp.abs(
        (th["i_0_jside"] * (I_density / aux["I1C"]) ** th["w"] / F)
        * (-jnp.exp(-alpha * F / (R * aux["T_n"]) * eta_s))
    )
    j_s_calc = jnp.where(I_density > 0, j_s_calc, 0.0)
    return aux["j_s"] - j_s_calc


def _res_Phi_e(aux, th, cfg: ModelConfig):
    """Electrolyte potential (residuals.jl:554-654).

    Full cell: the last row grounds Φ_e(x=L)=0 (residuals.jl:586) — valid
    because the FVM rows are redundant by one (both boundary ionic currents
    are zero and total charge balance is enforced by the Φ_s/I rows).
    Half-cell: the same redundant row instead carries the lithium-foil
    charge balance, F·j_foil(η_foil) + I_density = 0, with the foil grounded
    (Φ_foil ≡ 0) so η_foil = −Φ_e at the foil face. This pins the Φ_e level
    through the foil kinetics (the physically meaningful ground) and closes
    the system without any porous-anode states.
    """
    N = cfg.N
    h = cell_widths_psn(N, th, cfg.half_cell)
    c_e = aux["c_e"]
    K_edge = edge_interp(aux["K_eff"], h)

    # conduction fluxes at internal edges
    fluxPhi = K_edge * edge_grad(aux["Phi_e"], h)

    # migration (concentration) term at internal edges:
    # prod = K̂ T̄ ∂ₓc̄ / c̄ (residuals.jl:631-635)
    n_eff = 0 if cfg.half_cell else N.n
    T_psn = aux["T_full"][N.a:N.a + N.p + N.s + n_eff]
    T_edge = edge_interp(T_psn, h)
    c_edge = edge_interp(c_e, h)
    dc_edge = edge_grad(c_e, h)
    prod = K_edge * T_edge * dc_edge / c_edge

    nu_cells = jnp.concatenate(aux["nu"])
    Kfac = 2.0 * R * (1.0 - th["t_plus"]) * nu_cells / F  # per cell

    # f_i = -Kfac_i (prod_R - prod_L) + h F a j (residuals.jl:637-645)
    z = jnp.zeros((1,), c_e.dtype)
    prod_pad = jnp.concatenate([z, prod, z])
    dprod = prod_pad[1:] - prod_pad[:-1]
    src = jnp.concatenate([
        h[:N.p] * F * aux["a_p"] * aux["j_total"][:N.p],
        jnp.zeros((N.s,), c_e.dtype),
        h[N.p + N.s:] * F * aux["a_n"] * aux["j_total"][N.p:],
    ])
    f = -Kfac * dprod + src

    # A·Φ = -(fluxR - fluxL); residual = A·Φ - f
    fp = jnp.concatenate([z, fluxPhi, z])
    APhi = -(fp[1:] - fp[:-1])
    res = APhi - f
    if cfg.half_cell:
        # foil BV row: reuse the configured reaction model (BV/MHC/...) at a
        # fixed mid-stoichiometry surface activity — foil kinetics are
        # quasi-reversible at these current densities, so only the order of
        # magnitude of the exchange term matters (sets a µV-mV overpotential)
        num = cfg.numerics
        c_e_foil = c_e[-1]
        T_foil = T_psn[-1]
        eta_foil = -aux["Phi_e"][-1]
        c_s_ref = 0.5 * th["c_max_n"]
        _, k_n = num.rxn_rate(aux["T_p"], T_foil, aux["c_s_star_p"], c_s_ref, th)
        j_foil = num.rxn_n(c_s_ref, c_e_foil, T_foil, eta_foil, k_n,
                           th.get("lambda_MHC_n", 0.0), th["c_max_n"], th)
        res = res.at[-1].set(F * j_foil + aux["I_density"])
    else:
        # BC row: Φ_e(x=L) = 0 (residuals.jl:586)
        res = res.at[-1].set(aux["Phi_e"][-1])
    return res


def _res_Phi_s(aux, th, cfg: ModelConfig):
    """Solid-phase potential (residuals.jl:656-703)."""
    N = cfg.N
    Phi_s = aux["Phi_s"]
    j_tot = aux["j_total"]
    h_p = th["l_p"] / N.p
    h_n = th["l_n"] / N.n
    I_density = aux["I_density"]

    def electrode(Phi, f):
        # tridiagonal [1, -2, 1] with one-sided ends (residuals.jl:685-699)
        lap = (jnp.concatenate([Phi[1:], Phi[-1:]])
               - 2.0 * Phi
               + jnp.concatenate([Phi[:1], Phi[:-1]]))
        # ends: row1 = -Φ1+Φ2 ; rowN = Φ_{N-1}-Φ_N — achieved by the
        # reflective padding above: row1 = Φ1 - 2Φ1 + Φ2 = -Φ1+Φ2 ✓
        return lap - f

    f_p = h_p**2 * aux["a_p"] * F * j_tot[:N.p]
    f_p = f_p.at[0].add(-I_density * h_p)
    f_p = f_p / aux["sigma_eff_p"]

    if cfg.half_cell:
        # the foil has no distributed solid potential (Φ_foil ≡ 0 ground)
        return electrode(Phi_s[:N.p], f_p)

    f_n = h_n**2 * aux["a_n"] * F * j_tot[N.p:]
    f_n = f_n.at[-1].add(+I_density * h_n)
    f_n = f_n / aux["sigma_eff_n"]

    return jnp.concatenate([
        electrode(Phi_s[:N.p], f_p),
        electrode(Phi_s[N.p:], f_n),
    ])


def _res_T(aux, y, yp, th, cfg: ModelConfig):
    """1D thermal model over (a,p,s,n,z) (residuals.jl:299-489).

    Conduction differences and the ambient-convection BCs act on the state's
    T-offset (T − T_amb) so f32 keeps the intra-cell gradients exactly; the
    heat-generation sources (where T appears multiplicatively) use absolute T
    via `aux`. Mathematically identical to the reference in exact arithmetic.

    Half-cell (anode="Li_metal"): the grid is (a,p,s,z) — the foil carries
    no distributed temperature state (it is thin metal) and enters as an
    interfacial heat source F·j_foil·η_foil = −I_density·η_foil [W/m²] at
    the s|z interface, injected into the first z CV (the reference never
    wires any half-cell thermal model; this is the natural completion).
    """
    N, L = cfg.N, cfg.layout
    hc = cfg.half_cell
    T = aux["T_off"]
    h = cell_widths_thermal(N, th, hc)
    lam_parts = [jnp.full((N.a,), th["lam_a"]), jnp.full((N.p,), th["lam_p"]),
                 jnp.full((N.s,), th["lam_s"])]
    rho_parts = [jnp.full((N.a,), th["rho_a"] * th["Cp_a"]),
                 jnp.full((N.p,), th["rho_p"] * th["Cp_p"]),
                 jnp.full((N.s,), th["rho_s"] * th["Cp_s"])]
    if not hc:
        lam_parts.append(jnp.full((N.n,), th["lam_n"]))
        rho_parts.append(jnp.full((N.n,), th["rho_n"] * th["Cp_n"]))
    lam_parts.append(jnp.full((N.z,), th["lam_z"]))
    rho_parts.append(jnp.full((N.z,), th["rho_z"] * th["Cp_z"]))
    lam_cells = jnp.concatenate(lam_parts).astype(y.dtype)
    rho_cp = jnp.concatenate(rho_parts).astype(y.dtype)

    lam_edge = edge_interp(lam_cells, h)
    flux = lam_edge * edge_grad(T, h)
    conduction = flux_divergence(flux, h)

    Q_rev, Q_rxn, Q_ohm = _heat_generation(aux, th, cfg)
    if hc:
        # foil interfacial heat into the first z CV: η_foil = −Φ_e(foil
        # face), j_foil = −I_density/F  =>  q = F·j_foil·η_foil ≥ 0
        eta_foil = -aux["Phi_e"][-1]
        i_z0 = N.a + N.p + N.s
        Q_rxn = Q_rxn.at[i_z0].add(-aux["I_density"] * eta_foil / h[i_z0])

    # Robin BCs: h_cell·(T_amb − T) = −h_cell·T_offset, exact in offset form
    bc = jnp.zeros_like(T)
    bc = bc.at[0].set(-th["h_cell"] * T[0] / h[0])
    bc = bc.at[-1].set(-th["h_cell"] * T[-1] / h[-1])

    rhs = (conduction + Q_rev + Q_rxn + Q_ohm + bc) / rho_cp
    return rhs - yp[L.sl("T")]


def _heat_generation(aux, th, cfg: ModelConfig):
    """Q_rev, Q_rxn, Q_ohm over the full thermal grid (auxiliary:344-518)."""
    N = cfg.N
    j_tot = aux["j_total"]
    T_p, T_s, T_n = aux["T_p"], aux["T_s"], aux["T_n"]
    c_e = aux["c_e"]
    Phi_s, Phi_e = aux["Phi_s"], aux["Phi_e"]
    K_eff = aux["K_eff"]

    h_p = th["l_p"] / N.p
    h_s = th["l_s"] / N.s
    h_n = th["l_n"] / N.n

    def fdl(x, hh):
        return (-3.0 * x[0] + 4.0 * x[1] - x[2]) / (2.0 * hh)

    def fdr(x, hh):
        return (3.0 * x[-1] - 4.0 * x[-2] + x[-3]) / (2.0 * hh)

    def central(x, hh):
        return (x[2:] - x[:-2]) / (2.0 * hh)

    def acd_right(x_l, h_l, x_r, h_r):
        return 2.0 * (x_r[0] - x_l[-2]) / (3.0 * h_l + h_r)

    def acd_left(x_l, h_l, x_r, h_r):
        return 2.0 * (x_r[1] - x_l[-1]) / (h_l + 3.0 * h_r)

    hc = cfg.half_cell

    def section_derivs(x_p, x_s, x_n):
        """[interface-aware d/dx] per section (auxiliary:431-484).
        Half-cell: no n section — the separator's right end is the foil
        face, a one-sided difference."""
        d_p = jnp.concatenate([
            fdl(x_p, h_p)[None], central(x_p, h_p),
            acd_right(x_p, h_p, x_s, h_s)[None]])
        if hc:
            d_s = jnp.concatenate([
                acd_left(x_p, h_p, x_s, h_s)[None], central(x_s, h_s),
                fdr(x_s, h_s)[None]])
            return d_p, d_s, x_n[:0]
        d_s = jnp.concatenate([
            acd_left(x_p, h_p, x_s, h_s)[None], central(x_s, h_s),
            acd_right(x_s, h_s, x_n, h_n)[None]])
        d_n = jnp.concatenate([
            acd_left(x_s, h_s, x_n, h_n)[None], central(x_n, h_n),
            fdr(x_n, h_n)[None]])
        return d_p, d_s, d_n

    Phi_s_p, Phi_s_n = Phi_s[:N.p], Phi_s[N.p:]
    dPhi_s_p = jnp.concatenate([
        fdl(Phi_s_p, h_p)[None], central(Phi_s_p, h_p), fdr(Phi_s_p, h_p)[None]])
    dPhi_s_n = (Phi_s_n if hc else jnp.concatenate([
        fdl(Phi_s_n, h_n)[None], central(Phi_s_n, h_n), fdr(Phi_s_n, h_n)[None]]))

    Phi_e_p = Phi_e[:N.p]
    Phi_e_s = Phi_e[N.p:N.p + N.s]
    Phi_e_n = Phi_e[N.p + N.s:]
    dPhi_e_p, dPhi_e_s, dPhi_e_n = section_derivs(Phi_e_p, Phi_e_s, Phi_e_n)

    c_e_p, c_e_s, c_e_n = c_e[:N.p], c_e[N.p:N.p + N.s], c_e[N.p + N.s:]
    dc_e_p, dc_e_s, dc_e_n = section_derivs(c_e_p, c_e_s, c_e_n)

    j_p, j_n = j_tot[:N.p], j_tot[N.p:]
    Q_rev_p = F * aux["a_p"] * j_p * T_p * aux["dUdT_p"]
    Q_rev_n = F * aux["a_n"] * j_n * T_n * aux["dUdT_n"]
    Q_rxn_p = F * aux["a_p"] * j_p * aux["eta_p"]
    Q_rxn_n = F * aux["a_n"] * j_n * aux["eta_n"]

    nu_p, nu_s, nu_n = aux["nu"]
    K_p, K_s, K_n = K_eff[:N.p], K_eff[N.p:N.p + N.s], K_eff[N.p + N.s:]
    tp = 1.0 - th["t_plus"]
    sig_p, sig_n = aux["sigma_eff_p"], aux["sigma_eff_n"]
    Q_ohm_p = (K_p * dPhi_e_p**2
               + 2.0 * R * K_p * T_p * tp * nu_p / F * (dc_e_p / c_e_p) * dPhi_e_p
               + sig_p * dPhi_s_p**2)
    Q_ohm_s = (K_s * dPhi_e_s**2
               + 2.0 * R * K_s * T_s * tp * nu_s / F * (dc_e_s / c_e_s) * dPhi_e_s)
    Q_ohm_n = (K_n * dPhi_e_n**2
               + 2.0 * R * K_n * T_n * tp * nu_n / F * (dc_e_n / c_e_n) * dPhi_e_n
               + sig_n * dPhi_s_n**2)

    I2 = aux["I_density"] ** 2
    za = jnp.zeros((N.a,), c_e.dtype)
    zs = jnp.zeros((N.s,), c_e.dtype)
    zz = jnp.zeros((N.z,), c_e.dtype)
    Q_rev = jnp.concatenate([za, Q_rev_p, zs, Q_rev_n, zz])
    Q_rxn = jnp.concatenate([za, Q_rxn_p, zs, Q_rxn_n, zz])
    Q_ohm = jnp.concatenate([
        jnp.full((N.a,), I2 / th["sigma_a"], dtype=c_e.dtype),
        Q_ohm_p, Q_ohm_s, Q_ohm_n,
        jnp.full((N.z,), I2 / th["sigma_z"], dtype=c_e.dtype),
    ])
    return Q_rev, Q_rxn, Q_ohm


# ---------------------------------------------------------------------------
# assembled residual
# ---------------------------------------------------------------------------

def residual_core(t, y, yp, th, cfg: ModelConfig):
    """Full DAE residual with the control (last) row left at 0.

    Layout order (matching StateLayout): differential states, then algebraic,
    ``I`` last — identical to the reference index layout so state vectors are
    drop-in comparable.
    """
    num, L = cfg.numerics, cfg.layout
    aux = build_auxiliary(t, y, th, cfg)

    parts = [
        _res_c_e(aux, yp, th, cfg),
        _res_c_s_avg(aux, y, yp, th, cfg),
    ]
    if num.temperature:
        parts.append(_res_T(aux, y, yp, th, cfg))
    if num.aging == "SEI":
        parts.append(_res_film(aux, yp, th, cfg))
        parts.append(_res_SOH(aux, yp, th, cfg))
    if num.aging == "stress":
        parts.append(_res_eps_s(aux, y, yp, th, cfg))
    if num.solid_diffusion == "polynomial":
        parts.append(_res_Q(aux, y, yp, th, cfg))

    parts.append(_res_j(aux, th, cfg))
    parts.append(_res_Phi_e(aux, th, cfg))
    parts.append(_res_Phi_s(aux, th, cfg))
    if num.aging == "SEI":
        parts.append(_res_j_s(aux, y, th, cfg))
    parts.append(jnp.zeros((1,), y.dtype))  # control row, filled by solver

    return jnp.concatenate(parts)
