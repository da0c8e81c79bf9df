"""Structured Newton-matrix factorization exploiting the P2D block sparsity.

TPU-native replacement for KLU on this matrix family (SURVEY §2.2): the P2D
Newton matrix is "per-particle dense blocks + small coupled core":

    J = [ A  B ]   A: c_s_avg ↔ c_s_avg — block-diagonal, one (N_r × N_r)
        [ C  D ]      radial-diffusion block per particle (the particle
                      dimension is where 2/3 of the 301 unknowns live)
                   B: c_s rows ↔ (j, ...) — surface-flux BC coupling
                   C: kinetics rows ↔ c_s surface concentrations
                   D: the (c_e, T, j, Φ_e, Φ_s, I, ...) core

Block elimination (Schur complement on A):

    D' = D − C A⁻¹ B ;  solve D' x₂ = b₂ − C A⁻¹ b₁ ;  x₁ = A⁻¹ (b₁ − B x₂)

turns one 301×301 sequential LU into: batched tiny (N_r×N_r) LUs — which
vmap/batch perfectly on TPU — two tall matmuls (MXU work), and one dense LU
on the ~101-size core (26× fewer factorization flops). All shapes static
from the layout; valid for every physics variant because c_s self-coupling
is always particle-local (residuals.jl:128-180 Fickian; diagonal for the
quadratic/polynomial models).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..layout import StateLayout
from ..solver import linsolve


class ParticleSplit(NamedTuple):
    """Static index split of the state vector."""
    i_cs: np.ndarray        # indices of c_s_avg states
    i_core: np.ndarray      # all other indices (original order)
    n_part_p: int
    n_part_n: int
    r_p: int
    r_n: int


def make_split(layout: StateLayout) -> ParticleSplit:
    s = layout.sl("c_s_avg")
    i_cs = np.arange(s.start, s.stop)
    i_core = np.concatenate([np.arange(0, s.start),
                             np.arange(s.stop, layout.N_tot)])
    N = layout.N
    if layout.solid_diffusion == "Fickian":
        return ParticleSplit(i_cs, i_core, N.p, N.n, N.r_p, N.r_n)
    # quadratic/polynomial: each "particle block" is a 1x1 scalar
    return ParticleSplit(i_cs, i_core, N.p, N.n, 1, 1)


class SchurLU(NamedTuple):
    lu_p: tuple          # batched LU of cathode particle blocks
    lu_n: tuple
    B: jax.Array         # (n_cs, n_core)
    C: jax.Array         # (n_core, n_cs)
    core_lu: tuple       # equilibrated LU of the Schur complement
    split: ParticleSplit


def _blk(x, n, r):
    return x.reshape(n, r, r)


def _solve_blocks(lu_p, lu_n, split: ParticleSplit, b):
    """A⁻¹ b for b of shape (n_cs,) or (n_cs, m)."""
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    m = b.shape[1]
    bp = b[: np_ * rp].reshape(np_, rp, m)
    bn = b[np_ * rp:].reshape(nn_, rn, m)
    xp = jax.vmap(jax.scipy.linalg.lu_solve, in_axes=(0, 0))(lu_p, bp)
    xn = jax.vmap(jax.scipy.linalg.lu_solve, in_axes=(0, 0))(lu_n, bn)
    x = jnp.concatenate([xp.reshape(np_ * rp, m), xn.reshape(nn_ * rn, m)])
    return x[:, 0] if squeeze else x


def schur_factor_from_dense(J, split: ParticleSplit) -> SchurLU:
    """Factor a dense Newton matrix via the particle Schur complement."""
    i1, i2 = split.i_cs, split.i_core
    A = J[jnp.ix_(i1, i1)]
    B = J[jnp.ix_(i1, i2)]
    C = J[jnp.ix_(i2, i1)]
    D = J[jnp.ix_(i2, i2)]

    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    # extract the diagonal particle blocks of A
    off_p = np.arange(np_) * rp
    off_n = np_ * rp + np.arange(nn_) * rn
    Ap = jnp.stack([jax.lax.dynamic_slice(A, (o, o), (rp, rp))
                    for o in off_p]) if False else _gather_blocks(A, off_p, rp)
    An = _gather_blocks(A, off_n, rn)
    lu_p = jax.vmap(jax.scipy.linalg.lu_factor)(Ap)
    lu_n = jax.vmap(jax.scipy.linalg.lu_factor)(An)

    AinvB = _solve_blocks(lu_p, lu_n, split, B)
    Dp = D - jnp.matmul(C, AinvB, precision="highest")
    core_lu = linsolve.equilibrated_factor(Dp)
    return SchurLU(lu_p=lu_p, lu_n=lu_n, B=B, C=C, core_lu=core_lu,
                   split=split)


def _gather_blocks(A, offsets, r):
    """Static gather of r×r diagonal blocks at given offsets."""
    idx = np.asarray(offsets)[:, None] + np.arange(r)[None, :]
    return A[idx[:, :, None], idx[:, None, :]]


def schur_solve(fac: SchurLU, b):
    split = fac.split
    i1, i2 = split.i_cs, split.i_core
    b1 = b[..., i1]
    b2 = b[..., i2]
    z1 = _solve_blocks(fac.lu_p, fac.lu_n, split, b1)
    rhs2 = b2 - fac.C @ z1
    x2 = linsolve.equilibrated_solve(fac.core_lu, rhs2)
    x1 = z1 - _solve_blocks(fac.lu_p, fac.lu_n, split, fac.B @ x2)
    x = jnp.zeros_like(b)
    x = x.at[..., i1].set(x1)
    x = x.at[..., i2].set(x2)
    return x


def make_schur_solver(layout: StateLayout):
    """(factor, solve) pair plugging into run_once(linear_solver=...)."""
    split = make_split(layout)

    def factor(J):
        return schur_factor_from_dense(J, split)

    return factor, schur_solve
