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
    """Factorization pytree (traced arrays only; the static ParticleSplit
    stays in the solver closure so vmap never maps over it).

    Everything is stored as explicit inverses, so every subsequent solve is
    matmuls only — the MXU-friendly choice (no triangular-solve loops)."""
    inv_p: jax.Array     # (n_part_p, r_p, r_p) particle-block inverses
    inv_n: jax.Array     # (n_part_n, r_n, r_n)
    AinvB: jax.Array     # (n_cs, n_core) — A⁻¹B, used directly in back-subst
    C: jax.Array         # (n_core, n_cs)
    core_inv: tuple      # equilibrated inverse of the Schur complement


def _apply_blocks(inv_p, inv_n, split: ParticleSplit, b):
    """A⁻¹ b via block matmuls; b of shape (n_cs,) or (n_cs, m)."""
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    m = b.shape[1]
    bp = b[: np_ * rp].reshape(np_, rp, m)
    bn = b[np_ * rp:].reshape(nn_, rn, m)
    xp = jnp.matmul(inv_p, bp, precision="highest")
    xn = jnp.matmul(inv_n, bn, precision="highest")
    x = jnp.concatenate([xp.reshape(np_ * rp, m), xn.reshape(nn_ * rn, m)])
    return x[:, 0] if squeeze else x


def _gather_blocks(A, offsets, r):
    """Static gather of r×r diagonal blocks at given offsets."""
    idx = np.asarray(offsets)[:, None] + np.arange(r)[None, :]
    return A[idx[:, :, None], idx[:, None, :]]


def schur_factor_from_dense(J, split: ParticleSplit) -> SchurLU:
    """Factor a dense Newton matrix via the particle Schur complement."""
    i1, i2 = split.i_cs, split.i_core
    A = J[jnp.ix_(i1, i1)]
    B = J[jnp.ix_(i1, i2)]
    C = J[jnp.ix_(i2, i1)]
    D = J[jnp.ix_(i2, i2)]

    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    off_p = np.arange(np_) * rp
    off_n = np_ * rp + np.arange(nn_) * rn
    # particle blocks are well-scaled internally (c_s rows/cols only), so a
    # plain pivot-free GJ inverse is stable; they are diagonally dominant
    # (c0·I minus a scaled diffusion operator with negative spectrum)
    inv_p = linsolve.gj_inverse(_gather_blocks(A, off_p, rp))
    inv_n = linsolve.gj_inverse(_gather_blocks(A, off_n, rn))

    AinvB = _apply_blocks(inv_p, inv_n, split, B)
    Dp = D - jnp.matmul(C, AinvB, precision="highest")
    core_inv = linsolve.equilibrated_inv_factor(Dp)
    return SchurLU(inv_p=inv_p, inv_n=inv_n, AinvB=AinvB, C=C,
                   core_inv=core_inv)


def schur_solve(fac: SchurLU, b, split: ParticleSplit):
    i1, i2 = split.i_cs, split.i_core
    b1 = b[..., i1]
    b2 = b[..., i2]
    z1 = _apply_blocks(fac.inv_p, fac.inv_n, split, b1)
    rhs2 = b2 - fac.C @ z1
    x2 = linsolve.equilibrated_inv_solve(fac.core_inv, rhs2)
    x1 = z1 - jnp.matmul(fac.AinvB, x2[..., None], precision="highest")[..., 0]
    x = jnp.zeros_like(b)
    x = x.at[..., i1].set(x1)
    x = x.at[..., i2].set(x2)
    return x


def schur_factor_from_compressed(JS, last_row, colored, specs,
                                 split: ParticleSplit) -> SchurLU:
    """Factor directly from the colored-compressed Jacobian (JS, last_row)
    without materializing the dense (N,N) matrix — the memory lever that
    lets batches of 10⁴+ cells fit in HBM."""
    spec_Ap, spec_An, spec_B, spec_C, spec_D = specs
    sub = colored.submatrix
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)

    Ap_flat = extract_block(JS, last_row, spec_Ap)   # (np_*rp, rp) stacked
    An_flat = extract_block(JS, last_row, spec_An)
    inv_p = linsolve.gj_inverse(Ap_flat.reshape(np_, rp, rp))
    inv_n = linsolve.gj_inverse(An_flat.reshape(nn_, rn, rn))

    B = sub(JS, last_row, spec_B)
    C = sub(JS, last_row, spec_C)
    D = sub(JS, last_row, spec_D)

    AinvB = _apply_blocks(inv_p, inv_n, split, B)
    Dp = D - jnp.matmul(C, AinvB, precision="highest")
    core_inv = linsolve.equilibrated_inv_factor(Dp)
    return SchurLU(inv_p=inv_p, inv_n=inv_n, AinvB=AinvB, C=C,
                   core_inv=core_inv)


def make_compressed_specs(colored, split: ParticleSplit):
    """Static submatrix specs for (A_p, A_n, B, C, D) block extraction."""
    i1, i2 = split.i_cs, split.i_core
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    # particle blocks stacked: rows of all p-particles (np_*rp), cols per
    # block — represent as block-stacked 2D: rows i1_p, cols = within-block.
    # We extract each particle's square block by viewing rows (np_*rp) and
    # gathering its own columns: build index arrays explicitly.
    rows_p = i1[: np_ * rp]
    rows_n = i1[np_ * rp:]
    # block-diagonal extraction: for row r in particle k, cols are that
    # particle's i1 range. Build a (np_*rp, rp) column index array.
    cols_p = (rows_p.reshape(np_, rp)[:, None, :]
              .repeat(rp, axis=1).reshape(np_ * rp, rp))
    cols_n = (rows_n.reshape(nn_, rn)[:, None, :]
              .repeat(rn, axis=1).reshape(nn_ * rn, rn))

    def block_spec(rows, cols2d, colored):
        color_cols = colored.colors[cols2d]
        mask = colored._mask_body[rows[:, None], cols2d]
        return ("block", np.asarray(rows), np.asarray(cols2d),
                np.asarray(color_cols), mask.astype(np.float64))

    spec_Ap = block_spec(rows_p, cols_p, colored)
    spec_An = block_spec(rows_n, cols_n, colored)
    spec_B = colored.submatrix_spec(i1, i2)
    spec_C = colored.submatrix_spec(i2, i1)
    spec_D = colored.submatrix_spec(i2, i2)
    return (spec_Ap, spec_An, spec_B, spec_C, spec_D)


def extract_block(JS, last_row, spec):
    """Per-row column-gather variant for block-diagonal extraction."""
    _tag, rows, cols2d, color_cols, mask = spec
    M = JS[jnp.asarray(color_cols), jnp.asarray(rows)[:, None]] \
        * jnp.asarray(mask, JS.dtype)
    return M


# ---------------------------------------------------------------------------
# sparse particle coupling: B and C have only a handful of nonzero columns/
# rows per particle (the surface-flux BC and the kinetics row). Extracting
# just those turns the Schur complement into tiny gathers + scatter-adds and
# removes the (n_cs × n_core) dense intermediates entirely.
# ---------------------------------------------------------------------------

class CouplingSpec(NamedTuple):
    """Static per-particle-group coupling metadata (host numpy)."""
    rows: np.ndarray       # (n_part, r) global row/col indices of the blocks
    bcols: np.ndarray      # (n_part, m_b) global core-col indices (padded)
    bmask: np.ndarray      # (n_part, r, m_b) pattern mask for B entries
    crows: np.ndarray      # (n_part, m_c) global core-row indices (padded)
    cmask: np.ndarray      # (n_part, m_c, r) pattern mask for C entries
    bpos: np.ndarray       # (n_part, m_b) positions of bcols within i_core
    cpos: np.ndarray       # (n_part, m_c) positions of crows within i_core


def _group_coupling(pattern, rows2d, i2, pos_of):
    n_part, r = rows2d.shape
    bcols, crows = [], []
    for k in range(n_part):
        rk = rows2d[k]
        bc = np.nonzero(pattern[rk][:, i2].any(axis=0))[0]
        cr = np.nonzero(pattern[i2][:, rk].any(axis=1))[0]
        bcols.append(i2[bc])
        crows.append(i2[cr])
    m_b = max(1, max(len(b) for b in bcols))
    m_c = max(1, max(len(c) for c in crows))

    def pad(lst, m):
        out = np.zeros((n_part, m), dtype=np.int64)
        valid = np.zeros((n_part, m), dtype=bool)
        for k, v in enumerate(lst):
            if len(v):
                out[k, :len(v)] = v
                out[k, len(v):] = v[0]
                valid[k, :len(v)] = True
        return out, valid

    bcols_p, bvalid = pad(bcols, m_b)
    crows_p, cvalid = pad(crows, m_c)
    bmask = np.zeros((n_part, r, m_b))
    cmask = np.zeros((n_part, m_c, r))
    for k in range(n_part):
        # padded entries repeat a real index; zero their mask so the
        # scatter-add cannot double-count
        bmask[k] = pattern[np.ix_(rows2d[k], bcols_p[k])] * bvalid[k][None, :]
        cmask[k] = pattern[np.ix_(crows_p[k], rows2d[k])] * cvalid[k][:, None]
    return CouplingSpec(rows=rows2d, bcols=bcols_p, bmask=bmask,
                        crows=crows_p, cmask=cmask,
                        bpos=pos_of[bcols_p], cpos=pos_of[crows_p])


def make_sparse_specs(colored, split: ParticleSplit):
    """Static specs for the fully-sparse Schur factorization."""
    i1, i2 = split.i_cs, split.i_core
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    pattern = colored.pattern
    pos_of = np.zeros(colored.n, dtype=np.int64)
    pos_of[i2] = np.arange(len(i2))
    rows_p = i1[: np_ * rp].reshape(np_, rp)
    rows_n = i1[np_ * rp:].reshape(nn_, rn)
    cp = _group_coupling(pattern, rows_p, i2, pos_of)
    cn = _group_coupling(pattern, rows_n, i2, pos_of)
    spec_D = colored.submatrix_spec(i2, i2)
    return (cp, cn, spec_D)


class SparseSchur(NamedTuple):
    inv_p: jax.Array       # (n_p, r, r)
    inv_n: jax.Array
    AinvB_p: jax.Array     # (n_p, r, m_b)
    AinvB_n: jax.Array
    C_p: jax.Array         # (n_p, m_c, r)
    C_n: jax.Array
    core_inv: tuple


def _gcolor(colored):
    return jnp.asarray(colored.colors)


def _extract_B(JS, colored, cs: CouplingSpec):
    # B[k, a, b] = JS[color[bcols[k,b]], rows[k,a]] * mask
    cc = colored.colors[cs.bcols]                       # (n_part, m_b) static
    M = JS[jnp.asarray(cc)[:, None, :], jnp.asarray(cs.rows)[:, :, None]]
    return M * jnp.asarray(cs.bmask, JS.dtype)


def _extract_C(JS, last_row, colored, cs: CouplingSpec, n_tot: int):
    # C[k, i, a] = J[crows[k,i], rows[k,a]]
    cc = colored.colors[cs.rows]                        # (n_part, r)
    M = JS[jnp.asarray(cc)[:, None, :], jnp.asarray(cs.crows)[:, :, None]]
    M = M * jnp.asarray(cs.cmask, JS.dtype)
    # rows that are the control row need the exact reverse-mode values
    is_last = jnp.asarray(cs.crows == n_tot - 1)        # (n_part, m_c)
    lr = last_row[jnp.asarray(cs.rows)][:, None, :]     # (n_part, 1, r)
    return jnp.where(is_last[:, :, None], lr * jnp.asarray(cs.cmask, JS.dtype),
                     M)


def sparse_schur_factor(JS, last_row, colored, specs, split: ParticleSplit):
    cp, cn, spec_D = specs
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)

    # particle block inverses (block-diagonal extraction, as before)
    rows_p, rows_n = cp.rows, cn.rows
    colc_p = colored.colors[rows_p]                     # (np_, rp)
    Ap = JS[jnp.asarray(colc_p)[:, None, :], jnp.asarray(rows_p)[:, :, None]]
    maskA_p = colored.pattern[rows_p[:, :, None], rows_p[:, None, :]]
    Ap = Ap * jnp.asarray(maskA_p, JS.dtype)
    colc_n = colored.colors[rows_n]
    An = JS[jnp.asarray(colc_n)[:, None, :], jnp.asarray(rows_n)[:, :, None]]
    maskA_n = colored.pattern[rows_n[:, :, None], rows_n[:, None, :]]
    An = An * jnp.asarray(maskA_n, JS.dtype)
    inv_p = linsolve.gj_inverse(Ap)
    inv_n = linsolve.gj_inverse(An)

    B_p = _extract_B(JS, colored, cp)                   # (np_, rp, m_b)
    B_n = _extract_B(JS, colored, cn)
    n_tot = colored.n
    C_p = _extract_C(JS, last_row, colored, cp, n_tot)  # (np_, m_c, rp)
    C_n = _extract_C(JS, last_row, colored, cn, n_tot)

    AinvB_p = jnp.matmul(inv_p, B_p, precision="highest")
    AinvB_n = jnp.matmul(inv_n, B_n, precision="highest")

    D = colored.submatrix(JS, last_row, spec_D)
    S_p = jnp.matmul(C_p, AinvB_p, precision="highest")  # (np_, m_c, m_b)
    S_n = jnp.matmul(C_n, AinvB_n, precision="highest")
    D = D.at[jnp.asarray(cp.cpos)[:, :, None],
             jnp.asarray(cp.bpos)[:, None, :]].add(-S_p)
    D = D.at[jnp.asarray(cn.cpos)[:, :, None],
             jnp.asarray(cn.bpos)[:, None, :]].add(-S_n)
    core_inv = linsolve.equilibrated_inv_factor(D)
    return SparseSchur(inv_p=inv_p, inv_n=inv_n, AinvB_p=AinvB_p,
                       AinvB_n=AinvB_n, C_p=C_p, C_n=C_n, core_inv=core_inv)


def sparse_schur_solve(fac: SparseSchur, b, specs, split: ParticleSplit):
    cp, cn, _ = specs
    i1, i2 = split.i_cs, split.i_core
    np_, nn_, rp, rn = (split.n_part_p, split.n_part_n, split.r_p, split.r_n)
    b1 = b[..., i1]
    b2 = b[..., i2]
    z1p = jnp.matmul(fac.inv_p, b1[: np_ * rp].reshape(np_, rp, 1),
                     precision="highest")
    z1n = jnp.matmul(fac.inv_n, b1[np_ * rp:].reshape(nn_, rn, 1),
                     precision="highest")
    # rhs2 = b2 - C z1 (scatter-add per particle)
    cz_p = jnp.matmul(fac.C_p, z1p, precision="highest")[..., 0]
    cz_n = jnp.matmul(fac.C_n, z1n, precision="highest")[..., 0]
    rhs2 = b2.at[jnp.asarray(cp.cpos)].add(-cz_p)
    rhs2 = rhs2.at[jnp.asarray(cn.cpos)].add(-cz_n)
    x2 = linsolve.equilibrated_inv_solve(fac.core_inv, rhs2)
    # x1 = z1 - AinvB x2[bcols]
    x2b_p = x2[jnp.asarray(cp.bpos)][:, :, None]        # (np_, m_b, 1)
    x2b_n = x2[jnp.asarray(cn.bpos)][:, :, None]
    x1p = z1p - jnp.matmul(fac.AinvB_p, x2b_p, precision="highest")
    x1n = z1n - jnp.matmul(fac.AinvB_n, x2b_n, precision="highest")
    x = jnp.zeros_like(b)
    x = x.at[..., i1[: np_ * rp]].set(x1p.reshape(-1))
    x = x.at[..., i1[np_ * rp:]].set(x1n.reshape(-1))
    x = x.at[..., i2].set(x2)
    return x


def make_schur_solver(layout: StateLayout):
    """(factor, solve) pair plugging into run_once(linear_solver=...)."""
    split = make_split(layout)

    def factor(J):
        return schur_factor_from_dense(J, split)

    def solve(fac, b):
        return schur_solve(fac, b, split)

    return factor, solve
