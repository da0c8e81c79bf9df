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
    n_n = 0 if layout.half_cell else N.n   # foil anode: no particle blocks
    if layout.solid_diffusion == "Fickian":
        return ParticleSplit(i_cs, i_core, N.p, n_n, N.r_p, N.r_n)
    # quadratic/polynomial: each "particle block" is a 1x1 scalar
    return ParticleSplit(i_cs, i_core, N.p, n_n, 1, 1)


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


# ---------------------------------------------------------------------------
# sparse multi-group elimination: every state family whose self-coupling is
# block-diagonal w.r.t. the others gets eliminated from the core. Groups:
#   - cathode particles  (N_p blocks of r_p × r_p radial diffusion)
#   - anode particles    (N_n blocks of r_n × r_n)
#   - c_e                (one tridiagonal (N_p+N_s+N_n)² block — its rows
#                         never touch c_s and vice versa, residuals.jl:6-106)
# For the default LCO mesh this shrinks the dense core from 101 (round 1)
# to 71 (j, Φ_e, Φ_s, I) — the Gauss-Jordan core factorization is the
# throughput limiter, and its traffic scales ~n³.
# B and C have only a handful of nonzero columns/rows per block (surface-flux
# BC, kinetics row, Φ_e/T source coupling); extracting just those turns the
# Schur complement into tiny gathers + scatter-adds with no dense
# (n_elim × n_core) intermediates.
# ---------------------------------------------------------------------------


class GroupSplit(NamedTuple):
    """Static multi-group elimination layout (host numpy)."""
    group_rows: tuple        # tuple of (n_part, r) global-index arrays
    i_core: np.ndarray       # remaining indices (original order)


def make_group_split(layout: StateLayout, pattern: np.ndarray) -> GroupSplit:
    """Choose elimination groups, validating block-diagonality against the
    detected sparsity pattern (a group pair that couples falls back to the
    core — correctness never depends on the grouping heuristics)."""
    N = layout.N
    s = layout.sl("c_s_avg")
    i_cs = np.arange(s.start, s.stop)
    if layout.solid_diffusion == "Fickian":
        rp, rn = N.r_p, N.r_n
    else:
        rp = rn = 1
    candidates = [i_cs[: N.p * rp].reshape(N.p, rp)]
    i_cs_n = i_cs[N.p * rp:]
    if i_cs_n.size:   # absent for half-cells (foil anode has no c_s states)
        candidates.append(i_cs_n.reshape(-1, rn))
    ce = layout.sl("c_e")
    candidates.append(np.arange(ce.start, ce.stop).reshape(1, -1))

    # control row stays in the core (it is index N_tot-1, never a candidate)
    groups = []
    for g in candidates:
        flat = g.reshape(-1)
        # within-group block-diagonality: no coupling between distinct blocks
        block_ok = True
        for k in range(g.shape[0]):
            other_blocks = np.setdiff1d(flat, g[k])
            if pattern[np.ix_(g[k], other_blocks)].any() or \
               pattern[np.ix_(other_blocks, g[k])].any():
                block_ok = False
                break
        if not block_ok:
            continue
        # cross-group independence vs already-accepted groups
        ok = True
        for h in groups:
            hf = h.reshape(-1)
            if pattern[np.ix_(flat, hf)].any() or \
               pattern[np.ix_(hf, flat)].any():
                ok = False
                break
        if ok:
            groups.append(g)
    i_elim = (np.concatenate([g.reshape(-1) for g in groups])
              if groups else np.zeros(0, dtype=np.int64))
    i_core = np.setdiff1d(np.arange(layout.N_tot), i_elim)
    return GroupSplit(group_rows=tuple(groups), i_core=i_core)

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


def make_sparse_specs(colored, split: GroupSplit, layout: StateLayout = None,
                      nested_families=("j", "Phi_s")):
    """Static specs for the fully-sparse multi-group Schur factorization,
    plus the nested in-core elimination levels (empty when no layout), plus
    the core permutation that makes each level a contiguous leading slice
    (consumed by the fused Pallas D-chain kernel, ops/pallas_schur.py)."""
    i2 = split.i_core
    pattern = colored.pattern
    pos_of = np.zeros(colored.n, dtype=np.int64)
    pos_of[i2] = np.arange(len(i2))
    cspecs = tuple(_group_coupling(pattern, g, i2, pos_of)
                   for g in split.group_rows)
    spec_D = colored.submatrix_spec(i2, i2)
    nested = (make_nested_specs(layout, i2, nested_families)
              if layout is not None else ())
    pinfo = None
    if nested:
        cur = np.arange(len(i2))
        order, sizes = [], []
        for e_pos, r_pos in nested:
            order.append(cur[e_pos])
            sizes.append(len(e_pos))
            cur = cur[r_pos]
        order.append(cur)
        pinfo = (np.concatenate(order), tuple(sizes))
    return (cspecs, spec_D, nested, pinfo)


class SparseSchur(NamedTuple):
    """Per-group (inv, AinvB, C) triples + nested dense eliminations +
    equilibrated core inverse. A nested tuple-of-tuples of arrays — a plain
    pytree, vmap-transparent.

    NOTE (f32 conditioning, measured): thermal configs with derivative-hold
    controls reach cond(J) ≈ 1e14-1e16 (the dT control row is nearly
    linearly dependent on the T rows); NO pivot-free elimination survives
    that in f32 — the Schur base solve error is O(10) where the pivoted
    dense LU of the same matrix gets 3e-5. `JacobianPlan.factor_compressed`
    therefore routes f32+temperature runs to the pivoted dense-LU path;
    this factorization is used for isothermal f32 (well-conditioned,
    validated) and all f64."""
    groups: tuple
    core_inv: tuple
    levels: tuple = ()


class SparseSchurP(NamedTuple):
    """Fused-kernel variant of SparseSchur, in PERMUTED core coordinates
    (levels are contiguous leading slices — specs' pinfo holds the
    permutation): per-group triples as in SparseSchur, per-level
    (invA, AinvB, C) from the Pallas D-chain kernel, and the FOLDED core
    inverse (equilibration scalings already multiplied back, so a solve is
    one matvec). Produced only on the TPU f32 fast path."""
    groups: tuple
    core_inv: jax.Array
    levels: tuple = ()


# ---------------------------------------------------------------------------
# nested dense elimination inside the assembled core: state families whose
# SELF-coupling is invertible but which cross-couple with the level-1 groups
# (so they cannot join the one-shot multi-group elimination) are eliminated
# sequentially from the dense Schur core D. For the default isothermal mesh:
#
#   level 1 (groups):  c_s particles, c_e           core 301 -> 71
#   level 2 (nested):  j   (diag + fill, invertible)     71 -> 51
#   level 3 (nested):  Φ_s (singular Neumann Laplacian alone — res_Phi_s
#                      rows touch only Φ_s/j/I — but PINNED once the j fill
#                      C_Φs,j A_j⁻¹ B_j,Φs lands on it)   51 -> 31
#
# Each level is exact block algebra (no approximation); only numerical
# stability is at stake, and the f32+thermal configs that stress it are
# already routed to the pivoted RefinedLU path by the plan. Cost: the final
# Gauss-Jordan core shrinks 71³ -> 31³ + two equilibrated 20×20 inverses.
# Reference par: this plays the role of KLU's fill-reducing elimination
# ordering (model_evaluation.jl:271, scalar_residual.jl:489-507).
# ---------------------------------------------------------------------------


def make_nested_specs(layout: StateLayout, i_core: np.ndarray,
                      families=("j", "Phi_s")) -> tuple:
    """Static per-level (e_pos, r_pos) position arrays into the shrinking
    core vector, one level per eliminated family. The control row (last
    core position) always stays in the final core."""
    cur = np.asarray(i_core)
    specs = []
    for fam in families:
        if fam not in layout:
            continue
        s = layout.sl(fam)
        gi = np.arange(s.start, s.stop)
        mask = np.isin(cur, gi)
        if not mask.any() or mask.all():
            continue
        e_pos = np.nonzero(mask)[0]
        r_pos = np.nonzero(~mask)[0]
        specs.append((e_pos, r_pos))
        cur = cur[r_pos]
    return tuple(specs)


import os

# A/B toggles for routing the factorization's linear algebra through the
# VMEM-resident Pallas kernels (one HBM read+write per stack instead of
# n scalar-GJ passes). BLOCKS: the per-group/nested block inverses;
# DCHAIN: the fused nested-elimination + core-inverse kernel
# (ops/pallas_schur.py). Both default OFF until validated on real TPU
# hardware (interpret-mode correctness is pinned by tests, but Mosaic
# compilation of NEW kernels has bitten before — the round-2 mean-shift
# fusion CHECK crash); flip the default after tools/ab_paired.py proves
# them on hardware. "1" = route on TPU f32; "0" = XLA only.
_PALLAS_BLOCKS = os.environ.get("PETLION_PALLAS_BLOCKS", "0") != "0"
_PALLAS_DCHAIN = os.environ.get("PETLION_PALLAS_DCHAIN", "0") != "0"


def _gj_inverse_routed(As, min_n: int = 10):
    """Pivot-free GJ inverse of a (..., n, n) stack, routed to the Pallas
    VMEM kernel on the TPU f32 trace path (callers equilibrate first).
    The XLA scalar GJ makes n HBM passes over the batched augmented
    matrix; the kernel makes one read + one write."""
    if _PALLAS_BLOCKS and linsolve._use_pallas_gj(As, min_n=min_n):
        from .pallas_gj import gj_inverse_hot, gj_inverse_hot_blocks
        if As.ndim == 2:
            return gj_inverse_hot(As)
        if As.ndim == 3:
            return gj_inverse_hot_blocks(As)
    return linsolve.gj_inverse(As)


def _equilibrated_inv(A):
    """Plain explicit inverse with the equilibration scalings folded back:
    A = diag(row)·As·diag(col)  =>  A⁻¹ = diag(1/col)·As⁻¹·diag(1/row)."""
    colA = jnp.maximum(jnp.max(jnp.abs(A), axis=-2), 1e-30)
    rowA = jnp.maximum(jnp.max(jnp.abs(A / colA[..., None, :]), axis=-1),
                       1e-30)
    inv_s = _gj_inverse_routed(A / colA[..., None, :] / rowA[..., :, None],
                               min_n=17)
    return inv_s / colA[..., :, None] / rowA[..., None, :]


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


from functools import lru_cache


@lru_cache(maxsize=None)
def _dchain_hot_cached(sizes: tuple):
    from .pallas_schur import make_dchain_hot
    return make_dchain_hot(sizes)


def sparse_schur_factor(JS, last_row, colored, specs, split: GroupSplit):
    cspecs, spec_D, nested, pinfo = specs
    n_tot = colored.n
    D = colored.submatrix(JS, last_row, spec_D)
    per_group = []
    for cs in cspecs:
        rows = cs.rows                                   # (n_part, r)
        colc = colored.colors[rows]
        A = JS[jnp.asarray(colc)[:, None, :], jnp.asarray(rows)[:, :, None]]
        maskA = colored.pattern[rows[:, :, None], rows[:, None, :]]
        A = A * jnp.asarray(maskA, JS.dtype)
        # pivot-free GJ is stable here: each block is c0·I minus a (scaled)
        # diffusion operator — the negative of an M-matrix, which factors
        # without pivoting (same property KLU's static ordering exploits).
        # Row/col equilibration before the inverse keeps the f32 path
        # accurate when the block is stiff (large D_s/dr² vs small γ), then
        # folds the scalings back so `inv` is the plain A⁻¹:
        #   A⁻¹ = diag(1/col) · inv(Ds) · diag(1/row)
        colA = jnp.maximum(jnp.max(jnp.abs(A), axis=-2), 1e-30)
        rowA = jnp.maximum(jnp.max(jnp.abs(A / colA[..., None, :]), axis=-1),
                           1e-30)
        inv_s = _gj_inverse_routed(A / colA[..., None, :]
                                   / rowA[..., :, None])
        inv = inv_s / colA[..., :, None] / rowA[..., None, :]
        B = _extract_B(JS, colored, cs)                  # (n_part, r, m_b)
        C = _extract_C(JS, last_row, colored, cs, n_tot)  # (n_part, m_c, r)
        AinvB = jnp.matmul(inv, B, precision="highest")
        S = jnp.matmul(C, AinvB, precision="highest")    # (n_part, m_c, m_b)
        D = D.at[jnp.asarray(cs.cpos)[:, :, None],
                 jnp.asarray(cs.bpos)[:, None, :]].add(-S)
        per_group.append((inv, AinvB, C))
    # fused D-chain: the whole nested-elimination + core-inverse sequence in
    # one VMEM-resident Pallas kernel (permuted so levels are leading slices)
    if (pinfo is not None and _PALLAS_DCHAIN
            and linsolve._use_pallas_gj(D, min_n=17)):
        perm, sizes = pinfo
        pj = jnp.asarray(perm)
        Dp = D[pj][:, pj]
        outs = _dchain_hot_cached(sizes)(Dp)
        levels = tuple((outs[3 * i], outs[3 * i + 1], outs[3 * i + 2])
                       for i in range(len(sizes)))
        return SparseSchurP(groups=tuple(per_group), core_inv=outs[-1],
                            levels=levels)
    levels = []
    for e_pos, r_pos in nested:
        A = D[jnp.ix_(e_pos, e_pos)]
        Bm = D[jnp.ix_(e_pos, r_pos)]
        Cm = D[jnp.ix_(r_pos, e_pos)]
        invA = _equilibrated_inv(A)
        AinvB = jnp.matmul(invA, Bm, precision="highest")
        D = (D[jnp.ix_(r_pos, r_pos)]
             - jnp.matmul(Cm, AinvB, precision="highest"))
        levels.append((invA, AinvB, Cm))
    core_inv = linsolve.equilibrated_inv_factor(D)
    return SparseSchur(groups=tuple(per_group), core_inv=core_inv,
                       levels=tuple(levels))


def sparse_schur_solve(fac, b, specs, split: GroupSplit):
    cspecs, _, nested, pinfo = specs
    i2 = split.i_core
    rhs2 = b[..., i2]
    zs = []
    for (inv, AinvB, C), cs in zip(fac.groups, cspecs):
        n_part, r = cs.rows.shape
        b1 = b[..., cs.rows.reshape(-1)].reshape(n_part, r, 1)
        z = jnp.matmul(inv, b1, precision="highest")     # (n_part, r, 1)
        cz = jnp.matmul(C, z, precision="highest")[..., 0]
        rhs2 = rhs2.at[jnp.asarray(cs.cpos)].add(-cz)
        zs.append(z)
    if isinstance(fac, SparseSchurP):
        # fused-kernel coordinates: permute once, levels are leading slices
        perm, sizes = pinfo
        pj = jnp.asarray(perm)
        r2 = rhs2[..., pj]
        zl = []
        for (invA, AinvB, Cm), nk in zip(fac.levels, sizes):
            z = jnp.matmul(invA, r2[..., :nk, None],
                           precision="highest")[..., 0]
            r2 = (r2[..., nk:]
                  - jnp.matmul(Cm, z[..., None], precision="highest")[..., 0])
            zl.append(z)
        x2 = jnp.matmul(fac.core_inv, r2[..., None],
                        precision="highest")[..., 0]
        for (invA, AinvB, Cm), z in zip(reversed(fac.levels), reversed(zl)):
            xe = (z
                  - jnp.matmul(AinvB, x2[..., None], precision="highest")[..., 0])
            x2 = jnp.concatenate([xe, x2], axis=-1)
        x2 = jnp.zeros_like(x2).at[..., pj].set(x2)   # unpermute
    else:
        # nested in-core eliminations: forward pass
        zl = []
        for (invA, AinvB, Cm), (e_pos, r_pos) in zip(fac.levels, nested):
            be = rhs2[..., e_pos]
            z = jnp.matmul(invA, be[..., None], precision="highest")[..., 0]
            rhs2 = (rhs2[..., r_pos]
                    - jnp.matmul(Cm, z[..., None],
                                 precision="highest")[..., 0])
            zl.append(z)
        x2 = linsolve.equilibrated_inv_solve(fac.core_inv, rhs2)
        # nested back-substitution (reverse level order)
        for (invA, AinvB, Cm), (e_pos, r_pos), z in zip(
                reversed(fac.levels), reversed(nested), reversed(zl)):
            xe = (z
                  - jnp.matmul(AinvB, x2[..., None],
                               precision="highest")[..., 0])
            xf = jnp.zeros(x2.shape[:-1] + (len(e_pos) + len(r_pos),),
                           x2.dtype)
            xf = xf.at[..., r_pos].set(x2)
            xf = xf.at[..., e_pos].set(xe)
            x2 = xf
    x = jnp.zeros_like(b)
    x = x.at[..., i2].set(x2)
    for (inv, AinvB, C), cs, z in zip(fac.groups, cspecs, zs):
        x2b = x2[jnp.asarray(cs.bpos)][:, :, None]       # (n_part, m_b, 1)
        x1 = z - jnp.matmul(AinvB, x2b, precision="highest")
        x = x.at[..., cs.rows.reshape(-1)].set(x1.reshape(-1))
    return x


def make_schur_solver(layout: StateLayout):
    """(factor, solve) pair plugging into run_once(linear_solver=...)."""
    split = make_split(layout)

    def factor(J):
        return schur_factor_from_dense(J, split)

    def solve(fac, b):
        return schur_solve(fac, b, split)

    return factor, solve
