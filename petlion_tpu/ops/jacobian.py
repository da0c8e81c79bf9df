"""Compressed (colored) Jacobian evaluation.

TPU-native replacement for the reference's sparse-Jacobian machinery
(SparseDiffTools colored forward-diff, generate_functions.jl:166-235, and the
symbolic sparse Jacobian, generate_functions.jl:270-307):

1. The sparsity pattern is detected once per model config by evaluating the
   dense jacfwd at a few randomized states (union of nonzero masks, plus the
   differential diagonal insurance the reference adds at
   generate_functions.jl:189-193). The pattern is static thereafter.
2. Greedy column coloring partitions the columns into ~15-25 groups whose
   columns never share a row — so the full Jacobian is recovered from that
   many JVP passes instead of N_tot.
3. The control (last) row may densify the pattern for arbitrary user control
   functions, which would wreck column coloring; it is excluded from the
   coloring and evaluated separately with one reverse-mode pass.

Recovery of the dense matrix is a static gather + mask multiply — no
scatters in the hot loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def detect_sparsity(F: Callable, y_samples, yp_samples, t_samples,
                    n_diff: int, threshold=0.0) -> np.ndarray:
    """Boolean (N, N) pattern of ∂F/∂y + c0·∂F/∂yp over sample states."""
    pat = None
    for y, yp, t in zip(y_samples, yp_samples, t_samples):
        Jy = jax.jacfwd(lambda yy: F(t, yy, yp))(y)
        Jp = jax.jacfwd(lambda pp: F(t, y, pp))(yp)
        m = (np.abs(np.asarray(Jy)) > threshold) | \
            (np.abs(np.asarray(Jp)) > threshold)
        pat = m if pat is None else (pat | m)
    n = pat.shape[0]
    # diagonal insurance on differential rows (∂YP terms are always on the
    # diagonal in this model family)
    idx = np.arange(n_diff)
    pat[idx, idx] = True
    pat[n - 1, n - 1] = True   # control row always touches something; keep I
    return pat


def greedy_color(pattern: np.ndarray, skip_last_row: bool = True):
    """Column coloring: columns sharing a nonzero row get different colors."""
    pat = pattern.copy()
    if skip_last_row:
        pat = pat[:-1, :]
    n = pat.shape[1]
    rows_of = [np.nonzero(pat[:, j])[0] for j in range(n)]
    colors = -np.ones(n, dtype=np.int32)
    row_used = {}   # color -> row bitmask
    masks = []
    for j in range(n):
        rs = rows_of[j]
        c = 0
        while True:
            if c == len(masks):
                masks.append(np.zeros(pat.shape[0], dtype=bool))
            if not masks[c][rs].any():
                colors[j] = c
                masks[c][rs] = True
                break
            c += 1
    return colors, len(masks)


class ColoredJacobian:
    """Precomputed coloring for one model config + control spec family.

    __call__(F_t, y, yp_const, c0) -> dense (N, N) Newton matrix
    where F_t(y, yp) is the residual at fixed t and the derivative map is
    yp = c0*y + const (so one jvp gives Fy + c0 Fyp columns).
    """

    def __init__(self, pattern: np.ndarray):
        self.pattern = pattern
        self.colors, self.n_colors = greedy_color(pattern)
        n = pattern.shape[0]
        self.n = n
        # seed matrix (n_colors, N): seeds[c, j] = 1 if colors[j] == c
        seeds = np.zeros((self.n_colors, n), dtype=np.float64)
        seeds[self.colors, np.arange(n)] = 1.0
        self._seeds = seeds
        self._col_color = self.colors          # (N,)
        self._mask = pattern.astype(np.float64)
        # zero out the last row in the colored reconstruction; it is computed
        # exactly by a reverse pass
        self._mask_body = self._mask.copy()
        self._mask_body[-1, :] = 0.0

    def compressed(self, g: Callable, y):
        """(JS, last_row): the n_colors JVP sweeps + exact control row,
        WITHOUT materializing the dense matrix. J[i,j] = JS[color[j], i]
        on the pattern."""
        dtype = y.dtype
        seeds = jnp.asarray(self._seeds, dtype)

        def jvp_one(s):
            return jax.jvp(g, (y,), (s,))[1]

        JS = jax.vmap(jvp_one)(seeds)            # (n_colors, N)
        last = jax.grad(lambda yy: g(yy)[-1])(y)
        return JS, last

    def submatrix_spec(self, rows: np.ndarray, cols: np.ndarray):
        """Static metadata to extract J[rows, cols] from (JS, last_row)."""
        color_cols = self.colors[cols]
        mask = self._mask_body[np.ix_(rows, cols)]
        last_rows = np.nonzero(rows == self.n - 1)[0]
        return (np.asarray(rows), np.asarray(cols),
                np.asarray(color_cols), mask.astype(np.float64),
                int(last_rows[0]) if len(last_rows) else -1)

    @staticmethod
    def submatrix(JS, last_row, spec):
        rows, cols, color_cols, mask, last_pos = spec
        M = JS[jnp.asarray(color_cols)[None, :],
               jnp.asarray(rows)[:, None]] * jnp.asarray(mask, JS.dtype)
        if last_pos >= 0:
            M = M.at[last_pos, :].set(last_row[jnp.asarray(cols)])
        return M

    def __call__(self, g: Callable, y):
        """g(y) = F(t, y, c0*y + const); returns the dense Newton matrix."""
        dtype = y.dtype
        seeds = jnp.asarray(self._seeds, dtype)

        def jvp_one(s):
            return jax.jvp(g, (y,), (s,))[1]

        JS = jax.vmap(jvp_one)(seeds)            # (n_colors, N) rows=tangents
        # J[i, j] = JS[color[j], i] on the pattern
        Jhat = JS[jnp.asarray(self._col_color), :].T   # (N, N) gather
        J = Jhat * jnp.asarray(self._mask_body, dtype)
        # exact last row via reverse-mode
        last = jax.grad(lambda yy: g(yy)[-1])(y)
        J = J.at[-1, :].set(last)
        return J
