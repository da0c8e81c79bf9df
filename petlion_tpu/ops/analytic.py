"""Analytic (closed-form) assembly of the compressed Newton matrix.

Replaces the ~10 colored full-residual JVP sweeps (`ColoredJacobian.
compressed`) with direct assembly of J = ∂F/∂y + c0·∂F/∂yp for the
structured residual families — the TPU-native analogue of the reference's
symbolic `J_y!` (generate_functions.jl:270-307): there the Jacobian entries
are generated as closed-form expressions offline; here they are closed-form
*stencil algebra* traced straight into the jitted step, so the factorization
no longer pays 10 tangent passes of the full residual per attempt.

Key structural facts exploited (all pinned by tests/test_analytic.py against
the colored-AD Jacobian at 1e-12, and by the residual oracle):

  * every differential row has ∂F/∂yp = −1 on its own diagonal and nothing
    else (res = rhs − yp), so c0·∂F/∂yp = −c0·E_diff;
  * the radial solid-diffusion operator is LINEAR in c_s at fixed (j, D_s)
    with rhs = (D_s/Rp²)·A₀·c + (B̃/Rp)·j where A₀, B̃ are constant
    (both for the FD stencils, residuals.jl:128-180, and the Chebyshev
    scheme, residuals.jl:181-235) — so the (r×r) particle blocks of J are a
    broadcast scale of one host-precomputed matrix, zero matmuls;
  * the c_e / Φ_e rows are tridiagonal flux stencils whose only state
    dependence runs through elementwise transport closures (D_eff, K_eff,
    ν) — their derivatives come from ONE elementwise jvp each;
  * the j rows are elementwise kinetics — 3 elementwise jvps per electrode;
  * the Φ_s rows are a constant tridiagonal plus constant j/I columns.

The control (last) row stays exact reverse-mode (one pass), as in the
colored path. Scope: isothermal, aging=None, Fickian solid diffusion,
full cell. Anything else — and any *pattern entry the closed forms do not
cover* (checked at build time against the detected sparsity) — falls back
to the colored sweeps, so correctness never depends on this module's
structural assumptions.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import FARADAY as F, IDEAL_GAS as R
from ..physics.residuals import ModelConfig, calc_I1C


class Unsupported(Exception):
    pass


def _host_radial_A0_bj(cfg: ModelConfig, n_r: int):
    """Host-side one-time extraction of the radial operator's constant parts:
    rhs(c, j; Rp, D_s) = (D_s/Rp²)·A₀·c + (B̃/Rp)·j  (see module docstring).
    Evaluated at Rp=1, D_s=1 with jacfwd on CPU f64."""
    from ..physics.residuals import _fickian_rhs, _spectral_rhs
    radial = (_fickian_rhs
              if cfg.numerics.Fickian_method == "finite_difference"
              else _spectral_rhs)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        one = jnp.ones((1,), f64)

        def f_c(c):
            return radial(c, 0.0 * one, 1.0, one, 1, n_r)

        def f_j(jv):
            return radial(jnp.zeros((n_r,), f64), jv, 1.0, one, 1, n_r)

        A0 = np.asarray(jax.jacfwd(f_c)(jnp.zeros((n_r,), f64)))
        bj = np.asarray(jax.jacfwd(f_j)(0.0 * one))[:, 0]
    return A0, bj


def _ds_depends_on_c(cfg: ModelConfig, th_keys_sample: dict) -> bool:
    """Host-side static probe: does D_s_eff vary with concentration?
    (Same spirit as plan.detect_sparsity: structure decided off-trace.)"""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        th = {k: jnp.asarray(float(v), f64) for k, v in th_keys_sample.items()}
        T = jnp.full((3,), float(th_keys_sample.get("T0", 298.15)), f64)

        def f(c):
            dp, dn = cfg.numerics.D_s_eff(c, c, T, T, th)
            return jnp.concatenate([jnp.atleast_1d(dp), jnp.atleast_1d(dn)])

        for c0 in (2.1e4, 3.7e4):
            c = jnp.full((3,), c0, f64)
            d = np.asarray(jax.jvp(f, (c,), (jnp.ones_like(c),))[1])
            if np.any(np.abs(d) > 0):
                return True
    return False


class AnalyticJacobian:
    """Static write-plan + runtime assembly producing (JS, last) in the
    ColoredJacobian compressed layout: JS[color[col], row] = J[row, col]."""

    @staticmethod
    def supports(cfg: ModelConfig) -> bool:
        num = cfg.numerics
        return (not num.temperature and num.aging is None
                and num.solid_diffusion == "Fickian" and not cfg.half_cell)

    def __init__(self, cfg: ModelConfig, colored, theta_sample: dict):
        if not self.supports(cfg):
            raise Unsupported("config")
        self.cfg = cfg
        self.colored = colored
        N, L = cfg.N, cfg.layout
        P, S, Nn = N.p, N.s, N.n
        n_ce = P + S + Nn
        self.n = L.N_tot

        self.A0_p, self.bj_p = _host_radial_A0_bj(cfg, N.r_p)
        self.A0_n, self.bj_n = _host_radial_A0_bj(cfg, N.r_n)
        self.ds_dep = _ds_depends_on_c(cfg, theta_sample)

        ce0 = L.sl("c_e").start
        cs0 = L.sl("c_s_avg").start
        j0 = L.sl("j").start
        pe0 = L.sl("Phi_e").start
        ps0 = L.sl("Phi_s").start
        iI = L.sl("I").start
        surf_p = L.c_s_surface_slice("p")          # (P,) global indices
        surf_n = L.c_s_surface_slice("n")
        self.idx = dict(ce0=ce0, cs0=cs0, j0=j0, pe0=pe0, ps0=ps0, iI=iI,
                        P=P, S=S, Nn=Nn, n_ce=n_ce,
                        surf_p=surf_p, surf_n=surf_n)

        # ---- static write plan: list of (rows, cols) index arrays ----------
        writes = []   # (name, rows_flat, cols_flat)

        def add(name, rows, cols):
            rows = np.asarray(rows, np.int64).reshape(-1)
            cols = np.asarray(cols, np.int64).reshape(-1)
            assert rows.shape == cols.shape, name
            writes.append((name, rows, cols))

        ar_ce = np.arange(n_ce)
        # c_e rows: tridiagonal in c_e (flux + harmonic-mean + ν' terms)
        add("ce_lo", ce0 + ar_ce[1:], ce0 + ar_ce[:-1])
        add("ce_di", ce0 + ar_ce, ce0 + ar_ce)
        add("ce_up", ce0 + ar_ce[:-1], ce0 + ar_ce[1:])
        # c_e rows ← j (electrode CVs)
        el_cells = np.concatenate([np.arange(P), P + S + np.arange(Nn)])
        add("ce_j", ce0 + el_cells, j0 + np.arange(P + Nn))

        # c_s particle blocks + j column (+ optional D_s surface column)
        rp, rn = N.r_p, N.r_n
        rows_p = cs0 + (np.arange(P)[:, None] * rp
                        + np.arange(rp)[None, :])          # (P, rp)
        rows_n = cs0 + P * rp + (np.arange(Nn)[:, None] * rn
                                 + np.arange(rn)[None, :])
        add("cs_blk_p", np.repeat(rows_p, rp, axis=1),
            np.tile(rows_p, (1, rp)))
        add("cs_blk_n", np.repeat(rows_n, rn, axis=1),
            np.tile(rows_n, (1, rn)))
        add("cs_j_p", rows_p, np.broadcast_to(
            (j0 + np.arange(P))[:, None], (P, rp)))
        add("cs_j_n", rows_n, np.broadcast_to(
            (j0 + P + np.arange(Nn))[:, None], (Nn, rn)))
        if self.ds_dep:
            add("cs_ds_p", rows_p, np.broadcast_to(
                surf_p[:, None], (P, rp)))
            add("cs_ds_n", rows_n, np.broadcast_to(
                surf_n[:, None], (Nn, rn)))

        # j rows: diag + c_s_star + c_e + Φ_s + Φ_e
        jr = j0 + np.arange(P + Nn)
        add("j_diag", jr, jr)
        add("j_cs", jr, np.concatenate([surf_p, surf_n]))
        add("j_ce", jr, ce0 + el_cells)
        add("j_ps", jr, ps0 + np.arange(P + Nn))
        add("j_pe", jr, pe0 + el_cells)

        # Φ_e rows: tridiag in Φ_e, tridiag in c_e, j column; last row = BC
        per = pe0 + ar_ce
        add("pe_pe_lo", per[1:], per[:-1] - pe0 + pe0)
        add("pe_pe_di", per, per)
        add("pe_pe_up", per[:-1], per[1:])
        add("pe_ce_lo", per[1:], ce0 + ar_ce[:-1])
        add("pe_ce_di", per, ce0 + ar_ce)
        add("pe_ce_up", per[:-1], ce0 + ar_ce[1:])
        add("pe_j", per[el_cells], j0 + np.arange(P + Nn))

        # Φ_s rows: fixed tridiag, j diag, I column (first p / last n rows)
        psr = ps0 + np.arange(P + Nn)
        tri_lo_rows, tri_lo_cols, tri_di, tri_up_rows, tri_up_cols = \
            [], [], [], [], []
        for base, ne in ((0, P), (P, Nn)):
            idx_e = base + np.arange(ne)
            tri_di.extend(idx_e)
            tri_lo_rows.extend(idx_e[1:])
            tri_lo_cols.extend(idx_e[:-1])
            tri_up_rows.extend(idx_e[:-1])
            tri_up_cols.extend(idx_e[1:])
        add("ps_lo", ps0 + np.array(tri_lo_rows), ps0 + np.array(tri_lo_cols))
        add("ps_di", ps0 + np.array(tri_di), ps0 + np.array(tri_di))
        add("ps_up", ps0 + np.array(tri_up_rows), ps0 + np.array(tri_up_cols))
        add("ps_j", psr, j0 + np.arange(P + Nn))
        add("ps_I", np.array([ps0, ps0 + P + Nn - 1]), np.array([iI, iI]))

        # differential diagonal (−c0): c_e diag handled via ce_di; c_s diag
        # sits inside the blocks; nothing extra needed — both index sets
        # already include their diagonals.

        # ---- coverage check vs the detected pattern -------------------------
        pat = colored.pattern
        cover = np.zeros_like(pat)
        for name, rows, cols in writes:
            cover[rows, cols] = True
        body = pat.copy()
        body[-1, :] = False          # control row is exact reverse-mode
        # Φ_e ground row (residuals.jl:586): the row is overwritten to
        # Φ_e[-1]; its only analytic entry is the diagonal 1. Pattern may
        # contain it already; coverage includes pe_pe_di.
        missing = body & ~cover
        if missing.any():
            ii, jj = np.nonzero(missing)
            raise Unsupported(
                f"{missing.sum()} pattern entries not covered by the "
                f"closed forms, e.g. rows {ii[:5]} cols {jj[:5]}")

        # precompute scatter targets + pattern masks, concatenated
        self._writes = writes
        self._names = [w[0] for w in writes]
        rr = np.concatenate([w[1] for w in writes])
        cc = np.concatenate([w[2] for w in writes])
        self._rr = rr
        self._cc_color = colored.colors[cc]
        self._mask = pat[rr, cc].astype(np.float64)
        # the Φ_e ground row entry must be written even if two random states
        # happened to mark it (it is 1 exactly; always in pattern in practice)
        self._sizes = [w[1].size for w in writes]
        self._n_colors = colored.n_colors

        # ---- algebraic sub-block write plan (consistent initialization) ----
        # rows/cols restricted to the algebraic states (j, Φ_e, Φ_s, I); the
        # substituted control row is exact reverse-mode in plan.factor_alg.
        # Coverage vs pattern[nd:n−1, nd:] is implied by the full-check above
        # (differential columns cannot appear in the algebraic sub-block).
        nd = L.N_diff
        self.n_diff = nd
        alg_names = ("j_diag", "j_ps", "j_pe",
                     "pe_pe_lo", "pe_pe_di", "pe_pe_up", "pe_j",
                     "ps_lo", "ps_di", "ps_up", "ps_j", "ps_I")
        self._alg_names = alg_names
        by_name = {w[0]: w for w in writes}
        arr = np.concatenate([by_name[n][1] for n in alg_names])
        acc = np.concatenate([by_name[n][2] for n in alg_names])
        assert (arr >= nd).all() and (acc >= nd).all()
        self._alg_rr = arr - nd
        self._alg_cc = acc - nd
        self._alg_mask = pat[arr, acc].astype(np.float64)

    # ------------------------------------------------------------------ run

    def alg_block(self, y, th):
        """Dense (n_alg, n_alg) algebraic Jacobian block (rows j/Φ_e/Φ_s,
        control row left zero — plan.factor_alg sets it by reverse-mode).
        Replaces the ~n_colors JVP sweeps per consistent-init Newton
        iteration with 2 elementwise kinetics jvps + constant stencils."""
        cfg, N = self.cfg, self.cfg.N
        num = cfg.numerics
        ix = self.idx
        P, S, Nn, n_ce = ix["P"], ix["S"], ix["Nn"], ix["n_ce"]
        dtype = y.dtype
        L = cfg.layout
        n_alg = self.n - self.n_diff

        c_e = L.get(y, "c_e")
        j = L.get(y, "j")
        Phi_e = L.get(y, "Phi_e")
        Phi_s = L.get(y, "Phi_s")
        c_star_p = y[..., ix["surf_p"]]
        c_star_n = y[..., ix["surf_n"]]
        T_p = jnp.full((P,), th["T0"], dtype)
        T_s = jnp.full((S,), th["T0"], dtype)
        T_n = jnp.full((Nn,), th["T0"], dtype)

        eps_sp = 1.0 - (th["eps_fp"] + th["eps_p"])
        eps_sn = 1.0 - (th["eps_fn"] + th["eps_n"])
        a_p = 3.0 * eps_sp / th["Rp_p"]
        a_n = 3.0 * eps_sn / th["Rp_n"]
        sig_p = th["sigma_p"] * eps_sp
        sig_n = th["sigma_n"] * eps_sn
        a_cells = jnp.concatenate([
            jnp.broadcast_to(a_p, (P,)).astype(dtype),
            jnp.zeros((S,), dtype),
            jnp.broadcast_to(a_n, (Nn,)).astype(dtype)])
        I1C = calc_I1C(th)
        h = jnp.concatenate([
            jnp.full((P,), th["l_p"] / P, dtype),
            jnp.full((S,), th["l_s"] / S, dtype),
            jnp.full((Nn,), th["l_n"] / Nn, dtype)])
        d_edge = 0.5 * (h[:-1] + h[1:])
        beta = h[:-1] / (h[:-1] + h[1:])
        K_cell = jnp.concatenate(num.K_eff(c_e[:P], c_e[P:P + S],
                                           c_e[P + S:], T_p, T_s, T_n, th))
        K_edge = K_cell[:-1] * K_cell[1:] / (beta * K_cell[1:]
                                             + (1.0 - beta) * K_cell[:-1])
        ke_d = K_edge / d_edge
        z1 = jnp.zeros((1,), dtype)

        lam_p = th.get("lambda_MHC_p", 0.0)
        lam_n = th.get("lambda_MHC_n", 0.0)
        pe_p, pe_n = Phi_e[:P], Phi_e[P + S:]

        def jfun_p(eta_shift):
            kp, _ = num.rxn_rate(T_p, T_n, c_star_p, c_star_n, th)
            U, _ = num.OCV_p(c_star_p / th["c_max_p"], T_p, th)
            eta = Phi_s[:P] - pe_p - U + eta_shift
            return num.rxn_p(c_star_p, c_e[:P], T_p, eta, kp, lam_p,
                             th["c_max_p"], th)

        def jfun_n(eta_shift):
            _, kn = num.rxn_rate(T_p, T_n, c_star_p, c_star_n, th)
            U, _ = num.OCV_n(c_star_n / th["c_max_n"], T_n, th)
            eta = Phi_s[P:] - pe_n - U + eta_shift
            if "R_film_n" in th:
                eta = eta - j[P:] * F * th["R_film_n"]
            return num.rxn_n(c_star_n, c_e[P + S:], T_n, eta, kn, lam_n,
                             th["c_max_n"], th)

        zp, zn = jnp.zeros((P,), dtype), jnp.zeros((Nn,), dtype)
        _, dj_eta_p = jax.jvp(jfun_p, (zp,), (jnp.ones((P,), dtype),))
        _, dj_eta_n = jax.jvp(jfun_n, (zn,), (jnp.ones((Nn,), dtype),))

        vals = {}
        diag_j_n = -jnp.ones((Nn,), dtype)
        if "R_film_n" in th:
            diag_j_n = diag_j_n + dj_eta_n * (-F * th["R_film_n"])
        vals["j_diag"] = jnp.concatenate([-jnp.ones((P,), dtype), diag_j_n])
        vals["j_ps"] = jnp.concatenate([dj_eta_p, dj_eta_n])
        vals["j_pe"] = -vals["j_ps"]
        vals["pe_pe_up"] = -ke_d
        vals["pe_pe_lo"] = -ke_d
        vals["pe_pe_di"] = (jnp.concatenate([ke_d, z1])
                            + jnp.concatenate([z1, ke_d])).at[-1].set(1.0)
        el = np.concatenate([np.arange(P), P + S + np.arange(Nn)])
        vals["pe_j"] = -(h * F * a_cells)[jnp.asarray(el)]
        ones_lo = jnp.ones((P - 1 + Nn - 1,), dtype)
        vals["ps_lo"] = ones_lo
        vals["ps_up"] = ones_lo
        vals["ps_di"] = jnp.concatenate([
            -jnp.concatenate([jnp.ones((1,), dtype),
                              2.0 * jnp.ones((P - 2,), dtype),
                              jnp.ones((1,), dtype)]),
            -jnp.concatenate([jnp.ones((1,), dtype),
                              2.0 * jnp.ones((Nn - 2,), dtype),
                              jnp.ones((1,), dtype)])])
        h_p = th["l_p"] / P
        h_n = th["l_n"] / Nn
        vals["ps_j"] = jnp.concatenate([
            jnp.broadcast_to(-h_p**2 * a_p * F / sig_p, (P,)).astype(dtype),
            jnp.broadcast_to(-h_n**2 * a_n * F / sig_n, (Nn,)).astype(dtype)])
        vals["ps_I"] = jnp.stack([(h_p * I1C / sig_p).astype(dtype),
                                  (-h_n * I1C / sig_n).astype(dtype)])

        flat = jnp.concatenate([vals[name].reshape(-1)
                                for name in self._alg_names])
        J = jnp.zeros((n_alg, n_alg), dtype)
        J = J.at[jnp.asarray(self._alg_rr),
                 jnp.asarray(self._alg_cc)].add(
            flat * jnp.asarray(self._alg_mask, dtype))
        return J

    def compressed(self, t, y, c0, th, g):
        """(JS, last): analytic physics rows + exact reverse-mode control
        row. `g` is the composed map y ↦ F(t, y, c0·y + const) (used for the
        control row only)."""
        cfg, N = self.cfg, self.cfg.N
        num = cfg.numerics
        ix = self.idx
        P, S, Nn, n_ce = ix["P"], ix["S"], ix["Nn"], ix["n_ce"]
        dtype = y.dtype
        L = cfg.layout

        c_e = L.get(y, "c_e")
        j = L.get(y, "j")
        Phi_e = L.get(y, "Phi_e")
        c_star_p = y[..., ix["surf_p"]]
        c_star_n = y[..., ix["surf_n"]]

        T0 = th["T0"]
        T_p = jnp.full((P,), T0, dtype)
        T_s = jnp.full((S,), T0, dtype)
        T_n = jnp.full((Nn,), T0, dtype)

        eps_sp = 1.0 - (th["eps_fp"] + th["eps_p"])
        eps_sn = 1.0 - (th["eps_fn"] + th["eps_n"])
        a_p = 3.0 * eps_sp / th["Rp_p"]
        a_n = 3.0 * eps_sn / th["Rp_n"]
        sig_p = th["sigma_p"] * eps_sp
        sig_n = th["sigma_n"] * eps_sn
        porosity = jnp.concatenate([
            jnp.broadcast_to(th["eps_p"], (P,)).astype(dtype),
            jnp.broadcast_to(th["eps_s"], (S,)).astype(dtype),
            jnp.broadcast_to(th["eps_n"], (Nn,)).astype(dtype)])
        a_cells = jnp.concatenate([
            jnp.broadcast_to(a_p, (P,)).astype(dtype),
            jnp.zeros((S,), dtype),
            jnp.broadcast_to(a_n, (Nn,)).astype(dtype)])
        I1C = calc_I1C(th)

        # grid metrics
        h = jnp.concatenate([
            jnp.full((P,), th["l_p"] / P, dtype),
            jnp.full((S,), th["l_s"] / S, dtype),
            jnp.full((Nn,), th["l_n"] / Nn, dtype)])
        d_edge = 0.5 * (h[:-1] + h[1:])
        beta = h[:-1] / (h[:-1] + h[1:])

        # ---- transport closures + elementwise derivatives (one jvp each) --
        def split3(c):
            return c[:P], c[P:P + S], c[P + S:]

        def D_fn(c):
            return jnp.concatenate(num.D_eff(*split3(c), T_p, T_s, T_n, th))

        def K_fn(c):
            return jnp.concatenate(num.K_eff(*split3(c), T_p, T_s, T_n, th))

        def nu_fn(c):
            return jnp.concatenate(num.thermodynamic_factor(
                *split3(c), T_p, T_s, T_n, th))

        ones_ce = jnp.ones_like(c_e)
        D_cell, dD_cell = jax.jvp(D_fn, (c_e,), (ones_ce,))
        K_cell, dK_cell = jax.jvp(K_fn, (c_e,), (ones_ce,))
        nu_cell, dnu_cell = jax.jvp(nu_fn, (c_e,), (ones_ce,))

        def harm(x):
            return x[:-1] * x[1:] / (beta * x[1:] + (1.0 - beta) * x[:-1])

        def dharm(x):
            """(∂H/∂x_left, ∂H/∂x_right) per edge."""
            M = beta * x[1:] + (1.0 - beta) * x[:-1]
            return beta * x[1:] ** 2 / M**2, (1.0 - beta) * x[:-1] ** 2 / M**2

        D_edge = harm(D_cell)
        dDe_l, dDe_r = dharm(D_cell)           # wrt D of the cells
        K_edge = harm(K_cell)
        dKe_l, dKe_r = dharm(K_cell)
        ce_edge = harm(c_e)
        dce_l, dce_r = dharm(c_e)
        T_edge = harm(jnp.concatenate([T_p, T_s, T_n]))

        gc = (c_e[1:] - c_e[:-1]) / d_edge
        gPhi = (Phi_e[1:] - Phi_e[:-1]) / d_edge

        vals = {}

        # ---- c_e rows -------------------------------------------------------
        # flux_e = De_e·gc_e; res_i = [(fr−fl)/h_i + src_i]/eps_i − c0·δ
        # ∂flux_e/∂c_e(left)  = dDe_l·D'_l·gc − De/d
        # ∂flux_e/∂c_e(right) = dDe_r·D'_r·gc + De/d
        dfl = dDe_l * dD_cell[:-1] * gc - D_edge / d_edge
        dfr = dDe_r * dD_cell[1:] * gc + D_edge / d_edge
        z1 = jnp.zeros((1,), dtype)
        # row i: (∂fr_i/∂c_k − ∂fl_{i−1}/∂c_k)/(h_i·eps_i)
        inv_he = 1.0 / (h * porosity)
        vals["ce_up"] = dfr * inv_he[:-1]                    # col i+1, row i
        vals["ce_lo"] = -dfl * inv_he[1:]                    # col i−1, row i
        diag_flux = (jnp.concatenate([dfl, z1])              # ∂fr_i/∂c_i
                     - jnp.concatenate([z1, dfr])) * inv_he  # −∂fl_{i−1}/∂c_i
        # src_i = (1−t+)·ν_i·a_i·j_i → ν' diagonal term
        j_cells = jnp.concatenate([j[:P], jnp.zeros((S,), dtype), j[P:]])
        diag_src = (1.0 - th["t_plus"]) * dnu_cell * a_cells * j_cells \
            / porosity
        vals["ce_di"] = diag_flux + diag_src - c0
        el = np.concatenate([np.arange(P), P + S + np.arange(Nn)])
        vals["ce_j"] = ((1.0 - th["t_plus"]) * nu_cell * a_cells
                        / porosity)[jnp.asarray(el)]

        # ---- c_s particle blocks -------------------------------------------
        D_s_p, D_s_n = num.D_s_eff(c_star_p, c_star_n, T_p, T_n, th)
        A0p = jnp.asarray(self.A0_p, dtype)
        A0n = jnp.asarray(self.A0_n, dtype)
        rp, rn = N.r_p, N.r_n
        eye_p = jnp.eye(rp, dtype=dtype)
        eye_n = jnp.eye(rn, dtype=dtype)
        blk_p = (D_s_p / th["Rp_p"] ** 2)[:, None, None] * A0p[None] \
            - c0 * eye_p[None]
        blk_n = (D_s_n / th["Rp_n"] ** 2)[:, None, None] * A0n[None] \
            - c0 * eye_n[None]
        vals["cs_blk_p"] = blk_p.reshape(P, rp * rp)
        vals["cs_blk_n"] = blk_n.reshape(Nn, rn * rn)
        bjp = jnp.asarray(self.bj_p, dtype) / th["Rp_p"]
        bjn = jnp.asarray(self.bj_n, dtype) / th["Rp_n"]
        vals["cs_j_p"] = jnp.broadcast_to(bjp[None, :], (P, rp))
        vals["cs_j_n"] = jnp.broadcast_to(bjn[None, :], (Nn, rn))
        if self.ds_dep:
            # ∂rhs/∂c_surf via D_s: (rhs − b_j·j)/D_s · dD_s/dc_surf
            from ..physics.residuals import _fickian_rhs, _spectral_rhs
            radial = (_fickian_rhs
                      if num.Fickian_method == "finite_difference"
                      else _spectral_rhs)

            def ds_fn(csp, csn):
                dp, dn = num.D_s_eff(csp, csn, T_p, T_n, th)
                return dp, dn

            dDs_p = jax.jvp(lambda c: ds_fn(c, c_star_n)[0],
                            (c_star_p,), (jnp.ones_like(c_star_p),))[1]
            dDs_n = jax.jvp(lambda c: ds_fn(c_star_p, c)[1],
                            (c_star_n,), (jnp.ones_like(c_star_n),))[1]
            rhs_p = radial(L.get(y, "c_s_avg", "p"), j[:P], th["Rp_p"],
                           D_s_p, P, rp).reshape(P, rp)
            rhs_n = radial(L.get(y, "c_s_avg", "n"), j[P:], th["Rp_n"],
                           D_s_n, Nn, rn).reshape(Nn, rn)
            col_p = (rhs_p - bjp[None, :] * j[:P, None]) / D_s_p[:, None]
            col_n = (rhs_n - bjn[None, :] * j[P:, None]) / D_s_n[:, None]
            vals["cs_ds_p"] = col_p * dDs_p[:, None]
            vals["cs_ds_n"] = col_n * dDs_n[:, None]

        # ---- j rows ---------------------------------------------------------
        lam_p = th.get("lambda_MHC_p", 0.0)
        lam_n = th.get("lambda_MHC_n", 0.0)
        ce_p = c_e[:P]
        ce_n = c_e[P + S:]
        Phi_s = L.get(y, "Phi_s")
        pe_p = Phi_e[:P]
        pe_n = Phi_e[P + S:]

        def jfun_p(cs, ce, eta_shift):
            kp, _ = num.rxn_rate(T_p, T_n, cs, c_star_n, th)
            U, _ = num.OCV_p(cs / th["c_max_p"], T_p, th)
            eta = Phi_s[:P] - pe_p - U + eta_shift
            return num.rxn_p(cs, ce, T_p, eta, kp, lam_p, th["c_max_p"], th)

        def jfun_n(cs, ce, eta_shift):
            _, kn = num.rxn_rate(T_p, T_n, c_star_p, cs, th)
            U, _ = num.OCV_n(cs / th["c_max_n"], T_n, th)
            eta = Phi_s[P:] - pe_n - U + eta_shift
            if "R_film_n" in th:
                eta = eta - j[P:] * F * th["R_film_n"]
            return num.rxn_n(cs, ce, T_n, eta, kn, lam_n, th["c_max_n"], th)

        zp = jnp.zeros((P,), dtype)
        zn = jnp.zeros((Nn,), dtype)
        op = jnp.ones((P,), dtype)
        on = jnp.ones((Nn,), dtype)
        _, dj_cs_p = jax.jvp(lambda c: jfun_p(c, ce_p, zp),
                             (c_star_p,), (op,))
        _, dj_cs_n = jax.jvp(lambda c: jfun_n(c, ce_n, zn),
                             (c_star_n,), (on,))
        _, dj_ce_p = jax.jvp(lambda c: jfun_p(c_star_p, c, zp),
                             (ce_p,), (op,))
        _, dj_ce_n = jax.jvp(lambda c: jfun_n(c_star_n, c, zn),
                             (ce_n,), (on,))
        _, dj_eta_p = jax.jvp(lambda s: jfun_p(c_star_p, ce_p, s),
                              (zp,), (op,))
        _, dj_eta_n = jax.jvp(lambda s: jfun_n(c_star_n, ce_n, s),
                              (zn,), (on,))
        diag_j_p = -jnp.ones((P,), dtype)
        diag_j_n = -jnp.ones((Nn,), dtype)
        if "R_film_n" in th:
            diag_j_n = diag_j_n + dj_eta_n * (-F * th["R_film_n"])
        vals["j_diag"] = jnp.concatenate([diag_j_p, diag_j_n])
        vals["j_cs"] = jnp.concatenate([dj_cs_p, dj_cs_n])
        vals["j_ce"] = jnp.concatenate([dj_ce_p, dj_ce_n])
        vals["j_ps"] = jnp.concatenate([dj_eta_p, dj_eta_n])
        vals["j_pe"] = -jnp.concatenate([dj_eta_p, dj_eta_n])

        # ---- Φ_e rows -------------------------------------------------------
        # res_i = −(fr−fl) − f_i ;  f_i = −Kfac_i·(pr−pl) + h·F·a·j
        # prod_e = Ke·Te·gc/ce
        prod = K_edge * T_edge * gc / ce_edge
        Kfac = 2.0 * R * (1.0 - th["t_plus"]) * nu_cell / F
        dKfac = 2.0 * R * (1.0 - th["t_plus"]) * dnu_cell / F
        # Φ_e tridiag: ∂(−(fr−fl))/∂Φ
        ke_d = K_edge / d_edge
        vals["pe_pe_up"] = -ke_d
        vals["pe_pe_lo"] = -ke_d
        vals["pe_pe_di"] = (jnp.concatenate([ke_d, z1])
                            + jnp.concatenate([z1, ke_d]))
        # c_e coupling: through Ke in the flux, and through f's prod/Kfac
        # ∂prod_e/∂c_left and /∂c_right:
        com = T_edge / ce_edge
        dp_l = (dKe_l * dK_cell[:-1] * gc * com
                - K_edge * com / d_edge
                - K_edge * T_edge * gc / ce_edge**2 * dce_l)
        dp_r = (dKe_r * dK_cell[1:] * gc * com
                + K_edge * com / d_edge
                - K_edge * T_edge * gc / ce_edge**2 * dce_r)
        # flux-K terms: ∂fr/∂c = dKe·K'·gPhi
        dfK_l = dKe_l * dK_cell[:-1] * gPhi
        dfK_r = dKe_r * dK_cell[1:] * gPhi
        # row i: −(∂fr_i − ∂fl_{i−1}) + Kfac_i·(∂pr_i − ∂pl_{i−1})
        #        + dKfac_i·(pr_i − pl_{i−1})·δ_{k,i}
        vals["pe_ce_up"] = -dfK_r + Kfac[:-1] * dp_r
        vals["pe_ce_lo"] = dfK_l - Kfac[1:] * dp_l
        dprod_i = (jnp.concatenate([prod, z1])
                   - jnp.concatenate([z1, prod]))
        pe_diag = (-(jnp.concatenate([dfK_l, z1])
                     - jnp.concatenate([z1, dfK_r]))
                   + Kfac * (jnp.concatenate([dp_l, z1])
                             - jnp.concatenate([z1, dp_r]))
                   + dKfac * dprod_i)
        # ground row Φ_e[end] = 0 (residuals.jl:586): its only pattern entry
        # is the Φ_e diagonal, which must be exactly 1; every other write
        # landing on that row is zeroed by the pattern mask.
        vals["pe_pe_di"] = vals["pe_pe_di"].at[-1].set(1.0)
        vals["pe_ce_di"] = pe_diag
        # j column: −∂f/∂j = −h·F·a
        vals["pe_j"] = -(h * F * a_cells)[jnp.asarray(el)]

        # ---- Φ_s rows -------------------------------------------------------
        ones_lo = jnp.ones((P - 1 + Nn - 1,), dtype)
        vals["ps_lo"] = ones_lo
        vals["ps_up"] = ones_lo
        di = jnp.concatenate([
            -jnp.concatenate([jnp.ones((1,), dtype),
                              2.0 * jnp.ones((P - 2,), dtype),
                              jnp.ones((1,), dtype)]),
            -jnp.concatenate([jnp.ones((1,), dtype),
                              2.0 * jnp.ones((Nn - 2,), dtype),
                              jnp.ones((1,), dtype)])])
        vals["ps_di"] = di
        h_p = th["l_p"] / P
        h_n = th["l_n"] / Nn
        vals["ps_j"] = jnp.concatenate([
            jnp.broadcast_to(-h_p**2 * a_p * F / sig_p, (P,)).astype(dtype),
            jnp.broadcast_to(-h_n**2 * a_n * F / sig_n, (Nn,)).astype(dtype)])
        vals["ps_I"] = jnp.stack([(h_p * I1C / sig_p).astype(dtype),
                                  (-h_n * I1C / sig_n).astype(dtype)])

        # ---- assemble -------------------------------------------------------
        flat = jnp.concatenate([vals[name].reshape(-1)
                                for name in self._names])
        JS = jnp.zeros((self._n_colors, self.n), dtype)
        JS = JS.at[jnp.asarray(self._cc_color),
                   jnp.asarray(self._rr)].add(
            flat * jnp.asarray(self._mask, dtype))
        last = jax.grad(lambda yy: g(yy)[-1])(y)
        return JS, last
