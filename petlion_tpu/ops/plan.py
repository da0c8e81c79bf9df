"""Jacobian/solver plan: sparsity detection + coloring + structured solve.

Created once per model config (host-side, CPU, f64), then passed as a static
argument into the jitted run — the TPU analogue of the reference's offline
symbolic codegen + sparsity caching (generate_functions.jl:102-164, the
`saved_models/` disk cache): here the XLA compilation cache plays the role of
the disk cache and the plan holds only the static index/coloring metadata.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..physics.initial_guess import initial_guess
from ..physics.residuals import ModelConfig, residual_core
from .jacobian import ColoredJacobian, detect_sparsity
from .structured import make_split


class JacobianPlan:
    """Hashable-by-identity bundle: coloring + structured factor/solve."""

    def __init__(self, cfg: ModelConfig, pattern: np.ndarray,
                 use_schur: bool = True, theta_sample: dict | None = None):
        self.cfg = cfg
        # the control (last) row is computed exactly by one reverse-mode pass
        # and excluded from the coloring, so declaring it dense costs nothing
        # — and it MUST be dense: user control functions / derivative holds
        # may touch any state, including eliminated ones (dc_s_*, dc_e),
        # which a detected-only pattern would mask out of the Newton matrix.
        pattern = pattern.copy()
        pattern[-1, :] = True
        self.colored = ColoredJacobian(pattern)
        self.use_schur = use_schur
        # analytic (closed-form) Jacobian assembly replacing the colored JVP
        # sweeps where the structural closed forms cover the pattern
        # (ops/analytic.py). PETLION_JACA: "1" (default) = on when supported,
        # "0" = always colored sweeps. Correctness is pinned by
        # tests/test_analytic.py (analytic == colored at 1e-12 in f64).
        self.analytic = None
        import os as _os
        if _os.environ.get("PETLION_JACA", "1") != "0" and use_schur:
            from . import analytic as _analytic
            if _analytic.AnalyticJacobian.supports(cfg) \
                    and theta_sample is not None:
                try:
                    self.analytic = _analytic.AnalyticJacobian(
                        cfg, self.colored, theta_sample)
                except _analytic.Unsupported:
                    self.analytic = None
        if use_schur:
            from ..solver import linsolve
            from .structured import (SparseSchur, SparseSchurP,
                                     make_group_split,
                                     make_sparse_specs, sparse_schur_factor,
                                     sparse_schur_solve)
            self.split = make_group_split(cfg.layout, pattern)
            # nested in-core elimination levels (j, then Φ_s): core 71 -> 31
            # on the default mesh. PETLION_NESTED: "1" = both, "j" = j only,
            # "0" (default) = off. Hardware A/B (measurements_r04/
            # ab_head_n0.log, in-process paired, 8 blocks): nesting is a
            # 3-4% LOSS on a real v5e chip (head_over_n0 = 0.966, all 8
            # block ratios ≤ 1.0) and roughly doubles remote compile time
            # (BENCH_r03 227.5 s vs r02 111.7 s) — the shrunken 31³ core GJ
            # does not pay for the two extra 20×20 equilibrated inverses +
            # their solve traffic at this batch shape. Kept as an opt-in
            # (correctness pinned by test_structured) for future meshes
            # where the core is larger.
            import os
            _nest = os.environ.get("PETLION_NESTED", "0")
            families = {"1": ("j", "Phi_s"), "j": ("j",), "0": ()}.get(
                _nest, ())
            self._specs = make_sparse_specs(self.colored, self.split,
                                            cfg.layout, families)
            colored, specs, split = self.colored, self._specs, self.split

            def solve(fac, b):
                if not isinstance(fac, (SparseSchur, SparseSchurP)):
                    # f32 thermal fallback factorization (see
                    # factor_compressed): pivoted dense LU + refinement
                    return linsolve.refined_lu_solve(fac, b)
                return sparse_schur_solve(fac, b, specs, split)

            self.factor = None  # compressed-only path
            self.solve = solve
            self._sparse_factor = sparse_schur_factor
        else:
            from ..solver import linsolve
            self.split = make_split(cfg.layout)
            self.factor = linsolve.equilibrated_factor
            self.solve = linsolve.equilibrated_solve
            self._specs = None

    def _alg_meta(self):
        """Static metadata for the algebraic-block colored Jacobian
        (consistent initialization, reference newtons_method!
        model_evaluation.jl:430-480). Computed lazily once."""
        if getattr(self, "_alg_cache", None) is None:
            nd = self.cfg.layout.N_diff
            n = self.colored.n
            cols = np.arange(nd, n)
            used = np.unique(self.colored.colors[cols])
            remap = -np.ones(self.colored.n_colors, np.int64)
            remap[used] = np.arange(len(used))
            colors_alg = remap[self.colored.colors[cols]]
            # rows of alg_res = [F rows nd..n-2, substituted control row];
            # the control row is reconstructed exactly by reverse-mode, so
            # its mask row is zero here
            mask = np.zeros((n - nd, n - nd))
            mask[:-1, :] = self.colored.pattern[nd:n - 1, nd:]
            seeds_alg = self.colored._seeds[used][:, nd:]
            self._alg_cache = (nd, np.asarray(colors_alg), mask, seeds_alg)
        return self._alg_cache

    def factor_alg(self, alg_res_fn, y_alg, y_diff, th=None):
        """Colored Jacobian + equilibrated inverse of the algebraic block.

        Replaces the dense jacfwd in `consistent_init` (n_alg JVP sweeps)
        with the plan's column coloring (~n_colors sweeps) — on the default
        LCO mesh 71 → 10 residual sweeps per Newton iteration; the init was
        ~27% of a full batched discharge before this. With an analytic
        assembler (ops/analytic.py) the sweeps disappear entirely: the
        algebraic block is closed-form + one kinetics jvp, and only the
        substituted control row keeps its exact reverse-mode pass.
        """
        import jax as _jax
        from ..solver import linsolve
        if self.analytic is not None and th is not None:
            J = self.analytic.alg_block(
                jnp.concatenate([y_diff, y_alg]), th)
            last = _jax.grad(lambda ya: alg_res_fn(ya, y_diff)[-1])(y_alg)
            J = J.at[-1, :].set(last)
            return linsolve.equilibrated_inv_factor(J)
        nd, colors_alg, mask, seeds_alg = self._alg_meta()
        dtype = y_alg.dtype
        seeds = jnp.asarray(seeds_alg, dtype)

        def jvp_one(s):
            return _jax.jvp(lambda ya: alg_res_fn(ya, y_diff),
                            (y_alg,), (s,))[1]

        JS = _jax.vmap(jvp_one)(seeds)               # (n_used, n_alg)
        J = (JS[jnp.asarray(colors_alg), :].T        # J[i,j]=JS[color[j],i]
             * jnp.asarray(mask, dtype))
        last = _jax.grad(lambda ya: alg_res_fn(ya, y_diff)[-1])(y_alg)
        J = J.at[-1, :].set(last)
        if (dtype == jnp.float32
                and getattr(self.cfg.numerics, "temperature", False)):
            # same conditioning story as factor_compressed: the algebraic
            # block with a derivative-hold control row needs pivoting +
            # refinement in f32 (equilibrated_inv_solve dispatches on type)
            return linsolve.refined_lu_factor(J)
        return linsolve.equilibrated_inv_factor(J)

    def factor_compressed(self, g, y, t=None, c0=None, th=None):
        """Jacobian + factorization straight from the colored JVP sweeps —
        neither the dense (N,N) matrix nor the (n_cs × n_core) coupling
        blocks are ever materialized.

        f32 + temperature routes to the pivoted dense LU of the colored
        matrix instead: measured cond(J) on thermal protocols reaches
        1e14-1e16 (the dT-hold control row is nearly linearly dependent on
        the T rows), where pivot-free elimination in single precision
        produces O(10) relative solve error while the pivoted LU of the
        SAME matrix stays at ~1e-5 — the f32 analogue of the reference
        leaning on KLU's pivoting (scalar_residual.jl:489-499). The branch
        is static (dtype is fixed at trace time), so isothermal f32 and all
        f64 keep the Schur fast path with zero overhead."""
        if self._specs is None:
            return self.factor(self.colored(g, y))
        if (y.dtype == jnp.float32
                and getattr(self.cfg.numerics, "temperature", False)):
            from ..solver import linsolve
            return linsolve.refined_lu_factor(self.colored(g, y))
        if self.analytic is not None and th is not None and c0 is not None:
            JS, last = self.analytic.compressed(t, y, c0, th, g)
        else:
            JS, last = self.colored.compressed(g, y)
        return self._sparse_factor(JS, last, self.colored, self._specs,
                                   self.split)

    @property
    def n_colors(self):
        return self.colored.n_colors


_PLAN_CACHE: dict = {}


def get_plan(cfg: ModelConfig, theta: dict, use_schur: bool = True,
             use_colors: bool = True) -> JacobianPlan:
    key = (cfg, tuple(sorted(theta.keys())), use_schur)
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]

    cpu = jax.local_devices(backend="cpu")[0]
    # sample in the active precision: requesting f64 with x64 disabled would
    # silently truncate AND spray dtype warnings into every f32 bench log —
    # pattern detection only needs structural nonzeros, so f32 is sufficient
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    with jax.default_device(cpu):
        th = {k: jnp.asarray(float(v), f64) for k, v in theta.items()}
        L = cfg.layout
        rng = np.random.default_rng(7)

        def sample(soc, i_val, seed):
            y = np.asarray(initial_guess(soc, th, cfg, f64)).copy()
            r = np.random.default_rng(seed)
            y *= (1.0 + 0.05 * r.standard_normal(y.shape))
            # keep strictly positive concentrations, generic potentials
            y[L.sl("Phi_e")] = 0.01 * r.standard_normal(
                y[L.sl("Phi_e")].shape)
            y[L.sl("j")] = 1e-6 * r.standard_normal(y[L.sl("j")].shape)
            if "T" in L:   # T state is an offset from T_amb, may start at 0
                y[L.sl("T")] = y[L.sl("T")] + 2.0 * r.standard_normal(
                    y[L.sl("T")].shape)
            if "j_s" in L:
                y[L.sl("j_s")] = -1e-7 * r.random(y[L.sl("j_s")].shape)
            if "film" in L:
                y[L.sl("film")] = 1e-9 * r.random(y[L.sl("film")].shape)
            y[L.sl("I").start] = i_val
            yp = 1e-3 * r.standard_normal(y.shape)
            return jnp.asarray(y), jnp.asarray(yp)

        ys, yps, ts = [], [], []
        for soc, ival, seed, t in ((0.41, 0.7, 1, 13.7), (0.83, -0.6, 2, 507.1)):
            y, yp = sample(soc, ival, seed)
            ys.append(y)
            yps.append(yp)
            ts.append(t)

        def F(t, y, yp):
            return residual_core(t, y, yp, th, cfg)

        pattern = detect_sparsity(F, ys, yps, ts, L.N_diff)

    plan = JacobianPlan(cfg, pattern, use_schur=use_schur,
                        theta_sample={k: float(v) for k, v in theta.items()
                                      if np.ndim(v) == 0})
    _PLAN_CACHE[key] = plan
    return plan
