"""User-facing protocol APIs: single-cell and batched multi-segment runs.

    sol = simulate_protocol(p, [
        dict(I=4, V_max=4.1, T_max=313.15),
        dict(dT="hold", V_max=4.1),
        dict(V="hold"),
    ], SOC=0.0)

runs the README's CC-CT-CV fast charge inside ONE jit. `batch_protocol`
vmaps the same protocol over a fleet of cells with per-cell θ (the
≥10⁴-cells GITT / parameter-sweep workload of BASELINE.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .physics.initial_guess import initial_guess
from .sim import Model, default_dtype
from .solution import Solution, exit_reason_string
from .solver.protocol import (_protocol_batch_jit, _protocol_jit,
                              build_segments)


def _prep(p: Model, segment_dicts, opts_overrides):
    from .sim import _OPT_KEYS
    opts = p.opts
    ov = {k: v for k, v in opts_overrides.items() if k in _OPT_KEYS}
    unknown = set(opts_overrides) - set(ov)
    if unknown:
        raise TypeError(f"unknown keyword arguments: {sorted(unknown)}")
    if "outputs" in ov:
        o = ov["outputs"]
        ov["outputs"] = (o,) if isinstance(o, str) else tuple(o)
    if ov:
        opts = opts.replace(**ov)
    segments, values, tfs, bounds_list = build_segments(p, segment_dicts)
    return opts, segments, values, tfs, bounds_list


def simulate_protocol(p: Model, segment_dicts, *, SOC: Optional[float] = None,
                      fast_solver: bool = True, dtype=None,
                      **opts_overrides) -> Solution:
    """Run a full multi-segment protocol in one jit; returns a Solution with
    one RunResult per segment."""
    dtype = default_dtype() if dtype is None else dtype
    th = p._theta_dev(dtype)
    opts, segments, values, tfs, bounds_list = _prep(p, segment_dicts,
                                                     opts_overrides)
    soc0 = jnp.asarray(p.opts.SOC if SOC is None else SOC, dtype)
    y0 = initial_guess(soc0, th, p.cfg, dtype)
    jac_plan = None
    if fast_solver:
        from .ops.plan import get_plan
        jac_plan = get_plan(p.cfg, p.theta)
    values = jnp.asarray(values, dtype)
    tfs = jnp.asarray(tfs, dtype)
    bounds_list = tuple({k: jnp.asarray(v, dtype) for k, v in b.items()}
                        for b in bounds_list)
    results = _protocol_jit(y0, soc0, values, tfs, th, bounds_list,
                            p.cfg, segments, opts, jac_plan)

    sol = Solution()
    t_offset = 0.0
    for k, (seg, res) in enumerate(zip(segments, results)):
        n_saved = int(res.n_saved)
        flag = int(res.flag)
        host_bufs = {kk: np.asarray(v) for kk, v in res.bufs.items()}
        meta = dict(
            method=seg.spec.method, input_repr=seg.value_mode,
            tspan=(t_offset, t_offset + float(res.t_final)),
            flag=flag, exit_reason=exit_reason_string(flag),
            n_steps=int(res.n_steps), n_rejected=int(res.n_rejected),
            init_converged=bool(res.init_converged),
            truncated=bool(res.truncated))
        # public Y_final carries absolute T [K] (reference-interchangeable);
        # the internal T-offset state is kept alongside for lossless
        # continuation (same convention as sim.simulate)
        y_final_ext = np.asarray(res.y_final)
        if p.numerics.temperature:
            sl_T = p.cfg.layout.sl("T")
            y_final_ext = y_final_ext.copy()
            y_final_ext[sl_T] += float(p.theta["T_amb"])
        sol.append_run(host_bufs, n_saved, t_offset, meta,
                       y_final_ext, res.yp_final, res.soc_final)
        if meta["truncated"]:
            import warnings
            warnings.warn(
                f"protocol segment {k} accepted {meta['n_steps']} steps but "
                f"max_save={opts.max_save} output slots: the recorded tail "
                f"was overwritten (raise max_save= to keep everything)")
        t_offset += float(res.t_final) + 1e-12
    sol._Y_final_int = np.asarray(results[-1].y_final)
    sol._outputs = opts.outputs
    return sol


def batch_protocol(p: Model, segment_dicts, *,
                   theta_batch: Optional[dict] = None,
                   n_cells: Optional[int] = None,
                   SOC=None, mesh=None, axis_name: str = "cells",
                   fast_solver: bool = True, dtype=None, **opts_overrides):
    """Vmapped protocol over a fleet of cells. Returns the raw per-segment
    RunResultDev list (leading batch axis) for zero-copy downstream use."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dtype = default_dtype() if dtype is None else dtype
    th = p._theta_dev(dtype)
    opts, segments, values, tfs, bounds_list = _prep(p, segment_dicts,
                                                     opts_overrides)
    th_axes = {}
    if theta_batch:
        sizes = {np.shape(v)[0] for v in theta_batch.values()}
        assert len(sizes) == 1
        B = sizes.pop()
        for k, v in theta_batch.items():
            th[k] = jnp.asarray(v, dtype)
            th_axes[k] = 0
    else:
        assert n_cells is not None
        B = n_cells
    th_axes_t = tuple(sorted({k: th_axes.get(k) for k in th}.items()))

    soc0 = jnp.asarray(p.opts.SOC if SOC is None else SOC, dtype)
    soc_b = soc0 if soc0.ndim > 0 else jnp.broadcast_to(soc0, (B,))

    def guess(th_, soc_):
        return initial_guess(soc_, th_, p.cfg, dtype)

    y0 = jax.vmap(guess, in_axes=({k: th_axes.get(k) for k in th}, 0))(
        th, soc_b)

    if mesh is not None:
        shard = NamedSharding(mesh, P(axis_name))
        y0 = jax.device_put(y0, shard)
        soc_b = jax.device_put(soc_b, shard)
        th = {k: (jax.device_put(v, shard) if k in th_axes else v)
              for k, v in th.items()}

    jac_plan = None
    if fast_solver:
        from .ops.plan import get_plan
        jac_plan = get_plan(p.cfg, p.theta)
    values = jnp.asarray(values, dtype)
    tfs = jnp.asarray(tfs, dtype)
    bounds_list = tuple({k: jnp.asarray(v, dtype) for k, v in b.items()}
                        for b in bounds_list)
    return _protocol_batch_jit(y0, soc_b, values, tfs, th, bounds_list,
                               p.cfg, segments, opts, jac_plan, th_axes_t)
