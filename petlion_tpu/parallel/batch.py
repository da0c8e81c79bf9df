"""Batched (data-parallel) simulation over cells.

The TPU-native answer to the reference's manual parameter-sweep loops
(examples/updating_parameters.ipynb, examples/GITT.ipynb): the whole run —
consistent init, adaptive BDF stepping with per-cell step size/order, event
handling, output recording — is one pure function, so a fleet of cells is
just `vmap`, and multi-chip scale-out is a `NamedSharding` over the batch
axis of a `jax.sharding.Mesh`. There is no cross-cell coupling, so XLA
inserts zero collectives in the hot loop; ICI traffic appears only in user
reductions (e.g. parameter-estimation losses).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimOptions
from ..physics.initial_guess import initial_guess
from ..physics.residuals import ModelConfig
from ..sim import Model, default_dtype, _build_control
from ..solver import events
from ..solver.run import run_once


def _in_axes_for(th, th_batched_keys):
    return {k: (0 if k in th_batched_keys else None) for k in th}


@partial(jax.jit, static_argnames=("cfg", "spec", "opts", "is_rest",
                                   "is_temperature_hold", "th_axes",
                                   "bound_axes", "value_axis", "soc_axis",
                                   "jac_plan", "tstops_axis"))
def _batch_core(y_start, soc0, value, tf, th, bounds, tstops=None,
                cfg=None, spec=None, opts=None, is_rest=False,
                is_temperature_hold=False,
                th_axes=(), bound_axes=(), value_axis=None, soc_axis=None,
                jac_plan=None, tstops_axis=None):
    def one(y0, soc, val, th_, bd_, ts_):
        return run_once(y_start=y0, soc0=soc, value=val, tf=tf, th=th_,
                        bounds=bd_, cfg=cfg, spec=spec, opts=opts,
                        is_rest=is_rest,
                        is_temperature_hold=is_temperature_hold,
                        jac_plan=jac_plan, tstops=ts_)

    in_axes = (0, soc_axis, value_axis, dict(th_axes), dict(bound_axes),
               tstops_axis)
    return jax.vmap(one, in_axes=in_axes)(y_start, soc0, value, th, bounds,
                                          tstops)


def _prepare_batch(p: Model, tf, *, n_cells=None, theta_batch=None, SOC=None,
                   value_batch=None, mesh=None, axis_name="cells",
                   fast_solver=True, **kwargs):
    """Build the (dynamic args, static kwargs) pair for `_batch_core`."""
    dtype = default_dtype()
    th = p._theta_dev(dtype)
    th_axes = {}
    if theta_batch:
        sizes = {np.shape(v)[0] for v in theta_batch.values()}
        assert len(sizes) == 1, "inconsistent batch sizes in theta_batch"
        B = sizes.pop()
        for k, v in theta_batch.items():
            th[k] = jnp.asarray(v, dtype)
        th_axes = frozenset(theta_batch.keys())
    else:
        assert n_cells is not None, "need n_cells or theta_batch"
        B = n_cells
    th_axes_t = tuple(sorted((k, 0 if k in th_axes else None) for k in th))

    # explicit per-run stop times (reference postfix_integrator!,
    # model_evaluation.jl:288-310). Each accepts a shared (K,) list/array or
    # a per-cell (B, K) array — e.g. per-cell GITT pulse schedules. Rows may
    # be padded with np.inf (inf stops never fire). `tdiscon` entries are
    # shifted to just before the discontinuity (− reltol/2, sim.py
    # semantics) so the control-jump probe fires and re-initializes.
    tstops_in = kwargs.pop("tstops", None)
    tdiscon_in = kwargs.pop("tdiscon", None)

    bdict = events.bounds_dict(p.bounds)
    from ..sim import _BOUND_KEYS
    for k in _BOUND_KEYS:
        if k in kwargs:
            bdict[k] = kwargs.pop(k)
    bound_axes_t = tuple(sorted(
        (k, 0 if np.ndim(v) > 0 else None) for k, v in bdict.items()))
    bdict = {k: jnp.asarray(v, dtype) for k, v in bdict.items()}

    opts = p.opts
    from ..sim import _OPT_KEYS
    overrides = {k: kwargs.pop(k) for k in list(kwargs) if k in _OPT_KEYS}
    if "outputs" in overrides:
        o = overrides["outputs"]
        overrides["outputs"] = (o,) if isinstance(o, str) else tuple(o)
    if overrides:
        opts = opts.replace(**overrides)

    name, spec, value, is_rest, is_th = _build_control(p, None, kwargs)
    if kwargs:
        raise TypeError(f"unknown keyword arguments: {sorted(kwargs)}")

    ts_parts = []
    if tstops_in is not None:
        ts_parts.append(jnp.atleast_1d(jnp.asarray(tstops_in, dtype)))
    if tdiscon_in is not None:
        ts_parts.append(jnp.atleast_1d(jnp.asarray(tdiscon_in, dtype))
                        - opts.reltol / 2)
    tstops, tstops_axis = None, None
    if ts_parts:
        ndim = max(a.ndim for a in ts_parts)
        if ndim == 2:
            ts_parts = [a if a.ndim == 2
                        else jnp.broadcast_to(a, (B,) + a.shape)
                        for a in ts_parts]
            tstops_axis = 0
        tstops = jnp.concatenate(ts_parts, axis=-1)
        if tstops.ndim == 2:
            assert tstops.shape[0] == B, (tstops.shape, B)

    if value_batch is not None:
        value = jnp.asarray(value_batch, dtype)
        value_axis = 0
    else:
        value = jnp.asarray(value, dtype)
        value_axis = None

    soc0 = jnp.asarray(p.opts.SOC if SOC is None else SOC, dtype)
    soc_axis = 0 if soc0.ndim > 0 else None

    # per-cell initial guesses (vmapped over batched θ leaves)
    def guess(th_, soc_):
        return initial_guess(soc_, th_, p.cfg, dtype)

    th_in_axes = {k: (0 if k in th_axes else None) for k in th}
    soc_b = soc0 if soc_axis == 0 else jnp.broadcast_to(soc0, (B,))
    y_start = jax.vmap(guess, in_axes=(th_in_axes, 0))(th, soc_b)

    if mesh is not None:
        shard = NamedSharding(mesh, P(axis_name))
        y_start = jax.device_put(y_start, shard)
        th = {k: (jax.device_put(v, shard) if k in th_axes else v)
              for k, v in th.items()}
        if value_axis == 0:
            value = jax.device_put(value, shard)

    jac_plan = None
    if fast_solver:
        from ..ops.plan import get_plan
        jac_plan = get_plan(p.cfg, p.theta)
    args = (y_start, soc_b, value, jnp.asarray(tf, dtype), th, bdict, tstops)
    statics = dict(cfg=p.cfg, spec=spec, opts=opts, is_rest=is_rest,
                   is_temperature_hold=is_th, th_axes=th_axes_t,
                   bound_axes=bound_axes_t, value_axis=value_axis,
                   soc_axis=0, jac_plan=jac_plan, tstops_axis=tstops_axis)
    return args, statics


def batch_simulate(p: Model,
                   tf: float = 1e6,
                   *,
                   n_cells: Optional[int] = None,
                   theta_batch: Optional[dict] = None,
                   SOC=None,
                   value_batch=None,
                   mesh: Optional[Mesh] = None,
                   axis_name: str = "cells",
                   fast_solver: bool = True,
                   **kwargs):
    """Run the same control segment over a batch of cells.

    theta_batch: dict of θ overrides with a leading batch dim (other θ keys
    broadcast). SOC / value_batch may be scalars or (B,) arrays. With `mesh`,
    the batch axis is sharded over the mesh's `axis_name` dimension (pure DP
    over ICI).

    Returns the device-side RunResultDev with a leading batch axis.
    """
    args, statics = _prepare_batch(
        p, tf, n_cells=n_cells, theta_batch=theta_batch, SOC=SOC,
        value_batch=value_batch, mesh=mesh, axis_name=axis_name,
        fast_solver=fast_solver, **kwargs)
    return _batch_core(*args, **statics)


def batch_cost_analysis(p: Model, tf: float = 1e6, **kwargs) -> dict:
    """XLA cost analysis of the compiled batched run (auditable perf claims).

    Returns the compiler's static operation counts (`flops`, bytes accessed,
    ...) for ONE trip through each `while_loop` body — i.e. approximately the
    cost of a single BDF step *attempt* with one Newton iteration, for the
    whole batch. Multiply by measured step attempts to estimate total work
    (the loops' trip counts are dynamic, so XLA cannot count them statically).
    """
    args, statics = _prepare_batch(p, tf, **kwargs)
    compiled = _batch_core.lower(*args, **statics).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):   # older jax returns [dict]
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def make_cell_mesh(axis_name: str = "cells", devices=None) -> Mesh:
    """1-D device mesh over all (or given) devices for DP over cells."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))
