"""Multi-segment protocols inside one jit — batched CC-CV, GITT, cycling.

The reference expresses protocols as host-side chaining (`simulate!` after
`simulate`, README.md:20-25). That works here too (sim.simulate_cont), but
for vmapped fleets the whole protocol must live on device so different cells
can switch segments at different *times* without host synchronization. This
module unrolls a static tuple of segment specs inside one jitted function:
each segment is a full run (consistent re-init → adaptive BDF → events), the
carry is (Y, SOC, prev_I), and `hold` setpoints are resolved on device from
the previous segment's final state (input_methods.jl `:hold` semantics).

Cells proceed through segment k in lockstep (idle-masked once they hit their
stop condition); across segments every cell uses its own carry state, so a
batched CC-CV sweep with per-cell switch times is exact.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimOptions
from ..physics.residuals import ModelConfig
from . import control as ctrl
from . import events
from .run import run_once


@dataclasses.dataclass(frozen=True)
class Segment:
    """Static description of one protocol segment.

    value_mode: "given" (use the dynamic value), "hold" (measure from the
    carry state), "rest" (0 current).
    """
    spec: ctrl.ControlSpec
    value_mode: str = "given"
    is_rest: bool = False
    is_temperature_hold: bool = False

    def __post_init__(self):
        assert self.value_mode in ("given", "hold", "rest")


def protocol_core(y_start, soc0, values, tfs, th, bounds_list,
                  cfg: ModelConfig, segments: Tuple[Segment, ...],
                  opts: SimOptions, jac_plan=None):
    """Run all segments sequentially on device.

    values: (R,) dynamic setpoints (ignored for hold/rest modes).
    tfs: (R,) segment durations. bounds_list: tuple of per-segment bounds
    dicts (dynamic scalars).
    Returns a list of RunResultDev (one per segment).
    """
    L = cfg.layout
    y = y_start
    soc = jnp.asarray(soc0, y_start.dtype)
    prev_I = jnp.asarray(0.0, y_start.dtype)
    has_prev = jnp.asarray(False)
    results = []
    for k, seg in enumerate(segments):
        if seg.value_mode == "hold":
            value = ctrl.measured(seg.spec, y, th, cfg)
        elif seg.value_mode == "rest":
            value = jnp.asarray(0.0, y_start.dtype)
        else:
            value = values[k]
        res = run_once(y_start=y, soc0=soc, value=value, tf=tfs[k], th=th,
                       bounds=bounds_list[k], cfg=cfg, spec=seg.spec,
                       opts=opts, is_rest=seg.is_rest,
                       is_temperature_hold=seg.is_temperature_hold,
                       prev_I=prev_I, has_prev=has_prev, jac_plan=jac_plan)
        results.append(res)
        y = res.y_final
        soc = res.soc_final
        prev_I = L.I(y)
        has_prev = jnp.asarray(True)
    return results


def build_segments(p, segment_dicts):
    """Host helper: turn user dicts into (segments, values, tfs, bounds_list).

    Each dict: one control key (I/V/P/eta_p/res/dT) whose value is a number,
    "hold", "rest", or a traceable function; optional "tf" (duration,
    default 1e6); optional bound overrides (V_max=..., SOC_min=..., ...).
    """
    from ..sim import _BOUND_KEYS, _build_control

    segments, values, tfs, bounds_list = [], [], [], []
    for d in segment_dicts:
        d = dict(d)
        tf = float(d.pop("tf", 1e6))
        bdict = events.bounds_dict(p.bounds)
        for k in _BOUND_KEYS:
            if k in d:
                bdict[k] = float(d.pop(k))
        # value_mode detection before _build_control (which needs a sol for
        # "hold"); substitute a numeric placeholder
        mode = "given"
        for mk in ("I", "V", "P", "eta_p", "dT", "T"):
            if mk in d and isinstance(d[mk], str):
                if d[mk] == "hold":
                    mode = "hold"
                    d[mk] = 1.0 if mk not in ("dT", "T") else "hold"
                elif d[mk] == "rest":
                    mode = "rest"
                    d[mk] = 0.0
        name, spec, value, is_rest, is_th = _build_control(p, None, d)
        if d:
            raise TypeError(f"unknown segment keys: {sorted(d)}")
        if mode == "hold" and spec.method == "res":
            mode = "given"   # dT hold: value 0 already encoded
        if mode == "rest":
            is_rest = spec.method == "I"
        segments.append(Segment(spec=spec, value_mode=mode, is_rest=is_rest,
                                is_temperature_hold=is_th))
        values.append(value if mode == "given" else 0.0)
        tfs.append(tf)
        bounds_list.append(bdict)
    return tuple(segments), values, tfs, tuple(bounds_list)


@partial(jax.jit, static_argnames=("cfg", "segments", "opts", "jac_plan"))
def _protocol_jit(y_start, soc0, values, tfs, th, bounds_list,
                  cfg, segments, opts, jac_plan):
    return protocol_core(y_start, soc0, values, tfs, th, bounds_list,
                         cfg, segments, opts, jac_plan)


@partial(jax.jit, static_argnames=("cfg", "segments", "opts", "jac_plan",
                                   "th_axes"))
def _protocol_batch_jit(y_start, soc0, values, tfs, th, bounds_list,
                        cfg, segments, opts, jac_plan, th_axes):
    def one(y0, soc, th_):
        return protocol_core(y0, soc, values, tfs, th_, bounds_list,
                             cfg, segments, opts, jac_plan)

    return jax.vmap(one, in_axes=(0, 0, dict(th_axes)))(y_start, soc0, th)
