"""Control modes — the scalar (last) DAE row.

Port of the reference's input-method machinery
(physics_equations/input_methods.jl, scalar_residual.jl:167-229): the last
DAE row pins the run's controlled quantity (current / voltage / power /
plating overpotential / arbitrary user residual) to its target.

A run is described by a static ``ControlSpec`` (method + optional traced
user function) plus a dynamic scalar ``value`` — so sweeping the setpoint
never retraces, matching the reference's `run.value[]` Ref.

The user function has signature ``f(t, y, yp, th) -> scalar`` (the reference
normalizes arities f(t) … f(t,Y,YP,p) via `redefine_func`,
scalar_residual.jl:248-274 — here `normalize_func` does the same by
inspection).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Callable, Optional

import jax.numpy as jnp

from ..physics.residuals import ModelConfig, calc_I1C

METHODS = ("I", "V", "P", "eta_p", "res")


def normalize_func(f: Callable) -> Callable:
    """Accept f(t), f(t,th), f(t,y,th), or f(t,y,yp,th) (reference
    redefine_func, scalar_residual.jl:248-274)."""
    try:
        n = len(inspect.signature(f).parameters)
    except (TypeError, ValueError):
        n = 4
    if n >= 4:
        return f
    if n == 3:
        return lambda t, y, yp, th: f(t, y, th)
    if n == 2:
        return lambda t, y, yp, th: f(t, th)
    if n == 1:
        return lambda t, y, yp, th: f(t)
    raise ValueError("control function needs at least one argument (t)")


@dataclasses.dataclass(frozen=True)
class ControlSpec:
    """Static description of one run's control mode.

    method: one of METHODS. func: optional time/state function whose output
    is the setpoint (run_function in the reference); for method="res" it IS
    the residual expression (run_residual).

    init_aux: optional per-run setup hook `f(y_start, th) -> array` whose
    result is injected into the θ dict as ``th["_ctrl_aux"]`` before any
    residual evaluation. Used by the derivative-hold modes (dc_s_*/dc_e_*)
    to select the extremal node from the run's *starting state* — on device,
    per cell, so batched cells hold different nodes (the reference picks the
    node on the host from the previous solution, input_methods.jl:191-247,
    which is single-cell-only)."""

    method: str
    func: Optional[Callable] = None
    init_aux: Optional[Callable] = None

    def __post_init__(self):
        assert self.method in METHODS, self.method


def control_value(spec: ControlSpec, value, t, y, yp, th):
    """The instantaneous setpoint of the run."""
    if spec.func is not None:
        return spec.func(t, y, yp, th)
    return value


def measured(spec: ControlSpec, y, th, cfg: ModelConfig):
    """The controlled quantity evaluated from the state (method_I/V/P/η_p,
    input_methods.jl:9,40,84,117)."""
    L = cfg.layout
    m = spec.method
    if m == "I":
        return L.I(y)
    if m == "V":
        return L.V(y)
    if m == "P":
        return L.I(y) * calc_I1C(th) * L.V(y)
    if m == "eta_p":
        return L.eta_plating(y)
    if m == "res":
        return jnp.zeros(())
    raise ValueError(m)


def scalar_residual(spec: ControlSpec, value, t, y, yp, th, cfg: ModelConfig):
    """res[end] = measured(Y) - setpoint (scalar_residual.jl:167-172).

    method "res" (run_residual): the row is `value - func(t,Y,YP,θ)`
    (custom_res! semantics, model_evaluation.jl:155-170) — used for the
    derivative-hold modes dT / dc_s_* / dc_e_* and arbitrary user residuals.
    """
    if spec.method == "res":
        return value - spec.func(t, y, yp, th)
    return measured(spec, y, th, cfg) - control_value(spec, value, t, y, yp, th)


def full_residual(spec: ControlSpec, value, t, y, yp, th, cfg: ModelConfig):
    """Physics residual with the control row filled in."""
    from ..physics.residuals import residual_core

    r = residual_core(t, y, yp, th, cfg)
    sr = scalar_residual(spec, value, t, y, yp, th, cfg)
    return r.at[-1].set(sr)
