"""Stop conditions (bounds) with back-interpolation fractions.

Pure-functional port of checks.jl:1-224: each accepted step compares the
monitored quantities against their bounds; a crossing sets the exit flag and
records the linear interpolation fraction t_frac ∈ (0,1] locating the
crossing inside the step (used for the final-point back-interpolation,
model_evaluation.jl:369-382). Flag codes and the "smallest t_frac wins"
arbitration match the reference exactly.

All quantities are carried per-cell through the while_loop so a vmapped batch
gets independent event handling (different cells stop at different times).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EXIT_SIMULATING
from ..physics.residuals import ModelConfig


class BoundsPrev(NamedTuple):
    """Previous-step values of monitored quantities
    (reference boundary_stop_prev_values, structures.jl:174-184)."""
    t_frac: jax.Array
    V: jax.Array
    SOC: jax.Array
    T: jax.Array
    c_s_n: jax.Array
    I: jax.Array
    eta_plating: jax.Array
    c_e_min: jax.Array
    dfilm: jax.Array
    stop_g: jax.Array      # user stop-function margin (signed-margin hooks)

    @staticmethod
    def init(dtype):
        f = lambda v: jnp.asarray(v, dtype)
        return BoundsPrev(t_frac=f(1.0), V=f(-1.0), SOC=f(-1.0), T=f(-1.0),
                          c_s_n=f(-1.0), I=f(-1.0), eta_plating=f(-1.0),
                          c_e_min=f(-1.0), dfilm=f(-1.0), stop_g=f(-1.0))


def _mean_T(T_full, th, cfg: ModelConfig):
    """Thickness-weighted mean temperature (auxiliary...jl:649-676).
    Half-cell: the grid is (a,p,s,z) — see residuals.cell_widths_thermal."""
    from ..physics.residuals import cell_widths_thermal
    w = cell_widths_thermal(cfg.N, th, cfg.half_cell)
    return jnp.sum(T_full * w) / jnp.sum(w)


def check_stop(t, y, yp, soc, prev: BoundsPrev, flag, bounds: dict, th,
               cfg: ModelConfig, spec_method: str, *, reltol: float,
               tf, check_bounds: bool = True, is_rest: bool = False,
               is_temperature_hold: bool = False, stop_fn=None):
    """One stop-condition sweep. Returns (new_prev, new_flag).

    `flag` is EXIT_SIMULATING (-1) while running; set to the reference's code
    on the first bound crossing. `bounds` is a dict of dynamic scalars (NaN
    disables — NaN comparisons are False, same as the reference's isnan
    guards).
    """
    L = cfg.layout
    dtype = y.dtype
    eps = jnp.where(t < 1.0, jnp.asarray(reltol, dtype), jnp.asarray(0.0, dtype))

    # final time (checks.jl:5-9)
    flag = jnp.where((flag == EXIT_SIMULATING) & (t >= tf), 0, flag)

    if not check_bounds or is_rest:
        return prev, flag

    I = L.I(y)
    dI = L.I(yp)
    V = L.V(y)
    dV = L.V(yp)

    t_frac = prev.t_frac
    state = dict(flag=flag, t_frac=t_frac)

    def fire(state, cond, prev_v, bound_v, cur_v, code):
        tf_new = (prev_v - bound_v) / (prev_v - cur_v)
        tf_new = jnp.nan_to_num(jnp.clip(tf_new, 0.0, 1.0), nan=1.0)
        # reference: any check with smaller t_frac overrides the flag
        take = cond & (tf_new < state["t_frac"])
        return dict(
            flag=jnp.where(take, code, state["flag"]),
            t_frac=jnp.where(take, tf_new, state["t_frac"]),
        )

    # current bounds — skipped for current-controlled runs (checks.jl:31-54)
    if spec_method != "I":
        state = fire(state, (I - bounds["I_max"] > eps) & (dI > 0),
                     prev.I, bounds["I_max"], I, 7)
        state = fire(state, (bounds["I_min"] - I > eps) & (dI < 0),
                     prev.I, bounds["I_min"], I, 8)

    # voltage — skipped for voltage-controlled runs (checks.jl:56-80)
    if spec_method != "V":
        state = fire(state, (bounds["V_min"] - V > eps) & (dV < 0),
                     prev.V, bounds["V_min"], V, 1)
        state = fire(state, (V - bounds["V_max"] > eps) & (dV > 0),
                     prev.V, bounds["V_max"], V, 2)

    # SOC (checks.jl:82-104) — uses the integrated SOC
    state = fire(state, (bounds["SOC_min"] - soc > eps) & (I < 0),
                 prev.SOC, bounds["SOC_min"], soc, 3)
    state = fire(state, (soc - bounds["SOC_max"] > eps) & (I > 0),
                 prev.SOC, bounds["SOC_max"], soc, 4)

    # temperature (checks.jl:106-124); the state carries T − T_amb
    T_mean = prev.T
    if cfg.numerics.temperature and not is_temperature_hold:
        T_mean = _mean_T(L.get(y, "T"), th, cfg) + th["T_amb"]
        dT_mean = _mean_T(L.get(yp, "T"), th, cfg)
        state = fire(state, (T_mean - bounds["T_max"] > eps) & (dT_mean > 0),
                     prev.T, bounds["T_max"], T_mean, 5)

    # anode surface concentration (checks.jl:126-161); a lithium foil has no
    # saturation concentration — the bound is meaningless for half-cells
    c_s_n_max = prev.c_s_n
    if not L.half_cell:
        c_s_n_max = jnp.max(L.c_s_surf(y, "n"))
        state = fire(state,
                     (I > 0) & (c_s_n_max - bounds["c_s_n_max"] * th["c_max_n"] > eps),
                     prev.c_s_n, bounds["c_s_n_max"] * th["c_max_n"], c_s_n_max, 6)

    # minimum electrolyte concentration (checks.jl:163-183)
    c_e_min = jnp.min(L.get(y, "c_e"))
    state = fire(state, (bounds["c_e_min"] - c_e_min > eps),
                 prev.c_e_min, bounds["c_e_min"], c_e_min, 9)

    # plating overpotential (checks.jl:185-202)
    eta_pl = L.eta_plating(y)
    d_eta = L.eta_plating(yp)
    state = fire(state, (bounds["eta_plating_min"] - eta_pl > eps) & (d_eta < 0),
                 prev.eta_plating, bounds["eta_plating_min"], eta_pl, 11)

    # film growth rate (checks.jl:204-224)
    dfilm = prev.dfilm
    if cfg.numerics.aging == "SEI":
        dfilm = jnp.max(yp[L.sl("film")])
        state = fire(state, dfilm - bounds["dfilm_max"] > eps,
                     prev.dfilm, bounds["dfilm_max"], dfilm, 10)

    # user stop hook (checks.jl:26). Two accepted forms (decided at trace
    # time): a *boolean* predicate fires flag 12 with no crossing
    # localization (reference semantics — the stop lands on the accepted
    # step); a *signed margin* g(t, y, yp, soc, th) > 0 participates in the
    # same smallest-t_frac arbitration as the built-in bounds and is later
    # re-localized on the dense-output polynomial exactly like flags 1-11
    # (run.py), so a user stop is located to integration tolerance.
    stop_g = prev.stop_g
    if stop_fn is not None:
        out = jnp.asarray(stop_fn(t, y, yp, soc, th))
        if out.dtype == jnp.bool_:
            state["flag"] = jnp.where(
                out & (state["flag"] == EXIT_SIMULATING),
                jnp.asarray(12, state["flag"].dtype), state["flag"])
        else:
            stop_g = out.astype(dtype)
            state = fire(state, stop_g > eps, prev.stop_g,
                         jnp.asarray(0.0, dtype), stop_g, 12)
    new_flag = state["flag"]

    new_prev = BoundsPrev(
        t_frac=state["t_frac"], V=V, SOC=soc, T=T_mean, c_s_n=c_s_n_max,
        I=I, eta_plating=eta_pl, c_e_min=c_e_min, dfilm=dfilm, stop_g=stop_g)
    return new_prev, new_flag


def bounds_dict(bounds, dtype=jnp.float64):
    """Convert a Bounds dataclass to a dict of dynamic scalars."""
    return {
        "V_max": bounds.V_max, "V_min": bounds.V_min,
        "SOC_max": bounds.SOC_max, "SOC_min": bounds.SOC_min,
        "T_max": bounds.T_max, "c_s_n_max": bounds.c_s_n_max,
        "I_max": bounds.I_max, "I_min": bounds.I_min,
        "eta_plating_min": bounds.eta_plating_min,
        "c_e_min": bounds.c_e_min, "dfilm_max": bounds.dfilm_max,
    }
