"""Top-level user API: model factory + simulate.

Mirrors the reference's public surface (PETLION.jl:29-47):

    p   = petlion(LCO, N_p=10, ..., temperature=False, ...)   # model factory
    sol = simulate(p, I=-1, SOC=1)                            # run
    simulate!(sol, p, V="hold")  →  simulate(p, sol=sol, V="hold")

Every `options_simulation` field and every stop bound is a per-call kwarg
(model_evaluation.jl:11-49), and every θ parameter can be edited on
`p.theta` between calls without recompilation (the reference's `update_θ!`
contract) — θ enters the jitted core as a dynamic argument.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Bounds, Discretizations, Numerics, SimOptions
from .chemistry import LCO
from .layout import StateLayout
from .physics.initial_guess import initial_guess
from .physics.residuals import ModelConfig, calc_I1C
from .solution import Solution, exit_reason_string
from .solver import control as ctrl
from .solver import events
from .solver.run import run_once

_BOUND_KEYS = ("V_max", "V_min", "SOC_max", "SOC_min", "T_max", "c_s_n_max",
               "I_max", "I_min", "eta_plating_min", "c_e_min", "dfilm_max")
_OPT_KEYS = ("outputs", "abstol", "abstol_T", "reltol", "abstol_init",
             "reltol_init",
             "maxiters", "check_bounds", "reinit", "verbose", "interp_final",
             "interp_bc", "max_order", "max_save", "newton_maxiter",
             "init_maxiter", "dt0", "dtmax", "save_start", "stop_function",
             "jac_reuse", "step_control")
_METHOD_KEYS = ("I", "V", "P", "eta_p", "res", "dT",
                "dc_s_p_max", "dc_s_p_min", "dc_s_n_max", "dc_s_n_min",
                "dc_e_max", "dc_e_min", "T")


@dataclasses.dataclass
class Model:
    """The `p` object: parameters + static model structure (reference
    `model` struct, structures.jl:336-345)."""
    theta: dict
    bounds: Bounds
    opts: SimOptions
    N: Discretizations
    numerics: Numerics
    cfg: ModelConfig

    @property
    def layout(self) -> StateLayout:
        return self.cfg.layout

    @property
    def I1C(self) -> float:
        return float(calc_I1C(self._theta_dev()))

    def _theta_dev(self, dtype=None):
        dtype = dtype or default_dtype()
        return {k: jnp.asarray(v, dtype) for k, v in self.theta.items()}

    def __repr__(self):
        """Structured summary matching the reference's model show
        (structures.jl:496-566): electrodes + closures, options, limiting-
        electrode capacity, active bounds, node points."""
        n, N, b = self.numerics, self.N, self.bounds
        fn = lambda f: getattr(f, "__name__", repr(f))  # noqa: E731

        # limiting electrode + capacity (auxiliary fn, residuals.py:87-95)
        from .physics.residuals import active_material
        th = self.theta
        try:
            eps_sp, eps_sn = active_material(th)
            q_p = float(eps_sp * th["l_p"] * th["c_max_p"]
                        * (th["theta_min_p"] - th["theta_max_p"]))
            q_n = float(eps_sn * th["l_n"] * th["c_max_n"]
                        * (th["theta_max_n"] - th["theta_min_n"]))
            from .constants import FARADAY
            q_min = (FARADAY / 3600.0) * min(q_p, q_n)
            lim = "cathode" if q_p <= q_n else "anode"
            cap_line = f"  Total capacity:  {q_min:.2f} Ah/m², {lim}-limited\n"
        except (KeyError, TypeError):
            cap_line = ""

        def bound_line(title, lo, hi, unit=""):
            import math as _m
            has_lo, has_hi = not _m.isnan(lo), not _m.isnan(hi)
            if not (has_lo or has_hi):
                return ""
            if has_lo and has_hi:
                rng = f"[{lo:g}{unit}, {hi:g}{unit}]"
            elif has_lo:
                rng = f"min {lo:g}{unit}"
            else:
                rng = f"max {hi:g}{unit}"
            return f"  {title + ':':<16} {rng}\n"

        nan = float("nan")
        lines = [
            f"PETLION-TPU model:\n",
            f"  Cathode: {n.cathode}, {fn(n.rxn_p)}, & {fn(n.OCV_p)}\n",
            f"  Anode:   {n.anode}, {fn(n.rxn_n)}, & {fn(n.OCV_n)}\n",
            f"  System:  {fn(n.D_s_eff)}, {fn(n.rxn_rate)}, {fn(n.D_eff)}, "
            f"{fn(n.K_eff)}, & {fn(n.thermodynamic_factor)}\n",
            "  ---Options---\n",
            f"  Temperature:     {n.temperature}\n",
            f"  Solid diffusion: {n.solid_diffusion}"
            + (f", {n.Fickian_method}\n" if n.solid_diffusion == "Fickian"
               else "\n"),
            f"  Aging:           {n.aging}\n",
            cap_line,
            bound_line("Voltage", b.V_min, b.V_max, " V"),
            bound_line("SOC", b.SOC_min, b.SOC_max),
            bound_line("Current", b.I_min, b.I_max, "C"),
            (bound_line("Temperature", nan, b.T_max - 273.15, " °C")
             if n.temperature else ""),
            bound_line("Anode sat.", nan, b.c_s_n_max),
            "  ---Node Points---\n",
            (f"  Pos. tab:        {N.a}\n" if n.temperature else ""),
            f"  Pos. electrode:  {N.p}\n",
            (f"  Pos. particles:  {N.r_p}\n"
             if n.solid_diffusion == "Fickian" else ""),
            f"  Separator:       {N.s}\n",
            f"  Neg. electrode:  {N.n}\n",
            (f"  Neg. particles:  {N.r_n}\n"
             if n.solid_diffusion == "Fickian" else ""),
            (f"  Neg. tab:        {N.z}\n" if n.temperature else ""),
            f"  DAE system:      N_tot={self.cfg.layout.N_tot} "
            f"(diff {self.cfg.layout.N_diff}, alg {self.cfg.layout.N_alg})",
        ]
        return "".join(lines)


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# θ keys each optional physics variant requires (construction-time check;
# exceeds the reference's check_errors_initial, checks.jl:377-383, which only
# validates the jacobian symbol — here a chemistry lacking e.g. thermal
# parameters fails with a named list instead of a deep-trace KeyError)
_REQUIRED_THETA = {
    "temperature": ("l_a", "l_z", "lam_a", "lam_p", "lam_s", "lam_n", "lam_z",
                    "rho_a", "rho_p", "rho_s", "rho_n", "rho_z",
                    "Cp_a", "Cp_p", "Cp_s", "Cp_n", "Cp_z",
                    "sigma_a", "sigma_z", "h_cell", "T_amb"),
    "SEI": ("R_SEI", "k_n_aging", "M_n", "rho_n", "i_0_jside", "Uref_s", "w"),
    "stress": ("E_p", "nu_p", "Omega_p", "sigma_critical_p",
               "E_n", "nu_n", "Omega_n", "sigma_critical_n",
               "m_LAM", "beta_LAM"),
}


def _check_errors_initial(theta: dict, numerics: Numerics):
    def missing_for(feature, keys):
        missing = sorted(k for k in keys if k not in theta)
        if missing:
            raise ValueError(
                f"chemistry '{numerics.cathode}/{numerics.anode}' does not "
                f"define the parameters required for {feature}: missing "
                f"θ keys {missing}")
    if numerics.temperature:
        missing_for("temperature=True (thermal model)",
                    _REQUIRED_THETA["temperature"])
    if numerics.aging == "SEI":
        missing_for("aging='SEI'", _REQUIRED_THETA["SEI"])
    if numerics.aging == "stress":
        missing_for("aging='stress' (stress-driven LAM)",
                    _REQUIRED_THETA["stress"])
    if numerics.anode == "Li_metal":
        if numerics.aging == "SEI":
            raise ValueError(
                "anode='Li_metal' (half-cell) does not support aging='SEI': "
                "the SEI model lives on the porous anode's particles")


def petlion(chemistry: Callable = LCO, **kwargs) -> Model:
    """Model factory (reference external.jl:2-36). No codegen: the residual
    is traced/compiled lazily by XLA on first simulate (and cached)."""
    theta, bounds, opts, N, numerics = chemistry(**kwargs)
    _check_errors_initial(theta, numerics)
    cfg = ModelConfig.build(N, numerics)
    return Model(theta=theta, bounds=bounds, opts=opts, N=N,
                 numerics=numerics, cfg=cfg)


# ---------------------------------------------------------------------------
# jitted core
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "spec", "opts", "is_rest",
                                   "is_temperature_hold", "jac_plan",
                                   "tstops"))
def _core(y_start, soc0, value, tf, th, bounds, prev_I, has_prev,
          cfg, spec, opts, is_rest, is_temperature_hold, jac_plan=None,
          tstops=None):
    return run_once(y_start=y_start, soc0=soc0, value=value, tf=tf, th=th,
                    bounds=bounds, cfg=cfg, spec=spec, opts=opts,
                    is_rest=is_rest, is_temperature_hold=is_temperature_hold,
                    prev_I=prev_I, has_prev=has_prev, jac_plan=jac_plan,
                    tstops=tstops)


def _mean_T_host(yp, th, cfg):
    return float(events._mean_T(jnp.asarray(yp)[cfg.layout.sl("T")], th, cfg))


def _check_parameters_runtime(p: Model):
    """Runtime θ sanity (reference check_errors_parameters_runtime,
    checks.jl:366-375)."""
    th = p.theta
    eps_sp = 1.0 - (th["eps_fp"] + th["eps_p"])
    eps_sn = 1.0 - (th["eps_fn"] + th["eps_n"])
    if not (0.0 <= eps_sp <= 1.0):
        raise ValueError("eps_p + eps_fp must be in [0, 1)")
    if not (0.0 <= eps_sn <= 1.0):
        raise ValueError("eps_n + eps_fn must be in [0, 1)")
    if th["theta_max_p"] > th["theta_min_p"]:
        raise ValueError("theta_max_p must be < theta_min_p")
    if th["theta_min_n"] > th["theta_max_n"]:
        raise ValueError("theta_min_n must be < theta_max_n")


def _check_initial_soc(bounds: dict, soc: float, method: str, value: float,
                       spec):
    """For new runs, the SOC must leave room in the (dis)charge direction
    (reference check_initial_SOC, checks.jl:327-339). Only decidable for
    constant-current runs."""
    import math
    if method != "I" or spec.func is not None:
        return
    if value == 0:
        return
    soc_max = bounds.get("SOC_max", math.nan)
    soc_min = bounds.get("SOC_min", math.nan)
    if value > 0 and not math.isnan(float(soc_max)) and soc >= float(soc_max):
        raise ValueError(
            f"initial SOC ({soc}) must be < SOC_max ({float(soc_max)}) "
            f"when charging")
    if value < 0 and not math.isnan(float(soc_min)) and soc <= float(soc_min):
        raise ValueError(
            f"initial SOC ({soc}) must be > SOC_min ({float(soc_min)}) "
            f"when discharging")


def _build_control(p: Model, sol: Optional[Solution], kwargs):
    """Identify the control method and build (spec, value, flags)
    (reference assess_input/get_run + input_method dispatch)."""
    given = [k for k in _METHOD_KEYS if k in kwargs]
    if len(given) != 1:
        raise ValueError(
            f"choose exactly one input from {_METHOD_KEYS}; got {given}")
    name = given[0]
    inp = kwargs.pop(name)
    L = p.cfg.layout
    is_rest = False
    is_temperature_hold = False
    value = 0.0

    def last_Y():
        if sol is None or not sol:
            raise ValueError(f"cannot use 'hold' without a previous simulation")
        return sol.Y_final

    if name in ("I", "V", "P", "eta_p"):
        if callable(inp):
            spec = ctrl.ControlSpec(name, ctrl.normalize_func(inp))
        elif isinstance(inp, str):
            spec = ctrl.ControlSpec(name)
            if inp == "rest":
                if name not in ("I", "P"):
                    raise ValueError(f"'rest' unsupported for {name}")
                value = 0.0
                is_rest = (name == "I")
            elif inp == "hold":
                y = last_Y()
                th = p._theta_dev()
                if name == "I":
                    value = float(L.I(y))
                elif name == "V":
                    value = float(L.V(y))
                elif name == "P":
                    value = float(L.I(y) * calc_I1C(th) * L.V(y))
                else:
                    value = float(L.eta_plating(y))
            else:
                raise ValueError(f"unsupported input symbol {inp!r}")
        else:
            spec = ctrl.ControlSpec(name)
            value = float(inp)
    elif name in ("dT", "T"):
        if not p.numerics.temperature:
            raise ValueError("temperature must be enabled for dT/T control")
        if name == "T" and inp != "hold":
            raise ValueError("T only accepts 'hold'; use dT for protocols")
        is_temperature_hold = True
        cfg = p.cfg

        def dT_meas(t, y, yp, th):
            return events._mean_T(yp[cfg.layout.sl("T")], th, cfg)

        if callable(inp):
            f = ctrl.normalize_func(inp)
            spec = ctrl.ControlSpec(
                "res", lambda t, y, yp, th: dT_meas(t, y, yp, th) - f(t, y, yp, th))
            value = 0.0
        else:
            spec = ctrl.ControlSpec("res", dT_meas)
            value = 0.0 if inp == "hold" else float(inp)
    elif name.startswith("dc_"):
        # derivative-hold on the extremal node (input_methods.jl:195-247).
        # The node is selected ON DEVICE from the run's starting state (=
        # the previous run's final state when chaining — the same node the
        # reference's host-side argmax over the last solution picks, but per
        # cell, so batched cells hold different nodes; fresh runs are also
        # allowed, starting from the uniform initial guess).
        if name.startswith("dc_s"):
            electrode = name[5]
            if electrode == "n" and p.cfg.half_cell:
                raise ValueError(
                    "dc_s_n_* controls are meaningless for a half-cell "
                    "(the lithium foil has no solid concentration states)")
            idx_all = np.asarray(p.cfg.layout.c_s_surface_slice(electrode))
        else:
            s = p.cfg.layout.sl("c_e")
            idx_all = np.arange(s.start, s.stop)
        take_max = name.endswith("max")

        def init_aux(y0, th, idx_all=idx_all, take_max=take_max):
            vals = y0[..., idx_all]
            pos = jnp.argmax(vals) if take_max else jnp.argmin(vals)
            return jnp.asarray(idx_all)[pos]

        def deriv(t, y, yp, th):
            return yp[th["_ctrl_aux"]]

        spec = ctrl.ControlSpec("res", deriv, init_aux=init_aux)
        value = 0.0 if (isinstance(inp, str) and inp == "hold") else float(inp)
    elif name == "res":
        if isinstance(inp, tuple):
            value, f = float(inp[0]), ctrl.normalize_func(inp[1])
        else:
            value, f = 0.0, ctrl.normalize_func(inp)
        spec = ctrl.ControlSpec("res", f)
    else:  # pragma: no cover
        raise ValueError(name)

    return name, spec, value, is_rest, is_temperature_hold


def simulate(p: Model,
             tf: Union[float, list, np.ndarray, None] = None,
             *,
             sol: Optional[Solution] = None,
             initial_states=None,
             SOC: Optional[float] = None,
             fast_solver: bool = True,
             tstops=None,
             tdiscon=None,
             dtype=None,
             **kwargs) -> Solution:
    """Run one control segment; continue a previous run by passing sol=.

    Returns a (new or extended) Solution. Mirrors reference simulate /
    simulate! (model_evaluation.jl:11-97). `dtype` overrides the working
    precision (e.g. jnp.float32 to exercise the TPU-native dtype on CPU).
    """
    dtype = dtype or default_dtype()
    th = p._theta_dev(dtype)

    # per-call bound overrides (dynamic)
    bdict = events.bounds_dict(p.bounds)
    for k in _BOUND_KEYS:
        if k in kwargs:
            bdict[k] = kwargs.pop(k)
    bdict = {k: jnp.asarray(v, dtype) for k, v in bdict.items()}

    # per-call option overrides (static); continuations inherit the previous
    # run's output selection (reference simulate!, model_evaluation.jl:87-97)
    opts = p.opts
    if sol is not None and bool(sol) and getattr(sol, "_outputs", None):
        opts = opts.replace(outputs=sol._outputs)
    overrides = {k: kwargs.pop(k) for k in list(kwargs) if k in _OPT_KEYS}
    if "outputs" in overrides and isinstance(overrides["outputs"], (list, str)):
        o = overrides["outputs"]
        overrides["outputs"] = (o,) if isinstance(o, str) else tuple(o)
    if overrides:
        opts = opts.replace(**overrides)

    name, spec, value, is_rest, is_th = _build_control(p, sol, kwargs)
    if kwargs:
        raise TypeError(f"unknown keyword arguments: {sorted(kwargs)}")

    # time horizon: scalar => duration; vector => interpolation grid
    t_grid = None
    if tf is None:
        tf_run = 1e6
    elif np.ndim(tf) > 0:
        t_grid = np.asarray(tf, float)
        tf_run = float(t_grid[-1])
    else:
        tf_run = float(tf)

    # initial state / continuation (model_evaluation.jl:195-209)
    continuing = sol is not None and bool(sol)
    if continuing and initial_states is not None:
        raise ValueError("cannot set initial_states and continue a run")
    if continuing:
        # prefer the internal (T-offset) carry — converting through absolute
        # kelvin would re-quantize intra-cell gradients to ulp(313 K) in f32
        y_int = getattr(sol, "_Y_final_int", None)
        if y_int is not None:
            y_start = jnp.asarray(y_int, dtype)
        else:
            y_start = jnp.asarray(sol.Y_final, dtype)
            if p.numerics.temperature:
                y_start = y_start.at[p.cfg.layout.sl("T")].add(-th["T_amb"])
        soc0 = jnp.asarray(sol.SOC_final, dtype)
        prev_I = p.cfg.layout.I(y_start)
        has_prev = jnp.asarray(True)
        t_offset = float(sol.t[-1]) + 1e-12
    elif initial_states is not None:
        # external state vectors carry absolute T [K] (reference-
        # interchangeable); the solver state carries T − T_amb
        y_start = jnp.asarray(initial_states, dtype)
        if p.numerics.temperature:
            y_start = y_start.at[p.cfg.layout.sl("T")].add(-th["T_amb"])
        soc0 = p.cfg.layout.soc_from_state(y_start, th)
        prev_I = p.cfg.layout.I(y_start)
        has_prev = jnp.asarray(True)
        t_offset = 0.0
    else:
        soc_f = float(p.opts.SOC if SOC is None else SOC)
        _check_parameters_runtime(p)
        _check_initial_soc(
            {k: float(np.asarray(v)) for k, v in bdict.items()},
            soc_f, name, float(value), spec)
        soc0 = jnp.asarray(soc_f, dtype)
        y_start = initial_guess(soc0, th, p.cfg, dtype)
        prev_I = jnp.asarray(0.0, dtype)
        has_prev = jnp.asarray(False)
        t_offset = 0.0

    if opts.verbose:
        # start-of-run header (reference prints the run object before
        # solve!, model_evaluation.jl:73-74; method_string formatting,
        # structures.jl:626-639)
        if spec.func is not None:
            desc = f"{name} function"
        else:
            unit = {"I": "C", "V": " V", "P": " W/m²"}.get(name, "")
            desc = f"{name} = {float(value):g}{unit}"
        print(f"\nRun for {desc} from t = {t_offset:.2f} s "
              f"(SOC {float(soc0):.4f})")

    jac_plan = None
    if fast_solver:
        from .ops.plan import get_plan
        jac_plan = get_plan(p.cfg, p.theta)
    # warm-start cache (reference save_start_init!,
    # model_evaluation.jl:384-415): seed the algebraic block from a previous
    # identical initialization, keyed by (method, SOC, setpoint)
    ws_key = None
    if opts.save_start:
        cache = getattr(p, "_save_start", None)
        if cache is None:
            cache = p._save_start = {}
        ws_key = (name, round(float(soc0), 4), round(float(value), 4))
        if ws_key in cache:
            nd = p.cfg.layout.N_diff
            y_start = y_start.at[nd:].set(jnp.asarray(cache[ws_key], dtype))

    # explicit stop times + known input discontinuities (reference
    # postfix_integrator!, model_evaluation.jl:288-310)
    stops = list(tstops or [])
    stops += [t - opts.reltol / 2 for t in (tdiscon or [])]
    stops_t = tuple(sorted(float(t) - t_offset for t in stops
                           if t - t_offset > 0)) or None
    res = _core(y_start, soc0, jnp.asarray(value, dtype),
                jnp.asarray(tf_run, dtype), th, bdict, prev_I, has_prev,
                p.cfg, spec, opts, is_rest, is_th, jac_plan, stops_t)

    if ws_key is not None and ws_key not in p._save_start:
        p._save_start[ws_key] = np.asarray(res.y0_run)[p.cfg.layout.N_diff:]

    n_saved = int(res.n_saved)
    flag = int(res.flag)
    host_bufs = {k: np.asarray(v) for k, v in res.bufs.items()}
    meta = dict(
        method=name,
        input_repr=repr(value) if spec.func is None else "function",
        tspan=(t_offset, t_offset + float(res.t_final)),
        flag=flag,
        exit_reason=exit_reason_string(flag),
        n_steps=int(res.n_steps),
        n_rejected=int(res.n_rejected),
        init_converged=bool(res.init_converged),
        truncated=bool(res.truncated),
    )
    out = sol if continuing else Solution()
    # Y_final is public (reference-interchangeable): absolute T [K]; the
    # internal T-offset carry is kept alongside for lossless continuation
    y_final_ext = np.asarray(res.y_final)
    if p.numerics.temperature:
        sl_T = p.cfg.layout.sl("T")
        y_final_ext = y_final_ext.copy()
        y_final_ext[sl_T] += float(p.theta["T_amb"])
    out.append_run(host_bufs, n_saved, t_offset, meta,
                   y_final_ext, res.yp_final, res.soc_final)
    out._Y_final_int = np.asarray(res.y_final)
    out._outputs = opts.outputs
    if opts.verbose:
        print(out)
    if flag == -2:
        import warnings
        warnings.warn(f"solver failure in run {name} "
                      f"(init_converged={meta['init_converged']}, "
                      f"steps={meta['n_steps']})")
    if meta["truncated"]:
        import warnings
        warnings.warn(
            f"run {name} accepted {meta['n_steps']} steps but max_save="
            f"{opts.max_save} output slots: the recorded tail was "
            f"overwritten (raise max_save= to keep the full trajectory)")
    if t_grid is not None:
        return out(t_grid, interp_bc=opts.interp_bc)
    return out


def simulate_cont(sol: Solution, p: Model, tf=None, **kwargs) -> Solution:
    """`simulate!` equivalent: continue `sol` in place."""
    return simulate(p, tf, sol=sol, **kwargs)


# ---------------------------------------------------------------------------
# state-vector accessors (reference calc_* family, scalar_residual.jl:74-165)
# ---------------------------------------------------------------------------

def calc_OCV(y, p: Model):
    """Per-CV open-circuit voltages (U_p, U_n) at the particle-surface
    stoichiometries of state `y` (reference calc_OCV,
    scalar_residual.jl:116-141). `y` uses the external convention
    (absolute T [K], like Solution.Y_final). Half-cell: U_n is the lithium
    foil's 0 V vs Li/Li⁺."""
    L, num = p.cfg.layout, p.numerics
    y = jnp.asarray(y)
    th = p._theta_dev(y.dtype)
    if num.temperature:
        T_p = L.get(y, "T", "p")
        T_n = L.get(y, "T", "n")
    else:
        T_p = jnp.full((p.N.p,), th["T0"], y.dtype)
        T_n = jnp.full((0 if p.cfg.half_cell else p.N.n,), th["T0"], y.dtype)
    U_p, _ = num.OCV_p(L.c_s_surf(y, "p") / th["c_max_p"], T_p, th)
    if p.cfg.half_cell:
        U_n = jnp.zeros((1,), y.dtype)
    else:
        U_n, _ = num.OCV_n(L.c_s_surf(y, "n") / th["c_max_n"], T_n, th)
    return U_p, U_n


def calc_R_internal(y, p: Model):
    """Apparent internal resistance |(V − OCV)/I| [Ω·m²] of state `y`
    (reference calc_R_internal, scalar_residual.jl:143-153): OCV taken
    across the current-collector-facing surfaces, I in A/m²."""
    L = p.cfg.layout
    y = jnp.asarray(y)
    th = p._theta_dev(y.dtype)
    I = L.I(y) * calc_I1C(th)
    V = L.V(y)
    U_p, U_n = calc_OCV(y, p)
    ocv = U_p[0] - U_n[-1]
    return jnp.abs((V - ocv) / I)
