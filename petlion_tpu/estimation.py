"""Parameter estimation: differentiable simulation + Gauss-Newton fitting.

The reference's flagship workflow is parameter estimation by re-running
`simulate` in user loops with perturbed θ (examples/updating_parameters.ipynb;
the PETLION paper). Because this framework's entire solve — consistent init,
adaptive BDF stepping, events — is one pure JAX function, exact parameter
sensitivities come from `jax.jacfwd` THROUGH the solver (validated against
finite differences to ~1e-8), enabling gradient-based estimation instead of
derivative-free search. Forward-mode differentiates `lax.while_loop`, so no
fixed-step compromise is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .physics.initial_guess import initial_guess
from .sim import Model, default_dtype
from .solver import control, events
from .solver.run import run_once


def make_voltage_model(p: Model, fit_keys: Sequence[str], *,
                       t_eval, I_crate: float, SOC: float = 1.0,
                       reltol=1e-5, abstol=1e-7, max_save: int = 512,
                       fast_solver: bool = True):
    """Build V(θ_fit) -> voltage at fixed times, fully differentiable.

    Returns (voltage_fn, theta0) where voltage_fn maps a (len(fit_keys),)
    vector of parameter values to V at `t_eval` (linear interpolation of the
    adaptive-solver trace, itself differentiable).
    """
    dtype = default_dtype()
    t_eval = jnp.asarray(t_eval, dtype)
    tf = float(np.max(np.asarray(t_eval))) * 1.0000001
    spec = control.ControlSpec("I")
    bd = {k: jnp.asarray(v, dtype)
          for k, v in events.bounds_dict(p.bounds).items()}
    # disable bound exits so the trace always covers t_eval
    bd = {k: jnp.asarray(float("nan"), dtype) for k in bd}
    opts = p.opts.replace(max_save=max_save, reltol=reltol, abstol=abstol)
    jac_plan = None
    if fast_solver:
        from .ops.plan import get_plan
        jac_plan = get_plan(p.cfg, p.theta)

    theta0 = jnp.asarray([p.theta[k] for k in fit_keys], dtype)

    def voltage(theta_fit):
        th = p._theta_dev(dtype)
        for i, k in enumerate(fit_keys):
            th[k] = theta_fit[i]
        y0 = initial_guess(jnp.asarray(SOC, dtype), th, p.cfg, dtype)
        res = run_once(y_start=y0, soc0=jnp.asarray(SOC, dtype),
                       value=jnp.asarray(I_crate, dtype),
                       tf=jnp.asarray(tf, dtype), th=th, bounds=bd,
                       cfg=p.cfg, spec=spec, opts=opts, jac_plan=jac_plan)
        n = res.n_saved
        t = res.bufs["t"]
        V = res.bufs["V"]
        # mask unused buffer tail so interp sees a monotone grid
        big = jnp.where(jnp.arange(t.shape[0]) < n, t, t[n - 1] + 1e30)
        return jnp.interp(t_eval, big, V)

    return voltage, theta0


def fit(p: Model, fit_keys: Sequence[str], t_data, V_data, *,
        I_crate: float, SOC: float = 1.0, iters: int = 8,
        log_params: bool = True, damping: float = 1e-10,
        verbose: bool = False, **model_kw) -> Dict[str, float]:
    """Gauss-Newton fit of θ[fit_keys] to a measured voltage trace.

    Works in log-parameter space by default (transport/kinetic parameters
    span decades and must stay positive). Returns the fitted parameter dict.
    """
    voltage, theta0 = make_voltage_model(p, fit_keys, t_eval=t_data,
                                         I_crate=I_crate, SOC=SOC, **model_kw)
    V_data = jnp.asarray(V_data, theta0.dtype)

    if log_params:
        def resid(x):
            return voltage(jnp.exp(x)) - V_data
        x = jnp.log(theta0)
    else:
        def resid(x):
            return voltage(x) - V_data
        x = theta0

    r_and_J = jax.jit(lambda x: (resid(x), jax.jacfwd(resid)(x)))

    for it in range(iters):
        r, J = r_and_J(x)
        JtJ = J.T @ J + damping * jnp.eye(len(x), dtype=x.dtype)
        step = jnp.linalg.solve(JtJ, J.T @ r)
        x = x - step
        if verbose:
            print(f"  GN iter {it}: rms={float(jnp.sqrt(jnp.mean(r**2))):.3e}")
        if float(jnp.linalg.norm(step)) < 1e-10:
            break

    theta_fit = jnp.exp(x) if log_params else x
    return {k: float(v) for k, v in zip(fit_keys, theta_fit)}


def sensitivities(p: Model, fit_keys: Sequence[str], t_eval, *,
                  I_crate: float, SOC: float = 1.0, **model_kw):
    """∂V(t)/∂θ for the given parameters — one jacfwd through the solver."""
    voltage, theta0 = make_voltage_model(p, fit_keys, t_eval=t_eval,
                                         I_crate=I_crate, SOC=SOC, **model_kw)
    return np.asarray(jax.jacfwd(voltage)(theta0)), np.asarray(theta0)
