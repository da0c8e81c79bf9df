"""Static configuration objects.

These mirror the reference's three config tiers (see PETLION.jl
src/structures.jl and src/outputs.jl):

* ``Discretizations``  — mesh sizes per section
  (reference: `discretizations_per_section`).
* ``Numerics``         — structure-defining physics options that are lifted
  into *static* (hashable) fields so that JAX traces a specialized graph per
  configuration — the TPU-native analogue of the reference's type-parameter
  dispatch `model{T,temp,solid_diff,Fickian,age}` (structures.jl:336-357).
* ``SimOptions``       — per-simulation runtime options
  (reference: `options_simulation`, structures.jl:266-291).
* ``Bounds``           — stop conditions (reference: `boundary_stop_conditions`,
  structures.jl:237-250). NaN deactivates a bound.

``Numerics`` carries *function references* for the swappable physics
(OCV curves, kinetics, transport) exactly like the reference's
`options_numerical` (outputs.jl:13-32). Because they are static, changing a
function triggers a retrace — same contract as the reference, where changing
them requires regenerating code.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

from .physics import kinetics as _kinetics
from .physics import ocv as _ocv
from .physics import transport as _transport


@dataclasses.dataclass(frozen=True)
class Discretizations:
    """Mesh sizes per cell section (reference: params.jl:119-136 kwargs)."""

    p: int = 10       # cathode volumes
    s: int = 10       # separator volumes
    n: int = 10       # anode volumes
    a: int = 10       # positive current collector (temperature only)
    z: int = 10       # negative current collector (temperature only)
    r_p: int = 10     # cathode particle radial nodes (Fickian only)
    r_n: int = 10     # anode particle radial nodes (Fickian only)


@dataclasses.dataclass(frozen=True)
class Numerics:
    """Structure-defining options — static under jit.

    Mirrors `options_numerical` (reference outputs.jl:13-32).
    """

    temperature: bool = False
    solid_diffusion: str = "Fickian"      # "Fickian" | "quadratic" | "polynomial"
    Fickian_method: str = "finite_difference"  # | "spectral"
    aging: Optional[str] = None           # None | "SEI" | "stress"
    cathode: str = "LCO"
    anode: str = "LiC6"
    # swappable physics closures (static):
    rxn_p: Callable = _kinetics.rxn_BV
    rxn_n: Callable = _kinetics.rxn_BV
    OCV_p: Callable = _ocv.OCV_LCO
    OCV_n: Callable = _ocv.OCV_LiC6
    D_s_eff: Callable = _transport.D_s_eff
    rxn_rate: Callable = _transport.rxn_rate
    D_eff: Callable = _transport.D_eff_linear
    K_eff: Callable = _transport.K_eff
    thermodynamic_factor: Callable = _transport.thermodynamic_factor_linear

    def __post_init__(self):
        assert self.solid_diffusion in ("Fickian", "quadratic", "polynomial")
        assert self.Fickian_method in ("finite_difference", "spectral")
        assert self.aging in (None, "SEI", "stress")

    # hash/eq by identity of the callables is what dataclass does by default
    # (functions are compared by object identity) — correct for retracing.


@dataclasses.dataclass(frozen=True)
class Bounds:
    """Stop conditions; NaN disables a bound (reference structures.jl:237-250).

    Flag codes assigned when a bound fires follow checks.jl:
    0 t>=tf, 1 V_min, 2 V_max, 3 SOC_min, 4 SOC_max, 5 T_max, 6 c_s_n_max,
    7 I_max, 8 I_min, 9 c_e_min, 10 dfilm_max, 11 eta_plating_min.
    """

    V_max: float = math.nan
    V_min: float = math.nan
    SOC_max: float = math.nan
    SOC_min: float = math.nan
    T_max: float = math.nan
    c_s_n_max: float = math.nan     # fraction of c_max_n
    I_max: float = math.nan         # C-rate
    I_min: float = math.nan         # C-rate
    eta_plating_min: float = math.nan
    c_e_min: float = math.nan
    dfilm_max: float = math.nan

    def replace(self, **kw) -> "Bounds":
        return dataclasses.replace(self, **kw)


EXIT_REASONS: Tuple[str, ...] = (
    "Final time reached",              # 0
    "Below min. voltage",              # 1
    "Above max. voltage",              # 2
    "Below min. SOC",                  # 3
    "Above max. SOC",                  # 4
    "Above max. temperature",          # 5
    "Above max. c_s_n",                # 6
    "Above max. C-rate",               # 7
    "Below min. C-rate",               # 8
    "Below min. c_e",                  # 9
    "Above max. film growth rate",     # 10
    "Below min. η_plating",            # 11
    "Stop function triggered",         # 12 (user hook, checks.jl:26)
)
EXIT_SIMULATING = -1          # run still within bounds
EXIT_FAILED = -2              # integrator failure (Newton/maxiters)


@dataclasses.dataclass(frozen=True)
class SimOptions:
    """Per-run solver options (reference `options_simulation`).

    These are static under jit (they select tolerances/iteration limits that
    are baked into the compiled step loop). θ parameters remain dynamic.
    """

    SOC: float = 1.0
    outputs: Tuple[str, ...] = ("t", "V")
    abstol: float = 1e-6
    reltol: float = 1e-3
    abstol_init: Optional[float] = None
    reltol_init: Optional[float] = None
    # separate absolute tolerance for the temperature block (None → abstol).
    # IDA supports per-component atol vectors (IDASVtolerances); the
    # reference uses a scalar, but T [K] lives on a ~mK-cK accuracy scale
    # while concentrations need ~1e-4 relative — one scalar can't serve both
    # in f32. Used by the f32 thermal configs (e.g. abstol_T=1e-2).
    abstol_T: Optional[float] = None
    maxiters: int = 10_000
    check_bounds: bool = True
    reinit: bool = True
    verbose: bool = False
    interp_final: bool = True
    interp_bc: str = "interpolate"
    save_start: bool = False
    # user stop hook (reference opts.stop_function, structures.jl:283,
    # checks.jl:26): a traceable f(t, y, yp, soc, th) -> bool evaluated per
    # accepted step; True stops the run with flag 12. Static (retraces per
    # distinct function object), like every structural option here.
    stop_function: Optional[Callable] = None
    # integrator controls (TPU build specific)
    max_order: int = 5
    max_save: int = 1024          # output ring buffer length per run
    newton_maxiter: int = 4      # per step attempt (IDA-style modified Newton)
    # IDA-style Jacobian reuse: max accepted steps per Newton-matrix
    # factorization (refactor sooner when the leading coefficient drifts
    # outside cjratio [3/10, 10/3] — Sundials ida.c semantics; stale-matrix
    # Newton damped by 2/(1+cjratio)). 0 = refactor every step attempt.
    # Default 0: on the isothermal Schur fast path the factorization is
    # only ~14% of a step attempt (measured, interleaved TPU A/B), and the
    # stale-matrix step inflation (~24% more attempts) outweighs it. Worth
    # enabling (4-8) where the factor is expensive — e.g. the f32 thermal
    # pivoted-LU path.
    jac_reuse: int = 0
    # accepted-step size policy: "greedy" = SciPy-BDF (grow up to 10× by the
    # error proxy every k+2 equal steps); "ida" = Sundials hysteresis (grow
    # only when the estimate clears 2×, cap 2, hold h in [1,2) — fewer
    # rejected attempts at slightly more accepted steps; ida.c
    # IDACompleteStep). A/B'd on hardware; see PARITY.md round-5 notes.
    step_control: str = "greedy"
    init_maxiter: int = 100       # consistent-initialization Newton iters
    dt0: Optional[float] = None   # initial step; None -> heuristic
    dtmax: Optional[float] = None

    @property
    def abstol_init_(self) -> float:
        return self.abstol if self.abstol_init is None else self.abstol_init

    @property
    def reltol_init_(self) -> float:
        return self.reltol if self.reltol_init is None else self.reltol_init

    def replace(self, **kw) -> "SimOptions":
        return dataclasses.replace(self, **kw)
