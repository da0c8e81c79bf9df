"""petlion_tpu — TPU-native porous-electrode-theory (P2D/DFN) battery
simulation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of PETLION.jl
(github.com/MarcBerliner/PETLION.jl): the pseudo-2D Doyle-Fuller-Newman model
as a sparse DAE, solved with an in-JAX adaptive variable-order BDF integrator,
batched over cells with vmap/shard_map for TPU-scale parameter sweeps.

Public API parity map (reference src/PETLION.jl:29-47):
    petlion, simulate, simulate! (→ simulate_cont), solution (→ Solution),
    final_exit_reason, exit_reasons, LCO, NMC, NMC_LGM50,
    boundary_stop_conditions (→ Bounds), options_simulation (→ SimOptions),
    discretizations_per_section (→ Discretizations), OCV_* / rxn_* / D_*_eff /
    K_eff / thermodynamic_factor function families.
"""

from .config import (Bounds, Discretizations, Numerics, SimOptions,
                     EXIT_REASONS)
from .chemistry import LCO, NMC, NMC_LGM50
from .layout import StateLayout
from .physics import kinetics, ocv, transport
from .physics.kinetics import rxn_BV, rxn_MHC, rxn_BV_gamma_mod_01, MHC_kfunc
from .physics.ocv import (OCV_LCO, OCV_LiC6, OCV_NMC, OCV_LiC6_with_NMC,
                          OCV_NMC_LGM50, OCV_LiC6_LGM50)
from .physics.transport import (D_s_eff, D_s_eff_isothermal, rxn_rate,
                                rxn_rate_isothermal, D_eff, D_eff_linear,
                                D_eff_linear_one_term, K_eff, K_eff_isothermal,
                                thermodynamic_factor,
                                thermodynamic_factor_linear)
from .physics.residuals import ModelConfig, calc_I1C, residual_core
from .sim import (Model, petlion, simulate, simulate_cont, default_dtype,
                  calc_OCV, calc_R_internal)
from .solution import Solution, RunResult, reset_t
from . import estimation


def final_exit_reason(sol: Solution) -> str:
    return sol.final_exit_reason()


def exit_reasons(sol: Solution):
    return sol.exit_reasons()


__version__ = "0.1.0"
__all__ = [
    "petlion", "simulate", "simulate_cont", "Model", "Solution", "RunResult",
    "Bounds", "Discretizations", "Numerics", "SimOptions", "StateLayout",
    "ModelConfig", "LCO", "NMC", "NMC_LGM50", "residual_core", "calc_I1C",
    "final_exit_reason", "exit_reasons", "EXIT_REASONS", "default_dtype",
    "rxn_BV", "rxn_MHC", "rxn_BV_gamma_mod_01", "MHC_kfunc",
    "OCV_LCO", "OCV_LiC6", "OCV_NMC", "OCV_LiC6_with_NMC", "OCV_NMC_LGM50",
    "OCV_LiC6_LGM50", "D_s_eff", "D_s_eff_isothermal", "rxn_rate",
    "rxn_rate_isothermal", "D_eff", "D_eff_linear", "D_eff_linear_one_term",
    "K_eff", "K_eff_isothermal", "thermodynamic_factor",
    "thermodynamic_factor_linear", "kinetics", "ocv", "transport",
    "estimation", "reset_t", "calc_OCV", "calc_R_internal",
]

# Reference-name compatibility aliases, so PETLION.jl users find the exact
# exported names (PETLION.jl:29-47; the reference similarly keeps deprecated
# aliases alive, PETLION.jl:65-80). The canonical names above are preferred.
boundary_stop_conditions = Bounds        # structures.jl:174-251
options_simulation = SimOptions          # structures.jl:266-291
discretizations_per_section = Discretizations  # params.jl mesh N
options_numerical = Numerics             # outputs.jl:13-32
rxn_BV_gamma_mod = rxn_BV_gamma_mod_01   # custom_functions.jl:300-321
solution = Solution                      # outputs.jl solution()

# Deprecated-name shims, matching the reference's own backwards-compatibility
# aliases (PETLION.jl:65-80). `run_model!`/`simulate!` are not legal Python
# identifiers; their in-place semantics map to `simulate_cont` /
# `run_model_cont`.
Params = petlion                         # PETLION.jl:66
run_model = simulate                     # PETLION.jl:67
run_model_cont = simulate_cont           # PETLION.jl:68 (run_model!)
options_model = SimOptions               # PETLION.jl:69
model_output = Solution                  # PETLION.jl:70

__all__ += [
    "boundary_stop_conditions", "options_simulation",
    "discretizations_per_section", "options_numerical",
    "rxn_BV_gamma_mod", "solution",
    "Params", "run_model", "run_model_cont", "options_model", "model_output",
]
