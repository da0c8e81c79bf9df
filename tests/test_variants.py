"""End-to-end tests of physics variants: solid-diffusion approximations,
SEI aging with cycling carry-over, MHC kinetics, NMC/LGM50 chemistries."""

import numpy as np
import pytest

import petlion_tpu as pt


def test_polynomial_vs_fickian_low_rate():
    """At low C-rate the polynomial approximation must track Fickian closely
    (Subramanian et al. reduced model; reference residuals.jl:108-127,237-258)."""
    pf = pt.petlion(pt.LCO)
    pp = pt.petlion(pt.LCO, solid_diffusion="polynomial")
    sf = pt.simulate(pf, 1800.0, I=-0.2, SOC=0.8)
    sp = pt.simulate(pp, 1800.0, I=-0.2, SOC=0.8)
    assert sf.final_exit_reason() == "Final time reached"
    assert sp.final_exit_reason() == "Final time reached"
    assert abs(sf.V[-1] - sp.V[-1]) < 5e-3
    assert abs(sf.SOC[-1] - sp.SOC[-1]) < 1e-6


def test_quadratic_runs():
    pq = pt.petlion(pt.LCO, solid_diffusion="quadratic")
    s = pt.simulate(pq, 600.0, I=-1, SOC=1)
    assert s.final_exit_reason() == "Final time reached"
    assert 3.0 < s.V[-1] < 4.3


def test_mhc_kinetics_runs():
    """MHC reaction model (custom_functions.jl:233-298) end-to-end."""
    p = pt.petlion(pt.LCO, rxn_p=pt.rxn_MHC, rxn_n=pt.rxn_MHC)
    s = pt.simulate(p, 600.0, I=-1, SOC=1)
    assert s.final_exit_reason() == "Final time reached"
    assert np.isfinite(s.V).all()
    # different kinetics → different voltage than BV, but same ballpark
    pbv = pt.petlion(pt.LCO)
    sbv = pt.simulate(pbv, 600.0, I=-1, SOC=1)
    assert abs(s.V[-1] - sbv.V[-1]) < 0.5


def test_nmc_discharge():
    p = pt.petlion(pt.NMC)
    s = pt.simulate(p, I=-1, SOC=1)
    assert s.final_exit_reason() in ("Below min. SOC", "Below min. voltage")
    assert s.t[-1] > 3000.0   # close to a full hour at 1C


def test_lgm50_thermal_discharge():
    p = pt.petlion(pt.NMC_LGM50)   # temperature=True by default
    s = pt.simulate(p, I=-0.5, SOC=1, outputs=("t", "V", "T"))
    assert s.final_exit_reason() in ("Below min. SOC", "Below min. voltage",
                                     "Final time reached")
    assert s.t[-1] > 1800.0
    T = np.asarray(s.T)
    assert (T >= 298.0).all() and (T < 320.0).all()  # warms but stays sane


def test_sei_aging_cycling():
    """NMC+SEI cycling with state carry-over (BASELINE config 4): film grows
    monotonically on charge, SOH decreases across cycles."""
    p = pt.petlion(pt.LCO, aging="SEI")
    outs = ("t", "V", "film", "SOH", "j_s")
    sol = pt.simulate(p, I=1, SOC=0.3, V_max=4.2, outputs=outs,
                      SOC_max=0.95)
    for _ in range(2):
        sol = pt.simulate_cont(sol, p, I=-1, SOC_min=0.3, V_min=2.8)
        sol = pt.simulate_cont(sol, p, I=1, SOC_max=0.95, V_max=4.2)
    film = np.asarray(sol.arrays["film"])
    soh = np.asarray(sol.arrays["SOH"])
    assert np.isfinite(film).all()
    assert film.min() >= 0.0
    assert film[-1].mean() > film[0].mean()          # SEI grew
    assert soh[-1] < soh[0] <= 1.0 + 1e-12           # capacity lost
    # j_s is zero on discharge segments, negative on charge
    j_s = np.asarray(sol.arrays["j_s"])
    I = np.asarray(sol.I)
    assert np.all(j_s[I < 0] == 0.0)
    assert j_s[I > 0].min() < 0.0


def test_dc_s_hold():
    """Derivative-hold control dc_s_p_min (input_methods.jl:204-211)."""
    p = pt.petlion(pt.LCO)
    sol = pt.simulate(p, 300.0, I=1, SOC=0.5, outputs=("t", "V", "Y"))
    sol = pt.simulate_cont(sol, p, 60.0, dc_s_p_min=0.0)
    assert sol.final_exit_reason() == "Final time reached"
    # with dc_s/dt = 0 at the extremal node, its concentration stays flat
    Y = np.asarray(sol.arrays["Y"])
    r = sol.results[-1].run_index
    idx_all = p.layout.c_s_surface_slice("p")
    node = idx_all[np.argmin(Y[r.start][idx_all])]
    c_trace = Y[r][:, node]
    assert abs(c_trace[-1] - c_trace[0]) / c_trace[0] < 1e-4


def test_spectral_fickian_matches_fdm():
    """Chebyshev-spectral radial scheme (residuals.jl:181-235) agrees with
    the 9-point FDM scheme on a moderate-rate discharge."""
    ps = pt.petlion(pt.LCO, Fickian_method="spectral")
    pf = pt.petlion(pt.LCO)
    s1 = pt.simulate(ps, 1200.0, I=-0.5, SOC=0.8)
    s2 = pt.simulate(pf, 1200.0, I=-0.5, SOC=0.8)
    assert s1.final_exit_reason() == "Final time reached"
    assert abs(s1.V[-1] - s2.V[-1]) < 1e-3
    assert abs(s1.SOC[-1] - s2.SOC[-1]) < 1e-8
