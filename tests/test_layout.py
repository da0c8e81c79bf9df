"""State-layout parity with the reference index layout (external.jl:275-365)."""

import numpy as np
import pytest

from petlion_tpu.config import Discretizations, Numerics
from petlion_tpu.layout import StateLayout

pytestmark = pytest.mark.fast


def _layout(**kw):
    num = Numerics(**kw)
    return StateLayout.build(Discretizations(), num)


def test_default_lco_fickian_is_301_daes():
    L = _layout()
    assert L.N_tot == 301          # README.md:8 headline size
    assert L.N_diff == 230         # c_e 30 + c_s 200
    assert L.N_alg == 71           # j 20 + Φ_e 30 + Φ_s 20 + I 1
    assert L.sl("c_e") == slice(0, 30)
    assert L.sl("c_s_avg") == slice(30, 230)
    assert L.sl("j") == slice(230, 250)
    assert L.sl("Phi_e") == slice(250, 280)
    assert L.sl("Phi_s") == slice(280, 300)
    assert L.sl("I") == slice(300, 301)


def test_sections_within_states():
    L = _layout()
    assert L.sl("c_e", "p") == slice(0, 10)
    assert L.sl("c_e", "s") == slice(10, 20)
    assert L.sl("c_e", "n") == slice(20, 30)
    assert L.sl("c_s_avg", "p") == slice(30, 130)
    assert L.sl("c_s_avg", "n") == slice(130, 230)
    assert L.sl("Phi_e", "n") == slice(270, 280)


def test_temperature_adds_50_states():
    L = _layout(temperature=True)
    assert L.N_tot == 351
    assert L.sl("T") == slice(230, 280)   # after c_e + c_s, before algebraic
    assert L.sl("I") == slice(350, 351)


def test_sei_aging_layout():
    L = _layout(aging="SEI")
    # diff: c_e 30, c_s 200, film 10, SOH 1 = 241; alg: 20+30+20+10+1 = 81
    assert L.N_diff == 241
    assert L.N_alg == 81
    assert L.sl("film") == slice(230, 240)
    assert L.sl("SOH") == slice(240, 241)
    assert L.sl("j_s") == slice(311, 321)
    assert L.sl("I") == slice(321, 322)


def test_polynomial_layout():
    L = _layout(solid_diffusion="polynomial")
    # c_s collapses to 20, Q adds 20: diff = 30+20+20 = 70
    assert L.N_diff == 70
    assert L.N_tot == 141


def test_surface_indices_fickian():
    L = _layout()
    idx_p = L.c_s_surface_slice("p")
    assert idx_p[0] == 30 + 9 and idx_p[-1] == 30 + 99
    idx_n = L.c_s_surface_slice("n")
    assert idx_n[0] == 130 + 9 and idx_n[-1] == 130 + 99


def test_differential_mask():
    L = _layout()
    m = L.is_differential
    assert m[:230].all() and not m[230:].any()


def test_voltage_and_current_accessors():
    L = _layout()
    y = np.zeros(301)
    y[280] = 4.0   # Φ_s first cathode CV
    y[299] = 0.1   # Φ_s last anode CV
    y[300] = -1.0  # I
    assert abs(L.V(y) - 3.9) < 1e-14
    assert L.I(y) == -1.0
