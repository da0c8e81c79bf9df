"""Differentiable-solver parameter estimation (capability beyond the
reference, which does estimation by derivative-free re-simulation loops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import petlion_tpu as pt
from petlion_tpu import estimation


@pytest.fixture(scope="module")
def p():
    return pt.petlion(pt.LCO)


def test_sensitivity_matches_finite_difference(p):
    t_eval = np.array([100.0, 300.0, 550.0])
    J, th0 = estimation.sensitivities(p, ["D_sp"], t_eval, I_crate=-1.0,
                                      SOC=0.5)
    voltage, _ = estimation.make_voltage_model(p, ["D_sp"], t_eval=t_eval,
                                               I_crate=-1.0, SOC=0.5)
    eps = 1e-18
    fd = (np.asarray(voltage(th0 + eps)) - np.asarray(voltage(th0 - eps))) \
        / (2 * eps)
    np.testing.assert_allclose(J[:, 0], fd, rtol=1e-5)
    assert np.all(np.abs(J) > 0)


def test_gauss_newton_recovers_parameters(p):
    """Generate synthetic data at known θ*, start from a perturbed guess,
    recover θ* with Gauss-Newton on jacfwd sensitivities."""
    true = {"D_sp": 1.7e-14, "k_n": 3.1e-11}
    t_data = np.linspace(60.0, 1700.0, 24)
    for k, v in true.items():
        p.theta[k] = v
    voltage, th_true = estimation.make_voltage_model(
        p, list(true), t_eval=t_data, I_crate=-1.0, SOC=0.9)
    V_data = np.asarray(voltage(th_true))

    # perturb the starting guess by 2x / 0.5x
    p.theta["D_sp"] = 1e-14
    p.theta["k_n"] = 5.031e-11
    fitted = estimation.fit(p, list(true), t_data, V_data, I_crate=-1.0,
                            SOC=0.9, iters=10)
    for k, v in true.items():
        assert abs(fitted[k] - v) / v < 1e-3, (k, fitted[k], v)
    # restore defaults
    p.theta["D_sp"] = 1e-14
    p.theta["k_n"] = 5.031e-11
