"""BDF integrator unit tests on classical problems (no battery physics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from petlion_tpu.solver import bdf, linsolve

pytestmark = pytest.mark.fast


def _solve(F, t0, y0, yp0, tf, atol=1e-8, rtol=1e-8, max_steps=5000):
    jac = linsolve.make_dense_jacfwd(F)
    step = bdf.make_stepper(F, jac, linsolve.dense_solve, atol, rtol)
    state = bdf.bdf_init(t0, y0, yp0,
                         bdf.initial_step_size(y0, yp0, atol, rtol, tf - t0))

    @jax.jit
    def run(state):
        def cond(st):
            return (st.t < tf) & (st.status == bdf.OK) & (st.n_steps < max_steps)

        return jax.lax.while_loop(cond, lambda st: step(st, tf)[0], state)

    return run(state)


def test_change_D_polynomial_exactness():
    """Rescaling the difference array must exactly re-represent a polynomial
    sampled at the new step size (the R/U identity)."""
    rng = np.random.default_rng(0)
    coeffs = rng.normal(size=(4, 3))  # cubic in t, 3 components

    def poly(t):
        return sum(c * t**i for i, c in enumerate(coeffs))

    h, factor, t_n = 0.1, 0.37, 2.0
    order = 3
    # backward differences at step h ending at t_n
    samples = np.stack([poly(t_n - i * h) for i in range(order + 1)])
    D = np.zeros((bdf._D_ROWS, 3))
    cur = samples.copy()
    for j in range(order + 1):
        D[j] = cur[0]
        cur = cur[:-1] - cur[1:] if len(cur) > 1 else cur
    D_new = np.asarray(bdf.change_D(jnp.asarray(D), order, factor))
    # expected: differences of poly at step h*factor
    h2 = h * factor
    samples2 = np.stack([poly(t_n - i * h2) for i in range(order + 1)])
    cur = samples2.copy()
    for j in range(order + 1):
        np.testing.assert_allclose(D_new[j], cur[0], rtol=1e-9, atol=1e-12)
        cur = cur[:-1] - cur[1:] if len(cur) > 1 else cur


def test_linear_ode_exact():
    """y' = -y, y(0)=1 → e^{-t}."""
    def F(t, y, yp):
        return yp + y

    y0 = jnp.array([1.0])
    st = _solve(F, 0.0, y0, -y0, 1.0)
    assert st.status == bdf.OK
    np.testing.assert_allclose(st.t, 1.0, rtol=1e-12)
    np.testing.assert_allclose(st.D[0], np.exp(-1.0), rtol=1e-6)


def test_stiff_van_der_pol_runs():
    """Stiff Van der Pol (μ=1000) must integrate without failure."""
    mu = 1000.0

    def F(t, y, yp):
        return jnp.array([
            yp[0] - y[1],
            yp[1] - (mu * (1 - y[0] ** 2) * y[1] - y[0]),
        ])

    y0 = jnp.array([2.0, 0.0])
    yp0 = jnp.array([0.0, -2.0])
    st = _solve(F, 0.0, y0, yp0, 300.0, atol=1e-8, rtol=1e-6, max_steps=20000)
    assert st.status == bdf.OK
    assert st.t >= 300.0 - 1e-9
    # amplitude of the relaxation oscillation stays near 2
    assert 1.0 < abs(float(st.D[0][0])) < 2.5


def test_robertson_dae():
    """Robertson problem in semi-explicit DAE form (index-1) — the classic
    IDA example; checks long-time stiff accuracy + algebraic constraint."""
    def F(t, y, yp):
        r1 = yp[0] - (-0.04 * y[0] + 1e4 * y[1] * y[2])
        r2 = yp[1] - (0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2)
        r3 = y[0] + y[1] + y[2] - 1.0
        return jnp.array([r1, r2, r3])

    y0 = jnp.array([1.0, 0.0, 0.0])
    yp0 = jnp.array([-0.04, 0.04, 0.0])
    st = _solve(F, 0.0, y0, yp0, 4e5, atol=jnp.array([1e-10, 1e-12, 1e-10]),
                rtol=1e-8, max_steps=20000)
    assert st.status == bdf.OK
    y = np.asarray(st.D[0])
    # reference values at t=4e5 (from SUNDIALS docs / high-accuracy runs)
    np.testing.assert_allclose(y[0], 4.9394e-03, rtol=2e-3)
    np.testing.assert_allclose(y[2], 1.0 - y[0] - y[1], rtol=1e-10)


def test_vmapped_independent_cells():
    """Batched integration: per-cell rate constants, per-cell adaptive steps;
    batched result must match the loop of single solves."""
    def make_F(k):
        def F(t, y, yp):
            return yp + k * y
        return F

    ks = jnp.array([0.5, 1.0, 5.0, 25.0])

    def solve_one(k):
        def F(t, y, yp):
            return yp + k * y
        y0 = jnp.ones((1,))
        return _solve(F, 0.0, y0, -k * y0, 1.0).D[0][0]

    batched = jax.vmap(solve_one)(ks)
    expected = np.exp(-np.asarray(ks))
    # integration atol is 1e-8, so compare with matching absolute slack
    np.testing.assert_allclose(batched, expected, rtol=1e-5, atol=1e-7)
