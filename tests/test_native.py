"""Native (C++) host runtime tests: spline + banded-arrowhead LU."""

import numpy as np
import pytest

from petlion_tpu.runtime import native

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native runtime not built (no C++ toolchain?)")


def test_spline_matches_python_impl():
    from petlion_tpu.utils import interp
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, 25))
    y = np.sin(t)[:, None] * np.array([[1.0, 2.0, -0.5]])
    tq = np.linspace(0.2, 9.8, 57)
    out = native.spline_interp(t, y, tq)
    assert out.shape == (57, 3)
    # must agree with the pure-python natural spline to roundoff
    saved = interp._native
    try:
        interp._native = False
        py = interp.spline_interp(t, y, tq)
    finally:
        interp._native = saved
    np.testing.assert_allclose(out, py, atol=1e-12)
    # and reproduce a smooth function on dense knots
    td = np.linspace(0, 10, 200)
    outd = native.spline_interp(td, np.sin(td), tq)
    np.testing.assert_allclose(outd, np.sin(tq), atol=1e-6)


def test_spline_exact_on_cubic():
    t = np.linspace(0, 1, 30)
    y = 2.0 + 3 * t - t**2
    tq = np.linspace(0, 1, 101)
    out = native.spline_interp(t, y, tq)
    # natural spline is near-exact for a quadratic away from the ends
    inner = (tq > 0.15) & (tq < 0.85)
    np.testing.assert_allclose(out[inner], (2.0 + 3 * tq - tq**2)[inner],
                               atol=2e-4)


def test_banded_arrow_solver_vs_dense():
    """The C++ bordered-banded LU must match numpy's dense solve on a
    P2D-like matrix (diagonally dominant band + dense last row/col)."""
    rng = np.random.default_rng(1)
    n, kl, ku = 121, 12, 12
    A = np.zeros((n, n))
    for i in range(n - 1):
        lo, hi = max(0, i - kl), min(n - 1, i + ku + 1)
        A[i, lo:hi] = rng.standard_normal(hi - lo)
        A[i, i] += 3.0 * (kl + ku)      # diagonal dominance
    A[-1, :] = rng.standard_normal(n)
    A[:, -1] = rng.standard_normal(n)
    A[-1, -1] += 10.0
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)
    x = native.banded_arrow_solve(A, b, kl, ku)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-9)


def test_solution_interpolation_uses_native():
    """Solution.__call__ routes through the native spline when available."""
    import petlion_tpu as pt
    p = pt.petlion(pt.LCO)
    sol = pt.simulate(p, I=-1, SOC=1)
    grid = np.linspace(10.0, 3000.0, 40)
    si = sol(grid)
    assert si.t.shape == (40,)
    assert np.all(np.isfinite(si.V))
    # V on the grid lies within the simulated V range
    assert si.V.max() <= sol.V.max() + 1e-6
    assert si.V.min() >= sol.V.min() - 1e-6
