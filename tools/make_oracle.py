"""Generate the stored trace-fidelity oracle (tests/data/oracle_lco_1c.npz).

A CPU-f64 rtol=1e-8/abstol=1e-10 LCO 1C discharge — far below every
tolerance the tests run at — densely recorded and re-interpolated onto a
fixed time grid. `tests/test_trace_fidelity.py` compares default-tolerance
and f32 runs POINTWISE against this trace (max-over-trace error), which is
the operational meaning of BASELINE.json's 1e-6-rtol trace-fidelity target
(the PETLION trace itself cannot be regenerated without Julia; the
tolerance-convergence test establishes that this self-oracle is converged).

Reference oracle source: examples/getting_started.ipynb recorded outputs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import petlion_tpu as pt  # noqa: E402


def main():
    p = pt.petlion(pt.LCO)
    sol = pt.simulate(p, I=-1, SOC=1, reltol=1e-8, abstol=1e-10,
                      max_save=16384, outputs=("t", "V", "c_e", "c_s_avg"))
    assert sol.final_exit_reason() == "Below min. SOC", sol.final_exit_reason()
    assert not sol.results[-1].truncated
    t_end = float(sol.t[-1])
    print(f"oracle run: t_end={t_end:.4f} s, V_end={sol.V[-1]:.6f} V, "
          f"steps={sol.results[-1].n_steps}")
    # fixed comparison grid: inside (0, t_end) with margin so every test run
    # (whose exit time differs by O(tolerance)) covers it
    t_grid = np.linspace(10.0, t_end - 10.0, 512)
    dense = sol(t_grid)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "oracle_lco_1c.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, t=t_grid, V=dense.V, c_e=dense.arrays["c_e"],
        c_s_avg=dense.arrays["c_s_avg"],
        t_end=t_end, V_end=float(sol.V[-1]),
        reltol=1e-8, abstol=1e-10)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
