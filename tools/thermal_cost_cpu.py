"""Batched thermal / SEI cost relative to isothermal, measured on CPU.

Round-4 VERDICT directive 4 asks what a batched thermal (f32 dense
RefinedLU path, plan.py) and a batched NMC+SEI discharge cost RELATIVE to
the isothermal fast path. The absolute TPU rates belong in
BENCH_SUITE.json rows 3b/4b; this tool measures the platform-consistent
per-cell cost *ratios* on CPU (same code paths, same plan routing, f32)
so the relative claim does not depend on remote-TPU tunnel availability.

All three programs run in ONE process, same batch size, full 1C
discharges (no chunking needed off the tunnel), fresh +-5% theta per rep.
Prints one JSON line and writes measurements_r05/thermal_cost_cpu.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import petlion_tpu as pt  # noqa: E402
from petlion_tpu.parallel.batch import batch_simulate  # noqa: E402
from bench import fresh_theta  # noqa: E402

B = int(os.environ.get("PETLION_COST_B", "8"))
REPS = 2
F32TOL = dict(abstol=5e-4, reltol=1e-3, max_save=2, maxiters=500)


def time_config(p, rng, swept=None):
    def run(seed):
        r = np.random.default_rng(seed)
        tb = (fresh_theta(r, B) if swept is None else
              {k: v * (1 + 0.05 * r.standard_normal(B))
               for k, v in swept.items()})
        res = batch_simulate(p, 3.9e3, I=-1.0, SOC=1.0, theta_batch=tb,
                             outputs=("t", "V"), **F32TOL)
        jax.block_until_ready(res.flag)
        return res

    run(0)                       # compile + warmup
    ts, last = [], None
    for i in range(REPS):
        t0 = time.time()
        last = run(1 + i)
        ts.append(time.time() - t0)
    flags = np.asarray(last.flag)
    att = float((np.asarray(last.n_steps) + np.asarray(last.n_rejected)).mean())
    return {"wall_s": round(statistics.median(ts), 2),
            "per_cell_ms": round(statistics.median(ts) / B * 1e3, 1),
            "ok": float(np.isin(flags, (0, 1, 3)).mean()),
            "attempts_per_cell": round(att, 1)}


def main():
    rng = np.random.default_rng(99)
    out = {"platform": jax.devices()[0].platform, "batch": B, "reps": REPS}

    p_iso = pt.petlion(pt.LCO)
    out["isothermal"] = time_config(p_iso, rng)

    p_th = pt.petlion(pt.LCO, temperature=True)
    out["thermal"] = time_config(p_th, rng)

    p_sei = pt.petlion(pt.NMC, aging="SEI")
    swept = {k: p_sei.theta[k] for k in ("D_sp", "D_sn", "k_p", "k_n")}
    out["sei"] = time_config(p_sei, rng, swept=swept)

    iso = out["isothermal"]["per_cell_ms"]
    out["thermal_cost_vs_isothermal"] = round(
        out["thermal"]["per_cell_ms"] / iso, 2)
    out["sei_cost_vs_isothermal"] = round(out["sei"]["per_cell_ms"] / iso, 2)
    print(json.dumps(out))
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "measurements_r05",
        "thermal_cost_cpu.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
