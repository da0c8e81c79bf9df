"""Extended benchmark suite: the five BASELINE.json configurations on TPU.

(1) LCO isothermal 1C CC discharge (301 DAEs)
(2) LCO CC-CV charge with V-hold switching (in-jit protocol, batched)
(3) LCO thermal CC-CT-CV fast charge with T_max hold
(4) NMC(-chemistry LCO cell) with SEI aging, cycling with state carry-over
(5) 10k-cell GITT-style parameter sweep (chunked batches)

Prints one JSON line per config; `python bench.py` remains the single
headline metric for the driver.
"""

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", False)
    import petlion_tpu as pt
    from petlion_tpu.parallel.batch import batch_simulate
    from petlion_tpu.protocols import batch_protocol, simulate_protocol

    platform = jax.devices()[0].platform
    results = []

    def emit(name, **kw):
        out = {"config": name, "platform": platform, **kw}
        results.append(out)
        print(json.dumps(out), flush=True)

    f32tol = dict(abstol=5e-4, reltol=1e-3)

    # ---- (1) 1C CC discharge, batched ------------------------------------
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(max_save=2, maxiters=500, **f32tol)
    B = 1024
    rng = np.random.default_rng(0)
    tb = {"D_sp": 1e-14 * (1 + 0.05 * rng.standard_normal(B))}

    def run1(eps):
        r = batch_simulate(p, 3.9e3, I=-1.0, SOC=1.0,
                           theta_batch={k: v * (1 + eps) for k, v in tb.items()},
                           outputs=("t", "V"))
        jax.block_until_ready(r.flag)
        return r

    r = run1(0.0)
    ts = []
    for i in range(3):
        t0 = time.time()
        r = run1(1e-5 * (i + 1))
        ts.append(time.time() - t0)
    emit("1_cc_discharge", batch=B, rate_per_s=round(B / min(ts), 1),
         ok=float(np.isin(np.asarray(r.flag), (0, 1, 3)).mean()))

    # ---- (2) CC-CV with per-cell V-hold switching, one jit ----------------
    segs = [dict(I=2.0, V_max=4.1, SOC_max=1.0), dict(V="hold", SOC_max=1.0)]

    def run2(eps):
        rs = batch_protocol(p, segs, SOC=0.0,
                            theta_batch={"D_sn": 3.9e-14 * (1 + 0.05 * rng.standard_normal(B)) * (1 + eps)},
                            max_save=2, maxiters=500, **f32tol)
        jax.block_until_ready(rs[-1].flag)
        return rs

    rs = run2(0.0)
    ts = []
    for i in range(3):
        t0 = time.time()
        rs = run2(1e-5 * (i + 1))
        ts.append(time.time() - t0)
    cc, cv = rs
    emit("2_cc_cv_protocol", batch=B, rate_per_s=round(B / min(ts), 1),
         cc_exit_Vmax=float((np.asarray(cc.flag) == 2).mean()),
         cv_exit_SOCmax=float((np.asarray(cv.flag) == 4).mean()),
         switch_time_spread_s=float(np.asarray(cc.t_final).std()))

    # ---- (3) thermal CC-CT-CV (golden protocol), single cell --------------
    pth = pt.petlion(pt.LCO, temperature=True)
    t0 = time.time()
    sol = simulate_protocol(pth, [
        dict(I=4, V_max=4.1, T_max=40 + 273.15),
        dict(dT="hold", V_max=4.1),
        dict(V="hold"),
    ], SOC=0.0, max_save=256, **f32tol)
    wall = time.time() - t0
    emit("3_thermal_cc_ct_cv", t_sim=round(float(sol.t[-1]), 2),
         I_final=round(float(sol.I[-1]), 4),
         exit=sol.final_exit_reason(), wall_s_incl_compile=round(wall, 1),
         ref_t_sim=1865.61, ref_I_final=0.1959,
         note=("f32 limitation: the dT-hold re-initialization diverges in "
               "single precision (temperature quantization, ulp(313K)~3e-5K);"
               " the f64 path reproduces the reference trace to 0.04% — see "
               "tests/test_simulate.py::test_cc_ct_cv_protocol_golden"))

    # ---- (4) SEI aging, cycling with carry-over ---------------------------
    page = pt.petlion(pt.LCO, aging="SEI")
    t0 = time.time()
    sol = pt.simulate(page, I=1, SOC=0.3, SOC_max=0.9, V_max=4.25,
                      outputs=("t", "V", "SOH"), **f32tol)
    for _ in range(2):
        sol = pt.simulate_cont(sol, page, I=-1, SOC_min=0.3, V_min=2.8)
        sol = pt.simulate_cont(sol, page, I=1, SOC_max=0.9, V_max=4.25)
    wall = time.time() - t0
    soh = np.asarray(sol.arrays["SOH"])
    emit("4_sei_cycling", cycles=2.5, soh_final=round(float(soh[-1]), 6),
         soh_monotone=bool(np.all(np.diff(soh[:, 0]) <= 1e-12)),
         wall_s_incl_compile=round(wall, 1))

    # ---- (5) 10k-cell GITT-style sweep (chunked) ---------------------------
    p.opts = p.opts.replace(max_save=2, maxiters=500, **f32tol)
    total, chunk = 10240, 1024
    done = 0
    t0 = time.time()
    for c in range(total // chunk):
        tbc = {"D_sp": 1e-14 * (1 + 0.05 * rng.standard_normal(chunk)),
               "k_n": 5.031e-11 * (1 + 0.05 * rng.standard_normal(chunk))}
        r = batch_simulate(p, 3.9e3, I=-1.0, SOC=1.0, theta_batch=tbc,
                           outputs=("t", "V"))
        jax.block_until_ready(r.flag)
        done += int(np.isin(np.asarray(r.flag), (0, 1, 3)).sum())
    wall = time.time() - t0
    emit("5_10k_sweep", cells=total, completed=done,
         wall_s=round(wall, 1), rate_per_s=round(total / wall, 1))

    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
