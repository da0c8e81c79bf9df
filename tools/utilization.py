"""Utilization audit (round-4 VERDICT directive 7): what fraction of the
chip does the hot loop actually use, and WHY is it not higher?

Combines three fresh serial child processes (ONE process may hold the TPU
tunnel at a time):
  * cost child   — AOT-compiles the canonical batched program
                   (bench.make_runner's _batch_core, B=1024 f32) and emits
                   XLA's static cost analysis for ONE while-body trip
                   (flops, bytes accessed) plus an HLO kernel census
                   (fusions per body — tests the round-4 hypothesis that
                   the loop body is dozens of small fused kernels).
  * timed child  — `bench.py --batch-child` (rate, wall/batch, mean
                   attempts per cell, mean body trips).
  * canary child — `bench.py --canary-child` (the chip's demonstrated
                   pure-MXU FLOP/s, the utilization denominator).

Derived quantities:
  executed_flops_per_s = body_flops * body_trips / wall_per_batch
  hbm_bytes_per_s      = body_bytes * body_trips / wall_per_batch
  mxu_utilization      = executed_flops_per_s / canary_flops_per_s
  attempt_efficiency   = mean_attempts / body_trips   (lockstep-vmap waste:
                         cells that exited early still ride the body)
  accept_efficiency    = mean_steps / mean_attempts   (rejected attempts)

Writes measurements_r05/utilization.md and prints ONE JSON line.
"""

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cost_child():
    import jax
    jax.config.update("jax_enable_x64", False)
    from bench import backend_is_live, fresh_theta
    if not backend_is_live():
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import petlion_tpu as pt
    from petlion_tpu.parallel.batch import _prepare_batch, _batch_core

    platform = jax.devices()[0].platform
    p = pt.petlion(pt.LCO)
    p.opts = p.opts.replace(abstol=5e-4, reltol=1e-3, max_save=2,
                            maxiters=500)
    B = 1024 if platform != "cpu" else 32
    rng = np.random.default_rng(0)
    args, statics = _prepare_batch(p, 3.9e3, I=-1.0, SOC=1.0,
                                   theta_batch=fresh_theta(rng, B),
                                   outputs=("t", "V"))
    t0 = time.time()
    compiled = _batch_core.lower(*args, **statics).compile()
    compile_s = time.time() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = dict(ca) if ca else {}

    # kernel census from the optimized HLO: fusion computations and their
    # split across the while bodies (the round-4 "many small kernels"
    # hypothesis). HLO text is large; stream-count only.
    # NB: HLO text puts the result shape between '=' and the opcode
    # (`%x = f32[..] fusion(..)`), so match the bare opcode-call instead.
    txt = compiled.as_text()
    n_fusion = len(re.findall(r"\bfusion\(", txt))
    n_while = len(re.findall(r"\bwhile\(", txt))
    n_custom = len(re.findall(r"\bcustom-call\(", txt))
    n_dot = len(re.findall(r"\bdot\(", txt))
    out = {
        "platform": platform,
        "batch": B,
        "compile_s": round(compile_s, 1),
        "body_flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
        "bytes_out": float(ca.get("bytes accessed output", float("nan"))),
        "transcendentals": float(ca.get("transcendentals", float("nan"))),
        "hlo_fusions": n_fusion,
        "hlo_whiles": n_while,
        "hlo_custom_calls": n_custom,
        "hlo_dots": n_dot,
        "hlo_chars": len(txt),
    }
    print(json.dumps(out))


def _run_child(args, timeout):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    try:
        r = subprocess.run(args, capture_output=True, text=True,
                           timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for ln in reversed(r.stdout.strip().splitlines()):
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    return {"error": "no JSON", "stderr_tail": r.stderr[-400:]}


def main():
    py = sys.executable
    me = os.path.abspath(__file__)
    bench = os.path.join(REPO, "bench.py")

    cost = _run_child([py, me, "--cost-child"], 1800)
    timed = _run_child([py, bench, "--batch-child"], 3600)
    canary = _run_child([py, bench, "--canary-child"], 900)

    out = {"cost": cost, "timed_rate_per_s": timed.get("value"),
           "canary_tflops": canary.get("canary_tflops")}
    try:
        wall = timed["wall_s_per_batch"]
        trips = timed["mean_body_trips"]
        att = timed["mean_attempts_per_cell"]
        steps = timed["mean_steps"]
        flops, by = cost["body_flops"], cost["bytes_accessed"]
        exec_fps = flops * trips / wall
        hbm_bps = by * trips / wall
        canary_fps = canary["canary_tflops"] * 1e12
        out.update({
            "executed_flops_per_s": round(exec_fps, 1),
            "hbm_bytes_per_s": round(hbm_bps, 1),
            "mxu_utilization": round(exec_fps / canary_fps, 5),
            "attempt_efficiency": round(att / trips, 3),
            "accept_efficiency": round(steps / att, 3),
            "body_trips_per_s": round(trips / wall, 1),
            "body_wall_us": round(1e6 * wall / trips, 1),
            "flops_per_body_per_cell": round(flops / cost["batch"], 1),
        })
    except (KeyError, TypeError, ZeroDivisionError) as e:
        out["derive_error"] = repr(e)

    md_dir = os.path.join(REPO, "measurements_r05")
    os.makedirs(md_dir, exist_ok=True)
    with open(os.path.join(md_dir, "utilization.json"), "w") as f:
        json.dump({"cost": cost, "timed": timed, "canary": canary,
                   "derived": out}, f, indent=1)
    _write_md(md_dir, cost, timed, canary, out)
    print(json.dumps(out))


def _write_md(md_dir, cost, timed, canary, d):
    def g(k, default="n/a"):
        v = d.get(k)
        return v if v is not None else default

    hbm = d.get("hbm_bytes_per_s")
    body_us = d.get("body_wall_us")
    fus = cost.get("hlo_fusions")
    lines = [
        "# Utilization audit (round 5)",
        "",
        "Canonical program: batched LCO 1C discharge, B="
        f"{cost.get('batch')}, f32 (bench.make_runner).",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| measured rate | {timed.get('value')} discharges/s |",
        f"| wall per batch | {timed.get('wall_s_per_batch')} s |",
        f"| XLA body flops (1 trip, whole batch) | {cost.get('body_flops'):.3e} |",
        f"| XLA body bytes accessed | {cost.get('bytes_accessed'):.3e} |",
        f"| mean body trips / discharge | {timed.get('mean_body_trips')} |",
        f"| mean attempts / cell | {timed.get('mean_attempts_per_cell')} |",
        f"| mean accepted steps / cell | {timed.get('mean_steps')} |",
        f"| executed FLOP/s | {g('executed_flops_per_s'):.3e} |"
        if isinstance(d.get("executed_flops_per_s"), float) else
        "| executed FLOP/s | n/a |",
        f"| HBM bytes/s | {hbm:.3e} |" if isinstance(hbm, float)
        else "| HBM bytes/s | n/a |",
        f"| canary (pure-MXU) FLOP/s | {canary.get('canary_tflops')}e12 |",
        f"| MXU utilization | {g('mxu_utilization')} |",
        f"| attempt efficiency (lockstep) | {g('attempt_efficiency')} |",
        f"| accept efficiency (rejections) | {g('accept_efficiency')} |",
        f"| while-body wall | {body_us} µs |",
        f"| HLO fusions in program | {fus} |",
        f"| HLO custom-calls / dots | {cost.get('hlo_custom_calls')} / "
        f"{cost.get('hlo_dots')} |",
        "",
        "Interpretation: see PARITY.md round-5 notes.",
    ]
    with open(os.path.join(md_dir, "utilization.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    if "--cost-child" in sys.argv:
        cost_child()
    else:
        main()
