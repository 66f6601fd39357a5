"""Probe the reference-default workload under the count-spawn kernel.

Measures wall/trace time of the exact reference workload
(gpu_ray_tracing_pro_fullColor.py:60-63,905: 100x75x3 cells, 5,000 rays/FoV,
num_iter=4, 1e5 bounce bound, full metrics) for a set of slot counts, with
iteration folding + count-based respawn, and dumps per-cell iteration/bounce
counters for one batch so the drain tail is visible.

Reps use distinct cfg seeds (the axon relay dedups bit-identical dispatches)
and share the compiled kernel cache across Simulators.

Usage: python tools/ref_workload_probe.py [slots ...]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import Simulator


def probe(slots: int, reps: int = 2, spawn_mode: str = "count",
          fold: bool = True):
    accum = os.environ.get("PROBE_ACCUM", "fma")
    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=5000,
                      max_bounces=100000, seed=0, rng_mode="fast",
                      ic_test="circle",
                      pupil_sampling=os.environ.get("PROBE_SAMPLING",
                                                    "uniform"))
    s0 = Simulator(cfg=cfg, engine="pallas_persistent",
                   geometry_simplify_tol=0.05, persistent_slots=slots,
                   spawn_mode=spawn_mode, fold_iterations=fold,
                   pers_accum_mode=accum)
    # warm-up: same grid shapes + kernel, small target
    t0 = time.perf_counter()
    s0.run(num_iter=1, rays_per_fov=min(2048, slots), cells_per_batch=4500,
           evaluate_metrics=False, histogram_device=True)
    t_warm = time.perf_counter() - t0

    out = {"slots": slots, "spawn_mode": spawn_mode, "fold": fold,
           "warm_s": round(t_warm, 1), "runs": []}
    sims = [s0]
    for rep in range(1, reps):
        s = Simulator(cfg=dataclasses.replace(cfg, seed=rep),
                      engine="pallas_persistent", geom=s0.geom, luts=s0.luts,
                      geometry_simplify_tol=0.05, persistent_slots=slots,
                      spawn_mode=spawn_mode, fold_iterations=fold,
                      pers_accum_mode=accum)
        s._pers_cache = s0._pers_cache  # kernel is seed-independent
        sims.append(s)
    for rep, s in enumerate(sims):
        t0 = time.perf_counter()
        res = s.run(num_iter=4, cells_per_batch=4500, evaluate_metrics=True,
                    histogram_device=True, metrics_device=True)
        wall = time.perf_counter() - t0
        out["runs"].append({
            "rep": rep, "wall_s": round(wall, 2),
            "trace_s": round(res.trace_seconds, 2),
            "rays": res.rays_traced, "bounces": res.total_bounces,
            "bounces_per_sec": round(res.bounces_per_second),
            "eff_G": round(res.efficiencies.get("G", 0.0), 6),
            "u_fov": round(res.metrics.u_fov, 5) if res.metrics else None,
            "u_eyebox": (round(res.metrics.u_eyebox, 5)
                         if res.metrics else None),
            "starved": (res.metrics.starved_eye_positions
                        if res.metrics else None),
        })
        print(json.dumps(out["runs"][-1]), flush=True)

    # per-cell diagnosis on one 4500-cell batch (first batch, rep-0 seeds)
    import jax

    chunk = np.arange(4500)
    rpf = 20000 if fold else 5000
    slots_eff, gens = s0._slots_gens(rpf)
    rt = slots_eff // 128
    cpb = s0._pers_cpb if len(chunk) % s0._pers_cpb == 0 else 1
    rays_in, rng_in = s0._device_ray_blocks(chunk, slots_eff, 0, cpb=cpb)
    cp_sel = s0._cp_dev[:4500]
    kw = {}
    if getattr(s0, "_cpk_dev", None) is not None:
        kw["cell_params_packed"] = s0._cpk_dev[:4500]
    tiles, nb = s0._pers_fn(rt, cpb)(cp_sel, s0._gr, rays_in, rng_in,
                                     s0._pers_ctrl(gens, rpf), **kw)
    nb = np.asarray(jax.block_until_ready(nb))
    iters = nb[:, 1].astype(np.float64)
    bounces = nb[:, 0].astype(np.float64)
    util = bounces / np.maximum(iters * slots_eff, 1)
    out["cell_stats"] = {
        "iters": {"mean": round(iters.mean(), 1),
                  "p50": round(float(np.percentile(iters, 50)), 1),
                  "p90": round(float(np.percentile(iters, 90)), 1),
                  "p99": round(float(np.percentile(iters, 99)), 1),
                  "max": int(iters.max())},
        "util": {"mean": round(float(util.mean()), 4),
                 "min": round(float(util.min()), 4)},
        "spawned_mean": round(float(nb[:, 2].mean()), 1),
        "target": rpf,
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    slot_list = [int(a) for a in sys.argv[1:]] or [2048, 1024]
    results = [probe(s) for s in slot_list]
    with open("/tmp/ref_probe.json", "w") as f:
        json.dump(results, f, indent=1)
