"""MC convergence report: sampled metrics + error bars vs the exact expectation.

Uses the zero-variance splitting tracer (engine/splitting.py, per-cell
production engine) to compute the *exact* expected eyebox histogram, then
evaluates the same metrics from Monte-Carlo runs at several sample budgets with
jackknife standard errors — quantifying which metrics are converged at the
reference's default sampling (the metrics are defined at
AR_system_evaluation_functions.py:149-160).

Scales to the FULL reference grid (VERDICT r3 #1): the per-cell wavefront
engine evaluates 100 x 75 x 3 = 22,500 cells exactly in bounded memory
(cells x capacity slot chunks).  Env knobs:

  CONV_GRID=100x75      FoV grid (default 16x12 for the CPU-runnable tier)
  CONV_EXACT_POS=16     pupil launch positions per cell (position quadrature)
  CONV_EXACT_CAP=8192   per-cell wavefront capacity (trunc must stay 0)
  CONV_EXACT_THRESH=1e-6  branch weight threshold (pruned = bias bound)
  CONV_POS_BATCH=2      positions traced per pass (memory/width knob)
  CONV_CELLS_PER_BATCH=60  cells per splitting chunk (60 divides the full
                        22,500-cell grid exactly -> one compiled chunk shape;
                        measured frontier ~3.7 ms/cell on v5e at 60-64)
  CONV_BUDGETS=...      MC rays-per-fov budgets to compare

CPU-runnable at the default small grid (a few minutes); the full grid is a
TPU run (see demo_metrics.json 'exact_fullgrid').
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# runs on whatever backend is active (TPU via sitecustomize in the default
# shell — fastest; CPU with JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= on the
# command line, where the persistent kernel switches to interpret mode)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if os.environ["JAX_PLATFORMS"] == "cpu":
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
    EvalConfig, TraceConfig,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
    generate_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
    Simulator,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import (
    make_synthetic_luts,
)

_grid = os.environ.get("CONV_GRID", "16x12")
M, N = (int(v) for v in _grid.split("x"))


def exact_metrics(geom, luts, cfg, eval_cfg):
    """Exact branch expectation via the per-cell splitting engine.

    Zero-variance over the branch tree; still a quadrature over
    ``CONV_EXACT_POS`` launch positions in the in-coupler pupil.  Against MC
    (which samples thousands of positions) the residual position-quadrature
    offset is a few percent on efficiencies — compare uniformity/dispersion
    estimator *bias* with it, not absolute efficiency.  ``truncated`` must be
    exactly 0 for the zero-variance guarantee; ``pruned`` bounds the
    downward bias of the threshold."""
    n_pos = int(os.environ.get("CONV_EXACT_POS", 16))
    pos_batch = int(os.environ.get("CONV_POS_BATCH", 2))
    cap = int(os.environ.get("CONV_EXACT_CAP", 8192))
    thresh = float(os.environ.get("CONV_EXACT_THRESH", 1e-6))
    sim = Simulator(
        cfg=cfg, geom=geom, luts=luts, engine="splitting",
        splitting_capacity=cap, splitting_threshold=thresh,
        splitting_max_steps=1024)
    cpb = int(os.environ.get("CONV_CELLS_PER_BATCH", 60))
    t0 = time.perf_counter()
    res = sim.run(rays_per_fov=pos_batch,
                  num_iter=max(1, n_pos // pos_batch),
                  cells_per_batch=cpb,
                  evaluate_metrics=True, eval_cfg=eval_cfg)
    wall = time.perf_counter() - t0
    m = res.metrics
    return {
        "eff_B": res.efficiencies["B"], "eff_G": res.efficiencies["G"],
        "eff_R": res.efficiencies["R"], "delta_e": m.delta_e,
        "u_fov": m.u_fov, "u_eyebox": m.u_eyebox,
        "pruned_weight": sim.split_pruned,
        "truncated_weight": sim.split_truncated,
        "peak_live": sim.split_peak_live,
        "capacity": cap, "threshold": thresh,
        "positions_per_cell": pos_batch * max(1, n_pos // pos_batch),
        "launch_weight": res.rays_traced,
        "pruned_frac_of_launch": sim.split_pruned / max(res.rays_traced, 1),
        "wall_s": round(wall, 2),
        "starved_eye_positions": m.starved_eye_positions,
    }


def mc_metrics(geom, cfg, rpf, groups=4):
    sim = Simulator(cfg=cfg, geom=geom, engine="pallas_persistent",
                    interpret=(os.environ["JAX_PLATFORMS"] == "cpu"),
                    geometry_simplify_tol=0.05,
                    persistent_slots=min(2048, rpf), spawn_mode="count")
    res = sim.run(rays_per_fov=rpf, num_iter=groups, error_groups=True,
                  cells_per_batch=min(3 * M * N, 2048),
                  histogram_device=False)
    return {
        "rays_per_fov_total": rpf * groups,
        "eff_B": res.efficiencies["B"], "eff_G": res.efficiencies["G"],
        "eff_R": res.efficiencies["R"], "delta_e": res.metrics.delta_e,
        "u_fov": res.metrics.u_fov, "u_eyebox": res.metrics.u_eyebox,
        "stderr": res.metric_stderr,
    }


def main():
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=64,
                      max_bounces=4096, seed=0, rng_mode="fast",
                      ic_test="circle")
    eval_cfg = EvalConfig()
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom, seed=cfg.seed + 1234)

    out = {"grid": [M, N],
           "exact": exact_metrics(geom, luts, cfg, eval_cfg)}
    print(json.dumps({"exact": out["exact"]}), flush=True)
    budgets = [int(b) for b in os.environ.get(
        "CONV_BUDGETS", "1250,5000,20000").split(",")]
    out["mc"] = []
    for rpf in budgets:
        rec = mc_metrics(geom, cfg, rpf)
        out["mc"].append(rec)
        print(json.dumps(rec), flush=True)
    with open("/tmp/convergence_report.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
