"""MC convergence report: sampled metrics + error bars vs the exact expectation.

Uses the zero-variance splitting tracer (engine/splitting.py) to compute the
*exact* expected eyebox histogram on a reduced FoV grid, then evaluates the
same metrics from Monte-Carlo runs at several sample budgets with jackknife
standard errors — quantifying which metrics are converged at the reference's
default sampling (VERDICT r2 weak item 5; the metrics are defined at
AR_system_evaluation_functions.py:149-160).

CPU-runnable: python tools/convergence_report.py  (takes a few minutes).
"""

import json
import os
import sys

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
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding, splitting, trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
    Simulator,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
    evaluate,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import (
    make_synthetic_luts,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)

M, N = 16, 12


def exact_metrics(geom, tables, tgeom, cfg, eval_cfg):
    """Exact branch expectation via the splitting tracer.  Cells chunk so the
    wavefront buffer never truncates (the zero-variance guarantee needs
    truncated_weight ~ 0).

    Caveat: "exact" is exact over the *branch tree* (no roulette variance),
    but still a quadrature over ``cfg.rays_per_fov`` launch positions in the
    in-coupler pupil (default 64; CONV_EXACT_CHUNK/CAP trade positions for
    wall).  Against MC (which samples thousands of positions) the residual
    position-quadrature offset is a few percent on efficiencies — compare
    uniformity/dispersion estimator *bias* with it, not absolute efficiency."""
    n_cells = 3 * M * N
    # default chunk keeps seeds/chunk ~ constant as CONV_EXACT_POS grows, so
    # the wavefront buffer never truncates (zero-variance needs trunc ~ 0)
    default_chunk = max(1, 6 * 64 // max(cfg.rays_per_fov, 1))
    per_chunk = int(os.environ.get("CONV_EXACT_CHUNK", default_chunk))
    hist = None
    pruned = truncated = 0.0
    n0 = 0
    trace = splitting.make_splitting_trace_fn(
        tables, tgeom, cfg,
        capacity=int(os.environ.get("CONV_EXACT_CAP", 1 << 16)),
        weight_threshold=float(os.environ.get("CONV_EXACT_THRESH", 1e-6)),
        max_steps=1024)
    import jax

    for start in range(0, n_cells, per_chunk):
        cells = np.arange(start, min(start + per_chunk, n_cells))
        batch = seeding.build_ray_batch(geom, cfg, cell_ids=cells)
        rays0 = trace_jnp.make_ray_state(
            batch["x"], batch["y"], batch["te"], batch["tm"], batch["cid"],
            batch["idx"], batch["rng"])
        h, out_w, trunc, pr, _ = jax.block_until_ready(trace(rays0))
        if start % (50 * per_chunk) == 0:
            print(f"exact: cells {start}/{n_cells} trunc={truncated:.3g}",
                  file=sys.stderr, flush=True)
        ny, nx = cfg.eyebox_bins
        h = np.asarray(h).reshape(3, N, M, ny, nx)
        hist = h if hist is None else hist + h
        pruned += float(pr)
        truncated += float(trunc)
        n0 += len(batch["x"])
    # per-launch-position expectation; normalize like the MC pipeline
    hist = hist * (3 * M * N / n0)
    m = evaluate(hist, eval_cfg)
    effs = hist.sum(axis=(1, 2, 3, 4)) * 3 / (3 * M * N)
    return {"eff_B": float(effs[0]), "eff_G": float(effs[1]),
            "eff_R": float(effs[2]), "delta_e": m.delta_e, "u_fov": m.u_fov,
            "u_eyebox": m.u_eyebox, "pruned_weight": pruned,
            "truncated_weight": truncated}


def mc_metrics(geom, cfg, rpf, groups=4):
    sim = Simulator(cfg=cfg, geom=geom, engine="pallas_persistent",
                    interpret=(os.environ["JAX_PLATFORMS"] == "cpu"),
                    geometry_simplify_tol=0.05,
                    persistent_slots=min(2048, rpf), spawn_mode="count")
    res = sim.run(rays_per_fov=rpf, num_iter=groups, error_groups=True,
                  cells_per_batch=3 * M * N, histogram_device=False)
    return {
        "rays_per_fov_total": rpf * groups,
        "eff_B": res.efficiencies["B"], "eff_G": res.efficiencies["G"],
        "eff_R": res.efficiencies["R"], "delta_e": res.metrics.delta_e,
        "u_fov": res.metrics.u_fov, "u_eyebox": res.metrics.u_eyebox,
        "stderr": res.metric_stderr,
    }


def main():
    # CONV_EXACT_POS: pupil launch positions per cell for the exact pass.
    # 64 leaves a few-percent position-quadrature offset vs MC (README);
    # on TPU 512-1024 is affordable and shrinks it ~ 1/sqrt(P).
    n_pos = int(os.environ.get("CONV_EXACT_POS", 64))
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=n_pos,
                      max_bounces=4096, seed=0, rng_mode="fast",
                      ic_test="circle")
    eval_cfg = EvalConfig()
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom, seed=cfg.seed + 1234)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=1e-3)

    out = {"grid": [M, N],
           "exact": exact_metrics(geom, tables, tgeom, cfg, eval_cfg)}
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
