"""Full-scale capability demos (BASELINE configs 3 and 5, run on TPU):

- DEMO_CONV=1  (default): convergence-grade run — 1e6 rays/FoV on the dense
  100x75x3 grid with full metric evaluation.
- DEMO_SWEEP=1 (default): 256-design batched sweep on the persistent kernel,
  reported as designs/hour.
- DEMO_DENSE=1 (default): reference default workload with the DENSE
  eye-position scan — metrics at every valid pupil position (the reference's
  convolve2d version is commented out as too slow,
  AR_system_evaluation_functions.py:77-89).

Prints one JSON object per enabled demo.  These are the capabilities the
reference cannot express (its driver hard-codes one design and ~5e3 rays/FoV,
gpu_ray_tracing_pro_fullColor.py:16-63).
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

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
    TraceConfig, WaveguideDesign,
)

out = {}

if os.environ.get("DEMO_CONV", "1") != "0":
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=1_000_000,
                      max_bounces=100000, seed=0, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="pallas_persistent",
                    geometry_simplify_tol=0.05, persistent_slots=4096,
                    spawn_mode="count", pers_accum_mode="packed",
                    pers_transit_jump=True)
    t0 = time.perf_counter()
    res = sim.run(num_iter=1, cells_per_batch=4500, evaluate_metrics=True,
                  histogram_device=True, dense_metrics=True)
    wall = time.perf_counter() - t0
    out["convergence_1e6"] = {
        "wall_s": round(wall, 1),
        "rays_traced": res.rays_traced,
        "total_bounces": res.total_bounces,
        "bounces_per_sec": round(res.bounces_per_second),
        "efficiency": {k: round(v, 6) for k, v in res.efficiencies.items()},
        "delta_e": round(res.metrics.delta_e, 3),
        "u_fov": round(res.metrics.u_fov, 5),
        "u_eyebox": round(res.metrics.u_eyebox, 5),
        # the dense 4,641-position scan at 200x the reference sampling: how
        # many eyebox-edge pupil positions remain MC-dark when converged
        "dense_u_fov": round(res.dense.u_fov, 5),
        "dense_u_eyebox": round(res.dense.u_eyebox, 5),
        "dense_starved_eye_positions": res.dense.starved_eye_positions,
    }
    print(json.dumps(out), flush=True)

if os.environ.get("DEMO_EXACT", "1") != "0":
    # Exact transport over the FULL reference grid (VERDICT r4 #2): the
    # per-cell splitting engine evaluates every 100x75x3 cell's complete
    # branch expectation — the capability the reference's dead splitting
    # kernel (GPU_ray_tracing_functions.py:193-417) was written for but
    # never reached at this scale.  Zero-variance claim requires
    # truncated_weight == 0; pruned_weight bounds the threshold bias.
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    n_pos = int(os.environ.get("DEMO_EXACT_POS", 16))
    pos_batch = 2
    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=pos_batch,
                      max_bounces=4096, seed=0, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="splitting", splitting_capacity=8192,
                    splitting_threshold=1e-6, splitting_max_steps=1024)
    t0 = time.perf_counter()
    res = sim.run(rays_per_fov=pos_batch, num_iter=n_pos // pos_batch,
                  cells_per_batch=60, evaluate_metrics=True)
    wall = time.perf_counter() - t0
    out["exact_fullgrid"] = {
        "wall_s": round(wall, 1),
        "cells": 3 * 100 * 75,
        "positions_per_cell": n_pos,
        "truncated_weight": sim.split_truncated,
        "pruned_weight": round(sim.split_pruned, 4),
        "pruned_frac_of_launch": round(
            sim.split_pruned / max(res.rays_traced, 1), 6),
        "peak_live": sim.split_peak_live,
        "capacity": 8192,
        "threshold": 1e-6,
        "efficiency": {k: round(v, 6) for k, v in res.efficiencies.items()},
        "delta_e": round(res.metrics.delta_e, 3),
        "u_fov": round(res.metrics.u_fov, 5),
        "u_eyebox": round(res.metrics.u_eyebox, 5),
        "starved_eye_positions": res.metrics.starved_eye_positions,
    }
    print(json.dumps(out), flush=True)

if os.environ.get("DEMO_DENSE", "1") != "0":
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
        evaluate_dense,
    )

    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=5000,
                      max_bounces=100000, seed=0, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="pallas_persistent",
                    geometry_simplify_tol=0.05, persistent_slots=2048,
                    spawn_mode="count", fold_iterations=True,
                    pers_accum_mode="packed", pers_transit_jump=True)
    t0 = time.perf_counter()
    res = sim.run(num_iter=4, cells_per_batch=4500, evaluate_metrics=True,
                  histogram_device=True, metrics_device=True,
                  dense_metrics=True)
    wall = time.perf_counter() - t0
    # warm re-timing of the dense pass alone (value-independent cost)
    t0 = time.perf_counter()
    evaluate_dense(res.histogram, norm=1.0, chunk_rows=8)
    dense_s = time.perf_counter() - t0
    d = res.dense
    out["dense_eyebox_ref_workload"] = {
        "wall_s": round(wall, 1),
        "dense_eval_s": round(dense_s, 2),
        "eye_positions": list(d.eye_luminance.shape),
        "dense_delta_e": round(d.delta_e, 3),
        "dense_u_fov": round(d.u_fov, 5),
        "dense_u_eyebox": round(d.u_eyebox, 5),
        "dense_starved_eye_positions": d.starved_eye_positions,
        "sampled_delta_e": round(res.metrics.delta_e, 3),
        "sampled_u_fov": round(res.metrics.u_fov, 5),
    }
    print(json.dumps(out), flush=True)

if os.environ.get("DEMO_JOINT", "1") != "0":
    # Production-scale inverse design (VERDICT r4 #6): jointly optimize the
    # IC grating (pitch, orientation) AND every FC/OC strip's apodization
    # amplitude against pupil-integrated eyebox uniformity + efficiency
    # (opt/grating_opt.py, differentiable splitting surrogate), then score
    # the before/after designs EXACTLY on the full 100x75x3 grid with the
    # fast per-cell splitting engine, including the dense eye-position scan
    # and before/after dense luminance maps.  The reference's only design
    # loop is editing source constants (couplers_coor.py:124-188).
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.opt.grating_opt import (
        optimize_grating,
    )

    cfg_o = TraceConfig(num_fov_x=24, num_fov_y=18, rays_per_fov=8,
                        max_bounces=2048, seed=0, rng_mode="fast",
                        ic_test="circle")
    sim_o = Simulator(cfg=cfg_o, engine="jnp")
    t0 = time.perf_counter()
    steps = int(os.environ.get("DEMO_JOINT_STEPS", 40))
    # eff_weight 3: the first recorded run (eff_weight 1) bought its +46%
    # exact u_eyebox with a 3x efficiency drop — a Pareto point, but the
    # balanced default should hold efficiency while flattening the eyebox
    # tied knobs move both couplers as a unit, preserving the k-closure's
    # IC<->OC symmetry: single-coupler knobs optimized the surrogate but
    # collapsed exact full-grid efficiency ~3x on re-generation (the
    # surrogate freezes footprints and cannot see the detuning — exactly
    # the failure mode the exact after-eval exists to catch)
    opt_names = tuple(p for p in os.environ.get(
        "DEMO_JOINT_OPT_PARAMS", "lambda_tied,phi_tied").split(",") if p)
    r = optimize_grating(sim_o.geom, sim_o.tables, sim_o.tgeom, cfg_o,
                         opt_params=opt_names,
                         steps=steps, learning_rate=0.01, rays_per_fov=8,
                         capacity=16384, fixed_steps=64,
                         weight_threshold=1e-4, apodize=True, pupil_bins=24,
                         eff_weight=float(
                             os.environ.get("DEMO_JOINT_EFFW", 3.0)),
                         # s0 = sigmoid(4) = 0.982: the apodization knobs
                         # start ~at the unapodized stack (the exact_before
                         # baseline), so Adam dims strips SELECTIVELY —
                         # the old 0.88 start pre-dimmed every strip vs the
                         # s=1 reference before the optimizer ever moved
                         apod_theta0=float(
                             os.environ.get("DEMO_JOINT_THETA0", 4.0)),
                         param_box=float(
                             os.environ.get("DEMO_JOINT_BOX", 0.03)))
    opt_s = time.perf_counter() - t0

    def _exact_full(design, s_fc=None, s_oc=None, png=None):
        cfg_e = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=2,
                            max_bounces=4096, seed=0, rng_mode="fast",
                            ic_test="circle")
        sim = Simulator(design=design, cfg=cfg_e, engine="splitting",
                        splitting_capacity=8192, splitting_threshold=1e-6,
                        splitting_max_steps=1024)
        if s_fc is not None:
            # numpy mirror of opt.grating_opt.apply_apodization (branch B of
            # FC, branches B+C of OC scale per strip)
            sim.tables.fc_jones[1] *= np.asarray(s_fc)[:, None, None, None,
                                                       None]
            sim.tables.oc_jones[1:] *= np.asarray(s_oc)[None, :, None, None,
                                                        None, None]
        t1 = time.perf_counter()
        res = sim.run(rays_per_fov=2,
                      num_iter=int(os.environ.get("DEMO_JOINT_POS", 8)) // 2,
                      cells_per_batch=60, evaluate_metrics=True,
                      dense_metrics=True)
        wall = time.perf_counter() - t1
        if png:
            from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.image import (
                save_eyebox_luminance_map,
            )

            save_eyebox_luminance_map(png, res.dense.eye_luminance)
        return {
            "wall_s": round(wall, 1),
            "truncated_weight": sim.split_truncated,
            "efficiency": {k: round(v, 6) for k, v in res.efficiencies.items()},
            "delta_e": round(res.metrics.delta_e, 3),
            "u_fov": round(res.metrics.u_fov, 5),
            "u_eyebox": round(res.metrics.u_eyebox, 5),
            "dense_u_eyebox": round(res.dense.u_eyebox, 5),
            "dense_delta_e": round(res.dense.delta_e, 3),
            "dense_starved_eye_positions": res.dense.starved_eye_positions,
        }

    base_design = sim_o.geom.design
    after_design = dataclasses.replace(base_design, **r.params)
    out["joint_design_opt"] = {
        "steps": steps,
        "opt_wall_s": round(opt_s, 1),
        "loss": [round(float(r.loss_history[0]), 4),
                 round(float(r.loss_history[-1]), 4)],
        "surrogate_efficiency": [round(r.efficiency[0], 6),
                                 round(r.efficiency[1], 6)],
        "surrogate_nonuniformity": [round(r.nonuniformity[0], 4),
                                    round(r.nonuniformity[1], 4)],
        "params_before": {k: getattr(base_design, k) for k in r.params},
        "params_after": {k: round(v, 4) for k, v in r.params.items()},
        "s_fc": [round(float(v), 3) for v in r.s_fc],
        "s_oc": [round(float(v), 3) for v in r.s_oc],
    }
    if os.environ.get("DEMO_JOINT_NO_BEFORE", "0") != "1":
        # the before-design eval is base-design-only (seed-deterministic):
        # skippable when a recorded run already carries it
        out["joint_design_opt"]["exact_before"] = _exact_full(
            base_design, png="eyebox_luminance_before.png")
    out["joint_design_opt"]["exact_after"] = _exact_full(
        after_design, s_fc=r.s_fc, s_oc=r.s_oc,
        png=os.environ.get("DEMO_JOINT_AFTER_PNG",
                           "eyebox_luminance_after.png"))
    print(json.dumps(out), flush=True)

if os.environ.get("DEMO_SWEEP", "1") != "0":
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = WaveguideDesign()
    periods = np.linspace(368.0, 408.0, 256)
    designs = [
        dataclasses.replace(base, lambda_ic=float(p), lambda_oc=float(p))
        for p in periods
    ]
    cfg = TraceConfig(num_fov_x=16, num_fov_y=12, rays_per_fov=2048,
                      max_bounces=4096, seed=0, rng_mode="fast")
    # count-spawn sweep at the exact per-cell sample target, bench settings
    # (slots=2048 = one generation per lane, 16-design pipelined chunks);
    # warm the chunk-sized grid the timed run dispatches
    kw = dict(spawn_iters=0, spawn_mode="count", slots=2048,
              designs_per_batch=16)
    run_design_sweep_persistent(designs[:1] * 64, cfg, **kw)
    t0 = time.perf_counter()
    res = run_design_sweep_persistent(designs, cfg, **kw)
    wall = time.perf_counter() - t0
    best = int(np.argmax(res.efficiencies.mean(axis=1)))
    out["sweep_256"] = {
        "designs": 256, "wall_s": round(wall, 1),
        "designs_per_hour": round(256 / wall * 3600),
        "total_bounces": int(res.bounces.sum()),
        "best_period_nm": round(designs[best].lambda_ic, 2),
        "best_mean_efficiency": round(float(res.efficiencies[best].mean()), 6),
    }
    print(json.dumps(out), flush=True)
