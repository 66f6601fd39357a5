"""Phase-level timing of the reference workload: where do the non-trace
seconds go?  (VERDICT r4 #4: wall 2.71 s vs trace 1.94 s.)"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import numpy as np

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import Simulator
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
    evaluate_jnp, eye_perceived_jnp,
)


def main():
    t_all = time.perf_counter()
    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=5000,
                      max_bounces=100000, seed=3, rng_mode="fast",
                      ic_test="circle")
    t0 = time.perf_counter()
    sim = Simulator(cfg=cfg, engine="pallas_persistent",
                    geometry_simplify_tol=0.05, persistent_slots=2048,
                    spawn_mode="count", fold_iterations=True,
                    pers_accum_mode="packed", pers_transit_jump=True)
    print(f"Simulator init: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    sim.run(num_iter=1, rays_per_fov=2048, cells_per_batch=4500,
            evaluate_metrics=False, histogram_device=True)
    print(f"warmup: {time.perf_counter() - t0:.2f}s")
    # warm the metric path too (compile outside the timed reps)
    for rep in range(3):
        t0 = time.perf_counter()
        res = sim.run(num_iter=4, cells_per_batch=4500,
                      evaluate_metrics=True, histogram_device=True,
                      metrics_device=True)
        wall = time.perf_counter() - t0
        print(f"rep{rep}: wall={wall:.2f}s trace={res.trace_seconds:.2f}s "
              f"overhead={wall - res.trace_seconds:.2f}s "
              f"u_eyebox={res.metrics.u_eyebox}")
    # decompose one more run by hand
    t0 = time.perf_counter()
    res = sim.run(num_iter=4, cells_per_batch=4500, evaluate_metrics=False,
                  histogram_device=True)
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    perc = eye_perceived_jnp(res.histogram)
    perc.block_until_ready()
    t_perc = time.perf_counter() - t0
    t0 = time.perf_counter()
    met = evaluate_jnp(perc, norm=5000 * 4)
    t_eval = time.perf_counter() - t0
    print(f"decomposed: run(no-metrics)={t_run:.2f}s perceive={t_perc:.2f}s "
          f"evaluate_jnp={t_eval:.2f}s total_script={time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main()
