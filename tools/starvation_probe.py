"""Empirics for the tail-boost hybrid: distribution of per-(cell, eye-window)
MC deposit counts at the reference budget.

Runs the reference workload once (persistent kernel, count-spawn, folded
iterations), pulls the 2 MB perception stack of RAW deposit counts, and prints
how many (cell, window) pairs sit below candidate tau thresholds — the
selected-set size and boost-tier cost model for engine/hybrid.py.
"""

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
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
    eye_perceived_jnp,
)


def main():
    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=5000,
                      max_bounces=100000, seed=7, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="pallas_persistent",
                    geometry_simplify_tol=0.05, persistent_slots=2048,
                    spawn_mode="count", fold_iterations=True,
                    pers_accum_mode="packed", pers_transit_jump=True)
    sim.run(num_iter=1, rays_per_fov=2048, cells_per_batch=4500,
            evaluate_metrics=False, histogram_device=True)  # warm-up
    t0 = time.perf_counter()
    res = sim.run(num_iter=4, cells_per_batch=4500, evaluate_metrics=False,
                  histogram_device=True)
    perc = np.asarray(eye_perceived_jnp(res.histogram))  # raw counts
    print(f"trace+perceive {time.perf_counter() - t0:.2f}s "
          f"rays={res.rays_traced}")
    np.save("/tmp/pilot_perc.npy", perc)
    L, fy, fx, py, px = perc.shape
    comb = perc.sum(axis=0)                 # (fy, fx, py, px) lambda-combined
    worst = comb.min(axis=(2, 3))           # (fy, fx) worst window per group
    for tau in (1, 5, 10, 20, 50, 100):
        groups = int((worst < tau).sum())
        pairs = int((comb < tau).sum())
        print(f"tau={tau:4d}: groups={groups:6d}/{fy * fx} pairs={pairs}")
    for tau_t in (20, 30):
        w = worst.reshape(-1)
        sel = w < 2 * tau_t
        boost = np.clip(4.0 * tau_t / np.maximum(w[sel], 0.5), 4, 4096)
        tiers = 4.0 ** np.ceil(np.log(boost) / np.log(4.0))
        cost = 3 * tiers.sum() * 20000  # all 3 lambda cells per group
        u, c = np.unique(tiers, return_counts=True)
        print(f"tau_target={tau_t}: groups={int(sel.sum())} "
              f"boost-rays={cost:.3g} tiers={dict(zip(u.astype(int), c))}")
    starved = np.argwhere((comb == 0).any(axis=(0, 1)))
    print("starved positions (combined):", starved.tolist())


if __name__ == "__main__":
    main()
