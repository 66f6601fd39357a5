"""Measure per-cell splitting cost on the live device: time/cell vs P (seeds).

Sizing probe for the exact-tail hybrid (VERDICT r4 #3): how expensive is one
exact cell at the reference design, and what peak wavefront width does a
P-seed launch reach?  Run on the TPU: ``python tools/splitting_probe.py``.
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


def main():
    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=128,
                      max_bounces=100000, seed=0, rng_mode="fast",
                      ic_test="circle", pupil_sampling="r2")
    sim = Simulator(cfg=cfg, engine="splitting", geometry_simplify_tol=0.05,
                    splitting_capacity=int(os.environ.get("CAP", 8192)),
                    splitting_threshold=float(os.environ.get("THR", 1e-6)),
                    splitting_max_steps=4096)
    total = sim.L * sim.M * sim.N
    rng = np.random.default_rng(0)
    for P in (int(p) for p in os.environ.get("PS", "32,128").split(",")):
        # corner-ish + random cells (mixed tree depths)
        cells = np.sort(rng.choice(total, size=int(os.environ.get("C", 128)),
                                   replace=False)).astype(np.int64)
        t0 = time.perf_counter()
        hist, steps, n = sim.trace_batch(cells, P, 0)
        hist.block_until_ready()
        dt = time.perf_counter() - t0   # includes compile on first P
        t0 = time.perf_counter()
        hist, steps, n = sim.trace_batch(cells, P, 0)
        hist.block_until_ready()
        dt2 = time.perf_counter() - t0
        print(f"P={P} C={len(cells)}: first={dt:.2f}s warm={dt2:.3f}s "
              f"({dt2 / len(cells) * 1e3:.2f} ms/cell) steps={steps} "
              f"peak={sim.split_peak_live} trunc={sim.split_truncated:.3g} "
              f"pruned={sim.split_pruned:.3g}")


if __name__ == "__main__":
    main()
