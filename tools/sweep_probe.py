"""Measure design-sweep throughput variants on the TPU.

Compares the gens/spawn-budget sweep (42x oversampled at the default config)
against the count-spawn sweep (exact per-cell sample target) across slot
counts, then times a 256-design count-mode sweep — the VERDICT r3 target is
256 designs <= 30 s including geometry (>= 30k designs/hour).

Usage: python tools/sweep_probe.py  (from the repo root, default shell)
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
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
    run_design_sweep_persistent,
)


def make_designs(n):
    base = WaveguideDesign()
    periods = np.linspace(370.0, 405.0, n)
    return [dataclasses.replace(base, lambda_ic=float(p), lambda_oc=float(p))
            for p in periods]


def main():
    cfg = TraceConfig(num_fov_x=16, num_fov_y=12, rays_per_fov=2048,
                      max_bounces=4096, seed=0, rng_mode="fast")
    out = []

    def timed(tag, n, warm=True, **kw):
        designs = make_designs(n)
        if warm:
            run_design_sweep_persistent(
                designs[:1] * min(64, n), cfg, **kw)
        t0 = time.perf_counter()
        res = run_design_sweep_persistent(designs, cfg, **kw)
        wall = time.perf_counter() - t0
        rec = {"tag": tag, "designs": n, "wall_s": round(wall, 2),
               "designs_per_hour": round(n / wall * 3600),
               "bounces": int(res.bounces.sum()),
               "best": int(np.argmax(res.efficiencies.mean(axis=1))),
               "best_eff": round(float(res.efficiencies.mean(axis=1).max()), 6)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
        return res

    # baseline: current bench config (gens + spawn budget, 42x oversampled)
    timed("gens-spawn256", 64, spawn_iters=256)
    # count mode at decreasing slot counts
    for slots in (2048, 1024, 512):
        timed(f"count-s{slots}", 64, spawn_iters=0, spawn_mode="count",
              slots=slots)
    # the 256-design target at the best slot count so far
    best = min(out[1:], key=lambda r: r["wall_s"])
    slots = int(best["tag"].split("s")[-1])
    timed(f"count-s{slots}-256", 256, warm=False, spawn_iters=0,
          spawn_mode="count", slots=slots)
    with open("/tmp/sweep_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
