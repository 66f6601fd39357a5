"""Kernel-level throughput probe for the persistent engine (TPU).

Times the raw persistent-kernel dispatch (no histogram assembly, no metric
pass) across a (slots x spawn-budget) grid.  Two relay-specific cautions are
baked in, learned the hard way (see STATUS.md):

- *dedup-proof timing*: the axon relay can return cached results for
  bit-identical repeat dispatches, so every timed rep perturbs the RNG
  buffer (+rep).  Work differs statistically by <0.1%; throughput is
  unaffected.
- *enqueue-time returns*: ``block_until_ready`` can return at enqueue time
  through the relay, so completion is forced with a small host readback of
  the per-cell bounce counters (72 KB).

Usage: ``python tools/measure_kernel.py [slots:spawn ...]``
(defaults: 2048:4096 4096:4096).  Prints one JSON line per case.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
    Simulator,
)


def kernel_case(slots: int, spawn: int, cells: int = 4500, reps: int = 3):
    cfg = TraceConfig(num_fov_x=100, num_fov_y=75, rays_per_fov=slots,
                      max_bounces=4096, seed=0, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="pallas_persistent",
                    geometry_simplify_tol=0.05, persistent_slots=slots,
                    cond_interval=int(os.environ.get("BENCH_COND_INTERVAL", 8)),
                    spawn_iters=spawn,
                    pers_accum_mode=os.environ.get("BENCH_ACCUM", "fma"))
    chunk = np.arange(cells)
    s, gens = sim._slots_gens(slots)
    rays_in, rng_in = sim._device_ray_blocks(chunk, s, 0)
    rt = s // 128
    cp_sel = jax.lax.dynamic_slice_in_dim(sim._cp_dev, 0, len(chunk))
    kw = {}
    if getattr(sim, "_cpk_dev", None) is not None:
        kw["cell_params_packed"] = jax.lax.dynamic_slice_in_dim(
            sim._cpk_dev, 0, len(chunk))
    fn = sim._pers_fn(rt)
    ctrl = jnp.asarray([gens, spawn], jnp.int32)
    # warm + force completion via a host readback
    _, nbw = fn(cp_sel, sim._gr, rays_in, rng_in, ctrl, **kw)
    np.asarray(nbw)
    best = None
    bounces = None
    for rep in range(reps):
        rng2 = rng_in + jnp.uint32(rep + 1)
        np.asarray(rng2[0, 0, :1])  # perturbation completes outside the timer
        t0 = time.perf_counter()
        tiles, nb = fn(cp_sel, sim._gr, rays_in, rng2, ctrl, **kw)
        nbh = np.asarray(nb)  # blocks on kernel completion
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
            bounces = int(nbh[:, 0].sum())
    return {"slots": s, "rt": rt, "spawn": spawn, "s": round(best, 3),
            "bounces": bounces, "G_per_s": round(bounces / best / 1e9, 3)}


def main():
    cases = sys.argv[1:] or ["2048:4096", "4096:4096"]
    for case in cases:
        sl, sp = (int(v) for v in case.split(":"))
        try:
            out = kernel_case(sl, sp)
        except Exception as e:  # report per-case, keep sweeping
            out = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({case: out}), flush=True)


if __name__ == "__main__":
    main()
