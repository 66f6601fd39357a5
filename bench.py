"""Benchmark harness: Monte-Carlo trace throughput on the local accelerator.

Prints ONE JSON line:
``{"metric": "ray-bounces/sec/chip", "value": N, "unit": "bounces/s",
   "vs_baseline": N / 1e9}``

The baseline denominator is the 1 G ray-bounces/sec/chip rebuild target from
BASELINE.md (the reference publishes no absolute numbers; it defines the workload:
full-color tracing of the paper design over a 100x75 FoV grid,
gpu_ray_tracing_pro_fullColor.py:16-17,60-63).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        seeding,
        trace_jnp,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
        build_trace_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import (
        make_synthetic_luts,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
        build_cell_tables,
    )

    # paper-default workload shape; ray count sized for a ~1 minute benchmark
    num_fov_x = int(os.environ.get("BENCH_FOV_X", 100))
    num_fov_y = int(os.environ.get("BENCH_FOV_Y", 75))
    rays_per_fov = int(os.environ.get("BENCH_RAYS_PER_FOV", 200))
    cells_per_batch = int(os.environ.get("BENCH_CELLS_PER_BATCH", 2500))

    cfg = TraceConfig(
        num_fov_x=num_fov_x, num_fov_y=num_fov_y, rays_per_fov=rays_per_fov,
        max_bounces=4096, seed=0,
    )
    geom = generate_geometry(num_fov_x=num_fov_x, num_fov_y=num_fov_y)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=1e-3)
    trace = trace_jnp.make_trace_fn(tables, tgeom, cfg)
    L = 3

    def batch_for(cells):
        b = seeding.build_ray_batch(geom, cfg, cell_ids=cells)
        return trace_jnp.make_ray_state(
            b["x"], b["y"], b["te"], b["tm"], b["cid"], b["idx"], b["rng"]
        )

    all_cells = np.arange(L * num_fov_x * num_fov_y)
    chunks = [
        all_cells[i : i + cells_per_batch]
        for i in range(0, len(all_cells), cells_per_batch)
    ]
    # uniform chunk sizes avoid re-jitting; drop a ragged tail if present
    chunks = [c for c in chunks if len(c) == len(chunks[0])]

    # warm-up / compile on the first chunk
    rays = batch_for(chunks[0])
    out = trace(rays)
    jax.block_until_ready(out)

    total_bounces = 0
    total_rays = 0
    t0 = time.perf_counter()
    for c in chunks:
        rays = batch_for(c)
        rays_f, bounces = trace(rays)
        total_bounces += int(bounces)
        total_rays += len(np.asarray(rays_f["dep"]))
    elapsed = time.perf_counter() - t0

    bps = total_bounces / elapsed
    print(
        json.dumps(
            {
                "metric": "ray-bounces/sec/chip",
                "value": round(bps),
                "unit": "bounces/s",
                "vs_baseline": round(bps / 1e9, 4),
                "rays_per_sec": round(total_rays / elapsed),
                "total_bounces": total_bounces,
                "elapsed_s": round(elapsed, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
