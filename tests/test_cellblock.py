"""Cell-blocked XLA engine vs flat jnp engine: identical RNG -> identical rays."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    trace_cellblock,
    trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)

M, N = 5, 4
RPC = 128


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=1e-3)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=RPC, max_bounces=400,
                      rng_mode="fast", ic_test="circle", seed=4)
    batch = seeding.build_ray_batch(geom, cfg)
    return geom, tables, tgeom, cfg, batch


def test_cellblock_matches_flat_engine(setup):
    geom, tables, tgeom, cfg, batch = setup
    n_cells = 3 * M * N

    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )
    rays_f, b1 = trace_jnp.make_trace_fn(tables, tgeom, cfg)(rays)
    dep1 = np.asarray(rays_f["dep"]).reshape(n_cells, RPC)

    T = {k: np.asarray(v) for k, v in
         trace_cellblock.build_cellblock_tables(tables, geom.eyebox_range).items()}
    Tj = {k: jax.numpy.asarray(v) for k, v in T.items()}
    blocks = trace_cellblock.make_ray_blocks(batch, n_cells, RPC)
    trace = trace_cellblock.make_cellblock_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, tgeom)
    rays2, b2 = trace(Tj, blocks)
    dep2 = np.asarray(rays2["dep"])

    agree = (dep1 == dep2).mean()
    assert agree > 0.999, agree
    assert abs(int(b1) - int(b2)) / max(int(b1), 1) < 0.005


def test_cellblock_cell_subset(setup):
    """Tracing a subset of cells with sliced tables equals the full-run slice."""
    geom, tables, tgeom, cfg, batch = setup
    n_cells = 3 * M * N
    T = trace_cellblock.build_cellblock_tables(tables, geom.eyebox_range)
    trace = trace_cellblock.make_cellblock_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, tgeom)

    blocks_full = trace_cellblock.make_ray_blocks(batch, n_cells, RPC)
    full, _ = trace({k: jax.numpy.asarray(v) for k, v in T.items()}, blocks_full)

    sel = np.array([3, 17, 40])
    batch_s = seeding.build_ray_batch(geom, cfg, cell_ids=sel)
    blocks_s = trace_cellblock.make_ray_blocks(batch_s, len(sel), RPC)
    Ts = {k: jax.numpy.asarray(np.asarray(v)[sel]) for k, v in T.items()}
    part, _ = trace(Ts, blocks_s)

    np.testing.assert_array_equal(
        np.asarray(part["dep"]), np.asarray(full["dep"])[sel]
    )


def test_simulator_cellblock_engine(setup):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tables, tgeom, cfg, batch = setup
    sim_c = Simulator(cfg=cfg, engine="cellblock", geom=geom,
                      geometry_simplify_tol=1e-3)
    sim_j = Simulator(cfg=cfg, engine="jnp", geom=geom,
                      geometry_simplify_tol=1e-3)
    rc = sim_c.run(rays_per_fov=RPC, num_iter=1, evaluate_metrics=False)
    rj = sim_j.run(rays_per_fov=RPC, num_iter=1, evaluate_metrics=False)
    d = np.abs(rc.histogram - rj.histogram).sum()
    assert d / max(rj.histogram.sum(), 1) < 0.01
