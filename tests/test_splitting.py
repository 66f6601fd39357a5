"""Deterministic-splitting tracer: internal consistency + MC convergence."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    splitting,
    trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)

M, N = 3, 2


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom)
    return geom, tables, tgeom


def _rays(geom, cfg, cells, rpc):
    batch = seeding.build_ray_batch(geom, cfg, cell_ids=cells, rays_per_cell=rpc)
    return batch, trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )


def test_splitting_matches_monte_carlo(setup):
    geom, tables, tgeom = setup
    cells = np.array([(1 * M + 1) * N + 1])  # single green center-ish cell
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=64, max_bounces=400,
                      rng_mode="fast", seed=2)

    _, rays_s = _rays(geom, cfg, cells, 64)
    split = splitting.run_splitting(
        tables, tgeom, cfg, rays_s, capacity=1 << 16, weight_threshold=1e-5,
        max_steps=300,
    )
    bias_bound = (split.truncated + split.pruned) / 64
    assert bias_bound < 0.01, bias_bound
    split_eff = split.out_coupled / 64

    # MC estimate with many rays from the same pupil points distribution
    cfg_mc = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=64,
                         max_bounces=400, rng_mode="fast", seed=3)
    n_mc = 6000
    batch, rays_mc = _rays(geom, cfg_mc, cells, n_mc)
    trace = trace_jnp.make_trace_fn(tables, tgeom, cfg_mc)
    rays_f, _ = trace(rays_mc)
    dep = np.asarray(rays_f["dep"])
    mc_eff = (dep >= 0).mean()

    sigma = np.sqrt(max(mc_eff, 1e-6) / n_mc)
    # pruning/truncation can only *reduce* splitting deposits -> one-sided bound
    assert split_eff < mc_eff + 5 * sigma + 2e-3, (split_eff, mc_eff)
    assert split_eff > mc_eff - 5 * sigma - 2e-3 - bias_bound, (split_eff, mc_eff)

    # spatial distribution agreement (coarse): compare eyebox marginals
    mc_hist = np.asarray(trace_jnp.deposits_to_histogram(
        rays_f["dep"], rays_f["cid"], 3, M, N, 80, 120)) / n_mc
    sp = split.histogram / 64
    # MC has only ~100 deposits, so compare coarse (8-bucket) marginals
    mc_y = mc_hist.sum(axis=(0, 1, 2, 4)).reshape(8, 10).sum(axis=1)
    sp_y = sp.sum(axis=(0, 1, 2, 4)).reshape(8, 10).sum(axis=1)
    assert mc_y.sum() > 0 and sp_y.sum() > 0
    l1 = np.abs(mc_y / mc_y.sum() - sp_y / sp_y.sum()).sum()
    assert l1 < 0.35, l1


def test_splitting_deterministic(setup):
    geom, tables, tgeom = setup
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=32, max_bounces=200)
    cells = np.arange(3 * M * N)
    _, rays = _rays(geom, cfg, cells, 32)
    r1 = splitting.run_splitting(tables, tgeom, cfg, rays, capacity=1 << 13)
    r2 = splitting.run_splitting(tables, tgeom, cfg, rays, capacity=1 << 13)
    np.testing.assert_array_equal(r1.histogram, r2.histogram)
    assert r1.steps == r2.steps


def test_splitting_energy_conservation(setup):
    """Deposited + truncated weight can never exceed launched weight."""
    geom, tables, tgeom = setup
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=32, max_bounces=200)
    cells = np.arange(3 * M * N)
    _, rays = _rays(geom, cfg, cells, 32)
    res = splitting.run_splitting(tables, tgeom, cfg, rays, capacity=1 << 13)
    launched = 32 * len(cells)
    assert 0.0 < res.out_coupled < launched
    assert res.histogram.sum() == pytest.approx(res.out_coupled, rel=1e-5)


def test_simulator_splitting_engine(setup):
    """engine="splitting" through the Simulator: equals the direct splitting
    trace on the same launch batch, is chunking-invariant, and reports the
    exact expectation with MC-compatible normalization."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tables, tgeom = setup
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=16,
                      max_bounces=400, rng_mode="fast", seed=2)
    luts = make_synthetic_luts(geom)
    sim = Simulator(cfg=cfg, geom=geom, luts=luts, engine="splitting",
                    splitting_threshold=1e-5, splitting_max_steps=300)
    res = sim.run(num_iter=1, cells_per_batch=3 * M * N)
    assert res.metrics is not None
    # weight-loss diagnostics are tracked and small (bias bound ~1%)
    assert (sim.split_truncated + sim.split_pruned) / res.rays_traced < 0.02

    # direct trace over all cells at once must agree exactly (same batch,
    # same trace config -> identical arithmetic)
    cells = np.arange(3 * M * N)
    _, rays0 = _rays(geom, cfg, cells, 16)
    direct = splitting.run_splitting(
        tables, tgeom, cfg, rays0, capacity=1 << 16,
        weight_threshold=1e-5, max_steps=300)
    np.testing.assert_allclose(res.histogram, direct.histogram, rtol=1e-6,
                               atol=1e-9)

    # chunked dispatch agrees statistically (smaller concurrent wavefronts
    # truncate *less*, so this is tolerance- not bitwise-equality: the
    # chunked run is at least as complete)
    res2 = sim.run(num_iter=1, cells_per_batch=7)
    assert float(res2.histogram.sum()) >= float(res.histogram.sum()) * (1 - 1e-9)
    np.testing.assert_allclose(res2.histogram.sum(), res.histogram.sum(),
                               rtol=0.02)
    assert res2.metrics.delta_e == pytest.approx(res.metrics.delta_e, rel=0.02)
