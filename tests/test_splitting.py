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


def test_splitting_percell_matches_global(setup):
    """The per-cell production engine must reproduce the legacy shared-buffer
    engine's exact expectation when neither truncates: identical pruned
    ledger and step count, per-bin agreement to float-add-order noise."""
    geom, tables, tgeom = setup
    import jax.numpy as jnp

    cells = np.arange(3 * M * N)
    P = 4
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=P,
                      max_bounces=400, rng_mode="fast", seed=2)
    _, rays0 = _rays(geom, cfg, cells, P)
    direct = splitting.run_splitting(
        tables, tgeom, cfg, rays0, capacity=1 << 17,
        weight_threshold=1e-5, max_steps=300)
    assert direct.truncated == 0.0

    batch1 = seeding.build_ray_batch(geom, cfg, cell_ids=cells[:1],
                                     rays_per_cell=P)
    te = np.asarray(batch1["te"])
    tm = np.asarray(batch1["tm"])
    seeds = {
        "x": jnp.asarray(batch1["x"], jnp.float32),
        "y": jnp.asarray(batch1["y"], jnp.float32),
        "ter": jnp.asarray(te.real, jnp.float32),
        "tei": jnp.asarray(te.imag, jnp.float32),
        "tmr": jnp.asarray(tm.real, jnp.float32),
        "tmi": jnp.asarray(tm.imag, jnp.float32),
    }
    pc = splitting.run_splitting_cells(
        tables, tgeom, cfg, cells, seeds, capacity=8192,
        weight_threshold=1e-5, max_steps=300)
    assert pc.truncated == 0.0
    assert 0 < pc.peak_live < 8192
    assert pc.steps == direct.steps
    assert pc.pruned == pytest.approx(direct.pruned, rel=1e-4)
    a, b = direct.histogram, pc.histogram
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-10)
    assert pc.out_coupled == pytest.approx(direct.out_coupled, rel=1e-5)


def test_splitting_percell_truncation_ledger(setup):
    """Overflowing a deliberately tiny per-cell buffer must be *accounted*:
    deposited + truncated + pruned stays <= launch weight, truncated > 0,
    and peak_live reports a width above capacity."""
    geom, tables, tgeom = setup
    import jax.numpy as jnp

    cells = np.arange(3 * M * N)
    P = 8
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=P,
                      max_bounces=400, rng_mode="fast", seed=2)
    batch1 = seeding.build_ray_batch(geom, cfg, cell_ids=cells[:1],
                                     rays_per_cell=P)
    te = np.asarray(batch1["te"])
    tm = np.asarray(batch1["tm"])
    seeds = {
        "x": jnp.asarray(batch1["x"], jnp.float32),
        "y": jnp.asarray(batch1["y"], jnp.float32),
        "ter": jnp.asarray(te.real, jnp.float32),
        "tei": jnp.asarray(te.imag, jnp.float32),
        "tmr": jnp.asarray(tm.real, jnp.float32),
        "tmi": jnp.asarray(tm.imag, jnp.float32),
    }
    small = splitting.run_splitting_cells(
        tables, tgeom, cfg, cells, seeds, capacity=256,
        weight_threshold=1e-5, max_steps=300)
    big = splitting.run_splitting_cells(
        tables, tgeom, cfg, cells, seeds, capacity=16384,
        weight_threshold=1e-5, max_steps=300)
    assert small.truncated > 0
    assert big.truncated == 0.0
    launched = P * len(cells)
    assert small.out_coupled < big.out_coupled <= launched
    assert small.out_coupled + small.truncated + small.pruned <= launched
    # the tiny run's histogram is a biased-low version of the exact one
    assert (small.histogram <= big.histogram + 1e-6).all()


def test_simulator_splitting_engine(setup):
    """engine="splitting" (per-cell default) through the Simulator: agrees
    with the legacy shared-buffer expectation, chunk-dispatch is bitwise
    invariant (per-cell wavefronts are independent), and the weight ledgers
    report zero truncation at an adequate capacity."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tables, tgeom = setup
    P = 4
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=P,
                      max_bounces=400, rng_mode="fast", seed=2)
    luts = make_synthetic_luts(geom)
    sim = Simulator(cfg=cfg, geom=geom, luts=luts, engine="splitting",
                    splitting_threshold=1e-5, splitting_max_steps=300)
    res = sim.run(num_iter=1, cells_per_batch=3 * M * N)
    assert res.metrics is not None
    assert sim.split_truncated == 0.0              # zero-variance guarantee
    assert 0 < sim.split_peak_live < sim._split_capacity
    assert sim.split_pruned / res.rays_traced < 0.02   # bias bound ~1%

    # direct legacy trace over the same launch batch agrees (see
    # test_splitting_percell_matches_global for the engine-level pin)
    cells = np.arange(3 * M * N)
    _, rays0 = _rays(geom, cfg, cells, P)
    direct = splitting.run_splitting(
        tables, tgeom, cfg, rays0, capacity=1 << 17,
        weight_threshold=1e-5, max_steps=300)
    np.testing.assert_allclose(res.histogram, direct.histogram, rtol=2e-4,
                               atol=1e-10)

    # chunked dispatch is BITWISE invariant: per-cell wavefronts never
    # interact, so which cells share a vmapped call cannot matter
    res2 = sim.run(num_iter=1, cells_per_batch=7)
    np.testing.assert_array_equal(np.asarray(res2.histogram),
                                  np.asarray(res.histogram))

    # legacy engine still reachable for the differentiable path
    sim3 = Simulator(cfg=cfg, geom=geom, luts=luts, engine="splitting",
                     splitting_percell=False, splitting_threshold=1e-5,
                     splitting_max_steps=300, splitting_capacity=1 << 17)
    res3 = sim3.run(num_iter=1, cells_per_batch=3 * M * N)
    np.testing.assert_allclose(np.asarray(res3.histogram),
                               np.asarray(direct.histogram),
                               rtol=1e-6, atol=1e-12)
