"""Parity tests: vectorized jnp engine vs. the scalar numpy oracle.

Both consume identical seeds and the same xorshift32 streams, so per-ray outcomes
should agree except for rare roulette flips where float32 vs float64 arithmetic lands
a draw within ~1e-6 of a branch threshold.  Tests assert near-total per-ray agreement
plus exact-histogram agreement on the agreeing subset.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.oracle import OracleTracer
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)

M, N = 6, 5


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom)
    return geom, luts, tables, tgeom


def _run_engine(setup, cfg, cells=None, rays_per_cell=None):
    geom, luts, tables, tgeom = setup
    batch = seeding.build_ray_batch(geom, cfg, cell_ids=cells,
                                    rays_per_cell=rays_per_cell)
    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )
    trace = trace_jnp.make_trace_fn(tables, tgeom, cfg)
    rays_f, bounces = trace(rays)
    return batch, rays_f, int(bounces)


def test_engine_matches_oracle_per_ray(setup):
    geom, luts, tables, tgeom = setup
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=60, max_bounces=500,
                      rng_mode="parity", ic_test="polygon")
    # a diverse cell subset: corners, center, all wavelengths
    cells = np.array(
        [(l * M + m) * N + n
         for l in range(3) for m in (0, M // 2, M - 1) for n in (0, N - 1)]
    )
    batch, rays_f, bounces = _run_engine(setup, cfg, cells=cells)

    oracle = OracleTracer(geom, luts, max_bounces=500)
    cid = batch["cid"]
    l = cid // (M * N)
    m = (cid % (M * N)) // N
    n = cid % N
    o_rays = dict(
        x=batch["x"], y=batch["y"], m=m, n=n, lmd=l,
        te=np.abs(batch["te"]).astype(float),
        tm=np.abs(batch["tm"]).astype(float),
        delta=np.zeros(len(cid)),
    )
    states = batch["rng"].astype(np.int64).copy()
    # oracle reseeds zero states by LOCAL index; engine uses the stored global idx.
    # With parity seeding no state is zero, so the streams coincide.
    o_hist = oracle.trace(o_rays, states)

    dep_e = np.asarray(rays_f["dep"])
    dep_o = oracle.outcomes
    agree = dep_e == dep_o
    frac = agree.mean()
    assert frac > 0.995, f"per-ray agreement too low: {frac}"
    # and the deposit totals must be statistically indistinguishable
    assert abs((dep_e >= 0).sum() - (dep_o >= 0).sum()) <= max(
        3, 0.02 * (dep_o >= 0).sum()
    )
    # engine bounce accounting should be close to the oracle's
    assert abs(bounces - oracle.total_bounces) / max(oracle.total_bounces, 1) < 0.02


def test_engine_deterministic(setup):
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=40, max_bounces=300,
                      rng_mode="fast", seed=42)
    _, r1, b1 = _run_engine(setup, cfg)
    _, r2, b2 = _run_engine(setup, cfg)
    assert b1 == b2
    assert np.array_equal(np.asarray(r1["dep"]), np.asarray(r2["dep"]))
    assert np.array_equal(np.asarray(r1["state"]), np.asarray(r2["state"]))


def test_seed_changes_results(setup):
    cfg1 = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=40, max_bounces=300,
                       rng_mode="fast", seed=1)
    cfg2 = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=40, max_bounces=300,
                       rng_mode="fast", seed=2)
    _, r1, _ = _run_engine(setup, cfg1)
    _, r2, _ = _run_engine(setup, cfg2)
    assert not np.array_equal(np.asarray(r1["dep"]), np.asarray(r2["dep"]))


def test_circle_ic_statistically_equivalent(setup):
    """The circle IC test vs the 100-gon must give compatible deposit rates."""
    cfg_poly = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=200,
                           max_bounces=500, rng_mode="fast", ic_test="polygon")
    cfg_circ = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=200,
                           max_bounces=500, rng_mode="fast", ic_test="circle")
    _, r_p, _ = _run_engine(setup, cfg_poly)
    _, r_c, _ = _run_engine(setup, cfg_circ)
    eff_p = (np.asarray(r_p["dep"]) >= 0).mean()
    eff_c = (np.asarray(r_c["dep"]) >= 0).mean()
    n = len(np.asarray(r_p["dep"]))
    sigma = np.sqrt(max(eff_p, 1e-9) / n)
    assert abs(eff_p - eff_c) < 6 * sigma + 1e-4


def test_histogram_layout(setup):
    geom, luts, tables, tgeom = setup
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=60, max_bounces=400,
                      rng_mode="fast")
    cells = np.array([(1 * M + 2) * N + 3])  # l=1, m=2, n=3
    batch, rays_f, _ = _run_engine(setup, cfg, cells=cells, rays_per_cell=2000)
    hist = np.asarray(trace_jnp.deposits_to_histogram(
        rays_f["dep"], rays_f["cid"], 3, M, N, 80, 120
    ))
    assert hist.shape == (3, N, M, 80, 120)
    # all deposits land in this cell's (lambda=1, n=3, m=2) slice
    total = hist.sum()
    assert total > 0
    assert hist[1, 3, 2].sum() == total
