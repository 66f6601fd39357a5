"""Pallas megakernel vs jnp engine, interpret mode on CPU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    trace_jnp,
    trace_pallas,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)

M, N = 5, 4
RPC = 256  # rays per cell -> RT = 2
RT = RPC // trace_pallas.LANES


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    # both engines must share the same (edge-budgeted) region geometry
    tgeom = build_trace_geometry(geom, simplify_tol=0.05)
    assert len(tgeom.hull_hp) <= trace_pallas.MAX_EDGES
    assert len(tgeom.r1_hp) <= trace_pallas.MAX_EDGES
    assert len(tgeom.r2_hp) <= trace_pallas.MAX_EDGES
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=RPC, max_bounces=400,
                      rng_mode="fast", ic_test="circle", seed=9)
    batch = seeding.build_ray_batch(geom, cfg)
    return geom, tables, tgeom, cfg, batch


def test_pallas_interpret_matches_jnp(setup):
    geom, tables, tgeom, cfg, batch = setup
    n_cells = 3 * M * N

    # jnp engine
    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )
    trace1 = trace_jnp.make_trace_fn(tables, tgeom, cfg)
    rays_f, bounces1 = trace1(rays)
    dep1 = np.asarray(rays_f["dep"]).reshape(n_cells, RPC)

    # pallas kernel (interpret mode)
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, RPC, RT)
    trace2 = trace_pallas.make_pallas_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, interpret=True
    )
    dep2, nb2, *_ = trace2(cp, gr, rays_in, rng_in)
    dep2 = np.asarray(dep2).reshape(n_cells, RT * trace_pallas.LANES)[:, :RPC]

    agree = (dep1 == dep2).mean()
    assert agree > 0.995, f"agreement {agree}"
    # deposit totals must match closely
    d1 = (dep1 >= 0).sum()
    d2 = (dep2 >= 0).sum()
    assert abs(d1 - d2) <= max(3, 0.02 * d1)
    # bounce accounting comparable
    bounces2 = int(np.asarray(nb2[:, 0]).sum())
    assert abs(int(bounces1) - bounces2) / max(int(bounces1), 1) < 0.02


def test_pallas_enforces_exact_bounce_budget(setup):
    """max_bounces not a multiple of cond_interval: the final chunk must be
    shortened so no ray executes past the budget (the jnp engine enforces the
    bound exactly)."""
    import dataclasses

    geom, tables, tgeom, cfg, batch = setup
    n_cells = 3 * M * N
    cfg13 = dataclasses.replace(cfg, max_bounces=13)

    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )
    rays_f, bounces1 = trace_jnp.make_trace_fn(tables, tgeom, cfg13)(rays)
    dep1 = np.asarray(rays_f["dep"]).reshape(n_cells, RPC)

    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, RPC, RT)
    trace2 = trace_pallas.make_pallas_trace_fn(
        cfg13, tgeom.num_fc, tgeom.num_oc, RT, interpret=True, cond_interval=8
    )
    dep2, nb2, *_ = trace2(cp, gr, rays_in, rng_in)
    dep2 = np.asarray(dep2).reshape(n_cells, RT * trace_pallas.LANES)[:, :RPC]

    # per-cell iteration counters must never exceed the budget
    iters_run = np.asarray(nb2[:, 1])
    assert iters_run.max() <= 13, f"ran {iters_run.max()} iters > budget 13"
    # and results agree with the jnp engine at the same budget
    agree = (dep1 == dep2).mean()
    assert agree > 0.995, f"agreement {agree}"


def test_pallas_histogram_matches(setup):
    geom, tables, tgeom, cfg, batch = setup
    n_cells = 3 * M * N
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, RPC, RT)
    trace2 = trace_pallas.make_pallas_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, interpret=True
    )
    dep2, _, *_ = trace2(cp, gr, rays_in, rng_in)
    hist = np.asarray(
        trace_pallas.deposits_to_histogram_cells(
            dep2, np.arange(n_cells), 3, M, N, 80, 120
        )
    )
    assert hist.shape == (3, N, M, 80, 120)
    assert hist.sum() == (np.asarray(dep2) >= 0).sum()


def test_simulator_pallas_engine_interpret(setup):
    """Pipeline wiring for engine='pallas' (interpret mode) matches jnp engine."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tables, tgeom, cfg, batch = setup
    sim_p = Simulator(cfg=cfg, engine="pallas", interpret=True,
                      geom=geom, geometry_simplify_tol=0.05)
    sim_j = Simulator(cfg=cfg, engine="jnp", geom=geom,
                      geometry_simplify_tol=0.05)
    # identical LUT seeds -> identical tables; run a small subset of cells
    rp = sim_p.run(rays_per_fov=RPC, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=20)
    rj = sim_j.run(rays_per_fov=RPC, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=20)
    # engines agree statistically; identical RNG -> near-identical histograms
    d = np.abs(rp.histogram - rj.histogram).sum()
    assert d / max(rj.histogram.sum(), 1) < 0.02
    assert abs(rp.total_bounces - rj.total_bounces) / rj.total_bounces < 0.02


def test_segmented_pallas_matches_monolithic(setup):
    """Segment + compact scheduling must reproduce the monolithic kernel exactly."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        pallas_segments,
    )

    geom, tables, tgeom, cfg, batch = setup
    n_cells = 3 * M * N
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, RPC, RT)

    mono = trace_pallas.make_pallas_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, interpret=True)
    dep_m, nb_m, *_ = mono(cp, gr, rays_in, rng_in)
    hist_m = np.asarray(trace_pallas.deposits_to_histogram_cells(
        dep_m, np.arange(n_cells), 3, M, N, 80, 120))
    bounces_m = int(np.asarray(nb_m[:, 0]).sum())

    seg = pallas_segments.SegmentedPallasTracer(
        cfg, tgeom.num_fc, tgeom.num_oc, segment_bounces=32, interpret=True)
    deps, bounces_s = seg.trace(cp, gr, rays_in, rng_in)
    hist_s = np.asarray(pallas_segments.deps_to_histogram(
        deps, np.arange(n_cells), 3, M, N, 80, 120))

    np.testing.assert_array_equal(hist_m, hist_s)
    assert bounces_m == bounces_s

    # device-histogram path (on-device scatter per segment) must agree too
    seg2 = pallas_segments.SegmentedPallasTracer(
        cfg, tgeom.num_fc, tgeom.num_oc, segment_bounces=32, interpret=True,
        hist_dims=(3, M, N))
    cid = np.arange(n_cells)
    l = cid // (M * N)
    mn = cid % (M * N)
    base = (((l * N + mn % N) * M + mn // N) * (80 * 120)).astype(np.int32)
    hist_d, bounces_d = seg2.trace(cp, gr, rays_in, rng_in, hist_base=base)
    np.testing.assert_array_equal(hist_m, np.asarray(hist_d))
    assert bounces_d == bounces_m


def test_geom_row_precomputed_banks(setup):
    """The packed geometry row's precomputed banks must stay consistent:

    - thresholds carry the host-folded ``+ _EDGE_TOL`` in f32 (the exact op
      the kernels used to run per edge per iteration);
    - the ``_G_MC_*`` banks are the bitwise negation of those thresholds
      (consumed by the packed-mode max-chain region test);
    - ``_G_OC_BT`` is the OC rect widened by the tolerance in f32.
    """
    geom, tables, tgeom, cfg, batch = setup
    g = trace_pallas.build_kernel_geom(tgeom)
    ME = trace_pallas.MAX_EDGES
    tol = np.float32(trace_pallas._EDGE_TOL)
    for base, mc, hp in (
        (trace_pallas._G_HULL, trace_pallas._G_MC_HULL, tgeom.hull_hp),
        (trace_pallas._G_R1, trace_pallas._G_MC_R1, tgeom.r1_hp),
        (trace_pallas._G_R2, trace_pallas._G_MC_R2, tgeom.r2_hp),
    ):
        c_bank = g[base + 2 * ME:base + 3 * ME]
        e = len(hp)
        # f32(c) + f32(tol), the kernel's former in-loop op, bitwise
        np.testing.assert_array_equal(
            c_bank[:e], hp[:, 2].astype(np.float32) + tol)
        # padding rows stay always-true (0*x + 0*y <= 1 + tol)
        np.testing.assert_array_equal(c_bank[e:], np.float32(1.0) + tol)
        # negated bank is the bitwise negation
        np.testing.assert_array_equal(g[mc:mc + ME], -c_bank)
    b = g[trace_pallas._G_OC_B:trace_pallas._G_OC_B + 4]
    bt = g[trace_pallas._G_OC_BT:trace_pallas._G_OC_BT + 4]
    np.testing.assert_array_equal(
        bt, [b[0] - tol, b[1] + tol, b[2] - tol, b[3] + tol])


def test_region_test_max_matches_chain(setup):
    """Packed-mode max-chain region test agrees with the cmp+and chain on
    random points (away from ulp-of-edge cases, the two forms are equal)."""
    geom, tables, tgeom, cfg, batch = setup
    import jax.numpy as jnp

    g_row = trace_pallas.build_kernel_geom(tgeom)

    def g(j):
        return jnp.float32(g_row[j])

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-40, 40, size=512).astype(np.float32))
    y = jnp.asarray(rng.uniform(-40, 40, size=512).astype(np.float32))
    for base, mc, hp in (
        (trace_pallas._G_HULL, trace_pallas._G_MC_HULL, tgeom.hull_hp),
        (trace_pallas._G_R1, trace_pallas._G_MC_R1, tgeom.r1_hp),
        (trace_pallas._G_R2, trace_pallas._G_MC_R2, tgeom.r2_hp),
    ):
        n = len(hp)
        a = np.asarray(trace_pallas._region_test(g, base, x, y, n))
        b = np.asarray(trace_pallas._region_test_max(g, base, mc, x, y, n))
        np.testing.assert_array_equal(a, b)
        assert a.any() and not a.all()


def test_cell_params_precomputed_deposit_slots(setup):
    """_EBT/_EBS slots must be the f32 tol-widened rect + bin scales derived
    from _EBR with the exact ops the kernel used to run per iteration."""
    geom, tables, tgeom, cfg, batch = setup
    cp = trace_pallas.build_kernel_cell_params(
        tables, geom.eyebox_range, eyebox_bins=cfg.eyebox_bins)
    ebr = cp[:, trace_pallas._EBR:trace_pallas._EBR + 4]
    tol = np.float32(trace_pallas._EDGE_TOL)
    ny, nx = cfg.eyebox_bins
    ebt = cp[:, trace_pallas._EBT:trace_pallas._EBT + 4]
    np.testing.assert_array_equal(ebt[:, 0], ebr[:, 0] - tol)
    np.testing.assert_array_equal(ebt[:, 1], ebr[:, 1] + tol)
    np.testing.assert_array_equal(ebt[:, 2], ebr[:, 2] - tol)
    np.testing.assert_array_equal(ebt[:, 3], ebr[:, 3] + tol)
    np.testing.assert_array_equal(
        cp[:, trace_pallas._EBS], np.float32(nx) / (ebr[:, 1] - ebr[:, 0]))
    np.testing.assert_array_equal(
        cp[:, trace_pallas._EBS + 1], np.float32(ny) / (ebr[:, 3] - ebr[:, 2]))
