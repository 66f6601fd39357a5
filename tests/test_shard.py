"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel import shard

M, N = 4, 3


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=64, max_bounces=300,
                      rng_mode="fast", seed=11)
    batch = seeding.build_ray_batch(geom, cfg)
    return geom, tables, tgeom, cfg, batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(setup):
    geom, tables, tgeom, cfg, batch = setup
    # single-device reference
    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )
    trace1 = trace_jnp.make_trace_fn(tables, tgeom, cfg)
    rays_f, bounces1 = trace1(rays)
    ny, nx = cfg.eyebox_bins
    hist1 = np.asarray(
        trace_jnp.deposits_to_histogram(rays_f["dep"], rays_f["cid"], 3, M, N, ny, nx)
    )

    # 8-way sharded
    mesh = shard.make_mesh()
    padded = shard.pad_rays_to(batch, mesh.size)
    rays8 = trace_jnp.make_ray_state(
        padded["x"], padded["y"], padded["te"], padded["tm"],
        padded["cid"], padded["idx"], padded["rng"],
    )
    rays8 = shard.shard_ray_batch(rays8, mesh)
    trace8 = shard.make_sharded_trace_fn(tables, tgeom, cfg, mesh)
    hist8, bounces8 = trace8(rays8)
    hist8 = np.asarray(hist8)

    np.testing.assert_array_equal(hist1, hist8)
    # padding rays die at init without bouncing, so totals match exactly
    assert int(bounces1) == int(bounces8)


def test_2d_mesh(setup):
    geom, tables, tgeom, cfg, batch = setup
    mesh = shard.make_mesh(axis_names=("dp", "rays"), shape=(2, 4))
    padded = shard.pad_rays_to(batch, mesh.size)
    rays = trace_jnp.make_ray_state(
        padded["x"], padded["y"], padded["te"], padded["tm"],
        padded["cid"], padded["idx"], padded["rng"],
    )
    rays = shard.shard_ray_batch(rays, mesh)
    trace = shard.make_sharded_trace_fn(tables, tgeom, cfg, mesh)
    hist, bounces = trace(rays)
    assert int(bounces) > 0
    assert np.asarray(hist).sum() > 0


def test_pad_rays_noop_and_pad(setup):
    *_, batch = setup
    n = len(batch["x"])
    same = shard.pad_rays_to(batch, 1)
    assert len(same["x"]) == n
    padded = shard.pad_rays_to(batch, 7)
    assert len(padded["x"]) % 7 == 0
    assert np.all(np.abs(padded["te"][n:]) == 0)


def test_sharded_persistent_cells_bitwise():
    """Cell-sharded persistent tracing == single-device, tile for tile."""
    import jax.numpy as jnp
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        seeding,
        trace_pallas,
        trace_pallas_persistent,
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
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel.shard import (
        make_mesh,
        make_sharded_cell_trace_fn,
    )

    M, N = 4, 2
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=0.05)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=128,
                      max_bounces=500, rng_mode="fast", ic_test="circle", seed=9)
    n_cells = 3 * M * N  # 24 cells over 8 devices
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    batch = seeding.build_ray_batch(geom, cfg)
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, 128, 1)
    fn = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, 1, gens=2, interpret=True,
        max_iters=1100)
    ctrl = jnp.asarray([2, 0], jnp.int32)
    t_single, nb_single = fn(cp, gr, rays_in, rng_in, ctrl)

    mesh = make_mesh()
    sharded = make_sharded_cell_trace_fn(fn, mesh)
    t_shard, nb_shard = sharded(cp, gr, rays_in, rng_in, ctrl)
    np.testing.assert_array_equal(np.asarray(t_single), np.asarray(t_shard))
    np.testing.assert_array_equal(np.asarray(nb_single), np.asarray(nb_shard))


def test_sample_sharded_persistent_bitwise():
    """MC-sample-axis sharding: k devices with distinct RNG slices psum-merge
    to exactly the sum of the k corresponding single-device runs."""
    import jax.numpy as jnp
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        seeding,
        trace_pallas,
        trace_pallas_persistent,
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
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel.shard import (
        make_mesh,
        make_sample_sharded_cell_trace_fn,
    )

    M, N = 2, 2
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=0.05)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=128,
                      max_bounces=500, rng_mode="fast", ic_test="circle",
                      seed=9)
    n_cells = 3 * M * N
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    batch = seeding.build_ray_batch(geom, cfg)
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, 128, 1)
    fn = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, 1, gens=1, interpret=True,
        max_iters=1100)
    ctrl = jnp.asarray([1, 0], jnp.int32)

    import jax

    k = 2
    rng_dev = np.stack([np.asarray(rng_in) + np.uint32(17 * (d + 1))
                        for d in range(k)])
    mesh = make_mesh(jax.devices()[:k], ("samples",), (k,))
    sampled = make_sample_sharded_cell_trace_fn(fn, mesh, axis="samples")
    t_merged, nb_merged = sampled(cp, gr, rays_in, jnp.asarray(rng_dev), ctrl)

    t_sum = None
    nb_sum = None
    for d in range(k):
        t_d, nb_d = fn(cp, gr, rays_in, jnp.asarray(rng_dev[d]), ctrl)
        t_sum = t_d if t_sum is None else t_sum + t_d
        nb_sum = nb_d if nb_sum is None else nb_sum + nb_d
    np.testing.assert_array_equal(np.asarray(t_merged), np.asarray(t_sum))
    np.testing.assert_array_equal(np.asarray(nb_merged), np.asarray(nb_sum))
    assert float(np.asarray(t_merged).sum()) > 0

    # wrong leading axis is rejected
    with pytest.raises(ValueError, match="leading device axis"):
        sampled(cp, gr, rays_in, jnp.asarray(rng_dev[0]), ctrl)


def test_simulator_mesh_persistent():
    """Simulator(mesh=...) shards the persistent engine's cell axis."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel.shard import (
        make_mesh,
    )

    M, N = 4, 2
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=128,
                      max_bounces=500, rng_mode="fast", ic_test="circle", seed=5)
    n_cells = 3 * M * N
    sim_m = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                      interpret=True, persistent_slots=128, mesh=make_mesh())
    sim_1 = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                      interpret=True, persistent_slots=128)
    rm = sim_m.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=n_cells)
    r1 = sim_1.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=n_cells)
    np.testing.assert_array_equal(np.asarray(rm.histogram),
                                  np.asarray(r1.histogram))
    assert rm.total_bounces == r1.total_bounces


def test_sharded_persistent_cells_packed_bitwise():
    """Cell sharding composes with the packed bf16-pair selection mode: the
    sharded packed run equals the single-device packed run tile for tile."""
    import jax.numpy as jnp
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        seeding,
        trace_pallas,
        trace_pallas_persistent,
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
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel.shard import (
        make_mesh,
        make_sharded_cell_trace_fn,
    )

    M, N = 4, 2
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=0.05)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=128,
                      max_bounces=500, rng_mode="fast", ic_test="circle",
                      seed=9)
    n_cells = 3 * M * N
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    cpk = trace_pallas_persistent.pack_selection_params(
        cp, tgeom.num_fc, tgeom.num_oc)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    batch = seeding.build_ray_batch(geom, cfg)
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, 128, 1)
    fn = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, 1, gens=2, interpret=True,
        max_iters=1100, accum_mode="packed")
    ctrl = jnp.asarray([2, 0], jnp.int32)
    t_single, nb_single = fn(cp, gr, rays_in, rng_in, ctrl,
                             cell_params_packed=cpk)

    mesh = make_mesh()
    sharded = make_sharded_cell_trace_fn(fn, mesh, packed=True)
    t_shard, nb_shard = sharded(cp, gr, rays_in, rng_in, ctrl,
                                cell_params_packed=cpk)
    np.testing.assert_array_equal(np.asarray(t_single), np.asarray(t_shard))
    np.testing.assert_array_equal(np.asarray(nb_single), np.asarray(nb_shard))
    assert float(np.asarray(t_shard).sum()) > 0

    with pytest.raises(ValueError, match="cell_params_packed"):
        sharded(cp, gr, rays_in, rng_in, ctrl)


def test_pad_rays_to_state_pytree_neutral_fill(setup):
    """Padding a full make_ray_state pytree must fill dep with the -1 sentinel
    (zero-filled dep padding would deposit one count per padding ray into
    cell 0, bin 0) and cos_th with 1."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import trace_jnp
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel import shard

    geom, tables, tgeom, cfg, batch = setup
    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"], batch["cid"],
        batch["idx"], batch["rng"])
    n = len(batch["x"])
    padded = shard.pad_rays_to({k: np.asarray(v) for k, v in rays.items()}, 7)
    pad = len(padded["x"]) - n
    assert pad > 0
    np.testing.assert_array_equal(padded["dep"][n:], -1)
    np.testing.assert_array_equal(padded["cos_th"][n:], 1.0)
    np.testing.assert_array_equal(padded["ter"][n:], 0.0)


def test_2d_mesh_cells_x_samples_bitwise():
    """One shard_map partitioning cells AND samples on a 2x4 mesh equals the
    sum over sample blocks of unsharded runs, bitwise."""
    import jax
    import jax.numpy as jnp
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        seeding,
        trace_pallas,
        trace_pallas_persistent,
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
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel.shard import (
        make_2d_sharded_cell_trace_fn,
        make_mesh,
    )

    M, N = 2, 2
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=0.05)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=128,
                      max_bounces=400, rng_mode="fast", ic_test="circle",
                      seed=11)
    n_cells = 3 * M * N
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    batch = seeding.build_ray_batch(geom, cfg)
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, 128, 1)
    fn = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, 1, gens=1, interpret=True,
        max_iters=900)
    ctrl = jnp.asarray([1, 0], jnp.int32)

    n_samp = 2
    rng_dev = np.stack([np.asarray(rng_in) + np.uint32(23 * (d + 1))
                        for d in range(n_samp)])
    mesh = make_mesh(jax.devices()[:6], ("cells", "samples"), (3, 2))
    traced = make_2d_sharded_cell_trace_fn(fn, mesh)
    t_merged, nb_merged = traced(cp, gr, rays_in, jnp.asarray(rng_dev), ctrl)

    t_sum = nb_sum = None
    for d in range(n_samp):
        t_d, nb_d = fn(cp, gr, rays_in, jnp.asarray(rng_dev[d]), ctrl)
        t_sum = t_d if t_sum is None else t_sum + t_d
        nb_sum = nb_d if nb_sum is None else nb_sum + nb_d
    np.testing.assert_array_equal(np.asarray(t_merged), np.asarray(t_sum))
    np.testing.assert_array_equal(np.asarray(nb_merged), np.asarray(nb_sum))
    assert float(np.asarray(t_merged).sum()) > 0

    # validation errors name the offending mesh axis
    with pytest.raises(ValueError, match="cells"):
        traced(cp[:n_cells - 1], gr, rays_in, jnp.asarray(rng_dev), ctrl)
    with pytest.raises(ValueError, match="samples"):
        traced(cp, gr, rays_in, jnp.asarray(rng_dev[:1]), ctrl)


def test_classify_rays_guards():
    """The cell-sharding wrappers' shared/per-cell discriminator: shared
    per-design tiles replicate, per-cell blocks shard, and the two layouts
    that would silently fan out the wrong rows on a multi-device mesh are
    rejected loudly (multi-design shared tiles; cells_per_block > 1)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.parallel.shard import (
        _classify_rays,
    )

    cp = np.zeros((8, 4))          # 8 cells
    gr1 = np.zeros((1, 3))         # one design
    gr2 = np.zeros((2, 3))         # two designs
    per_cell = np.zeros((8, 6, 1, 128))
    shared1 = np.zeros((1, 6, 1, 128))

    assert _classify_rays(cp, gr1, per_cell, 4) == (False, False)
    assert _classify_rays(cp, gr1, shared1, 4) == (True, False)
    # single device: anything the kernel accepts is fine
    assert _classify_rays(cp, gr2, np.zeros((2, 6, 1, 128)), 1) == (True, False)
    # whole designs per device: 2 designs over 2 devices shard the design axis
    assert _classify_rays(cp, gr2, np.zeros((2, 6, 1, 128)), 2) == (True, True)

    with pytest.raises(ValueError, match="whole designs per device"):
        _classify_rays(cp, gr2, np.zeros((2, 6, 1, 128)), 4)
    with pytest.raises(ValueError, match="shared per-design ray-tile"):
        _classify_rays(cp, gr2, np.zeros((8, 6, 1, 128)), 2)
    with pytest.raises(ValueError, match="cells_per_block"):
        _classify_rays(cp, gr1, np.zeros((4, 6, 1, 128)), 4)


def test_pupil_loss_degenerate_pupil_raises():
    """A pupil that leaves <2 valid eye positions would zero the integrated
    uniformity term silently; _pupil_for must reject it."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.opt.grating_opt import (
        _pupil_for,
    )

    assert _pupil_for(0, 24, 24) is None
    assert _pupil_for(6, 24, 24) is not None
    with pytest.raises(ValueError, match="eye positions"):
        _pupil_for(30, 24, 24)
