"""Persistent-slot respawn kernel vs monolithic kernel (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    trace_pallas,
    trace_pallas_persistent,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)

M, N = 4, 3
RPC = 128
RT = 1


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=0.05)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=RPC, max_bounces=600,
                      rng_mode="fast", ic_test="circle", seed=6)
    n_cells = 3 * M * N
    cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
    gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
    batch = seeding.build_ray_batch(geom, cfg)
    rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, RPC, RT)
    return geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in


def _mono_hist(cfg, tgeom, cp, gr, rays_in, rng, n_cells):
    mono = trace_pallas.make_pallas_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, interpret=True)
    dep, nb, rays_out, st_out, rng_out = mono(cp, gr, rays_in, rng)
    hist = np.asarray(trace_pallas.deposits_to_histogram_cells(
        dep, np.arange(n_cells), 3, M, N, 80, 120))
    return hist, int(np.asarray(nb[:, 0]).sum()), rng_out


def test_persistent_gen1_matches_monolithic(setup):
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    hist_m, nb_m, _ = _mono_hist(cfg, tgeom, cp, gr, rays_in, rng_in, n_cells)

    pers = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=1, interpret=True)
    tiles, nb_p = pers(cp, gr, rays_in, rng_in)
    hist_p = trace_pallas_persistent.hist_tiles_to_histogram(
        tiles, np.arange(n_cells), 3, M, N, 80, 120)
    np.testing.assert_array_equal(hist_m, hist_p)
    assert nb_m == int(np.asarray(nb_p[:, 0]).sum())


def test_persistent_gens_match_sequential_reruns(setup):
    """gens=2 must equal two sequential monolithic passes with carried RNG
    (the reference's num_iter re-launch semantics,
    gpu_ray_tracing_pro_fullColor.py:169-177)."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    h1, nb1, rng_after = _mono_hist(cfg, tgeom, cp, gr, rays_in, rng_in, n_cells)
    h2, nb2, _ = _mono_hist(cfg, tgeom, cp, gr, rays_in, rng_after, n_cells)

    pers = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
        max_iters=1300)
    tiles, nb_p = pers(cp, gr, rays_in, rng_in)
    hist_p = trace_pallas_persistent.hist_tiles_to_histogram(
        tiles, np.arange(n_cells), 3, M, N, 80, 120)
    np.testing.assert_array_equal(h1 + h2, hist_p)
    assert nb1 + nb2 == int(np.asarray(nb_p[:, 0]).sum())


def test_simulator_persistent_engine(setup):
    """Pipeline wiring: engine='pallas_persistent' reproduces the jnp engine's
    statistics (identical seeds; generations reuse slot streams)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    sim_p = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                      interpret=True, persistent_slots=128)
    sim_j = Simulator(cfg=cfg, engine="jnp", geom=geom,
                      geometry_simplify_tol=0.05)
    rp = sim_p.run(rays_per_fov=256, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=n_cells)
    rj = sim_j.run(rays_per_fov=256, num_iter=1, evaluate_metrics=False)
    assert rp.rays_traced == rj.rays_traced == 256 * n_cells
    # different sampling interleave (gens vs flat) but same per-slot statistics;
    # totals agree statistically
    tp = rp.histogram.sum()
    tj = rj.histogram.sum()
    sigma = np.sqrt(max(tj, 1.0))
    assert abs(tp - tj) < 6 * sigma + 10


def test_simulator_persistent_trace_batch_direct(setup):
    """trace_batch (non-fast-path) must seed slot counts, not total samples."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    sim = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                    interpret=True, persistent_slots=128)
    hist, bounces, n = sim.trace_batch(np.arange(6), 256, 0)
    assert n == 6 * 256
    assert int(bounces) > 0


def test_device_ray_blocks_match_host_path(setup):
    """The broadcast+device path must equal the host pack path bit-for-bit."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import seeding
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    sim = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                    interpret=True, persistent_slots=128)
    cells = np.array([2, 7, 11])
    d_rays, d_rng = sim._device_ray_blocks(cells, 128, iteration=1)
    batch = seeding.build_ray_batch(geom, cfg, cell_ids=cells,
                                    rays_per_cell=128, iteration=1)
    h_rays, h_rng = trace_pallas.pack_ray_blocks(batch, 3, 128, 1)
    # the device path returns ONE (6, RT, 128) field tile (the kernel's
    # BlockSpec fans it out to every cell); it must equal every cell's host
    # block bit-for-bit, and the device-hashed seeds must match the host hash
    d_rays = np.asarray(d_rays)
    assert d_rays.shape == (1,) + h_rays.shape[1:]
    for i in range(len(cells)):
        np.testing.assert_array_equal(d_rays[0], h_rays[i])
    np.testing.assert_array_equal(np.asarray(d_rng), h_rng)


def test_cond_interval_invariance(setup):
    """cond_interval only changes sync cadence; results must be identical."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    outs = []
    for ci in (1, 5, 8):
        pers = trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
            max_iters=1300, cond_interval=ci)
        tiles, nb = pers(cp, gr, rays_in, rng_in)
        outs.append((np.asarray(tiles), np.asarray(nb[:, 0])))
    for tiles, nb in outs[1:]:
        np.testing.assert_array_equal(outs[0][0], tiles)
        np.testing.assert_array_equal(outs[0][1], nb)


def test_runtime_ctrl_equals_baked_gens(setup):
    """gens is a runtime scalar: fn(gens=1) with ctrl=[2,0] == fn(gens=2)."""
    import jax.numpy as jnp

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    f1 = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=1, interpret=True,
        max_iters=1300)
    f2 = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
        max_iters=1300)
    t1, n1 = f1(cp, gr, rays_in, rng_in, jnp.asarray([2, 0], jnp.int32))
    t2, n2 = f2(cp, gr, rays_in, rng_in)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    # gens mode: every slot spawns exactly `gens` rays
    assert np.all(np.asarray(n1)[:, 2] == 2 * RT * 128)


def test_saturating_spawn(setup):
    """spawn_iters>0: deterministic, oversamples, and the renormalized
    histogram statistically matches the fixed-gens estimate."""
    import jax.numpy as jnp

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    fn = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=1, interpret=True,
        max_iters=1300)
    ctrl = jnp.asarray([1, 120], jnp.int32)
    t_a, n_a = fn(cp, gr, rays_in, rng_in, ctrl)
    t_b, n_b = fn(cp, gr, rays_in, rng_in, ctrl)
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
    np.testing.assert_array_equal(np.asarray(n_a), np.asarray(n_b))
    spawns = np.asarray(n_a)[:, 2].astype(np.float64)
    assert np.all(spawns >= RT * 128)          # at least the initial spawn
    assert spawns.sum() > 3 * n_cells * RT * 128  # genuinely oversampled
    # per-ray deposit mass must agree with a large fixed-gens run
    t_ref, n_ref = fn(cp, gr, rays_in, rng_in, jnp.asarray([12, 0], jnp.int32))
    a = np.asarray(t_a).sum(axis=(1, 2)) / spawns
    r = np.asarray(t_ref).sum(axis=(1, 2)) / (12.0 * RT * 128)
    assert abs(a.sum() - r.sum()) / max(r.sum(), 1e-12) < 0.15


def test_simulator_spawn_iters(setup):
    """Pipeline renormalization: spawn_iters run matches plain run totals."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    sim_s = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                      interpret=True, persistent_slots=128, spawn_iters=100)
    sim_0 = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                      interpret=True, persistent_slots=128)
    rs = sim_s.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=n_cells)
    r0 = sim_0.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=n_cells)
    assert rs.rays_traced > r0.rays_traced  # actual spawns reported
    ts, t0_ = rs.histogram.sum(), r0.histogram.sum()
    assert abs(ts - t0_) / max(t0_, 1e-12) < 0.25  # nominal-unit histograms


def test_no_deposit_buffer_overflow(setup):
    """nb[:, 3] counts third-deposit-in-window events; must be zero."""
    import jax.numpy as jnp

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    fn = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=1, interpret=True,
        max_iters=1300)
    _, nb = fn(cp, gr, rays_in, rng_in, jnp.asarray([1, 200], jnp.int32))
    assert np.all(np.asarray(nb)[:, 3] == 0)


def test_persistent_wavelength_subset(setup):
    """The fast path must handle non-contiguous cell subsets (gather branch of
    _device_ray_blocks) — e.g. a green-only run."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    sim = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                    interpret=True, persistent_slots=128)
    res = sim.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False,
                  wavelengths=(1,), cells_per_batch=5)  # 12 cells in batches of 5
    assert res.histogram[1].sum() > 0
    assert res.histogram[0].sum() == 0
    assert res.histogram[2].sum() == 0
    assert res.rays_traced == 128 * M * N


def test_persistent_parity_rng_branch(setup):
    """rng_mode='parity' bypasses the precomputed-RNG fast path; the host
    seeding branch must produce equivalent statistics to the jnp engine on
    identical streams."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg_fast, n_cells, *_ = setup
    import dataclasses

    cfg = dataclasses.replace(cfg_fast, rng_mode="parity")
    sim_p = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                      interpret=True, persistent_slots=128)
    sim_j = Simulator(cfg=cfg, engine="jnp", geom=geom,
                      geometry_simplify_tol=0.05)
    rp = sim_p.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False,
                   cells_per_batch=n_cells)
    rj = sim_j.run(rays_per_fov=128, num_iter=1, evaluate_metrics=False)
    assert rp.rays_traced == rj.rays_traced
    # identical xorshift streams -> near-identical outcomes
    tp, tj = rp.histogram.sum(), rj.histogram.sum()
    assert abs(tp - tj) <= max(3.0, 0.02 * tj)
    assert abs(rp.total_bounces - rj.total_bounces) <= 0.01 * rj.total_bounces


def test_device_metrics_path_matches_host(setup):
    """histogram_device=True evaluates metrics from device-side pupil
    integration; results must match the host-histogram evaluation."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom, tgeom, cfg, n_cells, *_ = setup
    sim = Simulator(cfg=cfg, engine="pallas_persistent", geom=geom,
                    interpret=True, persistent_slots=128)
    rd = sim.run(rays_per_fov=128, num_iter=1, evaluate_metrics=True,
                 cells_per_batch=n_cells, histogram_device=True)
    rh = sim.run(rays_per_fov=128, num_iter=1, evaluate_metrics=True,
                 cells_per_batch=n_cells, histogram_device=False)
    assert isinstance(rh.histogram, np.ndarray)
    np.testing.assert_array_equal(np.asarray(rd.histogram), rh.histogram)
    assert abs(rd.metrics.delta_e - rh.metrics.delta_e) < 1e-3
    assert abs(rd.metrics.u_fov - rh.metrics.u_fov) < 1e-6
    assert abs(rd.metrics.u_eyebox - rh.metrics.u_eyebox) < 1e-6


def test_flush_window_invariance(setup):
    """Deposit staging windows only regroup exact integer adds; histograms
    and counters must be bitwise identical across flush_w settings."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    outs = []
    for fw in (4, 8, 16):
        pers = trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
            max_iters=1300, flush_w=fw)
        tiles, nb = pers(cp, gr, rays_in, rng_in)
        outs.append((np.asarray(tiles), np.asarray(nb)))
    for tiles, nb in outs[1:]:
        np.testing.assert_array_equal(outs[0][0], tiles)
        np.testing.assert_array_equal(outs[0][1], nb)
    assert np.all(outs[0][1][:, 3] == 0)  # no staging overflows


def test_bf16_accum_mode_close_to_f32(setup):
    """accum_mode='bf16' rounds the selected parameters to bf16 (~0.4%
    relative); physics must agree with the f32 path statistically, not
    bitwise: total deposits and bounces within a few percent."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    res = {}
    for mode in ("fma", "bf16"):
        pers = trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
            max_iters=1300, accum_mode=mode)
        tiles, nb = pers(cp, gr, rays_in, rng_in)
        res[mode] = (float(np.asarray(tiles).sum()),
                     int(np.asarray(nb)[:, 0].sum()))
    dep_f, nb_f = res["fma"]
    dep_b, nb_b = res["bf16"]
    assert dep_f > 0 and dep_b > 0
    assert abs(dep_b - dep_f) / dep_f < 0.15
    assert abs(nb_b - nb_f) / nb_f < 0.05


def test_packed_accum_mode_close_to_f32(setup):
    """accum_mode='packed' (bf16-pair words, where-chain selection, shift +
    bitcast unpack — the Mosaic-compatible reduced-precision lowering) must
    agree with the f32 path within bf16-rounding statistics, and exactly with
    accum_mode='bf16' at the selected-parameter level (same rounding)."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    cpk = trace_pallas_persistent.pack_selection_params(
        np.asarray(cp), tgeom.num_fc, tgeom.num_oc)
    res = {}
    for mode in ("fma", "packed"):
        pers = trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
            max_iters=1300, accum_mode=mode)
        kw = {"cell_params_packed": cpk} if mode == "packed" else {}
        tiles, nb = pers(cp, gr, rays_in, rng_in, **kw)
        res[mode] = (float(np.asarray(tiles).sum()),
                     int(np.asarray(nb)[:, 0].sum()))
    dep_f, nb_f = res["fma"]
    dep_p, nb_p = res["packed"]
    assert dep_f > 0 and dep_p > 0
    assert abs(dep_p - dep_f) / dep_f < 0.15
    assert abs(nb_p - nb_f) / nb_f < 0.05

    # missing / superfluous packed tables are rejected
    pers_p = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
        max_iters=1300, accum_mode="packed")
    with pytest.raises(ValueError, match="packed"):
        pers_p(cp, gr, rays_in, rng_in)


def test_transit_jump_matches_single_hop(setup):
    """transit_jump collapses every TIR-miss run to one iteration.  Event
    indices come from half-plane interval arithmetic, so the mode is
    within-MC-tolerance (like packed) rather than bitwise: deposits must
    agree closely, bounce totals (which count the skipped hops) almost
    exactly, and the iteration count must strictly drop."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    cpk = trace_pallas_persistent.pack_selection_params(
        np.asarray(cp), tgeom.num_fc, tgeom.num_oc)
    res = {}
    for jump, phase in ((False, "cos"), (True, "cos"), (True, "pow2")):
        pers = trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
            max_iters=1300, accum_mode="packed", transit_jump=jump,
            jump_phase=phase,
            edge_counts=(len(tgeom.hull_hp), len(tgeom.r1_hp),
                         len(tgeom.r2_hp)))
        tiles, nb = pers(cp, gr, rays_in, rng_in, cell_params_packed=cpk)
        res[(jump, phase)] = (np.asarray(tiles), np.asarray(nb))
    t0, nb0 = res[(False, "cos")]
    t1, nb1 = res[(True, "cos")]
    dep0, dep1 = t0.sum(), t1.sum()
    assert dep0 > 0
    # per-ray outcomes can flip only for rays within float rounding of an
    # edge; at this workload the tiles come out identical, but the bound is
    # the contract
    assert abs(dep1 - dep0) / dep0 < 0.05
    b0, b1 = int(nb0[:, 0].sum()), int(nb1[:, 0].sum())
    assert abs(b1 - b0) / b0 < 0.002, (b0, b1)
    assert nb1[:, 1].sum() < nb0[:, 1].sum(), "jump mode must cut iterations"
    # the overflow diagnostic must stay clean under jumps
    assert int(nb1[:, 3].sum()) == 0
    # pow2 phase (exp-by-squaring, production default) vs direct cos/sin:
    # same events and hop counts (the 15-hop clamp only splits long runs
    # into more iterations), deposits within phasor-power rounding
    t2, nb2 = res[(True, "pow2")]
    assert int(nb2[:, 0].sum()) == int(nb1[:, 0].sum())
    assert abs(float(t2.sum()) - float(t1.sum())) <= 1e-4 * abs(float(t1.sum()))
    assert nb2[:, 1].sum() < nb0[:, 1].sum()
    assert int(nb2[:, 3].sum()) == 0


def test_transit_jump_requires_packed():
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    with pytest.raises(ValueError, match="transit_jump"):
        Simulator(engine="pallas_persistent", interpret=True,
                  cfg=TraceConfig(num_fov_x=2, num_fov_y=2, rays_per_fov=8),
                  pers_transit_jump=True, pers_accum_mode="fma")


def test_pack_selection_params_round_trip():
    """The packed words hold exactly the bf16 roundings of the row params."""
    import ml_dtypes

    rng = np.random.default_rng(0)
    num_fc, num_oc = 3, 2
    rows = trace_pallas_persistent.selection_row_offsets(num_fc, num_oc)
    pc = max(max(o) for _, o, q in rows for o in [o + (q or [])]) + 1
    cp = rng.normal(size=(5, pc)).astype(np.float32)
    words = trace_pallas_persistent.pack_selection_params(cp, num_fc, num_oc)
    assert words.shape == (5, len(rows) * trace_pallas_persistent._SEL_NW)
    w = words.view(np.uint32).reshape(5, len(rows),
                                      trace_pallas_persistent._SEL_NW)
    lo = (w & 0xFFFF).astype(np.uint16).view(ml_dtypes.bfloat16)
    hi = (w >> 16).astype(np.uint16).view(ml_dtypes.bfloat16)
    got = np.stack([lo, hi], axis=-1).reshape(5, len(rows),
                                              trace_pallas_persistent._SEL_W)
    for r, (_, offs, qoffs) in enumerate(rows):
        want = np.zeros((5, trace_pallas_persistent._SEL_W), np.float32)
        want[:, :34] = cp[:, offs]
        if qoffs is not None:
            want[:, 34:] = cp[:, qoffs]
        np.testing.assert_array_equal(
            got[:, r].astype(np.float32),
            want.astype(ml_dtypes.bfloat16).astype(np.float32))
    # the kernel's packed selection chains the 8 q-words (record words
    # 17-24) only over the OC rows; that is sound iff the IC/FC rows store
    # zeros there — guard the invariant the q-skip relies on
    for r, (kind, _, qoffs) in enumerate(rows):
        if qoffs is None:
            np.testing.assert_array_equal(
                got[:, r, 34:].astype(np.float32), 0.0,
                err_msg=f"non-OC row {r} ({kind}) must store zero q-words")


def test_body_unroll_invariance(setup):
    """body_unroll replicates the bounce body at trace level (the production
    full-unroll mode on TPU); results must be bitwise-identical to unroll=1."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    outs = []
    for unroll in (1, 4):
        pers = trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=True,
            max_iters=1300, cond_interval=8, body_unroll=unroll)
        tiles, nb = pers(cp, gr, rays_in, rng_in)
        outs.append((np.asarray(tiles), np.asarray(nb[:, 0])))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_sweep_trace_fn_memoized(setup):
    """Repeated sweeps must reuse ONE jit-wrapped kernel (a fresh build per
    call retraces the Pallas body and can trigger a full Mosaic recompile —
    the ~60 s/rep sweep regression diagnosed in round 3)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep.design_sweep import (
        _sweep_trace_fn,
    )

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    a = _sweep_trace_fn(cfg, 7, 6, 8, 2, True, False, True, "fma")
    b = _sweep_trace_fn(cfg, 7, 6, 8, 2, True, False, True, "fma")
    assert a is b


@pytest.mark.parametrize("spawn", ["gens", "count"])
def test_cells_per_block_bitwise(setup, spawn):
    """cells_per_block=2 packs two cells into one block as row groups; each
    cell's physics (histogram tile, bounce + spawn counts) must be bitwise
    equal to the same cell traced in its own single-cell block with the same
    rng rows.  Packed accum mode (the only cpb mode)."""
    import jax.numpy as jnp

    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    cpk = trace_pallas_persistent.pack_selection_params(
        cp, tgeom.num_fc, tgeom.num_oc)
    kw = dict(gens=2, interpret=True, max_iters=1300, accum_mode="packed",
              count_spawn=(spawn == "count"))
    ctrl = (jnp.array([2 * RPC, 0], jnp.int32) if spawn == "count" else None)

    pers1 = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, RT, **kw)
    tiles1, nb1 = pers1(cp, gr, rays_in, rng_in, ctrl=ctrl,
                        cell_params_packed=cpk)

    # pre-pair consecutive cells: rays (Cb, 6, 2*RT, 128) stacking each pair's
    # per-cell tiles as row groups; rng (C, RT, 128) -> (Cb, 2*RT, 128) is the
    # contiguous reshape the pipeline uses
    r = np.asarray(rays_in)
    rays_pair = (r.reshape(n_cells // 2, 2, 6, RT, 128)
                 .transpose(0, 2, 1, 3, 4).reshape(n_cells // 2, 6, 2 * RT, 128))
    rng_pair = np.asarray(rng_in).reshape(n_cells // 2, 2 * RT, 128)
    pers2 = trace_pallas_persistent.make_persistent_trace_fn(
        cfg, tgeom.num_fc, tgeom.num_oc, 2 * RT, cells_per_block=2, **kw)
    tiles2, nb2 = pers2(cp, gr, jnp.asarray(rays_pair), jnp.asarray(rng_pair),
                        ctrl=ctrl, cell_params_packed=cpk)

    np.testing.assert_array_equal(np.asarray(tiles1), np.asarray(tiles2))
    np.testing.assert_array_equal(np.asarray(nb1)[:, 0], np.asarray(nb2)[:, 0])
    np.testing.assert_array_equal(np.asarray(nb1)[:, 2], np.asarray(nb2)[:, 2])
    assert int(np.asarray(nb2)[:, 3].sum()) == 0


def test_transit_jump_design_fuzz():
    """Jump-mode event arithmetic is geometry-dependent (per-edge hop-line
    slopes, guarded reciprocals, the OC slab bounds): fuzz the jump/no-jump
    agreement across perturbed designs, not just the paper design.  The
    perturbations move every geometric degree of freedom while keeping strip
    counts (and so the kernel program) fixed — the same set as
    test_design_fuzz."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
        DEG,
        WaveguideDesign,
    )

    perturbs = [
        {"lambda_ic": 379.0, "lambda_oc": 379.0},
        {"phi_ic": -33.0 * DEG, "phi_oc": -147.0 * DEG, "thickness": 0.55},
        {"eyebox_center": (2.0, 13.0), "eyebox_size": (10.0, 9.0),
         "pupil_radius": 1.6, "fov_x": 16.0 * DEG},
    ]
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=RPC,
                      max_bounces=600, rng_mode="fast", ic_test="circle",
                      seed=6)
    n_cells = 3 * M * N
    kernels = {}
    for pk in perturbs:
        d = dataclasses.replace(WaveguideDesign(), **pk)
        geom = generate_geometry(d, M, N)
        tables = build_cell_tables(geom, make_synthetic_luts(geom))
        tgeom = build_trace_geometry(geom, simplify_tol=0.05)
        cp = trace_pallas.build_kernel_cell_params(tables, geom.eyebox_range)
        gr = trace_pallas.build_kernel_geom(tgeom)[None, :]
        batch = seeding.build_ray_batch(geom, cfg)
        rays_in, rng_in = trace_pallas.pack_ray_blocks(batch, n_cells, RPC, RT)
        cpk = trace_pallas_persistent.pack_selection_params(
            np.asarray(cp), tgeom.num_fc, tgeom.num_oc)
        if not kernels:
            # default (padded) edge budget -> one program serves every design
            for jump in (False, True):
                kernels[jump] = trace_pallas_persistent.make_persistent_trace_fn(
                    cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2,
                    interpret=True, max_iters=1300, accum_mode="packed",
                    transit_jump=jump, jump_phase="pow2")
        res = {}
        for jump in (False, True):
            tiles, nb = kernels[jump](cp, gr, rays_in, rng_in,
                                      cell_params_packed=cpk)
            res[jump] = (np.asarray(tiles), np.asarray(nb))
        t0, nb0 = res[False]
        t1, nb1 = res[True]
        assert t0.sum() > 0, pk
        assert abs(t1.sum() - t0.sum()) / t0.sum() < 0.05, pk
        b0, b1 = int(nb0[:, 0].sum()), int(nb1[:, 0].sum())
        assert abs(b1 - b0) / b0 < 0.005, (pk, b0, b1)
        assert nb1[:, 1].sum() < nb0[:, 1].sum(), pk
        assert int(nb1[:, 3].sum()) == 0, pk


def test_bf16_accum_mode_raises_on_compiled_path(setup):
    """accum_mode='bf16' crashes the TPU worker under the current Mosaic
    toolchain (documented dead end); the compiled path must refuse loudly
    instead of relying on the caller reading the docstring (VERDICT r3 #8)."""
    geom, tgeom, cfg, n_cells, cp, gr, rays_in, rng_in = setup
    import pytest

    with pytest.raises(NotImplementedError, match="interpret"):
        trace_pallas_persistent.make_persistent_trace_fn(
            cfg, tgeom.num_fc, tgeom.num_oc, RT, gens=2, interpret=False,
            max_iters=1300, accum_mode="bf16")
