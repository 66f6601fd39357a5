"""Batched design-space sweeps: one compiled trace, vmapped over a design axis.

A capability the reference does not have (its driver hard-codes one design).  Each
candidate design's geometry/LUT tables are built host-side (cheap, seconds), padded
to common array shapes, stacked along a leading design axis, and traced by a single
``jax.vmap``-ed program -- so evaluating 64 coupler variants costs one compile and
one device dispatch, with rays, tables, and geometry batched together.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraceConfig, WaveguideDesign
from ..design.geometry import generate_geometry
from ..engine import seeding, trace_jnp
from ..engine.trace_geometry import TraceGeometry, build_trace_geometry
from ..luts.packing import build_cell_tables
from ..luts.synthetic import make_synthetic_luts


def _pad_hp(hp: np.ndarray, target: int) -> np.ndarray:
    """Pad a half-plane array with always-satisfied rows (0, 0, 1)."""
    pad = target - len(hp)
    if pad <= 0:
        return hp
    filler = np.tile(np.array([[0.0, 0.0, 1.0]]), (pad, 1))
    return np.concatenate([hp, filler], axis=0)


def _stack_geoms(tgeoms: Sequence[TraceGeometry]) -> dict:
    """Stack TraceGeometry objects into one dict pytree with a design axis."""
    e_max = {
        "ic_hp": max(len(g.ic_hp) for g in tgeoms),
        "r1_hp": max(len(g.r1_hp) for g in tgeoms),
        "r2_hp": max(len(g.r2_hp) for g in tgeoms),
        "hull_hp": max(len(g.hull_hp) for g in tgeoms),
    }
    out = {}
    for g in tgeoms:
        G = trace_jnp._geom_jnp(
            dataclasses.replace(
                g,
                ic_hp=_pad_hp(g.ic_hp, e_max["ic_hp"]),
                r1_hp=_pad_hp(g.r1_hp, e_max["r1_hp"]),
                r2_hp=_pad_hp(g.r2_hp, e_max["r2_hp"]),
                hull_hp=_pad_hp(g.hull_hp, e_max["hull_hp"]),
            )
        )
        for k, v in G.items():
            out.setdefault(k, []).append(v)
    return {k: jnp.stack(v) for k, v in out.items()}


import functools


@functools.lru_cache(maxsize=16)
def _chunk_reducer(nd: int, n_cells: int, L: int, MN: int, nx: int,
                   renorm: bool, nominal: int):
    """One jitted per-chunk reduction: (tiles, nb) -> (eff, bounces, factor).

    ``factor`` is the per-cell Wald renormalization (nominal/actual spawns)
    applied to the histogram sums; arithmetic matches the former eager chain
    op-for-op.
    """
    import jax as _jax
    import jax.numpy as _jnp

    @_jax.jit
    def red(tiles, nb):
        spawned = _jnp.maximum(nb[:, 2], 1).astype(_jnp.float32)
        factor = (nominal / spawned) if renorm else _jnp.ones_like(spawned)
        cell_sums = _jnp.sum(tiles[:, :, :nx], axis=(1, 2)) * factor
        per_design_l = cell_sums.reshape(nd, L, MN).sum(axis=2)
        eff = per_design_l / (nominal * MN * L) * L
        bounces = _jnp.sum(nb[:, 0].reshape(nd, n_cells), axis=1)
        return eff, bounces, factor

    return red


@functools.lru_cache(maxsize=8)
def _sweep_trace_fn(cfg: TraceConfig, num_fc: int, num_oc: int, rt: int,
                    gens: int, interpret: bool, phase_gating: bool,
                    count_spawn: bool, accum_mode: str,
                    cells_per_block: int = 1, transit_jump: bool = False):
    """Memoized persistent-kernel builder for sweeps.

    ``run_design_sweep_persistent`` is called repeatedly (bench reps, CLI
    grids, optimizer loops); rebuilding the ``jax.jit``-wrapped kernel each
    call retraces the whole Pallas body (~seconds) and, if anything in the
    program differs from the cached binary, pays a full Mosaic compile
    (~minutes).  One kernel per (config-shape, rt, mode) combination serves
    every sweep — edge counts are pinned to the full padded budget by the
    caller, so the program is design-list-independent.  ``TraceConfig`` is a
    frozen dataclass (hashable).
    """
    from ..engine import trace_pallas_persistent
    from ..engine.trace_pallas import MAX_EDGES

    return trace_pallas_persistent.make_persistent_trace_fn(
        cfg, num_fc, num_oc, rt * cells_per_block, gens=gens,
        interpret=interpret,
        phase_gating=phase_gating, max_iters=cfg.max_bounces,
        edge_counts=(MAX_EDGES,) * 3, count_spawn=count_spawn,
        accum_mode=accum_mode, cells_per_block=cells_per_block,
        transit_jump=transit_jump, jump_phase="pow2")


@functools.lru_cache(maxsize=16)
def _chunk_perceiver(nd: int, n_cells: int, L: int, M: int, N: int,
                     ny: int, nx: int, msize: int, step_y: int, step_x: int):
    """One jitted per-chunk reduction: (tiles, factor) -> pupil-integrated
    perception stacks (nd, L, N, M, epy, epx) for full-metric sweeps.

    Assembles each design's (L, N, M, ny, nx) histogram from its
    Wald-renormalized cell tiles on device (reshape/transpose only — the
    cell grid is laid out (L, M, N)-major, cf. hist_tiles_to_histogram) and
    applies the same pupil-window integration as
    :func:`..eval.metrics.eye_perceived_conv_jnp` (shared
    :func:`..eval.metrics.pupil_conv` core)."""
    import jax as _jax
    import jax.numpy as _jnp

    from ..eval.metrics import pupil_conv, pupil_mask

    mask_np = pupil_mask(msize)

    @_jax.jit
    def perceive(tiles, factor):
        h = (tiles * factor[:, None, None])[:, :, :nx]
        h = h.reshape(nd, L, M, N, ny, nx).transpose(0, 1, 3, 2, 4, 5)
        return pupil_conv(h, _jnp.asarray(mask_np, tiles.dtype),
                          (step_y, step_x))

    return perceive


@dataclasses.dataclass
class SweepResult:
    designs: List[WaveguideDesign]
    histograms: np.ndarray       # (D, L, N, M, ny, nx)
    efficiencies: np.ndarray     # (D, L) per-design per-wavelength efficiency
    bounces: np.ndarray          # (D,)
    # per-design display metrics (delta_e / u_fov / u_eyebox EvalResults),
    # filled by run_design_sweep_persistent(evaluate_metrics=True)
    metrics: Optional[list] = None


def run_design_sweep(
    designs: Sequence[WaveguideDesign],
    cfg: TraceConfig = TraceConfig(num_fov_x=16, num_fov_y=12, rays_per_fov=256,
                                   max_bounces=2048),
    lut_seed: int = 1234,
) -> SweepResult:
    """Trace every design with identical workloads; returns per-design results.

    All designs must share strip counts (num_fc/num_oc) -- they always do unless the
    sweep varies those counts themselves, in which case group by count first.
    """
    tgeoms, tables_list, batches = [], [], []
    for d in designs:
        geom = generate_geometry(d, cfg.num_fov_x, cfg.num_fov_y)
        luts = make_synthetic_luts(geom, seed=lut_seed)
        tables_list.append(build_cell_tables(geom, luts))
        tgeoms.append(build_trace_geometry(geom, simplify_tol=1e-3))
        b = seeding.build_ray_batch(geom, cfg)
        batches.append(b)

    num_fc = tgeoms[0].num_fc
    num_oc = tgeoms[0].num_oc
    if any(g.num_fc != num_fc or g.num_oc != num_oc for g in tgeoms):
        raise ValueError("designs in one sweep batch must share strip counts")

    T = {}
    for tab in tables_list:
        for k, v in trace_jnp._as_jnp(tab).items():
            if isinstance(v, jnp.ndarray):
                T.setdefault(k, []).append(v)
    T = {k: jnp.stack(v) for k, v in T.items()}
    G = _stack_geoms(tgeoms)
    rays = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[
            trace_jnp.make_ray_state(
                b["x"], b["y"], b["te"], b["tm"], b["cid"], b["idx"], b["rng"]
            )
            for b in batches
        ],
    )

    core = trace_jnp.make_trace_fn_dynamic(
        cfg, num_fc, num_oc, cfg.num_fov_x * cfg.num_fov_y
    )
    ny, nx = cfg.eyebox_bins
    L, M, N = 3, cfg.num_fov_x, cfg.num_fov_y

    @jax.jit
    def sweep(rays, T, G):
        def one(rays, T, G):
            rays_f, bounces = core(rays, T, G)
            hist = trace_jnp.deposits_to_histogram(
                rays_f["dep"], rays_f["cid"], L, M, N, ny, nx
            )
            return hist, bounces

        return jax.vmap(one)(rays, T, G)

    hists, bounces = jax.block_until_ready(sweep(rays, T, G))
    hists = np.asarray(hists)
    num_rays_per_design = hists.shape[1] * M * N * cfg.rays_per_fov  # L*M*N*rpf
    eff = hists.sum(axis=(2, 3, 4, 5)) / num_rays_per_design * 3
    return SweepResult(
        designs=list(designs),
        histograms=hists,
        efficiencies=eff,
        bounces=np.asarray(bounces),
    )


def run_design_sweep_persistent(
    designs: Sequence[WaveguideDesign],
    cfg: TraceConfig = TraceConfig(num_fov_x=16, num_fov_y=12,
                                   rays_per_fov=2048, max_bounces=4096),
    lut_seed: int = 1234,
    spawn_iters: int = 256,
    interpret: bool = False,
    keep_histograms: bool = False,
    designs_per_batch: int = 16,
    _force_host_blocks: bool = False,
    spawn_mode: str = "gens",
    slots: Optional[int] = None,
    accum_mode: str = "fma",
    evaluate_metrics: bool = False,
    eval_cfg=None,
    cells_per_block: int = 1,
    mesh=None,
    transit_jump: bool = False,
) -> SweepResult:
    """Design sweep on the production persistent kernel (TPU speed-of-light path).

    The kernel's grid is ``D x (L*M*N)`` cell blocks laid out as D contiguous
    per-design runs; each grid step reads its design's geometry scalars from a
    per-design SMEM row, so a whole design batch is ONE pallas_call at the
    same per-cell throughput as a single-design production run instead of the
    gather-bound vmapped jnp path.  Sweeps larger than ``designs_per_batch``
    dispatch in chunks (ray/tile buffers are ~60 MB HBM per design at the
    default config; 256 designs at once exhausts a v5e).  The default chunk
    of 16 is an overlap choice, not an HBM one: chunk ``i+1``'s host prep
    (geometry + tables, the sweep's largest cost) runs while chunk ``i``
    traces on device, and smaller chunks start that overlap sooner — measured
    5.2 -> 4.0 s on the 64-design bench sweep vs 64-design chunks, with the
    dispatch count still negligible.  The tail chunk is
    padded with repeats of the last design so every dispatch reuses the one
    compiled kernel, and the padding's results are dropped.

    The loop is **host/device pipelined**: chunk k+1's host prep runs while
    chunk k traces on the device — dispatches are async and every device->host
    pull (efficiency reductions, overflow counters) is deferred to the end, so
    sweep wall-clock is max(host, device) instead of their sum.  Host prep is
    itself *chunk-batched*: the synthetic-LUT -> cell-table -> kernel-row ->
    packed-selection pipeline runs once over the chunk's design axis
    (luts.packing.build_cell_tables_synthetic_batch, bitwise-identical to
    per-design prep), leaving per-design host work at just the geometry
    generation (~10-40 ms/design depending on host load).

    ``spawn_mode="count"``: trace each cell's *exact* ``cfg.rays_per_fov``
    sample target with the count-spawn kernel (lanes share the budget; see
    trace_pallas_persistent) instead of a ``spawn_iters``-saturated
    oversampled run — ~40x less device work at the default sweep config, the
    right mode when ranking many designs.  ``slots`` overrides the lane count
    per cell.  The default (min(rays_per_fov, 2048)) meets the whole sample
    target in ONE generation per lane: at sweep scale the per-block cost is
    dominated by the fixed ~50-iteration residual-lifetime drain, so fewer,
    wider generations win — slots=1024 (2 gens) measured 13% slower than
    slots=2048 at the 64-design bench config on v5e (an earlier
    fewer-slots-amortize-better result predated the THP fix and count mode).
    Per-design efficiencies reduce on device; full histograms are pulled only
    on ``keep_histograms`` (a D x 0.3 GB pull otherwise).

    ``evaluate_metrics=True`` additionally computes the four display metrics
    *per design* (ΔE2000 color dispersion, FoV/eyebox uniformity — the
    numbers the reference driver prints for its one design,
    gpu_ray_tracing_pro_fullColor.py:205-210) so sweeps can rank on the real
    objective instead of raw efficiency.  Cost is one extra jitted
    pupil-integration per chunk plus one batched colorimetry dispatch at the
    end (vmapped :func:`..eval.metrics.evaluate_jnp_batch`); nothing larger
    than the (D, L, fy, fx, 7, 8) perception stacks ever leaves the device.
    Results land in ``SweepResult.metrics`` (one EvalResult per design).

    ``cells_per_block`` (packed accum mode + broadcast path only) packs that
    many cells into each kernel block as sublane row groups (see
    trace_pallas_persistent) — sweep cells are extremely drain-tail-bound
    (a ~2048-sample target is 1-2 generations per lane against a ~50-iter
    residual max lifetime), so fewer slots per cell at a fixed block width
    amortizes the tail; per-cell physics is bitwise-identical to
    single-cell blocks.  ``SWEEP_CPB`` env overrides for probing.
    """
    import jax.numpy as jnp

    from ..engine import seeding, trace_pallas, trace_pallas_persistent

    D = len(designs)
    L, M, N = 3, cfg.num_fov_x, cfg.num_fov_y
    n_cells = L * M * N
    ny, nx = cfg.eyebox_bins
    if spawn_mode not in ("gens", "count"):
        raise ValueError(f"unknown spawn_mode {spawn_mode!r}")
    count_spawn = spawn_mode == "count"
    if slots is None:
        slots = min(cfg.rays_per_fov, 2048)
    slots = max(trace_pallas.LANES,
                (min(slots, cfg.rays_per_fov) // trace_pallas.LANES)
                * trace_pallas.LANES)
    rt = slots // trace_pallas.LANES
    gens = -(-cfg.rays_per_fov // slots)

    # With shared pupil samples + the fast RNG, every cell of a design shares
    # one (6, RT, 128) field tile and the per-ray RNG seeds are a pure hash of
    # the global ray index: upload one tile per design (~50 KB) and broadcast
    # on device, hashing seeds there too (bitwise = the host path; see
    # ops.rng.seed_fast_device).  The full host-built blocks are ~30 MB per
    # design over the relay link and dominated sweep wall-clock otherwise.
    # seed contract: global ray index = cid * slots + slot (iteration 0),
    # hashed with ops.rng.seed_fast — the same contract as
    # pipeline.Simulator._device_ray_blocks (which adds an iteration term);
    # keep the two in sync.  Grids whose ray indices exceed 32 bits fall back
    # to the full host-built blocks (as the pipeline does).
    broadcast = (cfg.shared_pupil_samples and cfg.rng_mode == "fast"
                 and n_cells * slots <= 0xFFFFFFFF
                 and not _force_host_blocks)

    import os as _os

    cpb = int(_os.environ.get("SWEEP_CPB", cells_per_block))
    if cpb > 1:
        if accum_mode != "packed" or not broadcast or n_cells % cpb:
            raise ValueError(
                "cells_per_block > 1 requires accum_mode='packed', the "
                "broadcast ray path, and a cell count divisible by it "
                f"(got accum_mode={accum_mode!r}, broadcast={broadcast}, "
                f"{n_cells} cells, cpb={cpb})")

    import dataclasses as _dc

    from ..luts.packing import build_cell_tables_synthetic_batch

    def prep(idx):
        """Host artifacts for a whole design chunk, batched.

        Geometry + trace-geometry run per design (hulls/slicing are serial);
        the synthetic-LUT -> cell-table -> kernel-row -> packed-selection
        pipeline runs ONCE over the chunk's design axis
        (build_cell_tables_synthetic_batch), bitwise-identical to per-design
        prep at a fraction of the host time.  Pupil ray tiles are reused
        across designs whose in-coupler polygon is unchanged (grating sweeps
        never move the pupil).
        """
        chunk = [designs[i] for i in idx]
        geoms = [generate_geometry(d, cfg.num_fov_x, cfg.num_fov_y)
                 for d in chunk]
        tgs = [build_trace_geometry(g, simplify_tol=0.05) for g in geoms]
        tables = build_cell_tables_synthetic_batch(geoms, seed=lut_seed)
        cp = trace_pallas.build_kernel_cell_params(
            tables, np.stack([g.eyebox_range for g in geoms]),
            eyebox_bins=cfg.eyebox_bins)          # (D*n_cells, PC)
        cpk = (trace_pallas_persistent.pack_selection_params(
                   cp, tgs[0].num_fc, tgs[0].num_oc)
               if accum_mode == "packed" else None)
        grs = np.stack([trace_pallas.build_kernel_geom(tg) for tg in tgs])
        tiles, rngs = [], []
        prev_ic, prev = None, None
        for g in geoms:
            if broadcast:
                if prev_ic is not None and np.array_equal(prev_ic, g.ic):
                    tiles.append(prev)
                    continue
                b = seeding.build_ray_batch(
                    g, _dc.replace(cfg, rays_per_fov=slots),
                    cell_ids=np.array([0]), rays_per_cell=slots)
                tile, _ = trace_pallas.pack_ray_blocks(b, 1, slots, rt)
                tile0 = tile[0]                   # (6, RT, 128) per design
                if cpb > 1:
                    # every row group (block cell) respawns from the same
                    # shared pupil samples — the single-cell semantics
                    tile0 = np.concatenate([tile0] * cpb, axis=1)
                prev_ic, prev = g.ic, tile0
                tiles.append(tile0)
            else:
                b = seeding.build_ray_batch(
                    g, _dc.replace(cfg, rays_per_fov=slots))
                r_in, rng_in = trace_pallas.pack_ray_blocks(
                    b, n_cells, slots, rt)
                tiles.append(r_in)
                rngs.append(rng_in)
        return tgs, cp, cpk, grs, tiles, rngs

    trace = None
    nominal = cfg.rays_per_fov if count_spawn else slots * gens
    db = max(1, min(designs_per_batch, D))
    n_dev = 1
    if mesh is not None:
        # mesh-parallel sweep: the design axis shards device-aligned (whole
        # designs per device — parallel.shard._classify_rays); every dispatch
        # is padded to a design count divisible by the mesh axis
        n_dev = mesh.shape[mesh.axis_names[0]]
        if D > db and db % n_dev:
            raise ValueError(
                f"designs_per_batch ({db}) must divide over the {n_dev}-"
                f"device mesh axis for mesh-parallel sweeps")
    eff_parts, bounce_parts, hist_parts, nb_parts = [], [], [], []
    perc_parts = []
    if eval_cfg is None:
        from ..config import EvalConfig

        eval_cfg = EvalConfig()
    rng_cell = None
    if broadcast:
        from ..ops import rng as rng_ops

        ridx = (jnp.arange(n_cells, dtype=jnp.uint32)[:, None]
                * jnp.uint32(slots)
                + jnp.arange(slots, dtype=jnp.uint32)[None, :])
        # the (n_cells // cpb, rt * cpb, LANES) reshape pairs consecutive
        # cells' stream blocks into one kernel block (contiguous: each row
        # group IS its cell's single-cell seed block — bitwise parity)
        rng_cell = rng_ops.seed_fast_device(ridx, cfg.seed).reshape(
            n_cells // cpb, rt * cpb, trace_pallas.LANES)

    chunks = [list(range(s, min(s + db, D))) for s in range(0, D, db)]
    prepped = prep(chunks[0])  # chunk 0 preps up front

    def _pad_rows(a, keep, pad, rows_per_design):
        """Repeat the last design's rows ``pad`` times along axis 0."""
        if pad == 0:
            return a
        tail = a[(keep - 1) * rows_per_design: keep * rows_per_design]
        return np.concatenate([a] + [tail] * pad, axis=0)

    for ci, idx in enumerate(chunks):
        pad = db - len(idx) if D > db else 0
        if mesh is not None:
            pad = max(pad, -len(idx) % n_dev)
        keep = len(idx)
        nd = keep + pad
        tgs, cp, cpk, grs, rays_l, rngs_l = prepped
        if trace is None:
            num_fc, num_oc = tgs[0].num_fc, tgs[0].num_oc
            # Sweep kernels always use the full padded edge budget: (a) the
            # kernel compiles once from chunk 0, and a later chunk's design
            # may simplify to MORE half-planes — a truncated region loop
            # would silently misclassify containment; (b) design-independent
            # edge counts mean ONE kernel serves every sweep of the same
            # (grid, rt, mode) shape, so the memoized jit fn below never
            # retraces/recompiles across calls (a per-design-list exact count
            # forced a fresh ~60 s Mosaic compile per sweep invocation).
            # Padding rows are always-true, so results are exact; the extra
            # rows cost a few % of the ~5%-of-wall kernel time.
            trace = _sweep_trace_fn(
                cfg, num_fc, num_oc, rt, gens,
                interpret, (spawn_iters <= 0 and not count_spawn),
                count_spawn, accum_mode, cpb, transit_jump)
            if mesh is not None:
                from ..parallel.shard import make_sharded_cell_trace_fn

                trace = make_sharded_cell_trace_fn(
                    trace, mesh, axis=mesh.axis_names[0],
                    packed=(accum_mode == "packed"))
        if any(g.num_fc != num_fc or g.num_oc != num_oc for g in tgs):
            raise ValueError(
                "designs in one sweep batch must share strip counts")
        if broadcast:
            # one (6, RT, 128) tile per design + one shared (n_cells, RT, 128)
            # seed block; the kernel's grid index maps fan them out across
            # cells (trace_pallas_persistent.trace), so nothing is broadcast
            # or materialized device-side (~4 GB of staging at the defaults)
            rays_in = jnp.asarray(
                _pad_rows(np.stack(rays_l), keep, pad, 1))   # (nd, 6, RT, 128)
            rng_in = rng_cell
        else:
            rays_in = jnp.asarray(
                _pad_rows(np.concatenate(rays_l, axis=0), keep, pad, n_cells))
            rng_in = jnp.asarray(
                _pad_rows(np.concatenate(rngs_l, axis=0), keep, pad, n_cells))
        kw = ({"cell_params_packed": jnp.asarray(
                  _pad_rows(cpk, keep, pad, n_cells))}
              if accum_mode == "packed" else {})
        tiles, nb = trace(
            jnp.asarray(_pad_rows(cp, keep, pad, n_cells)),
            jnp.asarray(_pad_rows(grs, keep, pad, 1)),
            rays_in, rng_in,
            jnp.asarray([cfg.rays_per_fov if count_spawn else gens,
                         spawn_iters], jnp.int32),
            **kw,
        )
        # async device reductions only — every host pull is deferred so the
        # next chunk's host prep overlaps this chunk's device trace.  The
        # whole reduction chain is ONE jitted dispatch (memoized across
        # chunks/calls): the former eager slice/sum/reshape chain cost ~1.7 s
        # of per-op relay round-trips per chunk.
        nb_parts.append(nb)
        red = _chunk_reducer(nd, n_cells, L, M * N, nx,
                             bool(spawn_iters > 0 or count_spawn), nominal)
        eff_d, bounce_d, factor = red(tiles, nb)
        eff_parts.append(eff_d[:keep])
        bounce_parts.append(bounce_d[:keep])
        if evaluate_metrics:
            perc = _chunk_perceiver(
                nd, n_cells, L, M, N, ny, nx, eval_cfg.pupil_mask_bins,
                eval_cfg.eye_step_y, eval_cfg.eye_step_x)(tiles, factor)
            perc_parts.append(perc[:keep])   # device array; pulled at the end
        if keep_histograms:
            hist_parts.extend(
                trace_pallas_persistent.hist_tiles_to_histogram(
                    np.asarray(tiles[i * n_cells:(i + 1) * n_cells]
                               * factor[i * n_cells:(i + 1) * n_cells,
                                        None, None]),
                    np.arange(n_cells), L, M, N, ny, nx)
                for i in range(keep)
            )
        if ci + 1 < len(chunks):
            prepped = prep(chunks[ci + 1])

    overflowed = int(np.asarray(
        jnp.concatenate([nb[:, 3] for nb in nb_parts])).sum())
    if overflowed:
        raise RuntimeError(
            f"{overflowed} deposit codes overflowed the kernel's staging "
            "slots (nb[:, 3] != 0) — the histogram undercounts; lower "
            "flush_w")
    metrics = None
    if evaluate_metrics:
        from ..eval.metrics import evaluate_jnp_batch

        metrics = evaluate_jnp_batch(
            jnp.concatenate(perc_parts, axis=0), norm=nominal)
    return SweepResult(
        designs=list(designs),
        histograms=np.stack(hist_parts) if keep_histograms else None,
        efficiencies=np.concatenate(
            [np.asarray(e) for e in eff_parts], axis=0),
        bounces=np.concatenate([np.asarray(b) for b in bounce_parts], axis=0),
        metrics=metrics,
    )
