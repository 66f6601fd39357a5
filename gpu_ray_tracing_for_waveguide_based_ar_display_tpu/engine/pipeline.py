"""End-to-end simulation pipeline: design -> LUTs -> trace -> histogram -> metrics.

The TPU-native counterpart of the reference driver
(/root/reference/gpu_ray_tracing_pro_fullColor.py): builds the design geometry and
packed tables once, then traces the Monte-Carlo workload in cell-chunked batches
(bounded device memory; each chunk's while_loop exits as soon as its own rays drain,
so mixed-lifetime cells do not serialize against the global slowest ray), and reduces
the accumulated eyebox histogram to the headline metrics.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import EvalConfig, TraceConfig, WaveguideDesign
from ..design.geometry import DesignGeometry, generate_geometry
from ..eval import EvalResult, efficiencies, evaluate
from ..luts.io import load_or_synthesize
from ..luts.packing import build_cell_tables
from ..luts.schema import RcwaLuts
from . import (
    seeding,
    trace_cellblock,
    trace_jnp,
    trace_pallas,
    trace_pallas_persistent,
)
from .trace_geometry import build_trace_geometry


@dataclasses.dataclass
class SimulationResult:
    histogram: object            # (L, FoVy, FoVx, eb_y, eb_x) raw deposit counts
                                 # (numpy, or a device array when the caller asked
                                 # to keep it resident)
    efficiencies: dict           # {"R","G","B"} system efficiency
    metrics: Optional[EvalResult]
    rays_traced: int
    total_bounces: int
    trace_seconds: float
    # Monte-Carlo standard errors at this run's sampling, from a delete-one
    # jackknife over the num_iter independent sample groups (run(...,
    # error_groups=True)); keys: eff_R/G/B, delta_e, u_fov, u_eyebox.
    metric_stderr: Optional[dict] = None
    # dense-eye-position metrics (run(..., dense_metrics=True)): the same
    # EvalResult evaluated at EVERY valid pupil position instead of the
    # reference's 7x8 sampled grid; eye_luminance is the full-resolution map.
    dense: Optional[EvalResult] = None

    @property
    def bounces_per_second(self) -> float:
        return self.total_bounces / self.trace_seconds if self.trace_seconds else 0.0

    @property
    def rays_per_second(self) -> float:
        return self.rays_traced / self.trace_seconds if self.trace_seconds else 0.0


class Simulator:
    """Holds compiled state for one design + LUT set + trace configuration."""

    def __init__(
        self,
        design: WaveguideDesign = WaveguideDesign(),
        cfg: TraceConfig = TraceConfig(),
        luts: Optional[RcwaLuts] = None,
        luts_dir: Optional[str] = None,
        geom: Optional[DesignGeometry] = None,
        geometry_simplify_tol: float = 0.0,
        engine: str = "jnp",
        interpret: bool = False,
        pallas_segmented: bool = False,
        segment_bounces: int = 24,
        persistent_slots: int = 2048,
        cond_interval: int = 8,
        spawn_iters: int = 0,
        pers_phase_gating: Optional[bool] = None,
        pers_accum_mode: str = "fma",
        mesh=None,
        spawn_mode: str = "gens",
        fold_iterations: bool = False,
        pers_cells_per_block: int = 1,
        pers_transit_jump: bool = False,
        pers_jump_phase: str = "pow2",
        splitting_capacity: Optional[int] = None,
        splitting_threshold: float = 1e-6,
        splitting_max_steps: int = 1024,
        splitting_percell: bool = True,
    ):
        if engine not in ("jnp", "pallas", "pallas_persistent", "cellblock",
                          "splitting"):
            raise ValueError(f"unknown engine {engine!r}")
        if engine.startswith("pallas") and not interpret:
            # Mosaic kernels only compile on TPU; on other backends (CPU
            # tests, virtual meshes) the Pallas engines transparently fall
            # back to interpret mode so the same CLI/API works everywhere
            import jax

            try:
                interpret = jax.devices()[0].platform not in ("tpu", "axon")
            except Exception:
                pass
        self.engine = engine
        self.design = design
        self.cfg = cfg
        self.geom = geom if geom is not None else generate_geometry(
            design, cfg.num_fov_x, cfg.num_fov_y
        )
        self.luts = luts if luts is not None else load_or_synthesize(
            self.geom, directory=luts_dir, seed=cfg.seed + 1234
        )
        self.tables = build_cell_tables(self.geom, self.luts)
        self._persistent_slots = persistent_slots
        self._cond_interval = cond_interval
        # saturating-spawn iteration budget (persistent engine): 0 = off; >0
        # keeps every lane respawning fresh generations until the budget, then
        # drains; per-cell histograms are renormalized by nominal/actual spawns
        self._spawn_iters = spawn_iters
        # spawn_mode="count": per-cell spawn-target respawn (the kernel's
        # count_spawn variant) — lanes share the cell's exact sample budget
        # evenly instead of each tracing a fixed generation quota, which
        # removes the max-over-lanes generation-sum drain tail that dominates
        # small-samples-per-cell workloads (the reference default: 5,000
        # rays/FoV).  Histograms are Wald-renormalized by target/actual.
        if spawn_mode not in ("gens", "count"):
            raise ValueError(f"unknown spawn_mode {spawn_mode!r}")
        self._spawn_mode = spawn_mode
        # fold_iterations: trace num_iter x rays_per_fov samples in ONE kernel
        # pass (interleaved generations with continued per-slot RNG streams =
        # the reference's num_iter relaunch loop, gpu_ray_tracing_pro_fullColor
        # .py:160-182, which re-traces the same rays with persistent
        # rng_states).  Pays the per-cell drain tail once instead of num_iter
        # times; test_persistent_gens_match_sequential_reruns is the
        # equivalence proof for the generation interleave.
        self._fold_iterations = fold_iterations
        # saturating-spawn keeps every phase populated, so the per-phase
        # lax.cond gates (scalar any() reduces) are pure overhead there
        if pers_phase_gating is None:
            pers_phase_gating = spawn_iters <= 0 and spawn_mode != "count"
        self._pers_phase_gating = pers_phase_gating
        self._pers_accum_mode = pers_accum_mode
        # cells-per-block row packing (persistent engine, packed mode): trade
        # per-cell drain-tail fraction against nothing — cpb cells share one
        # wide block as sublane row groups (see trace_pallas_persistent).
        # PERS_CPB env overrides for probing.
        cpb_env = os.environ.get("PERS_CPB")
        if cpb_env is not None:
            pers_cells_per_block = int(cpb_env)
        self._pers_cpb = max(1, int(pers_cells_per_block))
        # ballistic transit jumps (persistent engine, packed mode): TIR-miss
        # lanes advance to their next event in one iteration — see
        # trace_pallas_persistent.make_persistent_trace_fn(transit_jump=...).
        # PERS_JUMP env overrides for probing.
        jump_env = os.environ.get("PERS_JUMP")
        if jump_env is not None:
            pers_transit_jump = jump_env not in ("", "0")
        self._pers_transit_jump = bool(pers_transit_jump)
        # jump-phase lowering: "pow2" (exp-by-squaring of the single-hop
        # phasor; default — measured faster, no per-lane transcendentals) or
        # "cos" (direct cos/sin of k*2*delta).  PERS_JUMP_PHASE overrides.
        self._pers_jump_phase = os.environ.get("PERS_JUMP_PHASE",
                                               pers_jump_phase)
        if self._pers_transit_jump:
            if pers_accum_mode != "packed":
                raise ValueError(
                    "pers_transit_jump requires pers_accum_mode='packed' "
                    "(jump mode is within-MC-tolerance, like the packed "
                    "selection; the fma mode stays the bitwise parity anchor)")
            if self._pers_cpb > 1:
                raise ValueError(
                    "pers_transit_jump does not compose with "
                    "pers_cells_per_block > 1")
        if self._pers_cpb > 1:
            if pers_accum_mode != "packed":
                raise ValueError(
                    "pers_cells_per_block > 1 requires pers_accum_mode="
                    "'packed' (the row-group selection is implemented for "
                    "the packed chain only)")
            if mesh is not None:
                raise ValueError(
                    "pers_cells_per_block > 1 does not compose with a mesh "
                    "(cell-axis shards would split blocks)")
        # optional jax.sharding.Mesh: the persistent engine shards its cell
        # axis over it (disjoint histogram tiles; no collective needed)
        self._mesh = mesh
        if engine.startswith("pallas") and geometry_simplify_tol == 0.0:
            # the kernel holds regions as <= MAX_EDGES scalar half-planes
            geometry_simplify_tol = 0.05
        self.tgeom = build_trace_geometry(self.geom, simplify_tol=geometry_simplify_tol)
        self.L, self.M, self.N = self.geom.th_out_ic.shape
        ny, nx = cfg.eyebox_bins
        self._hist_shape = (self.L, self.N, self.M, ny, nx)
        if engine == "jnp":
            self.trace_fn = trace_jnp.make_trace_fn(self.tables, self.tgeom, cfg)
            self._resume_fns = {}
        elif engine == "splitting":
            # zero-variance engine: deterministic all-branch transport
            # (engine/splitting.py) producing the *exact* branch expectation
            # of the MC tracer for the traced launch positions.  rays_per_fov
            # becomes the pupil-quadrature point count per cell; num_iter > 1
            # adds further independent position batches.
            #
            # Default mode (splitting_percell=True) runs ONE wavefront buffer
            # of ``splitting_capacity`` slots PER CELL, vmapped over the cell
            # chunk — the production-scale engine: cost scales with
            # cells x per-cell tree width, memory with
            # cells_per_batch x capacity, and the full reference grid
            # (22,500 cells) evaluates exactly in bounded memory.
            # splitting_percell=False keeps the legacy single shared buffer
            # (cost scales with the whole batch's tree width; small grids
            # only; the differentiable opt path uses this engine).
            from . import splitting

            if splitting_capacity is None:
                # engine-appropriate defaults: the per-cell buffer needs to
                # hold ONE cell's peak tree width (~2.5k slots per launch
                # position at threshold 1e-6, measured); the legacy shared
                # buffer holds the whole batch's
                splitting_capacity = 8192 if splitting_percell else 1 << 16
            self._split_capacity = splitting_capacity
            self._split_percell = splitting_percell
            if splitting_percell:
                self._split_trace_cells = {}  # per_cell_seeds -> jitted trace
                self._split_kw = dict(
                    capacity=splitting_capacity,
                    weight_threshold=splitting_threshold,
                    max_steps=splitting_max_steps)
            else:
                self._split_trace = splitting.make_splitting_trace_fn(
                    self.tables, self.tgeom, cfg, capacity=splitting_capacity,
                    weight_threshold=splitting_threshold,
                    max_steps=splitting_max_steps)
            # running weight-loss diagnostics (per run() call the caller can
            # difference these; truncated must stay ~0 for the zero-variance
            # guarantee — warned about in trace_batch).  split_peak_live
            # tracks the widest per-cell wavefront seen (per-cell mode), the
            # capacity-sizing diagnostic.
            self.split_truncated = 0.0
            self.split_pruned = 0.0
            self.split_peak_live = 0
        elif engine == "pallas_persistent":
            self._cp = trace_pallas.build_kernel_cell_params(
                self.tables, self.geom.eyebox_range,
                eyebox_bins=cfg.eyebox_bins,
            )
            self._gr = trace_pallas.build_kernel_geom(self.tgeom)[None, :]
            self._pers_cache = {}
            self._interpret = interpret
            import jax.numpy as jnp

            self._cp_dev = jnp.asarray(self._cp)
            self._cpk = self._cpk_dev = None
            if pers_accum_mode == "packed":
                self._cpk = trace_pallas_persistent.pack_selection_params(
                    self._cp, self.tgeom.num_fc, self.tgeom.num_oc)
                self._cpk_dev = jnp.asarray(self._cpk)
        elif engine == "cellblock":
            import jax.numpy as jnp

            T = trace_cellblock.build_cellblock_tables(
                self.tables, self.geom.eyebox_range
            )
            self._cb_tables = {k: jnp.asarray(v) for k, v in T.items()}
            self._cb_trace = trace_cellblock.make_cellblock_trace_fn(
                cfg, self.tgeom.num_fc, self.tgeom.num_oc, self.tgeom
            )
        else:
            self._cp = trace_pallas.build_kernel_cell_params(
                self.tables, self.geom.eyebox_range,
                eyebox_bins=cfg.eyebox_bins,
            )
            self._gr = trace_pallas.build_kernel_geom(self.tgeom)[None, :]
            self._rt_cache = {}
            self._interpret = interpret
            self._segmented = pallas_segmented
            if pallas_segmented:
                from .pallas_segments import SegmentedPallasTracer

                self._seg_tracer = SegmentedPallasTracer(
                    cfg, self.tgeom.num_fc, self.tgeom.num_oc,
                    segment_bounces=segment_bounces, interpret=interpret,
                    hist_dims=(self.L, self.M, self.N),
                )

    # ------------------------------------------------------------------
    def trace_batch(self, cell_ids: np.ndarray, rays_per_cell: int, iteration: int):
        """Trace one batch; returns (histogram jnp array, bounce count, ray count)."""
        seed_count = rays_per_cell
        if self.engine == "pallas_persistent":
            seed_count, _ = self._slots_gens(rays_per_cell)
        batch = seeding.build_ray_batch(
            self.geom, self.cfg, cell_ids=cell_ids,
            rays_per_cell=seed_count, iteration=iteration,
        )
        ny, nx = self.cfg.eyebox_bins
        if self.engine == "jnp":
            rays = trace_jnp.make_ray_state(
                batch["x"], batch["y"], batch["te"], batch["tm"],
                batch["cid"], batch["idx"], batch["rng"],
            )
            rays_f, bounces = self.trace_fn(rays)
            hist = trace_jnp.deposits_to_histogram(
                rays_f["dep"], rays_f["cid"], self.L, self.M, self.N, ny, nx
            )
            return hist, bounces, len(batch["x"])

        if self.engine == "splitting":
            import warnings

            if self._split_percell:
                return self._trace_batch_splitting_cells(
                    batch, cell_ids, rays_per_cell)
            if 2 * len(batch["x"]) > self._split_capacity:
                raise ValueError(
                    f"{len(batch['x'])} launch rays cannot even seed the "
                    f"{self._split_capacity}-slot wavefront buffer; lower "
                    "cells_per_batch / rays_per_fov or raise "
                    "splitting_capacity")
            rays = trace_jnp.make_ray_state(
                batch["x"], batch["y"], batch["te"], batch["tm"],
                batch["cid"], batch["idx"], batch["rng"],
            )
            hist_flat, _out_w, trunc, pruned, steps = self._split_trace(rays)
            self.split_pruned += float(pruned)
            tr = float(trunc)
            self.split_truncated += tr
            if tr > 1e-3 * len(batch["x"]):
                warnings.warn(
                    f"splitting wavefront truncated {tr:.3g} weight "
                    f"({tr / len(batch['x']):.2%} of this batch's launch "
                    "weight) — the expectation is biased low; lower "
                    "cells_per_batch or raise splitting_capacity")
            hist = hist_flat.reshape(self._hist_shape)
            return hist, int(steps), len(batch["x"])

        if self.engine == "cellblock":
            blocks = trace_cellblock.make_ray_blocks(
                batch, len(cell_ids), rays_per_cell
            )
            Tsel = {k: v[cell_ids] for k, v in self._cb_tables.items()}
            rays_f, bounces = self._cb_trace(Tsel, blocks)
            hist = trace_pallas.deposits_to_histogram_cells(
                rays_f["dep"], cell_ids, self.L, self.M, self.N, ny, nx
            )
            return hist, bounces, len(batch["x"])

        if self.engine == "pallas_persistent":
            tiles, nb, n = self._trace_batch_tiles(
                batch, cell_ids, rays_per_cell
            )
            import jax.numpy as jnp

            hist = jnp.asarray(
                trace_pallas_persistent.hist_tiles_to_histogram(
                    tiles, cell_ids, self.L, self.M, self.N, ny, nx
                )
            )
            return hist, jnp.sum(nb[:, 0]), n

        rt = -(-rays_per_cell // trace_pallas.LANES)
        rays_in, rng_in = trace_pallas.pack_ray_blocks(
            batch, len(cell_ids), rays_per_cell, rt
        )
        if self._segmented:
            cid = np.asarray(cell_ids, np.int64)
            l = cid // (self.M * self.N)
            mn = cid % (self.M * self.N)
            base = (((l * self.N + mn % self.N) * self.M + mn // self.N)
                    * (ny * nx)).astype(np.int32)
            hist, bounces = self._seg_tracer.trace(
                self._cp[cell_ids], self._gr, rays_in, rng_in, hist_base=base
            )
            return hist, bounces, len(batch["x"])
        if rt not in self._rt_cache:
            self._rt_cache[rt] = trace_pallas.make_pallas_trace_fn(
                self.cfg, self.tgeom.num_fc, self.tgeom.num_oc, rt,
                interpret=self._interpret,
            )
        dep, nb, *_ = self._rt_cache[rt](
            self._cp[cell_ids], self._gr, rays_in, rng_in
        )
        hist = trace_pallas.deposits_to_histogram_cells(
            dep, cell_ids, self.L, self.M, self.N, ny, nx
        )
        import jax.numpy as jnp

        return hist, jnp.sum(nb[:, 0]), len(batch["x"])

    def _trace_batch_splitting_cells(self, batch: dict, cell_ids: np.ndarray,
                                     rays_per_cell: int):
        """Per-cell-wavefront exact trace of one cell chunk (VERDICT r3 #1).

        Every cell gets its own ``splitting_capacity``-slot buffer (vmapped),
        so capacity needs scale with per-cell tree width only — the full
        reference grid evaluates exactly with a few-thousand-slot buffer.
        Weight ledgers accumulate on the Simulator; any truncation (buffer
        overflow) warns loudly with the observed peak width so the caller can
        raise ``splitting_capacity``."""
        import warnings

        import jax.numpy as jnp

        from . import splitting

        C = len(cell_ids)
        P = rays_per_cell
        shared = bool(self.cfg.shared_pupil_samples)
        te = np.asarray(batch["te"], np.complex128).reshape(C, P)
        tm = np.asarray(batch["tm"], np.complex128).reshape(C, P)
        x = np.asarray(batch["x"], np.float64).reshape(C, P)
        y = np.asarray(batch["y"], np.float64).reshape(C, P)
        if shared:
            x, y, te, tm = x[0], y[0], te[0], tm[0]
        seeds = {
            "x": jnp.asarray(x, jnp.float32),
            "y": jnp.asarray(y, jnp.float32),
            "ter": jnp.asarray(te.real, jnp.float32),
            "tei": jnp.asarray(te.imag, jnp.float32),
            "tmr": jnp.asarray(tm.real, jnp.float32),
            "tmi": jnp.asarray(tm.imag, jnp.float32),
        }
        if shared not in self._split_trace_cells:
            self._split_trace_cells[shared] = splitting.make_splitting_cells_fn(
                self.tables, self.tgeom, self.cfg,
                per_cell_seeds=not shared, **self._split_kw)
        tiles, _out_w, trunc, pruned, steps, peak = self._split_trace_cells[
            shared](jnp.asarray(np.asarray(cell_ids), jnp.int32), seeds)
        self.split_pruned += float(jnp.sum(pruned))
        tr = float(jnp.sum(trunc))
        self.split_truncated += tr
        pk = int(jnp.max(peak))
        self.split_peak_live = max(self.split_peak_live, pk)
        if tr > 0:
            warnings.warn(
                f"splitting wavefront truncated {tr:.3g} weight "
                f"(peak live width {pk}/{self._split_capacity} slots) — the "
                "expectation is biased low; raise splitting_capacity")
        ny, nx = self.cfg.eyebox_bins
        hist = splitting.cells_tiles_to_histogram(
            tiles, np.asarray(cell_ids), self.L, self.M, self.N, ny, nx)
        return hist, int(steps), C * P

    def trace_batch_compacted(
        self, cell_ids: np.ndarray, rays_per_cell: int, iteration: int,
        segment_bounces: int = 64, min_live: int = 4096,
    ):
        """jnp-engine tracing in bounce segments with host-side compaction.

        The single while_loop form pays for every dead ray until the batch's
        slowest ray finishes; segmenting re-packs survivors after every
        ``segment_bounces`` so late-bounce work runs on a small dense batch.
        Bitwise-identical to :meth:`trace_batch` (per-ray RNG streams carry over).
        """
        if self.engine != "jnp":
            raise ValueError("compacted tracing is a jnp-engine scheduler")
        import jax.numpy as jnp

        batch = seeding.build_ray_batch(
            self.geom, self.cfg, cell_ids=cell_ids,
            rays_per_cell=rays_per_cell, iteration=iteration,
        )
        rays = trace_jnp.make_ray_state(
            batch["x"], batch["y"], batch["te"], batch["tm"],
            batch["cid"], batch["idx"], batch["rng"],
        )
        def _seg_fns(seg: int):
            """(full, resume) tracers with a ``seg``-bounce budget, cached."""
            key = ("seg", seg)
            if key not in self._resume_fns:
                seg_cfg = dataclasses.replace(self.cfg, max_bounces=seg)
                T = trace_jnp._as_jnp(self.tables)
                G = trace_jnp._geom_jnp(self.tgeom)
                full = trace_jnp.make_trace_fn_dynamic(
                    seg_cfg, self.tgeom.num_fc, self.tgeom.num_oc,
                    self.M * self.N, mode="full")
                resume = trace_jnp.make_trace_fn_dynamic(
                    seg_cfg, self.tgeom.num_fc, self.tgeom.num_oc,
                    self.M * self.N, mode="resume")
                self._resume_fns[key] = (
                    jax.jit(lambda r: full(r, T, G)),
                    jax.jit(lambda r: resume(r, T, G)),
                )
            return self._resume_fns[key]

        ny, nx = self.cfg.eyebox_bins
        hist = None
        total_bounces = 0
        n_rays = len(batch["x"])
        first = True
        remaining = self.cfg.max_bounces
        while remaining > 0:
            # the final segment gets exactly the leftover budget (at most one
            # extra compiled variant), keeping total bounces == cfg.max_bounces
            # — the bitwise-identity contract with the monolithic trace_batch
            seg = min(segment_bounces, remaining)
            full_fn, resume_fn = _seg_fns(seg)
            rays_f, bounces = (full_fn if first else resume_fn)(rays)
            first = False
            total_bounces += int(bounces)
            remaining -= seg
            h = trace_jnp.deposits_to_histogram(
                rays_f["dep"], rays_f["cid"], self.L, self.M, self.N, ny, nx)
            hist = h if hist is None else hist + h
            state = np.asarray(rays_f["state"])
            live = np.flatnonzero(state < 6)
            if len(live) == 0 or remaining <= 0:
                break
            # round the survivor count up to a power of two to bound re-jits
            target = max(min_live, 1 << int(np.ceil(np.log2(len(live)))))
            sel = np.pad(live, (0, max(0, target - len(live))),
                         constant_values=live[0] if len(live) else 0)
            rays = {k: jnp.asarray(np.asarray(v)[sel]) for k, v in rays_f.items()}
            if target > len(live):
                # mark the pad duplicates dead so they are ignored
                st = np.asarray(rays["state"]).copy()
                st[len(live):] = 6
                rays["state"] = jnp.asarray(st)
            # already-deposited rays were binned in this segment; reset every
            # slot so the next segment's histogram only adds new deposits
            # (dead/pad slots carry the -1 sentinel too)
            rays["dep"] = jnp.full_like(rays["state"], -1)
        return hist, total_bounces, n_rays

    def _slots_gens(self, rays_per_cell: int):
        slots = min(self._persistent_slots, rays_per_cell)
        slots = max(trace_pallas.LANES,
                    (slots // trace_pallas.LANES) * trace_pallas.LANES)
        return slots, -(-rays_per_cell // slots)

    def _device_ray_blocks(self, cell_ids: np.ndarray, slots: int,
                           iteration: int, cpb: int = 1):
        """Build (C, 6, RT, 128) + rng blocks with zero per-batch link traffic.

        With shared pupil samples every cell's field tile is identical, so one
        (6, RT, 128) tile uploads once per (slots, iteration) and broadcasts on
        device; the per-cell RNG seeds are *hashed on device*
        (:func:`..ops.rng.seed_fast_device`, bitwise = the host hash) — the
        seed upload (~184 MB per iteration over a relay link at full workload)
        used to dominate the reference-workload wall clock.

        Seed contract: global ray index = (iteration * cells + cid) * slots
        + slot.  ``sweep.design_sweep`` applies the same contract (iteration
        0) for its broadcast path; keep the two in sync."""
        import jax.numpy as jnp

        rt = slots // trace_pallas.LANES
        key = (slots, iteration, cpb)
        if not hasattr(self, "_base_tiles"):
            self._base_tiles = {}
            self._rng_fn = {}
        if key not in self._base_tiles:
            one = seeding.build_ray_batch(
                self.geom, self.cfg, cell_ids=np.array([0]),
                rays_per_cell=slots, iteration=iteration,
            )
            tile, _ = trace_pallas.pack_ray_blocks(one, 1, slots, rt)
            tile = tile[0]   # (6, RT, 128)
            if cpb > 1:
                # every row group (block cell) respawns from the same shared
                # pupil samples — exactly the single-cell semantics, where
                # every cell shares this tile
                tile = np.concatenate([tile] * cpb, axis=1)
            # iterations are visited in order and an old iteration's tile is
            # never reused — keep one tile per slot size (unbounded growth
            # otherwise on long checkpointed runs)
            for k in [k for k in self._base_tiles if k[0] == slots]:
                del self._base_tiles[k]
            self._base_tiles[key] = jnp.asarray(tile)  # (6, RT * cpb, 128)
        base = self._base_tiles[key]
        C = len(cell_ids)
        # (1, 6, RT, 128): the persistent kernel's BlockSpec fans one tile out
        # to every cell (index map i // cpd with D=1), so no (C, ...) copy is
        # ever materialized on device (~440 MB per 4500-cell batch before)
        rays_in = base[None]

        total_cells = self.L * self.M * self.N
        # global ray index = (iteration * cells + cid) * slots + slot; the
        # device hash runs in uint32, so guard the index range (realistic
        # workloads are ~1e8; fall back to the 64-bit host path beyond)
        if (iteration + 1) * total_cells * slots <= 0xFFFFFFFF:
            from ..ops import rng as rng_ops

            contiguous = np.array_equal(
                cell_ids, np.arange(int(cell_ids[0]), int(cell_ids[0]) + C))
            if contiguous:
                if (C, slots, cpb) not in self._rng_fn:

                    @jax.jit
                    def _seeds(c0, it_cells):
                        cid = c0 + jnp.arange(C, dtype=jnp.uint32)[:, None]
                        idx = ((it_cells + cid) * jnp.uint32(slots)
                               + jnp.arange(slots, dtype=jnp.uint32)[None, :])
                        # the (C // cpb, rt * cpb, LANES) reshape pairs
                        # consecutive cells' stream blocks into one kernel
                        # block (contiguous, so each row group IS its cell's
                        # single-cell seed block — bitwise parity)
                        return rng_ops.seed_fast_device(
                            idx, self.cfg.seed).reshape(
                                C // cpb, rt * cpb, trace_pallas.LANES)

                    self._rng_fn[(C, slots, cpb)] = _seeds
                rng_in = self._rng_fn[(C, slots, cpb)](
                    jnp.uint32(int(cell_ids[0])),
                    jnp.uint32(iteration * total_cells))
            else:
                # non-contiguous chunk: hash each cid directly
                idx = (jnp.uint32(iteration * total_cells)
                       + jnp.asarray(cell_ids.astype(np.uint32))[:, None]
                       ) * jnp.uint32(slots) + jnp.arange(
                           slots, dtype=jnp.uint32)[None, :]
                rng_in = rng_ops.seed_fast_device(
                    idx, self.cfg.seed).reshape(
                        C // cpb, rt * cpb, trace_pallas.LANES)
        else:
            from ..ops import rng as rng_ops

            idx = ((np.uint64(iteration) * np.uint64(total_cells)
                    + cell_ids.astype(np.uint64)[:, None])
                   * np.uint64(slots)
                   + np.arange(slots, dtype=np.uint64)[None, :])
            rng_in = jnp.asarray(
                rng_ops.seed_fast(idx, self.cfg.seed)
                .reshape(C // cpb, rt * cpb, trace_pallas.LANES))
        return rays_in, rng_in

    def _trace_batch_tiles(self, batch: dict, cell_ids: np.ndarray,
                           rays_per_cell: int):
        """Persistent-engine batch trace; returns *device* per-cell histogram
        tiles (C, ny, 128) so the caller can defer host pulls (batches pipeline
        asynchronously; a full-histogram device round trip per batch dominated
        early bench runs)."""
        slots, gens = self._slots_gens(rays_per_cell)
        rt = slots // trace_pallas.LANES
        rays_in, rng_in = trace_pallas.pack_ray_blocks(
            batch, len(cell_ids), slots, rt
        )
        nominal = self._pers_nominal(slots, gens, rays_per_cell)
        kw = ({"cell_params_packed": self._cpk[cell_ids]}
              if self._cpk is not None else {})
        tiles, nb = self._pers_fn(rt)(
            self._cp[cell_ids], self._gr, rays_in, rng_in,
            self._pers_ctrl(gens, rays_per_cell), **kw,
        )
        tiles = self._renorm_tiles(tiles, nb, nominal)
        return tiles, nb, nominal * len(cell_ids)

    def _pers_fn(self, rt: int, cpb: int = 1):
        # gens/spawn_iters are runtime scalars; one compile per (RT, cpb)
        # serves all.  ``rt`` is the per-cell row count; with cpb > 1 the
        # kernel block stacks cpb cells as row groups (RT_kernel = rt * cpb).
        if (rt, cpb) not in self._pers_cache:
            fn = trace_pallas_persistent.make_persistent_trace_fn(
                self.cfg, self.tgeom.num_fc, self.tgeom.num_oc, rt * cpb,
                gens=1, interpret=self._interpret,
                cond_interval=self._cond_interval,
                phase_gating=self._pers_phase_gating,
                max_iters=self.cfg.max_bounces,
                edge_counts=(len(self.tgeom.hull_hp), len(self.tgeom.r1_hp),
                             len(self.tgeom.r2_hp)),
                accum_mode=self._pers_accum_mode,
                flush_w=int(os.environ.get(
                    "PERS_FLUSH_W", trace_pallas_persistent._FLUSH_W)),
                count_spawn=(self._spawn_mode == "count"),
                cells_per_block=cpb,
                transit_jump=self._pers_transit_jump,
                jump_phase=self._pers_jump_phase,
            )
            if self._mesh is not None:
                from ..parallel.shard import make_sharded_cell_trace_fn

                fn = make_sharded_cell_trace_fn(
                    fn, self._mesh, axis=self._mesh.axis_names[0],
                    packed=(self._pers_accum_mode == "packed"))
            self._pers_cache[(rt, cpb)] = fn
        return self._pers_cache[(rt, cpb)]

    def _pers_ctrl(self, gens: int, rays_per_cell: Optional[int] = None):
        import jax.numpy as jnp

        if self._spawn_mode == "count" and rays_per_cell is not None:
            # ctrl[0] is the per-cell spawn *target* for the count_spawn kernel
            return jnp.asarray([rays_per_cell, self._spawn_iters], jnp.int32)
        return jnp.asarray([gens, self._spawn_iters], jnp.int32)

    def _pers_nominal(self, slots: int, gens: int, rays_per_cell: int) -> int:
        """Nominal per-cell sample count the histogram is normalized to."""
        if self._spawn_mode == "count":
            return rays_per_cell
        return slots * gens

    def _assemble_hist_dev(self, tile_acc: dict, all_cells: np.ndarray):
        """Per-batch tile accumulators -> (L, N, M, ny, nx) device histogram.

        Concatenates cid-ordered tiles, reshapes (L, M, N, ...) and swaps to the
        reference (L, N, M, ...) layout.  Pure reads: ``tile_acc`` stays valid
        for further accumulation (checkpointing assembles mid-run)."""
        import jax.numpy as jnp

        ny, nx = self.cfg.eyebox_bins
        tile_sets = [tile_acc[b] for b in sorted(tile_acc)]
        all_tiles = jnp.concatenate(tile_sets, axis=0)[:, :, :nx]
        n_total = self.L * self.M * self.N
        if len(all_cells) != n_total:
            # cell subset (e.g. a wavelength selection): place each maximal
            # contiguous cid run into a zero grid with a device slice copy
            flat = jnp.zeros((n_total, ny, nx), all_tiles.dtype)
            breaks = np.where(np.diff(all_cells) != 1)[0] + 1
            pos = 0
            for run in np.split(all_cells, breaks):
                flat = jax.lax.dynamic_update_slice_in_dim(
                    flat, all_tiles[pos : pos + len(run)], int(run[0]), 0)
                pos += len(run)
            all_tiles = flat
        return jnp.transpose(
            all_tiles.reshape(self.L, self.M, self.N, ny, nx),
            (0, 2, 1, 3, 4),
        )

    def _tiles_from_hist(self, hist, all_cells: np.ndarray,
                         cells_per_batch: int) -> dict:
        """Inverse of :meth:`_assemble_hist_dev`: split a (L, N, M, ny, nx)
        histogram back into per-batch-position (C, ny, NY_PAD) tile
        accumulators (exact — permutation plus zero-padding of the unused
        x-bin columns, which the kernel never writes)."""
        import jax.numpy as jnp

        ny, nx = self.cfg.eyebox_bins
        pad = trace_pallas_persistent.NY_PAD
        flat = jnp.transpose(jnp.asarray(hist), (0, 2, 1, 3, 4)).reshape(
            self.L * self.M * self.N, ny, nx)
        flat = flat[jnp.asarray(all_cells)]
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad - nx)))
        return {
            b: flat[start : start + cells_per_batch]
            for b, start in enumerate(range(0, len(all_cells), cells_per_batch))
        }

    def _renorm_tiles(self, tiles, nb, nominal_per_cell: int):
        # saturating-spawn / count modes: scale per-cell tiles to
        # nominal-sample units (actual spawns overshoot the target slightly)
        if self._spawn_iters <= 0 and self._spawn_mode != "count":
            return tiles
        import jax.numpy as jnp

        factor = nominal_per_cell / jnp.maximum(nb[:, 2], 1).astype(jnp.float32)
        return tiles * factor[:, None, None]

    def run(
        self,
        rays_per_fov: Optional[int] = None,
        num_iter: Optional[int] = None,
        cells_per_batch: int = 2048,
        evaluate_metrics: bool = True,
        eval_cfg: EvalConfig = EvalConfig(),
        verbose: bool = False,
        wavelengths: Optional[tuple] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 1,
        histogram_device: bool = False,
        error_groups: bool = False,
        metrics_device: bool = False,
        dense_metrics: bool = False,
    ) -> SimulationResult:
        """Trace the full workload and reduce metrics.

        ``metrics_device``: with a device histogram, run the whole metric
        colorimetry on device in ONE jit (f32) and pull only scalars + the
        (epy, epx) luminance grid — saves the host colorimetry pass
        (~0.3-0.6 s on a 1-core host).  The result's ``output_image`` is None
        in this mode (use the default host path when exporting eye-view
        PNGs); metric values agree with the host path to ~1e-4 relative.

        ``error_groups``: estimate per-metric Monte-Carlo standard errors by a
        delete-one jackknife over the ``num_iter`` independent sample groups
        (persistent fast path; needs ``num_iter >= 2``, so iteration folding
        is suspended for the run).  Costs one extra device perception
        reduction (~2 MB) per iteration; the result's ``metric_stderr`` maps
        eff_R/G/B, delta_e, u_fov, u_eyebox to their standard errors at this
        run's total sampling.

        ``dense_metrics``: additionally evaluate the metrics over EVERY valid
        eye position (stride-1 pupil convolution — the reference's
        commented-out dense scan, AR_system_evaluation_functions.py:77-89,
        which it replaced with the 7x8 sampled grid as too slow; one XLA conv
        + chunked device colorimetry here).  The result's ``dense`` field
        carries the dense EvalResult incl. the full-resolution eyebox
        luminance map (51x91 at reference resolution vs the sampler's 7x8).

        ``wavelengths``: optional subset of wavelength indices to trace (e.g.
        ``(1,)`` for a green-only run); other cells receive no rays.
        ``checkpoint_path``: resumable additive-histogram checkpointing every
        ``checkpoint_every`` iterations (see utils/checkpoint.py).
        ``histogram_device``: keep the assembled histogram on device (persistent
        engine only); the device->host link of a relay-attached TPU makes the
        ~1 GB histogram pull the dominant cost otherwise.  Efficiencies are
        computed from per-cell sums either way; ``evaluate_metrics`` forces a
        host pull.
        """
        rpf = rays_per_fov if rays_per_fov is not None else self.cfg.rays_per_fov
        iters = num_iter if num_iter is not None else self.cfg.num_iter
        if self.engine == "splitting" and self._split_percell:
            # bound device memory: chunk slots (cells x capacity) to ~2M
            # (x ~11 SoA leaves x 4 B x 2 for the children concat ~ 190 MB);
            # SPLIT_SLOT_BUDGET overrides for probing
            budget = int(os.environ.get("SPLIT_SLOT_BUDGET", 1 << 21))
            cells_per_batch = max(
                1, min(cells_per_batch, budget // self._split_capacity))
        if error_groups:
            if self.engine != "pallas_persistent" or iters < 2:
                raise ValueError(
                    "error_groups needs the persistent engine and "
                    "num_iter >= 2 (the iterations are the jackknife groups)")
        if (not error_groups and self._fold_iterations and iters > 1
                and self.engine == "pallas_persistent"):
            # fold the relaunch loop into kernel generations: one dispatch
            # traces num_iter x rays_per_fov samples per cell (continued
            # per-slot RNG streams — the reference's own num_iter semantics),
            # paying the per-cell drain tail once instead of num_iter times.
            # Downstream normalization uses the actual rays-per-cell x iters
            # product, which is invariant under the fold.
            rpf, iters = rpf * iters, 1
        all_cells = np.arange(self.L * self.M * self.N)
        if wavelengths is not None:
            lsel = np.asarray(all_cells // (self.M * self.N))
            all_cells = all_cells[np.isin(lsel, np.asarray(wavelengths))]

        hist_acc = None
        total_bounces = 0
        total_rays = 0
        total_spawned = 0
        start_iter = 0
        if checkpoint_path:
            from ..utils.checkpoint import load_checkpoint, save_checkpoint

            resumed = load_checkpoint(checkpoint_path, self.design, self.cfg,
                                      with_extras=True)
            if resumed is not None:
                h0, start_iter, total_bounces, ck_extras = resumed
                hist_acc = jax.numpy.asarray(h0)
                total_rays = ck_extras.get("total_rays", 0)
                total_spawned = ck_extras.get("total_spawned", 0)
        t0 = time.perf_counter()
        if self.engine == "pallas_persistent":
            # async fast path: dispatch every batch; tiles stay on device.
            # Tiles are summed into one accumulator per batch position *inside*
            # the dispatch loop (the adds stay async), so device memory holds
            # one iteration's worth of tiles regardless of num_iter instead of
            # every iteration's full tile set.  Checkpoints assemble the device
            # histogram and pull it once per ``checkpoint_every`` iterations;
            # resume splits the saved histogram back into tile accumulators, so
            # an interrupted run is bitwise-identical to an uninterrupted one
            # (pure permutation + zero-padding round trip).
            import jax.numpy as jnp

            ny, nx = self.cfg.eyebox_bins
            tile_acc = {}   # batch position -> device tile accumulator
            nb_pending = []  # (nb, n) per dispatched batch, pulled after dispatch
            _err_snaps = []  # error_groups: per-iteration perception snapshots
            if error_groups and start_iter:
                raise ValueError("error_groups does not compose with "
                                 "checkpoint resume (groups would be lost)")
            if hist_acc is not None:
                tile_acc = self._tiles_from_hist(hist_acc, all_cells,
                                                 cells_per_batch)

            def _drain_nb_stats():
                nonlocal total_bounces, total_rays, total_spawned
                for nb, n in nb_pending:
                    nbh = np.asarray(nb)
                    total_bounces += int(nbh[:, 0].sum())
                    total_spawned += (int(nbh[:, 2].sum())
                                      if nbh.shape[1] > 2 else n)
                    total_rays += n
                    if nbh.shape[1] > 3 and int(nbh[:, 3].sum()):
                        raise RuntimeError(
                            f"{int(nbh[:, 3].sum())} deposit codes overflowed "
                            "the kernel's staging slots (nb[:, 3] != 0) — the "
                            "histogram undercounts; lower flush_w")
                nb_pending.clear()

            for it in range(start_iter, iters):
                for b, start in enumerate(
                        range(0, len(all_cells), cells_per_batch)):
                    chunk = all_cells[start : start + cells_per_batch]
                    slots, gens = self._slots_gens(rpf)
                    if self.cfg.shared_pupil_samples and self.cfg.rng_mode == "fast":
                        # cells-per-block row packing applies only when the
                        # chunk splits evenly into blocks
                        cpb = (self._pers_cpb
                               if len(chunk) % self._pers_cpb == 0 else 1)
                        rays_in, rng_in = self._device_ray_blocks(
                            chunk, slots, it, cpb=cpb)
                        rt = slots // trace_pallas.LANES
                        c0 = int(chunk[0])
                        kw = {}
                        if np.array_equal(chunk, np.arange(c0, c0 + len(chunk))):
                            cp_sel = jax.lax.dynamic_slice_in_dim(
                                self._cp_dev, c0, len(chunk))
                            if self._cpk_dev is not None:
                                kw["cell_params_packed"] = (
                                    jax.lax.dynamic_slice_in_dim(
                                        self._cpk_dev, c0, len(chunk)))
                        else:
                            cp_sel = self._cp_dev[jnp.asarray(chunk)]
                            if self._cpk_dev is not None:
                                kw["cell_params_packed"] = (
                                    self._cpk_dev[jnp.asarray(chunk)])
                        nominal = self._pers_nominal(slots, gens, rpf)
                        tiles, nb = self._pers_fn(rt, cpb)(
                            cp_sel, self._gr, rays_in, rng_in,
                            self._pers_ctrl(gens, rpf), **kw,
                        )
                        tiles = self._renorm_tiles(tiles, nb, nominal)
                        n = nominal * len(chunk)
                    else:
                        batch = seeding.build_ray_batch(
                            self.geom, self.cfg, cell_ids=chunk,
                            rays_per_cell=slots, iteration=it,
                        )
                        tiles, nb, n = self._trace_batch_tiles(batch, chunk, rpf)
                    tile_acc[b] = tiles if b not in tile_acc else tile_acc[b] + tiles
                    nb_pending.append((nb, n))
                if error_groups:
                    # cumulative per-iteration perception snapshot (device
                    # reduction, ~2 MB); consecutive differences are the
                    # independent jackknife groups
                    from ..eval.metrics import eye_perceived_jnp

                    snap = self._assemble_hist_dev(tile_acc, all_cells)
                    _err_snaps.append((
                        eye_perceived_jnp(snap, eval_cfg),
                        jax.numpy.sum(snap, axis=(1, 2, 3, 4)),
                    ))
                if checkpoint_path and (it + 1) % checkpoint_every == 0:
                    _drain_nb_stats()
                    ck_hist = np.asarray(
                        self._assemble_hist_dev(tile_acc, all_cells))
                    save_checkpoint(
                        checkpoint_path, ck_hist, it + 1, self.design,
                        self.cfg, total_bounces,
                        extras={"total_rays": total_rays,
                                "total_spawned": total_spawned},
                    )
            t_dispatch = time.perf_counter() - t0

            hist_dev = self._assemble_hist_dev(tile_acc, all_cells)
            _drain_nb_stats()
            if histogram_device:
                # metrics, efficiencies, and heatmaps all reduce on device;
                # pulling the ~0.9 GB histogram over a relay link dominates
                # the whole run otherwise
                histogram = jax.block_until_ready(hist_dev)
            else:
                histogram = np.asarray(hist_dev)
            if verbose:
                print(f"dispatch {t_dispatch:.2f}s, "
                      f"assemble {time.perf_counter() - t0 - t_dispatch:.2f}s")
        else:
            for it in range(start_iter, iters):
                for start in range(0, len(all_cells), cells_per_batch):
                    chunk = all_cells[start : start + cells_per_batch]
                    hist, bounces, n = self.trace_batch(chunk, rpf, it)
                    hist_acc = hist if hist_acc is None else hist_acc + hist
                    total_bounces += int(bounces)
                    total_rays += n
                    if verbose:
                        print(
                            f"iter {it} cells {start}-{start + len(chunk)}: "
                            f"{int(bounces):,} bounces"
                        )
                if checkpoint_path and (it + 1) % checkpoint_every == 0:
                    from ..utils.checkpoint import save_checkpoint

                    # extras mirror the persistent path: without total_rays a
                    # resumed run would normalize the full restored histogram
                    # by only the post-resume ray count (inflated metrics)
                    save_checkpoint(
                        checkpoint_path, np.asarray(hist_acc), it + 1,
                        self.design, self.cfg, total_bounces,
                        extras={"total_rays": total_rays},
                    )
            histogram = np.asarray(jax.block_until_ready(hist_acc))
        trace_seconds = time.perf_counter() - t0

        # the persistent engine rounds per-cell sample counts up to slot multiples;
        # normalize by the samples actually traced, not the requested count
        cells_traced = len(all_cells) * iters
        actual_rpf = total_rays / max(cells_traced, 1) if cells_traced else rpf
        if isinstance(histogram, np.ndarray):
            eff = efficiencies(histogram, actual_rpf, iters)
        else:
            # device histogram: reduce per-color sums on device (cheap pulls)
            import jax.numpy as jnp

            from ..eval.metrics import wavelength_channel_names

            sums = np.asarray(jnp.sum(histogram, axis=(1, 2, 3, 4)))
            num = actual_rpf * self.M * self.N * self.L * iters
            names = wavelength_channel_names(self.L)
            eff = {names[i]: float(sums[i] / num * self.L)
                   for i in range(self.L)}
        met = None
        if evaluate_metrics:
            if isinstance(histogram, np.ndarray):
                met = evaluate(histogram / actual_rpf / iters, eval_cfg)
            elif metrics_device:
                from ..eval.metrics import evaluate_jnp, eye_perceived_jnp

                met = evaluate_jnp(eye_perceived_jnp(histogram, eval_cfg),
                                   eval_cfg, norm=actual_rpf * iters)
            else:
                from ..eval.metrics import eye_perceived_jnp

                perc = np.asarray(eye_perceived_jnp(histogram, eval_cfg))
                met = evaluate(None, eval_cfg,
                               perceive=perc / actual_rpf / iters)
        dense = None
        if dense_metrics:
            import jax.numpy as jnp

            from ..eval.metrics import evaluate_dense

            hist_dev = (histogram if not isinstance(histogram, np.ndarray)
                        else jnp.asarray(histogram, jnp.float32))
            n_epy = histogram.shape[3] - eval_cfg.pupil_mask_bins + 1
            dense = evaluate_dense(
                hist_dev, eval_cfg, norm=actual_rpf * iters,
                chunk_rows=8 if n_epy > 16 else 0,
            )

        rays_traced = total_rays
        if (self.engine == "pallas_persistent"
                and (self._spawn_iters > 0 or self._spawn_mode == "count")):
            rays_traced = total_spawned

        stderr = None
        if self.engine == "pallas_persistent" and error_groups and _err_snaps:
            stderr = self._jackknife_stderr(_err_snaps, actual_rpf, iters,
                                            eval_cfg)
        return SimulationResult(
            histogram=histogram,
            efficiencies=eff,
            metrics=met,
            rays_traced=rays_traced,
            total_bounces=total_bounces,
            trace_seconds=trace_seconds,
            metric_stderr=stderr,
            dense=dense,
        )

    def _jackknife_stderr(self, snaps, actual_rpf, iters, eval_cfg):
        """Delete-one jackknife over the num_iter sample groups.

        ``snaps`` holds per-iteration *cumulative* (perception, per-color-sum)
        device pairs; consecutive differences are the K independent groups
        (distinct seeds per iteration).  For each leave-one-out replicate the
        remaining groups' perception stack re-normalizes to per-ray units and
        the full metric set re-evaluates; SE = sqrt((K-1)/K * sum (m_i -
        mean)^2) — the standard jackknife estimator, exact for the linear
        efficiencies and first-order for delta_e / uniformities.  Ref: the
        metrics are defined at AR_system_evaluation_functions.py:149-160."""
        from ..eval.metrics import evaluate as _evaluate
        from ..eval.metrics import wavelength_channel_names

        K = len(snaps)
        perc = [np.asarray(p) for p, _ in snaps]
        sums = [np.asarray(s) for _, s in snaps]
        P_tot, S_tot = perc[-1], sums[-1]
        groups_p = [perc[0]] + [perc[i] - perc[i - 1] for i in range(1, K)]
        groups_s = [sums[0]] + [sums[i] - sums[i - 1] for i in range(1, K)]
        names = wavelength_channel_names(self.L)
        reps = {k: [] for k in
                [f"eff_{n}" for n in names] + ["delta_e", "u_fov", "u_eyebox"]}
        num = actual_rpf * self.M * self.N * self.L * (iters - 1)
        for i in range(K):
            m = _evaluate(None, eval_cfg,
                          perceive=(P_tot - groups_p[i])
                          / actual_rpf / (iters - 1),
                          with_image=False)  # jackknife reads scalars only
            s = (S_tot - groups_s[i]) / num * self.L
            for li, n in enumerate(names):
                reps[f"eff_{n}"].append(float(s[li]))
            reps["delta_e"].append(m.delta_e)
            reps["u_fov"].append(m.u_fov)
            reps["u_eyebox"].append(m.u_eyebox)
        out = {}
        for k, vals in reps.items():
            v = np.asarray(vals, np.float64)
            out[k] = float(np.sqrt((K - 1) / K * ((v - v.mean()) ** 2).sum()))
        return out


def format_report(result: SimulationResult) -> str:
    """Human-readable metric report mirroring the reference's printout
    (gpu_ray_tracing_pro_fullColor.py:205-210)."""
    lines = [
        f"Rays traced          : {result.rays_traced:,}",
        f"Total ray bounces    : {result.total_bounces:,}",
        f"Trace wall-clock     : {result.trace_seconds:.2f} s",
        f"Throughput           : {result.rays_per_second:,.0f} rays/s, "
        f"{result.bounces_per_second:,.0f} bounces/s",
    ]
    long_name = {"R": "Red", "G": "Green", "B": "Blue"}
    for key in ("R", "G", "B"):
        if key in result.efficiencies:
            lines.append(
                f"Efficiency ({long_name[key]:<5})   : "
                f"{result.efficiencies[key] * 100:8.3f} %")
    for key, val in result.efficiencies.items():
        if key not in ("R", "G", "B"):
            lines.append(f"Efficiency ({key})    : {val * 100:8.3f} %")
    if result.metrics is not None:
        lines += [
            f"Color dispersion     : {result.metrics.delta_e:8.2f}",
            f"FoV uniformity       : {result.metrics.u_fov * 100:8.2f} %",
            f"Eyebox uniformity    : {result.metrics.u_eyebox * 100:8.2f} %",
        ]
        if getattr(result.metrics, "starved_eye_positions", 0):
            n = result.metrics.starved_eye_positions
            lines.append(
                f"  [unconverged: {n} eye position(s) have empty (FoV, eye) "
                "bins at this sample budget; u_eyebox/u_fov are biased low — "
                "raise rays_per_fov or num_iter]")
    if result.dense is not None:
        d = result.dense
        n_epy, n_epx = d.eye_luminance.shape
        lines += [
            f"Dense scan ({n_epy}x{n_epx} = {n_epy * n_epx:,} eye positions):",
            f"  delta_e {d.delta_e:.3f}  u_fov {d.u_fov * 100:.2f} %  "
            f"u_eyebox {d.u_eyebox * 100:.2f} %  "
            f"starved {d.starved_eye_positions}",
        ]
    return "\n".join(lines)
