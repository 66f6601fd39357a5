"""Segmented Pallas scheduling: bounce budgets + per-cell compaction between.

The monolithic per-cell while_loop wastes VPU lanes on dead rays: the mean ray dies
after ~9 bounces but the loop runs to the cell's slowest ray (~100+ iterations), so
lane utilization decays to a few percent.  Segmenting fixes this:

1. run the kernel with a bounce budget (e.g. 24) in 'full' mode;
2. compact each cell's survivors to the front of its tile (a per-cell argsort on
   aliveness — pure XLA, batched over cells) and shrink the tile row count to the
   batch's max survivor count (rounded to a lane multiple);
3. re-enter the kernel in 'resume' mode with the smaller tile; repeat until drained.

Survivor tiles shrink geometrically, so late bounces run on dense small tiles
instead of mostly-dead big ones.  Results are bitwise identical to the monolithic
loop (per-ray RNG streams are carried exactly)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraceConfig
from . import trace_pallas


@jax.jit
def _scatter_deps(hist, dep, base):
    """Scatter one segment's deposits (C, K) into the flat device histogram."""
    has = dep >= 0
    flat = base[:, None] + jnp.maximum(dep, 0)
    return hist.at[flat.reshape(-1)].add(has.reshape(-1).astype(jnp.float32))


@jax.jit
def _compact(rays_out, st_out, rng_out, dep_out):
    """Per-cell stable partition: alive rays first.  Shapes (C, ..., RT, L)."""
    C = st_out.shape[0]
    flat_st = st_out.reshape(C, -1)
    order = jnp.argsort(jnp.where(flat_st < 6, 0, 1), axis=1, stable=True)
    rf = rays_out.reshape(C, 9, -1)
    rf = jnp.take_along_axis(rf, order[:, None, :], axis=2)
    st = jnp.take_along_axis(flat_st, order, axis=1)
    rg = jnp.take_along_axis(rng_out.reshape(C, -1), order, axis=1)
    dp = jnp.take_along_axis(dep_out.reshape(C, -1), order, axis=1)
    alive_counts = jnp.sum((flat_st < 6).astype(jnp.int32), axis=1)
    return rf, st, rg, dp, alive_counts


class SegmentedPallasTracer:
    """Caches per-(RT, mode) kernels and drives segment scheduling.

    All bulk data stays on device across segments (the relay-attached TPU makes
    host round trips very expensive); only the (C,) per-cell alive counts are
    pulled to pick the next tile size."""

    def __init__(self, cfg: TraceConfig, num_fc: int, num_oc: int,
                 segment_bounces: int = 24, interpret: bool = False,
                 hist_dims=None):
        self.cfg = cfg
        self.num_fc = num_fc
        self.num_oc = num_oc
        self.segment_bounces = segment_bounces
        self.interpret = interpret
        self._fns = {}
        self._hist_dims = hist_dims  # (L, M, N) when device histograms requested

    def _fn(self, rt: int, mode: str, bounces: int = 0):
        key = (rt, mode, bounces or self.segment_bounces)
        if key not in self._fns:
            import dataclasses

            seg_cfg = dataclasses.replace(self.cfg, max_bounces=key[2])
            self._fns[key] = trace_pallas.make_pallas_trace_fn(
                seg_cfg, self.num_fc, self.num_oc, rt,
                interpret=self.interpret, mode=mode,
            )
        return self._fns[key]

    def trace(self, cell_params, geom_row, rays_in, rng_in,
              hist_base=None) -> Tuple:
        """Returns (dep_list, total_bounces) with dep_list entries on device, or
        (histogram, total_bounces) when ``hist_base`` (C,) flat offsets is given
        (deposits are then scattered on-device each segment)."""
        C, _, rt, L = rays_in.shape
        total = 0
        deps = []
        hist = None
        if hist_base is not None:
            Ld, Md, Nd = self._hist_dims
            ny, nx = self.cfg.eyebox_bins
            hist = jnp.zeros(Ld * Nd * Md * ny * nx, jnp.float32)
            hist_base = jnp.asarray(hist_base, jnp.int32)
        budget = self.cfg.max_bounces
        # the final segment's kernel gets exactly the leftover budget, so the
        # total bounce cutoff equals cfg.max_bounces (bitwise identity with
        # the monolithic loop; at most one extra compiled variant)
        seg = min(self.segment_bounces, budget)
        out = self._fn(rt, "full", seg)(cell_params, geom_row, rays_in, rng_in)
        cur_rt = rt
        while True:
            dep, nb, rays_out, st_out, rng_out = out
            budget -= seg
            rf, st, rg, dp, alive = _compact(rays_out, st_out, rng_out, dep)
            if hist is not None:
                hist = _scatter_deps(hist, dp, hist_base)
            else:
                deps.append(dp)
            total += int(np.asarray(nb[:, 0]).sum())
            max_alive = int(np.asarray(alive).max())
            if max_alive == 0 or budget <= 0:
                break
            rt_next = max(1, -(-max_alive // trace_pallas.LANES))
            # keep row counts in a few buckets to bound kernel variants —
            # capped at the CURRENT tile rows: the initial rt need not be a
            # power of two (5000 rays/FoV -> rt=40), and rounding past it
            # would ask the slice below for more slots than exist
            rt_next = min(1 << (rt_next - 1).bit_length(), cur_rt)
            k = rt_next * trace_pallas.LANES
            rays_in2 = rf[:, :, :k].reshape(C, 9, rt_next, trace_pallas.LANES)
            st2 = st[:, :k].reshape(C, rt_next, trace_pallas.LANES)
            rg2 = rg[:, :k].reshape(C, rt_next, trace_pallas.LANES)
            seg = min(self.segment_bounces, budget)
            out = self._fn(rt_next, "resume", seg)(
                cell_params, geom_row, rays_in2, st2, rg2)
            cur_rt = rt_next
        if hist is not None:
            ny, nx = self.cfg.eyebox_bins
            Ld, Md, Nd = self._hist_dims
            return hist.reshape(Ld, Nd, Md, ny, nx), total
        return deps, total


def deps_to_histogram(deps, cell_ids, L, M, N, ny, nx):
    """Merge per-segment deposit arrays into the (L, N, M, ny, nx) histogram.

    Host-side bincount: deposit arrays already live on the host (the segment
    scheduler reads them for compaction decisions), and numpy bincount beats a
    device scatter round-trip at these densities (deposits are ~2% of slots)."""
    cid = np.asarray(cell_ids, np.int64)
    l = cid // (M * N)
    mn = cid % (M * N)
    m = mn // N
    n = mn % N
    base = (((l * N + n) * M + m) * (ny * nx))[:, None]
    size = L * N * M * ny * nx
    hist = np.zeros(size, np.float32)
    for dp in deps:
        d = np.asarray(dp).astype(np.int64)
        mask = d >= 0
        flat = (base + d)[mask]
        if len(flat):
            hist += np.bincount(flat, minlength=size).astype(np.float32)
    return hist.reshape(L, N, M, ny, nx)
