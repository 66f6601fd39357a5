"""Deterministic-splitting (wavefront) tracer: all branches, weighted, no RNG.

The reference ships an alternative tracer (``process_rays_kernel``,
/root/reference/GPU_ray_tracing_functions.py:193-417) in which rays *split* at each
folding-coupler hit — the transmitted branch updates in place, the diffracted branch
is appended through an atomic work-queue counter, and the host re-launches + compacts
until the queue drains.  (It is unreachable from the reference's drivers; the MC
kernels superseded it.)

This module rebuilds that capability TPU-first for the *current* full-color physics:
instead of Russian-roulette sampling one outcome per interaction, every interaction
follows **all** branches with weights multiplied by the branch efficiencies, and the
out-couple branch deposits its weighted energy directly.  The result is the exact
expectation of the Monte-Carlo tracer — a zero-variance eyebox map, ideal for
validating MC convergence and for fast design iteration.

Two TPU mappings share one physics implementation (``_build_step_fns``):

1. :func:`make_splitting_trace_fn` — one global fixed-capacity SoA wavefront buffer
   stepped by ``lax.while_loop``; children re-compact every step with an argsort on
   aliveness (the atomic work queue becomes a prefix-sum compaction) and overflowing
   children drop lowest-weight-first into ``truncated_weight``.  Supports the
   differentiable options (``table_arg`` / ``fixed_steps`` / ``soft_binning``) used
   by :mod:`..opt.grating_opt`.

2. :func:`make_splitting_cells_fn` — the production-scale engine (VERDICT r3 #1):
   **one wavefront buffer per (λ, FoV) cell**, vmapped over a cell-chunk axis.  A
   single cell's branch tree is small, so a few-thousand-slot per-cell buffer never
   overflows at realistic thresholds where a shared buffer prunes real energy; the
   per-cell tables pre-gather once per chunk (the per-slot random cid gathers of the
   global engine become broadcast reads), the histogram is a per-cell (ny, nx) tile
   instead of a scatter into the full 288 MB map, and compaction is an O(K)
   cumsum + scatter instead of an argsort.  This is what lets the full reference
   grid (100 x 75 x 3 = 22,500 cells) evaluate exactly in bounded memory.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraceConfig
from ..luts.packing import CellTables, DIR_IC, DIR_FC, DIR_IC2, DIR_OC
from .trace_geometry import TraceGeometry
from . import trace_jnp

DEAD = trace_jnp.DEAD

# SoA keys carried through the wavefront loop (cid excluded for the per-cell
# engine, where it is identically zero)
_KEYS = ("x", "y", "ter", "tei", "tmr", "tmi", "cos_th", "gap_x", "gap_y",
         "state", "w", "cid")

# position of the cell axis in each (post-_as_jnp) table leaf; used by the
# per-cell engine to pre-gather chunk tables with a leading cell axis while
# keeping a singleton axis where the shared physics code indexes by cid
_TABLE_CELL_AXIS = {
    "init_jones": 1, "init_scale": 1, "init_cos0": 0,
    "ic_jones": 2, "ic_scale": 1,
    "fc_jones": 3, "fc_scale": 2,
    "oc_jones": 3, "oc_scale": 2, "oc_scale_out": 0,
    "gaps": 0, "tir_phasor": 0, "hop2_phasor": 0,
}


@dataclasses.dataclass
class SplitResult:
    histogram: np.ndarray       # (L, N, M, ny, nx) weighted eyebox deposits
    out_coupled: float          # total deposited weight (inside eyebox quads)
    truncated: float            # weight lost to buffer overflow (should be ~0)
    pruned: float               # weight killed by the threshold (downward bias bound)
    steps: int
    peak_live: int = 0          # max concurrent live wavefront width observed


def _dir_sel(d, tab):
    """Exact 4-way row select on a per-direction constant table.

    Replaces the per-slot ``tab[cid, d]`` gathers of the dir-indexed tables
    (gaps / tir_phasor / hop2_phasor): XLA lowers those element-serialized on
    TPU; three vector selects are effectively free and bitwise-identical.
    ``tab`` is (4,) or (4, W); ``d`` is a (K,) int vector of DIR_* values."""
    if tab.ndim == 1:
        r = jnp.broadcast_to(tab[3], d.shape)
        for i in (2, 1, 0):
            r = jnp.where(d == i, tab[i], r)
    else:
        dm = d[:, None]
        r = jnp.broadcast_to(tab[3], d.shape + tab.shape[1:])
        for i in (2, 1, 0):
            r = jnp.where(dm == i, tab[i], r)
    return r


# unified site-record layout (fast path): [j_a(8), j_b(8), j_c(8), s_a, s_b]
_REC_W = 26


def _site_records_chunk(Tc, num_fc: int, num_oc: int):
    """(C, R2, 26) unified site-parameter records from pre-gathered chunk
    tables (leading cell axis, singleton cid axis — the
    :func:`_gather_cell_tables` layout).

    One record per exclusive interaction site x state bit, row key
    ``site_row * 2 + bit`` with site rows ordered [IC, FC strip 0..S_fc-1,
    OC strip 0..S_oc-1] — the same exclusive-site decomposition the
    persistent MC kernel's one-hot selection uses
    (trace_pallas_persistent.py site rows).  ``j_c`` (the OC out-couple
    branch) is stored zero on IC/FC rows, so the selected eff_c is exactly 0
    there — matching the gather path, which only ever *uses* eff_c on OC
    hits."""
    C = Tc["ic_scale"].shape[0]

    def j8(j):  # (..., 2, 2, 2) split-real Jones -> (..., 8)
        return j.reshape(j.shape[:-3] + (8,))

    def bcast(s, like):  # (C, S) scale -> (C, S, 2bit, 1)
        return jnp.broadcast_to(s[:, :, None, None], like.shape[:3] + (1,))

    ic_ja = j8(Tc["ic_jones"][:, 0, :, 0])[:, None]    # (C, 1, 2, 8)
    ic_jb = j8(Tc["ic_jones"][:, 1, :, 0])[:, None]
    ic_sa = bcast(Tc["ic_scale"][:, 0:1, 0], ic_ja)
    ic_sb = bcast(Tc["ic_scale"][:, 1:2, 0], ic_ja)
    ic_rows = jnp.concatenate(
        [ic_ja, ic_jb, jnp.zeros_like(ic_ja), ic_sa, ic_sb], -1)

    fc_ja = j8(Tc["fc_jones"][:, 0, :, :, 0])          # (C, S_fc, 2, 8)
    fc_jb = j8(Tc["fc_jones"][:, 1, :, :, 0])
    fc_rows = jnp.concatenate(
        [fc_ja, fc_jb, jnp.zeros_like(fc_ja),
         bcast(Tc["fc_scale"][:, 0, :, 0], fc_ja),
         bcast(Tc["fc_scale"][:, 1, :, 0], fc_ja)], -1)

    oc_ja = j8(Tc["oc_jones"][:, 0, :, :, 0])          # (C, S_oc, 2, 8)
    oc_jb = j8(Tc["oc_jones"][:, 1, :, :, 0])
    oc_jc = j8(Tc["oc_jones"][:, 2, :, :, 0])
    oc_rows = jnp.concatenate(
        [oc_ja, oc_jb, oc_jc,
         bcast(Tc["oc_scale"][:, 0, :, 0], oc_ja),
         bcast(Tc["oc_scale"][:, 1, :, 0], oc_ja)], -1)

    rows = jnp.concatenate([ic_rows, fc_rows, oc_rows], axis=1)
    return rows.reshape(C, 2 * (1 + num_fc + num_oc), _REC_W)


def _build_step_fns(cfg: TraceConfig, *, n_cells_mn: int, L: int, M: int,
                    N: int, num_fc: int, num_oc: int,
                    weight_threshold: float, soft_binning: bool = False,
                    fast: bool = False):
    """The shared branch-transport physics, parameterized over (T, G) args.

    Semantics mirror the verified MC step (trace_jnp.bounce_step /
    the reference full-color kernel GPU_ray_tracing_functions.py:833-1247)
    with roulette selection replaced by weighted all-branch children; see the
    module docstring.  ``n_cells_mn``/``L``/``M``/``N`` set the histogram
    indexing space: the global engine passes the real grid, the per-cell
    engine passes 1/1/1/1 so deposits index a per-cell (ny*nx,) tile.
    """
    ny, nx = cfg.eyebox_bins
    use_circle_ic = cfg.ic_test == "circle"

    def in_ic(G, x, y):
        if use_circle_ic:
            dx = x - G["ic_center"][0]
            dy = y - G["ic_center"][1]
            return dx * dx + dy * dy <= G["ic_radius"] * G["ic_radius"]
        return trace_jnp._hp_inside(G["ic_hp"], x, y)

    def hist_index(G, cid, x, y):
        """Flat histogram index for a deposit at (x, y) of cell cid, or -1."""
        mn = jnp.remainder(cid, n_cells_mn)
        er = G["eyebox_range"][mn]
        tol = trace_jnp._EDGE_TOL
        in_quad = ((x >= er[:, 0] - tol) & (x <= er[:, 1] + tol)
                   & (y >= er[:, 2] - tol) & (y <= er[:, 3] + tol))
        dxb = (er[:, 1] - er[:, 0]) / nx
        dyb = (er[:, 3] - er[:, 2]) / ny
        ix = jnp.clip(jnp.floor((x - er[:, 0]) / dxb).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip(jnp.floor((y - er[:, 2]) / dyb).astype(jnp.int32), 0, ny - 1)
        l = cid // n_cells_mn
        m = mn // N
        n = mn % N
        flat = ((l * N + n) * M + m) * (ny * nx) + iy * nx + ix
        return jnp.where(in_quad, flat, -1)

    def deposit(G, hist, cid, x, y, w):
        """Accumulate deposit weights into the flat histogram.

        Hard mode: nearest bin.  Soft mode: bilinear (cloud-in-cell) splat
        over the four surrounding bin centers — continuous (and hence
        differentiable) in (x, y).  Fast mode (per-cell engine): the
        scatter-add becomes an exact-0/1 one-hot row x weighted one-hot
        column matmul onto the (ny, nx) tile — the MXU histogram pattern of
        the persistent kernel — removing the last per-slot scatter from the
        step (bin values equal the scatter path up to f32 summation
        order)."""
        if fast and not soft_binning:
            er = G["eyebox_range"][0]
            tol = trace_jnp._EDGE_TOL
            in_quad = ((x >= er[0] - tol) & (x <= er[1] + tol)
                       & (y >= er[2] - tol) & (y <= er[3] + tol))
            dxb = (er[1] - er[0]) / nx
            dyb = (er[3] - er[2]) / ny
            ix = jnp.clip(jnp.floor((x - er[0]) / dxb).astype(jnp.int32),
                          0, nx - 1)
            iy = jnp.clip(jnp.floor((y - er[2]) / dyb).astype(jnp.int32),
                          0, ny - 1)
            wv = jnp.where(in_quad, w, 0.0)
            oy = ((jnp.arange(ny, dtype=jnp.int32)[:, None] == iy[None, :])
                  .astype(jnp.float32) * wv[None, :])
            ox = (ix[:, None] == jnp.arange(nx, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            tile = jax.lax.dot_general(
                oy, ox, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            return hist + tile.reshape(-1)
        if not soft_binning:
            idx = hist_index(G, cid, x, y)
            return hist.at[jnp.maximum(idx, 0)].add(
                jnp.where(idx >= 0, w, 0.0))
        mn = jnp.remainder(cid, n_cells_mn)
        er = G["eyebox_range"][mn]
        tol = trace_jnp._EDGE_TOL
        in_quad = ((x >= er[:, 0] - tol) & (x <= er[:, 1] + tol)
                   & (y >= er[:, 2] - tol) & (y <= er[:, 3] + tol))
        w = jnp.where(in_quad, w, 0.0)
        dxb = (er[:, 1] - er[:, 0]) / nx
        dyb = (er[:, 3] - er[:, 2]) / ny
        # bin-center coordinates; clamp keeps all mass inside the map (the
        # border clamp's zero gradient only affects the outermost half-bin)
        u = jnp.clip((x - er[:, 0]) / dxb - 0.5, 0.0, nx - 1.0)
        v = jnp.clip((y - er[:, 2]) / dyb - 0.5, 0.0, ny - 1.0)
        ix0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nx - 2)
        iy0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, ny - 2)
        fx = u - ix0
        fy = v - iy0
        l = cid // n_cells_mn
        m = mn // N
        n = mn % N
        base = ((l * N + n) * M + m) * (ny * nx)
        for di, dj, wf in ((0, 0, (1 - fx) * (1 - fy)),
                           (1, 0, fx * (1 - fy)),
                           (0, 1, (1 - fx) * fy),
                           (1, 1, fx * fy)):
            idx = base + (iy0 + dj) * nx + (ix0 + di)
            hist = hist.at[idx].add(w * wf)
        return hist

    def split_init(T, G, rays):
        """First IC interaction: both orders become children with weights."""
        cid = rays["cid"]
        pol = (rays["ter"], rays["tei"], rays["tmr"], rays["tmi"])
        w = rays["w"]
        outs = []
        pruned = jnp.float32(0.0)
        for branch, dir_ in ((0, DIR_IC), (1, DIR_IC2)):
            j = T["init_jones"][branch][cid]
            p = trace_jnp._jones_apply(j, *pol)
            eff = (trace_jnp._power(*p) * T["init_scale"][branch][cid]
                   / T["init_cos0"][cid])
            # clamp via where (not maximum): keeps reverse-mode gradients
            # finite on zero-power dead branches (the where-NaN trap)
            pw_p = trace_jnp._power(*p)
            inv = jax.lax.rsqrt(jnp.where(pw_p > 1e-30, pw_p, 1.0))
            ph = T["tir_phasor"][cid, dir_]
            ter, tei = p[0] * inv, p[1] * inv
            tmr, tmi = trace_jnp._phase_mul(ph, p[2] * inv, p[3] * inv)
            gx = T["gaps"][cid, dir_, 0]
            gy = T["gaps"][cid, dir_, 1]
            x = rays["x"] + gx
            y = rays["y"] + gy
            icin = in_ic(G, x, y)
            if branch == 0:
                state = jnp.where(icin, 0, 2)
            else:
                state = jnp.where(icin, 1, DEAD)
            wgt = w * eff
            # tally threshold kills (geometric deaths above are reference
            # transport, not pruning) so SplitResult.pruned bounds the
            # downward bias from the FIRST interaction onward, matching
            # split_step's accounting
            killed = (state < DEAD) & ~(wgt > weight_threshold)
            pruned = pruned + jnp.sum(jnp.where(killed, wgt, 0.0))
            state = jnp.where(wgt > weight_threshold, state, DEAD)
            outs.append(dict(
                x=x, y=y, ter=ter, tei=tei, tmr=tmr, tmi=tmi,
                cos_th=T["ic_scale"][branch][cid], gap_x=gx, gap_y=gy,
                state=state.astype(jnp.int32), w=wgt, cid=cid,
            ))
        return outs, pruned

    def split_step(T, G, buf):
        """One wavefront bounce: each slot -> (childA, childB, deposit)."""
        x, y = buf["x"], buf["y"]
        state = buf["state"]
        cid = buf["cid"]
        w = buf["w"]
        alive = state < DEAD
        alive &= trace_jnp._hp_inside(G["r1_hp"], x, y)

        grp_ic = alive & (state <= 1)
        grp_fc = alive & ((state == 2) | (state == 3))
        grp_oc = alive & (state >= 4)
        bit = (state & 1).astype(jnp.int32)

        yrot = G["fc_rot"][0] * x + G["fc_rot"][1] * y
        in_hull = trace_jnp._hp_inside(G["hull_hp"], x, y)
        fc_strip = jnp.clip(
            jnp.floor((G["fc_top"] - yrot) / G["fc_width"]).astype(jnp.int32),
            0, num_fc - 1)
        b = G["oc_bounds"]
        tol = trace_jnp._EDGE_TOL
        in_rect = ((x >= b[0] - tol) & (x <= b[1] + tol)
                   & (y >= b[2] - tol) & (y <= b[3] + tol))
        yr = G["oc_rot_y"][0] * x + G["oc_rot_y"][1] * y
        oc_strip = jnp.clip(
            jnp.floor((G["oc_top"] - yr) / G["oc_width"]).astype(jnp.int32),
            0, num_oc - 1)
        hit_fc = grp_fc & in_hull
        hit_oc = grp_oc & in_rect
        interact = grp_ic | hit_fc | hit_oc

        pol = (buf["ter"], buf["tei"], buf["tmr"], buf["tmi"])

        if fast:
            # unified one-hot site selection on the MXU (VERDICT r4 #3): each
            # slot's site is exclusive, so one (K, R2) exact-0/1 one-hot
            # matmul against the (R2, 26) records replaces the six
            # strip/bit-indexed gathers (element-serialized on TPU).  With
            # one-hot rows every partial product is exactly 0 or the
            # parameter value (HIGHEST precision: bf16x3 reconstructs the
            # f32 mantissa exactly), so selected values match the gathers.
            R2 = 2 * (1 + num_fc + num_oc)
            key = (jnp.where(grp_oc, 1 + num_fc + oc_strip,
                             jnp.where(grp_fc, 1 + fc_strip, 0))
                   .astype(jnp.int32) * 2 + bit)
            onehot = (key[:, None] == jnp.arange(R2, dtype=jnp.int32)[None, :]
                      ).astype(jnp.float32)
            rec = jax.lax.dot_general(
                onehot, T["site_records"], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            Kn = rec.shape[0]
            j_a = rec[:, 0:8].reshape(Kn, 2, 2, 2)
            j_b = rec[:, 8:16].reshape(Kn, 2, 2, 2)
            j_oc_c = rec[:, 16:24].reshape(Kn, 2, 2, 2)
            s_a = rec[:, 24]
            s_b = rec[:, 25]
        else:
            def site(jtab, stab, strip=None):
                if strip is None:
                    return jtab[bit, cid], stab[cid]
                return jtab[strip, bit, cid], stab[strip, cid]

            j_ic_a, s_ic_a = site(T["ic_jones"][0], T["ic_scale"][0])
            j_ic_b, s_ic_b = site(T["ic_jones"][1], T["ic_scale"][1])
            j_fc_a, s_fc_a = site(T["fc_jones"][0], T["fc_scale"][0], fc_strip)
            j_fc_b, s_fc_b = site(T["fc_jones"][1], T["fc_scale"][1], fc_strip)
            j_oc_a, s_oc_a = site(T["oc_jones"][0], T["oc_scale"][0], oc_strip)
            j_oc_b, s_oc_b = site(T["oc_jones"][1], T["oc_scale"][1], oc_strip)
            j_oc_c = T["oc_jones"][2][oc_strip, bit, cid]

            gfc = grp_fc[:, None, None, None]
            goc = grp_oc[:, None, None, None]
            j_a = jnp.where(goc, j_oc_a, jnp.where(gfc, j_fc_a, j_ic_a))
            j_b = jnp.where(goc, j_oc_b, jnp.where(gfc, j_fc_b, j_ic_b))
            s_a = jnp.where(grp_oc, s_oc_a, jnp.where(grp_fc, s_fc_a, s_ic_a))
            s_b = jnp.where(grp_oc, s_oc_b, jnp.where(grp_fc, s_fc_b, s_ic_b))

        pol_a = trace_jnp._jones_apply(j_a, *pol)
        pol_b = trace_jnp._jones_apply(j_b, *pol)
        pol_c = trace_jnp._jones_apply(j_oc_c, *pol)
        # padded/dead slots carry cos_th = 0; guard so neither the forward
        # value (0 * inf = NaN) nor the gradient poisons masked lanes
        inv_cos = 1.0 / jnp.where(buf["cos_th"] > 0, buf["cos_th"], 1.0)
        eff_a = trace_jnp._power(*pol_a) * s_a * inv_cos
        eff_b = trace_jnp._power(*pol_b) * s_b * inv_cos
        eff_c = trace_jnp._power(*pol_c) * T["oc_scale_out"][cid] * inv_cos

        # deposit: weighted out-couple energy from OC hits (the eyebox-quad
        # gate + binning live in ``deposit``)
        dep_w = jnp.where(hit_oc, w * eff_c, 0.0)

        # miss transitions
        miss_fc2 = grp_fc & ~in_hull & (state == 2)
        miss_fc3 = grp_fc & ~in_hull & (state == 3)
        in_r2 = trace_jnp._hp_inside(G["r2_hp"], x, y)
        fc3_to_oc = miss_fc3 & ~in_r2
        hop = miss_fc2 | (miss_fc3 & in_r2) | (grp_oc & ~in_rect & (state == 4))
        miss_oc5 = grp_oc & ~in_rect & (state == 5)
        hop_dir = jnp.where(miss_fc2, DIR_IC, DIR_FC)
        if fast:
            hph = _dir_sel(hop_dir, T["hop2_phasor"][0])
        else:
            hph = T["hop2_phasor"][cid, hop_dir]
        hop_tmr, hop_tmi = trace_jnp._phase_mul(hph, buf["tmr"], buf["tmi"])

        def child(branch_pol, eff, scale_cos, dir_idx, to_state_fc, to_state_oc,
                  ic_in_state, ic_out_state):
            """Build the child for one interaction branch; hop-survivor merged for
            branch A, dead for branch B on non-interacting slots."""
            pw_c = trace_jnp._power(*branch_pol)
            inv = jax.lax.rsqrt(jnp.where(pw_c > 1e-30, pw_c, 1.0))
            if fast:
                ph = _dir_sel(dir_idx, T["tir_phasor"][0])
            else:
                ph = T["tir_phasor"][cid, dir_idx]
            ter = branch_pol[0] * inv
            tei = branch_pol[1] * inv
            tmr, tmi = trace_jnp._phase_mul(ph, branch_pol[2] * inv,
                                            branch_pol[3] * inv)
            if fast:
                gx = _dir_sel(dir_idx, T["gaps"][0, :, 0])
                gy = _dir_sel(dir_idx, T["gaps"][0, :, 1])
            else:
                gx = T["gaps"][cid, dir_idx, 0]
                gy = T["gaps"][cid, dir_idx, 1]
            xa = x + gx
            ya = y + gy
            icin = in_ic(G, xa, ya)
            st = jnp.where(
                grp_oc, to_state_oc,
                jnp.where(grp_fc, to_state_fc,
                          jnp.where(icin, ic_in_state, ic_out_state)))
            wgt = w * eff
            keep = wgt > weight_threshold
            pruned = jnp.sum(jnp.where(interact & alive & ~keep, wgt, 0.0))
            st = jnp.where(interact & keep, st, DEAD)
            return dict(x=xa, y=ya, ter=ter, tei=tei, tmr=tmr, tmi=tmi,
                        cos_th=scale_cos, gap_x=gx, gap_y=gy,
                        state=st.astype(jnp.int32), w=wgt, cid=cid), pruned

        dir_a = jnp.where(grp_oc, DIR_FC, DIR_IC)
        dir_b = jnp.where(grp_ic, DIR_IC2, jnp.where(grp_fc, DIR_FC, DIR_OC))
        ch_a, pr_a = child(pol_a, eff_a, s_a, dir_a, 2, 4, 0, 2)
        ch_b, pr_b = child(pol_b, eff_b, s_b, dir_b, 3, 5, 1, DEAD)
        pruned = pr_a + pr_b

        # non-interacting slots: childA carries the hop survivor / phase change
        surv_state = jnp.where(
            fc3_to_oc, 4, jnp.where(hop, state, DEAD)).astype(jnp.int32)
        surv_state = jnp.where(miss_oc5, DEAD, surv_state)
        not_int = alive & ~interact
        for key, surv in (
            ("x", jnp.where(hop, x + buf["gap_x"], x)),
            ("y", jnp.where(hop, y + buf["gap_y"], y)),
            ("ter", buf["ter"]), ("tei", buf["tei"]),
            ("tmr", jnp.where(hop, hop_tmr, buf["tmr"])),
            ("tmi", jnp.where(hop, hop_tmi, buf["tmi"])),
            ("cos_th", buf["cos_th"]), ("gap_x", buf["gap_x"]),
            ("gap_y", buf["gap_y"]), ("w", w),
        ):
            ch_a[key] = jnp.where(not_int, surv, ch_a[key])
        ch_a["state"] = jnp.where(not_int, surv_state, ch_a["state"])
        ch_a["state"] = jnp.where(alive, ch_a["state"], DEAD)
        ch_b["state"] = jnp.where(alive & interact, ch_b["state"], DEAD)
        return ch_a, ch_b, dep_w, pruned

    return split_init, split_step, deposit


def make_splitting_trace_fn(tables: CellTables, tgeom: TraceGeometry,
                            cfg: TraceConfig, capacity: int = 1 << 16,
                            weight_threshold: float = 1e-5,
                            max_steps: int = 512,
                            table_arg: bool = False,
                            fixed_steps: int = 0,
                            soft_binning: bool = False):
    """Build ``trace(rays0) -> (hist_flat, out_w, trunc_w, pruned, steps)`` (jitted).

    The *global-buffer* engine: all launch rays share one ``capacity``-slot
    wavefront.  Use :func:`make_splitting_cells_fn` for production-scale exact
    evaluation (per-cell buffers; see module docstring) — this engine remains
    the differentiable path.

    ``rays0`` is a :func:`trace_jnp.make_ray_state` pytree whose length is the
    initial wavefront (padded into the capacity buffer).  All rays' initial weight
    is 1/len(rays0) x per-ray launch weight 1.

    ``table_arg``: the trace takes the cell-table pytree as a second argument
    (``trace(rays0, T)``) instead of closing over it — required to
    differentiate the histogram w.r.t. table entries (grating apodization
    optimization, :mod:`..opt.grating_opt`).
    ``fixed_steps``: > 0 replaces the ``lax.while_loop`` with a fixed-length
    ``lax.scan`` of that many steps.  ``while_loop`` is not reverse-mode
    differentiable; the scan is (each step is checkpointed, so memory stays
    O(capacity) per step boundary instead of O(steps x capacity x live values)).
    ``soft_binning``: deposits splat bilinearly over the four nearest eyebox
    bins (cloud-in-cell) instead of nearest-bin.  This makes the histogram a
    *continuous* function of deposit position, so positions — and through
    them the TIR hop vectors and the grating period/orientation that set them
    (design/diff.py) — carry nonzero reverse-mode gradients; with hard
    binning the dominant design sensitivity (hop spacing moving deposits
    across bin boundaries) is a measure-zero jump AD correctly reports as 0.
    Blurs the map by at most half a bin; use for optimization, not for
    MC-parity metrics.
    """
    T_closed = None if table_arg else trace_jnp._as_jnp(tables)
    G = trace_jnp._geom_jnp(tgeom)
    ny, nx = cfg.eyebox_bins
    L, M, N = tables.L, tables.M, tables.N
    hist_size = L * N * M * ny * nx
    split_init, split_step, deposit = _build_step_fns(
        cfg, n_cells_mn=M * N, L=L, M=M, N=N, num_fc=tgeom.num_fc,
        num_oc=tgeom.num_oc, weight_threshold=weight_threshold,
        soft_binning=soft_binning)

    def compact(children: dict, cap: int):
        """Keep the ``cap`` heaviest alive slots (argsort compaction)."""
        aliveness = jnp.where(children["state"] < DEAD, children["w"], -1.0)
        order = jnp.argsort(-aliveness)
        kept = {k: children[k][order[:cap]] for k in _KEYS}
        dropped = jnp.sum(
            jnp.where((children["state"][order[cap:]] < DEAD),
                      children["w"][order[cap:]], 0.0))
        return kept, dropped

    def _trace_impl(rays0: dict, T: dict):
        n0 = len(rays0["x"])
        w0 = jnp.abs(rays0["ter"]) + jnp.abs(rays0["tei"]) \
            + jnp.abs(rays0["tmr"]) + jnp.abs(rays0["tmi"])
        rays0 = dict(rays0)
        rays0["w"] = jnp.where(w0 > 0, 1.0, 0.0)
        kids, pruned_init = split_init(T, G, rays0)
        children = {k: jnp.concatenate([kids[0][k], kids[1][k]]) for k in _KEYS}
        if len(children["x"]) < capacity:
            pad = capacity - len(children["x"])
            for k in _KEYS:
                filler = jnp.zeros((pad,), children[k].dtype)
                if k == "state":
                    filler = filler + DEAD
                children[k] = jnp.concatenate([children[k], filler])
        buf, trunc = compact(children, capacity)

        hist = jnp.zeros(hist_size, jnp.float32)

        def body(carry):
            buf, hist, trunc, pruned, it = carry
            ch_a, ch_b, dep_w, pr = split_step(T, G, buf)
            hist = deposit(G, hist, buf["cid"], buf["x"], buf["y"], dep_w)
            children = {k: jnp.concatenate([ch_a[k], ch_b[k]]) for k in _KEYS}
            buf, dropped = compact(children, capacity)
            return buf, hist, trunc + dropped, pruned + pr, it + 1

        if fixed_steps > 0:
            ckpt_body = jax.checkpoint(lambda c, _: (body(c), None))
            (buf, hist, trunc, pruned, it), _ = jax.lax.scan(
                ckpt_body,
                (buf, hist, trunc, pruned_init, jnp.int32(0)),
                None, length=fixed_steps)
        else:
            def cond(carry):
                buf, hist, trunc, pruned, it = carry
                return (it < max_steps) & jnp.any(buf["state"] < DEAD)

            buf, hist, trunc, pruned, it = jax.lax.while_loop(
                cond, body, (buf, hist, trunc, pruned_init, jnp.int32(0)))
        return hist, jnp.sum(hist), trunc, pruned, it

    if table_arg:
        return jax.jit(_trace_impl)
    return jax.jit(lambda rays0: _trace_impl(rays0, T_closed))


def run_splitting(tables: CellTables, tgeom: TraceGeometry, cfg: TraceConfig,
                  rays0: dict, **kw) -> SplitResult:
    trace = make_splitting_trace_fn(tables, tgeom, cfg, **kw)
    hist, out_w, trunc, pruned, steps = jax.block_until_ready(trace(rays0))
    ny, nx = cfg.eyebox_bins
    L, M, N = tables.L, tables.M, tables.N
    return SplitResult(
        histogram=np.asarray(hist).reshape(L, N, M, ny, nx),
        out_coupled=float(out_w),
        truncated=float(trunc),
        pruned=float(pruned),
        steps=int(steps),
    )


# ---------------------------------------------------------------------------
# Per-cell production-scale engine


def _gather_cell_tables(T: dict, cell_ids: jnp.ndarray) -> dict:
    """Chunk tables: leading cell axis + singleton at the original cid axis.

    Each per-cell slice then has exactly the layout the shared physics code
    expects (it indexes the cell axis with an all-zero cid vector, which XLA
    folds to a broadcast read of the singleton axis)."""
    out = {}
    for k, ax in _TABLE_CELL_AXIS.items():
        v = jnp.take(T[k], cell_ids, axis=ax)
        v = jnp.moveaxis(v, ax, 0)
        out[k] = jnp.expand_dims(v, ax + 1)
    return out


def make_splitting_cells_fn(tables: CellTables, tgeom: TraceGeometry,
                            cfg: TraceConfig, capacity: int = 4096,
                            weight_threshold: float = 1e-5,
                            max_steps: int = 1024,
                            per_cell_seeds: bool = False,
                            fast: bool = True):
    """Build the per-cell-wavefront exact tracer (jitted).

    ``trace(cell_ids, seeds) -> (tiles, out_w, trunc, pruned, steps, peak)``

    - ``cell_ids``: (C,) int32 flat cell indices (l*M + m)*N + n.
    - ``seeds``: dict with keys x, y, ter, tei, tmr, tmi — each (P,) float32
      (shared launch positions, the reference's shared-pupil-samples
      semantics) or (C, P) with ``per_cell_seeds=True``.  Launch weight is 1
      per seed with nonzero amplitude (the TE/TM split of the MC seeder).
    - ``tiles``: (C, ny, nx) float32 — each cell's weighted eyebox map.
    - ``out_w``/``trunc``/``pruned``: (C,) float32 per-cell weight ledgers.
    - ``steps``: scalar int32 — wavefront steps until the whole chunk drained.
    - ``peak``: (C,) int32 — max concurrent live width per cell, for sizing
      ``capacity`` (the zero-variance guarantee needs trunc == 0, i.e.
      peak < capacity).

    Each cell's wavefront lives in its own ``capacity``-slot buffer; children
    compact with an O(K) cumsum + scatter (no argsort — overflow drops
    arbitrary, not lowest-weight-first, children; irrelevant at trunc == 0,
    and the (C,) ``trunc`` ledger still accounts every dropped weight).
    Rebuilds the reference's dead splitting kernel + host compaction loop
    (GPU_ray_tracing_functions.py:193-417,:179-191) as a vmapped wavefront.

    ``fast`` (default, VERDICT r4 #3) eliminates every per-slot
    gather/scatter from the step — the ops XLA element-serializes on TPU,
    which made the original form ~155 ms/cell:

    - site parameters select by an exact one-hot matmul on the MXU over
      per-(site, bit) records (:func:`_site_records_chunk`);
    - dir-indexed constants (gaps/phasors) select by 4-way vector selects;
    - compaction is a variadic ``lax.sort`` on an aliveness-ordered unique
      key (the comparator network carries all SoA payloads — no
      gather/scatter), keeping exactly the cumsum form's slots in the same
      order;
    - deposits accumulate by the persistent kernel's one-hot-matmul
      histogram pattern.

    Selected parameters and kept wavefronts are bitwise-identical to the
    ``fast=False`` form; deposit bins agree up to f32 summation order
    (asserted in tests/test_splitting.py).
    """
    T = trace_jnp._as_jnp(tables)
    Gfull = trace_jnp._geom_jnp(tgeom)
    ny, nx = cfg.eyebox_bins
    n_cells_mn = tables.M * tables.N
    K = capacity
    split_init, split_step, deposit = _build_step_fns(
        cfg, n_cells_mn=1, L=1, M=1, N=1, num_fc=tgeom.num_fc,
        num_oc=tgeom.num_oc, weight_threshold=weight_threshold, fast=fast)

    g_axes = {k: (0 if k == "eyebox_range" else None) for k in Gfull}
    buf_axes = {k: (None if k == "cid" else 0) for k in _KEYS}
    seed_axes = 0 if per_cell_seeds else None

    vinit = jax.vmap(split_init, in_axes=(0, g_axes, seed_axes))
    vstep = jax.vmap(split_step, in_axes=(0, g_axes, buf_axes))
    vdeposit = jax.vmap(
        lambda G, hist, x, y, w, cid: deposit(G, hist, cid, x, y, w),
        in_axes=(g_axes, 0, 0, 0, 0, None))

    def compact(children: dict, nkeys):
        """O(len) cumsum compaction into a K-slot buffer (single cell)."""
        alive = children["state"] < DEAD
        pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
        keep = alive & (pos < K)
        idx = jnp.where(keep, pos, K)  # overflow + dead -> scratch slot K
        out = {}
        for k in nkeys:
            fill = DEAD if k == "state" else 0
            init = jnp.full((K + 1,), fill, children[k].dtype)
            out[k] = init.at[idx].set(children[k])[:K]
        dropped = jnp.sum(jnp.where(alive & ~keep, children["w"], 0.0))
        return out, dropped, jnp.sum(alive.astype(jnp.int32))

    def compact_sort(children: dict, nkeys):
        """Scatter-free compaction: variadic ``lax.sort`` on an
        aliveness-ordered unique key (alive slots keep their index order,
        dead slots sort after all alive ones).  The comparator network
        carries every SoA payload, so no per-element gather/scatter remains
        — the op the cumsum form's ``at[idx].set`` pays element-serialized
        on TPU.  Kept slots and their order are identical to :func:`compact`
        (first K alive in index order; the dead tail is normalized to
        ``state = DEAD`` and never read otherwise)."""
        n = children["state"].shape[0]
        alive = children["state"] < DEAD
        idx = jnp.arange(n, dtype=jnp.int32)
        skey = jnp.where(alive, idx, n + idx)
        ops = jax.lax.sort([skey] + [children[k] for k in nkeys], num_keys=1)
        m = min(n, K)
        out = {}
        for k, v in zip(nkeys, ops[1:]):
            vk = v[:m]
            if k == "state":
                vk = jnp.where(ops[0][:m] < n, vk, DEAD)
            if m < K:
                fill = DEAD if k == "state" else 0
                vk = jnp.concatenate(
                    [vk, jnp.full((K - m,), fill, vk.dtype)])
            out[k] = vk
        if n > K:
            iw = 1 + nkeys.index("w")
            dropped = jnp.sum(
                jnp.where(ops[0][K:] < n, ops[iw][K:], 0.0))
        else:
            dropped = jnp.float32(0.0)
        return out, dropped, jnp.sum(alive.astype(jnp.int32))

    nkeys = tuple(k for k in _KEYS if k != "cid")
    vcompact = jax.vmap(functools.partial(
        compact_sort if fast else compact, nkeys=nkeys))

    @jax.jit
    def trace(cell_ids: jnp.ndarray, seeds: dict):
        C = cell_ids.shape[0]
        cell_ids = cell_ids.astype(jnp.int32)
        Tc = _gather_cell_tables(T, cell_ids)
        if fast:
            # assembled once per chunk (outside the step loop); consumed by
            # the one-hot site selection in split_step
            Tc["site_records"] = _site_records_chunk(
                Tc, tgeom.num_fc, tgeom.num_oc)
        mn = jnp.remainder(cell_ids, n_cells_mn)
        Gc = dict(Gfull, eyebox_range=Gfull["eyebox_range"][mn][:, None, :])

        P = seeds["x"].shape[-1]
        w0 = (jnp.abs(seeds["ter"]) + jnp.abs(seeds["tei"])
              + jnp.abs(seeds["tmr"]) + jnp.abs(seeds["tmi"]))
        rays0 = dict(seeds)
        rays0["w"] = jnp.where(w0 > 0, 1.0, 0.0)
        rays0["cid"] = jnp.zeros((C, P) if per_cell_seeds else (P,), jnp.int32)
        kids, pruned0 = vinit(Tc, Gc, rays0)
        children = {k: jnp.concatenate([kids[0][k], kids[1][k]], axis=-1)
                    for k in nkeys}
        if 2 * P > K:
            raise ValueError(
                f"2 x {P} seed children exceed the {K}-slot per-cell buffer")
        buf, trunc0, peak0 = vcompact(children)

        hist = jnp.zeros((C, ny * nx), jnp.float32)
        cid0 = jnp.zeros((K,), jnp.int32)

        def body(carry):
            buf, hist, trunc, pruned, peak, it = carry
            bufc = dict(buf, cid=cid0)
            ch_a, ch_b, dep_w, pr = vstep(Tc, Gc, bufc)
            hist = vdeposit(Gc, hist, buf["x"], buf["y"], dep_w, cid0)
            children = {k: jnp.concatenate([ch_a[k], ch_b[k]], axis=-1)
                        for k in nkeys}
            buf, dropped, nlive = vcompact(children)
            return (buf, hist, trunc + dropped, pruned + pr,
                    jnp.maximum(peak, nlive), it + 1)

        def cond(carry):
            buf, hist, trunc, pruned, peak, it = carry
            return (it < max_steps) & jnp.any(buf["state"] < DEAD)

        buf, hist, trunc, pruned, peak, it = jax.lax.while_loop(
            cond, body, (buf, hist, trunc0, pruned0, peak0, jnp.int32(0)))
        tiles = hist.reshape(C, ny, nx)
        return tiles, jnp.sum(hist, axis=1), trunc, pruned, it, peak

    return trace


def cells_tiles_to_histogram(tiles, cell_ids, L, M, N, ny, nx):
    """Scatter per-cell (C, ny, nx) tiles into the (L, N, M, ny, nx) map."""
    flat = jnp.zeros((L * M * N, ny, nx), jnp.float32)
    flat = flat.at[jnp.asarray(cell_ids)].add(tiles)
    return jnp.transpose(flat.reshape(L, M, N, ny, nx), (0, 2, 1, 3, 4))


def run_splitting_cells(tables: CellTables, tgeom: TraceGeometry,
                        cfg: TraceConfig, cell_ids, seeds: dict,
                        **kw) -> SplitResult:
    """Convenience wrapper: per-cell trace -> assembled SplitResult."""
    trace = make_splitting_cells_fn(tables, tgeom, cfg, **kw)
    tiles, out_w, trunc, pruned, steps, peak = jax.block_until_ready(
        trace(jnp.asarray(cell_ids), seeds))
    ny, nx = cfg.eyebox_bins
    L, M, N = tables.L, tables.M, tables.N
    hist = np.asarray(cells_tiles_to_histogram(
        tiles, cell_ids, L, M, N, ny, nx))
    return SplitResult(
        histogram=hist,
        out_coupled=float(jnp.sum(out_w)),
        truncated=float(jnp.sum(trunc)),
        pruned=float(jnp.sum(pruned)),
        steps=int(steps),
        peak_live=int(jnp.max(peak)),
    )
