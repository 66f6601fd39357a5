"""Vectorized Monte-Carlo tracer: the whole ray batch advances one bounce per step.

This is the XLA reference engine (correct on CPU and TPU, shardable with
``shard_map``); the Pallas megakernel in :mod:`.trace_pallas` specializes the same
step for per-cell VMEM residency.

Design vs. the reference CUDA kernel (GPU_ray_tracing_functions.py:833-1247):

- one thread per ray with divergent control flow becomes a masked SoA batch stepped by
  a bounded ``lax.while_loop`` with an any-alive early exit;
- the polarization state (|te|, |tm|, delta) becomes a complex 2-vector, which turns
  every ``E_field_cal`` (cos/sin/atan2/hypot) into a complex 2x2 matvec and the TIR
  phase-retardation adds into precomputed phasor multiplies -- the hot loop contains
  no transcendentals at all;
- per-strip polygon scans become one convex region test + 1-D band binning
  (see :mod:`.trace_geometry`);
- the states of each phase pair {0,1}, {2,3}, {4,5} run through one uniform
  interaction record (see :mod:`..luts.packing`), so a bounce is: containment tests,
  table gathers, 2-3 matvecs, one roulette draw, masked update;
- histogram deposits are recorded per ray (each ray deposits at most once, on its
  terminal bounce) and scattered after the trace -- no atomics anywhere.

Tables/geometry can be closed over as constants (:func:`make_trace_fn`) or passed as
pytree arguments (:func:`make_trace_fn_dynamic`), the latter enabling ``vmap`` over a
design axis for batched design sweeps.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraceConfig
from ..luts.packing import CellTables, DIR_IC, DIR_FC, DIR_IC2, DIR_OC
from ..ops import rng as rng_ops
from .trace_geometry import TraceGeometry

DEAD = jnp.int32(6)
_EDGE_TOL = 1e-6  # float32-scale stand-in for the reference's 1e-12 on-edge tolerance


def _as_jnp(tables: CellTables, fdt=jnp.float32, cdt=None) -> dict:
    """Device tables.  Complex arrays are stored as trailing-axis (re, im) float
    pairs: the engine works in split real arithmetic (friendlier to the TPU backend
    and to the VPU than complex dtypes, which XLA would decompose anyway)."""
    t = {}
    for f in dataclasses.fields(tables):
        v = getattr(tables, f.name)
        if isinstance(v, np.ndarray):
            if np.iscomplexobj(v):
                t[f.name] = jnp.asarray(
                    np.stack([v.real, v.imag], axis=-1), dtype=fdt
                )
            elif v.dtype.kind == "f":
                t[f.name] = jnp.asarray(v, dtype=fdt)
            else:
                t[f.name] = jnp.asarray(v)
        else:
            t[f.name] = v
    return t


def _geom_jnp(g: TraceGeometry, fdt=jnp.float32) -> dict:
    return {
        "ic_center": jnp.asarray(g.ic_center, fdt),
        "ic_radius": fdt(g.ic_radius),
        "ic_hp": jnp.asarray(g.ic_hp, fdt),
        "r1_hp": jnp.asarray(g.r1_hp, fdt),
        "r2_hp": jnp.asarray(g.r2_hp, fdt),
        "hull_hp": jnp.asarray(g.hull_hp, fdt),
        "fc_rot": jnp.asarray(g.fc_rot, fdt),
        "fc_top": fdt(g.fc_top),
        "fc_width": fdt(g.fc_width),
        "oc_rot_y": jnp.asarray(g.oc_rot_y, fdt),
        "oc_bounds": jnp.asarray(g.oc_bounds, fdt),
        "oc_top": fdt(g.oc_top),
        "oc_width": fdt(g.oc_width),
        "eyebox_range": jnp.asarray(
            g.eyebox_range.reshape(-1, 4), fdt
        ),  # (M*N, 4)
    }


def _hp_inside(hp: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """All-of half-plane containment, (R,) bool for (E, 3) half-planes."""
    d = x[:, None] * hp[None, :, 0] + y[:, None] * hp[None, :, 1] - hp[None, :, 2]
    return jnp.all(d <= _EDGE_TOL, axis=1)


def _jones_apply(j: jnp.ndarray, ter, tei, tmr, tmi):
    """Split-real complex 2x2 matvec; ``j`` is (R, 2, 2, 2) with (re, im) last."""
    jr, ji = j[..., 0], j[..., 1]
    out_ter = jr[:, 0, 0] * ter - ji[:, 0, 0] * tei + jr[:, 0, 1] * tmr - ji[:, 0, 1] * tmi
    out_tei = jr[:, 0, 0] * tei + ji[:, 0, 0] * ter + jr[:, 0, 1] * tmi + ji[:, 0, 1] * tmr
    out_tmr = jr[:, 1, 0] * ter - ji[:, 1, 0] * tei + jr[:, 1, 1] * tmr - ji[:, 1, 1] * tmi
    out_tmi = jr[:, 1, 0] * tei + ji[:, 1, 0] * ter + jr[:, 1, 1] * tmi + ji[:, 1, 1] * tmr
    return out_ter, out_tei, out_tmr, out_tmi


def _phase_mul(ph, re, im):
    """Multiply (re, im) by a unit phasor given as (R, 2)."""
    pr, pi = ph[..., 0], ph[..., 1]
    return pr * re - pi * im, pr * im + pi * re


def _power(ter, tei, tmr, tmi):
    return ter * ter + tei * tei + tmr * tmr + tmi * tmi


def make_ray_state(x, y, te, tm, cid, ray_idx, rng_state,
                   precision: str = "f32") -> dict:
    """Initial SoA pytree.  te/tm are the complex polarization amplitudes
    (stored internally as split re/im float arrays)."""
    r = len(x)
    f32 = jnp.float64 if precision == "f64" else jnp.float32
    te = np.asarray(te, np.complex128)
    tm = np.asarray(tm, np.complex128)
    return {
        "x": jnp.asarray(x, f32),
        "y": jnp.asarray(y, f32),
        "ter": jnp.asarray(te.real, f32),
        "tei": jnp.asarray(te.imag, f32),
        "tmr": jnp.asarray(tm.real, f32),
        "tmi": jnp.asarray(tm.imag, f32),
        "cos_th": jnp.ones(r, f32),
        "gap_x": jnp.zeros(r, f32),
        "gap_y": jnp.zeros(r, f32),
        "state": jnp.zeros(r, jnp.int32),
        "rng": jnp.asarray(rng_state, jnp.uint32),
        "dep": jnp.full(r, -1, jnp.int32),
        "cid": jnp.asarray(cid, jnp.int32),
        "idx": jnp.asarray(ray_idx, jnp.uint32),
    }


def make_trace_fn_dynamic(
    cfg: TraceConfig, num_fc: int, num_oc: int, n_cells_mn: int,
    mode: str = "full",
):
    """Build ``trace(rays, T, G) -> (rays_final, bounces)`` with tables/geometry as
    pytree *arguments* (dicts from :func:`_as_jnp` / :func:`_geom_jnp`).

    One compilation serves any design of the same strip counts and FoV grid; vmap
    over a leading design axis of (rays, T, G) for batched sweeps.

    ``mode='resume'`` skips the first-IC init step and just runs the bounce loop on
    already-initialized state — the building block for host-level segment +
    compaction scheduling (trace a bounce budget, gather survivors, continue).
    """
    ny, nx = cfg.eyebox_bins
    use_circle_ic = cfg.ic_test == "circle"

    def in_ic(G, x, y):
        if use_circle_ic:
            dx = x - G["ic_center"][0]
            dy = y - G["ic_center"][1]
            return dx * dx + dy * dy <= G["ic_radius"] * G["ic_radius"]
        return _hp_inside(G["ic_hp"], x, y)

    def init_step(rays: dict, T: dict, G: dict) -> dict:
        """First IC interaction from air (kernel :860-904)."""
        cid = rays["cid"]
        pol = (rays["ter"], rays["tei"], rays["tmr"], rays["tmi"])
        j_a = T["init_jones"][0][cid]
        j_b = T["init_jones"][1][cid]
        pol_a = _jones_apply(j_a, *pol)
        pol_b = _jones_apply(j_b, *pol)
        cos0 = T["init_cos0"][cid]
        eff_a = _power(*pol_a) * T["init_scale"][0][cid] / cos0
        eff_b = _power(*pol_b) * T["init_scale"][1][cid] / cos0
        u, rng = rng_ops.draw_uniform(
            rays["rng"], rays["idx"], jnp.ones_like(rays["rng"], dtype=bool)
        )
        a = u <= eff_a
        b = (~a) & (u <= eff_a + eff_b)

        ter_n, tei_n, tmr_n, tmi_n = (
            jnp.where(a, pa, pb) for pa, pb in zip(pol_a, pol_b)
        )
        inv = jax.lax.rsqrt(jnp.maximum(_power(ter_n, tei_n, tmr_n, tmi_n), 1e-30))
        dirs = jnp.where(a, DIR_IC, DIR_IC2)
        ph = T["tir_phasor"][cid, dirs]
        ter_n, tei_n = ter_n * inv, tei_n * inv
        tmr_n, tmi_n = _phase_mul(ph, tmr_n * inv, tmi_n * inv)
        gx = T["gaps"][cid, dirs, 0]
        gy = T["gaps"][cid, dirs, 1]
        x = rays["x"] + gx
        y = rays["y"] + gy
        ic_in = in_ic(G, x, y)
        state = jnp.where(
            a,
            jnp.where(ic_in, 0, 2),
            jnp.where(b, jnp.where(ic_in, 1, DEAD), DEAD),
        ).astype(jnp.int32)
        cos_th = jnp.where(a, T["ic_scale"][0][cid], T["ic_scale"][1][cid])
        live = state < DEAD
        out = dict(rays)
        out.update(
            x=jnp.where(live, x, rays["x"]),
            y=jnp.where(live, y, rays["y"]),
            ter=jnp.where(live, ter_n, rays["ter"]),
            tei=jnp.where(live, tei_n, rays["tei"]),
            tmr=jnp.where(live, tmr_n, rays["tmr"]),
            tmi=jnp.where(live, tmi_n, rays["tmi"]),
            cos_th=jnp.where(live, cos_th, rays["cos_th"]),
            gap_x=jnp.where(live, gx, 0.0),
            gap_y=jnp.where(live, gy, 0.0),
            state=state,
            rng=rng,
        )
        return out

    def bounce_step(rays: dict, T: dict, G: dict) -> Tuple[dict, jnp.ndarray]:
        """One bounce for the whole batch; returns (rays', alive_count_before)."""
        x, y = rays["x"], rays["y"]
        state = rays["state"]
        cid = rays["cid"]
        alive = state < DEAD
        n_alive = jnp.sum(alive.astype(jnp.int32))

        # global containment (kernel :906-907)
        state = jnp.where(alive & ~_hp_inside(G["r1_hp"], x, y), DEAD, state)
        alive = state < DEAD

        grp_ic = alive & (state <= 1)
        grp_fc = alive & ((state == 2) | (state == 3))
        grp_oc = alive & (state >= 4)
        bit = (state & 1).astype(jnp.int32)

        # FC membership: hull test + band binning
        yrot = G["fc_rot"][0] * x + G["fc_rot"][1] * y
        in_hull = _hp_inside(G["hull_hp"], x, y)
        fc_strip = jnp.clip(
            jnp.floor((G["fc_top"] - yrot) / G["fc_width"]).astype(jnp.int32),
            0, num_fc - 1,
        )
        # OC membership: the rect is axis-aligned in the original frame; strip
        # binning uses the band-frame coordinate
        yr = G["oc_rot_y"][0] * x + G["oc_rot_y"][1] * y
        b = G["oc_bounds"]
        in_rect = (
            (x >= b[0] - _EDGE_TOL) & (x <= b[1] + _EDGE_TOL)
            & (y >= b[2] - _EDGE_TOL) & (y <= b[3] + _EDGE_TOL)
        )
        oc_strip = jnp.clip(
            jnp.floor((G["oc_top"] - yr) / G["oc_width"]).astype(jnp.int32),
            0, num_oc - 1,
        )

        hit_fc = grp_fc & in_hull
        hit_oc = grp_oc & in_rect
        interact = grp_ic | hit_fc | hit_oc

        # --- gather interaction records (unconditional, masked later)
        pol = (rays["ter"], rays["tei"], rays["tmr"], rays["tmi"])

        def site(jtab, stab, strip=None):
            if strip is None:
                j = jtab[bit, cid]
                s = stab[cid]
            else:
                j = jtab[strip, bit, cid]
                s = stab[strip, cid]
            return j, s

        j_ic_a, s_ic_a = site(T["ic_jones"][0], T["ic_scale"][0])
        j_ic_b, s_ic_b = site(T["ic_jones"][1], T["ic_scale"][1])
        j_fc_a, s_fc_a = site(T["fc_jones"][0], T["fc_scale"][0], fc_strip)
        j_fc_b, s_fc_b = site(T["fc_jones"][1], T["fc_scale"][1], fc_strip)
        j_oc_a, s_oc_a = site(T["oc_jones"][0], T["oc_scale"][0], oc_strip)
        j_oc_b, s_oc_b = site(T["oc_jones"][1], T["oc_scale"][1], oc_strip)
        j_oc_c = T["oc_jones"][2][oc_strip, bit, cid]
        s_oc_c = T["oc_scale_out"][cid]

        gfc = grp_fc[:, None, None, None]
        goc = grp_oc[:, None, None, None]
        j_a = jnp.where(goc, j_oc_a, jnp.where(gfc, j_fc_a, j_ic_a))
        j_b = jnp.where(goc, j_oc_b, jnp.where(gfc, j_fc_b, j_ic_b))
        s_a = jnp.where(grp_oc, s_oc_a, jnp.where(grp_fc, s_fc_a, s_ic_a))
        s_b = jnp.where(grp_oc, s_oc_b, jnp.where(grp_fc, s_fc_b, s_ic_b))

        pol_a = _jones_apply(j_a, *pol)
        pol_b = _jones_apply(j_b, *pol)
        pol_c = _jones_apply(j_oc_c, *pol)
        inv_cos = 1.0 / rays["cos_th"]
        eff_a = _power(*pol_a) * s_a * inv_cos
        eff_b = _power(*pol_b) * s_b * inv_cos
        eff_c = _power(*pol_c) * s_oc_c * inv_cos

        u, rng = rng_ops.draw_uniform(rays["rng"], rays["idx"], interact)
        br_a = interact & (u <= eff_a) & (eff_a > 0)
        br_b = interact & ~br_a & (u <= eff_a + eff_b) & (eff_b > 0)
        br_c = hit_oc & ~br_a & ~br_b & (u <= eff_a + eff_b + eff_c) & (eff_c > 0)
        die_roulette = interact & ~(br_a | br_b | br_c)

        # --- accepted A/B: renormalize, apply TIR phasor, hop
        accept = br_a | br_b
        dir_a = jnp.where(grp_oc, DIR_FC, DIR_IC)
        dir_b = jnp.where(grp_ic, DIR_IC2, jnp.where(grp_fc, DIR_FC, DIR_OC))
        dirs = jnp.where(br_a, dir_a, dir_b)
        ter_n, tei_n, tmr_n, tmi_n = (
            jnp.where(br_a, pa, pb) for pa, pb in zip(pol_a, pol_b)
        )
        inv = jax.lax.rsqrt(jnp.maximum(_power(ter_n, tei_n, tmr_n, tmi_n), 1e-30))
        ph = T["tir_phasor"][cid, dirs]
        ter_n, tei_n = ter_n * inv, tei_n * inv
        tmr_n, tmi_n = _phase_mul(ph, tmr_n * inv, tmi_n * inv)
        cos_n = jnp.where(br_a, s_a, s_b)
        gx_n = T["gaps"][cid, dirs, 0]
        gy_n = T["gaps"][cid, dirs, 1]

        st_a = jnp.where(grp_oc, 4, jnp.where(grp_fc, 2, -1))  # ic resolved below
        st_b = jnp.where(grp_oc, 5, jnp.where(grp_fc, 3, -1))
        x_acc = x + gx_n
        y_acc = y + gy_n
        ic_in = in_ic(G, x_acc, y_acc)
        st_a = jnp.where(grp_ic, jnp.where(ic_in, 0, 2), st_a)
        st_b = jnp.where(grp_ic, jnp.where(ic_in, 1, DEAD), st_b)
        st_acc = jnp.where(br_a, st_a, st_b).astype(jnp.int32)

        # --- out-couple (C): deposit into per-FoV eyebox rect, then terminate
        mn = jnp.remainder(cid, n_cells_mn)
        er = G["eyebox_range"][mn]
        in_quad = (
            (x >= er[:, 0] - _EDGE_TOL) & (x <= er[:, 1] + _EDGE_TOL)
            & (y >= er[:, 2] - _EDGE_TOL) & (y <= er[:, 3] + _EDGE_TOL)
        )
        dxb = (er[:, 1] - er[:, 0]) / nx
        dyb = (er[:, 3] - er[:, 2]) / ny
        ix = jnp.clip(jnp.floor((x - er[:, 0]) / dxb).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip(jnp.floor((y - er[:, 2]) / dyb).astype(jnp.int32), 0, ny - 1)
        dep = jnp.where(br_c & in_quad, iy * nx + ix, rays["dep"])

        # --- misses: TIR hop with the doubled phasor, or phase transitions
        miss_fc2 = grp_fc & ~in_hull & (state == 2)
        miss_fc3 = grp_fc & ~in_hull & (state == 3)
        in_r2 = _hp_inside(G["r2_hp"], x, y)
        fc3_to_oc = miss_fc3 & ~in_r2            # advance to OC phase, no hop
        miss_hop_fc3 = miss_fc3 & in_r2
        miss_oc4 = grp_oc & ~in_rect & (state == 4)
        miss_oc5 = grp_oc & ~in_rect & (state == 5)

        hop = miss_fc2 | miss_hop_fc3 | miss_oc4
        hop_dir = jnp.where(miss_fc2, DIR_IC, DIR_FC)
        hph = T["hop2_phasor"][cid, hop_dir]

        # --- combine all transitions
        new_state = jnp.where(
            accept, st_acc,
            jnp.where(
                br_c | die_roulette | miss_oc5, DEAD,
                jnp.where(fc3_to_oc, 4, state),
            ),
        ).astype(jnp.int32)
        new_x = jnp.where(accept, x_acc, jnp.where(hop, x + rays["gap_x"], x))
        new_y = jnp.where(accept, y_acc, jnp.where(hop, y + rays["gap_y"], y))
        hop_tmr, hop_tmi = _phase_mul(hph, rays["tmr"], rays["tmi"])
        new_ter = jnp.where(accept, ter_n, rays["ter"])
        new_tei = jnp.where(accept, tei_n, rays["tei"])
        new_tmr = jnp.where(accept, tmr_n, jnp.where(hop, hop_tmr, rays["tmr"]))
        new_tmi = jnp.where(accept, tmi_n, jnp.where(hop, hop_tmi, rays["tmi"]))
        new_cos = jnp.where(accept, cos_n, rays["cos_th"])
        new_gx = jnp.where(accept, gx_n, rays["gap_x"])
        new_gy = jnp.where(accept, gy_n, rays["gap_y"])

        out = dict(rays)
        out.update(
            x=new_x, y=new_y, ter=new_ter, tei=new_tei, tmr=new_tmr, tmi=new_tmi,
            cos_th=new_cos, gap_x=new_gx, gap_y=new_gy, state=new_state, rng=rng,
            dep=dep,
        )
        return out, n_alive

    def trace_core(rays: dict, T: dict, G: dict):
        if mode == "full":
            rays = init_step(rays, T, G)

        def cond(carry):
            rays, bounces, it = carry
            return (it < cfg.max_bounces) & jnp.any(rays["state"] < DEAD)

        def body(carry):
            rays, bounces, it = carry
            # int32 accumulator: overflows past ~2.1e9 bounces per *batch*; the
            # pipeline chunks batches far below that and accumulates host-side
            rays, n_alive = bounce_step(rays, T, G)
            return rays, bounces + n_alive, it + 1

        rays, bounces, _ = jax.lax.while_loop(
            cond, body, (rays, jnp.int32(0), jnp.int32(0))
        )
        return rays, bounces

    return trace_core


def make_trace_fn(tables: CellTables, tgeom: TraceGeometry, cfg: TraceConfig,
                  precision: str = "f32", jit: bool = True):
    """Build ``trace(rays) -> (rays_final, bounces)`` with tables closed over.

    ``precision='f64'`` (requires jax x64) exists for oracle-parity debugging;
    production tracing is float32.
    """
    if precision == "f64":
        fdt, cdt = jnp.float64, jnp.complex128
    else:
        fdt, cdt = jnp.float32, jnp.complex64
    T = _as_jnp(tables, fdt, cdt)
    G = _geom_jnp(tgeom, fdt)
    core = make_trace_fn_dynamic(cfg, tgeom.num_fc, tgeom.num_oc,
                                 tables.M * tables.N)

    def trace(rays):
        return core(rays, T, G)

    return jax.jit(trace) if jit else trace


def deposits_to_histogram(
    dep: jnp.ndarray, cid: jnp.ndarray, L: int, M: int, N: int, ny: int, nx: int
) -> jnp.ndarray:
    """Scatter per-ray terminal deposits into the (L, N, M, ny, nx) eyebox histogram.

    Histogram axis order matches the reference ``matrix_EB``
    (gpu_ray_tracing_pro_fullColor.py:37): (lambda, FoV_y, FoV_x, eb_y, eb_x).
    """
    has = dep >= 0
    l = cid // (M * N)
    mn = cid % (M * N)
    m = mn // N
    n = mn % N
    flat = ((l * N + n) * M + m) * (ny * nx) + jnp.maximum(dep, 0)
    hist = jnp.zeros(L * N * M * ny * nx, jnp.float32)
    hist = hist.at[flat].add(has.astype(jnp.float32))
    return hist.reshape(L, N, M, ny, nx)
