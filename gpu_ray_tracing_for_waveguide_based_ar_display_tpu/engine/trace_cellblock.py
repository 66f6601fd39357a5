"""Cell-blocked XLA tracer: per-cell tables as batch axes, zero gathers.

XLA gathers on TPU are element-serialized, which caps the flat-batch engine
(:mod:`.trace_jnp`) at well under 1 M bounces/s.  This engine removes every gather
from the hot loop by the same insight as the Pallas kernel — a ray's cell never
changes — expressed in pure XLA:

- rays are shaped ``(C, R)`` with cell identity as the leading *batch axis*, so all
  cell-level quantities broadcast instead of gathering;
- strip-dependent Jones records resolve by one-hot einsum over the (padded) strip
  axis — a batched matmul the MXU eats — followed by a per-ray state-bit select;
- direction-dependent hops/phasors resolve by 4-way selects of broadcast values.

Same semantics as the other engines (same RNG streams, same branch rules); runs on
any XLA backend, shards over the cell axis, and needs no Mosaic support.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TraceConfig
from ..luts.packing import CellTables, DIR_IC, DIR_FC, DIR_IC2, DIR_OC
from .trace_geometry import TraceGeometry
from . import trace_jnp

DEAD = 6
_EDGE_TOL = trace_jnp._EDGE_TOL


def _j8(j: np.ndarray) -> np.ndarray:
    """(..., 2, 2) complex -> (..., 8) float32 re/im interleaved row-major."""
    return np.stack(
        [j[..., 0, 0].real, j[..., 0, 0].imag, j[..., 0, 1].real, j[..., 0, 1].imag,
         j[..., 1, 0].real, j[..., 1, 0].imag, j[..., 1, 1].real, j[..., 1, 1].imag],
        axis=-1,
    ).astype(np.float32)


def build_cellblock_tables(tables: CellTables, eyebox_range_mn: np.ndarray) -> dict:
    """Per-cell arrays with the cell axis leading, float32 throughout.

    ``fc``: (C, S_fc, 36) strips packed [JA_b0 | JB_b0 | JA_b1 | JB_b1 | s_a s_b];
    ``oc``: (C, S_oc, 52) [JA_b0 JB_b0 JC_b0 | JA_b1 JB_b1 JC_b1 | s_a s_b].
    """
    C = tables.num_cells
    f32 = np.float32
    S_fc = tables.fc_jones.shape[1]
    S_oc = tables.oc_jones.shape[1]

    fc = np.zeros((C, S_fc, 36), dtype=f32)
    for s in range(S_fc):
        fc[:, s, 0:8] = _j8(tables.fc_jones[0][s, 0])
        fc[:, s, 8:16] = _j8(tables.fc_jones[1][s, 0])
        fc[:, s, 16:24] = _j8(tables.fc_jones[0][s, 1])
        fc[:, s, 24:32] = _j8(tables.fc_jones[1][s, 1])
        fc[:, s, 32] = tables.fc_scale[0][s]
        fc[:, s, 33] = tables.fc_scale[1][s]

    oc = np.zeros((C, S_oc, 52), dtype=f32)
    for s in range(S_oc):
        for bit in range(2):
            for br in range(3):
                o = bit * 24 + br * 8
                oc[:, s, o:o + 8] = _j8(tables.oc_jones[br][s, bit])
        oc[:, s, 48] = tables.oc_scale[0][s]
        oc[:, s, 49] = tables.oc_scale[1][s]

    ph = tables.tir_phasor
    h2 = tables.hop2_phasor
    ebr = np.tile(eyebox_range_mn.reshape(-1, 4), (tables.L, 1)).astype(f32)
    return {
        "init_j": np.stack([_j8(tables.init_jones[0]),
                            _j8(tables.init_jones[1])], axis=1),  # (C, 2, 8)
        "init_s": np.stack([tables.init_scale[0], tables.init_scale[1]],
                           axis=1).astype(f32),                   # (C, 2)
        "cos0": tables.init_cos0.astype(f32),                     # (C,)
        "ic_j": np.stack(
            [np.stack([_j8(tables.ic_jones[0][b]), _j8(tables.ic_jones[1][b])],
                      axis=1) for b in range(2)], axis=1
        ),                                                        # (C, 2bit, 2br, 8)
        "ic_s": np.stack([tables.ic_scale[0], tables.ic_scale[1]],
                         axis=1).astype(f32),                     # (C, 2)
        "fc": fc,
        "oc": oc,
        "oc_sout": tables.oc_scale_out.astype(f32),               # (C,)
        "gaps": tables.gaps.astype(f32),                          # (C, 4, 2)
        "tir": np.stack([ph.real, ph.imag], axis=-1).astype(f32),  # (C, 4, 2)
        "hop2": np.stack([h2.real, h2.imag], axis=-1).astype(f32),
        "ebr": ebr,                                               # (C, 4)
    }


def _jones8(j, ter, tei, tmr, tmi):
    """Matvec with (..., 8) re/im-interleaved coefficients (broadcasts over rays)."""
    ar, ai, br_, bi, cr, ci, dr, di = (j[..., k] for k in range(8))
    return (
        ar * ter - ai * tei + br_ * tmr - bi * tmi,
        ar * tei + ai * ter + br_ * tmi + bi * tmr,
        cr * ter - ci * tei + dr * tmr - di * tmi,
        cr * tei + ci * ter + dr * tmi + di * tmr,
    )


def _pw(p):
    return p[0] * p[0] + p[1] * p[1] + p[2] * p[2] + p[3] * p[3]


def _hp_inside(hp, x, y):
    d = (x[..., None] * hp[:, 0] + y[..., None] * hp[:, 1]) - hp[:, 2]
    return jnp.all(d <= _EDGE_TOL, axis=-1)


def _dir4(tab, dirs):
    """(C, 4, k) table selected by per-ray dirs (C, R) -> (C, R, k)."""
    d = dirs[..., None]
    return jnp.where(
        d == 0, tab[:, None, 0],
        jnp.where(d == 1, tab[:, None, 1],
                  jnp.where(d == 2, tab[:, None, 2], tab[:, None, 3])))


def make_cellblock_trace_fn(cfg: TraceConfig, num_fc: int, num_oc: int,
                            tgeom: TraceGeometry):
    """Build jitted ``trace(T, rays) -> (rays', bounces)`` over (C, R) blocks.

    ``T`` is a batch-sliced :func:`build_cellblock_tables` dict (leading axis C);
    ``rays`` holds (C, R) arrays: x, y, ter, tei, tmr, tmi, rng (uint32) plus the
    derived per-ray fields created by the init step.
    """
    G = trace_jnp._geom_jnp(tgeom)
    ny, nx = cfg.eyebox_bins
    use_circle_ic = cfg.ic_test == "circle"
    f32 = jnp.float32

    def in_ic(x, y):
        if use_circle_ic:
            dx = x - G["ic_center"][0]
            dy = y - G["ic_center"][1]
            return dx * dx + dy * dy <= G["ic_radius"] * G["ic_radius"]
        return _hp_inside(G["ic_hp"], x, y)

    def phase_mul(ph, re, im):
        return ph[..., 0] * re - ph[..., 1] * im, ph[..., 0] * im + ph[..., 1] * re

    def init_step(T, rays):
        x, y = rays["x"], rays["y"]
        pol = (rays["ter"], rays["tei"], rays["tmr"], rays["tmi"])
        pa = _jones8(T["init_j"][:, None, 0], *pol)
        pb = _jones8(T["init_j"][:, None, 1], *pol)
        inv_cos0 = (1.0 / T["cos0"])[:, None]
        eff_a = _pw(pa) * T["init_s"][:, None, 0] * inv_cos0
        eff_b = _pw(pb) * T["init_s"][:, None, 1] * inv_cos0
        rng = trace_jnp.rng_ops.xorshift32_step(rays["rng"])
        u = (rng >> 8).astype(jnp.int32).astype(f32) * f32(1.0 / 16777216.0)
        a = u <= eff_a
        b = (~a) & (u <= eff_a + eff_b)
        pol_n = tuple(jnp.where(a, p1, p2) for p1, p2 in zip(pa, pb))
        inv = jax.lax.rsqrt(jnp.maximum(_pw(pol_n), 1e-30))
        dirs = jnp.where(a, DIR_IC, DIR_IC2)
        ph = _dir4(T["tir"], dirs)
        gap = _dir4(T["gaps"], dirs)
        ter, tei = pol_n[0] * inv, pol_n[1] * inv
        tmr, tmi = phase_mul(ph, pol_n[2] * inv, pol_n[3] * inv)
        x1, y1 = x + gap[..., 0], y + gap[..., 1]
        icin = in_ic(x1, y1)
        state = jnp.where(
            a, jnp.where(icin, 0, 2), jnp.where(b & icin, 1, DEAD)
        ).astype(jnp.int32)
        cos_th = jnp.where(a, T["ic_s"][:, None, 0], T["ic_s"][:, None, 1])
        live = state < DEAD
        return {
            "x": jnp.where(live, x1, x), "y": jnp.where(live, y1, y),
            "ter": jnp.where(live, ter, pol[0]),
            "tei": jnp.where(live, tei, pol[1]),
            "tmr": jnp.where(live, tmr, pol[2]),
            "tmi": jnp.where(live, tmi, pol[3]),
            "cos_th": cos_th, "gap_x": gap[..., 0], "gap_y": gap[..., 1],
            "state": state, "rng": rng,
            "dep": jnp.full_like(state, -1),
        }

    s_fc_iota = jnp.arange(num_fc)
    s_oc_iota = jnp.arange(num_oc)

    def bounce(T, rays):
        x, y = rays["x"], rays["y"]
        state = rays["state"]
        alive = state < DEAD
        n_alive = jnp.sum(alive.astype(jnp.int32))
        state = jnp.where(alive & ~_hp_inside(G["r1_hp"], x, y), DEAD, state)
        alive = state < DEAD

        grp_ic = alive & (state <= 1)
        grp_fc = alive & ((state == 2) | (state == 3))
        grp_oc = alive & (state >= 4)
        bit = (state & 1)[..., None] == 1  # (C, R, 1) for coefficient selects

        yrot = G["fc_rot"][0] * x + G["fc_rot"][1] * y
        in_hull = _hp_inside(G["hull_hp"], x, y)
        fc_strip = jnp.clip(
            jnp.floor((G["fc_top"] - yrot) / G["fc_width"]).astype(jnp.int32),
            0, num_fc - 1)
        b = G["oc_bounds"]
        in_rect = ((x >= b[0] - _EDGE_TOL) & (x <= b[1] + _EDGE_TOL)
                   & (y >= b[2] - _EDGE_TOL) & (y <= b[3] + _EDGE_TOL))
        yr = G["oc_rot_y"][0] * x + G["oc_rot_y"][1] * y
        oc_strip = jnp.clip(
            jnp.floor((G["oc_top"] - yr) / G["oc_width"]).astype(jnp.int32),
            0, num_oc - 1)
        hit_fc = grp_fc & in_hull
        hit_oc = grp_oc & in_rect
        interact = grp_ic | hit_fc | hit_oc

        pol = (rays["ter"], rays["tei"], rays["tmr"], rays["tmi"])

        # strip one-hot einsum: (C, R, S) x (C, S, P) -> (C, R, P)
        oh_fc = (fc_strip[..., None] == s_fc_iota).astype(f32)
        fc_p = jnp.einsum("crs,csp->crp", oh_fc, T["fc"],
                          preferred_element_type=f32)
        oh_oc = (oc_strip[..., None] == s_oc_iota).astype(f32)
        oc_p = jnp.einsum("crs,csp->crp", oh_oc, T["oc"],
                          preferred_element_type=f32)

        fc_ja = jnp.where(bit, fc_p[..., 16:24], fc_p[..., 0:8])
        fc_jb = jnp.where(bit, fc_p[..., 24:32], fc_p[..., 8:16])
        oc_ja = jnp.where(bit, oc_p[..., 24:32], oc_p[..., 0:8])
        oc_jb = jnp.where(bit, oc_p[..., 32:40], oc_p[..., 8:16])
        oc_jc = jnp.where(bit, oc_p[..., 40:48], oc_p[..., 16:24])
        ic_j = T["ic_j"][:, None]  # (C, 1, 2bit, 2br, 8)
        ic_ja = jnp.where(bit, ic_j[:, :, 1, 0], ic_j[:, :, 0, 0])
        ic_jb = jnp.where(bit, ic_j[:, :, 1, 1], ic_j[:, :, 0, 1])

        gfc = grp_fc[..., None]
        goc = grp_oc[..., None]
        j_a = jnp.where(goc, oc_ja, jnp.where(gfc, fc_ja, ic_ja))
        j_b = jnp.where(goc, oc_jb, jnp.where(gfc, fc_jb, ic_jb))
        s_a = jnp.where(grp_oc, oc_p[..., 48],
                        jnp.where(grp_fc, fc_p[..., 32], T["ic_s"][:, None, 0]))
        s_b = jnp.where(grp_oc, oc_p[..., 49],
                        jnp.where(grp_fc, fc_p[..., 33], T["ic_s"][:, None, 1]))

        pol_a = _jones8(j_a, *pol)
        pol_b = _jones8(j_b, *pol)
        pol_c = _jones8(oc_jc, *pol)
        inv_cos = 1.0 / rays["cos_th"]
        eff_a = _pw(pol_a) * s_a * inv_cos
        eff_b = _pw(pol_b) * s_b * inv_cos
        eff_c = _pw(pol_c) * T["oc_sout"][:, None] * inv_cos

        rng_new = trace_jnp.rng_ops.xorshift32_step(rays["rng"])
        u = (rng_new >> 8).astype(jnp.int32).astype(f32) * f32(1.0 / 16777216.0)
        rng = jnp.where(interact, rng_new, rays["rng"])
        br_a = interact & (u <= eff_a) & (eff_a > 0)
        br_b = interact & ~br_a & (u <= eff_a + eff_b) & (eff_b > 0)
        br_c = (hit_oc & ~br_a & ~br_b & (u <= eff_a + eff_b + eff_c)
                & (eff_c > 0))
        die = interact & ~(br_a | br_b | br_c)

        accept = br_a | br_b
        dir_a = jnp.where(grp_oc, DIR_FC, DIR_IC)
        dir_b = jnp.where(grp_ic, DIR_IC2, jnp.where(grp_fc, DIR_FC, DIR_OC))
        dirs = jnp.where(br_a, dir_a, dir_b)
        pol_n = tuple(jnp.where(br_a, p1, p2) for p1, p2 in zip(pol_a, pol_b))
        inv = jax.lax.rsqrt(jnp.maximum(_pw(pol_n), 1e-30))
        ph = _dir4(T["tir"], dirs)
        gap = _dir4(T["gaps"], dirs)
        ter_n, tei_n = pol_n[0] * inv, pol_n[1] * inv
        tmr_n, tmi_n = phase_mul(ph, pol_n[2] * inv, pol_n[3] * inv)
        cos_n = jnp.where(br_a, s_a, s_b)
        x_acc = x + gap[..., 0]
        y_acc = y + gap[..., 1]
        icin = in_ic(x_acc, y_acc)
        st_a = jnp.where(grp_oc, 4, jnp.where(grp_fc, 2, jnp.where(icin, 0, 2)))
        st_b = jnp.where(grp_oc, 5, jnp.where(grp_fc, 3,
                                              jnp.where(icin, 1, DEAD)))
        st_acc = jnp.where(br_a, st_a, st_b)

        er = T["ebr"][:, None]  # (C, 1, 4)
        in_quad = ((x >= er[..., 0] - _EDGE_TOL) & (x <= er[..., 1] + _EDGE_TOL)
                   & (y >= er[..., 2] - _EDGE_TOL) & (y <= er[..., 3] + _EDGE_TOL))
        ix = jnp.clip(jnp.floor((x - er[..., 0])
                                * (nx / (er[..., 1] - er[..., 0]))).astype(jnp.int32),
                      0, nx - 1)
        iy = jnp.clip(jnp.floor((y - er[..., 2])
                                * (ny / (er[..., 3] - er[..., 2]))).astype(jnp.int32),
                      0, ny - 1)
        dep = jnp.where(br_c & in_quad, iy * nx + ix, rays["dep"])

        miss_fc2 = grp_fc & ~in_hull & (state == 2)
        miss_fc3 = grp_fc & ~in_hull & (state == 3)
        in_r2 = _hp_inside(G["r2_hp"], x, y)
        fc3_to_oc = miss_fc3 & ~in_r2
        hop = miss_fc2 | (miss_fc3 & in_r2) | (grp_oc & ~in_rect & (state == 4))
        miss_oc5 = grp_oc & ~in_rect & (state == 5)
        hop_ph = jnp.where(miss_fc2[..., None], T["hop2"][:, None, 0],
                           T["hop2"][:, None, 1])
        hop_tmr, hop_tmi = phase_mul(hop_ph, rays["tmr"], rays["tmi"])

        new_state = jnp.where(
            accept, st_acc,
            jnp.where(br_c | die | miss_oc5, DEAD,
                      jnp.where(fc3_to_oc, 4, state))).astype(jnp.int32)
        out = {
            "x": jnp.where(accept, x_acc, jnp.where(hop, x + rays["gap_x"], x)),
            "y": jnp.where(accept, y_acc, jnp.where(hop, y + rays["gap_y"], y)),
            "ter": jnp.where(accept, ter_n, rays["ter"]),
            "tei": jnp.where(accept, tei_n, rays["tei"]),
            "tmr": jnp.where(accept, tmr_n,
                             jnp.where(hop, hop_tmr, rays["tmr"])),
            "tmi": jnp.where(accept, tmi_n,
                             jnp.where(hop, hop_tmi, rays["tmi"])),
            "cos_th": jnp.where(accept, cos_n, rays["cos_th"]),
            "gap_x": jnp.where(accept, gap[..., 0], rays["gap_x"]),
            "gap_y": jnp.where(accept, gap[..., 1], rays["gap_y"]),
            "state": new_state, "rng": rng, "dep": dep,
        }
        return out, n_alive

    @jax.jit
    def trace(T, rays):
        rays = init_step(T, rays)

        def cond(carry):
            rays, nb, it = carry
            return (it < cfg.max_bounces) & jnp.any(rays["state"] < DEAD)

        def body(carry):
            rays, nb, it = carry
            rays, n_alive = bounce(T, rays)
            return rays, nb + n_alive, it + 1

        rays, nb, _ = jax.lax.while_loop(
            cond, body, (rays, jnp.int32(0), jnp.int32(0)))
        return rays, nb

    return trace


def make_ray_blocks(batch: dict, n_cells: int, rays_per_cell: int) -> dict:
    """Host SoA batch (cell-major) -> (C, R) blocks for the cell-blocked engine."""
    te = np.asarray(batch["te"], np.complex128)
    tm = np.asarray(batch["tm"], np.complex128)
    shape = (n_cells, rays_per_cell)
    return {
        "x": jnp.asarray(np.asarray(batch["x"]).reshape(shape), jnp.float32),
        "y": jnp.asarray(np.asarray(batch["y"]).reshape(shape), jnp.float32),
        "ter": jnp.asarray(te.real.reshape(shape), jnp.float32),
        "tei": jnp.asarray(te.imag.reshape(shape), jnp.float32),
        "tmr": jnp.asarray(tm.real.reshape(shape), jnp.float32),
        "tmi": jnp.asarray(tm.imag.reshape(shape), jnp.float32),
        "rng": jnp.asarray(batch["rng"].reshape(shape)),
    }
