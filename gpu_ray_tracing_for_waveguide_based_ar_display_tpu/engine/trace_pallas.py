"""Pallas TPU megakernel: one grid step traces one FoV cell's rays to completion.

The production hot path.  The vectorized jnp engine (:mod:`.trace_jnp`) re-reads ray
state and gathers LUT rows from HBM every bounce and its single while_loop runs to
the *global* slowest ray; this kernel exploits the workload's key structure — a
ray's (wavelength, FoV) cell never changes — to specialize:

- grid over cells: each step's rays share one cell, so every LUT-derived quantity
  the step can touch is a handful of per-cell scalars, held in SMEM and consumed as
  scalar operands of VPU ops (zero gathers in the hot loop);
- ray state lives in VMEM registers across the entire bounce loop (no HBM traffic
  between bounces); Pallas double-buffers the next cell's blocks during compute;
- each cell's while_loop exits when *its own* rays are drained, so short-lived cells
  don't pay for the batch's slowest cell;
- strip-dependent Jones records are resolved by a 7/6-way one-hot accumulate of
  SMEM scalars (the strip index is 1-D band binning, :mod:`.trace_geometry`);
- phase-gating: the IC/FC/OC branch blocks are wrapped in ``lax.cond`` on "any ray
  currently in that phase", so early bounces skip the OC math and late bounces skip
  the IC/FC math (states advance monotonically 0/1 -> 2/3 -> 4/5).

Region containment uses half-planes simplified to <= 16 edges (see
``convex.simplify_to_max_edges``; boundary shift is bounded and statistically
invisible at 0.1 mm histogram resolution).  Deposits are written per ray (each ray
deposits at most once) and scattered into the histogram outside the kernel — no
atomics anywhere, bit-identical accumulation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TraceConfig
from ..design import convex
from ..luts.packing import CellTables
from .trace_geometry import TraceGeometry

MAX_EDGES = 24
LANES = 128

# ---- per-cell SMEM row layout (float32) -------------------------------------
_INIT_JA = 0          # 8: init Jones A (re/im interleaved row-major)
_INIT_JB = 8          # 8
_INIT_SA = 16
_INIT_SB = 17
_INIT_COS0 = 18
_OC_SOUT = 19
_GAPS = 20            # 8: (dx, dy) per direction 0..3
_TIR_PH = 28          # 8: (re, im) per direction
_HOP2_PH = 36         # 8
_EBR = 44             # 4: deposit rect (xmin, xmax, ymin, ymax)
_IC_BLK = 48          # 32: [bit][branch] Jones, 8 floats each
_IC_SA = 80
_IC_SB = 81
_FC_BLK = 96          # 7 strips x 36: JA_b0, JB_b0, JA_b1, JB_b1, s_a, s_b, pad2
_FC_STRIDE = 36
_OC_BLK = 352         # 6 strips x 56: JA/JB/JC per bit (48), s_a, s_b, pad6
_OC_STRIDE = 56
_EBT = 688            # 4: deposit rect pre-widened by _EDGE_TOL (persistent)
_EBS = 692            # 2: deposit bin scales nx/(x1-x0), ny/(y1-y0) (persistent)
_HOP2_ANG = 694       # 2: TIR hop phase angles 2*delta (dirs 0/1; transit jump)
PC = 704

# ---- geometry SMEM row layout ------------------------------------------------
_G_FC_ROT = 0         # 2
_G_FC_TOP = 2
_G_FC_INVW = 3
_G_OC_ROT = 4         # 2
_G_OC_TOP = 6
_G_OC_INVW = 7
_G_OC_B = 8           # 4: OC rect bounds
_G_IC = 12            # 3: cx, cy, r^2
_G_HULL = 16          # 3*MAX_EDGES: nx[24], ny[24], c+tol[24] (tol host-folded)
_G_R1 = 88
_G_R2 = 160
# negated thresholds -(c+tol) per region, for the packed-mode max-chain
# region test (fma-friendly: d = x*nx + (y*ny + mc), inside = max_e d <= 0)
_G_MC_HULL = 232      # MAX_EDGES each
_G_MC_R1 = 256
_G_MC_R2 = 280
_G_OC_BT = 304        # 4: OC rect bounds pre-widened by _EDGE_TOL
PG = 320

_EDGE_TOL = 1e-6


def _hp_pack(poly: np.ndarray) -> np.ndarray:
    """(3*MAX_EDGES,) packed nx/ny/c with always-true padding rows."""
    hp = convex.halfplanes(convex.simplify_to_max_edges(poly, MAX_EDGES))
    out = np.zeros(3 * MAX_EDGES)
    out[2 * MAX_EDGES :] = 1.0  # padding: 0*x + 0*y <= 1
    e = len(hp)
    out[:e] = hp[:, 0]
    out[MAX_EDGES : MAX_EDGES + e] = hp[:, 1]
    out[2 * MAX_EDGES : 2 * MAX_EDGES + e] = hp[:, 2]
    return out


def _flat_jones(j: np.ndarray) -> np.ndarray:
    """(..., 2, 2) complex -> (..., 8) float32 (re, im interleaved row-major)."""
    stacked = np.stack(
        [j[..., 0, 0].real, j[..., 0, 0].imag, j[..., 0, 1].real, j[..., 0, 1].imag,
         j[..., 1, 0].real, j[..., 1, 0].imag, j[..., 1, 1].real, j[..., 1, 1].imag],
        axis=-1,
    )
    return stacked.astype(np.float32)


def build_kernel_cell_params(tables: CellTables,
                             eyebox_range_mn: np.ndarray,
                             eyebox_bins: tuple = (80, 120)) -> np.ndarray:
    """(C, PC) float32 SMEM rows from the packed cell tables.

    ``eyebox_range_mn``: (M, N, 4) per-FoV deposit rects, tiled over wavelength in
    cid order (l major).

    ``eyebox_bins``: (ny, nx) deposit bin counts — MUST match the consuming
    ``TraceConfig.eyebox_bins`` (the persistent kernel reads the precomputed
    ``_EBT``/``_EBS`` slots derived from them; the default matches the
    reference's 80x120 grid and ``TraceConfig``'s default).  The slots are
    computed with the same f32 ops the kernel used to run per iteration
    (tol-widened rect, ``nx/(x1-x0)`` bin scales), so deposits are
    bitwise-unchanged.
    """
    C = tables.num_cells
    S_fc = tables.fc_jones.shape[1]
    S_oc = tables.oc_jones.shape[1]
    p = np.zeros((C, PC), dtype=np.float32)
    p[:, _INIT_JA:_INIT_JA + 8] = _flat_jones(tables.init_jones[0])
    p[:, _INIT_JB:_INIT_JB + 8] = _flat_jones(tables.init_jones[1])
    p[:, _INIT_SA] = tables.init_scale[0]
    p[:, _INIT_SB] = tables.init_scale[1]
    p[:, _INIT_COS0] = tables.init_cos0
    p[:, _OC_SOUT] = tables.oc_scale_out
    p[:, _GAPS:_GAPS + 8] = tables.gaps.reshape(C, 8)
    ph = tables.tir_phasor
    p[:, _TIR_PH:_TIR_PH + 8] = np.stack(
        [ph.real, ph.imag], axis=-1
    ).reshape(C, 8)
    h2 = tables.hop2_phasor
    p[:, _HOP2_PH:_HOP2_PH + 8] = np.stack(
        [h2.real, h2.imag], axis=-1
    ).reshape(C, 8)
    # hop phase *angles* for the transit-jump mode: a k-hop ballistic jump
    # multiplies the TM field by phasor^k = exp(i*k*ang); the kernel computes
    # cos/sin(k*ang) per jump, so it needs the wrapped angle, not the phasor.
    # Only hop directions 0 (pre-fold stay) and 1 (fold/OC) ever TIR-hop.
    p[:, _HOP2_ANG + 0] = np.angle(h2[:, 0])
    p[:, _HOP2_ANG + 1] = np.angle(h2[:, 1])
    # accepts (M, N, 4) (or anything reshapeable to (M*N, 4) — the original
    # single-design contract) or design-batched (D, M, N, 4) matching
    # tables.D; cid is l-major within each design's L*M*N-row run, so the
    # M*N rects tile over the wavelength axis per design (identical values
    # to the former single-design np.tile for D == 1)
    eb = np.asarray(eyebox_range_mn)
    ebd = (eb.reshape(eb.shape[0], -1, 4) if eb.ndim == 4
           else eb.reshape(1, -1, 4))
    ebr = np.tile(
        ebd[:, None], (1, tables.L, 1, 1)
    ).reshape(C, 4).astype(np.float32)
    p[:, _EBR:_EBR + 4] = ebr
    # precomputed deposit slots (persistent kernel): tol-widened rect + bin
    # scales, in f32 (bitwise-equal to the former in-kernel per-iteration ops)
    ny, nx = eyebox_bins
    tol = np.float32(_EDGE_TOL)
    p[:, _EBT + 0] = ebr[:, 0] - tol
    p[:, _EBT + 1] = ebr[:, 1] + tol
    p[:, _EBT + 2] = ebr[:, 2] - tol
    p[:, _EBT + 3] = ebr[:, 3] + tol
    p[:, _EBS + 0] = np.float32(nx) / (ebr[:, 1] - ebr[:, 0])
    p[:, _EBS + 1] = np.float32(ny) / (ebr[:, 3] - ebr[:, 2])
    for bit in range(2):
        for br in range(2):
            off = _IC_BLK + (bit * 2 + br) * 8
            p[:, off:off + 8] = _flat_jones(tables.ic_jones[br][bit])
    p[:, _IC_SA] = tables.ic_scale[0]
    p[:, _IC_SB] = tables.ic_scale[1]
    for s in range(S_fc):
        off = _FC_BLK + s * _FC_STRIDE
        p[:, off:off + 8] = _flat_jones(tables.fc_jones[0][s, 0])
        p[:, off + 8:off + 16] = _flat_jones(tables.fc_jones[1][s, 0])
        p[:, off + 16:off + 24] = _flat_jones(tables.fc_jones[0][s, 1])
        p[:, off + 24:off + 32] = _flat_jones(tables.fc_jones[1][s, 1])
        p[:, off + 32] = tables.fc_scale[0][s]
        p[:, off + 33] = tables.fc_scale[1][s]
    for s in range(S_oc):
        off = _OC_BLK + s * _OC_STRIDE
        for bit in range(2):
            for br in range(3):
                o2 = off + bit * 24 + br * 8
                p[:, o2:o2 + 8] = _flat_jones(tables.oc_jones[br][s, bit])
        p[:, off + 48] = tables.oc_scale[0][s]
        p[:, off + 49] = tables.oc_scale[1][s]
    return p


def build_kernel_geom(tgeom: TraceGeometry) -> np.ndarray:
    """(PG,) float32 geometry scalars."""
    g = np.zeros(PG, dtype=np.float64)
    g[_G_FC_ROT:_G_FC_ROT + 2] = tgeom.fc_rot
    g[_G_FC_TOP] = tgeom.fc_top
    g[_G_FC_INVW] = 1.0 / tgeom.fc_width
    g[_G_OC_ROT:_G_OC_ROT + 2] = tgeom.oc_rot_y
    g[_G_OC_TOP] = tgeom.oc_top
    g[_G_OC_INVW] = 1.0 / tgeom.oc_width
    g[_G_OC_B:_G_OC_B + 4] = tgeom.oc_bounds
    g[_G_IC] = tgeom.ic_center[0]
    g[_G_IC + 1] = tgeom.ic_center[1]
    g[_G_IC + 2] = tgeom.ic_radius ** 2
    # region half-planes (simplified to the edge budget)
    g[_G_HULL:_G_HULL + 3 * MAX_EDGES] = _hp_from_existing(tgeom.hull_hp)
    g[_G_R1:_G_R1 + 3 * MAX_EDGES] = _hp_from_existing(tgeom.r1_hp)
    g[_G_R2:_G_R2 + 3 * MAX_EDGES] = _hp_from_existing(tgeom.r2_hp)
    g32 = g.astype(np.float32)
    # fold the edge tolerance into the thresholds in f32 — the exact IEEE op
    # the kernels used to run per edge per iteration (`c + _EDGE_TOL` on
    # device), so region booleans are bitwise-unchanged while the per-edge
    # scalar-unit add disappears from the hot loop
    tol = np.float32(_EDGE_TOL)
    for base in (_G_HULL, _G_R1, _G_R2):
        g32[base + 2 * MAX_EDGES:base + 3 * MAX_EDGES] += tol
    # negated thresholds for the packed-mode max-chain form
    for base, mc in ((_G_HULL, _G_MC_HULL), (_G_R1, _G_MC_R1),
                     (_G_R2, _G_MC_R2)):
        g32[mc:mc + MAX_EDGES] = -g32[base + 2 * MAX_EDGES:
                                      base + 3 * MAX_EDGES]
    # OC rect bounds pre-widened by the tolerance (same f32 ops as in-kernel)
    g32[_G_OC_BT + 0] = g32[_G_OC_B + 0] - tol
    g32[_G_OC_BT + 1] = g32[_G_OC_B + 1] + tol
    g32[_G_OC_BT + 2] = g32[_G_OC_B + 2] - tol
    g32[_G_OC_BT + 3] = g32[_G_OC_B + 3] + tol
    return g32


def _hp_from_existing(hp: np.ndarray) -> np.ndarray:
    """Re-pack an (E, 3) half-plane array into the 3x16 scalar layout, simplifying
    by convex-hull re-derivation if the edge count exceeds the budget."""
    if len(hp) > MAX_EDGES:
        # reconstruct polygon vertices from half-plane intersections is overkill;
        # instead subsample edges evenly (conservative: region grows slightly)
        idx = np.linspace(0, len(hp) - 1, MAX_EDGES).astype(int)
        hp = hp[idx]
    out = np.zeros(3 * MAX_EDGES)
    out[2 * MAX_EDGES:] = 1.0
    e = len(hp)
    out[:e] = hp[:, 0]
    out[MAX_EDGES:MAX_EDGES + e] = hp[:, 1]
    out[2 * MAX_EDGES:2 * MAX_EDGES + e] = hp[:, 2]
    return out


def _region_test(g, base: int, x, y, n_edges: int = MAX_EDGES):
    """All-of half-plane containment with SMEM scalar coefficients.

    The packed thresholds already carry ``+ _EDGE_TOL`` (folded in f32 by
    :func:`build_kernel_geom`, bitwise-equal to the former in-kernel add).

    ``n_edges`` may be the region's *actual* edge count (the packed layout pads
    to MAX_EDGES with always-true rows, so truncating the loop is exact and
    saves ~10 tautology edges per region on the production design)."""
    inside = None
    for e in range(n_edges):
        nx = g(base + e)
        ny = g(base + MAX_EDGES + e)
        c = g(base + 2 * MAX_EDGES + e)
        t = x * nx + y * ny <= c
        inside = t if inside is None else (inside & t)
    return inside


def _region_test_max(g, base: int, mc_base: int, x, y,
                     n_edges: int = MAX_EDGES):
    """Max-chain half-plane containment: ``max_e(x*nx + (y*ny + mc_e)) <= 0``
    with ``mc_e = -(c_e + tol)`` packed by :func:`build_kernel_geom`.

    One fewer vector op per edge than the cmp+and chain (2 fma + max vs
    mul + fma + cmp + and).  The float compare happens once against the
    *accumulated maximum* instead of per-edge, so results can differ from
    :func:`_region_test` by one ulp of rounding for points within ~1e-13 of
    an edge — used only by the packed (bf16-parameter) production mode,
    whose physics is already within-MC-tolerance rather than bitwise."""
    m = None
    for e in range(n_edges):
        d = x * g(base + e) + (y * g(base + MAX_EDGES + e) + g(mc_base + e))
        m = d if m is None else jnp.maximum(m, d)
    return m <= 0.0


def _accum_params_unrolled(c, base: int, stride: int, count: int, width: int,
                           strip):
    """Unrolled one-hot accumulate (hoisted-scalar mode)."""
    outs = [jnp.zeros(strip.shape, dtype=jnp.float32) for _ in range(width)]
    for k in range(count):
        mk = (strip == k).astype(jnp.float32)
        for j in range(width):
            outs[j] = outs[j] + mk * c(base + k * stride + j)
    return outs


def _jones_scalar(c, off: int, ter, tei, tmr, tmi):
    """Jones matvec with the 8 SMEM scalars at ``off`` (re/im interleaved)."""
    ar, ai = c(off + 0), c(off + 1)
    br, bi = c(off + 2), c(off + 3)
    cr, ci = c(off + 4), c(off + 5)
    dr, di = c(off + 6), c(off + 7)
    o_ter = ar * ter - ai * tei + br * tmr - bi * tmi
    o_tei = ar * tei + ai * ter + br * tmi + bi * tmr
    o_tmr = cr * ter - ci * tei + dr * tmr - di * tmi
    o_tmi = cr * tei + ci * ter + dr * tmi + di * tmr
    return o_ter, o_tei, o_tmr, o_tmi


def _bitsel(c, off0: int, off1: int, bitmask):
    """Per-ray select between two SMEM scalars by the state bit."""
    return jnp.where(bitmask, c(off1), c(off0))


def _accum_params(c, base: int, stride: int, count: int, width: int, strip,
                  mode: str = "fma"):
    """Per-lane strip-parameter selection: out[j][lane] = p[strip[lane], j].

    Two lowerings, bit-identical in result (each lane takes exactly one
    strip's value either way):

    - ``fma``: one-hot multiply-accumulate, out[j] = sum_k (strip==k)*p[k,j].
      Nominally 2 vector ops per (k, j) but the scalar-broadcast
      multiply-accumulate fuses on the VPU — measured ~17% faster end-to-end
      than the select chain on v5e.
    - ``select``: boolean vselect chain seeded with strip 0's broadcast.
      Half the nominal op count, but each step needs a scalar splat + select
      that do not fuse; kept for A/B measurement.
    """
    if mode == "select":
        zero = jnp.zeros_like(strip, dtype=jnp.float32)
        outs = [zero + c(base + j) for j in range(width)]
        for k in range(1, count):
            mk = strip == k
            for j in range(width):
                outs[j] = jnp.where(mk, c(base + k * stride + j), outs[j])
        return outs
    outs = [jnp.zeros_like(strip, dtype=jnp.float32) for _ in range(width)]
    for k in range(count):
        mk = (strip == k).astype(jnp.float32)
        for j in range(width):
            outs[j] = outs[j] + mk * c(base + k * stride + j)
    return outs


def _jones_vec(p, o: int, ter, tei, tmr, tmi):
    """Jones matvec with vector (per-ray) coefficients p[o..o+8]."""
    ar, ai, br, bi, cr, ci, dr, di = (p[o + j] for j in range(8))
    o_ter = ar * ter - ai * tei + br * tmr - bi * tmi
    o_tei = ar * tei + ai * ter + br * tmi + bi * tmr
    o_tmr = cr * ter - ci * tei + dr * tmr - di * tmi
    o_tmi = cr * tei + ci * ter + dr * tmi + di * tmr
    return o_ter, o_tei, o_tmr, o_tmi


# the kernels share the one xorshift32 definition with the host/jnp paths
# (ops.rng) — a single source for the documented bitwise RNG-parity contract
from ..ops.rng import xorshift32_step as _xorshift  # noqa: E402


def _draw24(s_new):
    """Top-24-bit U[0,1) draw from a post-step xorshift state (exact in f32;
    the TPU backend lacks uint32->f32 casts — see ops.rng.draw_uniform)."""
    return ((s_new >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / 16777216.0))


def make_pallas_trace_fn(cfg: TraceConfig, num_fc: int, num_oc: int,
                         rays_tile_rows: int, interpret: bool = False,
                         phase_gating: bool = True, mode: str = "full",
                         hoist_params: bool = False, cond_interval: int = 8):
    """Build the jitted cell-grid tracer.

    mode='full':   ``trace(cell_params, geom_row, rays_in, rng_in)`` with
                   rays_in (C, 6, RT, 128) fields (x, y, ter, tei, tmr, tmi) —
                   runs the first-IC init then the bounce loop.
    mode='resume': ``trace(cell_params, geom_row, rays_in, state_in, rng_in)``
                   with rays_in (C, 9, RT, 128) adding (cos_th, gap_x, gap_y) —
                   continues already-initialized rays (segmented scheduling).

    Both return ``(dep, bounces, rays_out, state_out, rng_out)`` where rays_out is
    the 9-field state block, enabling compaction between segments.
    """
    RT = rays_tile_rows
    ny, nx = cfg.eyebox_bins
    max_bounces = cfg.max_bounces
    resume = mode == "resume"

    def kernel(*refs):
        if resume:
            (g_ref, c_ref, rays_ref, st_ref, rng_ref,
             dep_ref, nb_ref, ro_ref, so_ref, rgo_ref) = refs
        else:
            (g_ref, c_ref, rays_ref, rng_ref,
             dep_ref, nb_ref, ro_ref, so_ref, rgo_ref) = refs

        if hoist_params:
            # load every scalar once, before the loop; the loop body then contains
            # only vector ops (big Mosaic program, but no per-iteration SMEM loads)
            g_vals = [g_ref[0, j] for j in range(PG)]
            c_vals = [c_ref[0, 0, j] for j in range(PC)]

            def g(j):
                return g_vals[j]

            def c(j):
                return c_vals[j]

            # _region_test is source-identical at full MAX_EDGES whether g
            # reads SMEM or a hoisted list (the accessor is a callable)
            region_test = _region_test
            accum_params = _accum_params_unrolled
        else:
            def g(j):
                return g_ref[0, j]

            def c(j):
                return c_ref[0, 0, j]

            region_test = _region_test
            accum_params = _accum_params

        x = rays_ref[0, 0]
        y = rays_ref[0, 1]
        ter = rays_ref[0, 2]
        tei = rays_ref[0, 3]
        tmr = rays_ref[0, 4]
        tmi = rays_ref[0, 5]
        rng = rng_ref[0]

        f32 = jnp.float32

        def phase_mul(phr, phi_, re, im):
            return phr * re - phi_ * im, phr * im + phi_ * re

        def in_ic(px, py):
            dx = px - g(_G_IC)
            dy = py - g(_G_IC + 1)
            return dx * dx + dy * dy <= g(_G_IC + 2)

        # ---------- init: first IC interaction from air ----------
        if resume:
            cos_th = rays_ref[0, 6]
            gx0 = rays_ref[0, 7]
            gy0 = rays_ref[0, 8]
            state = st_ref[0]
            dep = jnp.full_like(state, -1)
            carry = (x, y, ter, tei, tmr, tmi, cos_th, gx0, gy0, state,
                     rng, dep, jnp.int32(0), jnp.int32(0))
            run_init = False
        else:
            run_init = True
        if run_init:
            pa = _jones_scalar(c, _INIT_JA, ter, tei, tmr, tmi)
            pb = _jones_scalar(c, _INIT_JB, ter, tei, tmr, tmi)
            pw_a = pa[0] ** 2 + pa[1] ** 2 + pa[2] ** 2 + pa[3] ** 2
            pw_b = pb[0] ** 2 + pb[1] ** 2 + pb[2] ** 2 + pb[3] ** 2
            inv_cos0 = 1.0 / c(_INIT_COS0)
            eff_a = pw_a * c(_INIT_SA) * inv_cos0
            eff_b = pw_b * c(_INIT_SB) * inv_cos0
            rng = _xorshift(rng)
            u = _draw24(rng)
            a = u <= eff_a
            b = (~a) & (u <= eff_a + eff_b)
            ter1 = jnp.where(a, pa[0], pb[0])
            tei1 = jnp.where(a, pa[1], pb[1])
            tmr1 = jnp.where(a, pa[2], pb[2])
            tmi1 = jnp.where(a, pa[3], pb[3])
            pw = ter1 * ter1 + tei1 * tei1 + tmr1 * tmr1 + tmi1 * tmi1
            inv = jax.lax.rsqrt(jnp.maximum(pw, 1e-30))
            # dir 0 (accept A) or dir 2 (accept B)
            phr = jnp.where(a, c(_TIR_PH + 0), c(_TIR_PH + 4))
            phi_ = jnp.where(a, c(_TIR_PH + 1), c(_TIR_PH + 5))
            ter1, tei1 = ter1 * inv, tei1 * inv
            tmr1, tmi1 = phase_mul(phr, phi_, tmr1 * inv, tmi1 * inv)
            gx = jnp.where(a, c(_GAPS + 0), c(_GAPS + 4))
            gy = jnp.where(a, c(_GAPS + 1), c(_GAPS + 5))
            x1 = x + gx
            y1 = y + gy
            icin = in_ic(x1, y1)
            state = jnp.where(
                a, jnp.where(icin, 0, 2), jnp.where(b & icin, 1, 6)
            ).astype(jnp.int32)
            cos_th = jnp.where(a, c(_IC_SA), c(_IC_SB))
            live0 = state < 6
            x = jnp.where(live0, x1, x)
            y = jnp.where(live0, y1, y)
            ter, tei = jnp.where(live0, ter1, ter), jnp.where(live0, tei1, tei)
            tmr, tmi = jnp.where(live0, tmr1, tmr), jnp.where(live0, tmi1, tmi)
            dep = jnp.full_like(state, -1)
            init_gx = jnp.where(live0, gx, jnp.zeros_like(x))
            init_gy = jnp.where(live0, gy, jnp.zeros_like(x))
            carry = (x, y, ter, tei, tmr, tmi, cos_th, init_gx, init_gy, state,
                     rng, dep, jnp.int32(0), jnp.int32(0))

        # ---------- bounce loop ----------
        def cond(carry):
            (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng, dep,
             nb, it) = carry
            return (it < max_bounces) & (jnp.sum((state < 6).astype(jnp.int32)) > 0)

        def body(carry):
            (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng, dep,
             nb, it) = carry
            alive = state < 6
            nb = nb + jnp.sum(alive.astype(jnp.int32))
            in_r1 = region_test(g, _G_R1, x, y)
            state = jnp.where(alive & ~in_r1, 6, state)
            alive = state < 6

            grp_ic = alive & (state <= 1)
            grp_fc = alive & ((state == 2) | (state == 3))
            grp_oc = alive & (state >= 4)
            bit = (state & 1) == 1

            # membership + strip indices
            yrot = g(_G_FC_ROT) * x + g(_G_FC_ROT + 1) * y
            in_hull = region_test(g, _G_HULL, x, y)
            fc_strip = jnp.clip(
                jnp.floor(
                    (g(_G_FC_TOP) - yrot) * g(_G_FC_INVW)
                ).astype(jnp.int32),
                0, num_fc - 1,
            )
            yr = g(_G_OC_ROT) * x + g(_G_OC_ROT + 1) * y
            # bounds pre-widened by _EDGE_TOL on host (same f32 ops; bitwise)
            in_rect = (
                (x >= g(_G_OC_BT))
                & (x <= g(_G_OC_BT + 1))
                & (y >= g(_G_OC_BT + 2))
                & (y <= g(_G_OC_BT + 3))
            )
            oc_strip = jnp.clip(
                jnp.floor(
                    (g(_G_OC_TOP) - yr) * g(_G_OC_INVW)
                ).astype(jnp.int32),
                0, num_oc - 1,
            )
            hit_fc = grp_fc & in_hull
            hit_oc = grp_oc & in_rect
            interact = grp_ic | hit_fc | hit_oc

            zero = jnp.zeros_like(x)

            # ---- IC site (scalar params, bit-selected)
            def ic_block(_):
                ja = [_bitsel(c, _IC_BLK + j, _IC_BLK + 16 + j, bit)
                      for j in range(8)]
                jb = [_bitsel(c, _IC_BLK + 8 + j, _IC_BLK + 24 + j, bit)
                      for j in range(8)]
                pa = _jones_vec(ja, 0, ter, tei, tmr, tmi)
                pb = _jones_vec(jb, 0, ter, tei, tmr, tmi)
                # materialize via add (broadcast_to of a traced scalar produces a
                # null-layout operand Mosaic rejects inside lax.cond)
                zv = jnp.zeros_like(x)
                return (*pa, *pb, zv + c(_IC_SA), zv + c(_IC_SB))

            # ---- FC site (strip one-hot accumulate)
            def fc_block(_):
                p = accum_params(c, _FC_BLK, _FC_STRIDE, num_fc, 34, fc_strip)
                ja = [jnp.where(bit, p[16 + j], p[j]) for j in range(8)]
                jb = [jnp.where(bit, p[24 + j], p[8 + j]) for j in range(8)]
                pa = _jones_vec(ja, 0, ter, tei, tmr, tmi)
                pb = _jones_vec(jb, 0, ter, tei, tmr, tmi)
                return (*pa, *pb, p[32], p[33])

            # ---- OC site
            def oc_block(_):
                p = accum_params(c, _OC_BLK, _OC_STRIDE, num_oc, 50, oc_strip)
                ja = [jnp.where(bit, p[24 + j], p[j]) for j in range(8)]
                jb = [jnp.where(bit, p[32 + j], p[8 + j]) for j in range(8)]
                jc = [jnp.where(bit, p[40 + j], p[16 + j]) for j in range(8)]
                pa = _jones_vec(ja, 0, ter, tei, tmr, tmi)
                pb = _jones_vec(jb, 0, ter, tei, tmr, tmi)
                pc = _jones_vec(jc, 0, ter, tei, tmr, tmi)
                return (*pa, *pb, *pc, p[48], p[49])

            if phase_gating:
                zeros10 = (zero,) * 10
                ic_out = jax.lax.cond(jnp.any(grp_ic), ic_block,
                                      lambda _: zeros10, None)
                fc_out = jax.lax.cond(jnp.any(hit_fc), fc_block,
                                      lambda _: zeros10, None)
                zeros14 = (zero,) * 14
                oc_out = jax.lax.cond(jnp.any(hit_oc), oc_block,
                                      lambda _: zeros14, None)
            else:
                ic_out = ic_block(None)
                fc_out = fc_block(None)
                oc_out = oc_block(None)

            gfc = grp_fc
            goc = grp_oc

            def sel3(i_ic, i_fc, i_oc):
                return jnp.where(goc, i_oc, jnp.where(gfc, i_fc, i_ic))

            pol_a = tuple(sel3(ic_out[j], fc_out[j], oc_out[j]) for j in range(4))
            pol_b = tuple(sel3(ic_out[4 + j], fc_out[4 + j], oc_out[4 + j])
                          for j in range(4))
            pol_c = tuple(oc_out[8 + j] for j in range(4))
            s_a = sel3(ic_out[8], fc_out[8], oc_out[12])
            s_b = sel3(ic_out[9], fc_out[9], oc_out[13])
            s_c = c(_OC_SOUT)

            inv_cos = 1.0 / cos_th
            eff_a = (pol_a[0] ** 2 + pol_a[1] ** 2 + pol_a[2] ** 2
                     + pol_a[3] ** 2) * s_a * inv_cos
            eff_b = (pol_b[0] ** 2 + pol_b[1] ** 2 + pol_b[2] ** 2
                     + pol_b[3] ** 2) * s_b * inv_cos
            eff_c = (pol_c[0] ** 2 + pol_c[1] ** 2 + pol_c[2] ** 2
                     + pol_c[3] ** 2) * s_c * inv_cos

            rng_new = _xorshift(rng)
            u = _draw24(rng_new)
            rng = jnp.where(interact, rng_new, rng)
            br_a = interact & (u <= eff_a) & (eff_a > 0)
            br_b = interact & ~br_a & (u <= eff_a + eff_b) & (eff_b > 0)
            br_c = (hit_oc & ~br_a & ~br_b
                    & (u <= eff_a + eff_b + eff_c) & (eff_c > 0))
            die = interact & ~(br_a | br_b | br_c)

            accept = br_a | br_b
            # direction index per accepted branch:
            # A: oc->1 else 0 ; B: ic->2, fc->1, oc->3
            dir_a = jnp.where(goc, 1, 0)
            dir_b = jnp.where(goc, 3, jnp.where(gfc, 1, 2))
            dirs = jnp.where(br_a, dir_a, dir_b)

            ter_n = jnp.where(br_a, pol_a[0], pol_b[0])
            tei_n = jnp.where(br_a, pol_a[1], pol_b[1])
            tmr_n = jnp.where(br_a, pol_a[2], pol_b[2])
            tmi_n = jnp.where(br_a, pol_a[3], pol_b[3])
            pw = ter_n ** 2 + tei_n ** 2 + tmr_n ** 2 + tmi_n ** 2
            inv = jax.lax.rsqrt(jnp.maximum(pw, 1e-30))

            def dir_gather(base, stride=2):
                v0 = c(base + 0)
                v1 = c(base + stride)
                v2 = c(base + 2 * stride)
                v3 = c(base + 3 * stride)
                return jnp.where(
                    dirs == 0, v0,
                    jnp.where(dirs == 1, v1, jnp.where(dirs == 2, v2, v3)),
                )

            phr = dir_gather(_TIR_PH)
            phi_ = dir_gather(_TIR_PH + 1)
            ter_n, tei_n = ter_n * inv, tei_n * inv
            tmr_n, tmi_n = phase_mul(phr, phi_, tmr_n * inv, tmi_n * inv)
            cos_n = jnp.where(br_a, s_a, s_b)
            gx_n = dir_gather(_GAPS)
            gy_n = dir_gather(_GAPS + 1)
            x_acc = x + gx_n
            y_acc = y + gy_n
            icin = in_ic(x_acc, y_acc)
            st_a = jnp.where(goc, 4, jnp.where(gfc, 2, jnp.where(icin, 0, 2)))
            st_b = jnp.where(goc, 5, jnp.where(gfc, 3, jnp.where(icin, 1, 6)))
            st_acc = jnp.where(br_a, st_a, st_b)

            # deposit (branch C) — bounds pre-widened and bin scales
            # precomputed host-side by build_kernel_cell_params (_EBT/_EBS;
            # same f32 ops as the former in-loop math, bitwise deposits)
            in_quad = ((x >= c(_EBT)) & (x <= c(_EBT + 1))
                       & (y >= c(_EBT + 2)) & (y <= c(_EBT + 3)))
            ix = jnp.clip(
                jnp.floor((x - c(_EBR)) * c(_EBS)).astype(jnp.int32),
                0, nx - 1,
            )
            iy = jnp.clip(
                jnp.floor((y - c(_EBR + 2)) * c(_EBS + 1)).astype(jnp.int32),
                0, ny - 1,
            )
            dep = jnp.where(br_c & in_quad, iy * nx + ix, dep)

            # misses
            miss_fc2 = grp_fc & ~in_hull & (state == 2)
            miss_fc3 = grp_fc & ~in_hull & (state == 3)
            in_r2 = region_test(g, _G_R2, x, y)
            fc3_to_oc = miss_fc3 & ~in_r2
            hop = miss_fc2 | (miss_fc3 & in_r2) | (grp_oc & ~in_rect & (state == 4))
            miss_oc5 = grp_oc & ~in_rect & (state == 5)
            h_phr = jnp.where(miss_fc2, c(_HOP2_PH + 0),
                              c(_HOP2_PH + 2))
            h_phi = jnp.where(miss_fc2, c(_HOP2_PH + 1),
                              c(_HOP2_PH + 3))
            hop_tmr, hop_tmi = phase_mul(h_phr, h_phi, tmr, tmi)

            state = jnp.where(
                accept, st_acc,
                jnp.where(br_c | die | miss_oc5, 6,
                          jnp.where(fc3_to_oc, 4, state)),
            ).astype(jnp.int32)
            x = jnp.where(accept, x_acc, jnp.where(hop, x + gx, x))
            y = jnp.where(accept, y_acc, jnp.where(hop, y + gy, y))
            ter = jnp.where(accept, ter_n, ter)
            tei = jnp.where(accept, tei_n, tei)
            tmr = jnp.where(accept, tmr_n, jnp.where(hop, hop_tmr, tmr))
            tmi = jnp.where(accept, tmi_n, jnp.where(hop, hop_tmi, tmi))
            cos_th = jnp.where(accept, cos_n, cos_th)
            gx = jnp.where(accept, gx_n, gx)
            gy = jnp.where(accept, gy_n, gy)
            return (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng, dep,
                    nb, it + 1)

        # Evaluate the while condition only every ``cond_interval`` iterations:
        # the any-alive reduce forces a vector->scalar sync that dominates the
        # per-iteration cost on this hardware; extra masked iterations on dead
        # rays are no-ops.  When the budget is not a multiple of the interval,
        # the final chunk is shortened (dynamic trip count) so no ray ever
        # executes past ``max_bounces`` — matching the jnp engine exactly.
        if max_bounces % cond_interval == 0:
            def chunk(carry):
                return jax.lax.fori_loop(
                    0, cond_interval, lambda _, cc: body(cc), carry)
        else:
            def chunk(carry):
                n = jnp.minimum(jnp.int32(cond_interval),
                                jnp.int32(max_bounces) - carry[13])
                return jax.lax.fori_loop(
                    0, n, lambda _, cc: body(cc), carry)

        carry = jax.lax.while_loop(cond, chunk, carry)
        dep_ref[0] = carry[11]
        nb_ref[0, 0, 0] = carry[12]
        nb_ref[0, 0, 1] = carry[13]   # iterations executed (diagnostics)
        for fi in range(9):
            ro_ref[0, fi] = carry[fi]
        so_ref[0] = carry[9]
        rgo_ref[0] = carry[10]

    nf_in = 9 if resume else 6

    @jax.jit
    def trace(cell_params, geom_row, rays_in, *rest):
        C = cell_params.shape[0]
        out_shapes = (
            jax.ShapeDtypeStruct((C, RT, LANES), jnp.int32),
            jax.ShapeDtypeStruct((C, 1, 2), jnp.int32),
            jax.ShapeDtypeStruct((C, 9, RT, LANES), jnp.float32),
            jax.ShapeDtypeStruct((C, RT, LANES), jnp.int32),
            jax.ShapeDtypeStruct((C, RT, LANES), jnp.uint32),
        )
        in_specs = [
            pl.BlockSpec((1, PG), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, PC), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nf_in, RT, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if resume:
            in_specs.append(
                pl.BlockSpec((1, RT, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((1, RT, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        dep, nb, rays_out, st_out, rng_out = pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, RT, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 9, RT, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RT, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RT, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(geom_row, cell_params[:, None, :], rays_in, *rest)
        return dep, nb.reshape(C, 2), rays_out, st_out, rng_out

    return trace


def pack_ray_blocks(batch: dict, n_cells: int, rays_per_cell: int,
                    rt: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host SoA batch (cell-major contiguous) -> kernel blocks.

    Padding rays carry zero amplitude so they terminate at init.
    Returns rays_in (C, 6, RT, 128) f32 and rng_in (C, RT, 128) uint32.
    """
    rp = rt * LANES
    C = n_cells
    te = np.asarray(batch["te"], np.complex128)
    tm = np.asarray(batch["tm"], np.complex128)
    fields = [batch["x"], batch["y"], te.real, te.imag, tm.real, tm.imag]
    rays_in = np.zeros((C, 6, rp), dtype=np.float32)
    for fi, f in enumerate(fields):
        rays_in[:, fi, :rays_per_cell] = np.asarray(
            f, np.float64
        ).reshape(C, rays_per_cell)
    rng_in = np.zeros((C, rp), dtype=np.uint32)
    rng_in[:, :rays_per_cell] = batch["rng"].reshape(C, rays_per_cell)
    rng_in[:, rays_per_cell:] = 1  # nonzero state; zero-amplitude rays die at init
    return (
        rays_in.reshape(C, 6, rt, LANES),
        rng_in.reshape(C, rt, LANES),
    )


def deposits_to_histogram_cells(
    dep: jnp.ndarray, cell_ids: np.ndarray, L: int, M: int, N: int,
    ny: int, nx: int
) -> jnp.ndarray:
    """(C, RT, 128) terminal deposits -> (L, N, M, ny, nx) histogram."""
    C = dep.shape[0]
    dep_flat = dep.reshape(C, -1)
    cid = jnp.asarray(cell_ids, jnp.int32)
    l = cid // (M * N)
    mn = cid % (M * N)
    m = mn // N
    n = mn % N
    base = (((l * N + n) * M + m) * (ny * nx))[:, None]
    has = dep_flat >= 0
    flat = base + jnp.maximum(dep_flat, 0)
    hist = jnp.zeros(L * N * M * ny * nx, jnp.float32)
    hist = hist.at[flat.reshape(-1)].add(has.reshape(-1).astype(jnp.float32))
    return hist.reshape(L, N, M, ny, nx)
