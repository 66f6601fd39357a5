"""Persistent-slot Pallas kernel: dead slots respawn fresh rays in place.

The monolithic per-cell kernel (:mod:`.trace_pallas`) wastes lanes: the mean ray
dies after ~9 bounces but its lane idles until the cell's slowest ray (~130
iterations) finishes — a few percent utilization.  Instead of compacting (argsort
overhead, host scheduling), this kernel keeps every lane busy with the classic
persistent-threads pattern:

- each slot carries a *generation* counter; on death (and while generations
  remain) the slot immediately re-enters the init state with its original pupil
  position and polarization and its **continued** per-slot RNG stream — exactly the
  reference's ``num_iter`` re-launch semantics (gpu_ray_tracing_pro_fullColor.py:169,
  same rays re-traced with persistent ``rng_states``), interleaved instead of
  sequential;
- deposits accumulate into a per-cell VMEM histogram tile inside the kernel via a
  one-hot matmul on the MXU (bin-row one-hot x bin-col one-hot, exact 0/1 bf16
  inputs with f32 accumulation) — no per-ray terminal outputs, no XLA scatter
  afterwards, and no serial per-deposit work;
- lane utilization stays near 100% until the last generation's tail.

The per-cell histograms are disjoint (cells own their (lambda, FoV) slice), so the
output assembles into the eyebox histogram by reshape alone — still no atomics.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TraceConfig
from .trace_pallas import (
    LANES, PC, PG,
    _EBR, _EBS, _EBT,
    _FC_BLK, _FC_STRIDE, _GAPS, _G_FC_INVW, _G_FC_ROT, _G_FC_TOP,
    _G_IC, _G_MC_HULL, _G_MC_R1, _G_MC_R2, _G_OC_B, _G_OC_BT, _G_OC_INVW,
    _G_OC_ROT, _G_OC_TOP, _G_HULL, _G_R1, _G_R2,
    _HOP2_ANG, _HOP2_PH, _IC_BLK, _IC_SA, _IC_SB, _INIT_COS0, _INIT_JA,
    _INIT_JB, _INIT_SA, _INIT_SB, _OC_BLK, _OC_SOUT, _OC_STRIDE, _TIR_PH,
    _draw24, _jones_scalar, _jones_vec, _region_test, _region_test_max,
    _xorshift,
)

NY_PAD = 128   # eyebox x bins padded to the lane width
_FLUSH_W = 32  # deposit-buffer flush period (iterations; power of two)
_SEL_W = 50    # selection record: 34 shared params + 16 OC-only (q) params
_SEL_NW = _SEL_W // 2  # packed two-per-word


def selection_row_offsets(num_fc: int, num_oc: int):
    """The unified site-selection rows: (kind, 34 p-offsets, 16 q-offsets).

    One row per exclusive interaction site — IC, each FC strip, each OC
    strip — listing where in the flat cell-parameter vector that site's
    [A0 B0 A1 B1 s_a s_b] record (+ the OC-only branch-C Jones, ``q``) lives.
    Single source of truth for the in-kernel one-hot selection AND the
    host-side packed-table builder (:func:`pack_selection_params`).
    """
    rows = [("ic", [_IC_BLK + j for j in range(32)] + [_IC_SA, _IC_SB], None)]
    for k in range(num_fc):
        base = _FC_BLK + k * _FC_STRIDE
        rows.append(("fc", [base + j for j in range(34)], None))
    for k in range(num_oc):
        base = _OC_BLK + k * _OC_STRIDE
        rows.append((
            "oc",
            [base + j for j in range(8)]
            + [base + 8 + j for j in range(8)]
            + [base + 24 + j for j in range(8)]
            + [base + 32 + j for j in range(8)]
            + [base + 48, base + 49],
            [base + 16 + j for j in range(8)] + [base + 40 + j for j in range(8)],
        ))
    return rows


def pack_selection_params(cell_params: np.ndarray, num_fc: int,
                          num_oc: int) -> np.ndarray:
    """Pack the selection records as bf16 pairs: (C, rows x 25) int32.

    Word ``w`` of a row holds param ``2w`` in bits 0-15 and param ``2w+1`` in
    bits 16-31, both rounded to bf16 (round-to-nearest-even).  The kernel's
    ``accum_mode="packed"`` selects whole words with one-hot ``where`` chains
    (half the scalar loads / vector ops of the f32 FMA selection) and unpacks
    by shift + same-width bitcast — the alternative reduced-precision
    lowering named in STATUS r2 (the direct bf16 vector path faults the axon
    Mosaic toolchain).  Precision cost: the parameters themselves round to
    bf16 (~0.4% relative), equivalent to tabulating the RCWA LUT in bf16.
    """
    import ml_dtypes

    rows = selection_row_offsets(num_fc, num_oc)
    C = cell_params.shape[0]
    vals = np.zeros((C, len(rows), _SEL_W), np.float32)
    for r, (_, offs, qoffs) in enumerate(rows):
        vals[:, r, :34] = cell_params[:, offs]
        if qoffs is not None:
            vals[:, r, 34:] = cell_params[:, qoffs]
    bf = vals.astype(ml_dtypes.bfloat16)
    # adjacent bf16 pairs ARE the packed little-endian word (param 2w in bits
    # 0-15, 2w+1 in 16-31), so the pack is a zero-copy uint32 view — the
    # former strided 0::2/1::2 gathers were ~20x slower on chunk-sized inputs
    words = bf.view(np.uint32).view(np.int32)
    return np.ascontiguousarray(words.reshape(C, len(rows) * _SEL_NW))


def make_persistent_trace_fn(cfg: TraceConfig, num_fc: int, num_oc: int,
                             rays_tile_rows: int, gens: int,
                             interpret: bool = False,
                             phase_gating: bool = True,
                             max_iters: int = 0, cond_interval: int = 8,
                             edge_counts=None, accum_mode: str = "fma",
                             flush_w: int = _FLUSH_W,
                             count_spawn: bool = False,
                             body_unroll: int = 0,
                             cells_per_block: int = 1,
                             transit_jump: bool = False,
                             jump_phase: str = "cos"):
    """Build ``trace(cell_params, geom_row, rays_in, rng_in[, ctrl]) -> (hist, nb)``.

    - rays_in: (C, 6, RT, 128) initial fields (x, y, ter, tei, tmr, tmi); these are
      also the respawn values for every generation.
    - hist: (C, ny, 128) float32 per-cell eyebox tiles (x-bins padded to 128).
    - nb: (C, 4) int32 [bounces, iterations, rays spawned, deposit-buffer
      overflows (always 0; diagnostic)] per cell.
    - ctrl: optional (2,) int32 runtime knobs ``[gens, spawn_iters]`` (defaults to
      ``[gens, 0]``).  A dead slot respawns while ``gen < gens`` OR the iteration
      counter is ``< spawn_iters``.  ``spawn_iters > 0`` is *saturating spawn*
      mode: lanes keep launching fresh generations at ~full utilization until the
      iteration budget, then the block drains; the per-cell sample count becomes
      data-dependent (reported in nb[:, 2]) and the caller renormalizes the
      histogram by nominal/actual.  Stopping depends only on *past* lifetimes, so
      by Wald's identity the renormalized histogram stays an unbiased estimator
      (ratio-estimator bias is O(1/spawns), far below Monte-Carlo noise).
    - total nominal samples per cell in gens mode = live_slots x ``gens``.

    Both knobs are runtime scalars: one compiled kernel serves every
    (gens, spawn_iters) setting for a given RT.

    ``cells_per_block > 1`` packs that many *cells* into one kernel block as
    sublane row-groups of ``H = RT // cells_per_block`` rows each (packed
    accum mode only).  Per-cell scalars load per row-group and the
    cell-dependent sub-computations run on (H, 128) slices, concatenated back
    to full width for the shared vector math — so the block keeps the wide-RT
    kernel rate while each cell pays only an H-row drain tail.  This attacks
    the utilization ceiling of tail-bound workloads (the reference default
    workload runs ~63% lane utilization at 2048 single-cell slots: the
    per-cell spawn quota runs out and lanes idle while the longest residual
    ray finishes).  Physics per lane is bitwise-identical to the same cell
    traced in its own ``RT/cpb``-row block with the same rng rows (asserted
    in test_persistent); only the iteration diagnostic differs (a block runs
    to the max over its cells).  Requirements: ``RT % cpb == 0``, per-cell
    row count ``H`` a multiple of 8 (f32 sublane alignment on TPU), and cells
    of one block must belong to the same design.

    ``count_spawn=True`` compiles the *count-based* spawn variant: ``ctrl[0]``
    is reinterpreted as the per-cell spawn **target** (total rays, summed over
    all lanes) instead of a per-slot generation quota.  Every dead lane
    respawns while the cell's running spawn count is below the target (or
    ``it < ctrl[1]``), so the lanes share the sample budget evenly — the cell's
    wall time becomes (target x mean-lifetime / lanes) + one max *residual*
    lifetime, instead of the max over lanes of a ``gens``-generation lifetime
    *sum* that dominates the reference-default workload (5,000 rays/FoV is only
    ~10 spawns/lane: the gens quota leaves ~85% of lane-iterations idle in the
    drain tail).  The count overshoots by at most one iteration's deaths
    (~lanes/mean-lifetime, <2% at the reference workload); stopping depends
    only on *past* lifetimes, so the Wald-renormalized histogram (factor
    target/actual, applied by the pipeline) stays unbiased — the same argument
    as saturating-spawn mode.  Physics per ray is identical; only the respawn
    schedule changes.
    """
    RT = rays_tile_rows
    cpb = cells_per_block
    assert cpb >= 1 and RT % cpb == 0, (RT, cpb)
    H = RT // cpb
    if cpb > 1:
        assert accum_mode == "packed", (
            "cells_per_block > 1 is implemented for the packed selection only")
        assert H % 8 == 0 or interpret, (
            "per-cell row group must be sublane-aligned (H % 8 == 0) on TPU")
    if transit_jump:
        # Ballistic transit jumps: a TIR-miss lane advances all the way to its
        # next *event* (FC-hull entry, OC-rect entry, eff_reg2 exit, or
        # eff_reg1 exit) in ONE iteration — position += k*gap, TM field *=
        # exp(i*k*2*delta_TIR) via cos/sin, bounce counter += k.  44% of all
        # reference-workload bounces are such pure hops (mean run 3.7, p90 9;
        # measured with the oracle's transit instrumentation), so this cuts
        # both total iterations (~1.5x) and the drain-tail max ray lifetime.
        # The event index comes from half-plane interval arithmetic along the
        # hop line — exact in reals, float-rounded here, so jump mode is a
        # within-MC-tolerance production mode like the packed selection (a
        # ray within ~1 ulp of an edge can interact one hop early/late); it
        # is NOT bitwise vs the single-hop path.  Implemented for the packed
        # selection, cpb == 1.
        assert accum_mode == "packed" and cpb == 1, (
            "transit_jump requires accum_mode='packed', cells_per_block=1")
        assert jump_phase in ("cos", "pow2"), jump_phase
    if accum_mode == "bf16" and not interpret:
        # the direct bf16 vector selection faults the current axon Mosaic
        # toolchain on v5e (TPU worker crash — see the accum_mode=="bf16"
        # branch below); fail loudly instead of crashing the worker.  The
        # packed mode delivers the same bandwidth saving and IS
        # production-validated; bf16 stays available in interpret mode as the
        # documented measurement.
        raise NotImplementedError(
            "accum_mode='bf16' is interpret-mode only: its Mosaic lowering "
            "crashes the TPU worker on the current toolchain. Use "
            "accum_mode='packed' (same bf16 bandwidth saving, validated) or "
            "pass interpret=True.")
    ny, nx = cfg.eyebox_bins
    assert nx <= NY_PAD
    assert flush_w >= 4 and (flush_w & (flush_w - 1)) == 0, flush_w
    # staged deposit-code slots per lane: a fresh generation needs >= 3
    # iterations to reach the out-coupler (init and a same-iteration FC hit
    # can share a body call: respawn -> init to state 2 -> FC fold, then
    # fold-miss to state 4, then OC deposit), so a lane deposits at most
    # ceil(flush_w / 3) times per flush window.  Overflow is additionally
    # *checked* downstream: nb[:, 3] counts dropped codes and the pipeline /
    # sweep raise if it is ever nonzero.
    n_codes = max(2, -(-flush_w // 3))
    if max_iters <= 0:
        max_iters = cfg.max_bounces
    # actual (hull, r1, r2) half-plane counts; the packed rows beyond them are
    # always-true padding, so truncated loops are exact (see _region_test)
    from .trace_pallas import MAX_EDGES

    n_hull, n_r1, n_r2 = edge_counts if edge_counts else (MAX_EDGES,) * 3

    def kernel_impl(ctrl_ref, g_ref, c_ref, cpk_ref, rays_ref, rng_ref,
                    hist_ref, nb_ref, dscr):
        def g(j):
            return g_ref[0, 0, j]

        def c(j):
            return c_ref[0, 0, j]

        def cpk(j):
            return cpk_ref[0, 0, j]

        # per-row-group (cell h of the block) scalar accessors + the
        # slice/concat helpers for the cells_per_block > 1 layout; with
        # cpb == 1 every site below takes its original single-cell path, so
        # the default jaxpr is unchanged
        def c_h(h, j):
            return c_ref[h, 0, j]

        def cpk_h(h, j):
            return cpk_ref[h, 0, j]

        def _half(v, h):
            if cpb == 1:
                return v
            return jax.lax.slice_in_dim(v, h * H, (h + 1) * H, axis=0)

        def _cat(parts):
            if cpb == 1:
                return parts[0]
            return jnp.concatenate(parts, axis=0)

        f32 = jnp.float32
        x0 = rays_ref[0, 0]
        y0 = rays_ref[0, 1]
        ter0 = rays_ref[0, 2]
        tei0 = rays_ref[0, 3]
        tmr0 = rays_ref[0, 4]
        tmi0 = rays_ref[0, 5]

        for h in range(cpb):
            hist_ref[h] = jnp.zeros((ny, NY_PAD), f32)

        def _drain_one(buf):
            bf16 = jnp.bfloat16
            row_r = jax.lax.broadcasted_iota(jnp.int32, (ny, LANES), 0)
            col_c = jax.lax.broadcasted_iota(jnp.int32, (NY_PAD, LANES), 0)

            def one_row(t, acc):
                code = buf[pl.ds(t, 1), :]
                iy_t = code >> 7          # NY_PAD == 128
                ix_t = code & (NY_PAD - 1)
                a = (row_r == iy_t).astype(bf16)
                b = (col_c == ix_t).astype(bf16)
                p = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc + p

            # with cpb > 1 the buffered rows route to their cell's tile:
            # rows [h*H, (h+1)*H) belong to cell h of the block
            for h in range(cpb):
                hist_ref[h] = jax.lax.fori_loop(
                    h * H, (h + 1) * H, one_row, hist_ref[h])
            buf[:] = jnp.zeros((RT, LANES), jnp.int32) - 1
            return 0

        def drain_scratch(_):
            return _drain_one(dscr)

        def phase_mul(phr, phi_, re, im):
            return phr * re - phi_ * im, phr * im + phi_ * re

        def in_ic(px, py):
            dx = px - g(_G_IC)
            dy = py - g(_G_IC + 1)
            return dx * dx + dy * dy <= g(_G_IC + 2)

        # packed (within-MC-tolerance) mode uses the cheaper max-chain region
        # test (3 ops/edge vs 4); the exact modes keep the cmp+and chain whose
        # booleans are bitwise-identical to the reference oracle path
        _MC = {_G_HULL: _G_MC_HULL, _G_R1: _G_MC_R1, _G_R2: _G_MC_R2}

        def rtest(base, px, py, n):
            if accum_mode == "packed":
                return _region_test_max(g, base, _MC[base], px, py, n)
            return _region_test(g, base, px, py, n)

        # ---- transit-jump preamble: per-edge hop-line slopes and their
        # guarded reciprocals, once per block (scalar unit; loop-invariant).
        # Along q_j = p + j*g_dir the edge value is d_e(j) = d_e + j*s_e with
        # s_e = n_e . g_dir, inside iff d_e(j) <= 0.  The reciprocal encoding
        # avoids any per-edge select:
        #   exit  (region currently containing the lane): first j violating
        #     edge e is floor(d_e * rex_e) + 1 with rex_e = -1/max(s_e, tiny);
        #     receding/parallel edges (s_e <= 0) get rex = -1/tiny, making
        #     d_e * rex a huge positive that never wins the min-chain.
        #   entry (region ahead of the lane): edge e is satisfied from
        #     j >= d_e * ren_e with ren_e = 1/max(-s_e, tiny); approaching
        #     edges (s_e < 0) give the true crossing, receding violated edges
        #     give a huge positive ("never enters", correct), receding
        #     satisfied edges give a huge negative (neutral in the max-chain).
        if transit_jump:
            _jgx0, _jgy0 = c(_GAPS + 0), c(_GAPS + 1)
            _jgx1, _jgy1 = c(_GAPS + 2), c(_GAPS + 3)

            def _slopes(base, n, gx_, gy_):
                return [g(base + e) * gx_ + g(base + MAX_EDGES + e) * gy_
                        for e in range(n)]

            def _rex(slopes):
                return [-1.0 / jnp.maximum(s, 1e-30) for s in slopes]

            def _ren(slopes):
                return [1.0 / jnp.maximum(-s, 1e-30) for s in slopes]

            _rex_r1 = (_rex(_slopes(_G_R1, n_r1, _jgx0, _jgy0)),
                       _rex(_slopes(_G_R1, n_r1, _jgx1, _jgy1)))
            _ren_h = (_ren(_slopes(_G_HULL, n_hull, _jgx0, _jgy0)),
                      _ren(_slopes(_G_HULL, n_hull, _jgx1, _jgy1)))
            # only state 3 (hop dir 1) ever tests eff_reg2 on a miss
            _rex_r2 = _rex(_slopes(_G_R2, n_r2, _jgx1, _jgy1))
            # OC-rect slab (state-4 lanes hop with dir 1): sign-preserving
            # magnitude-clamped reciprocals of the hop components
            _jrgx1 = (jnp.where(_jgx1 >= 0.0, 1.0, -1.0)
                      / jnp.maximum(jnp.abs(_jgx1), 1e-12))
            _jrgy1 = (jnp.where(_jgy1 >= 0.0, 1.0, -1.0)
                      / jnp.maximum(jnp.abs(_jgy1), 1e-12))

        def rtest_exit(base, px, py, n, rex, dirm0=None):
            """Packed max-chain region test fused with the exit bound.

            Returns (inside, b) with b = min_e d_e * rex_e — the continuous
            hop index where the first edge is crossed outward (valid when the
            lane is inside; garbage otherwise, masked by the caller)."""
            mc_base = _MC[base]
            m = None
            b = None
            for e in range(n):
                d = px * g(base + e) + (py * g(base + MAX_EDGES + e)
                                        + g(mc_base + e))
                m = d if m is None else jnp.maximum(m, d)
                r = (rex[0][e] if dirm0 is None
                     else jnp.where(dirm0, rex[0][e], rex[1][e]))
                u = d * r
                b = u if b is None else jnp.minimum(b, u)
            return m <= 0.0, b

        def rtest_entry(base, px, py, n, ren, dirm0):
            """Packed max-chain region test fused with the entry bound.

            Returns (inside, b) with b = max_e d_e * ren_e — the continuous
            hop index from which every edge is satisfied (huge if the region
            is never entered along this line)."""
            mc_base = _MC[base]
            m = None
            b = None
            for e in range(n):
                d = px * g(base + e) + (py * g(base + MAX_EDGES + e)
                                        + g(mc_base + e))
                m = d if m is None else jnp.maximum(m, d)
                u = d * jnp.where(dirm0, ren[0][e], ren[1][e])
                b = u if b is None else jnp.maximum(b, u)
            return m <= 0.0, b

        # carry: x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, gen,
        # rng, nb, it, ov, dcode, scode
        # The initializers must NOT fold to splat constants: Mosaic gives those a
        # replicated layout, and a replicated loop carry cannot accept the body's
        # concrete-layout outputs ("invalid relayout").  Multiplying loaded float
        # data by 0.0 is not algebraically folded (NaN semantics), so this yields
        # concrete-layout zeros.
        zeros = x0 * 0.0
        zero_i = zeros.astype(jnp.int32)
        state0 = zero_i + 7   # 7 = awaiting (re)spawn
        gen0 = zero_i + 1     # the initial spawn is gen 1

        # ---- per-slot init constants, hoisted out of the bounce loop: every
        # respawn re-enters with the slot's original (x0, y0, E0), so the
        # first-IC-interaction Jones matvecs, branch efficiencies, normalized
        # + TIR-phased fields, first hop and IC-containment results are
        # generation-invariant.  Computed once per cell with the exact op
        # sequence the in-loop block used to run -> bitwise-identical physics
        # (asserted vs the monolithic kernel in test_persistent), while the
        # per-iteration init path shrinks to the RNG draw, the branch
        # roulette, and constant selects.
        def _init_consts(cc, xh, yh, terh, teih, tmrh, tmih):
            pa0 = _jones_scalar(cc, _INIT_JA, terh, teih, tmrh, tmih)
            pb0 = _jones_scalar(cc, _INIT_JB, terh, teih, tmrh, tmih)
            pw_a0 = pa0[0] ** 2 + pa0[1] ** 2 + pa0[2] ** 2 + pa0[3] ** 2
            pw_b0 = pb0[0] ** 2 + pb0[1] ** 2 + pb0[2] ** 2 + pb0[3] ** 2
            inv_cos0 = 1.0 / cc(_INIT_COS0)
            eff_a0 = pw_a0 * cc(_INIT_SA) * inv_cos0
            eff_ab0 = eff_a0 + pw_b0 * cc(_INIT_SB) * inv_cos0
            inv_a0 = jax.lax.rsqrt(jnp.maximum(pw_a0, 1e-30))
            inv_b0 = jax.lax.rsqrt(jnp.maximum(pw_b0, 1e-30))
            tmra0, tmia0 = phase_mul(cc(_TIR_PH + 0), cc(_TIR_PH + 1),
                                     pa0[2] * inv_a0, pa0[3] * inv_a0)
            tmrb0, tmib0 = phase_mul(cc(_TIR_PH + 4), cc(_TIR_PH + 5),
                                     pb0[2] * inv_b0, pb0[3] * inv_b0)
            fld_a0 = (pa0[0] * inv_a0, pa0[1] * inv_a0, tmra0, tmia0)
            fld_b0 = (pb0[0] * inv_b0, pb0[1] * inv_b0, tmrb0, tmib0)
            x1a0, y1a0 = xh + cc(_GAPS + 0), yh + cc(_GAPS + 1)
            x1b0, y1b0 = xh + cc(_GAPS + 4), yh + cc(_GAPS + 5)
            icin_a0 = in_ic(x1a0, y1a0)
            icin_b0 = in_ic(x1b0, y1b0)
            st1_a0 = jnp.where(icin_a0, 0, 2).astype(jnp.int32)
            # OC out-couple cos factor (loop-invariant; vectorized so the
            # in-loop eff_c math needs no per-cell scalar)
            s_c0 = (xh * 0.0) + cc(_OC_SOUT)
            return (eff_a0, eff_ab0) + fld_a0 + fld_b0 + (
                x1a0, y1a0, x1b0, y1b0,
                icin_a0.astype(jnp.int32), icin_b0.astype(jnp.int32),
                st1_a0, s_c0)

        if cpb == 1:
            consts = _init_consts(c, x0, y0, ter0, tei0, tmr0, tmi0)
        else:
            parts = [
                _init_consts(
                    lambda j, _h=h: c_h(_h, j),
                    _half(x0, h), _half(y0, h), _half(ter0, h),
                    _half(tei0, h), _half(tmr0, h), _half(tmi0, h))
                for h in range(cpb)
            ]
            consts = tuple(_cat([p[k] for p in parts])
                           for k in range(len(parts[0])))
        (eff_a0, eff_ab0, fa00, fa01, fa02, fa03, fb00, fb01, fb02, fb03,
         x1a0, y1a0, x1b0, y1b0, icin_a0i, icin_b0i, st1_a0, s_c0) = consts
        fld_a0 = (fa00, fa01, fa02, fa03)
        fld_b0 = (fb00, fb01, fb02, fb03)
        icin_b0 = icin_b0i == 1

        def cond(carry):
            state, gen, it = carry[9], carry[10], carry[13]
            if count_spawn:
                # spawned is a scalar (one per block cell): a dead lane is
                # exhausted once its cell's spawn target is met (and any
                # minimum-iteration budget passed)
                sps = carry[15 + n_codes : 15 + n_codes + cpb]
                if cpb == 1:
                    exhausted = ((state == 6) & (sps[0] >= ctrl_ref[0, 0])
                                 & (it >= ctrl_ref[0, 1]))
                else:
                    exh = _cat([
                        ((_half(state, h) == 6)
                         & (sps[h] >= ctrl_ref[0, 0])).astype(jnp.int32)
                        for h in range(cpb)])
                    exhausted = (exh == 1) & (it >= ctrl_ref[0, 1])
            else:
                exhausted = ((state == 6) & (gen >= ctrl_ref[0, 0])
                             & (it >= ctrl_ref[0, 1]))
            return (it < max_iters) & (jnp.sum((~exhausted).astype(jnp.int32)) > 0)

        def body(carry):
            (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, gen, rng,
             nb, it, ov) = carry[:15]
            codes = list(carry[15:15 + n_codes])
            spawned = (list(carry[15 + n_codes : 15 + n_codes + cpb])
                       if count_spawn else None)
            kdep = carry[-1]   # staged-deposit cursor (per-lane)

            # ---- respawn: dead slots with generations remaining re-enter init.
            # No field resets needed: init reads only the hoisted per-slot
            # constants, live lanes get their fields from those constants, and
            # dead lanes' stale values flow exclusively through masked paths
            # (finite garbage, never observed) — bitwise-identical output.
            if count_spawn:
                if cpb == 1:
                    rs = (state == 6) & ((spawned[0] < ctrl_ref[0, 0])
                                         | (it < ctrl_ref[0, 1]))
                    # pure dataflow (like the nb bounce reduce): no
                    # control-flow sync; the stop reacts one iteration late,
                    # bounding overshoot by one iteration's deaths
                    spawned[0] = spawned[0] + jnp.sum(rs.astype(jnp.int32))
                else:
                    rs_parts = []
                    for h in range(cpb):
                        rs_h = ((_half(state, h) == 6)
                                & ((spawned[h] < ctrl_ref[0, 0])
                                   | (it < ctrl_ref[0, 1])))
                        spawned[h] = (spawned[h]
                                      + jnp.sum(rs_h.astype(jnp.int32)))
                        rs_parts.append(rs_h.astype(jnp.int32))
                    rs = _cat(rs_parts) == 1
            else:
                rs = (state == 6) & ((gen < ctrl_ref[0, 0])
                                     | (it < ctrl_ref[0, 1]))
            gen = gen + rs.astype(jnp.int32)
            state = jnp.where(rs, 7, state)

            # ---- init (first IC interaction) for awaiting slots: all the
            # field math is hoisted per-slot constants (see above); only the
            # roulette draw and the constant selects run per iteration
            m7 = state == 7

            def init_block(args):
                (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng) = args
                rng_new = _xorshift(rng)
                u = _draw24(rng_new)
                rng = jnp.where(m7, rng_new, rng)
                a = m7 & (u <= eff_a0)
                b = m7 & ~a & (u <= eff_ab0)
                st1 = jnp.where(a, st1_a0,
                                jnp.where(b & icin_b0, 1, 6)).astype(jnp.int32)
                live = (st1 < 6) & m7
                if cpb == 1:
                    gxn = jnp.where(a, c(_GAPS + 0), c(_GAPS + 4))
                    gyn = jnp.where(a, c(_GAPS + 1), c(_GAPS + 5))
                    cth1 = jnp.where(a, c(_IC_SA), c(_IC_SB))
                else:
                    gxn = _cat([jnp.where(_half(a, h), c_h(h, _GAPS + 0),
                                          c_h(h, _GAPS + 4))
                                for h in range(cpb)])
                    gyn = _cat([jnp.where(_half(a, h), c_h(h, _GAPS + 1),
                                          c_h(h, _GAPS + 5))
                                for h in range(cpb)])
                    cth1 = _cat([jnp.where(_half(a, h), c_h(h, _IC_SA),
                                           c_h(h, _IC_SB))
                                 for h in range(cpb)])
                return (
                    jnp.where(live, jnp.where(a, x1a0, x1b0), x),
                    jnp.where(live, jnp.where(a, y1a0, y1b0), y),
                    jnp.where(live, jnp.where(a, fld_a0[0], fld_b0[0]), ter),
                    jnp.where(live, jnp.where(a, fld_a0[1], fld_b0[1]), tei),
                    jnp.where(live, jnp.where(a, fld_a0[2], fld_b0[2]), tmr),
                    jnp.where(live, jnp.where(a, fld_a0[3], fld_b0[3]), tmi),
                    jnp.where(m7, cth1, cos_th),
                    jnp.where(live, gxn, gx), jnp.where(live, gyn, gy),
                    jnp.where(m7, st1, state), rng,
                )

            args = (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng)
            if phase_gating:
                (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng) = (
                    jax.lax.cond(jnp.any(m7), init_block, lambda a: a, args))
            else:
                (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, rng) = (
                    init_block(args))

            # ---- one bounce for live slots
            alive = state < 6
            # per-lane bounce counter: a vector add here, one cross-lane
            # reduce at kernel exit (vs a reduce per iteration) — the int
            # sum is associative, so totals are bitwise-unchanged
            nb = nb + alive.astype(jnp.int32)
            if transit_jump:
                # hop direction per lane: state 2 hops with dir 0, states
                # 3/4 with dir 1 (other states' bounds are masked garbage)
                dirm0 = state == 2
                in_r1, ex_r1 = rtest_exit(_G_R1, x, y, n_r1, _rex_r1, dirm0)
            else:
                in_r1 = rtest(_G_R1, x, y, n_r1)
            state = jnp.where(alive & ~in_r1, 6, state)
            alive = state < 6

            grp_ic = alive & (state <= 1)
            grp_fc = alive & ((state == 2) | (state == 3))
            grp_oc = alive & (state >= 4)
            bit = (state & 1) == 1

            yrot = g(_G_FC_ROT) * x + g(_G_FC_ROT + 1) * y
            if transit_jump:
                in_hull, en_hull = rtest_entry(_G_HULL, x, y, n_hull,
                                               _ren_h, dirm0)
            else:
                in_hull = rtest(_G_HULL, x, y, n_hull)
            fc_strip = jnp.clip(
                jnp.floor((g(_G_FC_TOP) - yrot) * g(_G_FC_INVW)).astype(jnp.int32),
                0, num_fc - 1)
            yr = g(_G_OC_ROT) * x + g(_G_OC_ROT + 1) * y
            # bounds pre-widened by _EDGE_TOL on host (same f32 ops; bitwise)
            in_rect = ((x >= g(_G_OC_BT)) & (x <= g(_G_OC_BT + 1))
                       & (y >= g(_G_OC_BT + 2)) & (y <= g(_G_OC_BT + 3)))
            oc_strip = jnp.clip(
                jnp.floor((g(_G_OC_TOP) - yr) * g(_G_OC_INVW)).astype(jnp.int32),
                0, num_oc - 1)
            hit_fc = grp_fc & in_hull
            hit_oc = grp_oc & in_rect
            interact = grp_ic | hit_fc | hit_oc

            zero = jnp.zeros_like(x)
            gfc = grp_fc
            goc = grp_oc

            # ---- unified site-parameter selection: ONE one-hot FMA pass over
            # the {IC} + {FC strip} + {OC strip} rows.  Each lane's site is
            # exclusive, so a single (1 + num_fc + num_oc)-key selection of the
            # common [A0 B0 A1 B1 s_a s_b] record replaces the three per-site
            # blocks + 3-way merge the kernel used to run (saving the duplicate
            # Jones matvecs and merge selects; measured vs the three-block
            # form).  The SMEM offsets per row are Python constants, so the
            # sites' different block layouts need no repacking; selected values
            # are the same f32 scalars, every product is exactly 0 or the
            # value, and downstream math is unchanged — bitwise identical
            # results (test_persistent asserts vs the monolithic kernel).
            W = 34
            rows = [(grp_ic,
                     [_IC_BLK + j for j in range(32)] + [_IC_SA, _IC_SB])]
            for k in range(num_fc):
                base = _FC_BLK + k * _FC_STRIDE
                rows.append((grp_fc & (fc_strip == k),
                             [base + j for j in range(34)]))
            oc_rows = []
            for k in range(num_oc):
                base = _OC_BLK + k * _OC_STRIDE
                mk = grp_oc & (oc_strip == k)
                oc_rows.append((mk, base))
                rows.append((mk,
                             [base + j for j in range(8)]
                             + [base + 8 + j for j in range(8)]
                             + [base + 24 + j for j in range(8)]
                             + [base + 32 + j for j in range(8)]
                             + [base + 48, base + 49]))
            if accum_mode == "select":
                p = [zero for _ in range(W)]
                for mk, offs in rows:
                    for j in range(W):
                        p[j] = jnp.where(mk, c(offs[j]), p[j])
                q = [zero for _ in range(16)]
                for mk, base in oc_rows:
                    for j in range(8):
                        q[j] = jnp.where(mk, c(base + 16 + j), q[j])
                        q[8 + j] = jnp.where(mk, c(base + 40 + j), q[8 + j])
            elif accum_mode == "bf16":
                # packed-bf16 accumulation: the one-hot masks are exact in
                # bf16 and each lane selects exactly one row, so the only
                # precision cost is rounding the *parameters themselves* to
                # bf16 (~0.4% relative) — equivalent to tabulating the RCWA
                # LUT in bf16.  Halves the vector-register traffic of the
                # selection (bf16 packs 2/word).  Opt-in: physics shifts
                # within MC noise but is NOT bitwise vs the f32 modes.
                # EXPERIMENTAL: validated in interpret mode; the current
                # axon Mosaic toolchain faults on this lowering on v5e
                # (TPU worker crash), so it is not a production mode there.
                bfd = jnp.bfloat16
                zero_bf = (x * 0.0).astype(bfd)
                p_bf = [zero_bf for _ in range(W)]
                for mk, offs in rows:
                    mf = mk.astype(bfd)
                    for j in range(W):
                        p_bf[j] = p_bf[j] + mf * c(offs[j]).astype(bfd)
                q_bf = [zero_bf for _ in range(16)]
                for mk, base in oc_rows:
                    mf = mk.astype(bfd)
                    for j in range(8):
                        q_bf[j] = q_bf[j] + mf * c(base + 16 + j).astype(bfd)
                        q_bf[8 + j] = (q_bf[8 + j]
                                       + mf * c(base + 40 + j).astype(bfd))
                p = [v.astype(jnp.float32) for v in p_bf]
                q = [v.astype(jnp.float32) for v in q_bf]
            elif accum_mode == "packed":
                # one-hot WORD selection over bf16-pair-packed records
                # (pack_selection_params): rows are exclusive, so a
                # where-chain picks the lane's whole record at half the
                # scalar loads and vector ops of the f32 FMA selection;
                # unpacking is shift + same-width bitcast (both supported by
                # Mosaic, unlike the direct bf16 vector path).  Parameters
                # are bf16-rounded: physics within MC tolerance of f32, not
                # bitwise (cf. accum_mode="bf16").
                # the 8 q-words (OC-only branch-C Jones, record words 17-24)
                # are stored zero on the IC/FC rows (pack_selection_params),
                # so chaining them only over the OC rows (r > num_fc) drops
                # ~64 of the ~400 selection ops/iteration, bitwise-identical
                n_p_words = (W + 1) // 2
                if cpb == 1:
                    acc = [zero_i for _ in range(_SEL_NW)]
                    for r, (mk, _) in enumerate(rows):
                        nw = _SEL_NW if r > num_fc else n_p_words
                        for w in range(nw):
                            acc[w] = jnp.where(mk, cpk(r * _SEL_NW + w),
                                               acc[w])
                else:
                    # per-row-group chains on (H, 128) slices — the lanes of
                    # cell h select from cell h's packed words; the total
                    # vector-op count matches one full-width chain (each
                    # (H, 128) where covers 1/cpb of the block) at cpb x the
                    # scalar loads, and the concat merges vreg-aligned row
                    # groups
                    accs = []
                    for h in range(cpb):
                        z_h = _half(zero_i, h)
                        acc_h = [z_h for _ in range(_SEL_NW)]
                        for r, (mk, _) in enumerate(rows):
                            mk_h = _half(mk, h)
                            nw = _SEL_NW if r > num_fc else n_p_words
                            for w in range(nw):
                                acc_h[w] = jnp.where(
                                    mk_h, cpk_h(h, r * _SEL_NW + w), acc_h[w])
                        accs.append(acc_h)
                    acc = [_cat([accs[h][w] for h in range(cpb)])
                           for w in range(_SEL_NW)]

                # select by the state bit at the WORD level before unpacking
                # (record layout: words 0-3 ja|bit0, 4-7 jb|bit0, 8-11 ja|bit1,
                # 12-15 jb|bit1, 16 = (s_a, s_b), 17-20 jc|bit0, 21-24
                # jc|bit1).  Selecting packed words then unpacking yields the
                # same bits as unpacking then selecting values, so this is
                # bitwise-identical at half the unpack ops and zero per-value
                # merge selects (~60 fewer vector ops/iteration).
                def unpk(ws):
                    out = []
                    for wv in ws:
                        out.append(jax.lax.bitcast_convert_type(
                            wv << 16, jnp.float32))
                        out.append(jax.lax.bitcast_convert_type(
                            wv & jnp.int32(-65536), jnp.float32))
                    return out

                jab = unpk([jnp.where(bit, acc[8 + j], acc[j])
                            for j in range(8)])
                ja = jab[:8]
                jb = jab[8:]
                jc = unpk([jnp.where(bit, acc[21 + j], acc[17 + j])
                           for j in range(4)])
                s_a, s_b = unpk([acc[16]])
            else:
                p = [zero for _ in range(W)]
                for mk, offs in rows:
                    mf = mk.astype(jnp.float32)
                    for j in range(W):
                        p[j] = p[j] + mf * c(offs[j])
                # the out-couple order's Jones (branch C) exists only on OC rows
                q = [zero for _ in range(16)]
                for mk, base in oc_rows:
                    mf = mk.astype(jnp.float32)
                    for j in range(8):
                        q[j] = q[j] + mf * c(base + 16 + j)
                        q[8 + j] = q[8 + j] + mf * c(base + 40 + j)

            if accum_mode != "packed":
                ja = [jnp.where(bit, p[16 + j], p[j]) for j in range(8)]
                jb = [jnp.where(bit, p[24 + j], p[8 + j]) for j in range(8)]
                jc = [jnp.where(bit, q[8 + j], q[j]) for j in range(8)]
                s_a = p[32]
                s_b = p[33]
            pol_a = _jones_vec(ja, 0, ter, tei, tmr, tmi)
            pol_b = _jones_vec(jb, 0, ter, tei, tmr, tmi)
            pol_c = _jones_vec(jc, 0, ter, tei, tmr, tmi)
            s_c = c(_OC_SOUT) if cpb == 1 else s_c0

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
                if cpb == 1:
                    v0 = c(base + 0)
                    v1 = c(base + stride)
                    v2 = c(base + 2 * stride)
                    v3 = c(base + 3 * stride)
                    return jnp.where(
                        dirs == 0, v0,
                        jnp.where(dirs == 1, v1, jnp.where(dirs == 2, v2, v3)))
                outs = []
                for h in range(cpb):
                    d_h = _half(dirs, h)
                    outs.append(jnp.where(
                        d_h == 0, c_h(h, base + 0),
                        jnp.where(d_h == 1, c_h(h, base + stride),
                                  jnp.where(d_h == 2, c_h(h, base + 2 * stride),
                                            c_h(h, base + 3 * stride)))))
                return _cat(outs)

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

            # ---- deposit: accumulate into the per-cell VMEM histogram tile.
            # Bounds pre-widened and bin scales precomputed host-side by
            # build_kernel_cell_params with the same f32 ops the kernel used
            # to run per iteration (bitwise-equal booleans/bins, fewer
            # scalar-unit ops).
            if cpb == 1:
                in_quad = ((x >= c(_EBT)) & (x <= c(_EBT + 1))
                           & (y >= c(_EBT + 2)) & (y <= c(_EBT + 3)))
                ix = jnp.clip(
                    jnp.floor((x - c(_EBR)) * c(_EBS)).astype(jnp.int32),
                    0, nx - 1)
                iy = jnp.clip(
                    jnp.floor((y - c(_EBR + 2)) * c(_EBS + 1)).astype(jnp.int32),
                    0, ny - 1)
            else:
                iqs, ixs, iys = [], [], []
                for h in range(cpb):
                    xh, yh = _half(x, h), _half(y, h)
                    iqs.append((
                        (xh >= c_h(h, _EBT)) & (xh <= c_h(h, _EBT + 1))
                        & (yh >= c_h(h, _EBT + 2)) & (yh <= c_h(h, _EBT + 3))
                    ).astype(jnp.int32))
                    ixs.append(jnp.clip(
                        jnp.floor((xh - c_h(h, _EBR))
                                  * c_h(h, _EBS)).astype(jnp.int32),
                        0, nx - 1))
                    iys.append(jnp.clip(
                        jnp.floor((yh - c_h(h, _EBR + 2))
                                  * c_h(h, _EBS + 1)).astype(jnp.int32),
                        0, ny - 1))
                in_quad = _cat(iqs) == 1
                ix = _cat(ixs)
                iy = _cat(iys)
            dep_valid = br_c & in_quad

            # Deposits drain into the per-cell histogram tile via a one-hot
            # matmul on the MXU: for buffered code row t, A[r, l] = [iy_l == r]
            # and B[c, l] = [ix_l == c] give P = A @ B^T with P[r, c] =
            # #deposits into bin (r, c).  Inputs are exact in bf16 (0/1),
            # accumulation is f32, so counts are exact.  This replaces a serial
            # per-deposit drain loop (~0.5 us/deposit) that dominated once
            # deposits became per-iteration events (saturating-spawn mode).
            #
            # Deposit codes are *staged in loop-carry registers* and flushed
            # every ``flush_w`` iterations, cutting the MXU drain work
            # ``flush_w``x and keeping the per-iteration path free of VMEM
            # read-modify-writes (the codes only touch the VMEM scratch
            # inside the flush, where Mosaic's ref row slicing feeds the
            # drain matmuls).  A lane deposits at most once per generation
            # and a fresh generation needs >=3 iterations to reach the
            # out-coupler (see the ``n_codes`` derivation above), so
            # ``n_codes = ceil(flush_w/3)`` staged slots hold every case with
            # pure vector ops (no per-iteration scalar reduce).  A further
            # same-window deposit is impossible by that timing; it is
            # nonetheless *counted* (nb[:, 3]) and the pipeline/sweep raise
            # on a nonzero count rather than trust the argument.  Invalid
            # lanes carry -1, whose arithmetic-shift row index (-1) matches
            # no histogram row.
            # cursor-indexed staging: kdep counts this window's staged codes
            # per lane, which IS the first empty slot (slots fill in order and
            # only the flush clears them) — same staged contents as the former
            # first-fit ``placed`` chain at roughly half the vector ops
            code_new = iy * NY_PAD + ix
            kcur = jnp.where(dep_valid, kdep, -2)
            for i in range(n_codes):
                codes[i] = jnp.where(kcur == i, code_new, codes[i])
            ov = ov + (kcur >= n_codes).astype(jnp.int32)
            kdep = kdep + dep_valid.astype(jnp.int32)

            def do_flush(args):
                codes, _k = args[:-1], args[-1]
                # slot 0 holds every first-in-window deposit -> drain
                # unconditionally; later slots are occupied only when a lane
                # deposited 2+ times in one window (rare) -> gate each on an
                # any-occupied test
                dscr[:] = codes[0]
                drain_scratch(None)

                def spill_flush(sc2):
                    dscr[:] = sc2
                    drain_scratch(None)
                    return 0

                for i in range(1, n_codes):
                    jax.lax.cond(jnp.any(codes[i] >= 0), spill_flush,
                                 lambda _: 0, codes[i])
                # int x*0 can fold to a replicated-layout splat; derive the
                # reset codes from concrete float data instead (cf. the carry
                # initializers above)
                empty = (x * 0.0).astype(jnp.int32) - 1
                return (empty,) * n_codes + (empty + 1,)

            *codes, kdep = jax.lax.cond(
                (it & (flush_w - 1)) == (flush_w - 1), do_flush,
                lambda a: a, tuple(codes) + (kdep,))
            codes = list(codes)

            # ---- misses
            miss_fc2 = grp_fc & ~in_hull & (state == 2)
            miss_fc3 = grp_fc & ~in_hull & (state == 3)
            if transit_jump:
                in_r2, ex_r2 = rtest_exit(_G_R2, x, y, n_r2, (_rex_r2,))
            else:
                in_r2 = rtest(_G_R2, x, y, n_r2)
            fc3_to_oc = miss_fc3 & ~in_r2
            hop = (miss_fc2 | (miss_fc3 & in_r2)
                   | (grp_oc & ~in_rect & (state == 4)))
            miss_oc5 = grp_oc & ~in_rect & (state == 5)
            if transit_jump:
                # OC-rect entry along hop dir 1 (slab test; valid for the
                # state-4 lanes that consume it)
                t0x = (g(_G_OC_BT + 0) - x) * _jrgx1
                t1x = (g(_G_OC_BT + 1) - x) * _jrgx1
                t0y = (g(_G_OC_BT + 2) - y) * _jrgy1
                t1y = (g(_G_OC_BT + 3) - y) * _jrgy1
                en_rect = jnp.maximum(jnp.minimum(t0x, t1x),
                                      jnp.minimum(t0y, t1y))
                # first event index: exits happen at floor(u)+1 (first j
                # strictly past the crossing), entries at ceil(u) (first j at
                # or past it); the per-lane minimum over this state's events,
                # clamped to [1, 4095] (k=1 == the plain single hop)
                k_exit = jnp.floor(ex_r1) + 1.0
                k_ent = jnp.ceil(jnp.where(grp_oc, en_rect, en_hull))
                kf = jnp.minimum(k_exit, k_ent)
                kf = jnp.where(miss_fc3,
                               jnp.minimum(kf, jnp.floor(ex_r2) + 1.0), kf)
                # pow2 phase caps the jump at 15 hops (4 phasor bits); longer
                # runs (p99 of measured run lengths is ~9) just take another
                # jump iteration — scheduling only, physics unchanged
                kf = jnp.clip(kf, 1.0, 15.0 if jump_phase == "pow2"
                              else 4095.0)
                # skipped hops are real TIR bounces: count them
                nb = nb + jnp.where(hop, kf.astype(jnp.int32) - 1, 0)
                if jump_phase == "pow2":
                    # k-hop phase by exponentiation-by-squaring of the
                    # single-hop phasor (_HOP2_PH, the same per-dir scalars
                    # the non-jump path loads): ~50 mul/select vector ops and
                    # NO per-lane transcendentals or extra SMEM loads, vs the
                    # cos/sin pair of the "cos" variant.  |z|=1 rounding drift
                    # over <=15 squared multiplies is ~1e-6 — far inside the
                    # packed mode's bf16 parameter rounding.
                    z1r = jnp.where(miss_fc2, c(_HOP2_PH + 0), c(_HOP2_PH + 2))
                    z1i = jnp.where(miss_fc2, c(_HOP2_PH + 1), c(_HOP2_PH + 3))
                    ki = kf.astype(jnp.int32)
                    one = zero + 1.0
                    bit0 = (ki & 1) != 0
                    h_phr = jnp.where(bit0, z1r, one)
                    h_phi = jnp.where(bit0, z1i, zero)
                    zr, zi = z1r, z1i
                    for b in (2, 4, 8):
                        zr, zi = zr * zr - zi * zi, 2.0 * zr * zi
                        bitb = (ki & b) != 0
                        nrr = h_phr * zr - h_phi * zi
                        nri = h_phr * zi + h_phi * zr
                        h_phr = jnp.where(bitb, nrr, h_phr)
                        h_phi = jnp.where(bitb, nri, h_phi)
                else:
                    # k-hop phase: TM *= exp(i * k * 2*delta_TIR(dir))
                    ang = jnp.where(miss_fc2, c(_HOP2_ANG + 0),
                                    c(_HOP2_ANG + 1))
                    th_j = kf * ang
                    h_phr = jnp.cos(th_j)
                    h_phi = jnp.sin(th_j)
            elif cpb == 1:
                h_phr = jnp.where(miss_fc2, c(_HOP2_PH + 0), c(_HOP2_PH + 2))
                h_phi = jnp.where(miss_fc2, c(_HOP2_PH + 1), c(_HOP2_PH + 3))
            else:
                h_phr = _cat([jnp.where(_half(miss_fc2, h),
                                        c_h(h, _HOP2_PH + 0),
                                        c_h(h, _HOP2_PH + 2))
                              for h in range(cpb)])
                h_phi = _cat([jnp.where(_half(miss_fc2, h),
                                        c_h(h, _HOP2_PH + 1),
                                        c_h(h, _HOP2_PH + 3))
                              for h in range(cpb)])
            hop_tmr, hop_tmi = phase_mul(h_phr, h_phi, tmr, tmi)

            state = jnp.where(
                accept, st_acc,
                jnp.where(br_c | die | miss_oc5, 6,
                          jnp.where(fc3_to_oc, 4, state))).astype(jnp.int32)
            if transit_jump:
                x = jnp.where(accept, x_acc, jnp.where(hop, x + kf * gx, x))
                y = jnp.where(accept, y_acc, jnp.where(hop, y + kf * gy, y))
            else:
                x = jnp.where(accept, x_acc, jnp.where(hop, x + gx, x))
                y = jnp.where(accept, y_acc, jnp.where(hop, y + gy, y))
            ter = jnp.where(accept, ter_n, ter)
            tei = jnp.where(accept, tei_n, tei)
            tmr = jnp.where(accept, tmr_n, jnp.where(hop, hop_tmr, tmr))
            tmi = jnp.where(accept, tmi_n, jnp.where(hop, hop_tmi, tmi))
            cos_th = jnp.where(accept, cos_n, cos_th)
            gx = jnp.where(accept, gx_n, gx)
            gy = jnp.where(accept, gy_n, gy)
            out = (x, y, ter, tei, tmr, tmi, cos_th, gx, gy, state, gen, rng,
                   nb, it + 1, ov, *codes)
            return out + ((tuple(spawned) + (kdep,)) if count_spawn
                          else (kdep,))

        # nb (12) and ov (14) are per-lane vectors reduced once at exit;
        # it (13) stays scalar (drives the flush phase and the loop cond)
        carry = (x0, y0, ter0, tei0, tmr0, tmi0, zeros + 1.0,
                 zeros, zeros, state0, gen0, rng_ref[0], zero_i,
                 jnp.int32(0), zero_i) + (zero_i - 1,) * n_codes
        if count_spawn:
            # every lane's initial spawn (state0 = 7) counts toward the
            # target — H * LANES lanes per block cell
            carry = carry + tuple(jnp.int32(H * LANES) for _ in range(cpb))
        carry = carry + (zero_i,)   # kdep: staged-deposit cursor

        # body_unroll > 1 replicates the bounce body inside the inner loop at
        # the Python trace level (Mosaic's fori_loop only lowers unroll=1 or
        # full unroll); the op sequence per iteration is unchanged ->
        # bitwise-identical (tested vs unroll=1), but Mosaic's scheduler gets
        # a longer window to overlap one iteration's scalar-unit selection
        # loads with the previous iteration's vector work: full unroll
        # measured 2.92 -> 3.15 G bounces/s on v5e (packed, cond16, RT=32).
        # <= 0 = auto: the PERS_UNROLL env override if set (honored by every
        # entry point — Simulator and the sweep build their kernels here),
        # else full unroll for production RT >= 32 blocks.  Measured on v5e:
        # +8% at RT=32, neutral at RT=16 (ref workload) and RT=8 (sweep
        # slots), where it only multiplies trace/compile time ~cond_interval x
        # — as does interpret mode, where results are identical by
        # construction.
        unroll = body_unroll
        if unroll <= 0:
            unroll = int(os.environ.get("PERS_UNROLL", 0))
        if unroll <= 0:
            unroll = cond_interval if (not interpret and RT >= 32) else 1
        # clamp (PERS_UNROLL=16 against cond_interval=8 means full unroll)
        # and reject non-divisors loudly: a stripped-assert zero-trip inner
        # loop would never advance `it` and hang the device
        unroll = min(unroll, cond_interval)
        if cond_interval % unroll != 0:
            raise ValueError(
                f"body_unroll ({unroll}) must divide cond_interval "
                f"({cond_interval})")

        def chunk(carry):
            def steps(cc):
                for _ in range(unroll):
                    cc = body(cc)
                return cc

            return jax.lax.fori_loop(
                0, cond_interval // unroll, lambda _, cc: steps(cc),
                carry)

        carry = jax.lax.while_loop(cond, chunk, carry)
        # safety: flush codes still staged in the carries at exit.  Slot 0
        # holds every first-in-window deposit; later slots are rarely
        # occupied, so gate their (RT-row MXU) drains on an any-occupied
        # test — this runs once per cell, not per iteration.
        dscr[:] = carry[15]
        drain_scratch(None)

        def _exit_flush(ci):
            dscr[:] = ci
            drain_scratch(None)
            return 0

        for i in range(1, n_codes):
            jax.lax.cond(jnp.any(carry[15 + i] >= 0), _exit_flush,
                         lambda _: 0, carry[15 + i])
        for h in range(cpb):
            nb_ref[h, 0, 0] = jnp.sum(_half(carry[12], h))  # bounces
            nb_ref[h, 0, 1] = carry[13]   # iterations (diagnostics; per block)
            nb_ref[h, 0, 2] = jnp.sum(_half(carry[10], h))  # rays spawned
            nb_ref[h, 0, 3] = jnp.sum(_half(carry[14], h))  # overflows (== 0)

    if accum_mode == "packed":
        kernel = kernel_impl
    else:
        def kernel(ctrl_ref, g_ref, c_ref, rays_ref, rng_ref, hist_ref,
                   nb_ref, dscr):
            return kernel_impl(ctrl_ref, g_ref, c_ref, None, rays_ref,
                               rng_ref, hist_ref, nb_ref, dscr)

    @jax.jit
    def trace(cell_params, geom_row, rays_in, rng_in, ctrl=None,
              cell_params_packed=None):
        if ctrl is None:
            ctrl = jnp.array([gens, 0], jnp.int32)
        if (cell_params_packed is None) != (accum_mode != "packed"):
            raise ValueError(
                "cell_params_packed must be given exactly when "
                "accum_mode='packed' (see pack_selection_params)")
        C = cell_params.shape[0]
        # NOTE: the kernel reads precomputed deposit slots (_EBT: tol-widened
        # rect, _EBS: bin scales) from the cell-param rows — filled host-side
        # by build_kernel_cell_params(eyebox_bins=cfg.eyebox_bins).  Filling
        # them here per dispatch would cost ~8 eager relay round-trips per
        # trace call (trace() is not jitted by its callers).
        # geom_row may carry one geometry row per *design*: (D, PG) with the
        # cell grid laid out as D contiguous runs of C/D cells — the basis of
        # production-throughput design sweeps (each grid step reads its
        # design's scalars; D=1 is the single-design case).
        D = geom_row.shape[0]
        assert C % D == 0, f"cells ({C}) must split evenly over designs ({D})"
        cpd = C // D
        assert C % cpb == 0 and cpd % cpb == 0, (
            f"cells ({C}) / cells-per-design ({cpd}) must split evenly over "
            f"cells_per_block ({cpb}) — a block's cells share one design")
        Cb = C // cpb      # kernel blocks (grid length)
        cpd_b = cpd // cpb
        out_shapes = (
            jax.ShapeDtypeStruct((C, ny, NY_PAD), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, 4), jnp.int32),
        )
        in_specs = [
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            # unit middle dim so the (1, 1, PG) block equals the array's
            # trailing dims (Mosaic rejects a (1, PG) block of a (D, PG)
            # array for D > 1 — the multi-design sweep case)
            pl.BlockSpec((1, 1, PG), lambda i: ((i * cpb) // cpd, 0, 0),
                         memory_space=pltpu.SMEM),
            # block row h = cell h of grid block i (cells i*cpb .. i*cpb+cpb-1)
            pl.BlockSpec((cpb, 1, PC), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        operands = [ctrl.reshape(1, 2), geom_row[:, None, :],
                    cell_params[:, None, :]]
        if accum_mode == "packed":
            PW = cell_params_packed.shape[-1]
            in_specs.append(
                pl.BlockSpec((cpb, 1, PW), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM))
            operands.append(cell_params_packed[:, None, :])
        # rays_in may be per-cell (C, 6, RT, 128) or per-design (D, 6, RT, 128)
        # — with shared pupil samples every cell of a design respawns from the
        # same field tile, so the sweep/pipeline pass ONE tile per design and
        # the grid index map fans it out (i // cpd), replacing the former
        # device-side broadcast+reshape staging of C copies (~3.6 GB at the
        # sweep default) with zero materialization.  Same trick for rng_in:
        # a (cpd, RT, 128) seed block shared by every design maps as i % cpd
        # (per-(design, cell) distinct streams would pass (C, RT, 128)).
        # with cpb > 1 the per-block ray tile stacks the block's cells as
        # row groups (rows h*H..(h+1)*H = cell h), so per-cell tiles arrive
        # pre-paired as (Cb, 6, RT, 128); the shared-per-design tile is
        # simply built (or tiled) at RT rows by the caller
        nr = rays_in.shape[0]
        assert nr in (Cb, D), (rays_in.shape, Cb, D)
        in_specs.append(
            pl.BlockSpec(
                (1, 6, RT, LANES),
                (lambda i: (i, 0, 0, 0)) if nr == Cb else
                (lambda i: ((i * cpb) // cpd, 0, 0, 0)),
                memory_space=pltpu.VMEM))
        # rng blocks pair the same way: (C, H, 128) per-cell streams reshape
        # contiguously to (Cb, RT, 128)
        ng = rng_in.shape[0]
        assert ng in (Cb, cpd_b), (rng_in.shape, Cb, cpd_b)
        in_specs.append(
            pl.BlockSpec(
                (1, RT, LANES),
                (lambda i: (i, 0, 0)) if ng == Cb else
                (lambda i: (i % cpd_b, 0, 0)),
                memory_space=pltpu.VMEM))
        operands += [rays_in, rng_in]
        hist, nb = pl.pallas_call(
            kernel,
            grid=(Cb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((cpb, ny, NY_PAD), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cpb, 1, 4), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((RT, LANES), jnp.int32)],
            interpret=interpret,
        )(*operands)
        return hist, nb.reshape(C, 4)

    return trace


def hist_tiles_to_histogram(hist_tiles: jnp.ndarray, cell_ids: np.ndarray,
                            L: int, M: int, N: int, ny: int, nx: int):
    """(C, ny, 128) per-cell tiles -> (L, N, M, ny, nx) eyebox histogram."""
    tiles = np.asarray(hist_tiles)[:, :, :nx]
    out = np.zeros((L, N, M, ny, nx), np.float32)
    cid = np.asarray(cell_ids)
    l = cid // (M * N)
    mn = cid % (M * N)
    m = mn // N
    n = mn % N
    out[l, n, m] = tiles
    return out
