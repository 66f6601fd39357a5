"""Numpy parity oracle: scalar per-ray re-execution of the reference algorithm.

This is the test fixture standing in for the reference's CUDASIM mode (numba is not
installed here): a slow, straightforward Python/numpy implementation of the full-color
Monte-Carlo kernel semantics (``process_rays_kernel_pro_fullColor``,
/root/reference/GPU_ray_tracing_functions.py:833-1247) consuming the *raw* LUTs.  The
vectorized jnp engine and the Pallas megakernel are validated against this, so the
oracle deliberately follows the reference branch-for-branch:

- per-ray xorshift32 RNG with zero-state reseed (:25-34), consumed only at
  interaction events,
- Russian-roulette branch selection against *unnormalized* per-branch efficiencies,
- polarization tracked as (|E_te|, |E_tm|, delta_phase) with re-normalization after
  every accepted branch,
- deposits of weight 1.0 into the (lambda, FoVy, FoVx, eb_y, eb_x) histogram,
- ``ener > threshold`` guards with the full-color threshold of 0 (:859).

All math is float64 (numba promotes through ``math.*`` the same way).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from ..design.convex import point_in_or_on
from ..design.geometry import DesignGeometry
from ..luts import schema
from ..luts.schema import RcwaLuts

MASK32 = 0xFFFFFFFF


def xorshift32(state: int) -> int:
    """One xorshift32 step (reference RNG, GPU_ray_tracing_functions.py:25-34)."""
    s = state & MASK32
    s ^= (s << 13) & MASK32
    s ^= s >> 17
    s ^= (s << 5) & MASK32
    return s


def uniform_from_state(state: int, idx: int) -> Tuple[float, int]:
    """Draw U[0,1) and the new state; zero states reseed from the ray index."""
    s = state & MASK32
    if s == 0:
        s = (0x6D2B79F5 ^ ((idx + 1) & MASK32)) & MASK32
    s = xorshift32(s)
    return s * (1.0 / 4294967296.0), s


def _wrap_pi(x: float) -> float:
    two_pi = 2.0 * math.pi
    x = x + math.pi
    x = x - two_pi * math.floor(x / two_pi)
    return x - math.pi


def e_field_cal(ete, etm, delta, a, b, c, d):
    """Jones update in (|te|, |tm|, delta) form; matrix [[a, b], [c, d]] on (te, tm).

    Mirrors ``E_field_cal`` (GPU_ray_tracing_functions.py:132-152) including the
    1e-20 magnitude epsilon on output phases.
    """
    phase = complex(math.cos(delta), math.sin(delta))
    te_in = complex(ete, 0.0)
    tm_in = phase * etm
    te_out = a * te_in + b * tm_in
    tm_out = c * te_in + d * tm_in
    te_abs = math.hypot(te_out.real, te_out.imag)
    tm_abs = math.hypot(tm_out.real, tm_out.imag)
    eps = 1e-20
    phi_te = math.atan2(te_out.imag, te_out.real) if te_abs >= eps else 0.0
    phi_tm = math.atan2(tm_out.imag, tm_out.real) if tm_abs >= eps else 0.0
    return te_abs, tm_abs, _wrap_pi(phi_tm - phi_te)


def _jones(lut_row, quad):
    a, b, c, d = quad
    return lut_row[a], lut_row[b], lut_row[c], lut_row[d]


def lut_find_position(lut: np.ndarray, theta, phi, tol2: float = 1e-5):
    """Nearest (theta, phi) grid-cell search (``LUT_find_position`` parity,
    /root/reference/GPU_ray_tracing_functions.py:110-122).

    The reference scans the (J, K) grid row-major and returns the FIRST cell
    whose squared distance to ``(theta, phi)`` is below ``tol2`` (not the
    global minimum) — this vectorized rebuild keeps that first-match contract.
    ``lut`` is (C, J, K) with channel 0 = theta and channel 1 = phi; the
    production engines never need this (cells are indexed directly by (m, n)),
    it exists for API parity and as a test oracle.

    ``theta``/``phi`` broadcast; returns ``(j, k, found)`` int/int/bool arrays
    (scalars in, scalars out), with (-1, -1, False) where nothing is in range.
    """
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    scalar = theta.ndim == 0 and phi.ndim == 0
    theta, phi = np.broadcast_arrays(np.atleast_1d(theta), np.atleast_1d(phi))
    grid_t = np.asarray(lut[0], dtype=np.float64).ravel()
    grid_p = np.asarray(lut[1], dtype=np.float64).ravel()
    d2 = ((theta[..., None] - grid_t) ** 2
          + (phi[..., None] - grid_p) ** 2)          # (..., J*K)
    hit = d2 < tol2
    found = hit.any(axis=-1)
    flat = np.argmax(hit, axis=-1)                    # first True, row-major
    K = np.asarray(lut[0]).shape[1]
    j = np.where(found, flat // K, -1)
    k = np.where(found, flat % K, -1)
    if scalar:
        return int(j[0]), int(k[0]), bool(found[0])
    return j, k, found


class OracleTracer:
    """Scalar tracer over a design + LUT set.  Use tiny ray counts only."""

    def __init__(self, geom: DesignGeometry, luts: RcwaLuts,
                 eyebox_bins: Tuple[int, int] = (80, 120),
                 max_bounces: int = 100_000):
        self.geom = geom
        self.luts = luts
        self.eyebox_bins = eyebox_bins
        self.max_bounces = max_bounces
        self.fc = geom.fc_strips
        self.oc = geom.oc_strips
        d = geom.design
        self.n_g = d.n_glass
        L, M, N = geom.th_out_ic.shape
        self.shape = (L, M, N)

    def _in(self, x, y, poly) -> bool:
        return bool(point_in_or_on(x, y, poly))

    def trace(self, rays: dict, seed_states: np.ndarray) -> np.ndarray:
        """Trace rays given SoA init dict and per-ray RNG states.

        ``rays`` keys: x, y, m, n, lmd, te, tm, delta (arrays of equal length).
        Returns the eyebox histogram (L, N_fov_y, M_fov_x, eb_y, eb_x) and mutates
        ``seed_states`` in place (so repeated calls continue the stream).
        """
        L, M, N = self.shape
        ny, nx = self.eyebox_bins
        hist = np.zeros((L, N, M, ny, nx), dtype=np.float64)
        self.total_bounces = 0
        self.stats = {
            "die_init": 0, "die_ic": 0, "die_fc": 0, "die_oc": 0,
            "die_escape_r1": 0, "die_oc_miss5": 0, "die_ic3_exit": 0,
            "deposit": 0, "out_of_quad": 0, "budget": 0,
            # transit instrumentation: bounces that are pure TIR hops (strip
            # miss in states 2-4; no RNG draw, no interaction) vs interaction
            # bounces.  ``miss_runs`` collects the length of every maximal
            # consecutive-miss run — the quantity a ballistic-jump scheme can
            # collapse to O(1) work.
            "miss_bounces": 0, "hit_bounces": 0,
            "miss_s2": 0, "miss_s3": 0, "miss_s4": 0,
        }
        self.miss_runs: list = []
        self.lifetimes: list = []
        self.outcomes = np.full(len(rays["x"]), -1, dtype=np.int64)
        for i in range(len(rays["x"])):
            self._trace_one(
                i, rays["x"][i], rays["y"][i], int(rays["m"][i]), int(rays["n"][i]),
                int(rays["lmd"][i]), rays["te"][i], rays["tm"][i], rays["delta"][i],
                seed_states, hist,
            )
        return hist

    def _miss_bounce(self, state: int = 0):
        self.stats["miss_bounces"] += 1
        if state in (2, 3, 4):
            self.stats[f"miss_s{state}"] += 1
        self._run += 1

    def _hit_bounce(self):
        self.stats["hit_bounces"] += 1
        if self._run:
            self.miss_runs.append(self._run)
            self._run = 0

    def _trace_one(self, idx, x, y, m, n, lmd, ete, etm, delta, states, hist):
        self._run = 0
        self._life = 0
        try:
            self._trace_one_impl(idx, x, y, m, n, lmd, ete, etm, delta,
                                 states, hist)
        finally:
            if self._run:
                self.miss_runs.append(self._run)
            self.lifetimes.append(self._life)

    def _trace_one_impl(self, idx, x, y, m, n, lmd, ete, etm, delta, states,
                        hist):
        g = self.geom
        lut = self.luts
        tir = g.lut_tir[lmd, m, n]
        gap_tab = g.lut_gap[lmd, m, n]
        ic1 = lut.ic1[lmd, m, n]
        ic2 = lut.ic2[lmd, m, n]
        ic3 = lut.ic3[lmd, m, n]

        ener = 1.0
        threshold = 0.0

        # --- first IC interaction (air -> glass)
        e1 = e_field_cal(ete, etm, delta, *_jones(ic1, schema.JONES_IC1_TO_IC2))
        e2 = e_field_cal(ete, etm, delta, *_jones(ic1, schema.JONES_IC1_TO_IC3))
        cos_in = math.cos(ic1[0].real)
        eff1 = (e1[0] ** 2 + e1[1] ** 2) * math.cos(ic2[0].real) / cos_in * self.n_g
        eff2 = (e2[0] ** 2 + e2[1] ** 2) * math.cos(ic3[0].real) / cos_in * self.n_g
        rand, states[idx] = uniform_from_state(states[idx], idx)
        if rand <= eff1:
            cos_th = math.cos(ic2[0].real)
            norm = math.sqrt(e1[0] ** 2 + e1[1] ** 2)
            ete, etm = e1[0] / norm, e1[1] / norm
            delta = e1[2] + tir[0]
            gap = (gap_tab[0], gap_tab[1])
            x += gap[0]; y += gap[1]
            ener *= eff1
            state = 2 if not self._in(x, y, g.ic) else 0
        elif rand <= eff1 + eff2:
            cos_th = math.cos(ic3[0].real)
            norm = math.sqrt(e2[0] ** 2 + e2[1] ** 2)
            ete, etm = e2[0] / norm, e2[1] / norm
            delta = e2[2] + tir[2]
            gap = (gap_tab[4], gap_tab[5])
            x += gap[0]; y += gap[1]
            ener *= eff2
            if not self._in(x, y, g.ic):
                self.stats["die_ic3_exit"] += 1
                return
            state = 1
        else:
            self.stats["die_init"] += 1
            return

        # --- bounce loop
        for _ in range(self.max_bounces):
            self.total_bounces += 1
            self._life += 1
            if not self._in(x, y, g.eff_reg1):
                self.stats["die_escape_r1"] += 1
                self._miss_bounce()
                return
            if state in (0, 1):
                self._hit_bounce()
                if state == 0:
                    qa, qb = schema.JONES_IC2_TO_IC2, schema.JONES_IC2_TO_IC3
                    row = ic2
                else:
                    qa, qb = schema.JONES_IC3_TO_IC2, schema.JONES_IC3_TO_IC3
                    row = ic3
                e1 = e_field_cal(ete, etm, delta, *_jones(row, qa))
                e2 = e_field_cal(ete, etm, delta, *_jones(row, qb))
                eff1 = (e1[0] ** 2 + e1[1] ** 2) * math.cos(ic2[0].real) / cos_th
                eff2 = (e2[0] ** 2 + e2[1] ** 2) * math.cos(ic3[0].real) / cos_th
                rand, states[idx] = uniform_from_state(states[idx], idx)
                if rand <= eff1:
                    cos_th = math.cos(ic2[0].real)
                    norm = math.sqrt(e1[0] ** 2 + e1[1] ** 2)
                    ete, etm = e1[0] / norm, e1[1] / norm
                    delta = e1[2] + tir[0]
                    gap = (gap_tab[0], gap_tab[1])
                    x += gap[0]; y += gap[1]
                    ener *= eff1
                    state = 2 if not self._in(x, y, g.ic) else 0
                elif rand <= eff1 + eff2:
                    cos_th = math.cos(ic3[0].real)
                    norm = math.sqrt(e2[0] ** 2 + e2[1] ** 2)
                    ete, etm = e2[0] / norm, e2[1] / norm
                    delta = e2[2] + tir[2]
                    gap = (gap_tab[4], gap_tab[5])
                    x += gap[0]; y += gap[1]
                    ener *= eff2
                    if not self._in(x, y, g.ic):
                        self.stats["die_ic3_exit"] += 1
                        return
                    state = 1
                else:
                    self.stats["die_ic"] += 1
                    return
            elif state in (2, 3):
                hit = -1
                for i, strip in enumerate(self.fc):
                    if self._in(x, y, strip):
                        hit = i
                        break
                if hit >= 0:
                    self._hit_bounce()
                    f1 = lut.fc1[hit, lmd, m, n]
                    f2 = lut.fc2[hit, lmd, m, n]
                    if state == 2:
                        qa, qb, row = schema.JONES_FC1_STAY, schema.JONES_FC1_FOLD, f1
                    else:
                        qa, qb, row = schema.JONES_FC2_UNFOLD, schema.JONES_FC2_STAY, f2
                    e1 = e_field_cal(ete, etm, delta, *_jones(row, qa))
                    e2 = e_field_cal(ete, etm, delta, *_jones(row, qb))
                    eff1 = (e1[0] ** 2 + e1[1] ** 2) * math.cos(f1[0].real) / cos_th
                    eff2 = (e2[0] ** 2 + e2[1] ** 2) * math.cos(f2[0].real) / cos_th
                    rand, states[idx] = uniform_from_state(states[idx], idx)
                    if rand <= eff1 and ener * eff1 > threshold:
                        cos_th = math.cos(f1[0].real)
                        norm = math.sqrt(e1[0] ** 2 + e1[1] ** 2)
                        ete, etm = e1[0] / norm, e1[1] / norm
                        delta = e1[2] + tir[0]
                        gap = (gap_tab[0], gap_tab[1])
                        ener *= eff1
                        state = 2
                    elif rand <= eff1 + eff2 and ener * eff2 > threshold:
                        cos_th = math.cos(f2[0].real)
                        norm = math.sqrt(e2[0] ** 2 + e2[1] ** 2)
                        ete, etm = e2[0] / norm, e2[1] / norm
                        delta = e2[2] + tir[1]
                        gap = (gap_tab[2], gap_tab[3])
                        ener *= eff2
                        state = 3
                    else:
                        self.stats["die_fc"] += 1
                        return
                    x += gap[0]; y += gap[1]
                else:
                    self._miss_bounce(state)
                    if state == 3 and not self._in(x, y, self.geom.eff_reg2):
                        state = 4
                    elif state == 2:
                        x += gap[0]; y += gap[1]
                        delta += 2 * tir[0]
                    else:
                        x += gap[0]; y += gap[1]
                        delta += 2 * tir[1]
            else:  # states 4, 5
                hit = -1
                for i, strip in enumerate(self.oc):
                    if self._in(x, y, strip):
                        hit = i
                        break
                if hit < 0:
                    self._miss_bounce(state)
                    if state == 5:
                        self.stats["die_oc_miss5"] += 1
                        return
                    x += gap[0]; y += gap[1]
                    delta += 2 * tir[1]
                    continue
                self._hit_bounce()
                o1 = lut.oc1[hit, lmd, m, n]
                o2 = lut.oc2[hit, lmd, m, n]
                if state == 4:
                    qa, qb, qc, row = (schema.JONES_OC1_STAY, schema.JONES_OC1_REVERSE,
                                       schema.JONES_OC1_OUT, o1)
                else:
                    qa, qb, qc, row = (schema.JONES_OC2_UNREVERSE, schema.JONES_OC2_STAY,
                                       schema.JONES_OC2_OUT, o2)
                e1 = e_field_cal(ete, etm, delta, *_jones(row, qa))
                e2 = e_field_cal(ete, etm, delta, *_jones(row, qb))
                e3 = e_field_cal(ete, etm, delta, *_jones(row, qc))
                eff1 = (e1[0] ** 2 + e1[1] ** 2) * math.cos(o1[0].real) / cos_th
                eff2 = (e2[0] ** 2 + e2[1] ** 2) * math.cos(o2[0].real) / cos_th
                eff3 = (e3[0] ** 2 + e3[1] ** 2) * math.cos(
                    self.luts.ic1[lmd, m, n, 0].real) / cos_th / self.n_g
                rand, states[idx] = uniform_from_state(states[idx], idx)
                if rand <= eff1 and ener * eff1 > threshold:
                    cos_th = math.cos(o1[0].real)
                    norm = math.sqrt(e1[0] ** 2 + e1[1] ** 2)
                    ete, etm = e1[0] / norm, e1[1] / norm
                    delta = e1[2] + tir[1]
                    gap = (gap_tab[2], gap_tab[3])
                    x += gap[0]; y += gap[1]
                    ener *= eff1
                    state = 4
                elif rand <= eff1 + eff2 and ener * eff2 > threshold:
                    cos_th = math.cos(o2[0].real)
                    norm = math.sqrt(e2[0] ** 2 + e2[1] ** 2)
                    ete, etm = e2[0] / norm, e2[1] / norm
                    delta = e2[2] + tir[3]
                    gap = (gap_tab[6], gap_tab[7])
                    x += gap[0]; y += gap[1]
                    ener *= eff2
                    state = 5
                elif rand <= eff1 + eff2 + eff3 and ener * eff3 > threshold:
                    rng4 = self.geom.eyebox_range[m, n]
                    quad = self.geom.eyebox_quad[m, n]
                    if point_in_or_on(x, y, quad):
                        ny, nx = self.eyebox_bins
                        dx = (rng4[1] - rng4[0]) / nx
                        dy = (rng4[3] - rng4[2]) / ny
                        ix = int(math.floor((x - rng4[0]) / dx))
                        iy = int(math.floor((y - rng4[2]) / dy))
                        if 0 <= ix < nx and 0 <= iy < ny:
                            hist[lmd, n, m, iy, ix] += 1.0
                            self.outcomes[idx] = iy * nx + ix
                        self.stats["deposit"] += 1
                    else:
                        self.stats["out_of_quad"] += 1
                    return
                else:
                    self.stats["die_oc"] += 1
                    return
