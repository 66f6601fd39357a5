"""Synthetic RCWA look-up tables.

The reference ships its LUTs as pre-computed ``.npy`` downloads (its RCWA solver is
"currently unavailable", /root/reference/README.md:80, download_lut.py:13-19).  Those
files cannot be fetched in an offline environment, so this module synthesizes LUTs that
are *physically consistent* with a given design:

- direction channels (theta/phi) are taken from the design's exact k-space angle tables
  (what an RCWA solver would tabulate for the grating equation),
- Jones matrices are ``c * U`` with ``U`` unitary, so each branch's Russian-roulette
  probability equals a prescribed smooth diffraction-efficiency profile *independent of
  the incident polarization state*, while still mixing TE/TM with nontrivial phases,
- branch efficiencies at every interaction site sum to < 1 (probability conservation),
  and out-coupler strips are gain-graded (later strips eject a larger fraction) the way
  production waveguides equalize eyebox brightness.

If the real LUT files are present, use :mod:`.io` instead; everything downstream is
agnostic to where the LUTs came from.
"""

from __future__ import annotations

import numpy as np

from ..design.geometry import DesignGeometry
from .schema import CHANNELS, PHI_CHANNEL, RcwaLuts
from . import schema


def _unitary(beta, d1, d2):
    """2x2 unitary: rotation by beta times diagonal phases; broadcasts elementwise.

    Returns (u00, u01, u10, u11) complex arrays.
    """
    cb, sb = np.cos(beta), np.sin(beta)
    e1 = np.exp(1j * d1)
    e2 = np.exp(1j * d2)
    return cb * e1, -sb * e2, sb * e1, cb * e2


def _profile(base, amp, u, v, l, fx, fy, fl, phase):
    """Smooth bounded efficiency profile over (lambda, fov_x, fov_y)."""
    p = base * (1.0 + amp * np.cos(2 * np.pi * (fx * u + fy * v) + fl * l + phase))
    return np.clip(p, 0.01, 0.95)


def make_synthetic_luts(
    geom: DesignGeometry, seed: int = 1234, dtype=np.complex128
) -> RcwaLuts:
    """Build all seven LUTs for ``geom``'s FoV grid."""
    L, M, N = geom.th_out_ic.shape
    num_fc = len(geom.fc_strips)
    num_oc = len(geom.oc_strips)
    n_g = geom.design.n_glass
    rng = np.random.default_rng(seed)

    # normalized FoV coordinates and wavelength index, broadcast to (L, M, N)
    u = (np.arange(M) / max(M - 1, 1) - 0.5)[None, :, None]
    v = (np.arange(N) / max(N - 1, 1) - 0.5)[None, None, :]
    l = np.arange(L)[:, None, None].astype(np.float64)

    cos_in_air = np.cos(geom.th_in_ic)
    cos_ic = np.cos(geom.th_out_ic)
    cos_ic2 = np.cos(geom.th_out_ic2)
    cos_fc = np.cos(geom.th_out_fc)
    cos_oc = np.cos(geom.th_out_oc)

    def prof(base, amp):
        return _profile(
            base, amp, u, v, l,
            fx=rng.uniform(0.2, 0.8), fy=rng.uniform(0.2, 0.8),
            fl=rng.uniform(0.5, 2.0), phase=rng.uniform(0, 2 * np.pi),
        )

    def jones(p, cos_in, cos_out, extra=1.0):
        """Scaled unitary giving branch probability exactly p for any input state."""
        c = np.sqrt(p * cos_in / (cos_out * extra))
        beta = 0.15 * np.sin(2 * np.pi * (u + v) + l) + rng.uniform(-0.2, 0.2)
        d1 = rng.uniform(0, 2 * np.pi) + 0.3 * np.sin(4 * u + l)
        d2 = rng.uniform(0, 2 * np.pi) + 0.3 * np.cos(3 * v - l)
        j00, j01, j10, j11 = _unitary(beta, d1, d2)
        return c * j00, c * j01, c * j10, c * j11

    def put(arr, quad, mats):
        a, b, cch, d = quad
        arr[..., a], arr[..., b], arr[..., cch], arr[..., d] = mats

    # ---- lut_ic1: first interaction from air -------------------------------------
    ic1 = np.zeros((L, M, N, CHANNELS["ic1"]), dtype=np.complex128)
    ic1[..., 0] = geom.th_in_ic
    p_a = prof(0.50, 0.18)
    p_b = prof(0.12, 0.30)
    put(ic1, schema.JONES_IC1_TO_IC2, jones(p_a, cos_in_air, cos_ic, extra=n_g))
    put(ic1, schema.JONES_IC1_TO_IC3, jones(p_b, cos_in_air, cos_ic2, extra=n_g))

    # ---- lut_ic2: re-diffraction while over the IC, dir-1 ------------------------
    ic2 = np.zeros((L, M, N, CHANNELS["ic2"]), dtype=np.complex128)
    ic2[..., 0] = geom.th_out_ic
    ic2[..., PHI_CHANNEL["ic2"]] = geom.phi_out_ic
    put(ic2, schema.JONES_IC2_TO_IC2, jones(prof(0.70, 0.10), cos_ic, cos_ic))
    put(ic2, schema.JONES_IC2_TO_IC3, jones(prof(0.12, 0.3), cos_ic, cos_ic2))

    # ---- lut_ic3: re-diffraction while over the IC, dir-2 ------------------------
    ic3 = np.zeros((L, M, N, CHANNELS["ic3"]), dtype=np.complex128)
    ic3[..., 0] = geom.th_out_ic2
    ic3[..., PHI_CHANNEL["ic3"]] = geom.phi_out_ic2
    put(ic3, schema.JONES_IC3_TO_IC2, jones(prof(0.45, 0.2), cos_ic2, cos_ic))
    put(ic3, schema.JONES_IC3_TO_IC3, jones(prof(0.35, 0.2), cos_ic2, cos_ic2))

    # ---- lut_fc1 / lut_fc2: folding couplers, per strip --------------------------
    fc1 = np.zeros((num_fc, L, M, N, CHANNELS["fc1"]), dtype=np.complex128)
    fc2 = np.zeros((num_fc, L, M, N, CHANNELS["fc2"]), dtype=np.complex128)
    for s in range(num_fc):
        fc1[s, ..., 0] = geom.th_out_ic
        fc1[s, ..., PHI_CHANNEL["fc1"]] = geom.phi_out_ic
        fc2[s, ..., 0] = geom.th_out_fc
        fc2[s, ..., PHI_CHANNEL["fc2"]] = geom.phi_out_fc
        # fold fraction rises slightly along the strip stack
        grade = 0.14 + 0.12 * s / max(num_fc - 1, 1)
        put(fc1[s], schema.JONES_FC1_STAY, jones(prof(0.78, 0.06), cos_ic, cos_ic))
        put(fc1[s], schema.JONES_FC1_FOLD, jones(prof(grade, 0.2), cos_ic, cos_fc))
        put(fc2[s], schema.JONES_FC2_UNFOLD, jones(prof(0.04, 0.3), cos_fc, cos_ic))
        put(fc2[s], schema.JONES_FC2_STAY, jones(prof(0.90, 0.04), cos_fc, cos_fc))

    # ---- lut_oc1 / lut_oc2: out-couplers, per strip ------------------------------
    oc1 = np.zeros((num_oc, L, M, N, CHANNELS["oc1"]), dtype=np.complex128)
    oc2 = np.zeros((num_oc, L, M, N, CHANNELS["oc2"]), dtype=np.complex128)
    for s in range(num_oc):
        oc1[s, ..., 0] = geom.th_out_fc
        oc1[s, ..., PHI_CHANNEL["oc1"]] = geom.phi_out_fc
        oc2[s, ..., 0] = geom.th_out_oc
        oc2[s, ..., 1] = geom.phi_out_oc  # unused by the tracer, kept sensible
        oc2[s, ..., PHI_CHANNEL["oc2"]] = geom.phi_out_oc
        frac = s / max(num_oc - 1, 1)
        p_out = 0.12 + 0.20 * frac          # graded ejection
        p_stay = 0.82 - 0.30 * frac
        put(oc1[s], schema.JONES_OC1_STAY, jones(prof(p_stay, 0.05), cos_fc, cos_fc))
        put(oc1[s], schema.JONES_OC1_REVERSE, jones(prof(0.04, 0.3), cos_fc, cos_oc))
        put(oc1[s], schema.JONES_OC1_OUT,
            jones(prof(p_out, 0.15), cos_fc, cos_in_air, extra=1.0 / n_g))
        put(oc2[s], schema.JONES_OC2_UNREVERSE, jones(prof(0.40, 0.2), cos_oc, cos_fc))
        put(oc2[s], schema.JONES_OC2_STAY, jones(prof(0.40, 0.15), cos_oc, cos_oc))
        put(oc2[s], schema.JONES_OC2_OUT,
            jones(prof(p_out * 0.8, 0.2), cos_oc, cos_in_air, extra=1.0 / n_g))

    luts = RcwaLuts(ic1=ic1, ic2=ic2, ic3=ic3, fc1=fc1, fc2=fc2, oc1=oc1, oc2=oc2)
    luts.validate(num_fc, num_oc, L, M, N)
    return luts.astype(dtype) if dtype != np.complex128 else luts
