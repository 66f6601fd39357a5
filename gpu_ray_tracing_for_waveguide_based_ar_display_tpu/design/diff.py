"""Differentiable analytic-LUT pipeline: grating parameters -> cell tables, in jnp.

The analytic half of the design pipeline (angle tables, TIR hop vectors, TIR
phase retardation — design/geometry.py:359-415, re-deriving the closed-form
sweep of the reference's ``couplers_coor.py:656-711``) is pure trigonometry on
the grating vectors, so it ports directly to jnp and becomes reverse-mode
differentiable in the grating period/orientation (lambda_ic, phi_ic,
lambda_oc, phi_oc).  Combined with the splitting tracer's differentiable
configuration (:mod:`..engine.splitting`, ``table_arg=True``) this makes the
map  *grating parameters -> eyebox energy distribution*  one JAX program:
``jax.grad`` moves the grating pitch itself, not just the apodization
amplitudes.

Scope (the documented surrogate):

- the **geometry polygons** (coupler strips, hulls, region tests) stay at the
  base design, host-side — only the angle/gap/TIR-phase physics is
  re-derived per parameter value.  Gradients are therefore exact for the
  in-waveguide propagation physics and first-order in the (slowly varying)
  footprint geometry;
- the RCWA **Jones matrices** are held at the base design's tables.  The
  *scales* (the cos(theta_out) roulette factors) are recomputed, matching the
  synthetic-LUT convention where direction channels equal the design's angle
  tables (luts/synthetic.py:62-66 — what an RCWA solver would tabulate).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WaveguideDesign


def design_params(design: WaveguideDesign, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """The differentiable parameter pytree at a design's values."""
    return {
        "lambda_ic": jnp.asarray(design.lambda_ic, dtype),
        "phi_ic": jnp.asarray(design.phi_ic, dtype),
        "lambda_oc": jnp.asarray(design.lambda_oc, dtype),
        "phi_oc": jnp.asarray(design.phi_oc, dtype),
    }


def _incidence(fov_x, fov_y):
    tx, ty = jnp.tan(fov_x), jnp.tan(fov_y)
    th = jnp.arctan(jnp.sqrt(tx * tx + ty * ty))
    phi = jnp.arctan2(ty, tx)
    return th, phi


def _tir_retardation(n_g, theta):
    """delta_s - delta_p under TIR (geometry.py:257-267), gradient-safe.

    Below-critical angles clamp to zero retardation; the sqrt is where-guarded
    so the clamp contributes zero gradient instead of NaN."""
    x = n_g**2 * jnp.sin(theta) ** 2 - 1.0
    s = jnp.sqrt(jnp.maximum(x, 1e-20))
    delta_s = 2.0 * jnp.arctan(s / (n_g * jnp.cos(theta)))
    delta_p = 2.0 * jnp.arctan(n_g * s / jnp.cos(theta))
    return jnp.where(x > 0, delta_s - delta_p, 0.0)


def analytic_cell_tables(
    params: Dict[str, jnp.ndarray],
    design: WaveguideDesign,
    num_fov_x: int,
    num_fov_y: int,
    num_fc: int,
    num_oc: int,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """jnp re-derivation of every *analytic* cell-table entry.

    Returns a dict whose keys/shapes match :func:`..engine.trace_jnp._as_jnp`
    exactly (split-real phasors with a trailing (re, im) axis), so
    ``{**T, **analytic_cell_tables(...)}`` swaps the analytic physics of a
    table pytree while keeping the RCWA Jones blocks:

    - ``gaps`` (C, 4, 2): TIR round-trip hop vectors per direction
      (geometry.py:386-395 <- couplers_coor.py:668-676),
    - ``tir_phasor`` / ``hop2_phasor`` (C, 4, 2): e^{i delta}, e^{2 i delta}
      TIR retardation phasors (geometry.py:397-405 <- couplers_coor.py:689-693),
    - ``init_scale`` (2, C), ``init_cos0`` (C,), ``ic_scale`` (2, C),
      ``fc_scale`` (2, S_fc, C), ``oc_scale`` (2, S_oc, C),
      ``oc_scale_out`` (C,): the cos(theta) roulette scale factors
      (luts/packing.py:106-146).
    """
    d = design
    M, N, L = num_fov_x, num_fov_y, len(d.wavelengths)
    C = L * M * N
    lmd = jnp.asarray(np.asarray(d.wavelengths), dtype)
    k0 = 2 * jnp.pi / lmd  # (L,)

    kg_ic = 2 * jnp.pi / params["lambda_ic"]
    g_ic = (kg_ic * jnp.cos(params["phi_ic"]), kg_ic * jnp.sin(params["phi_ic"]))
    kg_oc = 2 * jnp.pi / params["lambda_oc"]
    g_oc_rev = (kg_oc * jnp.cos(params["phi_oc"] + jnp.pi),
                kg_oc * jnp.sin(params["phi_oc"] + jnp.pi))
    g_fc = (g_oc_rev[0] - g_ic[0], g_oc_rev[1] - g_ic[1])

    gx = jnp.linspace(-d.fov_x / 2, d.fov_x / 2, M, dtype=dtype)
    gy = jnp.linspace(-d.fov_y / 2, d.fov_y / 2, N, dtype=dtype)
    gxx, gyy = jnp.meshgrid(gx, gy, indexing="ij")      # (M, N)
    th_in, phi_in = _incidence(gxx, gyy)

    k0l = k0[:, None, None]                              # (L, 1, 1)
    kx = d.n_air * k0l * jnp.sin(th_in) * jnp.cos(phi_in)
    ky = d.n_air * k0l * jnp.sin(th_in) * jnp.sin(phi_in)

    def glass_dir(kxg, kyg):
        kzg = jnp.sqrt(k0l**2 * d.n_glass**2 - kxg**2 - kyg**2)
        th = jnp.arctan(jnp.sqrt((kxg**2 + kyg**2) / kzg**2))
        phi = jnp.arctan2(kyg, kxg)
        return th, phi

    th_ic, phi_ic = glass_dir(kx + g_ic[0], ky + g_ic[1])
    th_ic2, phi_ic2 = glass_dir(kx - g_ic[0], ky - g_ic[1])
    th_fc, phi_fc = glass_dir(kx + g_ic[0] + g_fc[0], ky + g_ic[1] + g_fc[1])
    th_oc, phi_oc = glass_dir(kx + g_ic[0] + g_fc[0] - 2 * g_oc_rev[0],
                              ky + g_ic[1] + g_fc[1] - 2 * g_oc_rev[1])

    def flat(x):
        return x.reshape(C, *x.shape[3:])

    def hop(th, phi):
        r = 2 * d.thickness * jnp.tan(th)
        return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)

    gaps = flat(jnp.stack(
        [hop(th_ic, phi_ic), hop(th_fc, phi_fc),
         hop(th_ic2, phi_ic2), hop(th_oc, phi_oc)], axis=-2))  # (C, 4, 2)

    tir = jnp.stack(
        [_tir_retardation(d.n_glass, th_ic),
         _tir_retardation(d.n_glass, th_fc),
         _tir_retardation(d.n_glass, th_ic2),
         _tir_retardation(d.n_glass, th_oc)], axis=-1)          # (L, M, N, 4)
    tir = flat(tir)
    tir_phasor = jnp.stack([jnp.cos(tir), jnp.sin(tir)], axis=-1)
    hop2_phasor = jnp.stack([jnp.cos(2 * tir), jnp.sin(2 * tir)], axis=-1)

    cos_air = flat(jnp.broadcast_to(jnp.cos(th_in), (L, M, N)))
    cos_ic = flat(jnp.cos(th_ic))
    cos_ic2 = flat(jnp.cos(th_ic2))
    cos_fc = flat(jnp.cos(th_fc))
    cos_oc = flat(jnp.cos(th_oc))

    def per_strip(a, b, S):
        return jnp.broadcast_to(
            jnp.stack([a, b])[:, None, :], (2, S, C))

    return {
        "gaps": gaps.astype(dtype),
        "tir_phasor": tir_phasor.astype(dtype),
        "hop2_phasor": hop2_phasor.astype(dtype),
        "init_scale": jnp.stack([cos_ic * d.n_glass,
                                 cos_ic2 * d.n_glass]).astype(dtype),
        "init_cos0": cos_air.astype(dtype),
        "ic_scale": jnp.stack([cos_ic, cos_ic2]).astype(dtype),
        "fc_scale": per_strip(cos_ic, cos_fc, num_fc).astype(dtype),
        "oc_scale": per_strip(cos_fc, cos_oc, num_oc).astype(dtype),
        "oc_scale_out": (cos_air / d.n_glass).astype(dtype),
    }


def apply_design_params(T: dict, ana: Dict[str, jnp.ndarray]) -> dict:
    """Swap a table pytree's analytic entries for parameterized ones."""
    out = dict(T)
    out.update(ana)
    return out
