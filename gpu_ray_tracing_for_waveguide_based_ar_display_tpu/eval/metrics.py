"""Display-metric evaluation of the eyebox radiance histogram.

Port of ``evaluation`` (/root/reference/AR_system_evaluation_functions.py:45-163):
pupil-masked eye-position sampling of the eyebox, pure-white drive through the display
primary matrix, per-eye-position reconstruction, and the four headline metrics
(CIE-2000 color dispersion vs D65, FoV uniformity, eyebox uniformity, plus the
simulated eye-view image stack).  Everything is numpy float64; this is a
once-per-run post-processing pass, not a hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..config import EvalConfig
from . import color

# Display primary response matrix (sensor RGB <- per-wavelength intensity) and its
# XYZ counterpart; numeric constants from AR_system_evaluation_functions.py:47-57.
DISPLAY_M = np.array(
    [
        [1.67430115, -0.76582385, -0.06172232],
        [-0.12551154, 1.47840695, -0.04124377],
        [-0.01826868, -0.13098157, 1.61444037],
    ]
)
DISPLAY_M_XYZ = np.array(
    [
        [6.424000e-01, 1.891400e-01, 2.511000e-01],
        [2.650000e-01, 8.849624e-01, 7.390000e-02],
        [4.999999e-05, 3.693564e-02, 1.528100e+00],
    ]
)


@dataclasses.dataclass
class EvalResult:
    delta_e: float           # mean CIE-2000 color dispersion vs pure white
    u_fov: float             # field-of-view luminance uniformity, 0-1
    u_eyebox: float          # eyebox luminance uniformity, 0-1
    # (FoVy, FoVx, 3, n_epy, n_epx) simulated eye views; None when the caller
    # asked evaluate(..., with_image=False)
    output_image: Optional[np.ndarray]
    eye_luminance: np.ndarray  # (n_epy, n_epx) mean luminance per eye position
    # eye positions with >= 1 zero-luminance FoV pixel.  Any nonzero count means
    # u_eyebox degenerates to 0 and u_fov is biased low — the MC sample budget
    # has not populated every (FoV, eye-position) bin yet (at the reference's
    # default 5,000 rays/FoV x 4 iters the corner positions are starved; see
    # tools/convergence_report.py), not that the display has a dead region.
    starved_eye_positions: int = 0


def pupil_mask(size: int) -> np.ndarray:
    """Circular pupil aperture mask over ``size x size`` bins (:68-74)."""
    radius = size / 2.0
    yy, xx = np.ogrid[:size, :size]
    center = radius - 0.5
    dist = np.sqrt((xx - center) ** 2 + (yy - center) ** 2)
    return (dist <= radius).astype(np.float64)


def eye_perceived(matrix_eb: np.ndarray, cfg: EvalConfig) -> np.ndarray:
    """Pupil-integrated radiance at sampled eye positions.

    Returns (L, FoVy, FoVx, n_epy, n_epx).  The reference samples eye positions on a
    stride instead of a full convolution (:91-109); with the pupil mask separable into
    row segments this is computed as strided masked window sums.
    """
    mask = pupil_mask(cfg.pupil_mask_bins)
    msize = mask.shape[0]
    n_l, n_fy, n_fx, n_eby, n_ebx = matrix_eb.shape
    y0s = np.arange(0, n_eby - msize + 1, cfg.eye_step_y)
    x0s = np.arange(0, n_ebx - msize + 1, cfg.eye_step_x)
    out = np.zeros((n_l, n_fy, n_fx, len(y0s), len(x0s)), dtype=matrix_eb.dtype)
    for iy, y0 in enumerate(y0s):
        for ix, x0 in enumerate(x0s):
            patch = matrix_eb[..., y0 : y0 + msize, x0 : x0 + msize]
            out[..., iy, ix] = np.einsum("...yx,yx->...", patch, mask)
    return out


_PERCEIVE_CACHE = {}


def eye_perceived_jnp(matrix_eb, cfg: EvalConfig = EvalConfig()):
    """Device-side :func:`eye_perceived` for a jnp histogram.

    The eyebox histogram is ~0.9 GB fp32 at reference resolution; on a
    relay-attached TPU pulling it to the host dominates everything else, while
    the pupil-integrated perception stack is only (L, fy, fx, 7, 8) ~ 2 MB.
    Slices are static, so this jits to one fused reduction pass.  The jitted
    reduction is memoized per (eval config, eyebox shape, dtype): a fresh
    closure per call would re-trace every run (~0.5 s of the reference
    workload's wall clock).
    """
    import jax
    import jax.numpy as jnp

    msize = cfg.pupil_mask_bins
    n_eby, n_ebx = matrix_eb.shape[-2:]
    key = (msize, cfg.eye_step_y, cfg.eye_step_x, n_eby, n_ebx,
           str(matrix_eb.dtype))
    if key not in _PERCEIVE_CACHE:
        mask = jnp.asarray(pupil_mask(msize), matrix_eb.dtype)
        y0s = range(0, n_eby - msize + 1, cfg.eye_step_y)
        x0s = range(0, n_ebx - msize + 1, cfg.eye_step_x)

        @jax.jit
        def _perceive(m):
            cols = []
            for y0 in y0s:
                row = [jnp.einsum("...yx,yx->...",
                                  m[..., y0:y0 + msize, x0:x0 + msize], mask)
                       for x0 in x0s]
                cols.append(jnp.stack(row, axis=-1))
            return jnp.stack(cols, axis=-2)

        _PERCEIVE_CACHE[key] = _perceive
    return _PERCEIVE_CACHE[key](matrix_eb)


def eye_perceived_conv_jnp(matrix_eb, cfg: EvalConfig = EvalConfig(),
                           stride: Optional[Tuple[int, int]] = None):
    """Pupil integration as ONE XLA convolution over the eyebox axes.

    The reference defines the *full* eye-position scan as a ``convolve2d`` of
    the eyebox histogram with the pupil mask but ships it commented out as too
    slow (/root/reference/AR_system_evaluation_functions.py:77-89), falling
    back to the 8x12-strided sampler (:91-109).  On TPU the dense scan is one
    ``lax.conv_general_dilated`` with the (msize, msize) pupil disc as kernel
    — ``stride=(1, 1)`` gives every valid eye position (51x91 = 4,641 at
    reference resolution vs the sampler's 7x8 = 56); the default stride
    reproduces the reference's sampled grid exactly (VALID windows at steps
    (eye_step_y, eye_step_x) visit the same ``y0s``/``x0s``).

    Returns (L, FoVy, FoVx, n_epy, n_epx), same contract as
    :func:`eye_perceived_jnp` (sum order inside a window may differ by float
    association; tested to f32 tolerance in test_eval).
    """
    import jax
    import jax.numpy as jnp

    if stride is None:
        stride = (cfg.eye_step_y, cfg.eye_step_x)
    msize = cfg.pupil_mask_bins
    n_eby, n_ebx = matrix_eb.shape[-2:]
    key = ("conv", msize, stride, n_eby, n_ebx, str(matrix_eb.dtype))
    if key not in _PERCEIVE_CACHE:
        kernel = np.asarray(pupil_mask(msize), str(matrix_eb.dtype))

        @jax.jit
        def _perceive(m):
            return pupil_conv(m, jnp.asarray(kernel), stride)

        _PERCEIVE_CACHE[key] = _perceive
    return _PERCEIVE_CACHE[key](matrix_eb)


def pupil_conv(m, mask, stride: Tuple[int, int]):
    """Traceable pupil-window integration over the trailing two (eyebox) axes.

    One VALID ``conv_general_dilated`` with the pupil disc as kernel; leading
    axes are flattened into the conv batch.  Shared by
    :func:`eye_perceived_conv_jnp` and the sweep chunk perceiver
    (``sweep.design_sweep._chunk_perceiver``) so the window semantics live in
    one place.
    """
    import jax

    lead = m.shape[:-2]
    flat = m.reshape((-1, 1) + m.shape[-2:])          # (B, 1, eby, ebx)
    out = jax.lax.conv_general_dilated(
        flat, mask[None, None].astype(m.dtype),       # (1, 1, ms, ms)
        window_strides=stride, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(lead + out.shape[-2:])


_EVAL_JNP_CACHE = {}


def evaluate_dense(matrix_eb, cfg: EvalConfig = EvalConfig(),
                   norm: float = 1.0, chunk_rows: int = 0) -> "EvalResult":
    """Metrics over EVERY valid eye position (the reference's commented-out
    dense scan, AR_system_evaluation_functions.py:77-89) — device-side.

    Computes the dense perception stack via :func:`eye_perceived_conv_jnp`
    (stride 1) and runs the same colorimetry core as :func:`evaluate_jnp`
    over all ~4,641 eye positions; the returned ``eye_luminance`` is the
    full-resolution eyebox luminance map.  ``chunk_rows > 0`` evaluates the
    eye-position rows in chunks of that many rows (bounds peak device memory:
    the dense Lab/dE intermediates are ~(epy, epx, fy, fx) sized); chunked
    and unchunked results agree to float association (tested).
    """
    import jax

    perc = eye_perceived_conv_jnp(matrix_eb, cfg, stride=(1, 1))
    n_epy, n_epx = perc.shape[3], perc.shape[4]
    if chunk_rows <= 0 or chunk_rows >= n_epy:
        return evaluate_jnp(perc, cfg, norm=norm)

    key = ("eval", perc.shape[0], False, str(perc.dtype))
    if key not in _EVAL_JNP_CACHE:
        _EVAL_JNP_CACHE[key] = jax.jit(_make_eval_core(False))
    core = _EVAL_JNP_CACHE[key]
    inv = np.asarray(1.0 / norm, dtype=str(perc.dtype))

    de_sum = 0.0
    ratio_sum = 0.0
    u_eb_rows = []
    for y0 in range(0, n_epy, chunk_rows):
        out = jax.device_get(core(perc[:, :, :, y0 : y0 + chunk_rows], inv))
        rows = min(chunk_rows, n_epy - y0)
        de_sum += float(out["delta_e"]) * rows * n_epx
        ratio_sum += float(out["ratio_sum"])
        u_eb_rows.append(np.asarray(out["u_eb"], dtype=np.float64))
    u_eb = np.concatenate(u_eb_rows, axis=0)
    return EvalResult(
        delta_e=de_sum / (n_epy * n_epx),
        u_fov=ratio_sum / (n_epy * n_epx),
        u_eyebox=0.0 if u_eb.max() == 0 else float(u_eb.min() / u_eb.max()),
        output_image=None,
        eye_luminance=u_eb,
        starved_eye_positions=int((u_eb == 0.0).sum()),
    )


def evaluate_jnp(perceive, cfg: EvalConfig = EvalConfig(),
                 norm: float = 1.0, with_image: bool = False) -> "EvalResult":
    """Device-side :func:`evaluate` on a (L, fy, fx, epy, epx) perception stack.

    Runs the whole colorimetry pipeline (white drive, BGR flip, XYZ/Lab,
    CIEDE2000, uniformities) in ONE jit in the stack's dtype (f32 on TPU), so
    a metric evaluation pulls two scalars + the (epy, epx) luminance grid
    (~0.5 KB) instead of the perception stack plus ~0.3-0.6 s of host
    colorimetry.  ``norm`` divides the stack exactly like the host path's
    ``perceive / rays / iters`` (passed as a traced 0-d array: no retrace per
    value, no eager device op).  Values agree with the float64 host
    :func:`evaluate` to ~1e-4 relative (f32 rounding; tested in test_eval).
    ``with_image`` additionally computes and pulls the simulated eye views.

    MAINTENANCE: this is deliberately a jnp mirror of the host
    :func:`evaluate` body rather than one xp-parameterized core — the paths
    differ in dtype policy (host f64 for reference parity vs device f32) and
    image handling, and jitting an np/jnp-generic function hides which ops run
    eagerly.  Any metric-semantics change must be made in BOTH functions;
    tests/test_eval.py::test_device_metrics_path_matches_host pins their
    agreement and will catch drift.
    """
    import jax

    key = ("eval", perceive.shape[0], with_image, str(perceive.dtype))
    if key not in _EVAL_JNP_CACHE:
        _EVAL_JNP_CACHE[key] = jax.jit(_make_eval_core(with_image))

    inv = np.asarray(1.0 / norm, dtype=str(perceive.dtype))
    out = jax.device_get(_EVAL_JNP_CACHE[key](perceive, inv))
    n_epy, n_epx = perceive.shape[3], perceive.shape[4]
    return _eval_result_from_out(out, n_epy, n_epx, with_image)


def _make_eval_core(with_image: bool):
    """The single-design device colorimetry body shared by
    :func:`evaluate_jnp` (jit) and :func:`evaluate_jnp_batch`
    (jit-of-vmap): (L, fy, fx, epy, epx) perception stack -> metric dict."""
    import jax.numpy as jnp

    white_linear = color.linearize_srgb(np.ones(3))
    drive = np.linalg.solve(DISPLAY_M, white_linear)
    lab_white = color.xyz_to_lab(color.D65_XYZ_100)

    def _ev(perc, inv_norm):
        dt = perc.dtype
        perc = perc * inv_norm
        response = jnp.flip(jnp.transpose(perc, (1, 2, 0, 3, 4)), axis=2)
        adjusted = (jnp.asarray(drive, dt)[None, None, :, None, None]
                    * response)
        ep = jnp.transpose(adjusted, (3, 4, 0, 1, 2))
        xyz = ep @ jnp.asarray(DISPLAY_M_XYZ.T, dt)
        y_chan = xyz[..., 1]
        y_safe = jnp.maximum(y_chan, 1e-10)
        xyz_norm = xyz / y_safe[..., None] * 100.0
        lab = color.xyz_to_lab(xyz_norm, xp=jnp)
        lab = jnp.where((y_chan == 0.0)[..., None], 0.0, lab)
        de = color.delta_e_2000(lab, jnp.asarray(lab_white, dt), xp=jnp)
        any0 = jnp.any(y_chan == 0.0, axis=(2, 3))
        ymax = y_chan.max(axis=(2, 3))
        ratio = jnp.where(any0, 0.0,
                          y_chan.min(axis=(2, 3))
                          / jnp.where(ymax > 0, ymax, 1.0))
        u_eb = jnp.where(any0, 0.0, y_chan.mean(axis=(2, 3)))
        outs = {"delta_e": jnp.mean(de), "ratio_sum": ratio.sum(),
                "u_eb": u_eb}
        if with_image:
            rgb_linear = jnp.clip(ep @ jnp.asarray(DISPLAY_M.T, dt),
                                  0.0, 1.0)
            srgb = color.apply_srgb_gamma(rgb_linear, xp=jnp)
            peak = srgb.max(axis=(2, 3, 4), keepdims=True)
            normed = jnp.where(peak > 0,
                               srgb / jnp.where(peak > 0, peak, 1.0),
                               srgb)
            outs["image"] = jnp.transpose(normed, (2, 3, 4, 0, 1))
        return outs

    return _ev


def _eval_result_from_out(out, n_epy: int, n_epx: int,
                          with_image: bool) -> "EvalResult":
    u_eb = np.asarray(out["u_eb"], dtype=np.float64)
    return EvalResult(
        delta_e=float(out["delta_e"]),
        u_fov=float(out["ratio_sum"]) / (n_epy * n_epx),
        u_eyebox=0.0 if u_eb.max() == 0 else float(u_eb.min() / u_eb.max()),
        output_image=(np.asarray(out["image"]) if with_image else None),
        eye_luminance=u_eb,
        starved_eye_positions=int((u_eb == 0.0).sum()),
    )


def evaluate_jnp_batch(perc_stack, norm: float = 1.0) -> list:
    """Batched :func:`evaluate_jnp`: (D, L, fy, fx, epy, epx) perception
    stacks -> list of D :class:`EvalResult` in ONE jit-of-vmap dispatch and
    ONE host pull.

    The production use is full-metric design sweeps
    (:func:`..sweep.design_sweep.run_design_sweep_persistent` with
    ``evaluate_metrics=True``): ranking candidate designs by color dispersion
    / uniformity instead of raw efficiency costs one batched colorimetry pass
    over the ~KB-sized perception stacks rather than D host evaluations.
    Per-design values are identical to :func:`evaluate_jnp` on the same
    stack (vmap of the same core; pinned in test_eval)."""
    import jax

    key = ("eval_batch", perc_stack.shape[1], str(perc_stack.dtype))
    if key not in _EVAL_JNP_CACHE:
        core = _make_eval_core(with_image=False)
        _EVAL_JNP_CACHE[key] = jax.jit(
            jax.vmap(core, in_axes=(0, None)))

    inv = np.asarray(1.0 / norm, dtype=str(perc_stack.dtype))
    out = jax.device_get(_EVAL_JNP_CACHE[key](perc_stack, inv))
    n_epy, n_epx = perc_stack.shape[4], perc_stack.shape[5]
    return [
        _eval_result_from_out(
            {"delta_e": out["delta_e"][d], "ratio_sum": out["ratio_sum"][d],
             "u_eb": out["u_eb"][d]},
            n_epy, n_epx, with_image=False)
        for d in range(perc_stack.shape[0])
    ]


def evaluate(matrix_eb: Optional[np.ndarray], cfg: EvalConfig = EvalConfig(),
             perceive: Optional[np.ndarray] = None,
             with_image: bool = True) -> EvalResult:
    """Compute the four display metrics from a (L, FoVy, FoVx, eb_y, eb_x) histogram.

    ``matrix_eb`` should be normalized to per-ray units exactly as the reference
    driver does (histogram / rays_per_fov / num_iter,
    gpu_ray_tracing_pro_fullColor.py:197).  Alternatively pass ``perceive`` (an
    already pupil-integrated (L, fy, fx, n_epy, n_epx) stack, e.g. from
    :func:`eye_perceived_jnp`) and omit the histogram.  ``with_image=False``
    skips the eye-view image reconstruction (gamma + normalization) — callers
    that only read the scalar metrics (e.g. the jackknife error-bars loop,
    which calls this once per sample group) save that host work.
    """
    if perceive is None:
        perceive = eye_perceived(matrix_eb, cfg)
    n_l, n_fy, n_fx, n_epy, n_epx = perceive.shape

    # pure-white sRGB drive mapped to per-wavelength intensities (:113-118)
    white_linear = color.linearize_srgb(np.ones(3))
    drive = np.linalg.solve(DISPLAY_M, white_linear)  # (3,) per-display-primary

    # waveguide response: histogram wavelength order is (B, G, R); flip to (R, G, B)
    # exactly like the reference's np.flip(..., axis=2) (:121)
    response = np.flip(np.transpose(perceive, (1, 2, 0, 3, 4)), axis=2)
    adjusted = drive[None, None, :, None, None] * response  # (fy, fx, 3, epy, epx)

    lab_white = color.xyz_to_lab(color.D65_XYZ_100)

    # vectorized over the (n_epy, n_epx) eye-position grid — the former
    # 56-iteration Python loop cost ~0.6 s/run on a 1-core host (~20% of the
    # reference-workload wall); identical math, batched leading axes
    ep = np.transpose(adjusted, (3, 4, 0, 1, 2))  # (epy, epx, fy, fx, 3)
    if with_image:
        rgb_linear = np.clip(ep @ DISPLAY_M.T, 0.0, 1.0)
        srgb = color.apply_srgb_gamma(rgb_linear)
        # per-position brightness normalization (color.normalize_brightness
        # batched: scale each eye image so its peak channel value is 1)
        peak = srgb.max(axis=(2, 3, 4), keepdims=True)
        normed = np.where(peak > 0, srgb / np.where(peak > 0, peak, 1.0), srgb)
        output_image = np.transpose(normed, (2, 3, 4, 0, 1))
    else:
        output_image = None

    xyz = ep @ DISPLAY_M_XYZ.T
    y_chan = xyz[..., 1]                           # (epy, epx, fy, fx)
    y_safe = np.maximum(y_chan, 1e-10)
    xyz_norm = xyz / y_safe[..., None] * 100.0
    lab = color.xyz_to_lab(xyz_norm)
    lab[y_chan == 0] = 0.0
    de = color.delta_e_2000(lab, lab_white)        # (epy, epx, fy, fx)
    # mean over FoV per position, then over positions (equal counts: = global
    # mean up to float association)
    delta_e = float(np.mean(de))
    # a position with any empty (FoV, eye) bin is starved: it contributes 0 to
    # u_eb and is excluded from the u_fov sum (but still divides by the full
    # position count) — exactly the former per-position branch
    any0 = np.any(y_chan == 0, axis=(2, 3))
    ymax = y_chan.max(axis=(2, 3))
    ratio = np.where(any0, 0.0,
                     y_chan.min(axis=(2, 3)) / np.where(ymax > 0, ymax, 1.0))
    u_eb = np.where(any0, 0.0, y_chan.mean(axis=(2, 3)))

    u_fov = float(ratio.sum()) / (n_epy * n_epx)
    u_eyebox = 0.0 if u_eb.max() == 0 else float(u_eb.min() / u_eb.max())
    starved = int((u_eb == 0.0).sum())
    return EvalResult(
        delta_e=delta_e,
        u_fov=u_fov,
        u_eyebox=u_eyebox,
        output_image=output_image,
        eye_luminance=u_eb,
        starved_eye_positions=starved,
    )


def wavelength_channel_names(n_wavelengths: int) -> list:
    """Display names per wavelength index: (B, G, R) for the standard 3-channel
    layout (couplers_coor.py:132), generic ``lmd{i}`` otherwise."""
    if n_wavelengths == 3:
        return ["B", "G", "R"]
    return [f"lmd{i}" for i in range(n_wavelengths)]


def efficiencies(matrix_eb: np.ndarray, rays_per_fov: float, num_iter: int) -> dict:
    """Per-color system efficiency (gpu_ray_tracing_pro_fullColor.py:186-192).

    The xL factor undoes the 1/L wavelength split of the launched rays (x3 in
    the reference); wavelength index order is (B, G, R) for L=3.
    """
    L = matrix_eb.shape[0]
    num_rays = rays_per_fov * matrix_eb.shape[1] * matrix_eb.shape[2] * L
    per_fov = matrix_eb.sum(axis=(-2, -1)) / num_rays / num_iter
    names = wavelength_channel_names(L)
    return {names[i]: float(per_fov[i].sum() * L) for i in range(L)}
