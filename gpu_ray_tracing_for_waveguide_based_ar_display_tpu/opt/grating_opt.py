"""Gradient-based grating apodization: differentiate the eyebox through the tracer.

A capability the reference does not have (its design loop is manual: edit
constants in ``couplers_coor.py``, re-run, eyeball the heatmaps —
gpu_ray_tracing_pro_fullColor.py:16-63).  Here the deterministic splitting
tracer (:mod:`..engine.splitting`) is run in its differentiable configuration
(fixed-length ``lax.scan``, cell tables as a traced argument), so the whole
map from per-strip grating strengths to the eyebox energy distribution is one
reverse-mode-differentiable JAX program.  ``optimize_apodization`` then does
what AR-waveguide designers do by hand — weaken the early out-coupler strips
so energy survives to the far strips, flattening the eyebox — as a few dozen
Adam steps on TPU.

The design surrogate: scaling a grating's diffracted-order Jones matrix by
``s`` in [0, 1] scales that order's diffraction efficiency by ``s**2`` —
first-order behavior of shallowing the grating (the freed energy is treated
as staying in the zero order only through the roulette's survival
renormalization; a full RCWA re-solve is out of scope, so ``s`` is a
*relative* apodization against the LUT's as-solved stack).  Knobs:

- ``s_fc`` (num_fc,): the folding coupler's redirect order (branch B,
  ``fc_jones[1]``) per strip,
- ``s_oc`` (num_oc,): the out-coupler's diffracted orders (branch B reversal
  + branch C out-couple, ``oc_jones[1:]``) per strip.

Both are sigmoid-parameterized, so any real theta maps to a physical
0 < s < 1 and gradients never push the design out of range.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraceConfig
from ..engine import seeding, splitting, trace_jnp
from ..engine.trace_geometry import TraceGeometry
from ..luts.packing import CellTables


def apply_apodization(T: dict, s_fc: jnp.ndarray, s_oc: jnp.ndarray) -> dict:
    """Scale the diffracted-order Jones tables by per-strip amplitudes.

    ``T`` is a :func:`..engine.trace_jnp._as_jnp` table pytree (split-real:
    complex arrays carry a trailing (re, im) axis).  fc_jones is
    (branch, S_fc, bit, C, 2, 2, reim); oc_jones is (branch, S_oc, ...).
    """
    T = dict(T)
    T["fc_jones"] = T["fc_jones"].at[1].multiply(
        s_fc[:, None, None, None, None, None])
    T["oc_jones"] = T["oc_jones"].at[1:].multiply(
        s_oc[None, :, None, None, None, None, None])
    return T


@dataclasses.dataclass
class ApodizationResult:
    s_fc: np.ndarray             # (num_fc,) optimized amplitudes
    s_oc: np.ndarray             # (num_oc,)
    loss_history: np.ndarray     # (steps + 1,) loss[0] = initial design
    efficiency: Tuple[float, float]      # (initial, final) mean out-coupled
    nonuniformity: Tuple[float, float]   # (initial, final) FoV rel. std


def _eyebox_objective(hist, L, M, N, ny, nx, n0, eff_weight,
                      fov_uniformity_weight, eyebox_uniformity_weight,
                      pupil=None):
    """Differentiable loss reductions of the zero-variance eyebox histogram:
    maximize mean efficiency, minimize FoV / eyebox nonuniformity.

    ``pupil``: optional (ms, ms) pupil-disc mask.  When given, the eyebox
    term is the relative std of the PUPIL-INTEGRATED radiance over every
    valid eye position (one differentiable conv via
    :func:`..eval.metrics.pupil_conv`) instead of raw 0.1 mm bins — the
    quantity the evaluation metrics actually score (a bin-level ripple finer
    than the pupil is invisible to the eye and should not be penalized).
    """
    eps = 1e-12
    h = hist.reshape(L, N, M, ny, nx)
    e_fov = h.sum(axis=(3, 4)) * (L * M * N / n0)   # (L, N, M) per-FoV eff
    eff = e_fov.mean()
    mu = e_fov.mean(axis=(1, 2))
    fov_nonuni = (jnp.sqrt(((e_fov - mu[:, None, None]) ** 2)
                           .mean(axis=(1, 2))) / (mu + eps)).mean()
    e_bins = h.sum(axis=(1, 2))                      # (L, ny, nx)
    if pupil is not None:
        from ..eval.metrics import pupil_conv

        e_bins = pupil_conv(e_bins, pupil.astype(e_bins.dtype), (1, 1))
    mu_b = e_bins.mean(axis=(1, 2))
    eb_nonuni = (jnp.sqrt(((e_bins - mu_b[:, None, None]) ** 2)
                          .mean(axis=(1, 2))) / (mu_b + eps)).mean()
    val = (-eff_weight * eff / 0.03
           + fov_uniformity_weight * fov_nonuni
           + eyebox_uniformity_weight * eb_nonuni)
    return val, (eff, fov_nonuni, eb_nonuni)


def _pupil_for(pupil_bins: int, ny: int, nx: int):
    """The loss's pupil-disc mask, or None for raw-bin uniformity.

    ``pupil_bins`` is clamped to the eyebox so tiny test grids stay valid,
    but a pupil that leaves only one valid eye position would make the
    integrated nonuniformity identically zero — the term would silently
    stop contributing, so that is an error, not a clamp."""
    if pupil_bins <= 0:
        return None
    ms = min(pupil_bins, ny, nx)
    if (ny - ms + 1) * (nx - ms + 1) < 2:
        raise ValueError(
            f"pupil_bins={pupil_bins} leaves <2 valid eye positions on the "
            f"({ny}, {nx}) eyebox — the pupil-integrated uniformity term "
            f"would be identically 0; use a smaller pupil or pupil_bins=0")
    from ..eval.metrics import pupil_mask

    return jnp.asarray(pupil_mask(ms))


def make_apodization_loss(
    tables: CellTables,
    tgeom: TraceGeometry,
    cfg: TraceConfig,
    rays0: dict,
    capacity: int = 4096,
    fixed_steps: int = 64,
    weight_threshold: float = 1e-4,
    eff_weight: float = 1.0,
    fov_uniformity_weight: float = 1.0,
    eyebox_uniformity_weight: float = 0.25,
    pupil_bins: int = 0,
):
    """Build ``loss(theta) -> (scalar, aux)`` plus the base table pytree.

    ``theta`` is a dict ``{"fc": (num_fc,), "oc": (num_oc,)}`` of
    pre-sigmoid parameters.  ``aux`` is ``(efficiency, fov_nonuni,
    eyebox_nonuni)`` — all differentiable reductions of the splitting
    tracer's zero-variance eyebox histogram.  ``pupil_bins > 0`` scores the
    eyebox term on pupil-integrated radiance (disc of that many bins over
    every valid eye position) instead of raw bins.
    """
    T0 = trace_jnp._as_jnp(tables)
    trace = splitting.make_splitting_trace_fn(
        tables, tgeom, cfg, capacity=capacity,
        weight_threshold=weight_threshold, table_arg=True,
        fixed_steps=fixed_steps)
    ny, nx = cfg.eyebox_bins
    L, M, N = tables.L, tables.M, tables.N
    n0 = max(len(rays0["x"]), 1)
    pupil = _pupil_for(pupil_bins, ny, nx)

    def loss(theta: Dict[str, jnp.ndarray]):
        s_fc = jax.nn.sigmoid(theta["fc"])
        s_oc = jax.nn.sigmoid(theta["oc"])
        T = apply_apodization(T0, s_fc, s_oc)
        hist, out_w, _, _, _ = trace(rays0, T)
        return _eyebox_objective(hist, L, M, N, ny, nx, n0, eff_weight,
                                 fov_uniformity_weight,
                                 eyebox_uniformity_weight, pupil=pupil)

    return loss, T0


def optimize_apodization(
    geom,
    tables: CellTables,
    tgeom: TraceGeometry,
    cfg: TraceConfig,
    rays_per_fov: int = 16,
    steps: int = 40,
    learning_rate: float = 0.15,
    theta0: float = 2.0,
    seed: Optional[int] = None,
    **loss_kw,
) -> ApodizationResult:
    """Run Adam on the per-strip grating amplitudes; returns the apodization.

    ``geom`` is the :class:`..design.geometry.DesignGeometry` the tables were
    packed from.  The launch set reuses the production seeding path (the same
    pupil sampling the MC engines trace), so the optimized design is evaluated
    under the simulator's own workload.  ``theta0 = 2.0`` starts near
    s = 0.88, close to the unapodized LUT stack but inside sigmoid's
    responsive range.
    """
    import optax

    # build the launch wavefront with the standard seeding path
    cfg_r = dataclasses.replace(cfg, rays_per_fov=rays_per_fov,
                                seed=cfg.seed if seed is None else seed)
    batch = seeding.build_ray_batch(geom, cfg_r)
    rays0 = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"], batch["cid"],
        batch["idx"], batch["rng"])

    loss, _ = make_apodization_loss(tables, tgeom, cfg, rays0, **loss_kw)
    vg = jax.jit(jax.value_and_grad(loss, has_aux=True))

    theta = {
        "fc": jnp.full((tgeom.num_fc,), theta0, jnp.float32),
        "oc": jnp.full((tgeom.num_oc,), theta0, jnp.float32),
    }
    opt = optax.adam(learning_rate)
    state = opt.init(theta)
    history = []
    aux0 = aux = None
    for _ in range(steps):
        (val, aux), grads = vg(theta)
        if aux0 is None:
            aux0 = aux
        history.append(float(val))
        updates, state = opt.update(grads, state)
        theta = optax.apply_updates(theta, updates)
    (val, aux), _ = vg(theta)
    history.append(float(val))
    if aux0 is None:  # steps=0: report the initial design through the same path
        aux0 = aux
    return ApodizationResult(
        s_fc=np.asarray(jax.nn.sigmoid(theta["fc"])),
        s_oc=np.asarray(jax.nn.sigmoid(theta["oc"])),
        loss_history=np.asarray(history),
        efficiency=(float(aux0[0]), float(aux[0])),
        nonuniformity=(float(aux0[1]), float(aux[1])),
    )


# ---------------------------------------------------------------------------
# grating period / orientation optimization (differentiable analytic LUTs)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GratingOptResult:
    params: Dict[str, float]     # optimized design parameter values
    loss_history: np.ndarray     # (steps + 1,)
    efficiency: Tuple[float, float]      # (initial, final)
    nonuniformity: Tuple[float, float]   # (initial, final)
    s_fc: Optional[np.ndarray] = None    # joint mode: optimized amplitudes
    s_oc: Optional[np.ndarray] = None


def make_grating_loss(
    tables: CellTables,
    tgeom: TraceGeometry,
    cfg: TraceConfig,
    rays0: dict,
    design,
    opt_params: Tuple[str, ...] = ("lambda_ic", "phi_ic"),
    capacity: int = 4096,
    fixed_steps: int = 64,
    weight_threshold: float = 1e-4,
    eff_weight: float = 1.0,
    fov_uniformity_weight: float = 1.0,
    eyebox_uniformity_weight: float = 0.25,
    pupil_bins: int = 0,
    apodize: bool = False,
    param_box: float = 0.05,
):
    """Build ``loss(theta) -> (scalar, aux)`` over grating design parameters.

    ``param_box`` bounds the search to a trust region around the base design
    — periods within ``exp(+-box)`` (~+-5% pitch), orientations within
    ``+-box`` rad — via a tanh squash.  The analytic-table surrogate holds
    the RCWA Jones blocks and footprint polygons at the base design, so it
    is only *valid* near it; unbounded knobs let Adam walk the k-closure
    into evanescent regimes the surrogate cannot see (the re-generated
    geometry there is NaN).

    ``apodize=True`` makes the optimization JOINT: ``theta`` additionally
    carries pre-sigmoid per-strip amplitude knobs (``"fc"`` (S_fc,), ``"oc"``
    (S_oc,), cf. :func:`make_apodization_loss`), applied on top of the
    re-derived analytic tables — one loss over (grating k-vector, strip
    apodization) together, the coupling the two single-family optimizers
    cannot see.

    ``theta`` holds one unitless knob per name in ``opt_params``: periods are
    parameterized multiplicatively (``lambda = lambda0 * exp(t)``, so Adam's
    unitless steps act in relative pitch) and orientations additively
    (``phi = phi0 + t``, radians).  Each evaluation re-derives the analytic
    cell tables in jnp (:func:`..design.diff.analytic_cell_tables` — gaps,
    TIR phasors, cos scales) at the parameterized design and traces the
    zero-variance splitting wavefront through them; RCWA Jones blocks and the
    footprint polygons stay at the base design (the documented surrogate,
    design/diff.py).
    """
    from ..design.diff import (
        analytic_cell_tables, apply_design_params, design_params,
    )

    T0 = trace_jnp._as_jnp(tables)
    # soft (cloud-in-cell) deposits: the grating parameters act mostly by
    # *moving* deposits (hop spacing); hard binning makes that a measure-zero
    # jump with zero a.e. gradient, bilinear splatting makes it continuous
    trace = splitting.make_splitting_trace_fn(
        tables, tgeom, cfg, capacity=capacity,
        weight_threshold=weight_threshold, table_arg=True,
        fixed_steps=fixed_steps, soft_binning=True)
    ny, nx = cfg.eyebox_bins
    L, M, N = tables.L, tables.M, tables.N
    n0 = max(len(rays0["x"]), 1)
    base = design_params(design)
    pupil = _pupil_for(pupil_bins, ny, nx)

    def loss(theta: Dict[str, jnp.ndarray]):
        p = dict(base)
        for k in opt_params:
            t = param_box * jnp.tanh(theta[k])
            if k == "lambda_tied":
                # move BOTH coupler pitches as a unit (the sweep convention):
                # the k-closure's IC<->OC symmetry is preserved, so the
                # optimized design re-generates to a matched system —
                # detuning lambda_ic alone collapses exact efficiency ~3x
                # (recorded in demo_metrics joint history)
                p["lambda_ic"] = base["lambda_ic"] * jnp.exp(t)
                p["lambda_oc"] = base["lambda_oc"] * jnp.exp(t)
            elif k == "phi_tied":
                p["phi_ic"] = base["phi_ic"] + t
                p["phi_oc"] = base["phi_oc"] + t
            else:
                p[k] = (base[k] * jnp.exp(t) if k.startswith("lambda")
                        else base[k] + t)
        ana = analytic_cell_tables(p, design, M, N, tgeom.num_fc,
                                   tgeom.num_oc)
        T = apply_design_params(T0, ana)
        if apodize:
            T = apply_apodization(T, jax.nn.sigmoid(theta["fc"]),
                                  jax.nn.sigmoid(theta["oc"]))
        hist, out_w, _, _, _ = trace(rays0, T)
        return _eyebox_objective(hist, L, M, N, ny, nx, n0, eff_weight,
                                 fov_uniformity_weight,
                                 eyebox_uniformity_weight, pupil=pupil)

    return loss, T0


def optimize_grating(
    geom,
    tables: CellTables,
    tgeom: TraceGeometry,
    cfg: TraceConfig,
    opt_params: Tuple[str, ...] = ("lambda_ic", "phi_ic"),
    rays_per_fov: int = 16,
    steps: int = 30,
    learning_rate: float = 0.01,
    seed: Optional[int] = None,
    apodize: bool = False,
    apod_theta0: float = 2.0,
    param_box: float = 0.05,
    **loss_kw,
) -> GratingOptResult:
    """Adam on grating period/orientation through the differentiable trace.

    ``apodize=True`` optimizes the per-strip FC/OC amplitudes JOINTLY with
    the grating parameters (one Adam state over both; the apodization knobs
    start at ``apod_theta0`` like :func:`optimize_apodization`)."""
    import optax

    cfg_r = dataclasses.replace(cfg, rays_per_fov=rays_per_fov,
                                seed=cfg.seed if seed is None else seed)
    batch = seeding.build_ray_batch(geom, cfg_r)
    rays0 = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"], batch["cid"],
        batch["idx"], batch["rng"])

    loss, _ = make_grating_loss(tables, tgeom, cfg, rays0, geom.design,
                                opt_params=opt_params, apodize=apodize,
                                param_box=param_box, **loss_kw)
    vg = jax.jit(jax.value_and_grad(loss, has_aux=True))

    theta = {k: jnp.zeros((), jnp.float32) for k in opt_params}
    if apodize:
        theta["fc"] = jnp.full((tgeom.num_fc,), apod_theta0, jnp.float32)
        theta["oc"] = jnp.full((tgeom.num_oc,), apod_theta0, jnp.float32)
    opt = optax.adam(learning_rate)
    state = opt.init(theta)
    history = []
    aux0 = aux = None
    for _ in range(steps):
        (val, aux), grads = vg(theta)
        if aux0 is None:
            aux0 = aux
        history.append(float(val))
        updates, state = opt.update(grads, state)
        theta = optax.apply_updates(theta, updates)
    (val, aux), _ = vg(theta)
    history.append(float(val))
    if aux0 is None:  # steps=0: report the initial design through the same path
        aux0 = aux
    d = geom.design
    final = {}
    for k in opt_params:
        t = param_box * float(np.tanh(float(theta[k])))
        if k == "lambda_tied":
            final["lambda_ic"] = d.lambda_ic * float(np.exp(t))
            final["lambda_oc"] = d.lambda_oc * float(np.exp(t))
        elif k == "phi_tied":
            final["phi_ic"] = d.phi_ic + t
            final["phi_oc"] = d.phi_oc + t
        else:
            base = getattr(d, k)
            final[k] = (base * float(np.exp(t)) if k.startswith("lambda")
                        else base + t)
    return GratingOptResult(
        params=final,
        loss_history=np.asarray(history),
        efficiency=(float(aux0[0]), float(aux[0])),
        nonuniformity=(float(aux0[1]), float(aux[1])),
        s_fc=(np.asarray(jax.nn.sigmoid(theta["fc"])) if apodize else None),
        s_oc=(np.asarray(jax.nn.sigmoid(theta["oc"])) if apodize else None),
    )
