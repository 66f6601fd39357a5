"""Cross-design parity fuzzing: oracle vs jnp engine on perturbed designs.

The per-ray parity suite (test_trace_parity.py) anchors the engines to the
scalar oracle on the *paper* design only; design sweeps and the optimizer visit
geometry the paper never exercises (different grating periods/orientations,
substrate thickness, eyebox placement).  This file re-runs the per-ray
oracle-vs-engine comparison on a spread of perturbed designs so any
design-dependent branch (band binning edges, region-hull shapes, TIR-angle
corner cases) is exercised, not just the single default.

Engine side uses the dynamic-argument trace fn (tables/geometry as call
arguments, the design-sweep path) so every design shares ONE compiled program —
geometry half-planes are padded to a fixed budget.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
    DEG,
    TraceConfig,
    WaveguideDesign,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
    seeding,
    trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.oracle import OracleTracer
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
    build_cell_tables,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep.design_sweep import (
    _pad_hp,
)

M, N = 6, 5
HP_PAD = 48  # fixed half-plane budget so all designs share one compiled program

# Perturbations chosen to move every geometric degree of freedom while staying
# physically valid (gratings keep the light within TIR, eyebox stays on the
# substrate).  Strip counts are fixed so table shapes (and the compile) are
# shared; a strip-count variant runs in the slow tier below.
PERTURBATIONS = [
    {"lambda_ic": 379.0, "lambda_oc": 379.0},
    {"phi_ic": -33.0 * DEG, "phi_oc": -147.0 * DEG, "thickness": 0.55},
    {"eyebox_center": (2.0, 13.0), "eyebox_size": (10.0, 9.0),
     "pupil_radius": 1.6, "fov_x": 16.0 * DEG},
]


def _engine_vs_oracle(design: WaveguideDesign, trace_core, cfg):
    geom = generate_geometry(design, M, N)
    luts = make_synthetic_luts(geom)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom)
    tg_pad = dataclasses.replace(
        tgeom,
        ic_hp=_pad_hp(tgeom.ic_hp, HP_PAD),
        r1_hp=_pad_hp(tgeom.r1_hp, HP_PAD),
        r2_hp=_pad_hp(tgeom.r2_hp, HP_PAD),
        hull_hp=_pad_hp(tgeom.hull_hp, HP_PAD),
    )

    cells = np.array(
        [(l * M + m) * N + n
         for l in range(3) for m in (0, M - 1) for n in (0, N - 1)]
    )
    batch = seeding.build_ray_batch(geom, cfg, cell_ids=cells)
    rays = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"],
        batch["cid"], batch["idx"], batch["rng"],
    )
    T = trace_jnp._as_jnp(tables)
    G = trace_jnp._geom_jnp(tg_pad)
    rays_f, bounces = trace_core(rays, T, G)

    oracle = OracleTracer(geom, luts, max_bounces=cfg.max_bounces)
    cid = batch["cid"]
    o_rays = dict(
        x=batch["x"], y=batch["y"],
        m=(cid % (M * N)) // N, n=cid % N, lmd=cid // (M * N),
        te=np.abs(batch["te"]).astype(float),
        tm=np.abs(batch["tm"]).astype(float),
        delta=np.zeros(len(cid)),
    )
    oracle.trace(o_rays, batch["rng"].astype(np.int64).copy())

    dep_e = np.asarray(rays_f["dep"])
    dep_o = oracle.outcomes
    frac = (dep_e == dep_o).mean()
    deposits = (dep_o >= 0).sum()
    return frac, deposits, int(bounces), oracle.total_bounces


@pytest.fixture(scope="module")
def core():
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=60,
                      max_bounces=400, rng_mode="parity", ic_test="polygon")
    return cfg, trace_jnp.make_trace_fn_dynamic(cfg, 7, 6, M * N)


@pytest.mark.parametrize("overrides", PERTURBATIONS)
def test_perturbed_design_matches_oracle(core, overrides):
    cfg, trace_core = core
    design = dataclasses.replace(WaveguideDesign(), **overrides)
    frac, deposits, b_e, b_o = _engine_vs_oracle(design, trace_core, cfg)
    assert frac > 0.995, f"per-ray agreement too low: {frac} ({overrides})"
    assert deposits > 0, f"degenerate fuzz case (no deposits): {overrides}"
    assert abs(b_e - b_o) / max(b_o, 1) < 0.02


@pytest.mark.slow
@pytest.mark.parametrize("overrides", [
    {"num_fc": 9, "num_oc": 5, "lambda_ic": 392.0, "lambda_oc": 385.0},
    {"num_fc": 5, "num_oc": 8, "phi_ic": -42.0 * DEG, "thickness": 0.8},
])
def test_strip_count_variants_match_oracle(overrides):
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=60,
                      max_bounces=400, rng_mode="parity", ic_test="polygon")
    design = dataclasses.replace(WaveguideDesign(), **overrides)
    trace_core = trace_jnp.make_trace_fn_dynamic(
        cfg, design.num_fc, design.num_oc, M * N)
    frac, deposits, b_e, b_o = _engine_vs_oracle(design, trace_core, cfg)
    assert frac > 0.995, f"per-ray agreement too low: {frac} ({overrides})"
    assert deposits > 0
    assert abs(b_e - b_o) / max(b_o, 1) < 0.02
