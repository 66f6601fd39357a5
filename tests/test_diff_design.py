"""Differentiable analytic-LUT design pipeline (design/diff.py + opt grating).

1. parity: the jnp re-derivation at the base design must reproduce the
   host-side numpy pipeline's cell-table entries (geometry.py:359-415 +
   luts/packing.py) to float32 accuracy;
2. gradients: jax.grad of the full loss (analytic tables -> splitting trace ->
   eyebox objective) must match central finite differences;
3. the Adam driver moves lambda_ic / phi_ic and is deterministic.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (  # noqa: E402
    TraceConfig,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (  # noqa: E402
    generate_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design.diff import (  # noqa: E402
    analytic_cell_tables, design_params,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (  # noqa: E402
    seeding, trace_jnp,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.trace_geometry import (  # noqa: E402
    build_trace_geometry,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import (  # noqa: E402
    make_synthetic_luts,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (  # noqa: E402
    build_cell_tables,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.opt import (  # noqa: E402
    make_grating_loss, optimize_grating,
)

M, N = 4, 3


@pytest.fixture(scope="module")
def setup():
    geom = generate_geometry(num_fov_x=M, num_fov_y=N)
    luts = make_synthetic_luts(geom, seed=77)
    tables = build_cell_tables(geom, luts)
    tgeom = build_trace_geometry(geom, simplify_tol=1e-3)
    cfg = TraceConfig(num_fov_x=M, num_fov_y=N, rays_per_fov=8,
                      max_bounces=200, seed=5, rng_mode="fast",
                      ic_test="circle")
    return geom, luts, tables, tgeom, cfg


def test_analytic_tables_match_host_pipeline(setup):
    """At the base design the jnp tables equal the numpy-built ones."""
    geom, luts, tables, tgeom, cfg = setup
    T0 = trace_jnp._as_jnp(tables)
    ana = analytic_cell_tables(design_params(geom.design), geom.design,
                               M, N, tgeom.num_fc, tgeom.num_oc)
    for key in ana:
        got = np.asarray(ana[key])
        want = np.asarray(T0[key])
        assert got.shape == want.shape, key
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=key)


def test_grating_gradients_match_finite_differences(setup):
    """AD through analytic tables -> splitting trace (soft deposits) vs FD.

    The loss is piecewise smooth: region-membership tests (hull / OC rect /
    eyebox quad) are step functions of the hop vectors, so a finite step h
    that moves any wavefront path across a boundary adds an O(path-weight)
    jump the continuum gradient rightly ignores.  Soft (cloud-in-cell)
    deposits remove the dominant bin-crossing jumps; the remaining region
    jumps bound how small a step must be: at h = 1e-4 (0.01% pitch) the fixed
    seed's paths cross no boundary and FD tracks AD to ~10%.  phi_ic's smooth
    gradient at this tiny workload is below the jump-noise floor, so it is
    checked for finiteness + the optimizer test, not FD.
    """
    geom, luts, tables, tgeom, cfg = setup
    batch = seeding.build_ray_batch(geom, cfg)
    rays0 = trace_jnp.make_ray_state(
        batch["x"], batch["y"], batch["te"], batch["tm"], batch["cid"],
        batch["idx"], batch["rng"])
    loss, _ = make_grating_loss(
        tables, tgeom, cfg, rays0, geom.design,
        opt_params=("lambda_ic", "phi_ic"),
        capacity=2048, fixed_steps=40, weight_threshold=1e-9)

    f = jax.jit(lambda th: loss(th)[0])
    g = jax.jit(jax.grad(lambda th: loss(th)[0]))

    theta0 = {"lambda_ic": jnp.zeros(()), "phi_ic": jnp.zeros(())}
    grads = g(theta0)
    assert all(np.isfinite(float(v)) for v in grads.values())
    ad = float(grads["lambda_ic"])
    assert abs(ad) > 1.0  # the pitch gradient carries real signal

    h = 1e-4
    tp = dict(theta0)
    tm = dict(theta0)
    tp["lambda_ic"] = jnp.asarray(h, jnp.float32)
    tm["lambda_ic"] = jnp.asarray(-h, jnp.float32)
    fd = (float(f(tp)) - float(f(tm))) / (2 * h)
    assert ad == pytest.approx(fd, rel=0.3), (ad, fd)


def test_optimize_grating_moves_parameters(setup):
    geom, luts, tables, tgeom, cfg = setup
    res = optimize_grating(geom, tables, tgeom, cfg,
                           opt_params=("lambda_ic", "phi_ic"),
                           rays_per_fov=4, steps=3, learning_rate=0.02,
                           capacity=1024, fixed_steps=32)
    assert len(res.loss_history) == 4
    assert np.isfinite(res.loss_history).all()
    d = geom.design
    # Adam with nonzero gradients must actually move the knobs
    assert res.params["lambda_ic"] != d.lambda_ic
    assert res.params["phi_ic"] != d.phi_ic
    # and stay in a physical neighbourhood (multiplicative pitch param)
    assert 0.8 * d.lambda_ic < res.params["lambda_ic"] < 1.25 * d.lambda_ic

    res2 = optimize_grating(geom, tables, tgeom, cfg,
                            opt_params=("lambda_ic", "phi_ic"),
                            rays_per_fov=4, steps=3, learning_rate=0.02,
                            capacity=1024, fixed_steps=32)
    assert res.params == res2.params  # deterministic
