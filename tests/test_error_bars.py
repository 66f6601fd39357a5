"""MC error bars: jackknife standard errors over num_iter sample groups."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
    Simulator,
)


@pytest.fixture(scope="module")
def sim():
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=256,
                      max_bounces=400, seed=0, rng_mode="fast",
                      ic_test="circle")
    return Simulator(cfg=cfg, engine="pallas_persistent", interpret=True,
                     geometry_simplify_tol=0.05, persistent_slots=128)


def test_error_groups_produces_stderr(sim):
    res = sim.run(num_iter=3, cells_per_batch=36, error_groups=True,
                  histogram_device=False)
    se = res.metric_stderr
    assert se is not None
    for key in ("eff_R", "eff_G", "eff_B", "delta_e", "u_fov", "u_eyebox"):
        assert key in se and np.isfinite(se[key]) and se[key] >= 0, key
    # with 3 x 256 rays/FoV the efficiency SE must be well below the value
    assert se["eff_G"] < res.efficiencies["G"]
    # binomial sanity: eff SE should be the right order of magnitude
    # (sqrt(p(1-p)/n) per cell-group; jackknife sees the same sampling noise)
    p = res.efficiencies["G"]
    n = res.rays_traced / 3  # rays per wavelength channel
    binom = np.sqrt(p * (1 - p) / n) * 3  # x L from the channel split factor
    assert 0.05 * binom < se["eff_G"] < 20 * binom


def test_error_groups_requires_iterations(sim):
    with pytest.raises(ValueError, match="num_iter"):
        sim.run(num_iter=1, cells_per_batch=36, error_groups=True)


def test_error_groups_requires_persistent_engine():
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=64,
                      max_bounces=200, seed=0)
    s = Simulator(cfg=cfg, engine="jnp")
    with pytest.raises(ValueError, match="persistent"):
        s.run(num_iter=2, error_groups=True)
