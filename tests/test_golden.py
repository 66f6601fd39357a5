"""End-to-end golden regression: full pipeline on a fixed seed.

Golden values are self-minted (the reference publishes no numbers, SURVEY.md
section 6) from the deterministic pipeline at commit time; any semantic change to
seeding, tracing, histogramming, or metrics moves them.  Tolerances allow benign
float reassociation but catch real behavior changes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
    Simulator,
)

GOLDEN = {
    "eff_R": 0.033594,
    "eff_G": 0.026224,
    "eff_B": 0.023802,
    "delta_e": 50.5147,
    "total_bounces": 689_796,
}


@pytest.fixture(scope="module")
def result():
    cfg = TraceConfig(num_fov_x=8, num_fov_y=6, rays_per_fov=400, num_iter=2,
                      max_bounces=500, seed=123, rng_mode="fast",
                      ic_test="circle")
    return Simulator(cfg=cfg).run()


def test_golden_efficiencies(result):
    assert result.efficiencies["R"] == pytest.approx(GOLDEN["eff_R"], rel=0.02)
    assert result.efficiencies["G"] == pytest.approx(GOLDEN["eff_G"], rel=0.02)
    assert result.efficiencies["B"] == pytest.approx(GOLDEN["eff_B"], rel=0.02)


def test_golden_dispersion(result):
    assert result.metrics.delta_e == pytest.approx(GOLDEN["delta_e"], rel=0.02)


def test_golden_bounces(result):
    assert result.total_bounces == pytest.approx(GOLDEN["total_bounces"], rel=0.01)


def test_histogram_norm_matches_efficiency(result):
    """The reference's two normalizations must stay consistent: summed per-color
    efficiency x rays = total deposits (gpu_ray_tracing_pro_fullColor.py:186-192)."""
    total_eff = sum(result.efficiencies.values()) / 3  # undo the x3 split factor
    deposits = result.histogram.sum()
    assert deposits == pytest.approx(total_eff * result.rays_traced, rel=1e-6)
