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


@pytest.fixture(scope="module")
def boosted_tail(pers_sim):
    """One tail build + one independent long reference, shared by the
    unbiasedness and positivity tests.  The reference budget (256x) sits in
    a seed-tag octave above every possible tier (max_boost 128 -> top tier
    tag log2(128 * 256); _tail_pass displaces streams by int(log2(budget))),
    so the reference stream is independent of every tier stream — a
    power-of-two reference equal to a tier would silently share its stream
    and the comparison would be vacuous for those cells."""
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=128.0)
    hy.build_tail(cells_per_batch=64)
    sel, rows, sums, frag = hy._tail
    n_ref = 256 * CFG.rays_per_fov
    ref_rows, ref_sums, _n = hy._tail_pass(sel, n_ref)
    return dict(hy=hy, sel=sel, rows=rows, sums=sums, frag=frag,
                n_ref=n_ref, ref_rows=ref_rows, ref_sums=ref_sums)


def test_boost_tail_unbiased_means_match(boosted_tail):
    """Per-cell z-scores vs an independent long reference (VERDICT r4 #8):
    each selected cell's boosted tile sum must agree with the fresh
    256x-budget uniform-MC stream within Poisson standard error —
    cell-resolved, so a compensating bias across cells cannot hide the way
    a global mean-ratio check allowed."""
    bt = boosted_tail
    sums, ref_sums, n_ref = bt["sums"], bt["ref_sums"], bt["n_ref"]
    # per-cell boost sample counts (tier x budget), recorded by build_tail
    n_cell = (np.asarray(bt["frag"]["cell_tier"])
              * CFG.rays_per_fov * CFG.num_iter)
    assert n_cell.shape == sums.shape and (n_cell > 0).all()
    # Poisson: Var[sum_per_ray] = rate / n; estimate the rate from the
    # higher-resolution stream, floor it to keep dark cells well-defined
    rate = np.maximum(ref_sums, 1.0 / n_ref)
    z = (sums - ref_sums) / np.sqrt(rate / n_cell + rate / n_ref)
    assert np.abs(z).max() < 6.0, (z.min(), z.max())
    # no systematic sign: the mean of C standard normals is ~N(0, 1/C)
    assert abs(z.mean()) < 4.0 / np.sqrt(len(z)), z.mean()


def test_boost_rows_positive_where_reference_positive(boosted_tail):
    """Post-boost rows are positive in every window the long reference run
    finds substantially reachable (the positivity property that un-starves
    u_eyebox).  'Substantial' = >= 40 reference counts at 256x budget, i.e.
    window rate >= ~0.16 per unit budget: a max-tier (128x) boost then
    expects >= ~20 counts, and pilot-positive tiers expect ~1.5*tau_target
    by construction, so P[any miss] < 1e-8 x windows — a sharp assertion,
    not the vacuous rows >= 0 this test once checked (VERDICT r4 #8)."""
    bt = boosted_tail
    rows, ref_rows, n_ref = bt["rows"], bt["ref_rows"], bt["n_ref"]
    assert bt["frag"]["tail_rays"] > 0
    substantial = ref_rows * n_ref >= 40.0
    assert substantial.any()           # the reference does reach windows
    assert (rows[substantial] > 0.0).all(), (
        int((rows[substantial] == 0).sum()), "windows missed by the boost")


def test_boost_tail_reuses_cache(pers_sim):
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=64.0)
    hy.build_tail(cells_per_batch=64)
    tail1 = hy._tail
    res, d = hy.run(cells_per_batch=64)
    assert hy._tail is tail1  # no rebuild on run
