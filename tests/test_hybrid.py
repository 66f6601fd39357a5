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
    """One tail build + two independent long references, shared by the
    unbiasedness and positivity tests.  The reference budgets (256x, 512x)
    sit in seed-tag octaves above every possible tier (max_boost 64 -> top
    tier tag log2(64 * 256); _tail_pass displaces streams by
    int(log2(budget))), so both reference streams are independent of every
    tier stream and of each other — a reference budget sharing a tier's
    octave would silently share its stream and the comparison would be
    vacuous for those cells."""
    hy = TailBoostHybrid(pers_sim, tau_select=35.0, tau_target=25.0,
                         max_boost=64.0)
    hy.build_tail(cells_per_batch=64)
    sel, rows, sums, frag = hy._tail
    n1 = 256 * CFG.rays_per_fov
    n2 = 512 * CFG.rays_per_fov
    ref1_rows, ref1_sums, _ = hy._tail_pass(sel, n1)
    ref2_rows, ref2_sums, _ = hy._tail_pass(sel, n2)
    return dict(hy=hy, sel=sel, rows=rows, sums=sums, frag=frag,
                n1=n1, n2=n2, ref1_rows=ref1_rows, ref1_sums=ref1_sums,
                ref2_rows=ref2_rows, ref2_sums=ref2_sums)


def test_boost_tail_unbiased_means_match(boosted_tail):
    """Per-cell z-scores vs independent long references (VERDICT r4 #8):
    each selected cell's boosted tile sum must agree with the pooled
    256x+512x uniform-MC estimate within standard error — cell-resolved, so
    a compensating bias across cells cannot hide the way a global
    mean-ratio check allowed.  Deposits are compound-Poisson (one ray can
    out-couple several times along its path), so the dispersion factor is
    CALIBRATED from the two independent references instead of assumed 1."""
    bt = boosted_tail
    sums, n1, n2 = bt["sums"], bt["n1"], bt["n2"]
    r1, r2 = bt["ref1_sums"], bt["ref2_sums"]
    n_cell = (np.asarray(bt["frag"]["cell_tier"])
              * CFG.rays_per_fov * CFG.num_iter)
    assert n_cell.shape == sums.shape and (n_cell > 0).all()
    pooled = (r1 * n1 + r2 * n2) / (n1 + n2)
    rate = np.maximum(pooled, 1.0 / n2)
    # overdispersion phi from the two refs: E[(r1-r2)^2] = phi*rate*(1/n1+1/n2)
    phi = np.mean((r1 - r2) ** 2 / (rate * (1.0 / n1 + 1.0 / n2)))
    assert 0.2 < phi < 50.0, phi        # sane clustering factor
    phi = max(phi, 1.0)
    z = (sums - pooled) / np.sqrt(
        phi * rate * (1.0 / n_cell + 1.0 / (n1 + n2)))
    assert np.abs(z).max() < 8.0, (z.min(), z.max(), phi)
    # no systematic sign: the mean of C standardized residuals is ~N(0, 1/C)
    assert abs(z.mean()) < 5.0 / np.sqrt(len(z)), (z.mean(), phi)


def test_boost_rows_positive_where_reference_positive(boosted_tail):
    """Post-boost rows are positive in every lambda-COMBINED window the long
    reference finds substantially reachable (the positivity property that
    un-starves u_eyebox).  Combined, because that is the feature's contract:
    selection and tier sizing work on the lambda-summed luminance (a single
    wavelength's window may stay legitimately dark at its group's tier).
    'Substantial' = >= 80 combined reference counts at 256x, i.e. rate
    >= ~0.3 per unit budget: the lowest tier any such group can hold still
    expects >= ~20 counts, so P[any miss] < 1e-8 x windows — a sharp
    assertion, not the vacuous rows >= 0 this test once checked
    (VERDICT r4 #8)."""
    bt = boosted_tail
    rows, ref_rows, n_ref = bt["rows"], bt["ref1_rows"], bt["n1"]
    sel = bt["sel"]
    assert bt["frag"]["tail_rays"] > 0
    sim = bt["hy"].sim
    _, n, m = _cell_lnm(sel, sim.M, sim.N)
    gid = n * sim.M + m
    gids = np.unique(gid)
    gmap = {g: i for i, g in enumerate(gids)}
    gi = np.asarray([gmap[g] for g in gid])
    comb = np.zeros((len(gids),) + rows.shape[1:])
    ref_comb = np.zeros_like(comb)
    np.add.at(comb, gi, rows)
    np.add.at(ref_comb, gi, ref_rows)
    substantial = ref_comb * n_ref >= 80.0
    assert substantial.any()           # the reference does reach windows
    assert (comb[substantial] > 0.0).all(), (
        int((comb[substantial] == 0).sum()), "windows missed by the boost")


def test_boost_tail_reuses_cache(pers_sim):
    hy = TailBoostHybrid(pers_sim, tau_select=50.0, tau_target=25.0,
                         max_boost=64.0)
    hy.build_tail(cells_per_batch=64)
    tail1 = hy._tail
    res, d = hy.run(cells_per_batch=64)
    assert hy._tail is tail1  # no rebuild on run
