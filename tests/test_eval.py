"""Tests of the colorimetry and metrics layer."""

import numpy as np
import pytest

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import EvalConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval import color, metrics


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 101)
    np.testing.assert_allclose(
        color.apply_srgb_gamma(color.linearize_srgb(x)), x, atol=1e-12
    )


def test_ciede2000_reference_pairs():
    """Published CIEDE2000 verification pairs (Sharma, Wu & Dalal 2005)."""
    cases = [
        ((50.0000, 2.6772, -79.7751), (50.0000, 0.0000, -82.7485), 2.0425),
        ((50.0000, 3.1571, -77.2803), (50.0000, 0.0000, -82.7485), 2.8615),
        ((50.0000, 2.8361, -74.0200), (50.0000, 0.0000, -82.7485), 3.4412),
        ((50.0000, -1.3802, -84.2814), (50.0000, 0.0000, -82.7485), 1.0000),
        ((50.0000, -1.1848, -84.8006), (50.0000, 0.0000, -82.7485), 1.0000),
    ]
    for lab1, lab2, expected in cases:
        got = float(color.delta_e_2000(np.array(lab1), np.array(lab2)))
        assert abs(got - expected) < 1e-4, (lab1, lab2, got, expected)
        # symmetry
        rev = float(color.delta_e_2000(np.array(lab2), np.array(lab1)))
        assert abs(rev - expected) < 1e-4


def test_ciede2000_zero():
    lab = np.array([53.1, 10.2, -4.4])
    assert float(color.delta_e_2000(lab, lab)) == 0.0


def test_xyz_to_lab_whitepoint():
    lab = color.xyz_to_lab(color.D65_WHITE_Y1)
    np.testing.assert_allclose(lab, [100.0, 0.0, 0.0], atol=1e-9)


def test_normalize_brightness_matches_cv2_hsv_route():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 0.7, size=(16, 16, 3)).astype(np.float32)
    # the reference's HSV round-trip (AR_system_evaluation_functions.py:18-43)
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    h, s, v = cv2.split(hsv)
    v = v / np.max(v)
    ref = cv2.cvtColor(cv2.merge([h, s, v]), cv2.COLOR_HSV2RGB)
    got = color.normalize_brightness(img)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pupil_mask_area():
    mask = metrics.pupil_mask(30)
    # ~pi r^2 with r = 15 bins
    assert abs(mask.sum() - np.pi * 15**2) / (np.pi * 15**2) < 0.02


def test_eye_perceived_flat_field():
    cfg = EvalConfig()
    eb = np.ones((3, 4, 5, 80, 120))
    out = metrics.eye_perceived(eb, cfg)
    assert out.shape == (3, 4, 5, 7, 8)
    np.testing.assert_allclose(out, metrics.pupil_mask(30).sum())


def _display_white_floor() -> float:
    """The reference display's intrinsic delta-E floor: its primaries' white point is
    close to, but not exactly, D65, so even a perfect (spectrally flat) waveguide
    reports a small nonzero color dispersion."""
    drive = np.linalg.solve(metrics.DISPLAY_M, color.linearize_srgb(np.ones(3)))
    xyz = metrics.DISPLAY_M_XYZ @ drive
    lab = color.xyz_to_lab(xyz / xyz[1] * 100.0)
    return float(color.delta_e_2000(lab, color.xyz_to_lab(color.D65_XYZ_100)))


def test_evaluate_perfect_white_display():
    """A spectrally flat, spatially uniform eyebox gives perfect uniformities and a
    color dispersion equal to the display's intrinsic white-point floor."""
    cfg = EvalConfig()
    eb = np.full((3, 6, 8, 80, 120), 0.001)
    res = metrics.evaluate(eb, cfg)
    assert abs(res.delta_e - _display_white_floor()) < 1e-9
    assert abs(res.u_fov - 1.0) < 1e-9
    assert abs(res.u_eyebox - 1.0) < 1e-9
    assert res.output_image.shape == (6, 8, 3, 7, 8)
    # pure white drive through a perfect system reconstructs pure white
    np.testing.assert_allclose(res.output_image[..., 0, 0], 1.0, atol=1e-6)


def test_evaluate_colored_system_has_dispersion():
    cfg = EvalConfig()
    eb = np.full((3, 6, 8, 80, 120), 0.001)
    eb[0] *= 0.2   # blue suppressed
    res = metrics.evaluate(eb, cfg)
    assert res.delta_e > _display_white_floor() + 1.0
    assert abs(res.u_fov - 1.0) < 1e-9


def test_evaluate_nonuniform_eyebox():
    cfg = EvalConfig()
    eb = np.full((3, 6, 8, 80, 120), 0.001)
    eb[..., :, :60] *= 0.5   # left half dimmer
    res = metrics.evaluate(eb, cfg)
    assert res.u_eyebox < 0.8


def test_efficiencies():
    eb = np.zeros((3, 2, 2, 8, 8))
    eb[1] = 1.0  # every green ray of every cell deposits once per iter
    rays_per_fov, num_iter = 64 * 3, 2  # 64 bins * 3 wavelengths worth
    eff = metrics.efficiencies(eb * num_iter * 3, rays_per_fov, num_iter)
    assert eff["R"] == 0.0 and eff["B"] == 0.0
    assert abs(eff["G"] - 1.0) < 1e-9


def test_fov_efficiency_heatmaps(tmp_path):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.image import (
        save_fov_efficiency_heatmaps,
    )

    rng = np.random.default_rng(0)
    hist = rng.uniform(size=(3, 5, 4, 8, 12)).astype(np.float32)
    path = str(tmp_path / "heat.png")
    save_fov_efficiency_heatmaps(path, hist)
    import os

    assert os.path.getsize(path) > 1000


def test_evaluate_perceive_kwarg_equivalent():
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import EvalConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval import metrics

    rng = np.random.default_rng(1)
    m = rng.uniform(size=(3, 5, 4, 40, 60)).astype(np.float64)
    cfg = EvalConfig(pupil_mask_bins=10, eye_step_y=10, eye_step_x=10)
    a = metrics.evaluate(m, cfg)
    b = metrics.evaluate(None, cfg, perceive=metrics.eye_perceived(m, cfg))
    assert a.delta_e == b.delta_e
    assert a.u_fov == b.u_fov
    assert a.u_eyebox == b.u_eyebox


def test_eye_perceived_jnp_matches_numpy():
    import jax.numpy as jnp

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import EvalConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval import metrics

    rng = np.random.default_rng(2)
    m = rng.uniform(size=(2, 4, 3, 40, 60)).astype(np.float32)
    cfg = EvalConfig(pupil_mask_bins=10, eye_step_y=10, eye_step_x=10)
    a = metrics.eye_perceived(m, cfg)
    b = np.asarray(metrics.eye_perceived_jnp(jnp.asarray(m), cfg))
    np.testing.assert_allclose(b, a, rtol=2e-6)


def test_eye_perceived_conv_matches_strided():
    """The XLA-conv pupil integrator at the reference stride reproduces the
    strided window-sum sampler (same eye-position grid, float association
    tolerance)."""
    jnp = pytest.importorskip("jax.numpy")

    rng = np.random.default_rng(3)
    m = rng.uniform(size=(2, 4, 3, 40, 60)).astype(np.float32)
    cfg = EvalConfig(pupil_mask_bins=10, eye_step_y=7, eye_step_x=9)
    a = metrics.eye_perceived(m.astype(np.float64), cfg)
    b = np.asarray(metrics.eye_perceived_conv_jnp(jnp.asarray(m), cfg))
    assert b.shape == a.shape
    np.testing.assert_allclose(b, a, rtol=3e-6, atol=1e-6)


def test_eye_perceived_conv_dense_matches_loop():
    """stride=(1, 1) visits EVERY valid eye position — the reference's
    commented-out convolve2d scan (AR_system_evaluation_functions.py:77-89)."""
    jnp = pytest.importorskip("jax.numpy")

    rng = np.random.default_rng(4)
    m = rng.uniform(size=(2, 3, 2, 24, 30)).astype(np.float32)
    cfg = EvalConfig(pupil_mask_bins=8)
    dense_cfg = EvalConfig(pupil_mask_bins=8, eye_step_y=1, eye_step_x=1)
    a = metrics.eye_perceived(m.astype(np.float64), dense_cfg)
    b = np.asarray(
        metrics.eye_perceived_conv_jnp(jnp.asarray(m), cfg, stride=(1, 1)))
    assert b.shape == (2, 3, 2, 24 - 8 + 1, 30 - 8 + 1)
    np.testing.assert_allclose(b, a, rtol=3e-6, atol=1e-6)


def test_dense_scan_matches_reference_convolve2d():
    """Execute the reference's commented-out dense formulation
    (AR_system_evaluation_functions.py:75-87: per-(lambda, FoV)
    scipy.signal.convolve2d with the pupil mask, mode='valid') and pin the
    XLA-conv path against it.  The pupil disc is 180-degree symmetric, so
    true convolution equals the conv_general_dilated correlation."""
    jnp = pytest.importorskip("jax.numpy")
    convolve2d = pytest.importorskip("scipy.signal").convolve2d

    rng = np.random.default_rng(8)
    m = rng.uniform(size=(2, 3, 4, 24, 30)).astype(np.float32)
    cfg = EvalConfig(pupil_mask_bins=8)
    mask = metrics.pupil_mask(8)
    n_epy, n_epx = 24 - 8 + 1, 30 - 8 + 1
    ref = np.zeros((2, 3, 4, n_epy, n_epx))
    for i in range(2):
        for j in range(3):
            for k in range(4):
                ref[i, j, k] = convolve2d(m[i, j, k].astype(np.float64),
                                          mask, mode="valid")
    got = np.asarray(
        metrics.eye_perceived_conv_jnp(jnp.asarray(m), cfg, stride=(1, 1)))
    np.testing.assert_allclose(got, ref, rtol=3e-6, atol=1e-6)


def test_evaluate_dense_chunked_matches_unchunked():
    jnp = pytest.importorskip("jax.numpy")

    rng = np.random.default_rng(6)
    m = (rng.random((3, 4, 5, 20, 24)) * 1e-3).astype(np.float32)
    m[..., :8, :8] = 0.0   # starve a corner of the dense position grid
    cfg = EvalConfig(pupil_mask_bins=8)
    a = metrics.evaluate_dense(jnp.asarray(m), cfg, norm=2.0)
    b = metrics.evaluate_dense(jnp.asarray(m), cfg, norm=2.0, chunk_rows=5)
    assert a.eye_luminance.shape == (13, 17)
    assert b.delta_e == pytest.approx(a.delta_e, rel=1e-6)
    assert b.u_fov == pytest.approx(a.u_fov, rel=1e-6)
    assert b.u_eyebox == pytest.approx(a.u_eyebox, rel=1e-6)
    assert b.starved_eye_positions == a.starved_eye_positions
    assert a.starved_eye_positions > 0
    np.testing.assert_allclose(b.eye_luminance, a.eye_luminance, rtol=1e-6)


def test_evaluate_dense_perfect_white():
    """A flat field scores perfect uniformities at every dense position and
    the display's intrinsic white-point delta-E floor."""
    jnp = pytest.importorskip("jax.numpy")

    cfg = EvalConfig(pupil_mask_bins=8)
    eb = jnp.full((3, 3, 4, 20, 24), 0.001, jnp.float32)
    res = metrics.evaluate_dense(eb, cfg)
    assert res.delta_e == pytest.approx(_display_white_floor(), abs=1e-3)
    assert res.u_fov == pytest.approx(1.0, abs=1e-6)
    assert res.u_eyebox == pytest.approx(1.0, abs=1e-6)
    assert res.starved_eye_positions == 0


def test_evaluate_flags_starved_eye_positions():
    """An eye position whose pupil window caught zero photons must zero
    u_eyebox AND be reported via starved_eye_positions (the MC-convergence
    diagnostic: u_eyebox=0 means under-sampled, not a dead display)."""
    cfg = EvalConfig()
    eb = np.full((3, 6, 8, 80, 120), 0.001)
    dense = metrics.evaluate(eb, cfg)
    assert dense.starved_eye_positions == 0

    eb2 = eb.copy()
    eb2[..., :30, :30] = 0.0   # empty the (0, 0) eye position's pupil window
    res = metrics.evaluate(eb2, cfg)
    assert res.u_eyebox == 0.0
    assert res.starved_eye_positions == 1


def test_evaluate_jnp_matches_host():
    """Device-path evaluate (one jit, f32) agrees with the float64 host path,
    including the starved-position branches."""
    jnp = pytest.importorskip("jax.numpy")

    rng = np.random.default_rng(5)
    perc = rng.random((3, 10, 12, 4, 5)) * 1e-3
    perc[:, :, :, 0, 0] = 0.0       # fully starved eye position
    perc[0, 2, 3, 1, 1] = 0.0       # single empty (FoV, eye) bin
    host = metrics.evaluate(None, perceive=perc / 2.0)
    dev = metrics.evaluate_jnp(jnp.asarray(perc, jnp.float32), norm=2.0)
    assert dev.delta_e == pytest.approx(host.delta_e, rel=1e-4)
    assert dev.u_fov == pytest.approx(host.u_fov, rel=1e-4, abs=1e-7)
    assert dev.u_eyebox == pytest.approx(host.u_eyebox, rel=1e-4, abs=1e-7)
    assert dev.starved_eye_positions == host.starved_eye_positions
    np.testing.assert_allclose(dev.eye_luminance, host.eye_luminance,
                               rtol=1e-4)
    assert dev.output_image is None

    dev_img = metrics.evaluate_jnp(jnp.asarray(perc, jnp.float32), norm=2.0,
                                   with_image=True)
    np.testing.assert_allclose(dev_img.output_image, host.output_image,
                               rtol=2e-3, atol=1e-5)


def test_save_eyebox_luminance_map(tmp_path):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.image import (
        save_eyebox_luminance_map,
    )

    rng = np.random.default_rng(7)
    path = str(tmp_path / "lum.png")
    save_eyebox_luminance_map(path, rng.random((51, 91)))
    import os

    assert os.path.getsize(path) > 1000


def test_simulator_dense_metrics():
    """run(dense_metrics=True) returns the dense eye-position EvalResult,
    consistent with host evaluation of the dense perception stack."""
    pytest.importorskip("jax")
    import jax.numpy as jnp

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=256, num_iter=2,
                      max_bounces=300, seed=11, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="pallas_persistent")
    res = sim.run(histogram_device=True, metrics_device=True,
                  dense_metrics=True)
    assert res.dense is not None
    eb_y, eb_x = np.asarray(res.histogram).shape[-2:]
    msize = EvalConfig().pupil_mask_bins
    assert res.dense.eye_luminance.shape == (eb_y - msize + 1,
                                             eb_x - msize + 1)
    # cross-check against the host path on the dense perception stack
    norm = res.rays_traced / (4 * 3 * 3 * 2) * 2  # actual rays/FoV * iters
    perc = np.asarray(metrics.eye_perceived_conv_jnp(
        jnp.asarray(np.asarray(res.histogram), jnp.float32), EvalConfig(),
        stride=(1, 1)))
    host = metrics.evaluate(None, perceive=perc.astype(np.float64) / norm,
                            with_image=False)
    assert res.dense.delta_e == pytest.approx(host.delta_e, rel=1e-3)
    assert res.dense.u_fov == pytest.approx(host.u_fov, rel=1e-3, abs=1e-6)
    assert res.dense.u_eyebox == pytest.approx(host.u_eyebox, rel=1e-3,
                                               abs=1e-6)


def test_simulator_metrics_device_matches_host():
    """run(metrics_device=True) reproduces the host metric path on a device
    histogram (CPU jax backend; persistent engine interpret mode)."""
    pytest.importorskip("jax")
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=256, num_iter=2,
                      max_bounces=300, seed=11, rng_mode="fast",
                      ic_test="circle")
    sim = Simulator(cfg=cfg, engine="pallas_persistent")
    a = sim.run(histogram_device=True, metrics_device=False)
    b = sim.run(histogram_device=True, metrics_device=True)
    assert b.metrics.delta_e == pytest.approx(a.metrics.delta_e, rel=1e-4)
    assert b.metrics.u_fov == pytest.approx(a.metrics.u_fov, rel=1e-4,
                                            abs=1e-7)
    assert b.metrics.u_eyebox == pytest.approx(a.metrics.u_eyebox, rel=1e-4,
                                               abs=1e-7)
    assert (b.metrics.starved_eye_positions
            == a.metrics.starved_eye_positions)
