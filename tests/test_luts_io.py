"""Disk round-trip of the reference's lut_*_fullColor.npy layout (luts/io.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import generate_geometry
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts import make_synthetic_luts
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.io import (
    _FILES,
    load_luts,
    load_or_synthesize,
    luts_available,
)


def _write_files(luts, d):
    for key, fname in _FILES.items():
        np.save(d / fname, getattr(luts, key))


def test_round_trip(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    assert not luts_available(str(tmp_path))
    _write_files(luts, tmp_path)
    assert luts_available(str(tmp_path))
    loaded = load_luts(str(tmp_path))
    for key in _FILES:
        np.testing.assert_array_equal(getattr(loaded, key), getattr(luts, key))


def test_save_luts_reference_layout(tmp_path):
    """save_luts writes the reference's exact file names/dtypes and
    round-trips bitwise through load_luts."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.io import save_luts

    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom, seed=5)
    save_luts(luts, str(tmp_path))
    # exact reference file names (download_lut.py:13-19)
    for fname in _FILES.values():
        assert (tmp_path / fname).exists(), fname
    loaded = load_luts(str(tmp_path))
    for key in _FILES:
        got, want = getattr(loaded, key), getattr(luts, key)
        assert got.dtype == want.dtype and np.iscomplexobj(got)
        np.testing.assert_array_equal(got, want)
    # real-valued tables are rejected at write time
    bad = make_synthetic_luts(geom, seed=5)
    bad.ic1 = np.abs(bad.ic1)
    with pytest.raises(ValueError, match="complex"):
        save_luts(bad, str(tmp_path / "bad"))


def test_load_or_synthesize_prefers_files(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom, seed=7)
    _write_files(luts, tmp_path)
    # different seed would give different synthetic tables; files must win
    got = load_or_synthesize(geom, directory=str(tmp_path), seed=999)
    np.testing.assert_array_equal(got.ic1, luts.ic1)
    # absent directory -> synthetic with the given seed
    synth = load_or_synthesize(geom, directory=None, seed=7)
    np.testing.assert_array_equal(synth.ic1, luts.ic1)


def test_validate_rejects_wrong_channel_count(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    luts.ic1 = luts.ic1[..., :10]  # fewer channels than the kernel reads
    _write_files(luts, tmp_path)
    with pytest.raises(ValueError, match="lut_ic1.*channels"):
        load_or_synthesize(geom, directory=str(tmp_path))


def test_validate_rejects_missing_wavelength_axis(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    luts.ic2 = luts.ic2[1]  # single-wavelength legacy layout (M, N, C)
    _write_files(luts, tmp_path)
    with pytest.raises(ValueError, match="lut_ic2.*wavelength axis"):
        load_or_synthesize(geom, directory=str(tmp_path))


def test_validate_rejects_real_valued_tables(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    luts.fc1 = np.abs(luts.fc1)
    _write_files(luts, tmp_path)
    with pytest.raises(ValueError, match="lut_fc1.*complex"):
        load_or_synthesize(geom, directory=str(tmp_path))


def test_validate_rejects_wrong_strip_count(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    luts.oc1 = luts.oc1[:-1]  # one strip short
    _write_files(luts, tmp_path)
    with pytest.raises(ValueError, match="lut_oc1"):
        load_or_synthesize(geom, directory=str(tmp_path))


def test_fetch_luts_offline_and_with_downloader(tmp_path):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.io import (
        fetch_luts,
    )

    # offline (no gdown in this environment): graceful False, nothing written
    assert fetch_luts(str(tmp_path / "empty")) is False

    # a stub downloader stands in for gdown: every missing file is fetched once
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    d = tmp_path / "fetched"
    d.mkdir()
    _write_files(luts, d)  # pre-seed, then delete two to check fetch-if-missing
    (d / _FILES["ic1"]).unlink()
    (d / _FILES["oc2"]).unlink()
    calls = []

    def fake_downloader(url, path):
        calls.append(url)
        key = [k for k, f in _FILES.items() if path.endswith(f)][0]
        np.save(path, getattr(luts, key))

    assert fetch_luts(str(d), downloader=fake_downloader) is True
    assert len(calls) == 2 and all("drive.google.com" in u for u in calls)
    got = load_or_synthesize(geom, directory=str(d))
    np.testing.assert_array_equal(got.oc2, luts.oc2)

    # a failing downloader degrades to False instead of raising
    (d / _FILES["fc2"]).unlink()

    def broken(url, path):
        raise OSError("no network")

    assert fetch_luts(str(d), downloader=broken) is False


def test_simulator_luts_dir_equals_direct(tmp_path):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom, seed=11)
    _write_files(luts, tmp_path)
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=64, max_bounces=400,
                      rng_mode="fast", ic_test="circle", seed=3)
    sim_a = Simulator(cfg=cfg, geom=geom, luts=luts)
    sim_b = Simulator(cfg=cfg, geom=geom, luts_dir=str(tmp_path))
    ra = sim_a.run(rays_per_fov=64, num_iter=1, evaluate_metrics=False)
    rb = sim_b.run(rays_per_fov=64, num_iter=1, evaluate_metrics=False)
    np.testing.assert_array_equal(np.asarray(ra.histogram),
                                  np.asarray(rb.histogram))
