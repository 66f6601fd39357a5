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
        # fetch_luts hands the downloader a temp name (atomic publish on
        # success), so match the key by stem and write to the exact path
        calls.append(url)
        key = [k for k, f in _FILES.items() if f[:-len(".npy")] in path][0]
        with open(path, "wb") as fh:
            np.save(fh, getattr(luts, key))

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


# ---- design-batched synthesis (sweep prep hot path) ---------------------------------


def test_synthetic_batch_bitwise_matches_per_design():
    """make_synthetic_luts_batch == per-design calls, bitwise, for varied designs."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
        WaveguideDesign,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.synthetic import (
        make_synthetic_luts_batch,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=float(p), lambda_oc=float(p))
        for p in (375.0, 388.0)
    ] + [dataclasses.replace(base, n_glass=2.0)]  # mixed-glass batches are legal
    geoms = [generate_geometry(d, 6, 5) for d in designs]
    batch = make_synthetic_luts_batch(geoms, seed=77)
    for g, b in zip(geoms, batch):
        single = make_synthetic_luts(g, seed=77)
        for name in ("ic1", "ic2", "ic3", "fc1", "fc2", "oc1", "oc2"):
            assert np.array_equal(getattr(single, name), getattr(b, name)), name


def test_fused_cell_tables_batch_bitwise():
    """build_cell_tables_synthetic_batch == unfused per-design tables, concatenated,
    and the batched kernel cell-param rows == per-design rows, concatenated."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
        WaveguideDesign,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        trace_pallas,
        trace_pallas_persistent,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.luts.packing import (
        build_cell_tables,
        build_cell_tables_synthetic_batch,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=380.0, lambda_oc=380.0),
        dataclasses.replace(base, lambda_ic=395.0, lambda_oc=395.0,
                            n_glass=2.0),   # mixed-glass batch
    ]
    geoms = [generate_geometry(d, 6, 5) for d in designs]
    refs = [build_cell_tables(g, make_synthetic_luts(g, seed=1234)) for g in geoms]
    fused = build_cell_tables_synthetic_batch(geoms, seed=1234)
    C = refs[0].num_cells
    assert fused.D == 2 and fused.num_cells == 2 * C
    for f in ("init_jones", "init_scale", "init_cos0", "ic_jones", "ic_scale",
              "fc_jones", "fc_scale", "oc_jones", "oc_scale", "oc_scale_out",
              "gaps", "tir_phasor", "hop2_phasor"):
        parts = [getattr(r, f) for r in refs]
        axis = [i for i, s in enumerate(parts[0].shape) if s == C]
        assert len(axis) == 1, (f, parts[0].shape)
        assert np.array_equal(getattr(fused, f),
                              np.concatenate(parts, axis=axis[0])), f

    cp_b = trace_pallas.build_kernel_cell_params(
        fused, np.stack([g.eyebox_range for g in geoms]), eyebox_bins=(80, 120))
    cp_s = np.concatenate(
        [trace_pallas.build_kernel_cell_params(r, g.eyebox_range,
                                               eyebox_bins=(80, 120))
         for r, g in zip(refs, geoms)], axis=0)
    assert np.array_equal(cp_b, cp_s)
    # packed-selection words: batched pack == per-design packs, concatenated
    cpk_b = trace_pallas_persistent.pack_selection_params(cp_b, 7, 6)
    cpk_s = np.concatenate(
        [trace_pallas_persistent.pack_selection_params(c, 7, 6)
         for c in (cp_s[:C], cp_s[C:])], axis=0)
    assert np.array_equal(cpk_b, cpk_s)


# ---------------------------------------------------------------------------
# Manifest validation fuzz (VERDICT r3 #7): every malformed-file class must be
# rejected at LOAD time with an error naming the file and the expected layout
# (the real Drive RCWA files have never been reachable offline, so the loader
# is the guard for the day they arrive; download_lut.py:13-19).


def _fresh_files(tmp_path):
    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    luts = make_synthetic_luts(geom)
    _write_files(luts, tmp_path)
    return luts


@pytest.mark.parametrize("mutation, match", [
    # (key, transform) -> expected error-message fragment
    (("ic2", lambda a: a[0]), "wavelength"),          # 3-D: λ axis dropped
    (("oc1", lambda a: a[..., :30]), "channel"),      # too few channels
    (("fc2", lambda a: a.real.astype(np.float32)), "complex"),
    (("ic1", lambda a: a[:, :3]), "grid"),            # inconsistent (L,M,N)
    (("fc1", lambda a: a[:5]), "strip"),              # fc1/fc2 strip mismatch
])
def test_load_luts_rejects_malformed_files(tmp_path, mutation, match):
    luts = _fresh_files(tmp_path)
    (key, fn) = mutation
    np.save(tmp_path / _FILES[key], fn(np.asarray(getattr(luts, key))))
    with pytest.raises(ValueError, match=match):
        load_luts(str(tmp_path))


def test_load_luts_rejects_nonfinite_and_corrupt(tmp_path):
    luts = _fresh_files(tmp_path)
    bad = np.asarray(luts.ic3).copy()
    bad[0, 0, 0, 0] = np.nan
    np.save(tmp_path / _FILES["ic3"], bad)
    with pytest.raises(ValueError, match="non-finite"):
        load_luts(str(tmp_path))
    # truncated/corrupt file: np.load fails -> ValueError naming the file
    _fresh_files(tmp_path)
    with open(tmp_path / _FILES["oc2"], "wb") as f:
        f.write(b"\x93NUMPY garbage")
    with pytest.raises(ValueError, match="lut_oc2"):
        load_luts(str(tmp_path))


def test_load_luts_fuzzed_random_mutations(tmp_path):
    """Randomized structural fuzz: axis drops/permutes, channel cuts, dtype
    casts — every mutation must either load (if still layout-conformant) or
    raise a ValueError that names the broken file."""
    rng = np.random.default_rng(0)
    mutators = [
        lambda a: a[..., : rng.integers(1, 10)],            # channel cut
        lambda a: a.real.astype(np.float64),                # real dtype
        lambda a: a[None],                                  # extra axis
        lambda a: np.swapaxes(a, 0, -1) if a.ndim else a,   # axis permute
        lambda a: a.reshape(-1),                            # flattened
    ]
    keys = list(_FILES)
    for trial in range(10):
        luts = _fresh_files(tmp_path)
        key = keys[int(rng.integers(len(keys)))]
        mut = mutators[int(rng.integers(len(mutators)))]
        np.save(tmp_path / _FILES[key], mut(np.asarray(getattr(luts, key))))
        with pytest.raises(ValueError, match=f"lut_{key}"):
            load_luts(str(tmp_path))
