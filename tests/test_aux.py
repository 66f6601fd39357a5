"""Tests for auxiliary subsystems: sweep, presets, checkpoint, plotting, CLI, image."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
    TraceConfig,
    WaveguideDesign,
)
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.models import presets
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.utils import (
    load_checkpoint,
    save_checkpoint,
)


def test_presets():
    for name in presets.PRESETS:
        d = presets.get(name)
        assert isinstance(d, WaveguideDesign)
    with pytest.raises(KeyError):
        presets.get("nope")


def test_design_sweep_batched():
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (380.0, 388.0, 396.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=64, max_bounces=256,
                      seed=5)
    res = run_design_sweep(designs, cfg)
    assert res.histograms.shape[0] == 3
    assert res.efficiencies.shape == (3, 3)
    assert np.all(res.bounces > 0)
    # different periods give different transport
    assert not np.allclose(res.efficiencies[0], res.efficiencies[2])
    # the 388 nm column must reproduce a solo (unvmapped) run of the same design
    solo = run_design_sweep([designs[1]], cfg)
    np.testing.assert_array_equal(res.histograms[1], solo.histograms[0])


def test_design_sweep_persistent_kernel():
    """The persistent-kernel sweep (one pallas_call, per-design SMEM geometry
    rows) must reproduce solo single-design runs of the same kernel exactly."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (380.0, 388.0, 396.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=128,
                      max_bounces=256, seed=5)
    res = run_design_sweep_persistent(designs, cfg, interpret=True,
                                      spawn_iters=64, keep_histograms=True)
    assert res.efficiencies.shape == (3, 3)
    assert np.all(res.bounces > 0)
    assert not np.allclose(res.efficiencies[0], res.efficiencies[2])
    solo = run_design_sweep_persistent([designs[1]], cfg, interpret=True,
                                       spawn_iters=64, keep_histograms=True)
    np.testing.assert_array_equal(res.histograms[1], solo.histograms[0])
    np.testing.assert_array_equal(res.efficiencies[1], solo.efficiencies[0])


def test_design_sweep_persistent_count_and_packed():
    """count-spawn sweeps hit the exact per-cell sample target, and the
    packed-selection sweep agrees with fma within bf16-rounding statistics."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = presets.get("paper_default")
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (380.0, 392.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=200,
                      max_bounces=256, seed=5)
    res = run_design_sweep_persistent(designs, cfg, interpret=True,
                                      spawn_iters=0, spawn_mode="count")
    assert res.efficiencies.shape == (2, 3)
    assert np.all(res.bounces > 0)
    # determinism of the count schedule
    res2 = run_design_sweep_persistent(designs, cfg, interpret=True,
                                       spawn_iters=0, spawn_mode="count")
    np.testing.assert_array_equal(res.efficiencies, res2.efficiencies)

    resp = run_design_sweep_persistent(designs, cfg, interpret=True,
                                       spawn_iters=0, spawn_mode="count",
                                       accum_mode="packed")
    # bf16 parameter rounding: statistically close, not bitwise
    np.testing.assert_allclose(resp.efficiencies, res.efficiencies,
                               rtol=0.25, atol=5e-3)
    assert not np.array_equal(resp.efficiencies, res.efficiencies)


def test_design_sweep_persistent_chunked():
    """designs_per_batch chunking (with tail padding) must be invisible:
    chunked results equal the single-dispatch sweep exactly."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (380.0, 388.0, 396.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=128,
                      max_bounces=256, seed=5)
    whole = run_design_sweep_persistent(designs, cfg, interpret=True,
                                        spawn_iters=64, keep_histograms=True)
    chunked = run_design_sweep_persistent(designs, cfg, interpret=True,
                                          spawn_iters=64, keep_histograms=True,
                                          designs_per_batch=2)
    np.testing.assert_array_equal(whole.efficiencies, chunked.efficiencies)
    np.testing.assert_array_equal(whole.bounces, chunked.bounces)
    np.testing.assert_array_equal(whole.histograms, chunked.histograms)


def test_design_sweep_persistent_broadcast_seeding():
    """Device-broadcast ray tiles + device-hashed RNG seeds must be bitwise
    equal to the full host-built blocks (the relay-upload saver)."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (384.0, 392.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=128,
                      max_bounces=256, seed=5)
    fast = run_design_sweep_persistent(designs, cfg, interpret=True,
                                       spawn_iters=64, keep_histograms=True)
    host = run_design_sweep_persistent(designs, cfg, interpret=True,
                                       spawn_iters=64, keep_histograms=True,
                                       _force_host_blocks=True)
    np.testing.assert_array_equal(fast.histograms, host.histograms)
    np.testing.assert_array_equal(fast.efficiencies, host.efficiencies)
    np.testing.assert_array_equal(fast.bounces, host.bounces)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    design = WaveguideDesign()
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3)
    hist = np.random.default_rng(0).random((3, 3, 4, 8, 8)).astype(np.float32)
    save_checkpoint(path, hist, 3, design, cfg, total_bounces=12345)
    out = load_checkpoint(path, design, cfg)
    assert out is not None
    h, iters, bounces = out
    np.testing.assert_array_equal(h, hist)
    assert iters == 3 and bounces == 12345
    # config mismatch invalidates
    assert load_checkpoint(path, design, TraceConfig(num_fov_x=5, num_fov_y=3)) is None
    assert load_checkpoint(str(tmp_path / "missing.npz"), design, cfg) is None


def test_plotting(tmp_path):
    pytest.importorskip("matplotlib")
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design.plotting import (
        plot_design,
    )

    geom = generate_geometry(num_fov_x=6, num_fov_y=4)
    paths = plot_design(geom, prefix=str(tmp_path / "d"))
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p)
        assert os.path.getsize(p) > 10_000


def test_eye_view_image(tmp_path):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.image import (
        eye_view_uint8,
        save_eyebox_center_view,
    )

    img = np.random.default_rng(0).random((5, 7, 3, 2, 3))
    u8 = eye_view_uint8(img)
    assert u8.shape == (5, 7, 3) and u8.dtype == np.uint8
    path = str(tmp_path / "view.png")
    save_eyebox_center_view(path, img)
    assert os.path.getsize(path) > 100


def test_cli_simulate_small(tmp_path, capsys):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    img = str(tmp_path / "eye.png")
    js = str(tmp_path / "m.json")
    rc = main([
        "simulate", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov", "40",
        "--num-iter", "1", "--max-bounces", "200", "--image", img, "--json", js,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Efficiency (Green)" in out
    assert os.path.exists(img)
    assert os.path.exists(js)


def test_cli_simulate_tail_boost(tmp_path, capsys):
    """--tail-boost surfaces the hybrid as a product path (VERDICT r4 #4):
    the report explains the patched metrics' tail provenance and the JSON
    carries the diagnostics; non-persistent engines are rejected loudly."""
    import json as _json

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    js = str(tmp_path / "m.json")
    rc = main([
        "simulate", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov", "64",
        "--num-iter", "1", "--max-bounces", "512", "--image", "",
        "--engine", "pallas_persistent", "--json", js, "--tail-boost",
        "--tail-max-boost", "64",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tail boost:" in out and "spliced" in out
    with open(js) as f:
        tb = _json.load(f)["tail_boost"]
    assert tb["selected_cells"] >= 0
    assert "tiers" in tb and "tail_rays" in tb

    with pytest.raises(SystemExit, match="pallas_persistent"):
        main(["simulate", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov",
              "8", "--num-iter", "1", "--image", "", "--tail-boost"])


def test_cli_simulate_tail_exact(tmp_path, capsys):
    """--tail-exact splices the zero-variance splitting tail under any bulk
    engine; the report names the exact tail and the JSON carries the mode +
    pruned-weight ledger."""
    import json as _json

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    js = str(tmp_path / "m.json")
    rc = main([
        "simulate", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov", "64",
        "--num-iter", "1", "--max-bounces", "512", "--image", "",
        "--engine", "jnp", "--json", js, "--tail-exact",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "exact tail:" in out and "spliced" in out
    with open(js) as f:
        tb = _json.load(f)["tail_boost"]
    assert tb["mode"] == "exact" and tb["tail_rays"] == 0
    assert tb["exact_pruned"] >= 0.0

    with pytest.raises(SystemExit, match="choose ONE"):
        main(["simulate", "--fov-x", "4", "--fov-y", "3", "--image", "",
              "--engine", "pallas_persistent", "--tail-boost",
              "--tail-exact"])


def test_simulator_auto_interpret_on_cpu():
    """Pallas engines flip to interpret mode automatically off-TPU, so the
    same CLI/API works on any backend without an --interpret flag."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=32,
                      max_bounces=128, seed=0)
    sim = Simulator(cfg=cfg, engine="pallas_persistent")
    assert sim._interpret is True  # CPU backend (conftest pins it)


def test_cli_design_overrides():
    """--set FIELD=VALUE rewrites preset fields (the reference's in-source
    constant edits, couplers_coor.py:124-188); unknown fields exit."""
    import argparse

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import _design

    args = argparse.Namespace(
        design="paper_default",
        overrides=["lambda_ic=380", "eyebox_center=1,14", "num_fc=8"])
    d = _design(args)
    assert d.lambda_ic == 380.0
    assert d.eyebox_center == (1.0, 14.0)
    assert d.num_fc == 8 and isinstance(d.num_fc, int)
    for bad in (["nope=1"], ["lambda_ic"], ["lambda_ic=abc"]):
        with pytest.raises(SystemExit):
            _design(argparse.Namespace(design="paper_default", overrides=bad))


def test_cli_histogram_export_and_offline_fetch(tmp_path, capsys):
    """--save-histogram writes the reference-shaped matrix_EB array; an
    offline --fetch-luts degrades to synthetic tables instead of failing."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    h = str(tmp_path / "hist.npy")
    rc = main([
        "simulate", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov", "32",
        "--num-iter", "1", "--max-bounces", "128", "--image", "",
        "--set", "lambda_ic=380", "--set", "lambda_oc=380",
        "--save-histogram", h, "--fetch-luts", str(tmp_path / "luts"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "LUT fetch failed" in out or "fetched reference LUTs" in out
    hist = np.load(h)
    # (L, FoVy, FoVx, 80, 120) — the reference's matrix_EB index order
    # (gpu_ray_tracing_pro_fullColor.py:37)
    assert hist.shape == (3, 3, 4, 80, 120)
    assert hist.sum() > 0


def test_cli_sweep_small(capsys):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    rc = main([
        "sweep", "--fov-x", "4", "--fov-y", "3", "--num-designs", "2",
        "--rays-per-fov", "32", "--max-bounces", "128",
    ])
    assert rc == 0
    assert "best mean efficiency" in capsys.readouterr().out


def test_cli_sweep_generalized_grid(capsys):
    """--sweep FIELD=MIN:MAX:N builds a Cartesian design grid over arbitrary
    WaveguideDesign fields (the reference hard-codes one design)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    rc = main([
        "sweep", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov", "24",
        "--max-bounces", "96", "--sweep", "lambda_ic=380:396:2",
        "--sweep", "thickness=0.6:0.8:2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("lambda_ic=") == 5  # 4 designs + the best-design line
    assert "thickness=0.6" in out and "thickness=0.8" in out
    with pytest.raises(SystemExit):
        main(["sweep", "--sweep", "nope=1:2:2"])


def test_cli_optimize_small(tmp_path, capsys):
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    js = str(tmp_path / "apod.json")
    rc = main([
        "optimize", "--fov-x", "4", "--fov-y", "3", "--rays-per-fov", "8",
        "--steps", "3", "--capacity", "1024", "--trace-steps", "24",
        "--json", js,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "s_oc:" in out
    assert os.path.exists(js)


def test_presets_generate_and_trace():
    """Every preset must produce valid geometry and transport energy."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    for name in presets.PRESETS:
        d = presets.get(name)
        geom = generate_geometry(d, num_fov_x=3, num_fov_y=2)
        assert geom.fc_strips and geom.oc_strips
        cfg = TraceConfig(num_fov_x=3, num_fov_y=2, rays_per_fov=64,
                          max_bounces=400, seed=1)
        sim = Simulator(design=d, cfg=cfg, geom=geom)
        res = sim.run(rays_per_fov=64, num_iter=1, evaluate_metrics=False)
        assert res.total_bounces > 0, name
        assert res.histogram.sum() > 0, name


def test_r2_pupil_sampling_points_and_engine():
    """R2 low-discrepancy pupil points: strict polygon containment, visible
    stratification, and an unbiased trace (efficiency within MC tolerance of
    the uniform sampler at matched budgets)."""
    import numpy as np

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import TraceConfig
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design.convex import (
        point_in_polygon,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import seeding

    geom = generate_geometry(num_fov_x=4, num_fov_y=3)
    rng = np.random.default_rng(3)
    pts = seeding.sample_points_r2_disk(geom.ic, 512, rng)
    assert point_in_polygon(pts[:, 0], pts[:, 1], geom.ic).all()

    # stratification: counts over a 4x4 grid of the bounding square of the
    # inscribed disk never collapse to empty/overfull the way i.i.d. uniforms
    # can; the disk covers pi/4 of the square, so interior cells are well fed
    c = geom.ic.mean(axis=0)
    r = np.abs(pts - c).max()
    gx = np.clip(((pts[:, 0] - (c[0] - r)) / (2 * r) * 4).astype(int), 0, 3)
    gy = np.clip(((pts[:, 1] - (c[1] - r)) / (2 * r) * 4).astype(int), 0, 3)
    counts = np.bincount(gy * 4 + gx, minlength=16).reshape(4, 4)
    # the four central cells are fully inside the disk: expected 32 each
    assert (counts[1:3, 1:3] >= 16).all() and (counts[1:3, 1:3] <= 48).all()

    # engine integration: same mean as the uniform sampler within MC noise
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine.pipeline import (
        Simulator,
    )

    effs = {}
    for mode in ("uniform", "r2"):
        cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=512,
                          num_iter=1, max_bounces=400, seed=5,
                          rng_mode="fast", ic_test="circle",
                          pupil_sampling=mode)
        res = Simulator(cfg=cfg, engine="jnp").run(evaluate_metrics=False)
        effs[mode] = res.efficiencies["G"]
        assert res.total_bounces > 0
    assert effs["r2"] == pytest.approx(effs["uniform"], rel=0.25)


def test_design_sweep_persistent_metrics():
    """evaluate_metrics=True must produce per-design display metrics equal to
    host evaluation of the same (kept) histograms at the sweep's nominal
    normalization (device f32 colorimetry vs host f64: ~1e-3)."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.eval.metrics import (
        evaluate,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (380.0, 396.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=128,
                      max_bounces=256, seed=5)
    res = run_design_sweep_persistent(designs, cfg, interpret=True,
                                      spawn_iters=64, keep_histograms=True,
                                      evaluate_metrics=True)
    assert res.metrics is not None and len(res.metrics) == 2
    nominal = 128 * -(-64 // 1)  # gens mode nominal = slots * gens; slots=128
    # slots = min(rays_per_fov, 2048) -> 128; gens = ceil(128/128) = 1
    nominal = 128 * 1
    for d in range(2):
        host = evaluate(res.histograms[d] / nominal, with_image=False)
        got = res.metrics[d]
        assert abs(got.delta_e - host.delta_e) < 2e-3 * max(1, host.delta_e)
        assert abs(got.u_fov - host.u_fov) < 1e-4
        assert abs(got.u_eyebox - host.u_eyebox) < 1e-4
        assert got.starved_eye_positions == host.starved_eye_positions
    # metrics must distinguish designs (different gratings -> different color)
    assert res.metrics[0].delta_e != res.metrics[1].delta_e


def test_design_sweep_persistent_cells_per_block():
    """Sweeps with cells_per_block=2 (two cells per kernel block as sublane
    row groups) must be bitwise-identical to single-cell blocks: same rng
    stream blocks, same shared pupil tile per row group."""
    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.sweep import (
        run_design_sweep_persistent,
    )

    base = WaveguideDesign()
    designs = [
        dataclasses.replace(base, lambda_ic=p, lambda_oc=p)
        for p in (380.0, 396.0)
    ]
    cfg = TraceConfig(num_fov_x=4, num_fov_y=3, rays_per_fov=200,
                      max_bounces=256, seed=5)
    kw = dict(interpret=True, spawn_iters=0, spawn_mode="count",
              accum_mode="packed", keep_histograms=True)
    a = run_design_sweep_persistent(designs, cfg, **kw)
    b = run_design_sweep_persistent(designs, cfg, cells_per_block=2, **kw)
    np.testing.assert_array_equal(a.efficiencies, b.efficiencies)
    np.testing.assert_array_equal(a.bounces, b.bounces)
    np.testing.assert_array_equal(a.histograms, b.histograms)


def test_cli_dense_eyebox_png_fails_fast_without_matplotlib(monkeypatch):
    """A PNG export that needs matplotlib must fail BEFORE the trace when the
    viz extra is missing, not after the expensive simulation (ADVICE r3)."""
    import builtins
    import sys

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.cli import main

    real_import = builtins.__import__

    def no_mpl(name, *a, **kw):
        if name == "matplotlib" or name.startswith("matplotlib."):
            raise ImportError("matplotlib disabled for test")
        return real_import(name, *a, **kw)

    for mod in [m for m in sys.modules if m.startswith("matplotlib")]:
        monkeypatch.delitem(sys.modules, mod)
    monkeypatch.setattr(builtins, "__import__", no_mpl)
    traced = []
    # tracing must never start: poison Simulator.run
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.engine import (
        pipeline,
    )

    monkeypatch.setattr(pipeline.Simulator, "run",
                        lambda self, *a, **kw: traced.append(1))
    import pytest

    with pytest.raises(SystemExit, match="matplotlib"):
        main(["simulate", "--fov-x", "4", "--fov-y", "3",
              "--rays-per-fov", "40", "--num-iter", "1",
              "--max-bounces", "64", "--dense-eyebox", "/tmp/never.png"])
    assert not traced
    # metrics-only dense scan ('-') must still work without matplotlib
    # (no PNG): not asserted here to keep the test fast.
