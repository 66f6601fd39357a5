import numpy as np
import pytest

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import WaveguideDesign
from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
    convex,
    generate_geometry,
)


@pytest.fixture(scope="module")
def geom():
    return generate_geometry(num_fov_x=20, num_fov_y=15)


def test_strip_counts(geom):
    d = geom.design
    assert len(geom.fc_strips) == d.num_fc
    assert len(geom.oc_strips) == d.num_oc


def test_fc_strips_partition_cloud_hull(geom):
    """FC strips must tile the folding hull: areas sum, strips disjoint."""
    areas = [abs(convex.polygon_area(convex.ensure_ccw(s))) for s in geom.fc_strips]
    # reconstruct the hull from all strip vertices
    hull = convex.convex_hull(np.concatenate(geom.fc_strips, axis=0))
    total = abs(convex.polygon_area(convex.ensure_ccw(hull)))
    assert abs(sum(areas) - total) / total < 1e-9
    # pairwise intersections are degenerate (shared edges only)
    for i in range(len(geom.fc_strips)):
        for j in range(i + 1, len(geom.fc_strips)):
            inter = convex.clip_convex(geom.fc_strips[i], geom.fc_strips[j])
            if len(inter):
                a = abs(convex.polygon_area(convex.ensure_ccw(inter)))
                assert a < 1e-9


def test_oc_strips_partition_rect(geom):
    d = geom.design
    x_oc = np.tan(d.fov_x / 2) * abs(d.eye_relief) * 2 + d.eyebox_size[0]
    y_oc = np.tan(d.fov_y / 2) * abs(d.eye_relief) * 2 + d.eyebox_size[1]
    areas = [abs(convex.polygon_area(convex.ensure_ccw(s))) for s in geom.oc_strips]
    assert abs(sum(areas) - x_oc * y_oc) / (x_oc * y_oc) < 1e-9


def test_regions_nest(geom):
    """IC ⊂ eff_reg2 ⊂ eff_reg1 and OC strips ⊂ eff_reg1."""
    hp1 = convex.halfplanes(geom.eff_reg1)
    hp2 = convex.halfplanes(geom.eff_reg2)

    def inside(hp, pts, tol=2e-3):  # simplify tolerance is 1e-3
        return np.all(hp[:, 0] * pts[:, 0:1] + hp[:, 1] * pts[:, 1:2] <= hp[:, 2] + tol)

    assert inside(hp2, geom.ic)
    assert inside(hp1, geom.eff_reg2)
    for s in geom.fc_strips:
        assert inside(hp2, s)
    for s in geom.oc_strips:
        assert inside(hp1, s)


def test_angle_tables_physical(geom):
    d = geom.design
    th_min = np.arcsin(d.n_air / d.n_glass)
    # all guided directions must be beyond the TIR critical angle
    for th in (geom.th_out_ic, geom.th_out_ic2, geom.th_out_fc, geom.th_out_oc):
        assert np.all(th > th_min)
        assert np.all(th < np.pi / 2)
    # TIR retardation is finite and nonzero
    assert np.all(np.isfinite(geom.lut_tir))
    # hop vectors are consistent with angles: |hop| = 2 t tan(theta)
    hop = np.hypot(geom.lut_gap[..., 0], geom.lut_gap[..., 1])
    assert np.allclose(hop, 2 * d.thickness * np.tan(geom.th_out_ic))


def test_fc_grating_closure(geom):
    """FC grating vector must close the k-space loop: IC + FC - revOC = 0."""
    d = geom.design
    g_ic = 2 * np.pi / d.lambda_ic * np.array([np.cos(d.phi_ic), np.sin(d.phi_ic)])
    g_oc_rev = (
        2 * np.pi / d.lambda_oc
        * np.array([np.cos(d.phi_oc + np.pi), np.sin(d.phi_oc + np.pi)])
    )
    g_fc = (
        2 * np.pi / geom.lambda_fc
        * np.array([np.cos(geom.phi_fc), np.sin(geom.phi_fc)])
    )
    assert np.allclose(g_ic + g_fc, g_oc_rev, atol=1e-12)


def test_fold_mirror_symmetry(geom):
    """Folding mirrors the guided direction across the x-axis of field space:
    th_fc(fx, fy) = th_ic(fx, -fy) and phi_fc = -phi_ic(fx, -fy), a consequence of
    the FC closure rule g_fc = -g_oc - g_ic with the paper's phi_oc = phi_ic - 104deg
    symmetric layout."""
    assert np.allclose(geom.th_out_fc, geom.th_out_ic[:, :, ::-1], rtol=1e-9)
    assert np.allclose(geom.phi_out_fc, -geom.phi_out_ic[:, :, ::-1], rtol=1e-9)


def test_eyebox_range_matches_quad(geom):
    q = geom.eyebox_quad
    r = geom.eyebox_range
    assert np.allclose(q[..., :, 0].min(-1), r[..., 0])
    assert np.allclose(q[..., :, 0].max(-1), r[..., 1])
    assert np.allclose(q[..., :, 1].min(-1), r[..., 2])
    assert np.allclose(q[..., :, 1].max(-1), r[..., 3])


def test_fov_grid_shapes(geom):
    assert geom.lut_gap.shape == (3, 20, 15, 8)
    assert geom.lut_tir.shape == (3, 20, 15, 4)
    assert geom.eyebox_range.shape == (20, 15, 4)
    assert geom.eyebox_quad.shape == (20, 15, 4, 2)
    assert geom.th_out_ic.shape == (3, 20, 15)


def test_determinism():
    a = generate_geometry(num_fov_x=8, num_fov_y=6)
    b = generate_geometry(num_fov_x=8, num_fov_y=6)
    assert np.array_equal(a.eff_reg1, b.eff_reg1)
    assert np.array_equal(a.lut_gap, b.lut_gap)
    for s1, s2 in zip(a.fc_strips, b.fc_strips):
        assert np.array_equal(s1, s2)


def test_design_variation_changes_geometry():
    base = generate_geometry(num_fov_x=8, num_fov_y=6)
    wide = generate_geometry(
        WaveguideDesign(fov_x=np.deg2rad(24.0)), num_fov_x=8, num_fov_y=6
    )
    # wider FoV -> larger out-coupler rectangle
    a0 = sum(abs(convex.polygon_area(convex.ensure_ccw(s))) for s in base.oc_strips)
    a1 = sum(abs(convex.polygon_area(convex.ensure_ccw(s))) for s in wide.oc_strips)
    assert a1 > a0


def test_default_config_matches_reference_constants():
    """Pin the workload contract to the reference driver's constants
    (gpu_ray_tracing_pro_fullColor.py:16-17,37,60-61,160;
    GPU_ray_tracing_functions.py:905)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
        TraceConfig,
        WaveguideDesign,
    )

    cfg = TraceConfig()
    assert (cfg.num_fov_x, cfg.num_fov_y) == (100, 75)
    assert cfg.rays_per_fov == 5000
    assert cfg.num_iter == 4
    assert cfg.eyebox_bins == (80, 120)
    assert cfg.max_bounces == 100_000

    d = WaveguideDesign()
    assert d.wavelengths == (465.0, 532.0, 630.0)
    assert d.n_glass == 1.9
    assert d.thickness == 0.7
    assert (d.num_fc, d.num_oc) == (7, 6)
    assert d.pupil_radius == 2.0
    assert d.ic_center == (-28.0, 15.0)
    assert d.eyebox_size == (12.0, 8.0)
    assert d.eyebox_center == (0.0, 15.0)
    assert d.eye_relief == -20.0
    assert d.lambda_ic == 388.0 and d.lambda_oc == 388.0
    assert abs(np.degrees(d.phi_ic) - (-38.0)) < 1e-12
    assert abs(np.degrees(d.phi_oc) - (-142.0)) < 1e-12
    assert abs(np.degrees(d.fov_x) - 18.0) < 1e-12
