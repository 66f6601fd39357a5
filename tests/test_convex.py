import numpy as np
import pytest

from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import convex


def test_convex_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.7]])
    hull = convex.convex_hull(pts)
    assert len(hull) == 4
    assert abs(convex.polygon_area(convex.ensure_ccw(hull)) - 1.0) < 1e-12


def test_clip_convex_overlapping_squares():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    b = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], dtype=float)
    out = convex.clip_convex(a, b)
    assert abs(abs(convex.polygon_area(convex.ensure_ccw(out))) - 1.0) < 1e-12
    assert np.allclose(sorted(out[:, 0]), [1, 1, 2, 2])


def test_clip_convex_disjoint():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    b = a + 5.0
    assert len(convex.clip_convex(a, b)) == 0


def test_clip_convex_band_matches_area():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 2))
    hull = convex.convex_hull(pts)
    total = convex.polygon_area(convex.ensure_ccw(hull))
    # slice into 5 horizontal bands; areas must sum to the whole
    ys = np.linspace(hull[:, 1].min(), hull[:, 1].max(), 6)
    area = 0.0
    for lo, hi in zip(ys[:-1], ys[1:]):
        band = np.array([[-10, lo], [10, lo], [10, hi], [-10, hi]], dtype=float)
        cut = convex.clip_convex(hull, band)
        if len(cut):
            area += abs(convex.polygon_area(convex.ensure_ccw(cut)))
    assert abs(area - total) < 1e-9


def test_simplify_ring_collinear():
    line = np.array([[0, 0], [0.5, 1e-6], [1, 0], [2, 0.5]], dtype=float)
    out = convex.simplify_ring(line, 1e-3)
    assert len(out) == 3  # middle collinear-ish point dropped
    out2 = convex.simplify_ring(line, 1e-9)
    assert len(out2) == 4


def test_halfplanes_agree_with_even_odd():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(30, 2))
    hull = convex.convex_hull(pts)
    hp = convex.halfplanes(hull)
    probe = rng.normal(size=(500, 2)) * 1.5
    inside_hp = np.all(
        hp[:, 0] * probe[:, 0:1] + hp[:, 1] * probe[:, 1:2] <= hp[:, 2] + 1e-9, axis=1
    )
    inside_eo = convex.point_in_or_on(probe[:, 0], probe[:, 1], hull)
    # boundary-grazing points may differ within tolerance; interior must agree
    dist = np.max(
        hp[:, 0] * probe[:, 0:1] + hp[:, 1] * probe[:, 1:2] - hp[:, 2], axis=1
    )
    clear = np.abs(dist) > 1e-7
    assert np.array_equal(inside_hp[clear], inside_eo[clear])


def test_point_in_polygon_square():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert convex.point_in_polygon(0.5, 0.5, sq)
    assert not convex.point_in_polygon(1.5, 0.5, sq)
    assert convex.point_on_edge(1.0, 0.5, sq)
    assert convex.point_in_or_on(1.0, 0.5, sq)


def test_count_polygons():
    ring = np.array([[0, 0], [1, 0], [1, 1]], dtype=float)
    assert convex.count_polygons(ring) == 1
    assert convex.count_polygons([ring, ring + 2.0]) == 2
    # CSR offsets (FC_offset-style, reference couplers_coor.py:713-728)
    assert convex.count_polygons(np.array([0, 5, 9, 14])) == 3
    assert convex.count_polygons(np.array([], dtype=float)) == 0
    with pytest.raises(TypeError):
        convex.count_polygons(np.array([3.0, 1.0, 2.0]))
    with pytest.raises(TypeError):
        convex.count_polygons(np.array([0, 5, 3]))
