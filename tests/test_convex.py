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


def _clip_numpy_form(subject, clipper):
    """The former vectorized-numpy Sutherland-Hodgman; reference form for the
    bitwise-equivalence guarantee claimed in clip_convex's docstring."""
    out = convex.ensure_ccw(np.asarray(subject, dtype=np.float64))
    clipper = convex.ensure_ccw(np.asarray(clipper, dtype=np.float64))

    def li(p, q, a, b):
        r = q - p
        s = b - a
        denom = r[0] * s[1] - r[1] * s[0]
        t = ((a[0] - p[0]) * s[1] - (a[1] - p[1]) * s[0]) / denom
        return p + t * r

    n = len(clipper)
    for i in range(n):
        if len(out) == 0:
            return out.reshape(0, 2)
        a, b = clipper[i], clipper[(i + 1) % n]
        edge = b - a
        d = (out[:, 0] - a[0]) * edge[1] - (out[:, 1] - a[1]) * edge[0]
        inside = d <= 0.0
        new_pts = []
        for j in range(len(out)):
            k = (j + 1) % len(out)
            if inside[j]:
                new_pts.append(out[j])
                if not inside[k]:
                    new_pts.append(li(out[j], out[k], a, b))
            elif inside[k]:
                new_pts.append(li(out[j], out[k], a, b))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def _simplify_numpy_form(coords, tol):
    """The former vectorized Douglas-Peucker (np.argmax tie-break)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 3:
        return coords
    keep = np.zeros(len(coords), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = coords[i1] - coords[i0]
        seg_len = np.hypot(*seg)
        pts = coords[i0 + 1: i1]
        if seg_len == 0.0:
            d = np.hypot(pts[:, 0] - coords[i0, 0], pts[:, 1] - coords[i0, 1])
        else:
            d = np.abs(
                (pts[:, 0] - coords[i0, 0]) * seg[1]
                - (pts[:, 1] - coords[i0, 1]) * seg[0]
            ) / seg_len
        imax = int(np.argmax(d))
        if d[imax] > tol:
            k = i0 + 1 + imax
            keep[k] = True
            stack.append((i0, k))
            stack.append((k, i1))
    return coords[keep]


def test_clip_scalar_matches_numpy_form():
    rng = np.random.default_rng(7)
    for _ in range(200):
        pts = rng.normal(size=(int(rng.integers(4, 40)), 2)) * rng.uniform(0.1, 10)
        sub = convex.convex_hull(pts)
        lo, hi = sorted(rng.normal(size=2) * 2)
        band = np.array([[-20, lo], [20, lo], [20, hi], [-20, hi]], dtype=float)
        a = _clip_numpy_form(sub, band)
        b = convex.clip_convex(sub, band)
        assert a.shape == b.shape
        assert np.array_equal(a, b)


def test_simplify_scalar_form():
    rng = np.random.default_rng(8)
    for _ in range(200):
        ring = convex.convex_hull(rng.normal(size=(300, 2)))
        tol = float(rng.uniform(0.0, 0.2))
        a = _simplify_numpy_form(ring, tol)
        b = convex.simplify_ring(ring, tol)
        assert np.array_equal(a, b)
    # duplicate-endpoint (zero-length baseline segment) branch
    ring = np.array([[0.0, 0.0], [1.0, 0.5], [2.0, -0.5], [0.0, 0.0]])
    assert np.array_equal(
        _simplify_numpy_form(ring, 0.1), convex.simplify_ring(ring, 0.1))


def test_polygon_area_matches_roll_form():
    rng = np.random.default_rng(9)
    for _ in range(50):
        v = rng.normal(size=(int(rng.integers(3, 50)), 2))
        x, y = v[:, 0], v[:, 1]
        ref = 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        assert convex.polygon_area(v) == ref


def test_hull_prefilter_ring_bitwise():
    """convex_hull's Akl-Toussaint prefilter must return the bitwise-identical
    ring to a plain qhull call — on random clouds and on the real design
    pipeline's tangent-intersection cloud."""
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(7)
    for n in (5000, 20000):
        pts = rng.normal(size=(n, 2)) * [3.0, 1.5] + [10.0, -4.0]
        ring_plain = pts[ConvexHull(pts).vertices]
        ring_fast = convex.convex_hull(pts)          # n > threshold -> filtered
        np.testing.assert_array_equal(ring_plain, ring_fast)
        cand = convex.hull_candidates(pts)
        assert len(cand) < n  # the filter actually drops points

    import dataclasses

    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.config import (
        WaveguideDesign,
    )
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        geometry as G,
    )

    for pk in ({}, {"lambda_ic": 379.0, "lambda_oc": 379.0},
               {"phi_ic": WaveguideDesign().phi_ic + 0.07, "thickness": 0.6}):
        d = dataclasses.replace(WaveguideDesign(), **pk)
        lmd = np.asarray(d.wavelengths)
        g_ic, _, g_fc, _, _ = G._grating_vectors(d)
        ns = d.design_sweep_n
        fx = np.linspace(-d.fov_x / 2, d.fov_x / 2, ns)[:, None, None]
        fy = np.linspace(-d.fov_y / 2, d.fov_y / 2, ns)[None, :, None]
        cloud, *_ = G._fold_intersections(
            d, fx, fy, (2 * np.pi / lmd)[None, None, :], g_ic, g_fc)
        ring_plain = cloud[ConvexHull(cloud).vertices]
        np.testing.assert_array_equal(ring_plain, convex.convex_hull(cloud))

    # degenerate inputs fall back to keep-everything (no crash, exact hull)
    line = np.stack([np.linspace(0, 1, 5000), np.linspace(0, 2, 5000)], axis=1)
    assert len(convex.hull_candidates(line)) == 5000


def test_hull_prefilter_scale_invariant_slack():
    """The prefilter's strictly-inside slack must scale with the coordinate
    magnitude (ADVICE r3): at |coords| ~ 1e3+ the f64 cross-product rounding
    error exceeds an absolute 1e-12, so a true hull vertex lying within
    rounding of an octagon edge would be silently dropped with a fixed
    slack.  Construct exactly that: collinear-up-to-rounding boundary points
    on a large-magnitude cloud, and check the hull ring survives filtering."""
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(11)
    for scale in (1.0, 1e2, 1e4, 1e6):
        # dense cloud + points ON the octagon boundary (midpoints of extreme
        # -point pairs are exactly the rounding-critical case)
        pts = (rng.normal(size=(8000, 2)) + 3.0) * scale
        x, y = pts[:, 0], pts[:, 1]
        proj = np.stack([x, y, x + y, x - y], axis=0)
        ei = np.unique(np.concatenate([proj.argmin(axis=1),
                                       proj.argmax(axis=1)]))
        ring = pts[ei]
        mids = (ring + np.roll(ring, -1, axis=0)) / 2.0
        cloud = np.concatenate([pts, mids])
        ring_plain = cloud[ConvexHull(cloud).vertices]
        ring_fast = convex.convex_hull(
            cloud) if len(cloud) > 4096 else None
        cand = convex.hull_candidates(cloud)
        kept = set(map(tuple, cloud[cand]))
        for v in ring_plain:
            assert tuple(v) in kept, (scale, v)
        if ring_fast is not None:
            np.testing.assert_array_equal(ring_plain, ring_fast)


def test_concave_boundary_keeps_notch():
    """Alpha-shape ring of a U-shaped cloud excludes the notch a convex hull
    would cover (the reference's angular-response panels use concave
    alpha-shapes, plot_design_fullColor.py:141-228)."""
    from matplotlib.path import Path

    xs, ys = np.meshgrid(np.linspace(0, 4, 17), np.linspace(0, 4, 17))
    mask = ~((xs > 1.2) & (xs < 2.8) & (ys > 1.2))
    pts = np.column_stack([xs[mask], ys[mask]])
    ring = convex.concave_boundary(pts, alpha=1.0)
    hull = convex.convex_hull(pts)
    assert abs(convex.polygon_area(ring)) < 0.85 * abs(convex.polygon_area(hull))
    # ring vertices are cloud points (alpha shapes never invent vertices)
    cloud = set(map(tuple, pts))
    assert all(tuple(v) in cloud for v in ring)
    p = Path(ring)
    assert not p.contains_point((2.0, 3.0))      # inside the notch
    assert p.contains_point((0.5, 0.5))          # inside the solid arm


def test_concave_boundary_convex_cloud_matches_hull():
    """On a filled convex cloud the alpha shape equals the convex hull (same
    area) whenever 1/alpha exceeds the sampling pitch."""
    xs, ys = np.meshgrid(np.linspace(0, 4, 17), np.linspace(0, 4, 17))
    pts = np.column_stack([xs.ravel(), ys.ravel()])
    ring = convex.concave_boundary(pts, alpha=0.1)
    assert abs(abs(convex.polygon_area(ring)) - 16.0) < 1e-9


def test_concave_boundary_degenerate():
    """Collinear clouds degenerate to the extreme segment; tiny clouds pass
    through; an alpha far too sharp falls back to the convex hull."""
    seg = convex.concave_boundary(
        np.column_stack([np.arange(5.0), 2.0 * np.arange(5.0)]), alpha=0.1)
    assert seg.shape == (2, 2)
    assert {tuple(v) for v in seg} == {(0.0, 0.0), (4.0, 8.0)}
    two = convex.concave_boundary(np.array([[0.0, 0.0], [1.0, 1.0]]))
    assert two.shape == (2, 2)
    rng = np.random.default_rng(3)
    cloud = rng.random((40, 2)) * 10.0
    ring = convex.concave_boundary(cloud, alpha=1e9)  # keeps no triangle
    np.testing.assert_array_equal(ring, convex.convex_hull(cloud))


def test_concave_boundary_design_clouds():
    """Golden-shape properties on the real paper-design angular clouds: the
    per-stage rings close, use only cloud points, and never exceed the
    convex hull's footprint (they equal it only where the cloud is convex)."""
    from gpu_ray_tracing_for_waveguide_based_ar_display_tpu.design import (
        generate_geometry,
    )

    g = generate_geometry(num_fov_x=16, num_fov_y=12)
    any_concave = False
    for th, ph in ((g.th_out_ic, g.phi_out_ic), (g.th_out_fc, g.phi_out_fc),
                   (g.th_out_oc, g.phi_out_oc)):
        for li in range(th.shape[0]):
            pts = np.column_stack([np.degrees(th[li]).ravel(),
                                   np.degrees(ph[li]).ravel()])
            ring = convex.concave_boundary(pts, alpha=0.1)
            assert len(ring) >= 3
            hull_area = abs(convex.polygon_area(convex.convex_hull(pts)))
            ring_area = abs(convex.polygon_area(ring))
            assert ring_area <= hull_area + 1e-9
            any_concave |= ring_area < 0.999 * hull_area
            cloud = set(map(tuple, np.unique(pts, axis=0)))
            assert all(tuple(v) in cloud for v in ring)
    assert any_concave     # at least one stage is genuinely non-convex
