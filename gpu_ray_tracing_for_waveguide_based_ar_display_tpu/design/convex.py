"""Convex 2-D computational-geometry utilities (host-side, numpy float64).

The reference leans on shapely for polygon intersection / validation / simplification
(/root/reference/couplers_coor.py:408-452,557-600).  Every polygon it manipulates is
convex (convex hulls and band-slices of convex hulls), so this module implements the
few required operations directly:

- ``convex_hull``       ordered hull vertices (scipy.spatial.ConvexHull)
- ``clip_convex``       Sutherland-Hodgman convex-convex intersection
- ``simplify_ring``     Douglas-Peucker polyline simplification
- ``halfplanes``        convex polygon -> inward half-plane normal form
- ``point_in_polygon``  even-odd crossing test (numpy oracle used by tests; semantics of
                        /root/reference/GPU_ray_tracing_functions.py:36-71)
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull


def hull_candidates(points: np.ndarray) -> np.ndarray:
    """Indices of points that can be hull vertices (Akl-Toussaint prefilter).

    Drops points strictly inside the octagon spanned by the 8 extreme points
    (min/max of x, y, x+y, x-y).  Exact-conservative for non-degenerate
    inputs: the returned subset contains every hull vertex of the full set,
    in the original relative order — and qhull's output *ring* on the subset
    matches the full-set ring (pinned by tests/test_convex.py and the design
    fuzz; ~4% of the design pipeline's 30k-point clouds survive, cutting the
    hull cost ~2.5x).  The strictly-inside slack scales with the data: the
    f64 cross-product rounding error grows ~eps * R^2 with the coordinate
    magnitude R, so an absolute 1e-12 would misclassify boundary-grazing
    hull vertices once |coords| reaches ~1e2 (ADVICE r3).  Degenerate inputs
    fall back to "keep everything"."""
    points = np.asarray(points, dtype=np.float64)
    x, y = points[:, 0], points[:, 1]
    proj = np.stack([x, y, x + y, x - y], axis=0)
    ei = np.unique(np.concatenate([proj.argmin(axis=1), proj.argmax(axis=1)]))
    if len(ei) < 3 or not np.isfinite(points).all():
        return np.arange(len(points))
    oct_pts = points[ei]
    try:
        oh = oct_pts[ConvexHull(oct_pts).vertices]  # CCW octagon
    except Exception:
        return np.arange(len(points))
    a = oh
    b = np.roll(oh, -1, axis=0)
    ex, ey = (b - a)[:, 0], (b - a)[:, 1]
    # conservative strictly-inside slack, scaled to the squared coordinate
    # magnitude (the cross product is a difference of coordinate products,
    # so its rounding error is ~eps * R^2, not an absolute constant)
    r_max = float(np.max(np.abs(points))) if len(points) else 1.0
    tol = 64.0 * np.finfo(np.float64).eps * max(1.0, r_max) ** 2
    inside = np.ones(len(points), dtype=bool)
    for i in range(len(oh)):
        # strictly left of every CCW edge, with the conservative slack so
        # boundary-grazing points are kept
        inside &= (ex[i] * (y - a[i, 1]) - ey[i] * (x - a[i, 0])) > tol
    return np.flatnonzero(~inside)


# points below this count skip the prefilter (the filter pass costs more
# than qhull saves on small sets)
_PREFILTER_MIN = 4096


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Counter-clockwise hull vertices of an (N, 2) point set, shape (H, 2).

    Large inputs run through :func:`hull_candidates` first; the output ring
    is bitwise-identical to the unfiltered call (see hull_candidates)."""
    points = np.asarray(points, dtype=np.float64)
    if len(points) > _PREFILTER_MIN:
        cand = hull_candidates(points)
        sub = points[cand]
        return sub[ConvexHull(sub).vertices]
    hull = ConvexHull(points)
    return points[hull.vertices]


def polygon_area(verts: np.ndarray) -> float:
    """Signed area (positive for counter-clockwise rings)."""
    x, y = verts[:, 0], verts[:, 1]
    # rolled views built by slice-assignment: same element values and the same
    # np.sum pairwise reduction order as np.roll(..., -1), without np.roll's
    # axis-normalization overhead (hot under the band slicer's ensure_ccw)
    yr = np.empty_like(y)
    yr[:-1] = y[1:]
    yr[-1] = y[0]
    xr = np.empty_like(x)
    xr[:-1] = x[1:]
    xr[-1] = x[0]
    return 0.5 * float(np.sum(x * yr - xr * y))


def ensure_ccw(verts: np.ndarray) -> np.ndarray:
    return verts if polygon_area(verts) >= 0 else verts[::-1]


def clip_convex(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Intersection of two convex polygons (Sutherland-Hodgman).

    Both inputs are (N, 2) vertex rings (any orientation). Returns (M, 2) vertices of
    the intersection (possibly empty with M == 0).

    The hot loop runs on Python floats: numpy scalar indexing/allocation dominated
    sweep host prep on the ~10-vertex rings the band slicer produces (a *vectorized*
    inner loop measured slower still — see STATUS).  Every arithmetic op keeps the
    elementwise order of the former numpy form, so results are bitwise-identical
    (asserted in tests/test_convex.py::test_clip_scalar_matches_numpy_form).
    """
    out = ensure_ccw(np.asarray(subject, dtype=np.float64))
    clipper = ensure_ccw(np.asarray(clipper, dtype=np.float64))
    ox = out[:, 0].tolist()
    oy = out[:, 1].tolist()
    cx = clipper[:, 0].tolist()
    cy = clipper[:, 1].tolist()
    n = len(cx)
    for i in range(n):
        m = len(ox)
        if m == 0:
            return np.empty((0, 2), dtype=np.float64)
        ax, ay = cx[i], cy[i]
        k = i + 1
        if k == n:
            k = 0
        # inside = left of directed edge a->b for a CCW clipper
        ex = cx[k] - ax
        ey = cy[k] - ay
        inside = [(ox[j] - ax) * ey - (oy[j] - ay) * ex <= 0.0 for j in range(m)]
        nxs: list = []
        nys: list = []
        for j in range(m):
            k2 = j + 1
            if k2 == m:
                k2 = 0
            inj = inside[j]
            if inj:
                nxs.append(ox[j])
                nys.append(oy[j])
            if inj != inside[k2]:
                # segment p-q crosses the infinite line through a-b
                px, py = ox[j], oy[j]
                rx = ox[k2] - px
                ry = oy[k2] - py
                denom = rx * ey - ry * ex
                t = ((ax - px) * ey - (ay - py) * ex) / denom
                nxs.append(px + t * rx)
                nys.append(py + t * ry)
        ox, oy = nxs, nys
    return np.stack(
        [np.asarray(ox, dtype=np.float64), np.asarray(oy, dtype=np.float64)],
        axis=1,
    ) if ox else np.empty((0, 2), dtype=np.float64)


def simplify_ring(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker simplification of an open polyline (endpoints preserved).

    Matches the effect of ``shapely.LineString.simplify(tol)`` used at
    /root/reference/couplers_coor.py:402-404,552-554 on hull-vertex polylines.
    """
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 3:
        return coords
    keep = np.zeros(len(coords), dtype=bool)
    keep[0] = keep[-1] = True
    # scalar hot loop on Python floats: the per-pop numpy slicing/temporaries
    # dominated sweep host prep on the ~100-vertex hull rings.  Elementwise op
    # order matches the former vectorized form exactly (cross-product, abs,
    # divide; first-max tie-break like np.argmax), so the kept-vertex set is
    # bitwise-identical (asserted in test_convex.py::test_simplify_scalar_form).
    xs = coords[:, 0].tolist()
    ys = coords[:, 1].tolist()
    stack = [(0, len(coords) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        x0, y0 = xs[i0], ys[i0]
        sx = xs[i1] - x0
        sy = ys[i1] - y0
        seg_len = float(np.hypot(sx, sy))
        dmax = -1.0
        kmax = -1
        if seg_len == 0.0:
            for j in range(i0 + 1, i1):
                d = float(np.hypot(xs[j] - x0, ys[j] - y0))
                if d > dmax:
                    dmax, kmax = d, j
        else:
            for j in range(i0 + 1, i1):
                d = abs((xs[j] - x0) * sy - (ys[j] - y0) * sx) / seg_len
                if d > dmax:
                    dmax, kmax = d, j
        if dmax > tol:
            keep[kmax] = True
            stack.append((i0, kmax))
            stack.append((kmax, i1))
    return coords[keep]


def halfplanes(verts: np.ndarray) -> np.ndarray:
    """Convex polygon -> (E, 3) rows (nx, ny, c) with inside iff nx*x + ny*y <= c.

    Normals are unit-length so a signed distance tolerance can be applied directly.
    Zero-length edges (duplicate vertices) are dropped.
    """
    verts = ensure_ccw(np.asarray(verts, dtype=np.float64))
    a = verts
    b = np.roll(verts, -1, axis=0)
    edge = b - a
    length = np.hypot(edge[:, 0], edge[:, 1])
    ok = length > 1e-15
    a, edge, length = a[ok], edge[ok], length[ok]
    # outward normal of a CCW ring edge (ex, ey) is (ey, -ex)
    nx = edge[:, 1] / length
    ny = -edge[:, 0] / length
    c = nx * a[:, 0] + ny * a[:, 1]
    return np.stack([nx, ny, c], axis=1)


def point_in_polygon(px, py, verts: np.ndarray) -> np.ndarray:
    """Vectorized even-odd crossing test (strict interior), numpy oracle.

    Same crossing rule (including the 1e-20 slope epsilon) as the reference device
    function ``is_inside_polygon`` (/root/reference/GPU_ray_tracing_functions.py:36-50).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(np.broadcast(px, py).shape, dtype=bool)
    n = len(verts)
    j = n - 1
    for i in range(n):
        xi, yi = verts[i]
        xj, yj = verts[j]
        cond = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi + 1e-20) + xi
        )
        inside ^= cond
        j = i
    return inside


def point_on_edge(px, py, verts: np.ndarray, tol: float = 1e-12) -> np.ndarray:
    """Vectorized point-on-boundary test mirroring ``point_on_segment`` semantics
    (/root/reference/GPU_ray_tracing_functions.py:52-61)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    on = np.zeros(np.broadcast(px, py).shape, dtype=bool)
    n = len(verts)
    j = n - 1
    for i in range(n):
        x1, y1 = verts[j]
        x2, y2 = verts[i]
        inbox = (
            (px >= min(x1, x2) - tol)
            & (px <= max(x1, x2) + tol)
            & (py >= min(y1, y2) - tol)
            & (py <= max(y1, y2) + tol)
        )
        cross = np.abs((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) <= tol
        on |= inbox & cross
        j = i
    return on


def point_in_or_on(px, py, verts: np.ndarray, tol: float = 1e-12) -> np.ndarray:
    """Interior-or-boundary oracle (``is_inside_or_on_edge`` semantics)."""
    return point_in_polygon(px, py, verts) | point_on_edge(px, py, verts, tol)


def concave_boundary(points: np.ndarray, alpha: float = 0.1) -> np.ndarray:
    """Alpha-shape exterior ring of a 2-D point cloud (CCW, (V, 2)).

    In-repo rebuild of the reference's angular-response boundaries —
    ``alphashape.alphashape(points, alpha).exterior``
    (/root/reference/plot_design_fullColor.py:141-228) — without the
    alphashape/shapely dependencies: Delaunay triangles with circumradius
    <= 1/alpha are kept (the standard alpha complex) and the exterior is
    the chained ring of edges used by exactly one kept triangle; when the
    complex has several components the largest-area ring is returned (the
    reference's ``.exterior`` presumes a single polygon).  Concave clouds
    (the guided (theta, phi) footprints are crescent-shaped) keep their
    notches instead of being overstated by a convex hull.  Falls back to
    the convex hull for degenerate clouds (< 3 unique points, collinear
    input, or an alpha too small to keep any triangle)."""
    pts = np.unique(np.asarray(points, float), axis=0)
    if len(pts) < 3:
        return pts
    d = pts - pts.mean(axis=0)
    s = np.linalg.svd(d, compute_uv=False)
    if s[-1] <= 1e-12 * max(s[0], 1.0):
        # collinear cloud: the "ring" degenerates to the extreme segment
        t = d @ (d[np.argmax(np.hypot(*d.T))] / max(s[0], 1e-300))
        return pts[[int(np.argmin(t)), int(np.argmax(t))]]
    from scipy.spatial import Delaunay

    tri = Delaunay(pts).simplices
    a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    la = np.hypot(*(b - c).T)
    lb = np.hypot(*(a - c).T)
    lc = np.hypot(*(a - b).T)
    cross = (b - a)[:, 0] * (c - a)[:, 1] - (b - a)[:, 1] * (c - a)[:, 0]
    # circumradius R = la*lb*lc / (2 |cross|); degenerate slivers -> inf
    with np.errstate(divide="ignore", over="ignore"):
        R = la * lb * lc / np.abs(2.0 * cross)
    keep = tri[R <= 1.0 / alpha]
    if not len(keep):
        return convex_hull(pts)
    # orient every kept triangle CCW so boundary edges chain head -> tail
    kc = cross[R <= 1.0 / alpha]
    keep = np.where(kc[:, None] >= 0, keep, keep[:, ::-1])
    edges = np.concatenate([keep[:, [0, 1]], keep[:, [1, 2]], keep[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    _, inv, counts = np.unique(und, axis=0, return_inverse=True,
                               return_counts=True)
    bedges = edges[counts[inv] == 1]
    nxt = dict(bedges)          # CCW: each boundary vertex has one successor
    rings, seen = [], set()
    for start in nxt:
        if start in seen:
            continue
        ring, v = [], start
        while v not in seen:
            seen.add(v)
            ring.append(v)
            v = nxt.get(v)
            if v is None:
                break
        if v == start and len(ring) >= 3:
            rings.append(np.asarray(ring))
    if not rings:
        return convex_hull(pts)
    areas = [abs(polygon_area(pts[r])) for r in rings]
    return pts[rings[int(np.argmax(areas))]]


def simplify_to_max_edges(verts: np.ndarray, max_edges: int,
                          tols=(0.0, 1e-3, 2e-3, 5e-3, 1e-2, 2e-2, 5e-2, 0.1, 0.2)) -> np.ndarray:
    """Smallest-tolerance Douglas-Peucker simplification with <= max_edges vertices.

    Used by the Pallas engine, which holds region half-planes as in-register scalars
    (boundary shift is bounded by the chosen tolerance, <= 0.2 mm worst case)."""
    for tol in tols:
        out = simplify_ring(verts, tol) if tol > 0 else verts
        if len(out) <= max_edges:
            return out
    # fall back to the convex hull of a decimated ring
    step = int(np.ceil(len(verts) / max_edges))
    return verts[::step]


def count_polygons(polys) -> int:
    """Number of polygon rings in a geometry (``count_polygons`` parity,
    /root/reference/couplers_coor.py:112-120).

    The reference counts shapely (Multi)Polygon members; here geometry soups are
    CSR packs, so ``polys`` may be a CSR offset array (``FC_offset``-style,
    monotone int array of length n_rings + 1), a list/tuple of vertex rings, or
    a single (N, 2) ring.  An empty geometry counts 0; anything else raises
    TypeError like the reference.
    """
    if isinstance(polys, (list, tuple)):
        return len(polys)
    arr = np.asarray(polys)
    if arr.size == 0:
        return 0
    if arr.ndim == 1 and np.issubdtype(arr.dtype, np.integer):
        if len(arr) < 1 or np.any(np.diff(arr) < 0):
            raise TypeError("offset arrays must be monotone non-decreasing")
        return len(arr) - 1
    if arr.ndim == 2 and arr.shape[1] == 2:
        return 1
    raise TypeError("Input is not a vertex ring, ring list, or CSR offsets.")
