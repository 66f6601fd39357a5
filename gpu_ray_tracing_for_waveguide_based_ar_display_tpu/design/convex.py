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


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Counter-clockwise hull vertices of an (N, 2) point set, shape (H, 2)."""
    points = np.asarray(points, dtype=np.float64)
    hull = ConvexHull(points)
    return points[hull.vertices]


def polygon_area(verts: np.ndarray) -> float:
    """Signed area (positive for counter-clockwise rings)."""
    x, y = verts[:, 0], verts[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def ensure_ccw(verts: np.ndarray) -> np.ndarray:
    return verts if polygon_area(verts) >= 0 else verts[::-1]


def clip_convex(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Intersection of two convex polygons (Sutherland-Hodgman).

    Both inputs are (N, 2) vertex rings (any orientation). Returns (M, 2) vertices of
    the intersection (possibly empty with M == 0).
    """
    out = ensure_ccw(np.asarray(subject, dtype=np.float64))
    clipper = ensure_ccw(np.asarray(clipper, dtype=np.float64))
    n = len(clipper)
    for i in range(n):
        if len(out) == 0:
            return out.reshape(0, 2)
        a = clipper[i]
        b = clipper[(i + 1) % n]
        edge = b - a
        # inside = left of directed edge a->b for a CCW clipper
        d = (out[:, 0] - a[0]) * edge[1] - (out[:, 1] - a[1]) * edge[0]
        inside = d <= 0.0
        new_pts = []
        m = len(out)
        for j in range(m):
            k = (j + 1) % m
            p, q = out[j], out[k]
            if inside[j]:
                new_pts.append(p)
                if not inside[k]:
                    new_pts.append(_line_intersect(p, q, a, b))
            elif inside[k]:
                new_pts.append(_line_intersect(p, q, a, b))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def _line_intersect(p: np.ndarray, q: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of segment p-q with the infinite line through a-b."""
    r = q - p
    s = b - a
    denom = r[0] * s[1] - r[1] * s[0]
    t = ((a[0] - p[0]) * s[1] - (a[1] - p[1]) * s[0]) / denom
    return p + t * r


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
    stack = [(0, len(coords) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = coords[i1] - coords[i0]
        seg_len = np.hypot(*seg)
        pts = coords[i0 + 1 : i1]
        if seg_len == 0.0:
            d = np.hypot(pts[:, 0] - coords[i0, 0], pts[:, 1] - coords[i0, 1])
        else:
            d = np.abs(
                (pts[:, 0] - coords[i0, 0]) * seg[1] - (pts[:, 1] - coords[i0, 1]) * seg[0]
            ) / seg_len
        imax = int(np.argmax(d))
        if d[imax] > tol:
            k = i0 + 1 + imax
            keep[k] = True
            stack.append((i0, k))
            stack.append((k, i1))
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
