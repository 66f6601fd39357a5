"""Pure-Python stand-in for the slice of ``shapely`` the reference uses.

/root/reference/couplers_coor.py only ever intersects *convex* polygons (hull
slices against axis-aligned bands, :431,:578) and simplifies convex hull chains
(:402-404,:551-554), so a Sutherland-Hodgman clip and Douglas-Peucker simplify
cover the whole execution path of ``couplers_coor_full_color``.  ``make_valid``
(:393,:449) is applied to already-valid parallelograms whose sanitized results
feed only dead locals — identity suffices.  ``unary_union``/``polygonize``/
``affinity``/``difference`` are imported but unreached; they raise if called.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _as_points(coords):
    pts = [(float(p[0]), float(p[1])) for p in coords]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


def _signed_area(pts):
    a = 0.0
    n = len(pts)
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return 0.5 * a


class _Ring:
    """Exterior ring: closed coords (first point repeated last), like shapely."""

    def __init__(self, pts):
        self._pts = list(pts)

    @property
    def coords(self):
        if not self._pts:
            return []
        return self._pts + [self._pts[0]]

    @property
    def xy(self):
        c = self.coords
        return (np.array([p[0] for p in c]), np.array([p[1] for p in c]))


class _Geom:
    @property
    def is_valid(self):
        return True


class Polygon(_Geom):
    def __init__(self, coords=None):
        self._pts = _as_points(coords) if coords is not None else []

    geom_type = "Polygon"

    @property
    def is_empty(self):
        return len(self._pts) < 3

    @property
    def exterior(self):
        return _Ring(self._pts)

    @property
    def interiors(self):
        return []

    def intersection(self, other):
        if self.is_empty or other.is_empty:
            return Polygon()
        out = _clip_convex(self._pts, other._pts)
        if len(out) < 3:
            return Polygon()
        return Polygon(out)

    def difference(self, other):
        raise NotImplementedError(
            "polygon difference is only reached via the reference's dead "
            "overlap_FOV helper")


class MultiPolygon(_Geom):
    def __init__(self, polys=None):
        self.geoms = list(polys) if polys else []

    geom_type = "MultiPolygon"

    @property
    def is_empty(self):
        return not self.geoms


class GeometryCollection(_Geom):
    def __init__(self, geoms=None):
        self.geoms = list(geoms) if geoms else []

    geom_type = "GeometryCollection"

    @property
    def is_empty(self):
        return not self.geoms


class LineString(_Geom):
    def __init__(self, coords):
        self._pts = [(float(p[0]), float(p[1])) for p in coords]

    geom_type = "LineString"

    @property
    def is_empty(self):
        return len(self._pts) < 2

    @property
    def coords(self):
        return list(self._pts)

    @property
    def xy(self):
        return (np.array([p[0] for p in self._pts]),
                np.array([p[1] for p in self._pts]))

    def simplify(self, tolerance, preserve_topology=True):
        # Douglas-Peucker with endpoints preserved (GEOS semantics for simple
        # open chains; topology preservation never differs on convex inputs).
        return LineString(_douglas_peucker(self._pts, tolerance))


def _douglas_peucker(pts, tol):
    if len(pts) < 3:
        return list(pts)
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    P = np.asarray(pts, dtype=np.float64)
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        a, b = P[i], P[j]
        ab = b - a
        seg_len = np.hypot(*ab)
        mid = P[i + 1 : j]
        if seg_len == 0.0:
            d = np.hypot(mid[:, 0] - a[0], mid[:, 1] - a[1])
        else:
            d = np.abs(ab[0] * (mid[:, 1] - a[1]) - ab[1] * (mid[:, 0] - a[0])) / seg_len
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return [pts[i] for i in range(len(pts)) if keep[i]]


def _clip_convex(subject, clip):
    """Sutherland-Hodgman: clip ``subject`` by convex polygon ``clip``."""
    if _signed_area(clip) < 0:
        clip = clip[::-1]
    out = list(subject)
    n = len(clip)
    for i in range(n):
        if not out:
            break
        cx1, cy1 = clip[i]
        cx2, cy2 = clip[(i + 1) % n]
        ex, ey = cx2 - cx1, cy2 - cy1

        def inside(p):
            return ex * (p[1] - cy1) - ey * (p[0] - cx1) >= 0.0

        def intersect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            t = (ey * (p[0] - cx1) - ex * (p[1] - cy1)) / denom
            return (p[0] + t * dx, p[1] + t * dy)

        nxt = []
        for k in range(len(out)):
            cur, prev = out[k], out[k - 1]
            if inside(cur):
                if not inside(prev):
                    nxt.append(intersect(prev, cur))
                nxt.append(cur)
            elif inside(prev):
                nxt.append(intersect(prev, cur))
        out = nxt
    # drop consecutive duplicates introduced by on-edge vertices
    dedup = []
    for p in out:
        if not dedup or (abs(p[0] - dedup[-1][0]) > 1e-12
                         or abs(p[1] - dedup[-1][1]) > 1e-12):
            dedup.append(p)
    if len(dedup) > 1 and (abs(dedup[0][0] - dedup[-1][0]) <= 1e-12
                           and abs(dedup[0][1] - dedup[-1][1]) <= 1e-12):
        dedup.pop()
    return dedup


def make_valid(geom):
    return geom


def _unary_union(*a, **k):
    raise NotImplementedError


def _polygonize(*a, **k):
    raise NotImplementedError


def install():
    """Register the stub as ``shapely`` in sys.modules (no-op if shapely exists)."""
    if "shapely" in sys.modules and not getattr(
        sys.modules["shapely"], "_IS_REF_STUB", False
    ):
        return
    try:
        import shapely  # noqa: F401

        return
    except ImportError:
        pass

    shp = types.ModuleType("shapely")
    shp._IS_REF_STUB = True
    geometry = types.ModuleType("shapely.geometry")
    validation = types.ModuleType("shapely.validation")
    ops = types.ModuleType("shapely.ops")
    affinity = types.ModuleType("shapely.affinity")

    geometry.Polygon = Polygon
    geometry.MultiPolygon = MultiPolygon
    geometry.LineString = LineString
    geometry.GeometryCollection = GeometryCollection
    validation.make_valid = make_valid
    ops.unary_union = _unary_union
    ops.polygonize = _polygonize

    shp.geometry = geometry
    shp.validation = validation
    shp.ops = ops
    shp.affinity = affinity

    sys.modules["shapely"] = shp
    sys.modules["shapely.geometry"] = geometry
    sys.modules["shapely.validation"] = validation
    sys.modules["shapely.ops"] = ops
    sys.modules["shapely.affinity"] = affinity
