"""Geometry kernels — vectorized NumPy; no external geo libraries.

Rebuilds the scalar geometry library of the reference
(util/src/main/scala/io/plasmap/util/GeoCalculator.scala):

- ``haversine_m``            <- GeoCalculator.orthodromicDistance (:96-105)
- ``points_in_ring`` / ``points_in_polygon``
                             <- GeoCalculator.within (Point case, :111-129),
                                exact ray-casting instead of JTS
- ``polygon_area`` / ``clip_area`` / ``fuzzy_within``
                             <- GeoCalculator.fuzzyWithin (:131-149):
                                "inner is within outer if intersection
                                area / inner area >= threshold (0.9)"
- ``envelope``               <- GeoCalculator.rectangle* (:151-202)
- ``assemble_rings``         <- geow Denormalizer ring assembly invoked at
                                processing/RelationFlow.scala:31,56 —
                                chains unclosed member ways into closed
                                rings per OSM multipolygon convention
- ``repair_ring``            <- GeowGeometryToJTSGeometry.scala:42-61
                                (pad <3-point rings, close open rings)

A polygon here is ``(outer_ring, [hole_ring, ...])`` where a ring is an
``(n, 2)`` float64 array of (lon, lat), closed or open (closure implied).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in metres (vectorized, broadcasting)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def _as_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.ndim != 2 or ring.shape[1] != 2:
        raise ValueError(f"ring must be (n,2), got {ring.shape}")
    # drop an explicit closing vertex; closure is implied
    if ring.shape[0] > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


def repair_ring(ring: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Pad degenerate (<3 distinct points) rings with epsilon-offset copies.

    Mirrors the reference's linear-ring repair hack
    (GeowGeometryToJTSGeometry.scala:42-61) so degenerate member
    geometries survive instead of failing the pipeline.
    """
    ring = _as_ring(ring)
    while ring.shape[0] < 3:
        ring = np.vstack([ring, ring[-1] + eps])
    return ring


def points_in_ring(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: bool mask of points inside ring.

    Boundary points are treated as inside (matches JTS ``within`` closely
    enough for fixture data; exact boundary rows are pinned by tests).
    """
    ring = _as_ring(ring)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # (npoints, nedges) broadcast
    px = lon[:, None]
    py = lat[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    # x coordinate of edge at scan line
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) / (y2[None, :] - y1[None, :]) * (x2[None, :] - x1[None, :])
    crossings = cond & (px < xint)
    return crossings.sum(axis=1) % 2 == 1


def points_in_polygon(lon, lat, outer: np.ndarray, holes: list[np.ndarray] | None = None) -> np.ndarray:
    """Inside outer ring and outside every hole."""
    inside = points_in_ring(lon, lat, outer)
    for h in holes or []:
        inside &= ~points_in_ring(lon, lat, h)
    return inside


def ring_area(ring: np.ndarray) -> float:
    """Unsigned shoelace area in square degrees (planar, fixture-scale)."""
    ring = _as_ring(ring)
    x = ring[:, 0]
    y = ring[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def polygon_area(outer: np.ndarray, holes: list[np.ndarray] | None = None) -> float:
    a = ring_area(outer)
    for h in holes or []:
        a -= ring_area(h)
    return max(a, 0.0)


def clip_ring_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of ``subject`` by CONVEX ``clip`` ring.

    Returns the clipped ring (possibly empty).  Used for exact
    intersection areas when the clip side is convex; the general
    (concave) case falls back to :func:`intersection_area_grid`.
    """
    clip = _as_ring(clip)
    # ensure counter-clockwise orientation of clip ring
    x = clip[:, 0]
    y = clip[:, 1]
    if (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0:
        clip = clip[::-1]
    out = _as_ring(subject)
    n = clip.shape[0]
    for i in range(n):
        if out.shape[0] == 0:
            return out
        a = clip[i]
        b = clip[(i + 1) % n]
        edge = (b[0] - a[0], b[1] - a[1])
        # signed distance: >=0 means inside (left of edge)
        d = (out[:, 0] - a[0]) * edge[1] - (out[:, 1] - a[1]) * edge[0]
        side = -d  # left-of for CCW
        nxt = np.roll(np.arange(out.shape[0]), -1)
        new_pts: list[np.ndarray] = []
        for j in range(out.shape[0]):
            k = nxt[j]
            cur_in = side[j] >= 0
            nxt_in = side[k] >= 0
            if cur_in:
                new_pts.append(out[j])
            if cur_in != nxt_in:
                t = side[j] / (side[j] - side[k])
                new_pts.append(out[j] + t * (out[k] - out[j]))
        out = np.array(new_pts, dtype=np.float64) if new_pts else np.empty((0, 2))
    return out


def _is_convex(ring: np.ndarray) -> bool:
    ring = _as_ring(ring)
    if ring.shape[0] < 4:
        return True
    d = np.diff(np.vstack([ring, ring[:2]]), axis=0)
    cross = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    return bool(np.all(cross >= -1e-12) or np.all(cross <= 1e-12))


def intersection_area_grid(
    inner_outer: np.ndarray,
    inner_holes: list[np.ndarray],
    outer_outer: np.ndarray,
    outer_holes: list[np.ndarray],
    resolution: int = 128,
) -> float:
    """Deterministic grid-sampling approximation of intersection area.

    Samples a ``resolution x resolution`` grid over the inner polygon's
    envelope — deterministic (no RNG), accuracy ~ O(1/resolution) which
    comfortably resolves the reference's 0.8-out / 0.9-threshold /
    0.92-in truth table (GeoCalculatorSpec.scala:88-98).
    """
    lon0, lat0, lon1, lat1 = envelope(inner_outer)
    if lon1 <= lon0 or lat1 <= lat0:
        return 0.0
    gx = np.linspace(lon0, lon1, resolution, endpoint=False) + (lon1 - lon0) / resolution / 2
    gy = np.linspace(lat0, lat1, resolution, endpoint=False) + (lat1 - lat0) / resolution / 2
    mx, my = np.meshgrid(gx, gy)
    mx = mx.ravel()
    my = my.ravel()
    m_in = points_in_polygon(mx, my, inner_outer, inner_holes)
    m_out = points_in_polygon(mx, my, outer_outer, outer_holes)
    cell_area = (lon1 - lon0) * (lat1 - lat0) / (resolution * resolution)
    return float(np.count_nonzero(m_in & m_out)) * cell_area


def intersection_area(
    inner_outer: np.ndarray,
    outer_outer: np.ndarray,
    inner_holes: list[np.ndarray] | None = None,
    outer_holes: list[np.ndarray] | None = None,
) -> float:
    """Polygon∩polygon area; exact S-H clip when hole-free + convex clip."""
    inner_holes = inner_holes or []
    outer_holes = outer_holes or []
    if not inner_holes and not outer_holes and _is_convex(outer_outer):
        clipped = clip_ring_convex(inner_outer, outer_outer)
        return ring_area(clipped) if clipped.shape[0] >= 3 else 0.0
    return intersection_area_grid(inner_outer, inner_holes, outer_outer, outer_holes)


def fuzzy_within(
    inner_outer: np.ndarray,
    outer_outer: np.ndarray,
    inner_holes: list[np.ndarray] | None = None,
    outer_holes: list[np.ndarray] | None = None,
    threshold: float = 0.9,
) -> bool:
    """True iff intersection_area / inner_area >= threshold.

    Reference: GeoCalculator.fuzzyWithin (:131-149) with its 0.9 default
    used by the containment join (Queries.scala:320-341).
    """
    a_inner = polygon_area(inner_outer, inner_holes)
    if a_inner <= 0:
        return False
    a_int = intersection_area(inner_outer, outer_outer, inner_holes, outer_holes)
    return a_int / a_inner >= threshold


def _orient_grid(a0: np.ndarray, a1: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Cross product orientation of every point in ``p`` (m,2) against
    every directed segment (a0[i] -> a1[i]) (n,2): result (n, m)."""
    d = a1 - a0
    return d[:, None, 0] * (p[None, :, 1] - a0[:, None, 1]) - d[:, None, 1] * (p[None, :, 0] - a0[:, None, 0])


def _ring_segments(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ring = _as_ring(ring)
    return ring, np.roll(ring, -1, axis=0)


def rings_properly_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """True iff any edge of ring ``a`` PROPERLY crosses an edge of ring
    ``b`` (transversal interior crossing; shared vertices, touching and
    collinear overlap do NOT count — rectangles tiling a city share
    edges without crossing)."""
    a0, a1 = _ring_segments(a)
    b0, b1 = _ring_segments(b)
    d1 = _orient_grid(b0, b1, a0)  # (nb, na)
    d2 = _orient_grid(b0, b1, a1)
    d3 = _orient_grid(a0, a1, b0)  # (na, nb)
    d4 = _orient_grid(a0, a1, b1)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0).T))


def points_on_ring(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """True per point iff the point lies ON the ring boundary (collinear
    with a segment and inside its bbox)."""
    a0, a1 = _ring_segments(ring)
    p = np.column_stack([np.asarray(lon, np.float64), np.asarray(lat, np.float64)])
    cross = _orient_grid(a0, a1, p)  # (n_seg, n_pt)
    lo = np.minimum(a0, a1)
    hi = np.maximum(a0, a1)
    inbox = (
        (p[None, :, 0] >= lo[:, None, 0] - eps)
        & (p[None, :, 0] <= hi[:, None, 0] + eps)
        & (p[None, :, 1] >= lo[:, None, 1] - eps)
        & (p[None, :, 1] <= hi[:, None, 1] + eps)
    )
    return np.any((np.abs(cross) <= eps) & inbox, axis=0)


def polygon_within(
    inner_outer: np.ndarray,
    outer_outer: np.ndarray,
    inner_holes: list[np.ndarray] | None = None,
    outer_holes: list[np.ndarray] | None = None,
) -> bool:
    """EXACT polygon ⊇ polygon containment (closed semantics: boundary
    contact allowed).  Reference: GeoCalculator.within dispatch for
    GeometryCollection ⊇ GeometryCollection, which tests every inner
    polygon against the outer polygons before the fuzzy fallback
    (util/.../GeoCalculator.scala:111-129).

    Conditions: every inner vertex inside-or-on the outer ring; no edge
    of the inner ring properly crosses the outer ring (a proper crossing
    would take the inner boundary outside even with all vertices in —
    the case bbox/vertex-only containment gets wrong on concave
    outers); and the inner polygon avoids the outer's holes (no vertex
    strictly inside a hole, no proper crossing, hole not strictly inside
    the inner ring).
    """
    inner = _as_ring(inner_outer)
    v_in = points_in_ring(inner[:, 0], inner[:, 1], outer_outer)
    v_on = points_on_ring(inner[:, 0], inner[:, 1], outer_outer)
    if not np.all(v_in | v_on):
        return False
    if rings_properly_cross(inner, outer_outer):
        return False
    for hole in outer_holes or []:
        hole = _as_ring(hole)
        strictly_in_hole = points_in_ring(inner[:, 0], inner[:, 1], hole) & ~points_on_ring(
            inner[:, 0], inner[:, 1], hole
        )
        if np.any(strictly_in_hole):
            return False
        if rings_properly_cross(inner, hole):
            return False
        hole_in_inner = points_in_ring(hole[:, 0], hole[:, 1], inner) & ~points_on_ring(
            hole[:, 0], hole[:, 1], inner
        )
        if np.any(hole_in_inner):
            # the outer's hole punches into the inner ring's interior —
            # still within ONLY if one of the inner polygon's OWN holes
            # covers it (the punched-out area was never inner area)
            def covers(ih: np.ndarray) -> bool:
                ih = _as_ring(ih)
                inside = points_in_ring(hole[:, 0], hole[:, 1], ih) | points_on_ring(hole[:, 0], hole[:, 1], ih)
                return bool(np.all(inside)) and not rings_properly_cross(hole, ih)

            if not any(covers(ih) for ih in inner_holes or []):
                return False
    return True


def envelope(*rings: np.ndarray) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) over all vertices.

    Reference: GeoCalculator.rectangle* (:151-202).  The reference
    hardcodes a Duisburg fallback for degenerate input (:197-200); we
    instead raise — documented deviation.
    """
    pts = np.vstack([_as_ring(r) for r in rings])
    if pts.shape[0] == 0:
        raise ValueError("envelope of empty geometry")
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def assemble_rings(ways: list[np.ndarray]) -> list[np.ndarray]:
    """Chain unclosed way polylines into closed rings (OSM multipolygon).

    Each input is an (n,2) polyline; segments are joined end-to-end
    (either orientation) until rings close.  Raises if leftovers cannot
    be closed.  Reference: geow ``Denormalizer.denormalizeRelation``
    ring assembly used at RelationFlow.scala:31,56.
    """
    segs = [np.asarray(w, dtype=np.float64) for w in ways if len(w) >= 2]
    rings: list[np.ndarray] = []
    while segs:
        cur = segs.pop(0)
        # already closed?
        while not np.array_equal(cur[0], cur[-1]):
            for i, s in enumerate(segs):
                if np.array_equal(s[0], cur[-1]):
                    cur = np.vstack([cur, s[1:]])
                    segs.pop(i)
                    break
                if np.array_equal(s[-1], cur[-1]):
                    cur = np.vstack([cur, s[::-1][1:]])
                    segs.pop(i)
                    break
            else:
                raise ValueError("open ring: ways do not chain into a closed ring")
        rings.append(cur[:-1])  # store open form (closure implied)
    return rings


def simplify_polyline(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification; returns the SORTED kept
    indices (endpoints always kept).  Iterative stack (no recursion
    depth limit); per-segment perpendicular distances are vectorized.

    Rebuild extension for the tile-rendering path (the reference's tile
    layer implies geometry generalization per zoom); deterministic:
    ties split at the FIRST farthest vertex.
    """
    n = len(coords)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    x = coords[:, 0]
    y = coords[:, 1]
    while stack:
        s, e = stack.pop()
        if e - s < 2:
            continue
        dx = x[e] - x[s]
        dy = y[e] - y[s]
        px = x[s + 1 : e] - x[s]
        py = y[s + 1 : e] - y[s]
        norm = np.hypot(dx, dy)
        if norm == 0.0:
            # degenerate chord: distance to the (coincident) endpoints
            d = np.hypot(px, py)
        else:
            d = np.abs(px * dy - py * dx) / norm
        i = int(np.argmax(d))
        if d[i] > tol:
            split = s + 1 + i
            keep[split] = True
            stack.append((s, split))
            stack.append((split, e))
    return np.nonzero(keep)[0].astype(np.int64)


def convex_hull(pts: "np.ndarray") -> "np.ndarray":
    """Andrew monotone-chain convex hull of an (n, 2) float64 array.

    Returns hull vertices counter-clockwise starting at the
    lexicographically smallest (lon, lat) point; strictly convex
    (collinear interior points dropped).  Duplicates are removed
    first, so the result is canonical for any input order — turn
    tests are float64 cross products computed with one expression
    shape, deterministic across engines.  Hull-of-union equals
    hull-of-partial-hulls, which is what makes the map-side combiner
    in the per-area hull pipeline exact.
    """
    p = np.unique(np.asarray(pts, dtype=np.float64), axis=0)  # sorts lexicographically
    n = p.shape[0]
    if n <= 2:
        return p

    def cross(o, a, b) -> float:
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for i in range(n):
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p[i]) <= 0.0:
            lower.pop()
        lower.append(p[i])
    upper: list = []
    for i in range(n - 1, -1, -1):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p[i]) <= 0.0:
            upper.pop()
        upper.append(p[i])
    hull = lower[:-1] + upper[:-1]
    return np.asarray(hull, dtype=np.float64)


def weiszfeld_fixed(lon: "np.ndarray", lat: "np.ndarray", iters: int = 8) -> tuple[float, float]:
    """Geometric median (the L1 central feature) via a FIXED number of
    Weiszfeld iterations — fixed iteration count + fixed input order
    make the float sequence fully deterministic, so both engines run
    the identical kernel on the identically-sorted points (the
    pagerank/kmeans pinned-iteration discipline applied to a float
    algorithm).  Coincidence with a data point is regularized by the
    standard epsilon.

    Inputs MUST be sorted by the caller's canonical order.
    """
    import numpy as _np

    x = float(lon.mean())
    y = float(lat.mean())
    eps = 1e-12
    for _ in range(iters):
        d = _np.sqrt((lon - x) ** 2 + (lat - y) ** 2)
        w = 1.0 / _np.maximum(d, eps)
        sw = float(w.sum())
        x = float((lon * w).sum() / sw)
        y = float((lat * w).sum() / sw)
    return x, y
