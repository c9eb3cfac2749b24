"""Packed Sort-Tile-Recursive (STR) R-tree over boundary polygons.

The north-star architecture names a "broadcast STRtree/interval-index
held in actor pools"; :class:`~plasmap_ray.stages.geo.PolygonIndex` is
the interval/grid form, this module is the literal STRtree.  It is a
drop-in alternative for ``PiPJoinActor``'s ``index_ref`` — same
``.polygons`` list and ``.query(lon, lat) -> (point_idx, poly_idx)``
contract, identical join output by construction (candidate pruning
differs, the exact ``geometry.points_in_polygon`` test is shared).

Build (classic STR bulk load, Leutenegger et al. 1997):
  1. sort entry MBR centers by x, cut into ``ceil(sqrt(n/B))`` vertical
     slabs of equal entry count;
  2. within each slab sort by y and pack runs of ``B`` into nodes;
  3. repeat on the node MBRs until one root remains.

Query is vectorized over the whole probe batch: a frontier of
(node, point-subset) pairs descends level by level, intersecting the
point set against each child MBR with NumPy masks — no per-point
Python recursion.  The tree is built ONCE on the driver, shipped via
``ray.put``, and probed inside map_batches actors (ST2 pattern;
reference analogue: the prepared-geometry candidate fetch of
Queries.scala:304-315).
"""

from __future__ import annotations

import numpy as np

from .. import geometry

DEFAULT_NODE_CAPACITY = 16


def _pack_level(boxes: np.ndarray, capacity: int) -> list[np.ndarray]:
    """Group row indices of ``boxes`` (n x 4 lon0,lat0,lon1,lat1) into
    STR runs of <= capacity; returns the member-index array per node."""
    n = boxes.shape[0]
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    n_nodes = -(-n // capacity)  # ceil
    n_slabs = int(np.ceil(np.sqrt(n_nodes)))
    per_slab = n_slabs * capacity
    by_x = np.argsort(cx, kind="stable")
    nodes: list[np.ndarray] = []
    for s in range(0, n, per_slab):
        slab = by_x[s : s + per_slab]
        slab = slab[np.argsort(cy[slab], kind="stable")]
        for r in range(0, slab.size, capacity):
            nodes.append(slab[r : r + capacity])
    return nodes


class STRtreeIndex:
    """Packed R-tree of polygon envelopes for broadcast PiP joins.

    Same polygon-dict input and ``query`` contract as ``PolygonIndex``.
    Levels are stored flat: per level, ``child_boxes`` (m x 4 MBRs) and
    ``child_ptr`` (node -> slice of the level below, or of the polygon
    ids at the leaves).
    """

    def __init__(self, polygons: list[dict], node_capacity: int = DEFAULT_NODE_CAPACITY):
        if node_capacity < 2:
            raise ValueError("node_capacity must be >= 2")
        self.node_capacity = node_capacity
        self.polygons = []
        ent_boxes = []
        for p in polygons:
            outer = np.asarray(p["outer"], dtype=np.float64)
            holes = [np.asarray(h, dtype=np.float64) for h in p.get("holes") or []]
            lon0, lat0, lon1, lat1 = geometry.envelope(outer)
            self.polygons.append(
                dict(
                    rel_id=int(p["rel_id"]),
                    name=str(p.get("name", "")),
                    admin_level=int(p.get("admin_level", 0)),
                    outer=outer,
                    holes=holes,
                    bbox=(lon0, lat0, lon1, lat1),
                )
            )
            ent_boxes.append((lon0, lat0, lon1, lat1))
        n = len(self.polygons)
        # levels[0] = leaves.  Each level: (boxes m x 4, members list-of-index-arrays)
        # where leaf members index self.polygons and inner members index the level below.
        self.levels: list[tuple[np.ndarray, list[np.ndarray]]] = []
        if n == 0:
            return
        boxes = np.asarray(ent_boxes, dtype=np.float64)
        members = _pack_level(boxes, node_capacity)
        while True:
            node_boxes = np.empty((len(members), 4), dtype=np.float64)
            for i, m in enumerate(members):
                node_boxes[i, 0] = boxes[m, 0].min()
                node_boxes[i, 1] = boxes[m, 1].min()
                node_boxes[i, 2] = boxes[m, 2].max()
                node_boxes[i, 3] = boxes[m, 3].max()
            self.levels.append((node_boxes, members))
            if len(members) == 1:
                break
            boxes = node_boxes
            members = _pack_level(boxes, node_capacity)

    @property
    def height(self) -> int:
        return len(self.levels)

    def _candidates(self, lon: np.ndarray, lat: np.ndarray) -> dict[int, np.ndarray]:
        """poly_idx -> array of point indices whose probe point lies in
        the polygon's envelope (half-open, matching PolygonIndex)."""
        if not self.levels:
            return {}
        all_pts = np.arange(lon.shape[0], dtype=np.int64)
        # frontier: (level, node_index, point-subset)
        root_level = len(self.levels) - 1
        frontier = [(root_level, 0, all_pts)]
        out: dict[int, list[np.ndarray]] = {}
        while frontier:
            level, node, pts = frontier.pop()
            boxes, members = self.levels[level]
            b = boxes[node]
            m = (lon[pts] >= b[0]) & (lon[pts] < b[2]) & (lat[pts] >= b[1]) & (lat[pts] < b[3])
            pts = pts[m]
            if pts.size == 0:
                continue
            if level == 0:
                # leaf: test each polygon envelope exactly (the node MBR
                # is looser than the member envelopes)
                for poly_idx in members[node]:
                    lon0, lat0, lon1, lat1 = self.polygons[int(poly_idx)]["bbox"]
                    mm = (lon[pts] >= lon0) & (lon[pts] < lon1) & (lat[pts] >= lat0) & (lat[pts] < lat1)
                    hit = pts[mm]
                    if hit.size:
                        out.setdefault(int(poly_idx), []).append(hit)
            else:
                for child in members[node]:
                    frontier.append((level - 1, int(child), pts))
        return {k: np.concatenate(v) for k, v in out.items()}

    def query(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate-pruned exact PiP: (point_idx, polygon_idx) pairs."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out_pts: list[np.ndarray] = []
        out_polys: list[np.ndarray] = []
        for poly_idx, pts in self._candidates(lon, lat).items():
            p = self.polygons[poly_idx]
            inside = geometry.points_in_polygon(lon[pts], lat[pts], p["outer"], p["holes"])
            pts = pts[inside]
            if pts.size:
                out_pts.append(pts)
                out_polys.append(np.full(pts.size, poly_idx, dtype=np.int64))
        if not out_pts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pts), np.concatenate(out_polys)
