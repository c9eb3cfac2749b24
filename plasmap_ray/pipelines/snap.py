"""Map-matching: snap points to the nearest way segment (J7 sibling).

The reference's nearest-object query family ranks point POIs
(Queries.scala:211-262); a geo training-data engine also needs the
*segment* form — "which road/boundary way is this GPS point on?" —
the primitive under map-matching, address interpolation and snap-to-
road cleanup of noisy image geotags.

Design (Ray-Data-first, same shape as stages.geo.KnnJoinActor):

- The way-segment table is the SMALL side: packed numpy arrays are
  ``ray.put`` once and every actor builds its per-cell candidate grid
  in ``__init__`` (ST4 cold-start pattern) — never re-shipped per
  batch.
- Candidate index: each segment is densified into points spaced at
  most one grid-cell min-dimension apart; per cover cell, an
  expanding-ring search over the densified buckets yields d1 = the
  distance from the cell center to the nearest densified point, and
  every segment owning a densified point within ``d1 + 2*diag + s/2``
  of the center is kept.  For any query point q in the cell the true
  nearest segment j* satisfies dist(q, seg_j*) <= d1 + diag (walk to
  the nearest densified point), and any segment that close to q has a
  densified point within ``+ diag + s/2`` of the center — so the cell
  candidate list provably contains q's argmin.  Memory stays
  O(segments + cells), the same bound as the kNN grid
  (stages/geo.py:300).
- The FINAL distance is always computed on the ORIGINAL segment
  endpoints with the exact float64 expression mirrored by the SQL
  oracle (projection parameter clamped to [0, 1]); the grid only
  prunes candidates, so grid and brute paths are bit-identical.
- Ties broken by (dist2, way_id, seg_idx): segments are pre-sorted by
  (way_id, seg_idx) and ``argmin`` takes the first minimum.

At 100 TB the segment side (a road network) can exceed broadcast
size; the shuffle alternative is the pip_join_shuffle pattern
(pipelines/spatial.py:487): key both sides by covering cell (segments
replicated to cells within their snap radius) and run this same
kernel per cell group.  The broadcast path here is the common case
(continent road graph ~10^8 segments x 40 B fits a worker heap).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .. import cells, fixtures

SNAP_CONCURRENCY = (1, 8)
SNAP_BATCH = 65536


def way_segments() -> pa.Table:
    """Segment table (way_id, seg_idx, x1, y1, x2, y2) of the fixture
    world's ways, straight from the construction tables (node coord
    lookup + consecutive nd pairs) — the same rows the SQL oracle
    inlines as VALUES (oracle.sql_way_segments_values)."""
    world = fixtures.boundary_world()
    nodes = {r["node_id"]: (r["lon"], r["lat"]) for r in world["nodes"].to_pylist()}
    wid, sid, x1, y1, x2, y2 = [], [], [], [], [], []
    for r in world["ways"].to_pylist():
        pts = [nodes[n] for n in r["nds"] if n in nodes]
        for i, (a, b) in enumerate(zip(pts[:-1], pts[1:])):
            if a == b:
                continue  # zero-length: no projection defined
            wid.append(r["way_id"])
            sid.append(i)
            x1.append(a[0])
            y1.append(a[1])
            x2.append(b[0])
            y2.append(b[1])
    t = pa.table(
        {
            "way_id": pa.array(wid, type=pa.int64()),
            "seg_idx": pa.array(sid, type=pa.int64()),
            "x1": pa.array(x1, type=pa.float64()),
            "y1": pa.array(y1, type=pa.float64()),
            "x2": pa.array(x2, type=pa.float64()),
            "y2": pa.array(y2, type=pa.float64()),
        }
    )
    return t.sort_by([("way_id", "ascending"), ("seg_idx", "ascending")])


@functools.lru_cache(maxsize=1)
def segments_ref() -> "ray.ObjectRef":
    """ray.put the packed segment arrays ONCE per driver session."""
    t = way_segments()
    return ray.put({c: t[c].to_numpy() for c in t.column_names})


def snap_kernel(
    px: np.ndarray, py: np.ndarray, seg: dict, cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact float64 snap of points (px, py) against segment indices
    ``cand`` (ascending, hence tie-ordered by (way_id, seg_idx)).

    Every operation mirrors the SQL oracle's expression tree term for
    term — (sub, mul, add, div, clamp) are correctly-rounded IEEE-754
    ops, so dist2 / snap coords are bit-identical across engines.
    Returns (best_index_into_cand, dist2, snap_lon, snap_lat).
    """
    x1 = seg["x1"][cand][None, :]
    y1 = seg["y1"][cand][None, :]
    dx = seg["dx"][cand][None, :]
    dy = seg["dy"][cand][None, :]
    len2 = seg["len2"][cand][None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    t = np.minimum(np.maximum(((pxc - x1) * dx + (pyc - y1) * dy) / len2, 0.0), 1.0)
    qx = x1 + t * dx
    qy = y1 + t * dy
    d2 = (pxc - qx) * (pxc - qx) + (pyc - qy) * (pyc - qy)
    best = np.argmin(d2, axis=1)  # first min = lowest (way_id, seg_idx)
    rows = np.arange(len(px))
    return best, d2[rows, best], qx[rows, best], qy[rows, best]


class SegmentSnapActor:
    """Actor-pool stage: nearest-way-segment join against a broadcast
    segment set (grid-pruned candidates, exact oracle-mirrored rank)."""

    def __init__(self, segs_ref=None, precision: int | None = None):
        segs = ray.get(segs_ref) if segs_ref is not None and not isinstance(segs_ref, dict) else segs_ref
        if segs is None:
            t = way_segments()
            segs = {c: t[c].to_numpy() for c in t.column_names}
        x1, y1, x2, y2 = segs["x1"], segs["y1"], segs["x2"], segs["y2"]
        dx = x2 - x1
        dy = y2 - y1
        self.seg = {
            "way_id": segs["way_id"].astype(np.int64),
            "seg_idx": segs["seg_idx"].astype(np.int64),
            "x1": x1,
            "y1": y1,
            "dx": dx,
            "dy": dy,
            "len2": dx * dx + dy * dy,
        }
        self.m = len(x1)
        self._grid = None
        if self.m >= 8:
            self._build_grid(precision)

    def _build_grid(self, precision: int | None) -> None:
        x1, y1 = self.seg["x1"], self.seg["y1"]
        x2 = x1 + self.seg["dx"]
        y2 = y1 + self.seg["dy"]
        lon0 = float(min(x1.min(), x2.min()))
        lon1 = float(max(x1.max(), x2.max()))
        lat0 = float(min(y1.min(), y2.min()))
        lat1 = float(max(y1.max(), y2.max()))
        if precision is None:
            for precision in range(4, cells.MAX_PRECISION):
                n_cells = max(1, int((lon1 - lon0) / 360.0 * (1 << precision))) * max(
                    1, int((lat1 - lat0) / 180.0 * (1 << precision))
                )
                if n_cells >= self.m:
                    break
        p = self._grid_p = precision
        sx = 360.0 / (1 << p)
        sy = 180.0 / (1 << p)
        diag = float(np.hypot(sx, sy))
        step = min(sx, sy)

        # densify: points spaced <= step along each segment, tagged with
        # their parent segment index
        seg_len = np.sqrt(self.seg["len2"])
        n_sub = np.maximum(np.ceil(seg_len / step).astype(np.int64), 1)
        parent = np.repeat(np.arange(self.m), n_sub + 1)
        frac_idx = np.concatenate([np.arange(k + 1) for k in n_sub])
        frac = frac_idx / np.repeat(n_sub, n_sub + 1)
        dlon = x1[parent] + frac * self.seg["dx"][parent]
        dlat = y1[parent] + frac * self.seg["dy"][parent]

        bx, by = cells.lonlat_to_xy(dlon, dlat, p)
        key = (bx << np.int64(32)) | by
        order = np.argsort(key, kind="stable")
        sk = key[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(sk))[0] + 1])
        ends = np.concatenate([starts[1:], [len(sk)]])
        buckets = {int(sk[s]): order[s:e] for s, e in zip(starts, ends)}

        def gather_rings(cx: int, cy: int, r_max: int) -> np.ndarray:
            found = []
            for r in range(r_max + 1):
                if r == 0:
                    keys = [(cx, cy)]
                else:
                    xs = range(cx - r, cx + r + 1)
                    keys = [(x, cy - r) for x in xs] + [(x, cy + r) for x in xs]
                    keys += [(cx - r, y) for y in range(cy - r + 1, cy + r)]
                    keys += [(cx + r, y) for y in range(cy - r + 1, cy + r)]
                for x, y in keys:
                    b = buckets.get((int(x) << 32) | int(y))
                    if b is not None:
                        found.append(b)
            return np.concatenate(found) if found else np.empty(0, np.int64)

        cover = cells.cover_bbox(lon0, lat0, lon1, lat1, p)
        ccx, ccy = cells.deinterleave(cover)
        clon, clat = cells.decode_center(cover, p)
        min_s = step
        self._grid = {}
        for i, c in enumerate(cover):
            cx, cy = int(ccx[i]), int(ccy[i])
            r = 0
            got = gather_rings(cx, cy, r)
            while len(got) == 0:
                r += 1
                got = gather_rings(cx, cy, r)
            dd = np.hypot(dlon[got] - clon[i], dlat[got] - clat[i])
            d1 = float(dd.min())
            lim = d1 + 2.0 * diag + step / 2.0
            r_need = int(np.ceil(lim / min_s)) + 1
            if r_need > r:
                got = gather_rings(cx, cy, r_need)
                dd = np.hypot(dlon[got] - clon[i], dlat[got] - clat[i])
            keep = got[dd <= lim]
            cand = np.unique(parent[keep])  # ascending == (way_id, seg_idx) order
            self._grid[int(c)] = cand.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        n = len(lon)
        out_way = np.empty(n, np.int64)
        out_seg = np.empty(n, np.int64)
        out_d2 = np.empty(n, np.float64)
        out_qx = np.empty(n, np.float64)
        out_qy = np.empty(n, np.float64)

        def run(idx: np.ndarray, cand: np.ndarray) -> None:
            best, d2, qx, qy = snap_kernel(lon[idx], lat[idx], self.seg, cand)
            sel = cand[best]
            out_way[idx] = self.seg["way_id"][sel]
            out_seg[idx] = self.seg["seg_idx"][sel]
            out_d2[idx] = d2
            out_qx[idx] = qx
            out_qy[idx] = qy

        all_segs = np.arange(self.m)
        if self._grid is None:
            run(np.arange(n), all_segs)
        else:
            cell = cells.encode(lon, lat, self._grid_p)
            order = np.argsort(cell, kind="stable")
            sc = cell[order]
            uniq, starts = np.unique(sc, return_index=True)
            bounds = np.append(starts, n)
            miss: list[np.ndarray] = []
            for i in range(len(uniq)):
                idx = order[starts[i] : bounds[i + 1]]
                cand = self._grid.get(int(uniq[i]))
                if cand is None or len(cand) == 0:
                    miss.append(idx)
                else:
                    run(idx, cand)
            if miss:
                run(np.concatenate(miss), all_segs)

        keep_id = batch.column_names[0]
        return pa.table(
            {
                keep_id: batch[keep_id],
                "way_id": pa.array(out_way, type=pa.int64()),
                "seg_idx": pa.array(out_seg, type=pa.int64()),
                "snap_lon": pa.array(out_qx, type=pa.float64()),
                "snap_lat": pa.array(out_qy, type=pa.float64()),
                "dist2": pa.array(out_d2, type=pa.float64()),
            }
        )


def snap_to_ways(sf_dir: str) -> rd.Dataset:
    """queries() surface: every document point snapped to its nearest
    fixture-world way segment — (doc_id, way_id, seg_idx, snap_lon,
    snap_lat, dist2), dist2/coords bit-exact vs the SQL mirror."""
    ref = segments_ref()
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def pts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
            }
        )

    return ds.map_batches(pts, batch_format="pyarrow").map_batches(
        SegmentSnapActor,
        fn_constructor_kwargs={"segs_ref": ref},
        batch_format="pyarrow",
        batch_size=SNAP_BATCH,
        concurrency=SNAP_CONCURRENCY,
    )


CORRIDOR_WAYS = (3, 7, 12)  # the fixture "route": three ways' polylines
CORRIDOR_R = 0.06  # corridor half-width in degrees


def route_corridor(sf_dir: str, way_ids: tuple[int, ...] = CORRIDOR_WAYS, radius: float = CORRIDOR_R) -> rd.Dataset:
    """Corridor semi-join: keep every point within ``radius`` of ANY
    segment of a chosen route (a set of way polylines) and report its
    closest route segment — the 'what's along this road?' query behind
    corridor POI search and route-adjacent training-data selection
    (snap_to_ways' nearest-1 sibling with a radius gate and a
    restricted small side).

    The route side is tiny by construction (a route is one path), so
    it broadcasts as a constant into a map-only pass — each batch does
    one vectorized points x route-segments distance block, keeps rows
    with min dist2 < radius², and never shuffles.  Exactness: the
    clamped-projection dist2 uses the same float64 expression as the
    SQL mirror; ties break (dist2, way_id, seg_idx).

    Output: (doc_id, way_id, seg_idx, dist2).
    """
    segs = way_segments()
    keep = np.isin(segs["way_id"].to_numpy(), np.asarray(way_ids, dtype=np.int64))
    segs = segs.filter(pa.array(keep))
    x1 = segs["x1"].to_numpy()
    y1 = segs["y1"].to_numpy()
    dx = segs["x2"].to_numpy() - x1
    dy = segs["y2"].to_numpy() - y1
    wid = segs["way_id"].to_numpy().astype(np.int64)
    sid = segs["seg_idx"].to_numpy().astype(np.int64)
    r2 = radius * radius

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def corridor(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        px = fixtures.derive_lon(ids)[:, None]
        py = fixtures.derive_lat(ids)[:, None]
        tt = ((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy)
        tt = np.minimum(np.maximum(tt, 0.0), 1.0)
        qx = x1 + tt * dx
        qy = y1 + tt * dy
        d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        j = np.argmin(d2, axis=1)  # first minimum: segs pre-sorted (way_id, seg_idx)
        best = d2[np.arange(len(ids)), j]
        m = best < r2
        return pa.table(
            {
                "doc_id": pa.array(ids[m], type=pa.int64()),
                "way_id": pa.array(wid[j[m]], type=pa.int64()),
                "seg_idx": pa.array(sid[j[m]], type=pa.int64()),
                "dist2": pa.array(best[m], type=pa.float64()),
            }
        )

    return ds.map_batches(corridor, batch_format="pyarrow")


HMM_K = 3  # candidate segments per fix
HMM_EMIT_FP = 10**12  # fixed-point scale for squared-degree emission cost
HMM_TRANS_SEG = 10**10  # penalty: consecutive fixes on different segments
HMM_TRANS_WAY = 2 * 10**10  # extra when the WAY changes too


def _hmm_candidates(px: np.ndarray, py: np.ndarray, segs: dict, k: int):
    """Per point: top-k candidate segments by clamped-projection dist2
    with deterministic (dist2, table-order) ties.  Returns (idx, cost)
    arrays of shape (n, k) — cost is int64 fixed-point."""
    x1, y1, dx, dy = segs["x1"], segs["y1"], segs["dx"], segs["dy"]
    tt = ((px[:, None] - x1) * dx + (py[:, None] - y1) * dy) / (dx * dx + dy * dy)
    tt = np.minimum(np.maximum(tt, 0.0), 1.0)
    qx = x1 + tt * dx
    qy = y1 + tt * dy
    d2 = (px[:, None] - qx) ** 2 + (py[:, None] - qy) ** 2
    order = np.argsort(d2, axis=1, kind="stable")[:, :k]
    rows = np.arange(len(px))[:, None]
    cost = np.floor(d2[rows, order] * HMM_EMIT_FP + 0.5).astype(np.int64)
    return order, cost


def _viterbi_path(idx: np.ndarray, emit: np.ndarray, way: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """Integer Viterbi over one user's (T, K) candidate lattice; ties
    break toward the LOWER candidate slot.  Returns the chosen
    candidate slot per fix."""
    T, K = idx.shape
    cost = emit[0].copy()
    back = np.zeros((T, K), dtype=np.int64)
    for t in range(1, T):
        pw, ps = way[idx[t - 1]], seg[idx[t - 1]]
        cw, cs = way[idx[t]], seg[idx[t]]
        trans = np.where(
            pw[:, None] != cw[None, :],
            HMM_TRANS_WAY + HMM_TRANS_SEG,
            np.where(ps[:, None] != cs[None, :], HMM_TRANS_SEG, 0),
        ).astype(np.int64)
        tot = cost[:, None] + trans  # (K_prev, K_cur)
        back[t] = np.argmin(tot, axis=0)  # first minimum = lower slot
        cost = tot[back[t], np.arange(K)] + emit[t]
    slot = np.zeros(T, dtype=np.int64)
    slot[-1] = int(np.argmin(cost))
    for t in range(T - 1, 0, -1):
        slot[t - 1] = back[t, slot[t]]
    return slot


def hmm_map_match(sf_dir: str, k: int = HMM_K, parts: int = 32) -> rd.Dataset:
    """HMM map-matching (Viterbi): assign every trajectory fix to a way
    segment so the PATH is consistent — emission = clamped-projection
    distance², transition = integer penalties for hopping segments/ways
    — the sequence-aware upgrade of snap_to_ways that real GPS cleanup
    needs (a noisy fix near an intersection snaps to the way its
    neighbors are on, not the pointwise-nearest one).

    Exactness: emission costs are fixed-point int64 and transition
    penalties integers, so DP sums compare bit-identically anywhere;
    ties break toward the lower candidate slot (candidates are ordered
    by (dist2, segment table order)).  The golden oracle recomputes
    every user's path locally.

    Scale shape: the segment table broadcasts (ray.put once, grid
    discipline of SegmentSnapActor); fixes take ONE user-keyed
    coarse-partition exchange; each slice runs the O(T·K²) integer DP
    per user.  Output: (event_id, user_id, way_id, seg_idx).
    """
    segs_t = way_segments()
    segs = {
        "x1": segs_t["x1"].to_numpy(),
        "y1": segs_t["y1"].to_numpy(),
        "dx": segs_t["x2"].to_numpy() - segs_t["x1"].to_numpy(),
        "dy": segs_t["y2"].to_numpy() - segs_t["y1"].to_numpy(),
        "way": segs_t["way_id"].to_numpy().astype(np.int64),
        "seg": segs_t["seg_idx"].to_numpy().astype(np.int64),
    }
    ref = ray.put(segs)

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"].to_numpy(), np.int64)
        return t.append_column("part", pa.array(uid % parts, type=pa.int64()))

    def match(g: pa.Table) -> pa.Table:
        s = ray.get(ref)
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "way_id": pa.array([], type=pa.int64()),
                    "seg_idx": pa.array([], type=pa.int64()),
                }
            )
        ids = g["event_id"].to_numpy()
        px, py = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        idx, emit = _hmm_candidates(px, py, s, k)
        chosen = np.zeros(n, dtype=np.int64)
        starts = np.concatenate([[0], np.nonzero(np.diff(uid))[0] + 1, [n]])
        for a, b in zip(starts[:-1], starts[1:]):
            slot = _viterbi_path(idx[a:b], emit[a:b], s["way"], s["seg"])
            chosen[a:b] = idx[a:b][np.arange(b - a), slot]
        return pa.table(
            {
                "event_id": pa.array(ids, type=pa.int64()),
                "user_id": pa.array(uid, type=pa.int64()),
                "way_id": pa.array(s["way"][chosen], type=pa.int64()),
                "seg_idx": pa.array(s["seg"][chosen], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(match, batch_format="pyarrow")
        .sort(["user_id", "event_id"])
    )
