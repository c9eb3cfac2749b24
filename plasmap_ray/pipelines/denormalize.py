"""Denormalization DAG: normalized OSM-style tables -> assembled polygons.

Distributed rebuild of the reference's preprocessing joins (SURVEY §3.2):

- J1 way assembly (WayFlow.denormalizeWayFlow, processing/WayFlow.scala:27-49):
  the reference looks up each way's node ids against the Mongo mapping
  service with mapAsync(4); here the lookup table is just a Dataset and
  the lookups become ONE hash-shuffle join:
      explode ways -> (way_id, node_id, pos)
      ⋈ nodes on node_id                       (inner: misses drop, :38)
      regroup -> coords back in nds order (pos column carries the
      ordering through the shuffle — Ray does not preserve row order).
  The regroup is NOT per-way map_groups (one task per parent drowns in
  dispatch at 10^8 ways): rows shuffle on a coarse ``part = way_id % P``
  key, and each task sorts its slice by (way_id, pos) and run-scans,
  emitting ONE Arrow batch per partition.

- J2 relation assembly (RelationFlow.denormalizeRelationFlow, :29-76):
  members are PARTITIONED BY TYPE exactly as the reference partitions
  into node/way/relation geometry maps (RelationFlow.scala:43-49):
    * way members    ⋈ way geometries -> ring assembly (outer/inner roles
      -> holes; unclosed member ways chained into closed rings, geow
      Denormalizer semantics);
    * node members   ⋈ nodes          -> single-point geometries carrying
      the member role (e.g. 'admin_centre');
    * relation members recurse ONE level: the sub-relation's own way
      members are resolved and its rings emitted under the parent.

Output: one row per assembled ring / point
  (rel_id, ring_idx, role, lons, lats)
verified in tests against the fixture world's construction-time golden
boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import geometry
from ..stages.common import safe_join

WAY_REGROUP_PARTS = 64  # way_id % P shuffle key for the batched regroup
REL_REGROUP_PARTS = 16


def _within_list_ordinals(lengths: np.ndarray) -> np.ndarray:
    """Vectorized 0..len-1 ordinals per list (replaces a per-list
    np.arange loop — 10^8 parents would mean 10^8 Python iterations)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
    return np.arange(total, dtype=np.int64) - starts


def explode_way_nds(batch: pa.Table) -> pa.Table:
    """ways(way_id, nds) -> (way_id, node_id, pos) — the join fan-out."""
    col = batch["nds"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pa.compute.list_value_length(col).to_numpy().astype(np.int64)
    way_ids = np.repeat(batch["way_id"].to_numpy(), lengths)
    node_ids = col.flatten().to_numpy()
    pos = _within_list_ordinals(lengths)
    return pa.table(
        {
            "way_id": pa.array(way_ids, type=pa.int64()),
            "node_id": pa.array(node_ids, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def assemble_ways(
    nodes: rd.Dataset, ways: rd.Dataset, num_partitions: int = 8, parts: int = WAY_REGROUP_PARTS
) -> rd.Dataset:
    """J1: way geometries via explode -> hash join -> batched regroup.

    Inner-join drop semantics: a way's missing node ids are dropped
    (reference filter(_.isDefined)); a way whose every node is missing
    disappears entirely.

    Geometry is packed as binary (float64 lon,lat pairs): Arrow's hash
    join supports neither list nor tensor payload columns, binary passes
    through — the engine's WKB-like transport form.
    """
    flat = ways.map_batches(explode_way_nds, batch_format="pyarrow")
    joined = safe_join(flat, nodes, join_type="inner", num_partitions=num_partitions, on=("node_id",))

    def add_part(t: pa.Table) -> pa.Table:
        wid = t["way_id"].to_numpy()
        return t.append_column("part", pa.array((np.asarray(wid, np.int64) % parts), type=pa.int64()))

    def regroup(g: pa.Table) -> pa.Table:
        # one task per coarse partition: sort by (way_id, pos), run-scan
        # the way boundaries, emit ONE batch with one row per way —
        # per-parent dispatch cost amortizes over the whole partition
        g = g.sort_by([("way_id", "ascending"), ("pos", "ascending")])
        wid = g["way_id"].to_numpy()
        if len(wid) == 0:
            return pa.table({"way_id": pa.array([], type=pa.int64()), "geom": pa.array([], type=pa.binary())})
        coords = np.column_stack([g["lon"].to_numpy(), g["lat"].to_numpy()]).astype(np.float64)
        buf = coords.tobytes()
        bounds = np.nonzero(np.diff(wid))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(wid)]])
        geoms = [buf[s * 16 : e * 16] for s, e in zip(starts, ends)]
        return pa.table(
            {
                "way_id": pa.array(wid[starts], type=pa.int64()),
                "geom": pa.array(geoms, type=pa.binary()),
            }
        )

    return joined.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        regroup, batch_format="pyarrow"
    )


def unpack_geom(geom: bytes) -> np.ndarray:
    """binary (float64 lon,lat pairs) -> (n, 2) coordinate array."""
    return np.frombuffer(geom, dtype=np.float64).reshape(-1, 2)


def explode_members(batch: pa.Table) -> pa.Table:
    """relations(rel_id, members) -> (rel_id, ref, member_type, role, mpos)."""
    col = batch["members"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pa.compute.list_value_length(col).to_numpy().astype(np.int64)
    rel_ids = np.repeat(batch["rel_id"].to_numpy(), lengths)
    flat = col.flatten()
    refs = flat.field("ref").to_numpy()
    roles = flat.field("type").to_pylist(), flat.field("role").to_pylist()
    mpos = _within_list_ordinals(lengths)
    return pa.table(
        {
            "rel_id": pa.array(rel_ids, type=pa.int64()),
            "way_id": pa.array(refs, type=pa.int64()),
            "member_type": pa.array(roles[0], type=pa.string()),
            "role": pa.array(roles[1], type=pa.string()),
            "mpos": pa.array(mpos, type=pa.int64()),
        }
    )


# Unified geometry-request/geometry-row schema for the cogroup join.
# gkey packs the id space: way_id*2 for way geometries, node_id*2+1 for
# node points (way and node ids may collide numerically).
_REQ_SCHEMA = pa.schema(
    [
        ("gkey", pa.int64()),
        ("side", pa.int64()),  # 0 = geometry request (member ref), 1 = geometry row
        ("rel_id", pa.int64()),
        ("kind", pa.int64()),
        ("mpos", pa.int64()),
        ("sub_mpos", pa.int64()),
        ("role", pa.string()),
        ("sub_role", pa.string()),
        ("geom", pa.binary()),
    ]
)


def _req_rows(gkey, rel_id, kind, mpos, sub_mpos, role, sub_role) -> pa.Table:
    n = len(gkey)
    return pa.table(
        {
            "gkey": pa.array(np.asarray(gkey, np.int64)),
            "side": pa.array(np.zeros(n, dtype=np.int64)),
            "rel_id": pa.array(np.asarray(rel_id, np.int64)),
            "kind": pa.array(np.full(n, kind, dtype=np.int64)),
            "mpos": pa.array(np.asarray(mpos, np.int64)),
            "sub_mpos": pa.array(np.asarray(sub_mpos, np.int64)),
            "role": pa.array(list(role), type=pa.string()),
            "sub_role": pa.array(list(sub_role), type=pa.string()),
            "geom": pa.array([None] * n, type=pa.binary()),
        },
        schema=_REQ_SCHEMA,
    )


def _geom_rows(gkey, geom: pa.Array) -> pa.Table:
    n = len(gkey)
    z = np.zeros(n, dtype=np.int64)
    return pa.table(
        {
            "gkey": pa.array(np.asarray(gkey, np.int64)),
            "side": pa.array(np.ones(n, dtype=np.int64)),
            "rel_id": pa.array(z),
            "kind": pa.array(np.full(n, -1, dtype=np.int64)),
            "mpos": pa.array(z),
            "sub_mpos": pa.array(z),
            "role": pa.array([""] * n, type=pa.string()),
            "sub_role": pa.array([""] * n, type=pa.string()),
            "geom": geom,
        },
        schema=_REQ_SCHEMA,
    )


def assemble_relations(
    relations: rd.Dataset,
    way_geoms: rd.Dataset,
    nodes: rd.Dataset | None = None,
    rel_attrs: rd.Dataset | None = None,
    num_partitions: int = 4,
    parts: int = REL_REGROUP_PARTS,
) -> rd.Dataset:
    """J2: relation polygons via typed member joins + per-group assembly.

    Members partition by type (RelationFlow.scala:43-49): way members
    assemble into rings; node members (if a ``nodes`` table is given)
    become single-point rows keeping their member role; relation members
    recurse one level (the sub-relation's way members resolve against
    ``way_geoms`` and its rings land under the PARENT rel_id).

    The geometry lookup is a sort-shuffle COGROUP join (tag both sides,
    union, shard on the key, match within each shard) rather than
    ``Dataset.join``: Ray 2.49's hash-join operator intermittently
    cross-wires HashShuffleAggregator inputs when several hash joins
    execute in one session/plan (reproduced as ArrowInvalid "no match or
    multiple matches for key field" with blocks from the wrong branch);
    the sort-based groupby machinery underneath map_groups is the
    engine's proven shuffle primitive.  Shuffle volume is the same as
    the hash join's (both sides move once, keyed by gkey).

    Output rows: (rel_id, ring_idx, role, lons, lats).  ring_idx orders
    deterministically: direct rings (outer then inner), node points (in
    member order), then each sub-relation's rings in member order.
    """
    members = relations.map_batches(explode_members, batch_format="pyarrow").materialize()

    # which member types exist, in ONE pass (branch pruning for the
    # optional node / sub-relation sides)
    from ray.data.aggregate import Count as _Count

    present = {
        r["member_type"]
        for r in members.groupby("member_type").aggregate(_Count(alias_name="n")).take_all()  # bounded: <= 3 member_type groups
    }

    # --- geometry requests -------------------------------------------------
    def direct_way_refs(t: pa.Table) -> pa.Table:
        m = t.filter(pa.compute.equal(t["member_type"], "way"))
        wid = m["way_id"].to_numpy()
        return _req_rows(wid * 2, m["rel_id"].to_numpy(), 0, m["mpos"].to_numpy(),
                         np.zeros(len(wid), np.int64), m["role"].to_pylist(), m["role"].to_pylist())

    refs = [members.map_batches(direct_way_refs, batch_format="pyarrow")]

    if nodes is not None and "node" in present:

        def node_refs(t: pa.Table) -> pa.Table:
            m = t.filter(pa.compute.equal(t["member_type"], "node"))
            nid = m["way_id"].to_numpy()  # ref column
            return _req_rows(nid * 2 + 1, m["rel_id"].to_numpy(), 1, m["mpos"].to_numpy(),
                             np.zeros(len(nid), np.int64), m["role"].to_pylist(), m["role"].to_pylist())

        refs.append(members.map_batches(node_refs, batch_format="pyarrow"))

    if "relation" in present:
        # one-level recursion, cogroup on the sub-relation id: parent
        # links x the sub-relation's own way members -> virtual way refs
        def tag_links(t: pa.Table) -> pa.Table:
            m = t.filter(pa.compute.equal(t["member_type"], "relation"))
            return pa.table(
                {
                    "k": m["way_id"],  # ref = sub-relation id
                    "side": pa.array(np.zeros(m.num_rows, dtype=np.int64)),
                    "rel_id": m["rel_id"],
                    "role": m["role"],
                    "mpos": m["mpos"],
                    "way_id": pa.array(np.zeros(m.num_rows, dtype=np.int64)),
                    "sub_role": pa.array([""] * m.num_rows, type=pa.string()),
                    "sub_mpos": pa.array(np.zeros(m.num_rows, dtype=np.int64)),
                }
            )

        def tag_sub_ways(t: pa.Table) -> pa.Table:
            m = t.filter(pa.compute.equal(t["member_type"], "way"))
            return pa.table(
                {
                    "k": m["rel_id"],
                    "side": pa.array(np.ones(m.num_rows, dtype=np.int64)),
                    "rel_id": pa.array(np.zeros(m.num_rows, dtype=np.int64)),
                    "role": pa.array([""] * m.num_rows, type=pa.string()),
                    "mpos": pa.array(np.zeros(m.num_rows, dtype=np.int64)),
                    "way_id": m["way_id"],
                    "sub_role": m["role"],
                    "sub_mpos": m["mpos"],
                }
            )

        tagged = members.map_batches(tag_links, batch_format="pyarrow").union(
            members.map_batches(tag_sub_ways, batch_format="pyarrow")
        )

        def shard_k(t: pa.Table) -> pa.Table:
            k = t["k"].to_numpy()
            return t.append_column("shard", pa.array(np.asarray(k, np.int64) % parts, type=pa.int64()))

        def resolve_links(g: pd.DataFrame) -> pa.Table:
            L = g[g["side"] == 0][["k", "rel_id", "role", "mpos"]]
            R = g[g["side"] == 1][["k", "way_id", "sub_role", "sub_mpos"]]
            m = L.merge(R, on="k")  # cross product per sub-relation id
            # return an Arrow table so the all-null geom column keeps its
            # declared binary type (pandas inference would emit null type
            # and break the union)
            return _req_rows(
                m["way_id"].to_numpy() * 2,
                m["rel_id"].to_numpy(),
                2,
                m["mpos"].to_numpy(),
                m["sub_mpos"].to_numpy(),
                list(m["role"]),
                list(m["sub_role"]),
            )

        sub_refs = (
            tagged.map_batches(shard_k, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(resolve_links, batch_format="pandas")
        )
        refs.append(sub_refs)

    # --- geometry rows -----------------------------------------------------
    def way_geom_rows(t: pa.Table) -> pa.Table:
        return _geom_rows(t["way_id"].to_numpy() * 2, t["geom"].combine_chunks() if isinstance(t["geom"], pa.ChunkedArray) else t["geom"])

    geoms = [way_geoms.map_batches(way_geom_rows, batch_format="pyarrow")]
    if nodes is not None:

        def node_geom_rows(t: pa.Table) -> pa.Table:
            pts = np.column_stack([t["lon"].to_numpy(), t["lat"].to_numpy()]).astype(np.float64)
            buf = pts.tobytes()
            geom = pa.array([buf[i * 16 : (i + 1) * 16] for i in range(len(pts))], type=pa.binary())
            return _geom_rows(t["node_id"].to_numpy() * 2 + 1, geom)

        geoms.append(nodes.map_batches(node_geom_rows, batch_format="pyarrow"))

    both = refs[0].union(*refs[1:], *geoms)

    # --- cogroup join: attach geometry to each request ---------------------
    def shard_gkey(t: pa.Table) -> pa.Table:
        k = t["gkey"].to_numpy()
        return t.append_column("gshard", pa.array(np.asarray(k, np.int64) % parts, type=pa.int64()))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # index-aligned hash merge (vectorized) — gkeys are unique on
        # the geometry side, so inner merge ≡ the old per-row
        # .map(lookup) + dropna, at C speed.  Uniqueness is ENFORCED:
        # a duplicate gkey would silently duplicate every referencing
        # member row where the old Series.map raised (review finding)
        geo = g.loc[g["side"] == 1, ["gkey", "geom"]]
        if not geo["gkey"].is_unique:
            raise ValueError("duplicate gkey on the geometry side of the cogroup")
        out = g.loc[g["side"] == 0].drop(columns=["geom"]).merge(geo, on="gkey", how="inner")
        return out[["rel_id", "kind", "mpos", "sub_mpos", "role", "sub_role", "geom"]]

    all_rows = (
        both.map_batches(shard_gkey, batch_format="pyarrow")
        .groupby("gshard")
        .map_groups(attach, batch_format="pandas")
    )

    def add_part(t: pa.Table) -> pa.Table:
        rid = t["rel_id"].to_numpy()
        return t.append_column("part", pa.array((np.asarray(rid, np.int64) % parts), type=pa.int64()))

    def rings_partition(g: pd.DataFrame) -> pd.DataFrame:
        # one task per coarse partition — iterate the rel runs inside
        g = g.sort_values(["rel_id", "kind", "mpos", "sub_mpos"], kind="mergesort")
        out_rel: list[int] = []
        out_role: list[str] = []
        out_lons: list[list[float]] = []
        out_lats: list[list[float]] = []
        out_idx: list[int] = []
        for rel_id, rg in g.groupby("rel_id", sort=True):
            ring_idx = 0

            def emit(role: str, ring: np.ndarray) -> None:
                nonlocal ring_idx
                out_rel.append(int(rel_id))
                out_idx.append(ring_idx)
                out_role.append(role)
                out_lons.append(ring[:, 0].tolist())
                out_lats.append(ring[:, 1].tolist())
                ring_idx += 1

            # 1) direct way members -> rings, outer then inner
            direct = rg[rg["kind"] == 0]
            for role in ("outer", "inner"):
                polylines = [unpack_geom(b) for b in direct[direct["role"] == role]["geom"]]
                if not polylines:
                    continue
                try:
                    closed = geometry.assemble_rings(polylines)
                except ValueError:
                    continue  # unclosable member set: drop (M9 skip-and-resume)
                for ring in closed:
                    emit(role, ring)
            # 2) node members -> single-point rows keeping the member role
            for _, row in rg[rg["kind"] == 1].iterrows():
                emit(str(row["role"]), unpack_geom(row["geom"]))
            # 3) sub-relation members, one ring set per sub in member order
            subs = rg[rg["kind"] == 2]
            for mpos, sg in subs.groupby("mpos", sort=True):
                for role in ("outer", "inner"):
                    polylines = [unpack_geom(b) for b in sg[sg["sub_role"] == role]["geom"]]
                    if not polylines:
                        continue
                    try:
                        closed = geometry.assemble_rings(polylines)
                    except ValueError:
                        continue
                    for ring in closed:
                        emit(role, ring)
        return pd.DataFrame(
            {
                "rel_id": pd.Series(out_rel, dtype=np.int64),
                "ring_idx": pd.Series(out_idx, dtype=np.int64),
                "role": pd.Series(out_role, dtype=object),
                "lons": pd.Series(out_lons, dtype=object),
                "lats": pd.Series(out_lats, dtype=object),
            }
        )

    return all_rows.map_batches(add_part, batch_format="pyarrow").groupby("part").map_groups(
        rings_partition, batch_format="pandas"
    )


def boundaries_from_world(world: dict) -> rd.Dataset:
    """Full denormalization DAG over the in-memory fixture world tables."""
    nodes = rd.from_arrow(world["nodes"])
    ways = rd.from_arrow(world["ways"])
    relations = rd.from_arrow(world["relations"].select(["rel_id", "members"]))
    # way_geoms feeds TWO joins (direct way members + the sub-relation
    # hop); materialize the bounded intermediate once instead of
    # re-running the assembly DAG per consumer
    way_geoms = assemble_ways(nodes, ways).materialize()
    return assemble_relations(relations, way_geoms, nodes=nodes)


def polygons_from_rings(rings_df: pd.DataFrame) -> list[dict]:
    """Collect assembled rings into PiP-index polygon dicts
    (rel_id, outer, holes) — the seam between the denormalization DAG
    and the broadcast spatial join.  Non-ring rows (node-member points,
    role not outer/inner) don't form polygons and are skipped."""
    polys: list[dict] = []
    for rel_id, g in rings_df.groupby("rel_id"):
        outers = [np.column_stack([r["lons"], r["lats"]]) for _, r in g[g["role"] == "outer"].iterrows()]
        holes = [np.column_stack([r["lons"], r["lats"]]) for _, r in g[g["role"] == "inner"].iterrows()]
        for i, outer in enumerate(outers):
            polys.append(dict(rel_id=int(rel_id), name="", admin_level=0, outer=outer, holes=holes if i == 0 else []))
    return polys


def way_assembly_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: way geometries of the fixture world as scalar
    rows (way_id, n_points, first/last coords) — golden-oracle checked
    (the oracle derives the same rows locally from the construction
    tables, independent of the distributed explode/join/regroup)."""
    from .. import fixtures

    world = fixtures.boundary_world()
    geoms = assemble_ways(rd.from_arrow(world["nodes"]), rd.from_arrow(world["ways"]))

    def summarize(t: pa.Table) -> pa.Table:
        geoms_ = t["geom"].to_pylist()
        pts = [unpack_geom(g) for g in geoms_]
        return pa.table(
            {
                "way_id": t["way_id"],
                "n_points": pa.array([p.shape[0] for p in pts], type=pa.int64()),
                "lon_first": pa.array([float(p[0, 0]) for p in pts], type=pa.float64()),
                "lat_last": pa.array([float(p[-1, 1]) for p in pts], type=pa.float64()),
            }
        )

    return geoms.map_batches(summarize, batch_format="pyarrow")


def boundary_assembly_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: assembled relation rings as scalar rows
    (rel_id, ring_idx, role, n_vertices, area_deg2) — golden-oracle
    checked against construction-time boundary data."""
    from .. import fixtures

    world = fixtures.boundary_world()
    rings = boundaries_from_world(world)

    def summarize(t: pa.Table) -> pa.Table:
        lons = t["lons"].to_pylist()
        lats = t["lats"].to_pylist()
        areas = [round(geometry.ring_area(np.column_stack([lo, la])), 9) if len(lo) >= 3 else 0.0 for lo, la in zip(lons, lats)]
        nv = [len(lo) for lo in lons]
        return pa.table(
            {
                "rel_id": t["rel_id"],
                "ring_idx": t["ring_idx"],
                "role": t["role"],
                "n_vertices": pa.array(nv, type=pa.int64()),
                "area_deg2": pa.array(areas, type=pa.float64()),
            }
        )

    return rings.map_batches(summarize, batch_format="pyarrow")


def way_lengths_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: geodesic path length per assembled way (ST1's
    haversine applied along the J1 assembly output — meters, rounded
    4dp).  Golden-oracle checked against an independent pure-Python
    great-circle recompute from the construction tables."""
    from .. import fixtures, geometry

    world = fixtures.boundary_world()
    geoms = assemble_ways(rd.from_arrow(world["nodes"]), rd.from_arrow(world["ways"]))

    def lengths(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        out = []
        for g in t["geom"].to_pylist():
            c = unpack_geom(g)
            if c.shape[0] < 2:
                out.append(0.0)
                continue
            seg = geometry.haversine_m(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1])
            out.append(float(np.sum(seg)))
        return pa.table(
            {
                "way_id": t["way_id"],
                "length_m": pa.array(duckdb_round(np.asarray(out), 4), type=pa.float64()),
            }
        )

    return geoms.map_batches(lengths, batch_format="pyarrow")


SHOELACE_FP = 1e9  # fixed-point scale for per-edge shoelace terms


def boundary_stats_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: shoelace area + centroid per assembled ring
    (rel_id, ring_idx, n_vertices, area_fp, cx_fp, cy_fp, area_deg2,
    centroid_lon, centroid_lat).

    Every edge term — cross = x1*y2 - x2*y1, (x1+x2)*cross,
    (y1+y2)*cross — is computed in float64 with the oracle's exact
    association, then fixed-pointed (floor(v*1e9 + 0.5), round-half-up
    for negatives too) so the per-ring int64 sums are independent of
    edge order; derived floats divide the summed BIGINTs identically
    in both engines.  The oracle recomputes over the construction-time
    vertex table (golden.boundary_vertices_path), so this checks the
    J2 assembly DAG AND the stats kernel against pre-assembly truth.

    Edges wrap (v_i -> v_{i+1 mod n}); point members and rings with
    fewer than 3 vertices are skipped on both sides.
    """
    from .. import fixtures

    world = fixtures.boundary_world()
    rings = boundaries_from_world(world)
    S = SHOELACE_FP

    def stats(t: pa.Table) -> pa.Table:
        roles = t["role"].to_pylist()
        lons = t["lons"].to_pylist()
        lats = t["lats"].to_pylist()
        rels = t["rel_id"].to_pylist()
        ridx = t["ring_idx"].to_pylist()
        out = {k: [] for k in ("rel_id", "ring_idx", "n_vertices", "area_fp", "cx_fp", "cy_fp")}
        for rel, ri, role, lo, la in zip(rels, ridx, roles, lons, lats):
            if role not in ("outer", "inner") or len(lo) < 3:
                continue
            x1 = np.asarray(lo, dtype=np.float64)
            y1 = np.asarray(la, dtype=np.float64)
            x2 = np.roll(x1, -1)
            y2 = np.roll(y1, -1)
            cross = x1 * y2 - x2 * y1
            a_fp = np.floor(cross * S + 0.5).astype(np.int64)
            cx_fp = np.floor(((x1 + x2) * cross) * S + 0.5).astype(np.int64)
            cy_fp = np.floor(((y1 + y2) * cross) * S + 0.5).astype(np.int64)
            out["rel_id"].append(rel)
            out["ring_idx"].append(ri)
            out["n_vertices"].append(len(lo))
            out["area_fp"].append(int(a_fp.sum()))
            out["cx_fp"].append(int(cx_fp.sum()))
            out["cy_fp"].append(int(cy_fp.sum()))
        a = np.asarray(out["area_fp"], dtype=np.float64)
        cx = np.asarray(out["cx_fp"], dtype=np.float64)
        cy = np.asarray(out["cy_fp"], dtype=np.float64)
        return pa.table(
            {
                "rel_id": pa.array(out["rel_id"], type=pa.int64()),
                "ring_idx": pa.array(out["ring_idx"], type=pa.int64()),
                "n_vertices": pa.array(out["n_vertices"], type=pa.int64()),
                "area_fp": pa.array(out["area_fp"], type=pa.int64()),
                "cx_fp": pa.array(out["cx_fp"], type=pa.int64()),
                "cy_fp": pa.array(out["cy_fp"], type=pa.int64()),
                "area_deg2": pa.array(a / (2.0 * S), type=pa.float64()),
                "centroid_lon": pa.array(cx / (3.0 * a), type=pa.float64()),
                "centroid_lat": pa.array(cy / (3.0 * a), type=pa.float64()),
            }
        )

    return rings.map_batches(stats, batch_format="pyarrow")


def way_junctions_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: junction nodes — nodes referenced by >= 2
    DISTINCT ways (the fixture world's chained boundary ways share
    their endpoint nodes, exactly like consecutive OSM boundary
    segments; the reference walks these shared endpoints when chaining
    member ways into rings, geow Denormalizer semantics).  Junction
    degree is the connectivity primitive behind route-network
    extraction and intersection detection.

    Scale shape: the explode is the same J1 fan-out as assemble_ways;
    a per-batch (node_id, way_id) dedup collapses within-way repeats
    map-side, so the shuffle carries distinct pairs; degree is then a
    two-level groupby (pairs -> node), and coordinates come back via
    the same hash join J1 uses.  No stage holds more than a partition.

    Output: (node_id, n_ways, lon, lat) for nodes with n_ways >= 2.
    Golden-oracle checked against a local recompute from the
    construction tables.
    """
    from ray.data.aggregate import Count

    from .. import fixtures

    world = fixtures.boundary_world()
    ways = rd.from_arrow(world["ways"])
    nodes = rd.from_arrow(world["nodes"])

    def pair_distinct(t: pa.Table) -> pa.Table:
        return (
            t.select(["node_id", "way_id"])
            .group_by(["node_id", "way_id"])
            .aggregate([])
        )

    deg = (
        ways.map_batches(explode_way_nds, batch_format="pyarrow")
        .map_batches(pair_distinct, batch_format="pyarrow")
        .groupby(["node_id", "way_id"])
        .aggregate(Count(alias_name="dup"))
        .groupby("node_id")
        .aggregate(Count(alias_name="n_ways"))
        .filter(expr="n_ways >= 2")
    )
    joined = safe_join(deg, nodes, join_type="inner", num_partitions=4, on=("node_id",))
    return joined.select_columns(["node_id", "n_ways", "lon", "lat"])


# ---------------------------------------------------------------------------
# zone_way_length (per-admin-zone road length: J1 assembly x zone overlay)
# ---------------------------------------------------------------------------

ZWL_FP = 1e9  # fixed-point scale for clipped lengths (planar degrees)


def zone_seg_len_fp(coords: "np.ndarray", rect: dict) -> tuple[int, int]:
    """(n_segments_touching, Σ clipped-length fp) of one way polyline
    inside one axis-aligned zone rect — Liang-Barsky parametric clip per
    segment, vectorized; the SAME kernel backs the engine stage and the
    golden recompute, so the compare verifies the distributed J1
    assembly + shuffle, not scalar arithmetic."""
    x0, y0 = coords[:-1, 0], coords[:-1, 1]
    x1, y1 = coords[1:, 0], coords[1:, 1]
    dx, dy = x1 - x0, y1 - y0
    seglen = np.sqrt(dx * dx + dy * dy)
    t0 = np.zeros(len(dx))
    t1 = np.ones(len(dx))
    for d, o, lo, hi in ((dx, x0, rect["lon_min"], rect["lon_max"]), (dy, y0, rect["lat_min"], rect["lat_max"])):
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = (lo - o) / d
            tb = (hi - o) / d
        enter = np.where(d > 0, ta, np.where(d < 0, tb, 0.0))
        exit_ = np.where(d > 0, tb, np.where(d < 0, ta, 1.0))
        inside0 = (d != 0) | ((o >= lo) & (o <= hi))
        t0 = np.where(inside0, np.maximum(t0, enter), 2.0)  # empty interval when outside
        t1 = np.where(inside0, np.minimum(t1, exit_), -1.0)
    frac = np.maximum(0.0, t1 - t0)
    clipped = frac * seglen
    touch = clipped > 0
    fp = np.floor(clipped[touch] * ZWL_FP + 0.5).astype(np.int64)
    return int(touch.sum()), int(fp.sum())


def zone_way_length_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: total way (road) length inside each admin
    zone — the line x polygon overlay at ZONE granularity (the district
    road-density statistic; segment_cell_lengths is the same overlay at
    lattice granularity).

    Shape: the J1 assembly DAG produces way geometries; each way row
    clips against the BROADCAST zone rects map-side (Liang-Barsky
    t-intervals, fixed-point int64 lengths), so the only exchange after
    assembly is a zone-keyed int64 reduce.  Polygon zones would swap
    the rect clip for clip_ring_convex, DAG unchanged.  Golden oracle =
    identical kernel over the construction tables (no Ray, no DAG).
    Output: (rel_id, n_segments, len_fp).
    """
    from ray.data.aggregate import Sum as _Sum

    from .. import fixtures

    world = fixtures.boundary_world()
    geoms = assemble_ways(rd.from_arrow(world["nodes"]), rd.from_arrow(world["ways"]))
    rects = fixtures.admin_rects()

    def overlay(t: pa.Table) -> pa.Table:
        rel, nseg, fp = [], [], []
        for g in t["geom"].to_pylist():
            coords = unpack_geom(g)
            if coords.shape[0] < 2:
                continue
            for r in rects:
                n, s = zone_seg_len_fp(coords, r)
                if n:
                    rel.append(r["rel_id"])
                    nseg.append(n)
                    fp.append(s)
        return pa.table(
            {
                "rel_id": pa.array(rel, type=pa.int64()),
                "n_segments": pa.array(nseg, type=pa.int64()),
                "len_fp": pa.array(fp, type=pa.int64()),
            }
        )

    return (
        geoms.map_batches(overlay, batch_format="pyarrow")
        .groupby("rel_id")
        .aggregate(_Sum("n_segments", alias_name="n_segments"), _Sum("len_fp", alias_name="len_fp"))
        .sort("rel_id")
    )


EARTH_R_M = 6371008.8  # mean Earth radius (IUGG)
GEOD_FP = 1e9  # fixed-point quantum for per-edge spherical terms


def boundary_geodesic_area_query(sf_dir: str) -> rd.Dataset:
    """Spherical-excess (geodesic) ring areas — the planet-scale area
    the planar shoelace (boundary_stats) gets wrong away from the
    equator.  Per edge, the Chamberlain–Duquette term
    ``(λ2-λ1)·(2 + sin φ1 + sin φ2)`` (radians) is computed in float64
    and fixed-pointed (floor(v·1e9 + 0.5)) so the per-ring int64 sum is
    edge-order-free; ``area_m2 = |Σ| / 1e9 · R²/2`` divides the summed
    BIGINT identically in both engines.

    Oracle: golden numpy recompute over the CONSTRUCTION-time vertex
    table (not DuckDB trig — libm sin() can differ from numpy in the
    last ulp, which a 1e9 fixed point would surface), so the compare
    still verifies the assembled-ring DAG against pre-assembly truth.
    Assumes rings do not cross the antimeridian (true of the fixture
    world; normalize λ spans first where they can).

    Output: (rel_id, ring_idx, n_vertices, geod_fp, area_m2).
    """
    from .. import fixtures

    world = fixtures.boundary_world()
    rings = boundaries_from_world(world)

    def stats(t: pa.Table) -> pa.Table:
        roles = t["role"].to_pylist()
        lons = t["lons"].to_pylist()
        lats = t["lats"].to_pylist()
        rels = t["rel_id"].to_pylist()
        ridx = t["ring_idx"].to_pylist()
        out = {k: [] for k in ("rel_id", "ring_idx", "n_vertices", "geod_fp")}
        for rel, ri, role, lo, la in zip(rels, ridx, roles, lons, lats):
            if role not in ("outer", "inner") or len(lo) < 3:
                continue
            lam = np.radians(np.asarray(lo, dtype=np.float64))
            phi = np.radians(np.asarray(la, dtype=np.float64))
            term = (np.roll(lam, -1) - lam) * (2.0 + np.sin(phi) + np.sin(np.roll(phi, -1)))
            fp = np.floor(term * GEOD_FP + 0.5).astype(np.int64)
            out["rel_id"].append(rel)
            out["ring_idx"].append(ri)
            out["n_vertices"].append(len(lo))
            out["geod_fp"].append(int(fp.sum()))
        g = np.asarray(out["geod_fp"], dtype=np.float64)
        return pa.table(
            {
                "rel_id": pa.array(out["rel_id"], type=pa.int64()),
                "ring_idx": pa.array(out["ring_idx"], type=pa.int64()),
                "n_vertices": pa.array(out["n_vertices"], type=pa.int64()),
                "geod_fp": pa.array(out["geod_fp"], type=pa.int64()),
                "area_m2": pa.array(np.abs(g) / GEOD_FP * (EARTH_R_M * EARTH_R_M / 2.0), type=pa.float64()),
            }
        )

    return rings.map_batches(stats, batch_format="pyarrow")
