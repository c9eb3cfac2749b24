"""Denormalization DAG: normalized OSM-style tables -> assembled polygons.

Distributed rebuild of the reference's preprocessing joins (SURVEY §3.2):

- J1 way assembly (WayFlow.denormalizeWayFlow, processing/WayFlow.scala:27-49):
  the reference looks up each way's node ids against the Mongo mapping
  service with mapAsync(4); here the lookup table is just a Dataset and
  the lookups become ONE hash-shuffle join:
      explode ways -> (way_id, node_id, pos)
      ⋈ nodes on node_id                       (inner: misses drop, :38)
      groupby(way_id) -> coords back in nds order (pos column carries
      the ordering through the shuffle — Ray does not preserve row order)

- J2 relation assembly (RelationFlow.denormalizeRelationFlow, :29-76):
  members ⋈ way geometries, then per-relation ring assembly
  (geow Denormalizer semantics: unclosed member ways chained into
  closed rings; inner/outer roles -> holes).

Output: one row per assembled ring
  (rel_id, name, admin_level, ring_idx, role, lons, lats)
verified in tests against the fixture world's construction-time golden
boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import geometry


def explode_way_nds(batch: pa.Table) -> pa.Table:
    """ways(way_id, nds) -> (way_id, node_id, pos) — the join fan-out."""
    col = batch["nds"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pa.compute.list_value_length(col).to_numpy()
    way_ids = np.repeat(batch["way_id"].to_numpy(), lengths)
    node_ids = col.flatten().to_numpy()
    pos = np.concatenate([np.arange(n, dtype=np.int64) for n in lengths]) if len(lengths) else np.empty(0, np.int64)
    return pa.table(
        {
            "way_id": pa.array(way_ids, type=pa.int64()),
            "node_id": pa.array(node_ids, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


def assemble_ways(nodes: rd.Dataset, ways: rd.Dataset, num_partitions: int = 8) -> rd.Dataset:
    """J1: way geometries via explode -> hash join -> ordered regroup.

    Inner-join drop semantics: a way's missing node ids are dropped
    (reference filter(_.isDefined)); a way whose every node is missing
    disappears entirely.
    """
    flat = ways.map_batches(explode_way_nds, batch_format="pyarrow")
    joined = flat.join(nodes, join_type="inner", num_partitions=num_partitions, on=("node_id",))

    def regroup(g: pa.Table) -> pa.Table:
        g = g.sort_by("pos")
        # geometry packed as binary (float64 lon,lat pairs): Arrow's
        # hash join supports neither list nor tensor payload columns,
        # binary passes through — the engine's WKB-like transport form
        coords = np.column_stack([g["lon"].to_numpy(), g["lat"].to_numpy()])
        return pa.table(
            {
                "way_id": pa.array([g["way_id"][0].as_py()], type=pa.int64()),
                "geom": pa.array([coords.tobytes()], type=pa.binary()),
            }
        )

    return joined.groupby("way_id").map_groups(regroup, batch_format="pyarrow")


def unpack_geom(geom: bytes) -> np.ndarray:
    """binary (float64 lon,lat pairs) -> (n, 2) coordinate array."""
    return np.frombuffer(geom, dtype=np.float64).reshape(-1, 2)


def explode_members(batch: pa.Table) -> pa.Table:
    """relations(rel_id, members) -> (rel_id, way_id, role, mpos)."""
    col = batch["members"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pa.compute.list_value_length(col).to_numpy()
    rel_ids = np.repeat(batch["rel_id"].to_numpy(), lengths)
    flat = col.flatten()
    refs = flat.field("ref").to_numpy()
    roles = flat.field("type").to_pylist(), flat.field("role").to_pylist()
    mpos = np.concatenate([np.arange(n, dtype=np.int64) for n in lengths]) if len(lengths) else np.empty(0, np.int64)
    return pa.table(
        {
            "rel_id": pa.array(rel_ids, type=pa.int64()),
            "way_id": pa.array(refs, type=pa.int64()),
            "member_type": pa.array(roles[0], type=pa.string()),
            "role": pa.array(roles[1], type=pa.string()),
            "mpos": pa.array(mpos, type=pa.int64()),
        }
    )


def assemble_relations(
    relations: rd.Dataset, way_geoms: rd.Dataset, rel_attrs: rd.Dataset | None = None, num_partitions: int = 4
) -> rd.Dataset:
    """J2: relation polygons via member join + per-group ring assembly.

    Output rows: (rel_id, ring_idx, role, lons, lats) — one per closed
    ring; ``role`` is 'outer' or 'inner' per OSM multipolygon convention.
    """
    members = relations.map_batches(explode_members, batch_format="pyarrow")
    members = members.filter(expr="member_type == 'way'")
    joined = members.join(way_geoms, join_type="inner", num_partitions=num_partitions, on=("way_id",))

    def rings(g: pa.Table) -> pa.Table:
        g = g.sort_by("mpos")
        rel_id = g["rel_id"][0].as_py()
        roles = g["role"].to_pylist()
        geoms = g["geom"].to_pylist()
        out_role: list[str] = []
        out_lons: list[list[float]] = []
        out_lats: list[list[float]] = []
        for role in ("outer", "inner"):
            polylines = [unpack_geom(geoms[i]) for i in range(len(roles)) if roles[i] == role]
            if not polylines:
                continue
            try:
                closed = geometry.assemble_rings(polylines)
            except ValueError:
                continue  # unclosable member set: drop (M9 skip-and-resume)
            for ring in closed:
                out_role.append(role)
                out_lons.append(ring[:, 0].tolist())
                out_lats.append(ring[:, 1].tolist())
        return pa.table(
            {
                "rel_id": pa.array([rel_id] * len(out_role), type=pa.int64()),
                "ring_idx": pa.array(np.arange(len(out_role), dtype=np.int64)),
                "role": pa.array(out_role, type=pa.string()),
                "lons": pa.array(out_lons, type=pa.list_(pa.float64())),
                "lats": pa.array(out_lats, type=pa.list_(pa.float64())),
            }
        )

    return joined.groupby("rel_id").map_groups(rings, batch_format="pyarrow")


def boundaries_from_world(world: dict) -> rd.Dataset:
    """Full denormalization DAG over the in-memory fixture world tables."""
    nodes = rd.from_arrow(world["nodes"])
    ways = rd.from_arrow(world["ways"])
    relations = rd.from_arrow(world["relations"].select(["rel_id", "members"]))
    way_geoms = assemble_ways(nodes, ways)
    return assemble_relations(relations, way_geoms)


def polygons_from_rings(rings_df: pd.DataFrame) -> list[dict]:
    """Collect assembled rings into PiP-index polygon dicts
    (rel_id, outer, holes) — the seam between the denormalization DAG
    and the broadcast spatial join."""
    polys: list[dict] = []
    for rel_id, g in rings_df.groupby("rel_id"):
        outers = [np.column_stack([r["lons"], r["lats"]]) for _, r in g[g["role"] == "outer"].iterrows()]
        holes = [np.column_stack([r["lons"], r["lats"]]) for _, r in g[g["role"] == "inner"].iterrows()]
        for i, outer in enumerate(outers):
            polys.append(dict(rel_id=int(rel_id), name="", admin_level=0, outer=outer, holes=holes if i == 0 else []))
    return polys


def way_assembly_query(sf_dir: str) -> rd.Dataset:
    """queries() surface: way geometries of the fixture world as scalar
    rows (way_id, n_points, first/last coords) — rows-only checked."""
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
    (rel_id, ring_idx, role, n_vertices, area) — rows-only checked."""
    from .. import fixtures

    world = fixtures.boundary_world()
    rings = boundaries_from_world(world)

    def summarize(t: pa.Table) -> pa.Table:
        lons = t["lons"].to_pylist()
        lats = t["lats"].to_pylist()
        areas = [round(geometry.ring_area(np.column_stack([lo, la])), 9) for lo, la in zip(lons, lats)]
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
