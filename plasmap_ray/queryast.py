"""Query AST + planner — rebuild of PMQuery / QueryTranslator.

The reference models client queries as a sealed AST
(query-model/src/main/scala/io/plasmap/querymodel/Model.scala:6-169,
70+ case classes, uPickle-serialized at PMSerialiser.scala:14-20) and
compiles them to engine source graphs
(QueryTranslator.translate, query-engine/.../QueryTranslator.scala:30-207) —
e.g. ``PMDistrictsFromArea(PMCityFromCoordinates(..))`` chains an area
query into a containment query.

Here the AST is plain dataclasses, (de)serializable to JSON, compiled
by :func:`translate` into Ray-Data-backed execution over an
:class:`EngineContext` (boundary polygons + POI table + point cloud).
Queries compose the same way (a node's input is another node).

The three canonical queries of the rebuild (SURVEY.md §7.2 item 11) —
containing-polygon for a point, features-in-tile z/x/y, nearest-k
POIs — all flow through this planner and are verified against the
DuckDB oracle via __ray_entry__.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from . import fixtures, geometry, pois as poireg, tiles
from .stages import geo


# --- AST nodes (PMQuery analogues) -----------------------------------------


@dataclass(frozen=True)
class Query:
    """Base of the AST (PMQuery, Model.scala:6)."""


@dataclass(frozen=True)
class ContainingAreas(Query):
    """Which admin polygons contain this point (J3;
    PMCityFromCoordinates / relationByCoordinatesAndType, Queries.scala:304-315)."""

    lon: float
    lat: float
    admin_level: int | None = None


@dataclass(frozen=True)
class AreaByName(Query):
    """Area lookup by name (PMCityFromName / relationByName, Queries.scala:279-299)."""

    name: str


@dataclass(frozen=True)
class DistrictsOfArea(Query):
    """Sub-areas contained in the parent area (PMDistrictsFromArea /
    relationByContainment, Queries.scala:320-341)."""

    parent: Query


@dataclass(frozen=True)
class PoisInArea(Query):
    """POIs of a category inside an area (PMPOIs*FromArea / J5,
    Queries.scala:188-209); category from the registry (60+ kinds)."""

    parent: Query
    category: str


@dataclass(frozen=True)
class NearestPois(Query):
    """k nearest POIs to a point (J7 'nearby', Queries.scala:211-262)."""

    lon: float
    lat: float
    k: int = 3
    category: str | None = None


@dataclass(frozen=True)
class PoisNearPoint(Query):
    """All POIs (optionally of a category) within a planar radius of a
    point — the 'nearby' radius form (J6/J7, PointOfInterestQuery.nearby,
    Queries.scala:211-262)."""

    lon: float
    lat: float
    radius_deg: float
    category: str | None = None


@dataclass(frozen=True)
class FeaturesInTile(Query):
    """Feature ids whose position falls in slippy tile z/x/y (the
    raster->vector lookup; tile ids are prefixes of the cell key)."""

    z: int
    x: int
    y: int


# The reference's TYPED area-query ladder (CountryQuery/StateQuery/
# RegionQuery/CityQuery/TownshipQuery/DistrictQuery/VillageQuery/
# CommunityQuery, Queries.scala:47-148) — each kind is an admin_level
# (BoundingBoxGrid admin-level mapping).  TypedAreaAt desugars to a
# ContainingAreas with the ladder's level pinned.
AREA_LADDER = {
    "country": 2,
    "state": 4,
    "region": 5,
    "city": 6,
    "township": 7,
    "district": 8,
    "village": 9,
    "community": 10,
}


@dataclass(frozen=True)
class TypedAreaAt(Query):
    """Typed area containing a point — e.g. TypedAreaAt('city', lon, lat)
    is the reference's CityQuery-from-coordinates (Queries.scala:89-102)."""

    kind: str
    lon: float
    lat: float

    def __post_init__(self) -> None:
        # the AST is the deserialization boundary for client queries —
        # reject unknown kinds here with the allowed ladder, not as a
        # KeyError deep inside the planner
        if self.kind not in AREA_LADDER:
            raise ValueError(f"unknown area kind {self.kind!r}; expected one of {sorted(AREA_LADDER)}")


# --- JSON (de)serialization (PMSerialiser analogue) ------------------------

_NODE_TYPES = {
    c.__name__: c
    for c in (ContainingAreas, AreaByName, DistrictsOfArea, PoisInArea, NearestPois, PoisNearPoint, FeaturesInTile, TypedAreaAt)
}


def to_json(q: Query) -> str:
    def enc(node):
        d = {"type": type(node).__name__}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            d[f.name] = enc(v) if isinstance(v, Query) else v
        return d

    return json.dumps(enc(q))


def from_json(s: str) -> Query:
    def dec(d):
        cls = _NODE_TYPES[d.pop("type")]
        kwargs = {k: (dec(v) if isinstance(v, dict) and "type" in v else v) for k, v in d.items()}
        return cls(**kwargs)

    return dec(json.loads(s))


# --- Engine context + planner (QueryTranslator analogue) -------------------


@dataclass
class EngineContext:
    """The data the planner executes against: boundary polygons, the POI
    table, and a point cloud (ids + lon/lat) for feature queries."""

    polygons: list[dict] = field(default_factory=fixtures.admin_polygons)
    poi_table: pa.Table = field(default_factory=fixtures.make_pois)
    points: pa.Table | None = None  # columns: id(any), lon, lat

    def __post_init__(self):
        self._index = geo.PolygonIndex(self.polygons)
        self._by_rel = {p["rel_id"]: p for p in self.polygons}


def translate(q: Query, ctx: EngineContext) -> pa.Table:
    """Compile + execute an AST node (dict dispatch replaces the
    reference's macro-generated match, Macros.scala:72-107)."""
    fn = _DISPATCH[type(q)]
    return fn(q, ctx)


def _areas_table(polys: list[dict]) -> pa.Table:
    return pa.table(
        {
            "rel_id": pa.array([p["rel_id"] for p in polys], type=pa.int64()),
            "name": pa.array([p["name"] for p in polys], type=pa.string()),
            "admin_level": pa.array([p["admin_level"] for p in polys], type=pa.int32()),
        }
    )


def _containing(q: ContainingAreas, ctx: EngineContext) -> pa.Table:
    pt_idx, poly_idx = ctx._index.query(np.array([q.lon]), np.array([q.lat]))
    polys = [ctx._index.polygons[i] for i in poly_idx]
    if q.admin_level is not None:
        polys = [p for p in polys if p["admin_level"] == q.admin_level]
    return _areas_table(polys)


def _by_name(q: AreaByName, ctx: EngineContext) -> pa.Table:
    return _areas_table([p for p in ctx.polygons if p["name"] == q.name])


def _resolve_areas(q: Query, ctx: EngineContext) -> list[dict]:
    t = translate(q, ctx)
    ids = set(t["rel_id"].to_pylist())
    return [p for p in ctx.polygons if p["rel_id"] in ids]


def _districts(q: DistrictsOfArea, ctx: EngineContext) -> pa.Table:
    """Containment join (J4): candidate sub-areas within the parent —
    EXACT polygon⊇polygon first (vertex + proper-edge-crossing test,
    geometry.polygon_within — the case vertex/bbox-only containment
    gets wrong on concave parents), then the fuzzy >=0.9 area fallback,
    mirroring GeoCalculator.within -> fuzzyWithin
    (GeoCalculator.scala:111-149; Queries.scala:320-341)."""
    parents = _resolve_areas(q.parent, ctx)
    out = []
    for parent in parents:
        for cand in ctx.polygons:
            if cand["rel_id"] == parent["rel_id"] or cand["admin_level"] <= parent["admin_level"]:
                continue
            if geometry.polygon_within(
                cand["outer"], parent["outer"], cand.get("holes"), parent.get("holes")
            ) or geometry.fuzzy_within(cand["outer"], parent["outer"], cand.get("holes"), parent.get("holes")):
                out.append(cand)
    return _areas_table(out)


def _poi_mask(t: pa.Table, category: str) -> np.ndarray:
    keys = np.asarray(t["key"].to_pylist(), dtype=object)
    values = np.asarray(t["value"].to_pylist(), dtype=object)
    mask = np.zeros(t.num_rows, dtype=bool)
    for k, v in poireg.tags_for(category):
        mask |= (keys == k) & (values == v)
    return mask


def _pois_in_area(q: PoisInArea, ctx: EngineContext) -> pa.Table:
    """Tag pushdown first, then exact PiP (J5 ordering, Queries.scala:188-209)."""
    t = ctx.poi_table
    t = t.filter(pa.array(_poi_mask(t, q.category)))
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    parents = _resolve_areas(q.parent, ctx)
    keep = np.zeros(t.num_rows, dtype=bool)
    rel = np.zeros(t.num_rows, dtype=np.int64)
    for p in parents:
        inside = geometry.points_in_polygon(lon, lat, p["outer"], p.get("holes"))
        rel = np.where(inside & ~keep, p["rel_id"], rel)
        keep |= inside
    out = t.filter(pa.array(keep))
    return out.append_column("rel_id", pa.array(rel[keep], type=pa.int64()))


def _nearest(q: NearestPois, ctx: EngineContext) -> pa.Table:
    t = ctx.poi_table
    if q.category is not None:
        t = t.filter(pa.array(_poi_mask(t, q.category)))
    kern = geo.KnnJoinActor(
        {c: t[c].to_numpy() for c in ("poi_id", "lon", "lat")}, k=q.k, metric="sqdeg", keep_cols=()
    )
    out = kern(pa.table({"lon": pa.array([q.lon]), "lat": pa.array([q.lat])}))
    return out.rename_columns(["knn_rank", "poi_id"])


def _pois_near(q: PoisNearPoint, ctx: EngineContext) -> pa.Table:
    t = ctx.poi_table
    if q.category is not None:
        t = t.filter(pa.array(_poi_mask(t, q.category)))
    dlon = t["lon"].to_numpy() - q.lon
    dlat = t["lat"].to_numpy() - q.lat
    mask = dlon * dlon + dlat * dlat <= q.radius_deg * q.radius_deg
    return t.filter(pa.array(mask))


def _features_in_tile(q: FeaturesInTile, ctx: EngineContext) -> pa.Table:
    if ctx.points is None:
        raise ValueError("FeaturesInTile needs EngineContext.points (id, lon, lat)")
    lon = ctx.points["lon"].to_numpy()
    lat = ctx.points["lat"].to_numpy()
    x, y = tiles.tile_xy(lon, lat, q.z)
    mask = (x == q.x) & (y == q.y)
    return ctx.points.filter(pa.array(mask))


def _typed_area(q: TypedAreaAt, ctx: EngineContext) -> pa.Table:
    level = AREA_LADDER[q.kind]
    return _containing(ContainingAreas(q.lon, q.lat, admin_level=level), ctx)


_DISPATCH = {
    ContainingAreas: _containing,
    TypedAreaAt: _typed_area,
    AreaByName: _by_name,
    DistrictsOfArea: _districts,
    PoisInArea: _pois_in_area,
    NearestPois: _nearest,
    PoisNearPoint: _pois_near,
    FeaturesInTile: _features_in_tile,
}


def explain(q: Query) -> pa.Table:
    """Query-plan EXPLAIN: the deterministic operator tree the planner
    will run for ``q``, one row per step in execution (post) order —
    the rebuild of the reference's query-graph construction surface
    (QueryTranslator.scala:1-210 translates each PMQuery node to a
    dataflow stage; here each AST node maps to its Ray Data stage).

    Rows: (step, op, detail).  Pure function of the AST — no data, no
    Ray; the driver-side plan mirror of ``translate``.
    """
    rows: list[tuple[str, str]] = []

    def emit(op: str, detail: str) -> None:
        rows.append((op, detail))

    def walk(node: Query) -> None:
        if isinstance(node, ContainingAreas):
            lvl = "any" if node.admin_level is None else str(node.admin_level)
            emit("scan_boundaries", f"admin_level={lvl}")
            emit("pip_probe", f"point=({node.lon!r}, {node.lat!r}) via broadcast PolygonIndex")
        elif isinstance(node, AreaByName):
            emit("scan_boundaries", "admin_level=any")
            emit("filter", f"name == '{node.name}'")
        elif isinstance(node, DistrictsOfArea):
            walk(node.parent)
            emit("scan_boundaries", "admin_level=8")
            emit("containment_join", "child within parent (exact, fuzzy>=0.9 fallback)")
        elif isinstance(node, PoisInArea):
            walk(node.parent)
            emit("scan_pois", f"category={node.category} (tag pushdown)")
            emit("pip_join", "pois within parent area")
        elif isinstance(node, NearestPois):
            cat = "any" if node.category is None else node.category
            emit("scan_pois", f"category={cat}")
            emit("knn", f"k={node.k} around ({node.lon!r}, {node.lat!r}) via grid index")
        elif isinstance(node, PoisNearPoint):
            cat = "any" if node.category is None else node.category
            emit("scan_pois", f"category={cat}")
            emit("radius_filter", f"r={node.radius_deg!r} deg around ({node.lon!r}, {node.lat!r})")
        elif isinstance(node, FeaturesInTile):
            emit("scan_points", "cell-indexed features")
            emit("tile_prefix_scan", f"z/x/y={node.z}/{node.x}/{node.y} (cell-prefix range)")
        elif isinstance(node, TypedAreaAt):
            emit("scan_boundaries", f"admin_level={node.admin_level}")
            emit("pip_probe", f"point=({node.lon!r}, {node.lat!r}) via broadcast PolygonIndex")
        else:  # pragma: no cover - future node kinds
            emit("unknown", type(node).__name__)

    walk(q)
    return pa.table(
        {
            "step": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64), type=pa.int64()),
            "op": pa.array([r[0] for r in rows], type=pa.string()),
            "detail": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )
