"""GeoJSON boundary source + feature sink.

Reference analogues:
- S2 ``OsmGeoJSONBoundaryParser`` (util/.../OsmTestData.scala:21-26):
  parse boundary GeoJSON into denormalized relations;
- M15 GeoJSON serialisation (``Flows.areaToGeoJson``, Flows.scala:92;
  macro-generated per-POI serialise, Macros.scala:84-92).

Supports Polygon and MultiPolygon features; ring 0 = outer, rings 1..n
= holes (RFC 7946).  The parsed form is the engine's polygon dict
(rel_id, name, admin_level, outer, holes) consumed directly by
stages.geo.PolygonIndex.
"""

from __future__ import annotations

import json

import numpy as np


def parse_boundaries(geojson_text: str) -> list[dict]:
    """FeatureCollection -> polygon dicts (one per outer ring)."""
    doc = json.loads(geojson_text)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    out: list[dict] = []
    for f in feats:
        geom = f.get("geometry") or {}
        props = f.get("properties") or {}
        rel_id = int(props.get("rel_id", props.get("id", len(out) + 1)))
        name = str(props.get("name", ""))
        admin_level = int(props.get("admin_level", 0))
        gtype = geom.get("type")
        if gtype == "Polygon":
            polys = [geom["coordinates"]]
        elif gtype == "MultiPolygon":
            polys = geom["coordinates"]
        else:
            continue  # non-areal features are skipped (boundary source)
        for rings in polys:
            out.append(
                dict(
                    rel_id=rel_id,
                    name=name,
                    admin_level=admin_level,
                    outer=np.asarray(rings[0], dtype=np.float64),
                    holes=[np.asarray(r, dtype=np.float64) for r in rings[1:]],
                )
            )
    return out


def read_boundaries(path: str) -> list[dict]:
    with open(path) as f:
        return parse_boundaries(f.read())


def _close(ring: np.ndarray) -> list[list[float]]:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring.tolist()


def boundaries_to_geojson(polys: list[dict]) -> str:
    """Polygon dicts -> FeatureCollection text (the output writer)."""
    feats = []
    for p in polys:
        feats.append(
            {
                "type": "Feature",
                "properties": {
                    "rel_id": int(p["rel_id"]),
                    "name": p.get("name", ""),
                    "admin_level": int(p.get("admin_level", 0)),
                },
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [_close(p["outer"])] + [_close(h) for h in p.get("holes") or []],
                },
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def points_to_geojson(lon, lat, properties: list[dict] | None = None) -> str:
    """Point features (the per-element GeoJSON sink, Flows.scala:92-123)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    feats = [
        {
            "type": "Feature",
            "properties": (properties[i] if properties else {}),
            "geometry": {"type": "Point", "coordinates": [float(lon[i]), float(lat[i])]},
        }
        for i in range(len(lon))
    ]
    return json.dumps({"type": "FeatureCollection", "features": feats})
