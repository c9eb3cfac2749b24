"""GeoJSON source/sink + storage adapter tests (S2/M15/S6-S8 rebuilds)."""

import numpy as np
import pyarrow.compute as pc
import pytest
import ray.data as rd

from plasmap_ray import fixtures
from plasmap_ray.sources import geojson, storage
from plasmap_ray.stages import geo


def test_geojson_roundtrip_drives_identical_pip():
    polys = fixtures.admin_polygons()
    text = geojson.boundaries_to_geojson(polys)
    back = geojson.parse_boundaries(text)
    assert len(back) == len(polys)
    idx_a = geo.PolygonIndex(polys)
    idx_b = geo.PolygonIndex(back)
    ids = np.arange(1, 5001)
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    a = set(zip(*[x.tolist() for x in idx_a.query(lon, lat)]))
    b = set(zip(*[x.tolist() for x in idx_b.query(lon, lat)]))
    assert a == b and len(a) > 0


def test_geojson_multipolygon_and_holes(tmp_path):
    world = fixtures.boundary_world()
    polys = [
        dict(rel_id=b["rel_id"], name=b["name"], admin_level=b["admin_level"], outer=b["outer"], holes=b.get("holes") or [])
        for b in world["boundaries"]
    ]
    text = geojson.boundaries_to_geojson(polys)
    p = tmp_path / "world.geojson"
    p.write_text(text)
    back = geojson.read_boundaries(str(p))
    by_id = {q["rel_id"]: q for q in back}
    assert len(by_id[1000]["holes"]) == 1  # Polyessen's hole survives
    # non-areal features are skipped
    skipped = geojson.parse_boundaries(
        '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
        '"geometry":{"type":"Point","coordinates":[1,2]}}]}'
    )
    assert skipped == []


def test_points_to_geojson():
    text = geojson.points_to_geojson([6.5], [51.0], [{"name": "x"}])
    import json

    doc = json.loads(text)
    assert doc["features"][0]["geometry"]["coordinates"] == [6.5, 51.0]
    assert doc["features"][0]["properties"]["name"] == "x"


def test_parquet_table_partitioned_rw(ray_session, tmp_path):
    ids = np.arange(1, 2001, dtype=np.int64)
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "lon": pa.array(fixtures.derive_lon(ids)),
            "lat": pa.array(fixtures.derive_lat(ids)),
        }
    )
    ds = rd.from_arrow(t).map_batches(geo.cell_index, batch_format="pyarrow")
    tab = storage.ParquetTable(str(tmp_path / "cells"), partition_col="cell_verylow")
    tab.write(ds)
    parts = tab.partitions()
    assert len(parts) > 1
    # partition-pruned point read returns exactly that cell's rows
    one = tab.scan_partition(parts[0]).to_pandas()
    full = tab.scan().to_pandas()
    expect = (full["cell_verylow"].astype(str) == parts[0]).sum()
    assert len(one) == expect > 0
    # metadata-only count agrees
    assert tab.count_partition(parts[0]) == expect
    # pruned scan with column projection + filter pushdown
    sub = tab.scan(columns=["doc_id", "cell_low"], filter=(pc.field("cell_low") > 0)).to_pandas()
    assert list(sub.columns) == ["doc_id", "cell_low"]
    assert len(sub) == len(full)


def test_parquet_table_errors(tmp_path):
    tab = storage.ParquetTable(str(tmp_path / "x"))
    with pytest.raises(ValueError):
        tab.scan_partition("1")
