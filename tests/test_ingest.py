"""Ingest fan-out DAG (Stage A+B rebuild): four outputs, one job."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from plasmap_ray import fixtures
from plasmap_ray.pipelines import ingest
from plasmap_ray.sources import storage


@pytest.fixture(scope="module")
def ingested(ray_session, tmp_path_factory):
    src = tmp_path_factory.mktemp("img_src")
    t = fixtures.make_images(600, size_choices=(16,))
    pq.write_table(t.slice(0, 300), str(src / "a.parquet"))
    pq.write_table(t.slice(300, 300), str(src / "b.parquet"))
    out = tmp_path_factory.mktemp("ingested")
    manifest = ingest.ingest_images(str(src), str(out))
    return str(out), manifest


def test_manifest_and_counts(ingested):
    out, m = ingested
    assert m["rows"] == 600
    assert len(m["inputs"]) == 2
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["input_fingerprint"] == m["input_fingerprint"]


def test_data_table_cell_partitioned(ingested):
    out, _ = ingested
    tab = storage.ParquetTable(os.path.join(out, "data"), partition_col="cell_verylow")
    parts = tab.partitions()
    assert len(parts) > 3
    total = sum(tab.count_partition(p) for p in parts)
    assert total == 600
    one = tab.scan_partition(parts[0]).to_pandas()
    assert {"image_id", "bytes", "caption"} <= set(one.columns)


def test_mapping_table_roundtrip(ingested):
    out, _ = ingested
    maps = pq.read_table(glob.glob(os.path.join(out, "mappings", "*.parquet"))[0])
    assert maps.column_names == ["image_id", "cell_low", "cell_verylow"]
    # coarse cell is the prefix of the fine cell
    import numpy as np

    assert np.array_equal(maps["cell_low"].to_numpy() >> 4, maps["cell_verylow"].to_numpy())


def test_caption_index_searchable(ingested):
    out, _ = ingested
    idx = pq.read_table(os.path.join(out, "index"))
    # every image is reachable via its district/countryside token
    assert len(set(idx["image_id"].to_pylist())) == 600
    toks = set(idx["token"].to_pylist())
    assert "photo" in toks and "a" in toks


def test_tile_counts_sum_to_rows(ingested):
    out, _ = ingested
    tiles = pq.read_table(os.path.join(out, "tiles")).to_pandas()
    for z, g in tiles.groupby("z"):
        assert g["n_images"].sum() == 600, z


def test_rerun_is_idempotent(ray_session, ingested):
    """Re-running on the same inputs skips (fingerprint match) — a
    naive re-run would APPEND parquet files and duplicate every row."""
    out, m = ingested
    import glob as g

    src = os.path.dirname(m["inputs"][0])
    m2 = ingest.ingest_images(src, out)
    assert m2.get("skipped") is True
    data = pq.read_table(os.path.join(out, "data"), columns=["image_id"])
    assert data.num_rows == 600


def test_ingest_plan_has_no_materialize():
    """Round-3 regression guard: the four ingest sinks are four pruned
    STREAMING passes; pinning the whole payload dataset in the object
    store (`.materialize()`) was the round-2 scale-killer."""
    import inspect

    from plasmap_ray.pipelines import ingest

    src = inspect.getsource(ingest.ingest_images)
    code_lines = [ln.split("#", 1)[0] for ln in src.splitlines()]
    assert not any(".materialize()" in ln for ln in code_lines)
