"""Ingest DAG: one job replacing the reference's Stage A+B fan-out.

The reference preprocesses with FOUR independent persister processes
hanging off a Kafka topic (SURVEY §3.2: MappingPersister, DataPersister,
DataByTagPersister, IndexPersister — processing/.../*Persister.scala),
coordinated by consumer groups.  The Ray Data rebuild is ONE DAG over
the images table that writes the same four outputs as partitioned
parquet:

    out/data/cell_verylow=<cell>/...   payload rows, cell-partitioned (S6)
    out/mappings/                      id -> (cell_low, cell_verylow)  (M6/S9)
    out/index/                         (token, image_id) inverted index (S11/M5)
    out/tiles/                         per-tile counts at the index zooms (A5)
    out/manifest.json                  row counts + lineage fingerprint (M10)

The Mongo round-trip disappears: the mapping table is just a Dataset;
the type-branching fan-out becomes partitioned writes.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

from .. import fixtures
from ..checkpoint import input_fingerprint
from ..stages import geo


def _with_position(batch: pa.Table) -> pa.Table:
    ids = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 16), pa.int64()).to_numpy()
    batch = batch.append_column("lon", pa.array(fixtures.derive_lon(ids), type=pa.float64()))
    return batch.append_column("lat", pa.array(fixtures.derive_lat(ids), type=pa.float64()))


def _caption_index(batch: pa.Table) -> pa.Table:
    """caption -> (token, image_id) rows, deduped per image (M5/S11)."""
    toks = pc.split_pattern(pc.utf8_lower(batch["caption"]), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy()
    ids = np.repeat(np.arange(batch.num_rows), lengths)
    image_ids = batch["image_id"].to_pylist()
    t = pa.table(
        {
            "token": pa.array(toks.flatten().to_pylist(), type=pa.string()),
            "image_id": pa.array([image_ids[i] for i in ids], type=pa.string()),
        }
    )
    return t.group_by(["token", "image_id"]).aggregate([]).select(["token", "image_id"])


def ingest_images(images_dir: str, out_root: str, zooms: tuple[int, ...] = (6, 10, 14)) -> dict:
    """Run the full ingest fan-out; returns the manifest dict.

    Idempotent: if ``out_root/manifest.json`` matches the input
    fingerprint the run is a no-op; otherwise stale outputs are removed
    first (parquet writes APPEND files into an existing directory,
    which would silently duplicate rows)."""
    import shutil

    t0 = time.perf_counter()
    files = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    fp = input_fingerprint(files)
    mf_path = os.path.join(out_root, "manifest.json")
    if os.path.exists(mf_path):
        with open(mf_path) as f:
            old = json.load(f)
        if old.get("input_fingerprint") == fp:
            old["skipped"] = True
            return old
    # invalidate the manifest BEFORE touching outputs: a crash mid-delete
    # must never leave a manifest whose fingerprint matches intact-looking
    # but missing outputs (resume would skip the rebuild)
    if os.path.exists(mf_path):
        os.remove(mf_path)
    for sub in ("data", "mappings", "index", "tiles"):
        shutil.rmtree(os.path.join(out_root, sub), ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)

    # Four sinks = four independent STREAMING passes, each pruned to the
    # columns it needs at the read.  The wide `bytes` payload column
    # leaves storage exactly ONCE (the data sink); the metadata-only
    # sinks re-scan a few string/int columns, which parquet column
    # pruning makes ~free.  No `.materialize()`: at 100 TB pinning the
    # payload dataset in the object store to share it across sinks is
    # an object-store-wide spill, and re-reading pruned columns is far
    # cheaper than re-reading (or spilling) `bytes`.

    def _positioned(columns):
        return rd.read_parquet(files, columns=columns).map_batches(_with_position, batch_format="pyarrow")

    # 1) data table: cell-partitioned payload rows (S6 cell-keyed layout).
    #    The only pass that touches `bytes`.
    data_dir = os.path.join(out_root, "data")
    _positioned(None).map_batches(geo.cell_index, batch_format="pyarrow").write_parquet(
        data_dir, partition_cols=["cell_verylow"]
    )

    # 2) mapping table: id -> principal cells (M6; the shared index that
    #    was MongoDB in the reference is now just a table)
    map_dir = os.path.join(out_root, "mappings")
    (
        _positioned(["image_id"])
        .map_batches(geo.cell_index, batch_format="pyarrow")
        .select_columns(["image_id", "cell_low", "cell_verylow"])
        .write_parquet(map_dir)
    )

    # 3) inverted caption index (S11/M5)
    idx_dir = os.path.join(out_root, "index")
    (
        rd.read_parquet(files, columns=["image_id", "caption"])
        .map_batches(_caption_index, batch_format="pyarrow")
        .write_parquet(idx_dir)
    )

    # 4) per-tile counts at the index zooms (A5, combiner + tiny groupby)
    import functools

    tiles_dir = os.path.join(out_root, "tiles")
    (
        _positioned(["image_id"])
        .map_batches(functools.partial(geo.tile_count_partial, zooms=zooms), batch_format="pyarrow")
        .groupby(["z", "x", "y"])
        .aggregate(Sum("n_images", alias_name="n_images"))
        .write_parquet(tiles_dir)
    )

    # row count from parquet footers only — no data read
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    manifest = {
        "inputs": files,
        "input_fingerprint": fp,
        "rows": int(n_rows),
        "outputs": {
            "data": data_dir,
            "mappings": map_dir,
            "index": idx_dir,
            "tiles": tiles_dir,
        },
        "wall_s": round(time.perf_counter() - t0, 3),
    }
    with open(os.path.join(out_root, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
