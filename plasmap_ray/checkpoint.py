"""Checkpointed, resumable partitioned execution (north-rule requirement).

The reference's resume story is Kafka consumer offsets per consumer
group (KafkaUtil.scala:40-41, KafkaTopics.scala:15-21): a killed stage
resumes from the last committed offset.  The batch-engine equivalent
(SURVEY.md §2.9) is a **partitioned output layout with per-partition
lineage manifests**:

    out_dir/
      part=00003/data.parquet       # the partition's output
      part=00003/manifest.json      # lineage: inputs, fingerprint,
                                    # row counts, checksum, wall time
      _final/...                    # merged result (written last)

Each partition is processed by its own (internally distributed) Ray
Data pipeline and committed ATOMICALLY: outputs land in a temp dir
that is renamed into place only after success, then the manifest is
written the same way.  A restarted job fingerprints its inputs, skips
every partition whose manifest matches, and reprocesses the rest —
resume-correct by construction (byte-identical final output, asserted
in tests/test_resume.py).

Partitions are INPUT shards (file groups), so lineage is explicit:
each manifest names exactly the files that produced it.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq


def input_fingerprint(files: list[str]) -> str:
    """Cheap, stable lineage fingerprint: path + size + mtime per file."""
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    return h.hexdigest()[:24]


def table_checksum(t: pa.Table) -> str:
    """Order-insensitive content checksum of a (small) result table."""
    rows = sorted(
        tuple(str(v) for v in row) for row in zip(*[t[c].to_pylist() for c in sorted(t.column_names)])
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()[:24]


def partition_files(files: list[str], n_partitions: int) -> list[list[str]]:
    files = sorted(files)
    return [files[p::n_partitions] for p in range(n_partitions)]


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def partition_is_complete(out_dir: str, part: int, fingerprint: str) -> bool:
    mf = os.path.join(_part_dir(out_dir, part), "manifest.json")
    if not os.path.exists(mf):
        return False
    try:
        with open(mf) as f:
            m = json.load(f)
        return m.get("input_fingerprint") == fingerprint and os.path.exists(
            os.path.join(_part_dir(out_dir, part), "data.parquet")
        )
    except (json.JSONDecodeError, OSError):
        return False


def run_partitioned(
    input_files: list[str],
    transform: Callable[[list[str]], pa.Table],
    out_dir: str,
    n_partitions: int = 16,
    max_partitions: int | None = None,
) -> dict:
    """Process input shards into checkpointed output partitions.

    ``transform(files) -> pa.Table`` runs one partition's pipeline (it
    may build any Ray Data DAG internally and must return the
    partition's materialized result — partition results are the SMALL
    per-partition aggregates/outputs, not raw data).

    ``max_partitions`` stops early after N newly-processed partitions —
    the test hook that simulates a mid-job kill.

    Returns run stats: processed / skipped partition lists + wall time.
    """
    os.makedirs(out_dir, exist_ok=True)
    shards = partition_files(input_files, n_partitions)
    processed: list[int] = []
    skipped: list[int] = []
    t_run = time.perf_counter()
    for part, files in enumerate(shards):
        if not files:
            skipped.append(part)
            continue
        fp = input_fingerprint(files)
        if partition_is_complete(out_dir, part, fp):
            skipped.append(part)
            continue
        if max_partitions is not None and len(processed) >= max_partitions:
            continue
        t0 = time.perf_counter()
        result = transform(files)
        pdir = _part_dir(out_dir, part)
        tmp = pdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(result, os.path.join(tmp, "data.parquet"))
        manifest = {
            "partition": part,
            "inputs": sorted(files),
            "input_fingerprint": fp,
            "rows": result.num_rows,
            "checksum": table_checksum(result),
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        if os.path.exists(pdir):
            shutil.rmtree(pdir)
        os.replace(tmp, pdir)  # atomic commit: data + manifest together
        processed.append(part)
    return {
        "processed": processed,
        "skipped": skipped,
        "n_partitions": n_partitions,
        "wall_s": round(time.perf_counter() - t_run, 3),
        "complete": len(processed) + len(skipped) == n_partitions,
    }


def read_all_partitions(out_dir: str) -> pa.Table:
    parts = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    if not parts:
        return pa.table({})
    return pa.concat_tables([pq.read_table(p) for p in parts])


def run_manifest(out_dir: str) -> list[dict]:
    """All partition manifests (the job's lineage + metrics record)."""
    out = []
    for mf in sorted(glob.glob(os.path.join(out_dir, "part=*", "manifest.json"))):
        with open(mf) as f:
            out.append(json.load(f))
    return out


# ---------------------------------------------------------------------------
# The checkpointed tiling job (north_rule: "resumes mid-tiling")
# ---------------------------------------------------------------------------


def tiling_job(images_dir: str, out_dir: str, n_partitions: int = 16, max_partitions: int | None = None, z: int = 10) -> dict:
    """Checkpointed image->tile aggregation over a partitioned images table.

    Each partition: read its parquet shard(s) -> fused image flagship
    (decode + fidelity + PiP + kNN + tile partial counts) -> per-
    partition tile counts committed atomically with lineage.  After all
    partitions: merge (groupby sum) into ``out_dir/_final/tiles.parquet``.
    """
    import functools

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from . import fixtures
    from .pipelines import spatial
    from .stages import geo

    idx_ref = spatial.boundary_index_ref()
    pois = fixtures.make_pois()
    pois_ref = ray.put({c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")})

    def transform(files: list[str]) -> pa.Table:
        ds = rd.read_parquet(files)
        partial = ds.map_batches(
            functools.partial(geo.fused_image_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, z=z),
            batch_format="pyarrow",
            batch_size=4096,
        )
        out = partial.groupby(["z", "x", "y", "rel_id"]).aggregate(Sum("n_images", alias_name="n_images"))
        return pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow", batch_size=65536)])

    files = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    stats = run_partitioned(files, transform, out_dir, n_partitions=n_partitions, max_partitions=max_partitions)
    if stats["complete"]:
        merged = read_all_partitions(out_dir)
        final = (
            rd.from_arrow(merged)
            .groupby(["z", "x", "y", "rel_id"])
            .aggregate(Sum("n_images", alias_name="n_images"))
        )
        fdir = os.path.join(out_dir, "_final")
        tmp = fdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        ft = pa.concat_tables([b for b in final.iter_batches(batch_format="pyarrow", batch_size=65536)])
        ft = ft.sort_by([("z", "ascending"), ("x", "ascending"), ("y", "ascending"), ("rel_id", "ascending")])
        pq.write_table(ft, os.path.join(tmp, "tiles.parquet"))
        if os.path.exists(fdir):
            shutil.rmtree(fdir)
        os.replace(tmp, fdir)
        stats["final"] = os.path.join(fdir, "tiles.parquet")
    return stats
