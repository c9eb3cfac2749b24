"""Checkpoint/resume: killed mid-tiling -> resume -> byte-identical output.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics"; FIXTURES.md §6 test_resume.
"""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from plasmap_ray import checkpoint, fixtures


@pytest.fixture(scope="module")
def images_dir(ray_session, tmp_path_factory):
    """A small partitioned images table (8 parquet shards)."""
    root = tmp_path_factory.mktemp("imgshards")
    t = fixtures.make_images(800, size_choices=(16,))
    for p in range(8):
        pq.write_table(t.slice(p * 100, 100), os.path.join(root, f"shard-{p}.parquet"))
    return str(root)


def test_kill_resume_identical(ray_session, images_dir, tmp_path):
    out_a = str(tmp_path / "run_a")
    out_b = str(tmp_path / "run_b")

    # single-shot reference run
    stats = checkpoint.tiling_job(images_dir, out_a, n_partitions=4)
    assert stats["complete"] and len(stats["processed"]) == 4
    ref = pq.read_table(os.path.join(out_a, "_final", "tiles.parquet"))

    # killed run: only 2 partitions complete
    stats1 = checkpoint.tiling_job(images_dir, out_b, n_partitions=4, max_partitions=2)
    assert not stats1["complete"]
    assert len(stats1["processed"]) == 2
    assert not os.path.exists(os.path.join(out_b, "_final"))

    # resume: remaining partitions processed, completed ones skipped
    stats2 = checkpoint.tiling_job(images_dir, out_b, n_partitions=4)
    assert stats2["complete"]
    assert sorted(stats2["skipped"]) == sorted(stats1["processed"])
    assert len(stats2["processed"]) == 2

    got = pq.read_table(os.path.join(out_b, "_final", "tiles.parquet"))
    assert got.equals(ref), "resumed output differs from single-shot run"


def test_manifest_lineage_and_metrics(ray_session, images_dir, tmp_path):
    out = str(tmp_path / "run_m")
    checkpoint.tiling_job(images_dir, out, n_partitions=4)
    manifests = checkpoint.run_manifest(out)
    assert len(manifests) == 4
    seen_inputs: set[str] = set()
    for m in manifests:
        assert m["rows"] > 0
        assert m["wall_s"] >= 0
        assert len(m["input_fingerprint"]) == 24
        assert len(m["checksum"]) == 24
        assert m["inputs"], "manifest must name its input files (lineage)"
        seen_inputs.update(m["inputs"])
    # every input shard is covered by exactly one partition
    all_files = set(glob.glob(os.path.join(images_dir, "*.parquet")))
    assert seen_inputs == all_files


def test_input_change_invalidates_partition(ray_session, images_dir, tmp_path):
    out = str(tmp_path / "run_c")
    src = str(tmp_path / "src")
    shutil.copytree(images_dir, src)
    checkpoint.tiling_job(src, out, n_partitions=4)

    # touch one shard: its partition must recompute, others skip
    victim = sorted(glob.glob(os.path.join(src, "*.parquet")))[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, 50), victim)  # content change
    stats = checkpoint.tiling_job(src, out, n_partitions=4)
    assert len(stats["processed"]) == 1
    assert len(stats["skipped"]) == 3


def test_atomic_commit_no_partials(ray_session, images_dir, tmp_path):
    """A partition dir either exists completely (data+manifest) or not
    at all — no .tmp leftovers after a successful run."""
    out = str(tmp_path / "run_t")
    checkpoint.tiling_job(images_dir, out, n_partitions=4)
    for pdir in glob.glob(os.path.join(out, "part=*")):
        assert not pdir.endswith(".tmp")
        assert os.path.exists(os.path.join(pdir, "data.parquet"))
        assert os.path.exists(os.path.join(pdir, "manifest.json"))
        with open(os.path.join(pdir, "manifest.json")) as f:
            json.load(f)
    assert not glob.glob(os.path.join(out, "*.tmp"))


def test_task_retry_after_worker_crash_is_exact(ray_session, tmp_path):
    """Mid-pipeline worker death -> Ray retries the task and the result
    is EXACTLY what an undisturbed run produces (kernels are pure
    functions of their batch, so task retries are idempotent — the
    property that makes lineage-based recovery safe at cluster scale)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    sentinel = str(tmp_path / "crashed_once")

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy()
        return pa.table({"id": pa.array(ids), "sq": pa.array(ids.astype(np.int64) ** 2)})

    def crashy(t: pa.Table) -> pa.Table:
        if not os.path.exists(sentinel):
            with open(sentinel, "w") as f:
                f.write("x")
            os._exit(1)  # hard worker death, not an exception
        return kernel(t)

    want = sorted(r["sq"] for r in rd.range(5000, override_num_blocks=8).map_batches(kernel, batch_format="pyarrow").take_all())
    got = sorted(r["sq"] for r in rd.range(5000, override_num_blocks=8).map_batches(crashy, batch_format="pyarrow").take_all())
    assert os.path.exists(sentinel)  # the crash really happened
    assert got == want


def _canon_table(path: str):
    import pandas as pd  # noqa: F401

    t = pq.read_table(path)
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype) == "category":  # hive partition cols
            df[c] = df[c].astype(str)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(hash)  # payload bytes: compare by hash
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _kill_first_busy_worker(stop, killed):
    """Poll /proc for a Ray worker actively running a task (process
    title "ray::<Task>"; skip ray::IDLE) and SIGKILL the first one
    seen — an OS-level kill from OUTSIDE the process, the way a
    preempted or failed node dies."""
    import os
    import signal
    import time

    while not stop.is_set():
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode(errors="replace")
            except OSError:
                continue
            if cmd.startswith("ray::") and not cmd.startswith("ray::IDLE"):
                try:
                    os.kill(int(pid), signal.SIGKILL)
                except OSError:
                    continue
                killed["pid"] = int(pid)
                return
        time.sleep(0.02)


def test_worker_sigkill_mid_ingest_is_exact(ray_session, images_dir, tmp_path):
    """VERDICT r3 directive 5: SIGKILL a Ray WORKER PROCESS while
    ingest_images is streaming, and assert the job still completes with
    output tables content-identical to an undisturbed run — the task
    retry discipline that makes lineage recovery safe when a node dies
    mid-job at cluster scale.  (test_task_retry_after_worker_crash
    covers an in-task os._exit; this kills the OS process from OUTSIDE,
    the way a preempted node does.)"""
    import os
    import signal
    import threading
    import time

    from plasmap_ray.pipelines import ingest

    out_a = str(tmp_path / "undisturbed")
    out_b = str(tmp_path / "killed")

    ref = ingest.ingest_images(images_dir, out_a)
    assert ref["rows"] == 800

    killed = {"pid": None}
    stop = threading.Event()
    th = threading.Thread(target=_kill_first_busy_worker, args=(stop, killed))
    th.start()
    try:
        got = ingest.ingest_images(images_dir, out_b)
    finally:
        stop.set()
        th.join(10)

    assert killed["pid"] is not None, "no busy ray:: worker appeared to kill"
    assert got["rows"] == ref["rows"]
    for sub in ("data", "mappings", "index", "tiles"):
        a = _canon_table(os.path.join(out_a, sub))
        b = _canon_table(os.path.join(out_b, sub))
        assert a.equals(b), f"{sub} differs after worker SIGKILL"


def test_worker_sigkill_mid_shuffle_is_exact(ray_session):
    """VERDICT r4 directive 5: SIGKILL a worker process while a SHUFFLE
    pipeline (tile_histogram: map partials -> groupby exchange ->
    roll-up union) is executing, and assert the output is row-for-row
    identical to an undisturbed run.  The mid-ingest sibling above
    covers map-only + sinks; the riskier 100x-scale recovery path is a
    worker dying mid-exchange, where Ray must reconstruct lost shuffle
    blocks from lineage."""
    import threading

    from plasmap_ray.pipelines import spatial

    sf = "/root/testdata/sf0.01"

    def run():
        df = spatial.tile_histogram_pipeline(sf).to_pandas()
        return df.sort_values(["z", "x", "y"]).reset_index(drop=True)

    ref = run()
    assert len(ref) > 0

    killed = {"pid": None}
    stop = threading.Event()
    th = threading.Thread(target=_kill_first_busy_worker, args=(stop, killed))
    th.start()
    try:
        got = run()
    finally:
        stop.set()
        th.join(10)

    assert killed["pid"] is not None, "no busy ray:: worker appeared to kill"
    assert got.equals(ref), "tile_histogram output differs after worker SIGKILL mid-shuffle"
