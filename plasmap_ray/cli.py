"""CLI entry points — the WSServer/ray-job-submit stand-in (S13).

The reference serves queries over a WebSocket (WSServer.scala:43-79:
JSON AST in, GeoJSON out).  The batch engine's serving surface is a
CLI suitable for ``ray job submit``:

    python -m plasmap_ray.cli query '<AST json>' [--sf-dir DIR] [--geojson]
    python -m plasmap_ray.cli tile  IMAGES_DIR OUT_DIR [--partitions N]
    python -m plasmap_ray.cli bench-images N

Owns its Ray session (guarded init + shutdown) per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    return ray


def cmd_query(args) -> int:
    import pyarrow as pa

    from . import fixtures, queryast
    from .sources import geojson

    _ray_session()
    q = queryast.from_json(args.ast)
    import numpy as np
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{args.sf_dir}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    points = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "lon": pa.array(fixtures.derive_lon(ids)),
            "lat": pa.array(fixtures.derive_lat(ids)),
        }
    )
    ctx = queryast.EngineContext(points=points)
    result = queryast.translate(q, ctx)
    if args.geojson and {"lon", "lat"} <= set(result.column_names):
        props = [
            {c: result[c][i].as_py() for c in result.column_names if c not in ("lon", "lat")}
            for i in range(result.num_rows)
        ]
        print(geojson.points_to_geojson(result["lon"].to_numpy(), result["lat"].to_numpy(), props))
    else:
        print(json.dumps(result.to_pydict(), default=str))
    return 0


def cmd_tile(args) -> int:
    from . import checkpoint

    _ray_session()
    stats = checkpoint.tiling_job(args.images_dir, args.out_dir, n_partitions=args.partitions)
    print(json.dumps(stats))
    return 0 if stats["complete"] else 3


def cmd_ingest(args) -> int:
    from .pipelines import ingest

    _ray_session()
    manifest = ingest.ingest_images(args.images_dir, args.out_root)
    print(json.dumps(manifest))
    return 0


def cmd_bench_images(args) -> int:
    import os

    os.environ.setdefault("RAY_GRAFT_CPUS", "8")
    _ray_session()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    path = bench.ensure_bench_images(args.n)
    print(json.dumps({"images_dir": path, "n": args.n}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="plasmap_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="execute a JSON query AST")
    q.add_argument("ast", help="AST JSON (see plasmap_ray.queryast)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--geojson", action="store_true", help="emit point results as GeoJSON")
    q.set_defaults(fn=cmd_query)

    t = sub.add_parser("tile", help="checkpointed tiling job (resumable)")
    t.add_argument("images_dir")
    t.add_argument("out_dir")
    t.add_argument("--partitions", type=int, default=16)
    t.set_defaults(fn=cmd_tile)

    i = sub.add_parser("ingest", help="full ingest fan-out: data/mappings/index/tiles")
    i.add_argument("images_dir")
    i.add_argument("out_root")
    i.set_defaults(fn=cmd_ingest)

    b = sub.add_parser("bench-images", help="generate the bench images table (under /tmp/plasmap_fixtures)")
    b.add_argument("n", type=int)
    b.set_defaults(fn=cmd_bench_images)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except (KeyError, ValueError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
