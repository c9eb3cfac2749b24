"""Driver-mimic oracle checker: run every ``queries()`` entry AND its
``oracle_sql()`` mirror at sf0.01 and compare rows / schema / values
the way the round driver does (columns sorted by name, rows sorted,
dtype-sensitive value equality).

Usage:
    python tools/oracle_check.py [--jobs N] [query ...]   # default: all queries
Environment: RAY_GRAFT_CPUS (default 8), GRAFT_SF_DIR (default sf0.01).

``--jobs N`` runs N queries concurrently (threads over ONE shared Ray
session; each thread gets its own DuckDB cursor).  Ray Data pipelines
from different threads interleave their stages on the same CPU pool,
which recovers the scheduling gaps a serial sweep leaves idle — the
full-surface sweep is itself a pipeline (VERDICT r3 directive 6).
Every result entry records its own ``wall_s``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> dict:
    out = {
        "rows_match": len(got) == len(exp),
        "schema_match": sorted(got.columns) == sorted(exp.columns),
        "hash_match": None,
        "err": None,
    }
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        out["err"] = f"rows {len(got)} vs {len(exp)}; cols {sorted(got.columns)} vs {sorted(exp.columns)}"
        return out
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        fg = np.issubdtype(gv.dtype, np.floating)
        fe = np.issubdtype(ev.dtype, np.floating)
        if fg != fe and not (
            np.issubdtype(gv.dtype, np.number) and np.issubdtype(ev.dtype, np.number)
        ):
            out["hash_match"] = False
            out["err"] = f"col {c}: dtype {gv.dtype} vs {ev.dtype}"
            return out
        if fg != fe:  # int-vs-float value artifact (the sessionize class of bug)
            out["hash_match"] = False
            out["err"] = f"col {c}: numeric dtype mismatch {gv.dtype} vs {ev.dtype}"
            return out
        eq = (
            np.array_equal(gv, ev)
            if not fg
            else bool(np.allclose(gv, ev, rtol=0, atol=0, equal_nan=True))
        )
        if not eq:
            bad = np.nonzero(~(gv == ev) if not fg else ~np.isclose(gv, ev, rtol=0, atol=0, equal_nan=True))[0][:3]
            out["hash_match"] = False
            out["err"] = f"col {c}: first diffs at {bad.tolist()}: {gv[bad]!r} vs {ev[bad]!r}"
            return out
    out["hash_match"] = True
    return out


def _stub_fsspec_http() -> None:
    """Ray Data probes ``fsspec.implementations.http`` on EVERY read
    (path_util._is_http_filesystem).  In this container aiohttp is
    absent, so the import fails — and a FAILED import retried from many
    threads at once races in importlib (thread B can observe the
    half-torn module and die with 'cannot import name HTTPFileSystem',
    an ImportError the caller's ModuleNotFoundError guard misses).
    Pre-seeding a stub module makes the probe a cheap, thread-safe
    attribute lookup that correctly answers 'not an HTTP filesystem'."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401 — real one wins if present
        return
    except Exception:
        pass

    class _NeverHTTPFileSystem:  # isinstance() is always False for real fs objects
        pass

    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = _NeverHTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def main() -> int:
    import ray

    _stub_fsspec_http()
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, sqls = entry.queries(), entry.oracle_sql()
    argv = sys.argv[1:]
    jobs = 1
    if "--jobs" in argv:
        i = argv.index("--jobs")
        jobs = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    names = argv or sorted(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    sweep_t0 = time.time()
    results: dict[str, dict] = {}

    def run_one(name: str) -> tuple[str, dict, str]:
        t0 = time.time()
        try:
            got = to_pandas(qs[name](SF))
            if name not in sqls:
                res = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "no_oracle"}
                status = f"NO_ORACLE ({len(got)} rows)"
            else:
                exp = con.cursor().execute(sqls[name]).fetchdf()
                res = compare(got, exp)
                status = "PASS" if res["hash_match"] else f"FAIL {res['err']}"
        except Exception as ex:  # noqa: BLE001
            res = {"rows_match": False, "schema_match": False, "hash_match": False, "err": repr(ex)[:400]}
            status = f"ERROR {repr(ex)[:200]}"
        res["wall_s"] = round(time.time() - t0, 2)
        return name, res, status

    if jobs <= 1:
        for name in names:
            name, res, status = run_one(name)
            results[name] = res
            print(f"{name:32s} {status}   [{res['wall_s']:.1f}s]", flush=True)
    else:
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=jobs) as pool:
            for name, res, status in pool.map(run_one, names):
                results[name] = res
                print(f"{name:32s} {status}   [{res['wall_s']:.1f}s]", flush=True)

    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_fail = sum(1 for r in results.values() if r["hash_match"] is False)
    results["_meta"] = {
        "sf_dir": SF,
        "jobs": jobs,
        "n_queries": len(names),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "sweep_wall_s": round(time.time() - sweep_t0, 1),
    }
    out_path = os.environ.get("ORACLE_CHECK_OUT", "/tmp/oracle_check.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total "
          f"in {results['_meta']['sweep_wall_s']}s (jobs={jobs}) -> {out_path}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
