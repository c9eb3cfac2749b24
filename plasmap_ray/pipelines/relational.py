"""Relational pipelines: grouped reduces, equi-joins, per-group top-k.

Rebuilds of the reference's generic stream combinators over tabular
inputs: ``reduceByKey`` (A1, util/streams/Utilities.scala:11-20),
lookup equi-joins (J1/J2 shape, WayFlow/RelationFlow) and per-group
fold/top-k (A2).  All shuffles are Ray Data groupby/join; float outputs
are rounded to fixed decimals in BOTH engines before compare (sum order
is engine-dependent; rounding removes ulp noise).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.common import cast_columns as _cast_cols
from ..stages.common import duckdb_round
from ..stages.common import safe_join


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# Per-worker ceiling for a broadcast dimension lookup.  TPC-H dims grow
# WITH the fact table (supplier = SF x 10k rows, part = SF x 200k), so
# "it's a dimension" is not a broadcast licence at the 10^12-row design
# point — the planner reads the pruned columns' byte size from parquet
# FOOTERS (no data read) and flips to a hash join above the ceiling,
# the ``pip_join_auto`` / ``knn_pois_auto`` physical-choice discipline.
DIM_BROADCAST_MAX_BYTES = 64 << 20


def dim_bytes(sf_dir: str, table: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte size of the pruned dimension columns, from
    parquet footer metadata only — the planner's sizing statistic."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for c in range(g.num_columns):
            col = g.column(c)
            if columns is None or col.path_in_schema in columns:
                total += col.total_uncompressed_size
    return total


def dim_strategy(
    sf_dir: str, table: str, columns: list[str] | None = None, max_bytes: int = DIM_BROADCAST_MAX_BYTES
) -> str:
    """'broadcast' while the pruned dim fits a per-worker lookup,
    else 'shuffle' (hash join).  Both plans are oracle-identical —
    the choice is purely physical."""
    return "broadcast" if dim_bytes(sf_dir, table, columns) <= max_bytes else "shuffle"


from ..stages.common import round_columns as _round_cols  # noqa: E402


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-flavoured grouped reduce over lineitem (A1).

    Demonstrates partial aggregation: revenue computed per batch
    (vectorized), then a small groupby over (returnflag, linestatus).
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(add_revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="n_rows"),
        )
    )
    return out.map_batches(
        functools.partial(_round_cols, cols=("sum_qty", "sum_revenue"), ndigits=2), batch_format="pyarrow"
    ).map_batches(functools.partial(_round_cols, cols=("avg_disc",), ndigits=6), batch_format="pyarrow")


def orders_by_nation(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer ⋈ nation -> per-nation order counts + revenue.

    The J1/J2 equi-join shape (id lookups become hash joins).  The two
    dimension tables are small: Ray's hash join is used for the big
    side once, the nation attach is a second join over the already
    aggregated (25-row) side — join placement mirrors broadcast logic.
    """
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = safe_join(orders, cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    per_nation = joined.groupby("c_nationkey").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_revenue")
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        functools.partial(_cast_cols, casts={"n_nationkey": pa.int64()}), batch_format="pyarrow"
    )
    out = safe_join(per_nation, nation, join_type="inner", num_partitions=2, on=("c_nationkey",), right_on=("n_nationkey",))
    return out.select_columns(["n_name", "n_orders", "total_revenue"]).map_batches(
        functools.partial(_round_cols, cols=("total_revenue",), ndigits=2), batch_format="pyarrow"
    )


def topk_orders_per_customer(sf_dir: str, k: int = 2) -> rd.Dataset:
    """Per-group top-k (A2/§2.6): k highest-value orders per customer,
    ties broken by orderkey — groupby().map_groups with vectorized sort."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def topk(g, k=k):
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["order_rank"] = range(1, len(g) + 1)
        return g

    out = orders.groupby("o_custkey").map_groups(topk, batch_format="pandas")
    return out.map_batches(
        functools.partial(_round_cols, cols=("o_totalprice",), ndigits=2), batch_format="pyarrow"
    )


def filtered_stats(sf_dir: str) -> rd.Dataset:
    """Predicate-pushdown scan + scalar stats (counters S8/A3 analogue):
    per-brand part stats over a filtered read."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_brand", "p_size", "p_retailprice"],
        filter=(pc.field("p_size") >= 20),
    )
    out = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"),
    )
    return out.map_batches(
        functools.partial(_round_cols, cols=("min_price", "max_price"), ndigits=2), batch_format="pyarrow"
    )


def top_unshipped_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> rd.Dataset:
    """TPC-H Q3 shape: three-way join + filtered aggregate + global
    top-k.  customer(segment) ⋈ orders(date<cut) ⋈ lineitem(ship>cut)
    -> revenue per order -> top k by (revenue desc, orderdate).
    """
    cut = "1995-03-15"
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr=f"c_mktsegment == '{segment}'"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def date_filter_orders(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["o_orderdate"], pa.scalar(np.datetime64(cut, "us"))))

    orders = orders.map_batches(date_filter_orders, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_filter_revenue(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(np.datetime64(cut, "us"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev).select(["l_orderkey", "revenue"])

    li = li.map_batches(li_filter_revenue, batch_format="pyarrow")
    oc = safe_join(orders, cust, join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",))
    j = safe_join(li, 
        oc.select_columns(["o_orderkey", "o_orderdate"]),
        join_type="inner",
        num_partitions=4,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = j.groupby(["l_orderkey", "o_orderdate"]).aggregate(Sum("revenue", alias_name="revenue"))
    top = agg.sort(["revenue", "o_orderdate", "l_orderkey"], descending=[True, False, False]).limit(k)
    return top.map_batches(functools.partial(_round_cols, cols=("revenue",), ndigits=2), batch_format="pyarrow")


def customer_high_value_counts(sf_dir: str, threshold: float = 400_000.0) -> rd.Dataset:
    """LEFT OUTER join with null->0 coalesce: every customer with their
    count of high-value orders (zero preserved — the 'keep and mark'
    alternative to the reference's drop-misses inner joins)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr=f"o_totalprice > {threshold}"
    )
    per_cust = orders.groupby("o_custkey").aggregate(Count(alias_name="n_high"))
    j = safe_join(cust, per_cust, join_type="left_outer", num_partitions=4, on=("c_custkey",), right_on=("o_custkey",))

    def coalesce(t: pa.Table) -> pa.Table:
        n = pc.coalesce(pc.cast(t["n_high"], pa.int64()), pa.scalar(0, type=pa.int64()))
        return t.select(["c_custkey", "c_name"]).append_column("n_high", n)

    return j.map_batches(coalesce, batch_format="pyarrow")


def local_supplier_volume(sf_dir: str, region: str = "ASIA", year: int = 1996) -> rd.Dataset:
    """TPC-H Q5 shape: the six-table join — revenue by nation where the
    ordering customer and the line's supplier share a nation, customers
    restricted to one region, orders to one year.

    Join planning (the 100-TB shapes): region ⋈ nation collapses to a
    BROADCAST dict (both tables are bounded small-side lookups — no
    shuffle); customer/orders/lineitem/supplier are hash joins keyed on
    their FKs with filters pushed to the reads.  The same-nation
    predicate (c_nationkey == s_nationkey) applies AFTER the supplier
    join, as a stateless filter.  Output: (n_name, revenue) sorted by
    revenue desc.
    """
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"])
    name_of = {
        int(r.n_nationkey): r.n_name for r in nat.itertuples() if r.n_regionkey in rkeys
    }
    keys = ",".join(str(k) for k in sorted(name_of)) or "-1"

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).filter(
        expr=f"c_nationkey in [{keys}]"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def year_filter(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"))
        hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)))
        return t.select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(year_filter, batch_format="pyarrow")
    oc = safe_join(orders, cust, join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def add_revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.select(["l_orderkey", "l_suppkey"]).append_column("revenue", rev)

    li = li.map_batches(add_revenue, batch_format="pyarrow")
    j = safe_join(li, 
        oc.select_columns(["o_orderkey", "c_nationkey"]),
        join_type="inner",
        num_partitions=4,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).filter(
        expr=f"s_nationkey in [{keys}]"
    )
    j2 = safe_join(j, supp, join_type="inner", num_partitions=4, on=("l_suppkey",), right_on=("s_suppkey",))
    j2 = j2.filter(expr="c_nationkey == s_nationkey")

    def name_nation(t: pa.Table) -> pa.Table:
        nk = t["s_nationkey"].to_numpy()
        names = pa.array([name_of[int(k)] for k in nk], type=pa.string())
        return pa.table({"n_name": names, "revenue": t["revenue"]})

    out = (
        j2.map_batches(name_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .sort("revenue", descending=True)
    )
    return out.map_batches(functools.partial(_round_cols, cols=("revenue",), ndigits=2), batch_format="pyarrow")


def part_price_stats(sf_dir: str) -> rd.Dataset:
    """Mean/Std aggregate family per part type (sample stddev, ddof=1 —
    matches SQL stddev_samp; rounded identically in both engines)."""
    from ray.data.aggregate import Std

    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])
    out = ds.groupby("p_type").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
        Std("p_retailprice", alias_name="std_price"),
    )
    return out.map_batches(
        functools.partial(_round_cols, cols=("avg_price", "std_price"), ndigits=4), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# skyline (multi-criteria dominance filter)
# ---------------------------------------------------------------------------


def _local_skyline(t: pa.Table, max_col: str, min_col: str) -> pa.Table:
    """Vectorized 2-D skyline: rows not strictly dominated by any other
    row in ``t`` (dominance = >= on max_col, <= on min_col, strict on
    at least one).  Rows tied on BOTH coordinates all survive."""
    if t.num_rows == 0:
        return t
    hi = t[max_col].to_numpy()
    lo = t[min_col].to_numpy()
    order = np.lexsort((lo, -hi))  # max_col desc, min_col asc
    hi_s, lo_s = hi[order], lo[order]
    new_grp = np.concatenate([[True], hi_s[1:] != hi_s[:-1]])
    gid = np.cumsum(new_grp) - 1
    gmin = lo_s[new_grp]  # per-group min (first row: min_col asc within group)
    prev_best = np.concatenate([[np.inf], np.minimum.accumulate(gmin)[:-1]])
    grp_alive = gmin < prev_best
    keep = grp_alive[gid] & (lo_s == gmin[gid])
    return t.take(pa.array(order[keep], type=pa.int64()))


def skyline_parts(sf_dir: str) -> rd.Dataset:
    """Pareto skyline of the part table: parts for which no other part
    has retail price >= AND size <= (strict on one) — the classic
    multi-criteria dominance query ("cheapest-to-carry, priciest"
    frontier).  The reference has no analogue; a data engine's
    recommendation/index-pruning layer wants it.

    Scale shape: the skyline operator admits a perfect combiner —
    skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B) — so each batch reduces
    to its local frontier map-side (typically O(log n) survivors on
    independent dimensions) and only frontiers shuffle to the final
    single-task merge.  For adversarial anti-correlated inputs whose
    global skyline is itself huge, insert intermediate repartition
    rounds (frontier-of-frontiers is associative); the fixture world
    terminates in one.

    Output: (p_partkey, p_size, p_retailprice).
    """
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def local(t: pa.Table) -> pa.Table:
        return _local_skyline(t, "p_retailprice", "p_size")

    return ds.map_batches(local, batch_format="pyarrow").repartition(1).map_batches(
        local, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Q7/Q10/Q14/Q18/Q4-shaped join-aggregate pipelines (round 2): each one
# exercises a distinct distributed-join discipline over the fixture
# TPC-H tables — cross-nation volume (two selective dimension filters +
# fact-fact join), top-k revenue with deterministic tiebreak, single-row
# ratio aggregate, HAVING-filtered group join-back, and a distinct
# semi-join.  All reuse the A1/J1 shapes (util/streams/Utilities.scala:
# 11-20, WayFlow.scala:36) over relational inputs.
# ---------------------------------------------------------------------------


def nation_trade_volume(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    y0: int = 1996,
    y1: int = 1997,
    dim_max_bytes: int = DIM_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """TPC-H Q7 shape: shipped revenue between two nations by direction
    and ship year — customer in one nation, supplier in the other.

    Scale plan: the two-nation slices of supplier and customer are
    ~8% of their tables — SF-proportional, so both attaches are
    SIZE-GUARDED via ``dim_strategy`` (sized on the FULL pruned dim,
    a conservative over-estimate of the slice): broadcast sorted-key
    lookups while the pruned columns fit ``dim_max_bytes``,
    distributed hash joins (``safe_join``) above.  lineitem is
    date-pruned at the read boundary; the one always-present exchange
    is the fact-fact hash join on orderkey.  Both physical plans are
    oracle-identical.  Output: (supp_nation, cust_nation, l_year,
    revenue).
    """
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()  # bounded: nation = 25 rows (fixed)
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    keys = sorted(int(k) for k, v in name_of.items() if v in (nation_a, nation_b))
    key_list = ",".join(str(k) for k in keys)

    def _empty() -> pa.Table:
        # no supplier/customer in the two nations: empty result, returned
        # as a pa.Table so the schema survives (an all-empty join side
        # loses its schema inside Ray's hash join, and an empty Dataset
        # loses its schema in to_pandas)
        return pa.table(
            {
                "supp_nation": pa.array([], type=pa.string()),
                "cust_nation": pa.array([], type=pa.string()),
                "l_year": pa.array([], type=pa.int64()),
                "revenue": pa.array([], type=pa.float64()),
            }
        )

    if not keys:
        return _empty()

    supp_cols = ["s_suppkey", "s_nationkey"]
    cust_cols = ["c_custkey", "c_nationkey"]
    s_bcast = dim_strategy(sf_dir, "supplier", supp_cols, dim_max_bytes) == "broadcast"
    c_bcast = dim_strategy(sf_dir, "customer", cust_cols, dim_max_bytes) == "broadcast"

    def _dim(table: str, cols: list[str], key_col: str, filt: str) -> tuple[np.ndarray, np.ndarray]:
        df = _read(sf_dir, table, cols).filter(expr=filt).to_pandas()  # bounded: dim_strategy-guarded broadcast branch (caller)
        if len(df) == 0:  # an empty Dataset drops its schema in to_pandas
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        df = df.sort_values(key_col)
        return df[cols[0]].to_numpy(dtype=np.int64), df[cols[1]].to_numpy(dtype=np.int64)

    def _lookup(vals: np.ndarray, keys_arr: np.ndarray, out_arr: np.ndarray):
        """vals -> (mask, out) via sorted-key binary search (semi-join +
        attach in one vectorized pass; misses masked out)."""
        if len(keys_arr) == 0:
            return np.zeros(len(vals), dtype=bool), np.empty(0, dtype=np.int64)
        idx = np.searchsorted(keys_arr, vals)
        idx_c = np.minimum(idx, len(keys_arr) - 1)
        mask = keys_arr[idx_c] == vals
        return mask, out_arr[idx_c[mask]]

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    if c_bcast:
        c_keys, c_nat = _dim("customer", cust_cols, "c_custkey", f"c_nationkey in [{key_list}]")
        if len(c_keys) == 0:
            return _empty()

        def attach_cust(t: pa.Table) -> pa.Table:
            mask, nk = _lookup(t["o_custkey"].to_numpy().astype(np.int64), c_keys, c_nat)
            return pa.table(
                {
                    "o_orderkey": pa.array(t["o_orderkey"].to_numpy()[mask]),
                    "c_nationkey": pa.array(nk, type=pa.int64()),
                }
            )

        oc = orders.map_batches(attach_cust, batch_format="pyarrow")
    else:
        cust_ds = _read(sf_dir, "customer", cust_cols).filter(expr=f"c_nationkey in [{key_list}]")
        if cust_ds.limit(1).count() == 0:
            return _empty()
        oc = safe_join(
            orders, cust_ds, join_type="inner", num_partitions=4,
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "c_nationkey"]).map_batches(
            functools.partial(_cast_cols, casts={"c_nationkey": pa.int64()}), batch_format="pyarrow"
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def date_rev(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(f"{y0}-01-01", "us"))
        hi = pa.scalar(np.datetime64(f"{y1 + 1}-01-01", "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        year = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "revenue": pc.cast(rev, pa.float64()),
            "l_year": year,
        })

    if s_bcast:
        s_keys, s_nat = _dim("supplier", supp_cols, "s_suppkey", f"s_nationkey in [{key_list}]")
        if len(s_keys) == 0:
            return _empty()

        def attach_supp(t: pa.Table) -> pa.Table:
            t = date_rev(t)
            mask, nk = _lookup(t["l_suppkey"].to_numpy().astype(np.int64), s_keys, s_nat)
            return pa.table(
                {
                    "l_orderkey": pa.array(t["l_orderkey"].to_numpy()[mask]),
                    "s_nationkey": pa.array(nk, type=pa.int64()),
                    "revenue": pa.array(t["revenue"].to_numpy()[mask], type=pa.float64()),
                    "l_year": pa.array(t["l_year"].to_numpy()[mask], type=pa.int64()),
                }
            )

        li = li.map_batches(attach_supp, batch_format="pyarrow")
    else:
        supp_ds = _read(sf_dir, "supplier", supp_cols).filter(expr=f"s_nationkey in [{key_list}]")
        if supp_ds.limit(1).count() == 0:
            return _empty()
        li = safe_join(
            li.map_batches(date_rev, batch_format="pyarrow"), supp_ds,
            join_type="inner", num_partitions=4,
            on=("l_suppkey",), right_on=("s_suppkey",),
        ).select_columns(["l_orderkey", "s_nationkey", "revenue", "l_year"]).map_batches(
            functools.partial(_cast_cols, casts={"s_nationkey": pa.int64()}), batch_format="pyarrow"
        )
    j2 = safe_join(li, oc, join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j2.filter(expr="s_nationkey != c_nationkey")

    def name_pair(t: pa.Table) -> pa.Table:
        sn = pa.array([name_of[int(k)] for k in t["s_nationkey"].to_numpy()], type=pa.string())
        cn = pa.array([name_of[int(k)] for k in t["c_nationkey"].to_numpy()], type=pa.string())
        return pa.table(
            {"supp_nation": sn, "cust_nation": cn, "l_year": t["l_year"], "revenue": t["revenue"]}
        )

    out = (
        j2.map_batches(name_pair, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("revenue", alias_name="revenue"))
        .sort(["supp_nation", "cust_nation", "l_year"])
    )
    return out.map_batches(functools.partial(_round_cols, cols=("revenue",), ndigits=2), batch_format="pyarrow")


def returned_revenue(sf_dir: str, date0: str = "1996-01-01", months: int = 3, k: int = 20) -> rd.Dataset:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in a
    quarter.  Deterministic top-k: both engines sort on the ROUNDED
    revenue with c_custkey as the total-order tiebreak (an unrounded
    sort could order sub-ulp-different sums differently per engine).

    Scale plan: orders date-pruned at the read; lineitem filtered to
    returnflag='R' at the read; fact-fact hash join on orderkey; the
    customer attach joins AFTER aggregation (k-bounded left side).
    """
    import datetime as _dt

    d0 = _dt.date.fromisoformat(date0)
    m = d0.month - 1 + months
    d1 = _dt.date(d0.year + m // 12, m % 12 + 1, 1)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def date_filter(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(str(d0), "us"))
        hi = pa.scalar(np.datetime64(str(d1), "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)))
        return t.select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(date_filter, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]).filter(
        expr="l_returnflag == 'R'"
    )

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev})

    li = li.map_batches(add_rev, batch_format="pyarrow")
    j = safe_join(li, orders, join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = j.groupby("o_custkey").aggregate(Sum("revenue", alias_name="revenue"))
    per_cust = per_cust.map_batches(
        functools.partial(_round_cols, cols=("revenue",), ndigits=2), batch_format="pyarrow"
    )
    topk = per_cust.sort(["revenue", "o_custkey"], descending=[True, False]).limit(k)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    out = safe_join(topk, cust, join_type="inner", num_partitions=1, on=("o_custkey",), right_on=("c_custkey",))

    def attach_nation(t: pa.Table) -> pa.Table:
        nn = pa.array([name_of[int(x)] for x in t["c_nationkey"].to_numpy()], type=pa.string())
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "c_name": t["c_name"],
                "c_acctbal": t["c_acctbal"],
                "n_name": nn,
                "revenue": t["revenue"],
            }
        )

    return out.map_batches(attach_nation, batch_format="pyarrow")


def promo_revenue(sf_dir: str, month: str = "1996-09") -> "pa.Table":
    """TPC-H Q14 shape: % of one month's revenue from PROMO parts.

    Scale plan: lineitem month-pruned before the exchange; part is
    projected to (p_partkey, p_type) and hash-joined (200k rows/SF —
    broadcast would not hold at the target SF); the ratio reduces via
    two global sums (order-free after rounding).  Single-row output
    (promo_pct,).
    """
    import datetime as _dt

    y, m = (int(x) for x in month.split("-"))
    d0 = _dt.date(y, m, 1)
    d1 = _dt.date(y + (m // 12), m % 12 + 1, 1)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def date_rev(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(str(d0), "us"))
        hi = pa.scalar(np.datetime64(str(d1), "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_partkey": t["l_partkey"], "revenue": rev})

    li = li.map_batches(date_rev, batch_format="pyarrow")
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    j = safe_join(li, part, join_type="inner", num_partitions=4, on=("l_partkey",), right_on=("p_partkey",))

    def split_rev(t: pa.Table) -> pa.Table:
        promo = pc.if_else(
            pc.equal(t["p_type"], pa.scalar("PROMO")), t["revenue"], pa.scalar(0.0)
        )
        return pa.table({"promo_rev": promo, "revenue": t["revenue"]})

    sums = j.map_batches(split_rev, batch_format="pyarrow").aggregate(
        Sum("promo_rev", alias_name="promo"), Sum("revenue", alias_name="total")
    )
    from ..stages.common import duckdb_round as _dr

    pct = float(_dr(np.array([100.0 * sums["promo"] / sums["total"]]), 2)[0])
    return pa.table({"promo_pct": pa.array([pct], type=pa.float64())})


def large_orders(sf_dir: str, threshold: float = 300.0) -> rd.Dataset:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with customer attached — the HAVING-filtered group + join-back
    discipline (aggregate first, then join the SMALL surviving side
    against the dimension tables).

    Output: (c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
    sum_qty) ordered by (o_totalprice desc, o_orderkey).
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    big = (
        li.groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .filter(expr=f"sum_qty > {threshold!r}")
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = safe_join(big, orders, join_type="inner", num_partitions=2, on=("l_orderkey",), right_on=("o_orderkey",))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j2 = safe_join(j, cust, join_type="inner", num_partitions=2, on=("o_custkey",), right_on=("c_custkey",))

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "c_name": t["c_name"],
                "o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "o_totalprice": t["o_totalprice"],
                "sum_qty": t["sum_qty"],
            }
        )

    return j2.map_batches(project, batch_format="pyarrow").sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    )


def order_priority_counts(sf_dir: str, date0: str = "1996-07-01", months: int = 3) -> rd.Dataset:
    """TPC-H Q4 shape: order counts per priority for one quarter,
    restricted to orders with at least one RETURNED line — a distinct
    SEMI-JOIN (the EXISTS subquery becomes groupby-distinct on the
    probe side, then an inner join that cannot fan out).

    Scale plan: the distinct-orderkey reduction happens BEFORE the join
    (probe side shrinks to unique keys map-side via groupby), so the
    join moves at most one row per distinct order.
    """
    import datetime as _dt

    d0 = _dt.date.fromisoformat(date0)
    m = d0.month - 1 + months
    d1 = _dt.date(d0.year + m // 12, m % 12 + 1, 1)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def date_filter(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(str(d0), "us"))
        hi = pa.scalar(np.datetime64(str(d1), "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)))
        return t.select(["o_orderkey", "o_orderpriority"])

    orders = orders.map_batches(date_filter, batch_format="pyarrow")
    returned = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
        .filter(expr="l_returnflag == 'R'")
        .groupby("l_orderkey")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["l_orderkey"])
    )
    j = safe_join(orders, returned, join_type="inner", num_partitions=2, on=("o_orderkey",), right_on=("l_orderkey",))
    return (
        j.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .sort("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q6/Q8/Q11/Q12/Q13/Q15/Q17/Q19/Q21/Q22-shaped pipelines (round 2 session 8):
# the remaining classic join-aggregate disciplines, reinterpreted onto the
# fixture schema where TPC-H columns are absent (no partsupp / shipmode /
# receiptdate tables): correlated-subquery -> broadcast aggregate join,
# global-threshold HAVING, CASE-split counts, zero-preserving distribution,
# max-equality selection, disjunctive join predicates, exclusive-witness
# anti-semi join, and avg-threshold anti-join.  All-integer outputs are
# bit-exact; float sums are rounded identically in both engines BEFORE any
# comparison or ordering so summation-order ulps cannot flip a predicate.
# ---------------------------------------------------------------------------


def forecast_revenue(sf_dir: str, year: int = 1996, d0: float = 0.05, d1: float = 0.07, qty: float = 24.0) -> pa.Table:
    """TPC-H Q6 shape: revenue gain from discount-band lines of one year.

    Pure filter + single global sum: the predicate is evaluated
    vectorized per batch at the read boundary, only the revenue column
    crosses to the (driver-side, single-scalar) reduce.  The cheapest
    possible DAG — no shuffle at all.
    """
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def filt(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"))
        hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"))
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        m = pc.and_(m, pc.greater_equal(t["l_discount"], pa.scalar(d0)))
        m = pc.and_(m, pc.less_equal(t["l_discount"], pa.scalar(d1)))
        m = pc.and_(m, pc.less(t["l_quantity"], pa.scalar(qty)))
        t = t.filter(m)
        return pa.table({"gain": pc.multiply(t["l_extendedprice"], t["l_discount"])})

    s = li.map_batches(filt, batch_format="pyarrow").aggregate(Sum("gain", alias_name="revenue"))
    from ..stages.common import duckdb_round as _dr

    val = float(_dr(np.array([s["revenue"] if s["revenue"] is not None else 0.0]), 2)[0])
    return pa.table({"revenue": pa.array([val], type=pa.float64())})


def market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    ptype: str = "PROMO",
    y0: int = 1996,
    y1: int = 1997,
    dim_max_bytes: int = DIM_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """TPC-H Q8 shape: the target nation's share of the region's market
    for one part type, per order year.

    Join plan at scale: part(type) is a selective fact-side prune ->
    hash join on partkey (a planet-scale type slice outgrows broadcast);
    orders are date-pruned then hash-joined on orderkey; the customer
    region test is a hash join; nation/region are FIXED-cardinality
    (25/5 rows at every TPC-H SF) and stay driver-side; the
    supplier->nation attach is SIZE-GUARDED (``dim_strategy``):
    broadcast sorted-key lookup while the pruned supplier columns fit
    ``dim_max_bytes``, hash join above (supplier = SF x 10k rows — it
    outgrows a per-worker lookup at the design point).  The share
    divides two identically-rounded group sums so the quotient is
    reproducible under either plan.
    """
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()  # bounded: nation = 25 rows (fixed)
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()  # bounded: region = 5 rows (fixed)
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"])
    region_nations = sorted(int(k) for k, rk in zip(nat["n_nationkey"], nat["n_regionkey"]) if rk in rkeys)
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rn_keys = ",".join(str(k) for k in region_nations) or "-1"


    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).filter(expr=f"p_type == '{ptype}'").select_columns(["p_partkey"])
    # ALL-EMPTY join sides break Ray 2.49 joins even through the
    # safe_join scrub (the side loses its schema entirely) — guard the
    # predicate-driven sides with a typed empty result (limit(1) probe:
    # one block of execution, not a scan)
    if not region_nations or part.limit(1).count() == 0:
        return pa.table({"o_year": pa.array([], type=pa.int64()), "mkt_share": pa.array([], type=pa.float64())})
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li = safe_join(li, part, join_type="inner", num_partitions=4, on=("l_partkey",), right_on=("p_partkey",))

    supp_cols = ["s_suppkey", "s_nationkey"]
    if dim_strategy(sf_dir, "supplier", supp_cols, dim_max_bytes) == "broadcast":
        supp = _read(sf_dir, "supplier", supp_cols).to_pandas().sort_values("s_suppkey")  # bounded: dim_strategy-guarded broadcast branch
        s_keys = supp["s_suppkey"].to_numpy(dtype=np.int64)
        s_nat = supp["s_nationkey"].to_numpy(dtype=np.int64)

        def vol_nat(t: pa.Table) -> pa.Table:
            vol = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
            sk = t["l_suppkey"].to_numpy().astype(np.int64)
            idx = np.minimum(np.searchsorted(s_keys, sk), len(s_keys) - 1)
            nk = np.where(s_keys[idx] == sk, s_nat[idx], -1)
            return pa.table({"l_orderkey": t["l_orderkey"], "volume": vol,
                             "s_nationkey": pa.array(nk, type=pa.int64())})

        li = li.map_batches(vol_nat, batch_format="pyarrow").filter(expr="s_nationkey >= 0")
    else:
        li = safe_join(li, 
            _read(sf_dir, "supplier", supp_cols),
            join_type="inner", num_partitions=4, on=("l_suppkey",), right_on=("s_suppkey",),
        )

        def vol_only(t: pa.Table) -> pa.Table:
            vol = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
            return pa.table({"l_orderkey": t["l_orderkey"], "volume": vol,
                             "s_nationkey": pc.cast(t["s_nationkey"], pa.int64())})

        li = li.map_batches(vol_only, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def year_window(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(f"{y0}-01-01", "us"))
        hi = pa.scalar(np.datetime64(f"{y1 + 1}-01-01", "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)))
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        })

    orders = orders.map_batches(year_window, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).filter(
        expr=f"c_nationkey in [{rn_keys}]"
    ).select_columns(["c_custkey"])
    oc = safe_join(orders, cust, join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",))
    j = safe_join(li, 
        oc.select_columns(["o_orderkey", "o_year"]),
        join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",),
    )
    target = int(next(k for k, v in name_of.items() if v == nation))

    def split(t: pa.Table) -> pa.Table:
        hit = pc.if_else(pc.equal(t["s_nationkey"], pa.scalar(target, type=pa.int64())), t["volume"], pa.scalar(0.0))
        return pa.table({"o_year": t["o_year"], "nation_vol": hit, "volume": t["volume"]})

    agg = (
        j.map_batches(split, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("nation_vol", alias_name="nation_vol"), Sum("volume", alias_name="total_vol"))
    )

    def share(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round as _dr

        nv = _dr(t["nation_vol"].to_numpy(zero_copy_only=False), 2)
        tv = _dr(t["total_vol"].to_numpy(zero_copy_only=False), 2)
        return pa.table({"o_year": t["o_year"],
                         "mkt_share": pa.array(_dr(nv / tv, 6), type=pa.float64())})

    return agg.map_batches(share, batch_format="pyarrow").sort("o_year")


def important_parts(sf_dir: str, frac: float = 0.00075) -> rd.Dataset:
    """TPC-H Q11 shape (no partsupp in the fixture schema): parts whose
    revenue exceeds ``frac`` of GLOBAL revenue — the global-threshold
    HAVING discipline.

    Two-phase: one shuffle builds per-part sums; the scalar threshold
    is the (driver-side) sum OF THOSE PARTIAL SUMS — no second pass
    over the fact table; the filtered survivor set is tiny and joins
    back to the part dimension.  Both engines round the per-part sums
    and the total to 2 decimals before the strict > so ulp noise
    cannot flip a boundary row.
    """
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_partkey": t["l_partkey"], "revenue": rev})

    per_part = (
        li.map_batches(add_rev, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(functools.partial(_round_cols, cols=("revenue",), ndigits=2), batch_format="pyarrow")
    )
    per_part = per_part.materialize()  # reused for threshold AND filter
    from ..stages.common import duckdb_round as _dr

    total = per_part.aggregate(Sum("revenue", alias_name="t"))["t"]
    thr = float(_dr(np.array([total]), 2)[0]) * frac
    # Survivors are BOUNDED by construction (each exceeds frac of the
    # total, so there are < 1/frac of them): collect, then attach names
    # via a predicate-pushdown read of part — a shuffle join here would
    # move the whole dimension for a few hundred keys (and Ray's hash
    # join chokes on the schema-less empty blocks a sparse filter
    # produces).
    big = per_part.filter(expr=f"revenue > {thr!r}").to_pandas()  # bounded: survivors < 1/frac by construction
    if len(big) == 0:  # empty to_pandas loses columns: rebuild schema
        return pa.table({
            "p_partkey": pa.array([], type=pa.int64()),
            "p_name": pa.array([], type=pa.string()),
            "revenue": pa.array([], type=pa.float64()),
        })
    keys = sorted(int(k) for k in big["l_partkey"])
    names = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
        filter=pc.field("p_partkey").isin(keys),
    ).to_pandas().set_index("p_partkey")["p_name"]  # bounded: < 1/frac survivor keys (pushdown read)
    big = big.sort_values(["revenue", "l_partkey"], ascending=[False, True])
    return pa.table({
        "p_partkey": pa.array(big["l_partkey"].to_numpy(dtype=np.int64)),
        "p_name": pa.array([names[k] for k in big["l_partkey"]], type=pa.string()),
        "revenue": pa.array(big["revenue"].to_numpy(), type=pa.float64()),
    })


def line_priority_counts(sf_dir: str) -> rd.Dataset:
    """TPC-H Q12 shape (no shipmode column): per line status, how many
    lines belong to critical-priority orders vs the rest — the
    CASE-split count discipline over a fact-fact join.  All-integer
    output: bit-exact, no rounding."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus"])
    j = safe_join(li, orders, join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",))

    def split(t: pa.Table) -> pa.Table:
        crit = pc.or_(
            pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")),
            pc.equal(t["o_orderpriority"], pa.scalar("2-HIGH")),
        )
        one = pa.scalar(1, type=pa.int64())
        zero = pa.scalar(0, type=pa.int64())
        return pa.table({
            "l_linestatus": t["l_linestatus"],
            "high_line_count": pc.if_else(crit, one, zero),
            "low_line_count": pc.if_else(crit, zero, one),
        })

    return (
        j.map_batches(split, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                   Sum("low_line_count", alias_name="low_line_count"))
        .sort("l_linestatus")
    )


def customer_distribution(sf_dir: str, since: str = "2001-01-01") -> rd.Dataset:
    """TPC-H Q13 shape: distribution of customers by their recent order
    count, INCLUDING the zero bucket — the zero-preserving left join +
    double groupby discipline.  The recency filter makes the zero
    bucket non-degenerate in the fixture world (every customer has
    SOME order).  All-integer output."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def date_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64(since, "us")))).select(["o_custkey"])

    per_cust = (
        orders.map_batches(date_filter, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = safe_join(cust, per_cust, join_type="left_outer", num_partitions=4, on=("c_custkey",), right_on=("o_custkey",))

    def coalesce(t: pa.Table) -> pa.Table:
        n = pc.coalesce(pc.cast(t["c_count"], pa.int64()), pa.scalar(0, type=pa.int64()))
        return pa.table({"c_count": n})

    return (
        j.map_batches(coalesce, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .sort(["custdist", "c_count"], descending=[True, True])
    )


def top_supplier(sf_dir: str, date0: str = "1996-01-01", months: int = 3) -> rd.Dataset:
    """TPC-H Q15 shape: supplier(s) with the maximum quarter revenue —
    max-equality selection keeps ALL ties (the reference view+max
    semantics), which only works if both engines agree on the compared
    value: per-supplier sums are rounded to 2 decimals BEFORE the max
    and the equality."""
    import datetime as _dt

    d0 = _dt.date.fromisoformat(date0)
    m = d0.month - 1 + months
    d1 = _dt.date(d0.year + m // 12, m % 12 + 1, 1)
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def win_rev(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(str(d0), "us"))
        hi = pa.scalar(np.datetime64(str(d1), "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_suppkey": t["l_suppkey"], "revenue": rev})

    per_supp = (
        li.map_batches(win_rev, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("revenue", alias_name="total_revenue"))
        .map_batches(functools.partial(_round_cols, cols=("total_revenue",), ndigits=2), batch_format="pyarrow")
    )
    per_supp = per_supp.materialize()  # reused for max AND the equality filter
    best = per_supp.aggregate(Max("total_revenue", alias_name="m"))["m"]
    winners = per_supp.filter(expr=f"total_revenue == {best!r}")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = safe_join(winners, supp, join_type="inner", num_partitions=1, on=("l_suppkey",), right_on=("s_suppkey",))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "s_name": t["s_name"], "total_revenue": t["total_revenue"],
        })

    return out.map_batches(project, batch_format="pyarrow").sort("s_suppkey")


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#3") -> pa.Table:
    """TPC-H Q17 shape: weekly revenue from hard-to-stock lines — lines
    of one brand whose quantity is below 20% of that part's average.
    The correlated scalar subquery becomes an aggregate-then-join:
    per-part (sum_qty, n) reduces first, the quotient re-joins the
    SAME fact slice.  Quantities are integer-valued doubles, so the
    average is bit-identical in both engines (exact fp64 sums) and the
    0.2*avg threshold cannot drift."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).filter(expr=f"p_brand == '{brand}'").select_columns(["p_partkey"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    sl = safe_join(li, part, join_type="inner", num_partitions=4, on=("l_partkey",), right_on=("p_partkey",))
    sl = sl.materialize()  # brand slice reused: per-part avg AND the final filter
    per_part = sl.groupby("l_partkey").aggregate(
        Sum("l_quantity", alias_name="sum_qty"), Count(alias_name="n_lines")
    )

    def avg(t: pa.Table) -> pa.Table:
        a = pc.divide(pc.cast(t["sum_qty"], pa.float64()), pc.cast(t["n_lines"], pa.float64()))
        return pa.table({"avg_partkey": t["l_partkey"], "avg_qty": a})

    per_part = per_part.map_batches(avg, batch_format="pyarrow")
    j = safe_join(sl, per_part, join_type="inner", num_partitions=2, on=("l_partkey",), right_on=("avg_partkey",))

    def below(t: pa.Table) -> pa.Table:
        m = pc.less(t["l_quantity"], pc.multiply(pa.scalar(0.2), t["avg_qty"]))
        return pa.table({"l_extendedprice": t.filter(m)["l_extendedprice"]})

    s = j.map_batches(below, batch_format="pyarrow").aggregate(Sum("l_extendedprice", alias_name="s"))
    from ..stages.common import duckdb_round as _dr

    val = float(_dr(np.array([(s["s"] or 0.0) / 7.0]), 2)[0])
    return pa.table({"avg_yearly": pa.array([val], type=pa.float64())})


def disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape: revenue under an OR-of-conjunctions predicate
    spanning both join sides (brand x size x quantity bands) — the
    disjunctive-pushdown discipline: the part side prunes to the brand
    UNION before the join, the full disjunction evaluates vectorized
    after it.  Single-row sum, rounded identically."""
    bands = (
        ("Brand#1", 1, 5, 1.0, 11.0),
        ("Brand#2", 1, 10, 10.0, 20.0),
        ("Brand#3", 1, 15, 20.0, 30.0),
    )
    brands = ",".join(f"'{b}'" for b, *_ in bands)
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).filter(expr=f"p_brand in [{brands}]")
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    j = safe_join(li, part, join_type="inner", num_partitions=4, on=("l_partkey",), right_on=("p_partkey",))

    def pred_rev(t: pa.Table) -> pa.Table:
        m = pa.array(np.zeros(t.num_rows, dtype=bool))
        for b, s0, s1, q0, q1 in bands:
            c = pc.and_(pc.equal(t["p_brand"], pa.scalar(b)),
                        pc.and_(pc.greater_equal(t["p_size"], pa.scalar(s0, type=pa.int32())),
                                pc.less_equal(t["p_size"], pa.scalar(s1, type=pa.int32()))))
            c = pc.and_(c, pc.and_(pc.greater_equal(t["l_quantity"], pa.scalar(q0)),
                                   pc.less_equal(t["l_quantity"], pa.scalar(q1))))
            m = pc.or_(m, c)
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"revenue": rev})

    s = j.map_batches(pred_rev, batch_format="pyarrow").aggregate(Sum("revenue", alias_name="s"))
    from ..stages.common import duckdb_round as _dr

    val = float(_dr(np.array([s["s"] or 0.0]), 2)[0])
    return pa.table({"revenue": pa.array([val], type=pa.float64())})


def exclusive_return_suppliers(sf_dir: str, k: int = 20) -> rd.Dataset:
    """TPC-H Q21 shape (no receipt/commit dates in the fixture schema):
    for multi-supplier orders, the supplier who is the ONLY one with a
    returned line — the exclusive-witness EXISTS / NOT-EXISTS pair as
    two grouped reduces plus a join-back.

    Scale plan: lineitem collapses to one row per (order, supplier)
    map-side; order-level totals (distinct suppliers, returning
    suppliers) are a second small reduce keyed on the same column, so
    the join-back moves only distinct pairs.  All-integer: bit-exact.
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_flag(t: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(t["l_returnflag"], pa.scalar("R")), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"], "is_r": r})

    pairs = (
        li.map_batches(pair_flag, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("is_r", alias_name="any_r"))
    )
    pairs = pairs.materialize()  # reused: order-level totals + the witness filter
    per_order = pairs.groupby("l_orderkey").aggregate(
        Count(alias_name="n_supp"), Sum("any_r", alias_name="n_returning")
    )
    culprits = per_order.filter(expr="n_supp > 1 and n_returning == 1").select_columns(["l_orderkey", "n_supp"])
    j = safe_join(pairs.filter(expr="any_r == 1"), 
        culprits, join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("l_orderkey",)
    )
    per_supp = j.groupby("l_suppkey").aggregate(Count(alias_name="numwait"))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = safe_join(per_supp, supp, join_type="inner", num_partitions=1, on=("l_suppkey",), right_on=("s_suppkey",))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"s_name": t["s_name"], "numwait": t["numwait"]})

    return out.map_batches(project, batch_format="pyarrow").sort(
        ["numwait", "s_name"], descending=[True, False]
    ).limit(k)


def idle_customers(sf_dir: str, since: str = "2001-01-01") -> rd.Dataset:
    """TPC-H Q22 shape: wealthy-but-recently-idle customers per nation —
    a global-average threshold (broadcast scalar) plus an anti-join
    against recent orders.

    The threshold is the positive-balance average rounded to 2 decimals
    in BOTH engines before the strict >, so summation-order ulps in the
    average cannot flip a membership; account balances themselves are
    stored doubles compared verbatim.  The anti-join is a left join +
    null filter keyed on custkey (the recent-customer side stays
    distinct-reduced map-side).
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_nationkey"])
    from ..stages.common import duckdb_round as _dr

    pos = cust.filter(expr="c_acctbal > 0.0").aggregate(
        Sum("c_acctbal", alias_name="s"), Count(alias_name="n")
    )
    thr = float(_dr(np.array([pos["s"] / pos["n"]]), 2)[0])
    rich = cust.filter(expr=f"c_acctbal > {thr!r}")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64(since, "us")))).select(["o_custkey"])

    active = orders.map_batches(recent, batch_format="pyarrow").groupby("o_custkey").aggregate(Count(alias_name="_n"))
    j = safe_join(rich, active, join_type="left_outer", num_partitions=4, on=("c_custkey",), right_on=("o_custkey",))
    idle = j.map_batches(lambda t: t.filter(pc.is_null(t["_n"])), batch_format="pyarrow")

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()  # bounded: nation = 25 rows (fixed)
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def attach(t: pa.Table) -> pa.Table:
        nn = pa.array([name_of[int(x)] for x in t["c_nationkey"].to_numpy()], type=pa.string())
        return pa.table({"n_name": nn, "c_acctbal": t["c_acctbal"]})

    out = (
        idle.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_custs"), Sum("c_acctbal", alias_name="total_bal"))
        .sort("n_name")
    )
    return out.map_batches(functools.partial(_round_cols, cols=("total_bal",), ndigits=2), batch_format="pyarrow")


def revenue_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP (nation, year): revenue at three grains —
    (nation, year), per-nation subtotal, grand total — the OLAP
    subtotal lattice, computed as ONE fine-grain shuffle plus two
    in-memory re-reduces of the (tiny) aggregate (never a second pass
    over the fact table).  NULL grouping keys mark the rolled-up
    levels exactly as SQL ROLLUP does.

    Output: (n_name, o_year, revenue) with NULLs for subtotal rows.
    """
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def year_of(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        })

    orders = orders.map_batches(year_of, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    oc = safe_join(orders, cust, join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",))
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        # per-LINE integer cents BEFORE any sum: every grain of the
        # rollup is then an exact int64 sum — no half-cent boundary can
        # flip between engines (round-after-float-sum flips ~4% of the
        # 180 large fine groups here)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        cents = np.floor(rev.to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "cents": pa.array(cents, type=pa.int64())})

    li = li.map_batches(add_rev, batch_format="pyarrow")
    j = safe_join(li, 
        oc.select_columns(["o_orderkey", "o_year", "c_nationkey"]),
        join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",),
    )
    fine = j.groupby(["c_nationkey", "o_year"]).aggregate(Sum("cents", alias_name="cents")).to_pandas()  # bounded: 25 nations x |years| groups

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()  # bounded: nation = 25 rows (fixed)
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    fine["n_name"] = [name_of[int(k)] for k in fine["c_nationkey"]]
    fine["revenue"] = fine["cents"].to_numpy().astype(np.float64) / 100.0
    rows_name, rows_year, rows_rev = [], [], []
    for r in fine.itertuples():
        rows_name.append(r.n_name)
        rows_year.append(int(r.o_year))
        rows_rev.append(float(r.revenue))
    for nname, g in fine.groupby("n_name"):
        rows_name.append(nname)
        rows_year.append(None)
        rows_rev.append(float(g["cents"].sum()) / 100.0)
    rows_name.append(None)
    rows_year.append(None)
    rows_rev.append(float(fine["cents"].sum()) / 100.0)
    return pa.table(
        {
            "n_name": pa.array(rows_name, type=pa.string()),
            "o_year": pa.array(rows_year, type=pa.int64()),
            "revenue": pa.array(np.array(rows_rev), type=pa.float64()),
        }
    )


def customer_value_rank(sf_dir: str) -> rd.Dataset:
    """Per-nation dense rank of customers by account balance — the
    window-function ranking shape (dense_rank over PARTITION BY
    nation).  Rank assignment is a per-nation regroup (25 bounded
    groups); ordering key (c_acctbal desc, c_custkey) is total, so
    ranks are engine-independent integers."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True]).reset_index(drop=True)
        new_val = g["c_acctbal"].ne(g["c_acctbal"].shift()).astype(np.int64)
        g["bal_rank"] = new_val.cumsum()
        return g[["c_custkey", "c_nationkey", "c_acctbal", "bal_rank"]]

    out = cust.groupby("c_nationkey").map_groups(ranks, batch_format="pandas")

    def cast_keys(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "c_acctbal": t["c_acctbal"],
            "bal_rank": pc.cast(t["bal_rank"], pa.int64()),
        })

    return out.map_batches(cast_keys, batch_format="pyarrow")


def bloom_semi_join(
    sf_dir: str,
    segment: str = "BUILDING",
    expected_n: int = 400,
    fp_rate: float = 0.01,
    dim_max_bytes: int = DIM_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """Runtime-filter semi-join: per-nation order counts for customers of
    one market segment, with a BLOOM prefilter of the customer key set
    pushed into the fact scan BEFORE the shuffle — the runtime-filter
    optimization every distributed optimizer applies to selective
    dimension joins.

    Soundness by construction: a Bloom filter has no false NEGATIVES,
    so prefilter -> exact join ≡ exact join; the oracle computes the
    plain semi-join and the compare PROVES the optimized plan loses
    nothing (false positives only cost shuffle rows, removed by the
    exact join).  The filter is deterministic (splitmix64 double
    hashing) and built DISTRIBUTED: per-block bit-packed partial
    bitmaps OR-merged in Ray's aggregation tree — the driver receives
    one m_bits/8-byte array, never the customer keys (a driver-side
    key collect grows with the dimension; the bitmap does not).  The
    exact attach is SIZE-GUARDED (``dim_strategy``): broadcast dict
    while the filtered segment fits, hash join above.

    Output: (c_nationkey, n_orders).
    """
    from ray.data.aggregate import AggregateFn
    from ray.data.aggregate import Count as _Count

    from .cluster import bloom_bit_positions, bloom_params

    m_bits, k_hashes = bloom_params(expected_n, fp_rate)
    cust_cols = ["c_custkey", "c_nationkey", "c_mktsegment"]
    cust = _read(sf_dir, "customer", cust_cols).filter(expr=f"c_mktsegment == '{segment}'")
    # typed-empty guard: an ALL-EMPTY segment would break the shuffle
    # branch's join (Ray 2.49 loses the side's schema; see safe_join)
    if cust.limit(1).count() == 0:
        return pa.table({"c_nationkey": pa.array([], type=pa.int64()), "n_orders": pa.array([], type=pa.int64())})

    def bloom_accumulate(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        keys = block["c_custkey"].to_numpy().astype(np.uint64)
        bits = np.unpackbits(acc).astype(bool)
        bits[bloom_bit_positions(keys, m_bits, k_hashes).ravel()] = True
        return np.packbits(bits)

    bloom_agg = AggregateFn(
        init=lambda _key: np.packbits(np.zeros(m_bits, dtype=bool)),
        accumulate_block=bloom_accumulate,
        merge=lambda a, b: np.bitwise_or(a, b),
        finalize=lambda acc: acc,
        name="bloom_bits",
    )
    bits = np.unpackbits(cust.aggregate(bloom_agg)["bloom_bits"]).astype(bool)[:m_bits]

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def prefilter(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy().astype(np.uint64)
        pos = bloom_bit_positions(ck, m_bits, k_hashes)
        passed = bits[pos].all(axis=1)
        return t.filter(pa.array(passed))

    pre = orders.map_batches(prefilter, batch_format="pyarrow")

    if dim_strategy(sf_dir, "customer", cust_cols, dim_max_bytes) == "broadcast":
        cust_df = cust.to_pandas()  # bounded: dim_strategy-guarded broadcast branch
        nat_of = dict(zip(cust_df["c_custkey"].astype(np.int64), cust_df["c_nationkey"].astype(np.int64)))

        def exact_attach(t: pa.Table) -> pa.Table:
            # the exact join removes bloom false positives
            ck = t["o_custkey"].to_numpy().astype(np.int64)
            nk = np.array([nat_of.get(int(c), -1) for c in ck], dtype=np.int64)
            keep = nk >= 0
            return pa.table({"c_nationkey": pa.array(nk[keep], type=pa.int64())})

        matched = pre.map_batches(exact_attach, batch_format="pyarrow")
    else:
        def seg_filter(t: pa.Table) -> pa.Table:
            # explicit filter+project: keeps schema on empty blocks (the
            # Ray 2.49 filter(expr)+select_columns join-planner hazard)
            m = pc.equal(t["c_mktsegment"], pa.scalar(segment))
            return t.filter(m).select(["c_custkey", "c_nationkey"])

        cust_keys = _read(sf_dir, "customer", cust_cols).map_batches(seg_filter, batch_format="pyarrow")
        matched = safe_join(pre, 
            cust_keys,
            join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",),
        ).map_batches(
            lambda t: pa.table({"c_nationkey": pc.cast(t["c_nationkey"], pa.int64())}),
            batch_format="pyarrow",
        )

    return (
        matched.groupby("c_nationkey")
        .aggregate(_Count(alias_name="n_orders"))
        .sort("c_nationkey")
    )


_MCS_EMPTY = {
    "s_acctbal": pa.float64(), "s_name": pa.string(), "n_name": pa.string(),
    "p_partkey": pa.int64(), "p_name": pa.string(), "min_cost": pa.float64(),
}


def _min_cost_supplier_shuffle(sf_dir: str, size: int, ptype: str, region: str, k: int) -> rd.Dataset:
    """Hash-join plan for ``min_cost_supplier`` when the part/supplier
    dimensions outgrow a driver-side lookup (part = SF x 200k rows,
    supplier = SF x 10k — unbounded at the design point).  Only
    nation/region (fixed 25/5 rows at every SF) stay driver-side; every
    dim attach is a join, the correlated min joins back on partkey."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"].astype(int))
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nname_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    # NOTE: filter+project is ONE explicit Arrow map_batches per side —
    # Ray 2.49's planner mis-tracks filter(expr)+select_columns schemas
    # through a join's right side (ArrowInvalid: no match for key field
    # when a block filters to zero rows); an explicit pa.Table return
    # keeps the schema on empty blocks too.
    nk_set = set(int(x) for x in nat["n_nationkey"])

    def _part_filter(t: pa.Table, cols: list[str]) -> pa.Table:
        m = pc.and_(pc.equal(t["p_size"], pa.scalar(size)), pc.equal(t["p_type"], pa.scalar(ptype)))
        return t.filter(m).select(cols)

    def _supp_filter(t: pa.Table, cols: list[str]) -> pa.Table:
        m = pc.is_in(t["s_nationkey"], value_set=pa.array(sorted(nk_set), type=t["s_nationkey"].type))
        return t.filter(m).select(cols)

    part_all = ["p_partkey", "p_name", "p_size", "p_type"]
    supp_all = ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]
    # all join inputs are scrubbed inside safe_join (0-row blocks poison
    # Ray 2.49's hash join — see stages/common.py)
    partf = _read(sf_dir, "part", part_all).map_batches(
        functools.partial(_part_filter, cols=["p_partkey", "p_name"]), batch_format="pyarrow"
    )
    part_keys = _read(sf_dir, "part", part_all).map_batches(
        functools.partial(_part_filter, cols=["p_partkey"]), batch_format="pyarrow"
    )
    suppf = _read(sf_dir, "supplier", supp_all).map_batches(
        functools.partial(_supp_filter, cols=supp_all), batch_format="pyarrow"
    )
    supp_keys = _read(sf_dir, "supplier", supp_all).map_batches(
        functools.partial(_supp_filter, cols=["s_suppkey"]), batch_format="pyarrow"
    )
    # limit(1) probes, not full scans — these dims are LARGE in the
    # shuffle regime by definition (review finding, round 3)
    if part_keys.limit(1).count() == 0 or supp_keys.limit(1).count() == 0:
        return pa.table({c: pa.array([], type=t) for c, t in _MCS_EMPTY.items()})

    li = safe_join(
        safe_join(
            _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]),
            part_keys, join_type="inner", num_partitions=4,
            on=("l_partkey",), right_on=("p_partkey",),
        ),
        supp_keys, join_type="inner", num_partitions=4,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )

    def unit_cost(t: pa.Table) -> pa.Table:
        cost = duckdb_round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) / t["l_quantity"].to_numpy(zero_copy_only=False), 2
        )
        return pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "unit_cost": pa.array(cost, type=pa.float64()),
        })

    pair_cost = (
        li.map_batches(unit_cost, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("unit_cost", alias_name="unit_cost"))
        .materialize()  # bounded by |parts_f| x |supps_f|; guards empty-schema loss
    )
    if pair_cost.count() == 0:
        return pa.table({c: pa.array([], type=t) for c, t in _MCS_EMPTY.items()})

    part_min = pair_cost.groupby("l_partkey").aggregate(Min("unit_cost", alias_name="min_cost"))

    def is_winner(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["unit_cost"], t["min_cost"]))

    winners = safe_join(
        safe_join(pair_cost, part_min, join_type="inner", num_partitions=4, on=("l_partkey",))
        .map_batches(is_winner, batch_format="pyarrow"),
        suppf, join_type="inner", num_partitions=4, on=("l_suppkey",), right_on=("s_suppkey",),
    )
    winners = safe_join(winners, partf, join_type="inner", num_partitions=4, on=("l_partkey",), right_on=("p_partkey",))

    def project(t: pa.Table) -> pa.Table:
        nk = t["s_nationkey"].to_numpy().astype(np.int64)
        return pa.table({
            "s_acctbal": t["s_acctbal"],
            "s_name": t["s_name"],
            "n_name": pa.array([nname_of[int(x)] for x in nk], type=pa.string()),
            "p_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "p_name": t["p_name"],
            "min_cost": t["min_cost"],
        })

    return (
        winners.map_batches(project, batch_format="pyarrow")
        .sort(["s_acctbal", "n_name", "s_name", "p_partkey"], descending=[True, False, False, False])
        .limit(k)
    )


def min_cost_supplier(
    sf_dir: str, size: int = 15, ptype: str = "SMALL", region: str = "EUROPE", k: int = 100,
    dim_max_bytes: int = DIM_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """TPC-H Q2 shape: per-part minimum-cost supplier with a correlated
    min subquery.  The schema has no partsupp table, so unit cost is
    DERIVED from observed trade: per (part, supplier), the minimum
    round(l_extendedprice / l_quantity, 2) over that pair's lineitems
    (division is IEEE-identical across engines; min of rounded values
    is order-independent, so no summation ulps).

    Scale plan: SIZE-GUARDED (``dim_strategy``).  While part and
    supplier fit a per-worker lookup, their filtered id sets are
    broadcast and applied INSIDE the fact scan (no shuffle until the
    (part,supp) groupby, whose cardinality is bounded by |parts_f| x
    |supps_f|, far below the fact); above the ceiling the plan flips to
    ``_min_cost_supplier_shuffle`` — every dim attach a hash join, only
    the fixed-cardinality nation/region staying driver-side.  The
    correlated min is a second tiny groupby + equality join on partkey
    under either plan.

    Output: (s_acctbal, s_name, n_name, p_partkey, p_name, min_cost)
    ordered by s_acctbal desc with full tiebreak, limit k.
    """
    if (
        dim_strategy(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_type"], dim_max_bytes) == "shuffle"
        or dim_strategy(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"], dim_max_bytes)
        == "shuffle"
    ):
        return _min_cost_supplier_shuffle(sf_dir, size, ptype, region, k)
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_type"]).filter(
        expr=f"p_size == {size} and p_type == '{ptype}'"
    ).to_pandas()
    if len(part) == 0:  # empty to_pandas loses columns entirely — typed-empty early
        return pa.table({c: pa.array([], type=t) for c, t in _MCS_EMPTY.items()})
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"].astype(int))
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nname_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(set(nname_of))]
    sinfo = {
        int(r.s_suppkey): (float(r.s_acctbal), r.s_name, nname_of[int(r.s_nationkey)])
        for r in supp.itertuples()
    }
    pname_of = dict(zip(part["p_partkey"].astype(int), part["p_name"]))
    pk = np.sort(part["p_partkey"].to_numpy(dtype=np.int64))
    sk = np.sort(supp["s_suppkey"].to_numpy(dtype=np.int64))
    if len(pk) == 0 or len(sk) == 0:
        return pa.table({
            "s_acctbal": pa.array([], type=pa.float64()), "s_name": pa.array([], type=pa.string()),
            "n_name": pa.array([], type=pa.string()), "p_partkey": pa.array([], type=pa.int64()),
            "p_name": pa.array([], type=pa.string()), "min_cost": pa.array([], type=pa.float64()),
        })

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])

    def unit_cost(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        keep = (pk[np.minimum(np.searchsorted(pk, p), len(pk) - 1)] == p) & (
            sk[np.minimum(np.searchsorted(sk, s), len(sk) - 1)] == s
        )
        cost = duckdb_round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            / t["l_quantity"].to_numpy(zero_copy_only=False)[keep],
            2,
        )
        return pa.table({
            "l_partkey": pa.array(p[keep], type=pa.int64()),
            "l_suppkey": pa.array(s[keep], type=pa.int64()),
            "unit_cost": pa.array(cost, type=pa.float64()),
        })

    pair_cost = (
        li.map_batches(unit_cost, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("unit_cost", alias_name="unit_cost"))
    )
    # the (part,supp) aggregate is the bounded dimension-sized side —
    # materialize so the emptiness guard costs nothing extra (an empty
    # shuffle output loses its schema and would break the min join)
    pair_cost = pair_cost.materialize()
    if pair_cost.count() == 0:
        return pa.table({
            "s_acctbal": pa.array([], type=pa.float64()), "s_name": pa.array([], type=pa.string()),
            "n_name": pa.array([], type=pa.string()), "p_partkey": pa.array([], type=pa.int64()),
            "p_name": pa.array([], type=pa.string()), "min_cost": pa.array([], type=pa.float64()),
        })
    # per-part min map: cardinality == |filtered parts| (small by the
    # predicate) -> broadcast dict beats a shuffle join on this side
    part_min = pair_cost.groupby("l_partkey").aggregate(Min("unit_cost", alias_name="min_cost")).to_pandas()
    min_of = dict(zip(part_min["l_partkey"].astype(np.int64), part_min["min_cost"].astype(np.float64)))

    def keep_winners(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        mc = np.array([min_of[int(x)] for x in p], dtype=np.float64)
        keep = t["unit_cost"].to_numpy(zero_copy_only=False) == mc
        t = t.filter(pa.array(keep))
        return t.append_column("min_cost", pa.array(mc[keep], type=pa.float64()))

    winners = pair_cost.map_batches(keep_winners, batch_format="pyarrow")

    def attach(t: pa.Table) -> pa.Table:
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        p = t["l_partkey"].to_numpy().astype(np.int64)
        bal = np.array([sinfo[int(x)][0] for x in s], dtype=np.float64)
        return pa.table({
            "s_acctbal": pa.array(bal, type=pa.float64()),
            "s_name": pa.array([sinfo[int(x)][1] for x in s], type=pa.string()),
            "n_name": pa.array([sinfo[int(x)][2] for x in s], type=pa.string()),
            "p_partkey": pa.array(p, type=pa.int64()),
            "p_name": pa.array([pname_of[int(x)] for x in p], type=pa.string()),
            "min_cost": t["min_cost"],
        })

    return (
        winners.map_batches(attach, batch_format="pyarrow")
        .sort(["s_acctbal", "n_name", "s_name", "p_partkey"], descending=[True, False, False, False])
        .limit(k)
    )


def product_profit(
    sf_dir: str,
    name_sub: str = "bolt",
    cost_frac: float = 0.6,
    dim_max_bytes: int = DIM_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    whose name contains a substring.  No partsupp.ps_supplycost exists in
    the schema; the documented stand-in is cost = cost_frac *
    p_retailprice * l_quantity (deterministic, join-shape preserving).

    Exactness: per-row amount is rounded to integer CENTS with the
    shared duckdb_round kernel, summed as int64 (order-independent),
    divided by 100 in the final projection — the repo's standard
    fixed-point discipline for multi-engine sum equality.

    Scale plan: part (SF x 200k rows) and supplier (SF x 10k) are
    SIZE-GUARDED via ``dim_strategy`` — broadcast sorted-key lookups
    while the pruned columns fit ``dim_max_bytes``, distributed hash
    joins above (both grow with SF, so "it's a dimension" is not a
    broadcast licence at the 10^12-row design point); nation is FIXED
    25 rows and stays driver-side.  The fact↔orders exchange is a
    ``safe_join`` on orderkey (the name filter can produce the 0-row
    blocks that poison Ray 2.49's raw hash join), then a 25x|years|
    groupby.  Both physical plans are oracle-identical.
    """
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()  # bounded: nation = 25 rows (fixed)
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    part_cols = ["p_partkey", "p_name", "p_retailprice"]
    supp_cols = ["s_suppkey", "s_nationkey"]
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity"],
    )

    def _empty() -> pa.Table:
        return pa.table({
            "n_name": pa.array([], type=pa.string()),
            "o_year": pa.array([], type=pa.int64()),
            "profit": pa.array([], type=pa.float64()),
        })

    if dim_strategy(sf_dir, "part", part_cols, dim_max_bytes) == "broadcast":
        part = _read(sf_dir, "part", part_cols).to_pandas()  # bounded: dim_strategy-guarded broadcast branch
        part = part[part["p_name"].str.contains(name_sub, regex=False)]
        if len(part) == 0:
            return _empty()
        pk = part["p_partkey"].to_numpy(dtype=np.int64)
        order_idx = np.argsort(pk)
        pk = pk[order_idx]
        pprice = part["p_retailprice"].to_numpy(dtype=np.float64)[order_idx]

        def attach_price(t: pa.Table) -> pa.Table:
            p = t["l_partkey"].to_numpy().astype(np.int64)
            i = np.minimum(np.searchsorted(pk, p), len(pk) - 1)
            keep = pk[i] == p
            t = t.filter(pa.array(keep)).drop_columns(["l_partkey"])
            return t.append_column("p_retailprice", pa.array(pprice[i[keep]], type=pa.float64()))

        li = li.map_batches(attach_price, batch_format="pyarrow")
    else:
        part_ds = (
            _read(sf_dir, "part", part_cols)
            .map_batches(
                lambda t: t.filter(pc.match_substring(t["p_name"], name_sub)).drop_columns(["p_name"]),
                batch_format="pyarrow",
            )
        )
        # an ALL-empty join side loses its schema inside Ray's hash
        # join (safe_join's documented limit) — probe with one block
        if part_ds.limit(1).count() == 0:
            return _empty()
        li = safe_join(
            li, part_ds, join_type="inner", num_partitions=4,
            on=("l_partkey",), right_on=("p_partkey",),
        ).map_batches(
            lambda t: t.drop_columns([c for c in ("l_partkey", "p_partkey") if c in t.column_names]),
            batch_format="pyarrow",
        )

    if dim_strategy(sf_dir, "supplier", supp_cols, dim_max_bytes) == "broadcast":
        supp = _read(sf_dir, "supplier", supp_cols).to_pandas()  # bounded: dim_strategy-guarded broadcast branch
        sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
        s_idx = np.argsort(sk)
        sk = sk[s_idx]
        snat = supp["s_nationkey"].to_numpy(dtype=np.int64)[s_idx]

        def attach_nat(t: pa.Table) -> pa.Table:
            s = t["l_suppkey"].to_numpy().astype(np.int64)
            j = np.minimum(np.searchsorted(sk, s), len(sk) - 1)
            t = t.drop_columns(["l_suppkey"])
            return t.append_column(
                "s_nationkey", pa.array(snat[j], type=pa.int64())
            )

        li = li.map_batches(attach_nat, batch_format="pyarrow")
    else:
        li = safe_join(
            li, _read(sf_dir, "supplier", supp_cols),
            join_type="inner", num_partitions=4,
            on=("l_suppkey",), right_on=("s_suppkey",),
        ).map_batches(
            lambda t: t.drop_columns([c for c in ("l_suppkey", "s_suppkey") if c in t.column_names]),
            batch_format="pyarrow",
        )

    def amount_cents(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        amount = ext * (1.0 - disc) - cost_frac * price * qty
        cents = duckdb_round(amount * 100.0, 0).astype(np.int64)
        snk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "n_name": pa.array([name_of[int(x)] for x in snk], type=pa.string()),
            "cents": pa.array(cents, type=pa.int64()),
        })

    facts = li.map_batches(amount_cents, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def year_of(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        })

    j = safe_join(
        facts,
        orders.map_batches(year_of, batch_format="pyarrow"),
        join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",),
    )
    out = j.groupby(["n_name", "o_year"]).aggregate(Sum("cents", alias_name="cents"))

    def finish(t: pa.Table) -> pa.Table:
        profit = t["cents"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        return pa.table({
            "n_name": t["n_name"], "o_year": t["o_year"],
            "profit": pa.array(profit, type=pa.float64()),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort(["n_name", "o_year"], descending=[False, True])


def supplier_part_variety(sf_dir: str, excl_brand: str = "Brand#1", sizes: tuple = (1, 4, 9, 16, 25, 36)) -> rd.Dataset:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size).
    partsupp is absent, so the part↔supplier relation is the OBSERVED
    trading relation: distinct (l_partkey, l_suppkey) pairs from
    lineitem.  The 'customer complaints' supplier exclusion is replaced
    by the schema's available negative signal: suppliers with
    s_acctbal < 0 are excluded.

    Scale plan: part attrs + excluded-supplier set broadcast into the
    fact scan; the distinct is a (brand,type,size,supp) groupby (count
    discarded) feeding a (brand,type,size) count — two bounded
    exchanges over dimension-sized keys, never the raw fact.
    """
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    size_set = set(int(s) for s in sizes)
    part = part[(part["p_brand"] != excl_brand) & part["p_size"].isin(size_set)]
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    o = np.argsort(pk)
    pk = pk[o]
    pbrand = part["p_brand"].to_numpy()[o]
    ptype = part["p_type"].to_numpy()[o]
    psize = part["p_size"].to_numpy(dtype=np.int64)[o]
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(supp[supp["s_acctbal"] < 0]["s_suppkey"].to_numpy(dtype=np.int64))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def attach(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        i = np.minimum(np.searchsorted(pk, p), len(pk) - 1) if len(pk) else np.zeros(len(p), dtype=np.int64)
        keep = (pk[i] == p) if len(pk) else np.zeros(len(p), dtype=bool)
        if len(bad):
            bi = np.minimum(np.searchsorted(bad, s), len(bad) - 1)
            keep &= bad[bi] != s
        ii = i[keep]
        return pa.table({
            "p_brand": pa.array(pbrand[ii], type=pa.string()),
            "p_type": pa.array(ptype[ii], type=pa.string()),
            "p_size": pa.array(psize[ii], type=pa.int64()),
            "l_suppkey": pa.array(s[keep], type=pa.int64()),
        })

    pairs = (
        li.map_batches(attach, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )
    out = (
        pairs.groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .sort(["supplier_cnt", "p_brand", "p_type", "p_size"], descending=[True, False, False, False])
    )
    return out.select_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])


def dominant_part_suppliers(
    sf_dir: str,
    name_prefix: str = "red",
    year: int = 1996,
    dim_max_bytes: int = DIM_BROADCAST_MAX_BYTES,
) -> rd.Dataset:
    """TPC-H Q20 shape: suppliers holding a dominant position in a part
    family during one year.  ps_availqty is absent; the stand-in
    predicate keeps suppliers whose shipped quantity of a filtered part
    exceeds 50% of ALL shipments of that part that year (the analogous
    'more than half' correlated-threshold semi-join chain).

    Exactness: quantities are summed as fixed-point int64 centi-units
    (duckdb_round(q*100)), so the >0.5*total compare is integer math
    (2*supp > total) — immune to float summation order in both engines.

    Scale plan: the part-name prune is ``dim_strategy``-guarded
    (broadcast key lookup vs a distributed semi-join — part grows with
    SF); the supplier/nation attach joins the AGGREGATED dominant-id
    side (small by construction) against the supplier table with
    ``safe_join``, so no SF-growing table is ever collected.

    Output: distinct (s_suppkey, s_name, n_name) ordered by s_suppkey.
    """
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()  # bounded: nation = 25 rows (fixed)
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def date_qc(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"))
        hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)))
        qc = duckdb_round(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        return pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "qc": pa.array(qc, type=pa.int64()),
        })

    if dim_strategy(sf_dir, "part", ["p_partkey", "p_name"], dim_max_bytes) == "broadcast":
        part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()  # bounded: dim_strategy-guarded broadcast branch
        part = part[part["p_name"].str.startswith(name_prefix)]
        pk = np.sort(part["p_partkey"].to_numpy(dtype=np.int64))

        def filt(t: pa.Table) -> pa.Table:
            t = date_qc(t)
            p = t["l_partkey"].to_numpy()
            if len(pk) == 0:
                keep = np.zeros(len(p), dtype=bool)
            else:
                keep = pk[np.minimum(np.searchsorted(pk, p), len(pk) - 1)] == p
            return t.filter(pa.array(keep))

        facts = li.map_batches(filt, batch_format="pyarrow")
    else:
        part_ds = _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
            lambda t: t.filter(pc.starts_with(t["p_name"], name_prefix)).select(["p_partkey"]),
            batch_format="pyarrow",
        )
        if part_ds.limit(1).count() == 0:
            facts = li.limit(0).map_batches(date_qc, batch_format="pyarrow")
        else:
            facts = safe_join(
                li.map_batches(date_qc, batch_format="pyarrow"), part_ds,
                join_type="inner", num_partitions=4,
                on=("l_partkey",), right_on=("p_partkey",),
            ).select_columns(["l_partkey", "l_suppkey", "qc"])
    per_pair = facts.groupby(["l_partkey", "l_suppkey"]).aggregate(Sum("qc", alias_name="supp_qc"))
    per_pair = per_pair.materialize()  # bounded (part,supp) side; see min_cost_supplier
    if per_pair.count() == 0:
        return pa.table({
            "s_suppkey": pa.array([], type=pa.int64()),
            "s_name": pa.array([], type=pa.string()),
            "n_name": pa.array([], type=pa.string()),
        })
    per_part = per_pair.groupby("l_partkey").aggregate(Sum("supp_qc", alias_name="total_qc"))
    joined = safe_join(per_pair, per_part, join_type="inner", num_partitions=2, on=("l_partkey",))

    def dominant(t: pa.Table) -> pa.Table:
        keep = 2 * t["supp_qc"].to_numpy() > t["total_qc"].to_numpy()
        return t.filter(pa.array(keep))

    dom = joined.map_batches(dominant, batch_format="pyarrow")
    supp_ids = dom.groupby("l_suppkey").aggregate(Count(alias_name="_n"))
    # supplier attach: hash join against the aggregated (small) dominant
    # side — the supplier table itself never collects driver-side
    out = safe_join(
        supp_ids, _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]),
        join_type="inner", num_partitions=2, on=("l_suppkey",), right_on=("s_suppkey",),
    )

    def attach(t: pa.Table) -> pa.Table:
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        nk = t["s_nationkey"].to_numpy().astype(np.int64)
        return pa.table({
            "s_suppkey": pa.array(s, type=pa.int64()),
            "s_name": pc.cast(t["s_name"], pa.string()),
            "n_name": pa.array([name_of[int(x)] for x in nk], type=pa.string()),
        })

    return out.map_batches(attach, batch_format="pyarrow").sort("s_suppkey")


PRICE_BAND_CENTS = 1_000_000  # $10,000 band half-width in cents


def price_band_pairs(sf_dir: str, band_cents: int = PRICE_BAND_CENTS) -> rd.Dataset:
    """Numeric band self-join: count order pairs within the same nation
    whose total prices differ by at most the band — the 1-D similarity
    self-join (near-duplicate detection on a numeric key) expressed as
    sort + two-pointer instead of the O(n²) hash self-join a naive
    engine would run.

    Exactness: prices are int64 cents; the per-nation pair count is
    pure integer comparison, bit-exact.  Each unordered pair counts
    once (position order within the sorted run breaks cents ties —
    mirrored by the oracle's (c, rid) lexicographic condition).

    Scale shape: nation attaches via a broadcast customer→nation map
    inside the fact scan; ONE nation-keyed exchange; the per-nation
    reduce sorts its run and counts via vectorized searchsorted —
    O(n log n) per group, memory bounded by the group.  At skewed key
    scale, range-partition each nation's sorted cents with band-width
    overlap and sum per-range counts (noted; nations are balanced
    here).  Output: (n_name, n_pairs).
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    nation_of = {int(r.c_custkey): nname[int(r.c_nationkey)] for r in cust.itertuples()}

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy().astype(np.int64)
        cents = duckdb_round(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array([nation_of[int(c)] for c in ck], type=pa.string()),
                "c": pa.array(cents, type=pa.int64()),
            }
        )

    def count_pairs(g: pa.Table) -> pa.Table:
        c = np.sort(g["c"].to_numpy())
        hi = np.searchsorted(c, c + band_cents, side="right")
        n_pairs = int((hi - np.arange(len(c)) - 1).sum())
        if n_pairs == 0:  # pairless nations emit no row (oracle join semantics)
            return pa.table(
                {
                    "n_name": pa.array([], type=pa.string()),
                    "n_pairs": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "n_name": pa.array([g["n_name"][0].as_py()], type=pa.string()),
                "n_pairs": pa.array([n_pairs], type=pa.int64()),
            }
        )

    return (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(count_pairs, batch_format="pyarrow")
        .sort("n_name")
    )


COOC_MIN_SUPPORT = 2


def part_cooccurrence(sf_dir: str, min_support: int = COOC_MIN_SUPPORT, parts: int = 32) -> rd.Dataset:
    """Market-basket co-occurrence: part pairs bought together in the
    same order, with support counts — the frequent-itemset primitive
    (A-priori's first pass) behind recommendations and assortment
    analysis.

    Scale shape: the per-order pair explosion is bounded by ORDER SIZE
    squared (orders hold a handful of lines, never the catalog), done
    in the coarse-partition run-scan (order_key % parts); pair counts
    combine map-side before ONE pair-keyed groupby.

    Output: (part_a, part_b, support), part_a < part_b, support >=
    min_support.
    """
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def prep(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(ok, type=pa.int64()),
                "pk": pa.array(t["l_partkey"].to_numpy().astype(np.int64), type=pa.int64()),
                "part": pa.array(ok % parts, type=pa.int64()),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        ok = g["ok"].to_numpy()
        pk = g["pk"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.concatenate([[0], np.nonzero(ok[1:] != ok[:-1])[0] + 1])
        ends = np.append(starts[1:], len(ok))
        pa_, pb_ = [], []
        for a, b in zip(starts, ends):
            if b - a < 2:
                continue
            items = np.unique(pk[a:b])
            if len(items) < 2:
                continue
            ia, ib = np.triu_indices(len(items), k=1)
            pa_.append(items[ia])
            pb_.append(items[ib])
        if not pa_:
            return pa.table(
                {
                    "part_a": pa.array([], type=pa.int64()),
                    "part_b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        a = np.concatenate(pa_)
        b = np.concatenate(pb_)
        key = a * np.int64(1 << 32) + b
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "part_a": pa.array(uniq // (1 << 32), type=pa.int64()),
                "part_b": pa.array(uniq % (1 << 32), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["part_a", "part_b"])
        .aggregate(Sum("n", alias_name="support"))
    )
    return agg.filter(expr=f"support >= {min_support}")


# ---------------------------------------------------------------------------
# blame_suppliers (TPC-H Q21 shape: the semi+anti join combo)
# ---------------------------------------------------------------------------

BLAME_LATE_DAYS = 90  # a line is late if shipped > this many days after order
BLAME_K = 20


def blame_suppliers(sf_dir: str, late_days: int = BLAME_LATE_DAYS, k: int = BLAME_K) -> rd.Dataset:
    """Suppliers Who Kept Orders Waiting (TPC-H Q21's shape re-expressed
    on this schema): count, per supplier, the multi-supplier orders in
    which THIS supplier shipped late (l_shipdate > o_orderdate +
    late_days) while EVERY other participating supplier shipped all of
    their lines on time — the EXISTS + NOT-EXISTS correlated-subquery
    combo, the hardest TPC-H join pattern, done as pure dataflow.

    Dataflow: lineitem ⋈ orders (orderkey, date only) → per
    (orderkey, suppkey) late-flag reduce → per orderkey count
    (suppliers, late suppliers) → keep orders with ≥2 suppliers and
    EXACTLY one late supplier → credit that supplier → top-k by
    (count DESC, suppkey).  Both correlated subqueries collapse into
    ONE order-keyed aggregate — no per-order probing, no driver loop.

    Output: (s_suppkey, s_name, numwait) — top k.
    """
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    )
    j = safe_join(
        li,
        od,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def flag(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        odt = t["o_orderdate"].cast(pa.int64()).to_numpy()
        late = (ship > odt + np.int64(late_days) * 86_400_000_000).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "late": pa.array(late, type=pa.int64()),
            }
        )

    per_os = (
        j.map_batches(flag, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("late", alias_name="supp_late"))
    )

    def order_partial(t: pa.Table) -> pa.Table:
        late = t["supp_late"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "supp_late": pa.array(late, type=pa.int64()),
                # when EXACTLY one supplier is late this recovers their
                # key from the same aggregate — no join-back needed
                "late_key": pa.array(late * t["l_suppkey"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    per_order = (
        per_os.map_batches(order_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(
            Sum("one", alias_name="n_supp"),
            Sum("supp_late", alias_name="n_late"),
            Max("late_key", alias_name="late_key"),
        )
    )

    def credit(t: pa.Table) -> pa.Table:
        keep = (t["n_supp"].to_numpy() >= 2) & (t["n_late"].to_numpy() == 1)
        return pa.table(
            {
                "s_suppkey": pa.array(t["late_key"].to_numpy()[keep], type=pa.int64()),
                "n": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )

    counts = (
        per_order.map_batches(credit, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n", alias_name="numwait"))
    )
    sup = rd.read_parquet(os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"])
    out = safe_join(counts, sup, join_type="inner", num_partitions=4, on=("s_suppkey",))
    df = out.to_pandas()  # bounded: per-supplier wait counts (dim-sized); head(k) follows
    df = df.sort_values(["numwait", "s_suppkey"], ascending=[False, True], kind="mergesort").head(k)
    return rd.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array(df["s_suppkey"].to_numpy().astype(np.int64), type=pa.int64()),
                "s_name": pa.array(df["s_name"], type=pa.string()),
                "numwait": pa.array(df["numwait"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# rank_correlation (Spearman rho + Kendall tau-b, exact via joint histogram)
# ---------------------------------------------------------------------------


def rank_correlation(sf_dir: str) -> rd.Dataset:
    """Spearman's rho and Kendall's tau-b between l_quantity and
    l_discount, computed EXACTLY from the bounded joint value
    histogram — the monotone-dependence audit that complements
    lineitem_corr_matrix's linear Pearson (both variables are heavily
    tied, where naive rank formulas silently break).

    Method (scale-exact): quantity has ≤ 50 distinct values, discount
    ≤ 11 cents-quantized — so ONE (q, d)-keyed count reduce (≤ 550
    rows leave the data, independent of input size) carries complete
    rank information:
    - average ranks from the marginal cumulative counts (ties get the
      midrank; doubled to stay integer);
    - rho = Pearson over the histogram with midrank coordinates — all
      moment sums exact Python-int (int128 mirrored by DuckDB
      HUGEINT), ONE mirrored float expression at the end;
    - tau-b from exact concordant/discordant pair counts via 2-D
      prefix sums over the 50×11 grid, tie terms from the marginals.

    Output: one row (n, spearman_rho, kendall_tau).
    """
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy().astype(np.int64)
        d = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        key = q * 100 + d
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    key = agg["key"].to_numpy().astype(np.int64)
    n = agg["n"].to_numpy().astype(np.int64)
    qv, dv = key // 100, key % 100

    qs = np.sort(np.unique(qv))
    dss = np.sort(np.unique(dv))
    qi = np.searchsorted(qs, qv)
    di = np.searchsorted(dss, dv)
    grid = np.zeros((len(qs), len(dss)), dtype=object)
    for a, b, c in zip(qi, di, n):
        grid[a, b] = grid[a, b] + int(c)
    rmarg = grid.sum(axis=1)  # python ints
    cmarg = grid.sum(axis=0)
    N = int(rmarg.sum())

    def midrank2(marg) -> list[int]:
        """2× the average rank of each distinct value (exact int)."""
        out, cum = [], 0
        for c in marg:
            out.append(2 * cum + int(c) + 1)  # 2*(cum + (c+1)/2)
            cum += int(c)
        return out

    rx = midrank2(rmarg)
    ry = midrank2(cmarg)
    # exact int moment sums over the histogram (2x-scaled ranks)
    Sx = sum(int(r) * x for r, x in zip(rmarg, rx))
    Sy = sum(int(c) * y for c, y in zip(cmarg, ry))
    Sxx = sum(int(r) * x * x for r, x in zip(rmarg, rx))
    Syy = sum(int(c) * y * y for c, y in zip(cmarg, ry))
    Sxy = 0
    for a in range(len(qs)):
        for b in range(len(dss)):
            if grid[a, b]:
                Sxy += int(grid[a, b]) * rx[a] * ry[b]
    num = N * Sxy - Sx * Sy
    va = N * Sxx - Sx * Sx
    vb = N * Syy - Sy * Sy
    import math as _math

    rho = float(num) / (_math.sqrt(float(va)) * _math.sqrt(float(vb)))

    # Kendall: concordant/discordant via exact 2-D prefix sums
    C = D = 0
    # prefix[a][b] = sum of grid[<a][<b]
    pref = np.zeros((len(qs) + 1, len(dss) + 1), dtype=object)
    for a in range(len(qs)):
        row_run = 0
        for b in range(len(dss)):
            row_run = row_run + int(grid[a, b])
            pref[a + 1, b + 1] = int(pref[a, b + 1]) + row_run
    for a in range(len(qs)):
        for b in range(len(dss)):
            g = int(grid[a, b])
            if not g:
                continue
            lt_lt = int(pref[a, b])  # q' < q and d' < d
            lt_gt = int(pref[a, len(dss)]) - int(pref[a, b + 1])  # q' < q and d' > d
            C += g * lt_lt
            D += g * lt_gt
    n0 = N * (N - 1) // 2
    n1 = sum(int(r) * (int(r) - 1) // 2 for r in rmarg)
    n2 = sum(int(c) * (int(c) - 1) // 2 for c in cmarg)
    tau = float(C - D) / (_math.sqrt(float(n0 - n1)) * _math.sqrt(float(n0 - n2)))

    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([N], type=pa.int64()),
                "spearman_rho": pa.array(duckdb_round(np.array([rho]), 6), type=pa.float64()),
                "kendall_tau": pa.array(duckdb_round(np.array([tau]), 6), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# referential_integrity (FK orphan audit across the warehouse)
# ---------------------------------------------------------------------------

FK_EDGES = (
    # (child_table, child_key, parent_table, parent_key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_integrity(sf_dir: str) -> rd.Dataset:
    """Warehouse FK audit: for every declared foreign-key edge, the
    child-row count, DISTINCT child keys, and ORPHANS (child keys with
    no parent) — the load-time data-quality gate every pipeline runs
    before joining (an orphan silently drops rows from inner joins,
    the classic "where did my revenue go" bug).

    Scale shape per edge: the child side collapses to DISTINCT keys
    via the per-batch unique combiner + one keyed count groupby (the
    shuffle carries keys, never child rows); the parent key set is a
    pruned single-column scan; the orphan count is a broadcast-hash
    anti-join when the parent is dim-sized (all parents here) with the
    documented hash-join switchover above the broadcast byte threshold
    (the size-guarded-dim pattern of market_share).

    Output: (child_table, fk_column, parent_table, n_child_rows,
    n_child_keys, n_orphan_keys, n_orphan_rows).
    """
    rows = []
    for child, ckey, parent, pkey in FK_EDGES:
        cds = _read(sf_dir, child, [ckey])

        def key_partial(t: pa.Table, _k=ckey) -> pa.Table:
            u, c = np.unique(t[_k].to_numpy(), return_counts=True)
            return pa.table(
                {"k": pa.array(u.astype(np.int64)), "n": pa.array(c.astype(np.int64))}
            )

        per_key = (
            cds.map_batches(key_partial, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("n", alias_name="n"))
        )
        # parent keys: dim-bounded single column -> broadcast set
        import pyarrow.parquet as _pq

        pk = _pq.read_table(os.path.join(sf_dir, f"{parent}.parquet"), columns=[pkey])[pkey].to_numpy()
        pset_arr = np.sort(pk.astype(np.int64))
        import ray as _ray

        pref = _ray.put(pset_arr)

        def orphan_partial(t: pa.Table, _ref=pref) -> pa.Table:
            ps = _ray.get(_ref) if not isinstance(_ref, np.ndarray) else _ref
            k = t["k"].to_numpy()
            n = t["n"].to_numpy()
            idx = np.searchsorted(ps, k)
            found = (idx < len(ps)) & (ps[np.minimum(idx, len(ps) - 1)] == k)
            orph = ~found
            return pa.table(
                {
                    "g": pa.array(np.zeros(1, dtype=np.int64)),
                    "n_keys": pa.array([len(k)], type=pa.int64()),
                    "n_rows": pa.array([int(n.sum())], type=pa.int64()),
                    "n_orph_keys": pa.array([int(orph.sum())], type=pa.int64()),
                    "n_orph_rows": pa.array([int(n[orph].sum())], type=pa.int64()),
                }
            )

        agg = (
            per_key.map_batches(orphan_partial, batch_format="pyarrow")
            .groupby("g")
            .aggregate(
                Sum("n_keys", alias_name="n_keys"),
                Sum("n_rows", alias_name="n_rows"),
                Sum("n_orph_keys", alias_name="n_orph_keys"),
                Sum("n_orph_rows", alias_name="n_orph_rows"),
            )
            .take_all()  # bounded: single-group orphan-count row
        )
        r = agg[0] if agg else {"n_keys": 0, "n_rows": 0, "n_orph_keys": 0, "n_orph_rows": 0}
        rows.append(
            (child, ckey, parent, int(r["n_rows"]), int(r["n_keys"]), int(r["n_orph_keys"]), int(r["n_orph_rows"]))
        )
    return rd.from_arrow(
        pa.table(
            {
                "child_table": pa.array([r[0] for r in rows], type=pa.string()),
                "fk_column": pa.array([r[1] for r in rows], type=pa.string()),
                "parent_table": pa.array([r[2] for r in rows], type=pa.string()),
                "n_child_rows": pa.array([r[3] for r in rows], type=pa.int64()),
                "n_child_keys": pa.array([r[4] for r in rows], type=pa.int64()),
                "n_orphan_keys": pa.array([r[5] for r in rows], type=pa.int64()),
                "n_orphan_rows": pa.array([r[6] for r in rows], type=pa.int64()),
            }
        )
    )


def association_rules(sf_dir: str, min_support: int = COOC_MIN_SUPPORT, parts: int = 32) -> rd.Dataset:
    """Market-basket ASSOCIATION RULES over the co-occurrence pairs:
    for every supported unordered part pair, both directed rules with
    support / confidence / lift (Agrawal & Srikant 1994) — the ranking
    layer on top of part_cooccurrence's frequent-pair primitive
    (confidence = P(B|A), lift >1 = genuinely associated, <1 =
    substitutes).

    Determinism: supports and per-part basket counts are exact int64;
    n_orders is an exact count; confidence and lift are single
    mirrored float expressions over four integers.

    Scale shape: pair supports reuse the run-scan + pair-keyed groupby
    of part_cooccurrence; per-part basket counts are one distinct-key
    combiner + groupby; both join on dim-bounded keys (catalog-sized,
    the size-guarded broadcast).  Output: (antecedent, consequent,
    support, n_a, n_b, confidence, lift) rounded 6.
    """
    pairs = part_cooccurrence(sf_dir, min_support=min_support, parts=parts)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def order_part_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"o": t["l_orderkey"].to_numpy(), "p": t["l_partkey"].to_numpy()}
        ).drop_duplicates()
        return pa.table(
            {"o": pa.array(df["o"].to_numpy().astype(np.int64)), "p": pa.array(df["p"].to_numpy().astype(np.int64))}
        )

    op = (
        li.map_batches(order_part_partial, batch_format="pyarrow")
        .groupby(["o", "p"])
        .aggregate(Count(alias_name="dup"))
    )
    part_counts = {
        int(r["p"]): int(r["n"])
        for r in op.groupby("p").aggregate(Count(alias_name="n")).take_all()
    }  # catalog-bounded broadcast
    n_orders = int(
        op.groupby("o").aggregate(Count(alias_name="k")).count()
    )

    def rules(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy().astype(np.int64)
        b = t["part_b"].to_numpy().astype(np.int64)
        sup = t["support"].to_numpy().astype(np.int64)
        na = np.array([part_counts[int(x)] for x in a], dtype=np.int64)
        nb = np.array([part_counts[int(x)] for x in b], dtype=np.int64)
        # both directions: A->B and B->A
        ante = np.concatenate([a, b])
        cons = np.concatenate([b, a])
        n_ante = np.concatenate([na, nb]).astype(np.float64)
        n_cons = np.concatenate([nb, na]).astype(np.float64)
        s2 = np.concatenate([sup, sup])
        conf = s2.astype(np.float64) / n_ante
        lift = conf / (n_cons / float(n_orders))
        return pa.table(
            {
                "antecedent": pa.array(ante, type=pa.int64()),
                "consequent": pa.array(cons, type=pa.int64()),
                "support": pa.array(s2, type=pa.int64()),
                "n_a": pa.array(np.concatenate([na, nb]), type=pa.int64()),
                "n_b": pa.array(np.concatenate([nb, na]), type=pa.int64()),
                "confidence": pa.array(duckdb_round(conf, 6), type=pa.float64()),
                "lift": pa.array(duckdb_round(lift, 6), type=pa.float64()),
            }
        )

    return pairs.map_batches(rules, batch_format="pyarrow")


DUP_ORDER_WINDOW_DAYS = 30
DUP_ORDER_BAND_CENTS = 100_000  # $1000 price bands


def duplicate_orders(
    sf_dir: str,
    window_days: int = DUP_ORDER_WINDOW_DAYS,
    band_cents: int = DUP_ORDER_BAND_CENTS,
) -> rd.Dataset:
    """Suspicious duplicate-order pairs: same customer, total price in
    the same ``band_cents`` band, order dates within ``window_days`` —
    the double-billing / replayed-submission screen a payments
    pipeline runs nightly (entity-resolution's transactional cousin:
    the blocking key is (customer, amount-band), the verify is the
    date window).

    Determinism: prices band as exact integer CENTS (floor(p·100 +
    0.5) // band); dates as integer epoch days; pair order (a < b by
    orderkey).

    Scale shape: ONE custkey-keyed regroup (pair generation inside
    sorted (customer, band) runs — the LSH-bucket discipline, bounded
    by per-customer order multiplicity); no all-to-all beyond that
    single groupby.  Output: (o_custkey, band, order_a, order_b,
    day_gap).
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def keyed(t: pa.Table) -> pa.Table:
        band = (np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)) // band_cents
        day = (t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "band": pa.array(band, type=pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "day": pa.array(day, type=pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "band", "o_orderkey"])
        out = {"o_custkey": [], "band": [], "order_a": [], "order_b": [], "day_gap": []}
        for (_, _), grp in g.groupby(["o_custkey", "band"], sort=False):
            if len(grp) < 2:
                continue
            ok = grp["o_orderkey"].to_numpy()
            dy = grp["day"].to_numpy()
            for i in range(len(ok)):
                for j in range(i + 1, len(ok)):
                    gap = abs(int(dy[i]) - int(dy[j]))
                    if gap <= window_days:
                        out["o_custkey"].append(int(grp["o_custkey"].iloc[0]))
                        out["band"].append(int(grp["band"].iloc[0]))
                        out["order_a"].append(int(min(ok[i], ok[j])))
                        out["order_b"].append(int(max(ok[i], ok[j])))
                        out["day_gap"].append(gap)
        return pd.DataFrame(out)

    empty_hint = pd.DataFrame(
        {"o_custkey": pd.Series(dtype="int64"), "band": pd.Series(dtype="int64"),
         "order_a": pd.Series(dtype="int64"), "order_b": pd.Series(dtype="int64"),
         "day_gap": pd.Series(dtype="int64")}
    )

    def pairs_safe(g: pd.DataFrame) -> pd.DataFrame:
        r = pairs(g)
        return r if len(r) else empty_hint

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(pairs_safe, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# interpurchase_intervals (per-customer order-gap distribution)
# ---------------------------------------------------------------------------

IPI_WEEK_DAYS = 7


def interpurchase_intervals(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Inter-purchase-time distribution: for every customer with ≥ 2
    orders, the day gaps between consecutive orders ((o_orderdate,
    o_orderkey) total order), histogrammed by week bucket — the CRM
    repurchase-cadence feature (churn models threshold exactly this
    distribution; rfm_features carries the per-customer recency, this
    is the corpus-wide cadence law).

    Exactness: gaps are exact integer day differences; bucket = gap //
    7; counts fold through the aggregate tree; frac is the one
    mirrored float.

    Scale shape: the sessionize discipline — customers shard by
    ``o_custkey % parts``, each task sorts ONE coarse partition and
    run-scans consecutive orders (per-customer dispatch amortized);
    the week histogram is a bucket-bounded groupby.

    Output: (week_bucket, n_gaps, frac) sorted by bucket.
    """
    from ..stages.common import duckdb_round

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy()
        day = t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table(
            {
                "cust": pa.array(cust, type=pa.int64()),
                "okey": t["o_orderkey"],
                "day": pa.array(day, type=pa.int64()),
                "part": pa.array(cust % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {"week_bucket": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
    )

    def gaps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cust", "ascending"), ("day", "ascending"), ("okey", "ascending")])
        cust = g["cust"].to_numpy()
        if len(cust) < 2:
            return empty
        m = np.diff(cust) == 0
        if not m.any():
            return empty
        gap = np.diff(g["day"].to_numpy())[m]
        bucket = gap // IPI_WEEK_DAYS
        uniq, cnt = np.unique(bucket, return_counts=True)
        return pa.table(
            {
                "week_bucket": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("week_bucket")
        .aggregate(Sum("n", alias_name="n_gaps"))
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by("week_bucket")
        n = t["n_gaps"].to_numpy().astype(np.float64)
        frac = duckdb_round(n / n.sum(), 6)
        return t.append_column("frac", pa.array(frac, type=pa.float64()))

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cohort_ltv (customer-cohort cumulative revenue curves)
# ---------------------------------------------------------------------------


def cohort_ltv(sf_dir: str) -> rd.Dataset:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, revenue accumulated by months-since-cohort — the LTV table
    every subscription / marketplace finance review reads
    (user_retention counts survivors; this follows the money).

    Month arithmetic is exact integer epoch-month (year·12 + month
    from the epoch-day via the civil-from-days algorithm, mirrored in
    SQL date_part); revenue is exact cents through the aggregate tree;
    the cumulative column is a per-cohort cumsum over the (cohorts ×
    ages)-bounded aggregate.

    Scale shape: cohort assignment is ONE (custkey → min month)
    groupby + ONE hash join back to orders (both custkey-partitioned);
    the curve aggregate is (cohort, age)-bounded; the cumsum runs on
    that tiny table.

    Output: (cohort_month, age_months, n_customers, revenue_cents,
    cum_revenue_cents) — n_customers = distinct buyers active in that
    (cohort, age) cell.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.timestamp("us"))
        yr = pa.compute.year(d).to_numpy().astype(np.int64)
        mo = pa.compute.month(d).to_numpy().astype(np.int64)
        cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "cust": t["o_custkey"].cast(pa.int64()),
                "em": pa.array(yr * 12 + (mo - 1), type=pa.int64()),
                "cents": pa.array(cents, type=pa.int64()),
            }
        )

    orders = ds.map_batches(prep, batch_format="pyarrow")
    first = orders.groupby("cust").aggregate(Min("em", alias_name="cohort_em"))
    j = safe_join(orders, first, join_type="inner", num_partitions=4, on=("cust",))

    def curve_partial(t: pa.Table) -> pa.Table:
        cohort = t["cohort_em"].to_numpy()
        age = t["em"].to_numpy() - cohort
        df = pd.DataFrame(
            {"cohort_em": cohort, "age": age, "cents": t["cents"].to_numpy(), "cust": t["cust"].to_numpy()}
        )
        g = df.groupby(["cohort_em", "age"]).agg(
            revenue=("cents", "sum"), customers=("cust", lambda s: len(set(s)))
        ).reset_index()
        # distinct customers cannot combine across batches as a sum —
        # ship the distinct (cohort, age, cust) keys instead
        dk = df[["cohort_em", "age", "cust"]].drop_duplicates()
        return pa.table(
            {
                "cohort_em": pa.array(dk["cohort_em"].to_numpy(), type=pa.int64()),
                "age": pa.array(dk["age"].to_numpy(), type=pa.int64()),
                "cust": pa.array(dk["cust"].to_numpy(), type=pa.int64()),
                "cents": pa.array(
                    df.groupby(["cohort_em", "age", "cust"])["cents"].sum().reindex(
                        pd.MultiIndex.from_frame(dk)
                    ).to_numpy().astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    per_cust = (
        j.map_batches(curve_partial, batch_format="pyarrow")
        .groupby(["cohort_em", "age", "cust"])
        .aggregate(Sum("cents", alias_name="cents"))
    )

    def drop_cust(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_em": t["cohort_em"],
                "age": t["age"],
                "cents": t["cents"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), type=pa.int64()),
            }
        )

    agg = (
        per_cust.map_batches(drop_cust, batch_format="pyarrow")
        .groupby(["cohort_em", "age"])
        .aggregate(Sum("cents", alias_name="revenue_cents"), Sum("one", alias_name="n_customers"))
        .to_pandas()
        .sort_values(["cohort_em", "age"])
        .reset_index(drop=True)
    )
    agg["cum_revenue_cents"] = agg.groupby("cohort_em")["revenue_cents"].cumsum()
    return rd.from_arrow(
        pa.table(
            {
                "cohort_month": pa.array(agg["cohort_em"].to_numpy().astype(np.int64), type=pa.int64()),
                "age_months": pa.array(agg["age"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_customers": pa.array(agg["n_customers"].to_numpy().astype(np.int64), type=pa.int64()),
                "revenue_cents": pa.array(agg["revenue_cents"].to_numpy().astype(np.int64), type=pa.int64()),
                "cum_revenue_cents": pa.array(
                    agg["cum_revenue_cents"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# ship_delay_quantiles (per-priority fulfillment-latency SLA table)
# ---------------------------------------------------------------------------

SLA_QS = (0.5, 0.9, 0.99)


def ship_delay_quantiles(sf_dir: str, qs: tuple[float, ...] = SLA_QS) -> rd.Dataset:
    """Per-priority fulfillment-latency SLA: exact p50/p90/p99 of the
    order→ship delay in days, one row per (o_orderpriority, q) — the
    SLA table an ops review reads before promising delivery windows
    (blame_suppliers names the laggards; this quantifies the promise).

    Exactness: delays are exact integer day differences (first
    lineitem ship date per order minus order date); per-priority
    quantiles are exact rank selections (quantile_disc convention) in
    key-partitioned map_groups — per-key rows bound task memory, the
    event_value_quantiles contract.

    Scale shape: ONE orderkey hash join (lineitem min-shipdate per
    order ⋈ orders) + ONE priority-keyed map_groups; at 10^12 rows the
    per-priority groups recurse the histogram+refine pattern instead
    of an in-task sort (the value_quantiles discipline).

    Output: (o_orderpriority, q, delay_days).
    """
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]
    )

    def ship_partial(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(), "sday": day})
        g = df.groupby("l_orderkey", sort=False)["sday"].min().reset_index()
        return pa.table(
            {
                "l_orderkey": pa.array(g["l_orderkey"].to_numpy(), type=pa.int64()),
                "sday": pa.array(g["sday"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    first_ship = (
        li.map_batches(ship_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Min("sday", alias_name="sday"))
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def oday(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "oday": pa.array(d, type=pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    j = safe_join(
        orders.map_batches(oday, batch_format="pyarrow"),
        first_ship,
        join_type="inner",
        num_partitions=4,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def delay(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "delay": pa.array(
                    t["sday"].to_numpy() - t["oday"].to_numpy(), type=pa.int64()
                ),
            }
        )

    def per_prio(g: pd.DataFrame) -> pd.DataFrame:
        import math as m

        v = np.sort(g["delay"].to_numpy(), kind="stable")
        n = len(v)
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]] * len(qs),
                "q": np.asarray(qs, dtype=np.float64),
                "delay_days": [int(v[max(1, m.ceil(q * n)) - 1]) for q in qs],
            }
        )

    return (
        j.map_batches(delay, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(per_prio, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# supplier_ontime_wilson (reliability ranking with shrinkage-safe CI)
# ---------------------------------------------------------------------------

WILSON_Z = 1.96
ONTIME_DAYS = 60  # a line shipped within 60 days of its order is on time


def supplier_ontime_wilson(sf_dir: str, k: int = 15) -> rd.Dataset:
    """Supplier reliability ranked by the WILSON lower bound of the
    on-time-ship rate (Wilson 1927; the "how not to sort by average
    rating" fix): a 3/3 supplier must not outrank a 97/100 one, so the
    ranking key is the 95% lower confidence bound, not the raw rate —
    the shrinkage-safe leaderboard behind supplier scorecards
    (eb_shrunk_rates is the Bayesian sibling on cells; this is the
    frequentist one on suppliers).

    Exactness: (n, on_time) counts are exact int64; rate and the
    Wilson bound are mirrored float expressions; ranking is (bound
    DESC, suppkey ASC) — deterministic.

    Scale shape: ONE orderkey hash join (order dates onto lineitem) +
    map-side (supplier, n, on) combiner -> supplier-bounded groupby ->
    driver top-k on the bounded supplier table.

    Output: top-k rows (l_suppkey, n_lines, n_ontime, rate,
    wilson_lo).
    """
    from ..stages.common import duckdb_round

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    )
    j = safe_join(li, orders, join_type="inner", num_partitions=4, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        sday = t["l_shipdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        oday = t["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        on = (sday - oday <= ONTIME_DAYS).astype(np.int64)
        df = pd.DataFrame({"s": t["l_suppkey"].to_numpy(), "on": on})
        g = df.groupby("s", sort=False).agg(n=("on", "size"), on=("on", "sum")).reset_index()
        return pa.table(
            {
                "l_suppkey": pa.array(g["s"].to_numpy(), type=pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "on": pa.array(g["on"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("n", alias_name="n_lines"), Sum("on", alias_name="n_ontime"))
        .to_pandas()
    )
    n = agg["n_lines"].to_numpy().astype(np.float64)
    p = agg["n_ontime"].to_numpy().astype(np.float64) / n
    z2 = WILSON_Z * WILSON_Z
    lo = (p + z2 / (2.0 * n) - WILSON_Z * np.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) / (
        1.0 + z2 / n
    )
    agg["rate"] = duckdb_round(p, 6)
    agg["wilson_lo"] = duckdb_round(lo, 6)
    agg = agg.sort_values(["wilson_lo", "l_suppkey"], ascending=[False, True]).head(k)
    return rd.from_arrow(
        pa.table(
            {
                "l_suppkey": pa.array(agg["l_suppkey"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_lines": pa.array(agg["n_lines"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_ontime": pa.array(agg["n_ontime"].to_numpy().astype(np.int64), type=pa.int64()),
                "rate": pa.array(agg["rate"].to_numpy(), type=pa.float64()),
                "wilson_lo": pa.array(agg["wilson_lo"].to_numpy(), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# pps_sample (systematic probability-proportional-to-size selection)
# ---------------------------------------------------------------------------

PPS_N = 10


def pps_sample(sf_dir: str, n_sel: int = PPS_N) -> rd.Dataset:
    """Systematic PPS sample of suppliers, selection probability
    proportional to |account balance| — the survey-sampling workhorse
    (audit sampling, monetary-unit sampling in accounting): walk the
    cumulative size axis and select the unit containing each of n
    equally-spaced thresholds.  Deterministic variant: thresholds at
    the STRATUM MIDPOINTS ((2k+1)·T / 2n, no RNG — the fixtures-wide
    no-randomness rule), selection decided by EXACT integer
    cross-multiplication (cum_prev·2n <= (2k+1)·T < cum_i·2n).

    Large units may be selected multiple times (certainty units —
    reported once per threshold, the MUS convention).

    Scale shape: sizes reduce once; the cumulative axis is the
    global_row_numbers two-phase pattern (per-shard sums -> offsets
    broadcast -> local cumsum); threshold containment is a binary
    search per k on the shard-bounded table (driver-side here, the
    supplier dim is bounded; at fact scale ship thresholds to shards).
    Output: (k, s_suppkey, size_cents, cum_before_cents).
    """
    sup = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_acctbal"]
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = np.abs(np.floor(t["s_acctbal"].to_numpy() * 100.0 + 0.5)).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"].cast(pa.int64()),
                "size_cents": pa.array(cents, type=pa.int64()),
            }
        )

    tbl = (
        sup.map_batches(prep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    sizes = tbl["size_cents"].to_numpy().astype(object)
    cum = np.concatenate([[0], np.cumsum(sizes)])
    total = int(cum[-1])
    rows = {"k": [], "s_suppkey": [], "size_cents": [], "cum_before_cents": []}
    for k in range(n_sel):
        # unit i selected iff cum[i]·2n <= (2k+1)·T < cum[i+1]·2n
        target = (2 * k + 1) * total
        i = int(np.searchsorted(np.array([int(c) * 2 * n_sel for c in cum]), target, side="right")) - 1
        i = min(max(i, 0), len(tbl) - 1)
        rows["k"].append(k)
        rows["s_suppkey"].append(int(tbl["s_suppkey"][i]))
        rows["size_cents"].append(int(tbl["size_cents"][i]))
        rows["cum_before_cents"].append(int(cum[i]))
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rows["k"], type=pa.int64()),
                "s_suppkey": pa.array(rows["s_suppkey"], type=pa.int64()),
                "size_cents": pa.array(rows["size_cents"], type=pa.int64()),
                "cum_before_cents": pa.array(rows["cum_before_cents"], type=pa.int64()),
            }
        )
    )
