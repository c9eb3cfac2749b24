"""Shared batch-UDF helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def duckdb_round(x: np.ndarray, ndigits: int) -> np.ndarray:
    """Bit-exact replica of DuckDB's ROUND on DOUBLE:
    ``std::round(x * 10^d) / 10^d`` (half away from zero).

    Arrow's pc.round uses a different algorithm (multiply by the inverse
    power) that can land on a DIFFERENT nearest double (62.800000000000004
    vs 62.8), which breaks exact-value comparison against the SQL oracle;
    this replica converges sums that differ only by summation-order ulps
    onto the identical rounded double.
    """
    p = 10.0 ** ndigits
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p


def round_columns(batch: pa.Table, cols: tuple[str, ...], ndigits: int = 2) -> pa.Table:
    for c in cols:
        i = batch.column_names.index(c)
        vals = batch[c]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        rounded = duckdb_round(vals.to_numpy(zero_copy_only=False), ndigits)
        batch = batch.set_column(i, c, pa.array(rounded, type=pa.float64()))
    return batch


def cast_columns(batch: pa.Table, casts: dict[str, pa.DataType]) -> pa.Table:
    for c, typ in casts.items():
        i = batch.column_names.index(c)
        batch = batch.set_column(i, c, pc.cast(batch[c], typ))
    return batch


def join_ready(ds, batch_size: int = 8192, num_blocks: int | None = None):
    """Scrub a Dataset so it is SAFE as a ``Dataset.join`` input.

    Ray 2.49.2's hash-shuffle join breaks when ANY input block has 0
    rows: the aggregator rebuilds that block's partition without a
    schema, and Acero raises ``ArrowInvalid: No match or multiple
    matches for key field reference ...`` (or, under load, silently
    mismatches — the round-2 ``radius_of_gyration`` flake).  Partitions
    that receive NO block at all are handled fine — only 0-row blocks
    poison it, and FILTER stages, selective map stages, and prior JOIN
    outputs can all emit them.  The scrub is an identity ``map_batches``
    with a row-count batch target: Ray's batch formation BUNDLES blocks
    until ``batch_size`` rows, so 0-row blocks merge into their
    neighbors and never reach the join — a streaming pass (Arrow
    slices, no repartition barrier), safe for fact-sized sides too.
    An ALL-empty dataset still breaks — callers guard that with a
    ``count() == 0`` early return where emptiness is reachable.
    ``num_blocks`` is accepted for call-site compatibility and ignored
    (the old repartition workaround).
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow", batch_size=batch_size)


def safe_join(left, right, **kwargs):
    """``left.join(right, ...)`` with BOTH inputs scrubbed through
    :func:`join_ready`.  Every ``Dataset.join`` in this repo goes
    through here: the 0-row-block poison (see ``join_ready``) can reach
    a join from any filter, selective map, aggregate, or prior join on
    EITHER side, and the failure is nondeterministic under load — the
    scrub is one streaming identity pass per side (Arrow slicing, no
    barrier), which is cheap insurance at any scale.

    LIMIT: an ALL-empty side (0 rows total) still breaks — Ray loses
    the side's schema entirely, so no scrub can restore it.  Sites
    whose predicate parameters can legitimately select nothing guard
    with a ``limit(1).count() == 0`` probe and a TYPED empty result
    (see market_share / bloom_semi_join / min_cost_supplier)."""
    return join_ready(left).join(join_ready(right), **kwargs)
