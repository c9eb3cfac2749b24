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


def join_ready(ds, num_blocks: int = 4):
    """Compact a Dataset so it is SAFE as a ``Dataset.join`` input.

    Ray 2.49.2's hash-shuffle join breaks when ANY input block has 0
    rows: the aggregator rebuilds that block's partition without a
    schema, and Acero raises ``ArrowInvalid: No match or multiple
    matches for key field reference ...`` (or, under load, silently
    mismatches — the round-2 ``radius_of_gyration`` flake).  Partitions
    that receive NO block at all are handled fine — only 0-row blocks
    poison it, and any FILTER stage can emit them.  ``repartition``
    merges empty blocks away, so every filter-derived join input must
    pass through here.  An all-empty dataset still breaks — callers
    guard that with a ``count() == 0`` early return where emptiness is
    reachable.
    """
    return ds.repartition(num_blocks)
