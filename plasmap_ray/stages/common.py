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
