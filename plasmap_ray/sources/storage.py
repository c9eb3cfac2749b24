"""Storage adapter — one layout behind a small protocol.

The reference runs SIX pluggable storage backends behind the
``MappingService`` trait (dal/.../MappingService.scala:13-47 with
Mongo/MySQL/Postgres/Redis/Riak impls) plus Cassandra data tables and
an Elasticsearch index.  The rebuild needs exactly ONE columnar layout:
cell-partitioned Parquet directories (the driver's target format is
Lance; ``lance`` is not installable in this sandbox, so the adapter
keeps the seam — swap :class:`ParquetTable` for a LanceTable with the
same four methods when available).

Layout written by :meth:`write`: one directory per partition key value
(``cell=<id>/``), the cell-keyed table layout that replaces the
reference's (bb, osmid) Cassandra partition key (OsmStorageService.scala:186-198).
"""

from __future__ import annotations

import glob
import os
from typing import Protocol

import pyarrow.dataset as pads
import ray.data as rd


class Table(Protocol):
    """The storage seam (MappingService-trait analogue)."""

    def write(self, ds: rd.Dataset, partition_col: str | None = None) -> None: ...

    def scan(self, columns: list[str] | None = None, filter=None) -> rd.Dataset: ...

    def scan_partition(self, value) -> rd.Dataset: ...

    def partitions(self) -> list[str]: ...


class ParquetTable:
    """Partitioned-Parquet implementation of the storage seam."""

    def __init__(self, root: str, partition_col: str | None = None):
        self.root = root
        self.partition_col = partition_col

    def write(self, ds: rd.Dataset, partition_col: str | None = None) -> None:
        partition_col = partition_col or self.partition_col
        os.makedirs(self.root, exist_ok=True)
        if partition_col:
            ds.write_parquet(self.root, partition_cols=[partition_col])
        else:
            ds.write_parquet(self.root)

    def scan(self, columns: list[str] | None = None, filter=None) -> rd.Dataset:
        """Pruned read: pass ``columns`` and a pyarrow dataset expression
        ``filter`` so only needed columns / row groups / hive partitions
        leave storage."""
        return rd.read_parquet(self.root, columns=columns, filter=filter)

    def scan_partition(self, value) -> rd.Dataset:
        """Partition-pruned point read (the findBB cell lookup,
        OsmStorageService.scala:149-174): only that partition's files
        are opened."""
        if not self.partition_col:
            raise ValueError("table was not written with a partition column")
        return rd.read_parquet(os.path.join(self.root, f"{self.partition_col}={value}"))

    def partitions(self) -> list[str]:
        if not self.partition_col:
            return []
        return sorted(
            os.path.basename(p).split("=", 1)[1]
            for p in glob.glob(os.path.join(self.root, f"{self.partition_col}=*"))
        )

    def count_partition(self, value) -> int:
        """Metadata-only count (countBB analogue, OsmStorageService.scala:176-184):
        parquet row-group stats, no data read."""
        total = 0
        for f in glob.glob(os.path.join(self.root, f"{self.partition_col}={value}", "*.parquet")):
            total += pads.dataset(f).count_rows()
        return total


def read_image_table(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the image+caption table (input_hint schema: image_id, bytes,
    w, h, fmt, caption, phash) from Lance or Parquet by extension.

    The production contract stores image corpora as LANCE tables
    (``ray.data.read_lance`` streams fragments with column projection,
    the same pruned-scan shape as the parquet path).  The ``lance``
    package is not installable in this sandbox, so the parquet branch
    carries all tests/benches; the Lance branch is the same two lines
    with the reader swapped and fails with a clear message when the
    dependency is absent.
    """
    if path.endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as e:  # pragma: no cover - dependency absent in sandbox
            raise ImportError(
                "reading .lance tables requires the 'lance' package "
                "(pip install pylance); this environment ships parquet fixtures instead"
            ) from e
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)
