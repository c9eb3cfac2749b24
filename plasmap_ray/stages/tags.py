"""Tag-normalization stages (M4/M5) + canonical vocabulary.

Reference: ``OsmObjectMapper.extractTags`` intersects an object's tags
with a 996-entry canonical (key, value) vocabulary and dedupes
(util/.../OsmObjectMapper.scala:1026-1028, vocabulary :14-1010);
``ProcessingUtilities.toIndex`` keeps only name/address keys from a
21-key whitelist (processing/.../ProcessingUtilities.scala:47-72).

Here tags travel as Arrow ``map<string,string>`` (or list<struct<key,value>>)
columns; the vocabulary is a worker-global frozenset (module constant —
loaded once per process, ST4 pattern) and filtering is per-batch with
vectorized flattening.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import pois as poireg

# Canonical (key, value) vocabulary: the reference's full 862-pair
# canonical mapping list (tag_vocab.py, extracted from
# OsmObjectMapper.scala:14-1010) plus every registry category tag and
# the admin-boundary tags the spatial pipelines rely on.
from .tag_vocab import CANONICAL_VOCAB

CANONICAL_TAGS: frozenset[tuple[str, str]] = (
    CANONICAL_VOCAB
    | frozenset(tag for tags in poireg.CATEGORIES.values() for tag in tags)
    | frozenset(
        [
            ("boundary", "administrative"),
            ("admin_level", "6"),
            ("admin_level", "8"),
            ("admin_level", "10"),
            ("type", "multipolygon"),
        ]
    )
)

# M5: keys whose values feed the name index (reference whitelist of 21
# name/addr keys, ProcessingUtilities.scala:47-72)
INDEX_KEYS: frozenset[str] = frozenset(
    [
        "name",
        "name:en",
        "name:de",
        "int_name",
        "loc_name",
        "old_name",
        "alt_name",
        "official_name",
        "short_name",
        "addr:street",
        "addr:city",
        "addr:postcode",
        "addr:housenumber",
        "addr:country",
        "addr:suburb",
        "addr:place",
        "addr:hamlet",
        "addr:full",
        "place_name",
        "postal_code",
        "reg_name",
    ]
)


def _flatten_tags(col) -> tuple[np.ndarray, list[str], list[str]]:
    """map<string,string> column -> (row_idx, keys, values) flat view."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.map_length(col).to_numpy(zero_copy_only=False) if hasattr(pc, "map_length") else None
    if lengths is None:
        lengths = np.array([len(v) for v in col.to_pylist()], dtype=np.int64)
    row_idx = np.repeat(np.arange(len(col), dtype=np.int64), lengths)
    keys = col.keys.to_pylist()
    values = col.items.to_pylist()
    return row_idx, keys, values


def normalize_tags(batch: pa.Table, tags_col: str = "tags") -> pa.Table:
    """M4: intersect tags with the canonical vocabulary (distinct).

    Out-of-vocabulary tags are dropped; the surviving pairs are unique
    per row.  The vocabulary test is a frozenset membership on flattened
    (key, value) pairs — no Python per-row loop over rows, one pass over
    the flattened pair list.
    """
    col = batch[tags_col]
    row_idx, keys, values = _flatten_tags(col)
    keep = np.fromiter(
        ((k, v) in CANONICAL_TAGS for k, v in zip(keys, values)), dtype=bool, count=len(keys)
    )
    out_rows: list[list[tuple[str, str]]] = [[] for _ in range(batch.num_rows)]
    seen: set[tuple[int, str, str]] = set()
    for i in np.nonzero(keep)[0]:
        key = (int(row_idx[i]), keys[i], values[i])
        if key not in seen:
            seen.add(key)
            out_rows[key[0]].append((keys[i], values[i]))
    new_col = pa.array(out_rows, type=pa.map_(pa.string(), pa.string()))
    i = batch.column_names.index(tags_col)
    return batch.set_column(i, tags_col, new_col)


def project_index_tags(batch: pa.Table, tags_col: str = "tags", id_col: str = "id") -> pa.Table:
    """M5: (id, tags) -> (id, key, value) rows for name-index keys only;
    rows with no indexable tags vanish (filter(nonEmpty))."""
    col = batch[tags_col]
    row_idx, keys, values = _flatten_tags(col)
    keep = np.fromiter((k in INDEX_KEYS for k in keys), dtype=bool, count=len(keys))
    ids = batch[id_col].to_numpy()
    sel = np.nonzero(keep)[0]
    return pa.table(
        {
            id_col: pa.array(ids[row_idx[sel]], type=pa.int64()),
            "key": pa.array([keys[i] for i in sel], type=pa.string()),
            "value": pa.array([values[i] for i in sel], type=pa.string()),
        }
    )


def has_tag_mask(batch: pa.Table, key: str, value: str, tags_col: str = "tags") -> np.ndarray:
    """tags.contains(OsmTag(k, v)) filter predicate (Queries.scala:296)."""
    row_idx, keys, values = _flatten_tags(batch[tags_col])
    hit = np.zeros(batch.num_rows, dtype=bool)
    for i in range(len(keys)):
        if keys[i] == key and values[i] == value:
            hit[row_idx[i]] = True
    return hit
