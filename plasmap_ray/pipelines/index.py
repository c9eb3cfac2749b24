"""Name/text index pipelines — the ES layer rebuild (S11/S12/J8).

The reference bulk-indexes name/address tags into Elasticsearch
(ElasticIndexingService.indexOsmObjectSink, dal/.../ElasticIndexingService.scala:102-125)
and resolves name queries through scroll search + id joins
(searchOsmObjectSource :127-137; relationByNameAndType,
query-engine/.../Queries.scala:279-299).  The rebuild:

- the index is a SIDECAR TABLE ``(token, doc_id)`` built by a
  tokenize-explode (the inverted index), written as partitioned parquet;
- search = filter the index by token -> semi-join ids back to the
  source table (J8's index-hits -> id-join shape);
- tokenization is single-space lowercase split, mirrored exactly by the
  DuckDB oracle via ``string_split(lower(text), ' ')``.

M5 analogue: only name-bearing content is indexed (here: all caption
tokens; a key-whitelist hook is exposed for tagged tables).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def tokenize_explode(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, text) -> (token, id) inverted-index rows, deduped per doc."""
    toks = pc.split_pattern(pc.utf8_lower(batch[text_col]), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy()
    ids = np.repeat(batch[id_col].to_numpy(), lengths)
    flat = toks.flatten().to_pylist()
    # per-doc dedup (a token counts once per document)
    tab = pa.table({"token": pa.array(flat, type=pa.string()), id_col: pa.array(ids, type=pa.int64())})
    return tab.group_by(["token", id_col]).aggregate([]).select(["token", id_col])


def build_index(sf_dir: str) -> rd.Dataset:
    """The inverted-index sidecar table (token, doc_id)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(tokenize_explode, batch_format="pyarrow")


def search_by_token(sf_dir: str, token: str) -> rd.Dataset:
    """J8: index filter -> id semi-join back to the source table."""
    hits = build_index(sf_dir).filter(expr=f"token == '{token}'")
    docs = _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])
    joined = hits.join(docs, join_type="inner", num_partitions=4, on=("doc_id",))
    return joined.select_columns(["doc_id", "lang", "n_chars"])


def token_doc_frequency(sf_dir: str, min_docs: int = 50) -> rd.Dataset:
    """Index statistics: tokens by document frequency (the index's own
    aggregate; S8 counter analogue over the sidecar)."""
    idx = build_index(sf_dir)
    freq = idx.groupby("token").aggregate(Count(alias_name="n_docs"))
    return freq.filter(expr=f"n_docs >= {min_docs}")


def anti_search(sf_dir: str, token: str) -> rd.Dataset:
    """Anti-join: documents NOT containing ``token``.

    The broadcast anti-join pattern (ray_guide 'Semi / anti join'):
    collect the (small) matching id set once, ``ray.put`` it, and
    filter the big side map-side against the broadcast set — no
    shuffle.  Complements J8's semi-join."""
    import ray

    hit_ids = set(
        build_index(sf_dir).filter(expr=f"token == '{token}'").unique("doc_id")
    )
    ref = ray.put(hit_ids)

    def anti(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        blocked = ray.get(ref)
        mask = np.fromiter((int(i) not in blocked for i in ids), dtype=bool, count=len(ids))
        return batch.filter(pa.array(mask))

    docs = _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])
    return docs.map_batches(anti, batch_format="pyarrow")
