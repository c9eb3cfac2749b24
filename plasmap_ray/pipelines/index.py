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
    # stay columnar: list-flatten keeps the token strings zero-copy
    tab = pa.table({"token": toks.flatten(), id_col: pa.array(ids, type=pa.int64())})
    # per-doc dedup (a token counts once per document)
    return tab.group_by(["token", id_col]).aggregate([]).select(["token", id_col])


def build_index(sf_dir: str) -> rd.Dataset:
    """The inverted-index sidecar table (token, doc_id)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(tokenize_explode, batch_format="pyarrow")


def search_by_token(sf_dir: str, token: str) -> rd.Dataset:
    """J8: index filter -> broadcast id SEMI-join back to the source
    table.  The hit-id set is small (one token's postings) — collect it
    once, ship via ray.put, filter the big side map-side: no shuffle
    (the round-1 hash-shuffle join moved the whole docs table for a
    385-row hit set)."""
    import ray

    hit_ids = set(build_index(sf_dir).filter(expr=f"token == '{token}'").unique("doc_id"))
    ref = ray.put(hit_ids)

    def semi(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        wanted = ray.get(ref)
        mask = np.fromiter((int(i) in wanted for i in ids), dtype=bool, count=len(ids))
        return batch.filter(pa.array(mask))

    docs = _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])
    return docs.map_batches(semi, batch_format="pyarrow")


def search_ranked(sf_dir: str, tokens: tuple[str, ...] = ("spark", "data"), k: int = 20) -> rd.Dataset:
    """J8 with relevance: TF-IDF-scored search (reference parity with
    ``IndexSearchHit(id, score)``, dal/.../IndexingService.scala:12-14;
    the reference's ES search returns scored hits, the round-1 rebuild
    was a boolean filter).

    score(doc) = Σ_q tf(q, doc) · ln(N / df(q)); per-doc term counts
    stream map-side (the query token set is broadcast-tiny, so no index
    shuffle); df comes from one tiny aggregate; ranking is by the
    ROUNDED score (6 dp) with doc_id tiebreak so the ordering is
    bit-robust across engines.
    """
    import functools
    import math

    from ray.data.aggregate import Count, Sum

    from ..stages.common import duckdb_round

    qtokens = list(tokens)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def term_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy()
        ids = np.repeat(batch["doc_id"].to_numpy(), lengths)
        flat = toks.flatten()
        out_ids, out_tok, out_tf = [], [], []
        for q in qtokens:
            hit = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            if not hit.any():
                continue
            doc_hits, counts = np.unique(ids[hit], return_counts=True)
            out_ids.append(doc_hits)
            out_tok.extend([q] * len(doc_hits))
            out_tf.append(counts)
        if not out_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "token": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "token": pa.array(out_tok, type=pa.string()),
                "tf": pa.array(np.concatenate(out_tf).astype(np.int64)),
            }
        )

    tf_rows = docs.map_batches(term_counts, batch_format="pyarrow").materialize()
    n_docs = docs.count()
    dfs = {r["token"]: r["n_docs"] for r in tf_rows.groupby("token").aggregate(Count(alias_name="n_docs")).take_all()}  # bounded: vocabulary-sized document frequencies
    idf = {t: math.log(n_docs / dfs[t]) for t in dfs}

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy().astype(np.float64)
        idfv = np.array([idf[t] for t in batch["token"].to_pylist()])
        return pa.table({"doc_id": batch["doc_id"], "partial": pa.array(tfv * idfv, type=pa.float64())})

    scored = (
        tf_rows.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="score"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = duckdb_round(t["score"].to_numpy(zero_copy_only=False), 6)
        return pa.table({"doc_id": t["doc_id"], "score": pa.array(s, type=pa.float64())})

    from .ann import ranked_head

    return ranked_head(
        scored.map_batches(finish, batch_format="pyarrow"), ["score", "doc_id"], "search_rank", k,
        keep=["doc_id", "score"],
    )


def search_bm25(
    sf_dir: str,
    tokens: tuple[str, ...] = ("spark", "data"),
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> rd.Dataset:
    """J8 ranked search, BM25 scoring — TF-IDF (:func:`search_ranked`)
    plus term-frequency saturation and document-length normalization:

        score(d) = Σ_q idf(q) · tf·(k1+1) / (tf + k1·((1-b) + b·dl/avgdl))
        idf(q)   = ln((N - df + 0.5) / (df + 0.5) + 1)

    Same streaming shape as search_ranked: the query token set is
    broadcast-tiny so term counts stream map-side (with the doc length
    attached in the same pass); N / avgdl / df are aggregate-sized.
    Every float expression is associated identically in the SQL mirror
    (literals written as the same sums, e.g. ``(1.2 + 1.0)``, never a
    pre-folded constant) and the ranking key is the 6-dp-rounded score
    with doc_id tiebreak — the bit-robust ranked-query contract.
    """
    import math

    from ray.data.aggregate import Sum

    from ..stages.common import duckdb_round

    qtokens = list(tokens)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def term_counts_dl(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
        ids_arr = batch["doc_id"].to_numpy()
        ids = np.repeat(ids_arr, lengths)
        flat = toks.flatten()
        order = np.argsort(ids_arr, kind="stable")
        out = []
        for q in qtokens:
            hit = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            if not hit.any():
                continue
            doc_hits, counts = np.unique(ids[hit], return_counts=True)
            pos = order[np.searchsorted(ids_arr[order], doc_hits)]
            out.append((doc_hits, counts.astype(np.int64), lengths[pos], q))
        if not out:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "token": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([o[0] for o in out]), type=pa.int64()),
                "token": pa.array(sum(([o[3]] * len(o[0]) for o in out), []), type=pa.string()),
                "tf": pa.array(np.concatenate([o[1] for o in out])),
                "dl": pa.array(np.concatenate([o[2] for o in out])),
            }
        )

    def dl_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        n = int(pc.sum(pc.list_value_length(toks)).as_py() or 0)
        return pa.table({"dl": pa.array([n], type=pa.int64())})

    tf_rows = docs.map_batches(term_counts_dl, batch_format="pyarrow").materialize()
    n_docs = docs.count()
    total_tokens = int(docs.map_batches(dl_partial, batch_format="pyarrow").sum("dl"))
    avgdl = total_tokens / n_docs  # exact ints -> one float64 division
    dfs = {r["token"]: r["n_docs"] for r in tf_rows.groupby("token").aggregate(Count(alias_name="n_docs")).take_all()}  # bounded: vocabulary-sized document frequencies
    idf = {t: math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0) for t in dfs}

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy().astype(np.float64)
        dlv = batch["dl"].to_numpy().astype(np.float64)
        idfv = np.array([idf[t] for t in batch["token"].to_pylist()])
        partial = idfv * tfv * (k1 + 1.0) / (tfv + k1 * ((1.0 - b) + b * (dlv / avgdl)))
        return pa.table({"doc_id": batch["doc_id"], "partial": pa.array(partial, type=pa.float64())})

    scored = (
        tf_rows.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("partial", alias_name="score"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = duckdb_round(t["score"].to_numpy(zero_copy_only=False), 6)
        return pa.table({"doc_id": t["doc_id"], "score": pa.array(s, type=pa.float64())})

    from .ann import ranked_head

    return ranked_head(
        scored.map_batches(finish, batch_format="pyarrow"), ["score", "doc_id"], "bm25_rank", k,
        keep=["doc_id", "score"],
    )


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


def doc_keywords(sf_dir: str) -> rd.Dataset:
    """Per-document keyword extraction: each doc's top token by
    TF-IDF (tf · ln(N/df), ties broken token-ascending) — the labeling
    pass behind corpus browsing and weak-supervision features
    (search_ranked's scoring turned inside out: best TERM per doc
    instead of best DOC per term).

    Scale shape: per-batch (doc, token, tf) counts stream map-side;
    the df table is token-bounded (one tiny aggregate broadcast back);
    the per-doc argmax is a doc-keyed reduce over its own tokens.
    Ranking compares the UNROUNDED score (identical float products in
    both engines); output rounds to 6 dp.
    Output: (doc_id, keyword, score).
    """
    import math

    from ray.data.aggregate import Count

    from ..stages.common import duckdb_round

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def term_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy()
        ids = np.repeat(batch["doc_id"].to_numpy(), lengths)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(ids.astype("U20"), "\x00"), flat.astype("U64"))
        uk, idx, cnt = np.unique(key, return_index=True, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], type=pa.int64()),
                "token": pa.array(flat[idx], type=pa.string()),
                "tf": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    tf_rows = docs.map_batches(term_counts, batch_format="pyarrow").materialize()
    n_docs = docs.count()
    dfs = {
        r["token"]: r["n_docs"]
        for r in tf_rows.groupby("token").aggregate(Count(alias_name="n_docs")).take_all()
    }
    idf = {t: math.log(n_docs / dfs[t]) for t in dfs}

    def add_part(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy().astype(np.int64)
        return t.append_column("part", pa.array(did % 32, type=pa.int64()))

    def pick(g: pa.Table) -> pa.Table:
        did = g["doc_id"].to_numpy().astype(np.int64)
        if len(did) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "keyword": pa.array([], type=pa.string()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        toks = g["token"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy().astype(np.float64)
        score = tf * np.array([idf[t] for t in toks], dtype=np.float64)
        order = np.lexsort((toks, -score, did))  # doc, then score desc, token asc
        did, toks, score = did[order], toks[order], score[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(did))[0] + 1])
        return pa.table(
            {
                "doc_id": pa.array(did[starts], type=pa.int64()),
                "keyword": pa.array(toks[starts], type=pa.string()),
                "score": pa.array(duckdb_round(score[starts], 6), type=pa.float64()),
            }
        )

    return (
        tf_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pick, batch_format="pyarrow")
        .sort("doc_id")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of the two ranked-search scorers
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard fusion constant (Cormack et al., SIGIR'09)


def rrf_fusion(
    sf_dir: str,
    tokens: tuple[str, ...] = ("spark", "data"),
    k: int = 20,
    kconst: int = RRF_K,
) -> rd.Dataset:
    """Reciprocal-rank fusion of the TF-IDF and BM25 rankings:

        rrf(d) = Σ_lists 1 / (K + rank_list(d))     (absent list -> 0)

    — the standard way to combine retrieval scorers without score
    calibration (ranks only).  Both input rankings are k-bounded, so
    the fusion itself is driver-sized BY CONSTRUCTION (2k rows) — the
    distributed work is entirely inside the two scorers; this is the
    windows.py bounded-finalize discipline, not a corpus collect.

    Ties in the rounded rrf score break by doc_id, the same bit-robust
    ranked-query contract as the inputs.
    """
    r1 = search_ranked(sf_dir, tokens=tokens, k=k).to_pandas()
    r2 = search_bm25(sf_dir, tokens=tokens, k=k).to_pandas()
    rank1 = dict(zip(r1["doc_id"], r1["search_rank"]))
    rank2 = dict(zip(r2["doc_id"], r2["bm25_rank"]))
    ids = sorted(set(rank1) | set(rank2))
    rows = []
    for d in ids:
        a, b = rank1.get(d), rank2.get(d)
        rrf = (1.0 / (kconst + a) if a else 0.0) + (1.0 / (kconst + b) if b else 0.0)
        rows.append((d, round(rrf, 6), int(a or 0), int(b or 0)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rd.from_arrow(
        pa.table(
            {
                "fusion_rank": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "rrf_score": pa.array([r[1] for r in rows], type=pa.float64()),
                "r_tfidf": pa.array([r[2] for r in rows], type=pa.int64()),
                "r_bm25": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# rbo_rankings (Rank-Biased Overlap between the two ranked retrievers)
# ---------------------------------------------------------------------------

RBO_P = 0.9  # persistence: expected viewing depth 1/(1-p) = 10
RBO_FP = 1e12  # fixed-point pitch for the per-depth weighted terms


def rbo_rankings(sf_dir: str, tokens: tuple[str, ...] = ("spark", "data"), k: int = 20, p: float = RBO_P) -> rd.Dataset:
    """Rank-Biased Overlap (Webber et al. 2010, truncated form) between
    the TF-IDF and BM25 rankings of the same query:
    RBO = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d — the top-weighted
    ranking-agreement score that tells a search migration whether the
    two scorers actually order results differently where users look
    (rrf_fusion composes the rankings; this EVALUATES their divergence).

    Exactness: per-depth overlaps are exact integers from the two
    k-bounded rankings; each weighted term is fixed to int64 ONCE
    (pitch 1e12) so the truncated sum is order-free and bit-mirrored.

    Scale shape: all distributed work lives in the two retrievers it
    composes (corpus-scale TF/DF reduces); the RBO arithmetic is
    2k-bounded driver math.  Output: (depth, overlap, agreement, rbo)
    — rbo repeated per depth row.
    """
    from ..stages.common import duckdb_round

    a = search_ranked(sf_dir, tokens=tokens, k=k).to_pandas()
    b = search_bm25(sf_dir, tokens=tokens, k=k).to_pandas()
    a_ids = a.sort_values("search_rank")["doc_id"].to_numpy()
    b_ids = b.sort_values("bm25_rank")["doc_id"].to_numpy()
    depths = np.arange(1, k + 1, dtype=np.int64)
    overlap = np.array(
        [len(set(a_ids[:d]) & set(b_ids[:d])) for d in depths], dtype=np.int64
    )
    agreement = overlap.astype(np.float64) / depths.astype(np.float64)
    terms_fp = np.floor(p ** (depths - 1).astype(np.float64) * agreement * RBO_FP + 0.5).astype(np.int64)
    rbo = (1.0 - p) * (int(terms_fp.sum()) / RBO_FP)
    rbor = float(duckdb_round(np.array([rbo]), 6)[0])
    return rd.from_arrow(
        pa.table(
            {
                "depth": pa.array(depths, type=pa.int64()),
                "overlap": pa.array(overlap, type=pa.int64()),
                "agreement": pa.array(duckdb_round(agreement, 6), type=pa.float64()),
                "rbo": pa.array(np.full(k, rbor), type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# ndcg_eval (graded-relevance ranking quality of both retrievers)
# ---------------------------------------------------------------------------

NDCG_FP = 1e12  # fixed-point pitch for per-rank discounted terms


def _rel_counts(sf_dir: str, tokens: tuple[str, ...]) -> rd.Dataset:
    """(doc_id, rel) for docs with rel > 0: rel = exact count of
    whitespace tokens equal to any query token — the graded-relevance
    truth an offline eval judges rankings against."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    tok_set = set(tokens)

    def rel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        out_i, out_r = [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            r = sum(1 for w in txt.split(" ") if w in tok_set)
            if r:
                out_i.append(int(did))
                out_r.append(r)
        return pa.table(
            {
                "doc_id": pa.array(out_i, type=pa.int64()),
                "rel": pa.array(out_r, type=pa.int64()),
            }
        )

    return ds.map_batches(rel, batch_format="pyarrow")


def ndcg_eval(sf_dir: str, tokens: tuple[str, ...] = ("spark", "data"), k: int = 20) -> rd.Dataset:
    """NDCG@k of the TF-IDF and BM25 retrievers against an EXACT
    graded-relevance truth (rel(doc) = query-token occurrence count):
    DCG = Σ rel_i/log2(i+1) over the retrieved ranking, IDCG the same
    sum over the corpus-ideal top-k — the offline ranking-quality
    number a search migration gates on (rbo_rankings measures the two
    rankings' AGREEMENT; this scores each against ground truth).

    Exactness: relevances are exact integer counts; the ideal top-k is
    an exact (rel DESC, doc_id ASC) selection via the ranked-head
    combiner; each discounted term pins at 1e12 once so both sums are
    order-free int64 and bit-mirrored in the golden recompute.

    Scale shape: ONE corpus scan emits (doc_id, rel>0) rows; the ideal
    head is a per-batch local top-k prune -> tiny global selection
    (the hill_tail_index combiner); retrieved ids are k-bounded driver
    state from the retrievers' own corpus-scale DAGs.

    Output: (retriever, k, n_rel_docs, dcg, idcg, ndcg) — two rows.
    """
    from ..stages.common import duckdb_round

    rels = _rel_counts(sf_dir, tokens).materialize()
    n_rel = rels.count()

    def local_top(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().sort_values(["rel", "doc_id"], ascending=[False, True]).head(k)  # bounded: per-batch top-k prune (inside map, not a driver collect)
        return pa.Table.from_pandas(df, preserve_index=False)

    top = (
        rels.map_batches(local_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rel", "doc_id"], ascending=[False, True])
        .head(k)
    )
    ideal = top["rel"].to_numpy().astype(np.int64)
    rel_map = dict(zip(rels.to_pandas()["doc_id"], rels.to_pandas()["rel"]))

    def dcg_fp(rel_seq: np.ndarray) -> int:
        d = np.arange(1, len(rel_seq) + 1, dtype=np.float64)
        terms = rel_seq.astype(np.float64) / np.log2(d + 1.0)
        return int(np.floor(terms * NDCG_FP + 0.5).astype(np.int64).sum())

    idcg = dcg_fp(ideal)
    rows = {"retriever": [], "k": [], "n_rel_docs": [], "dcg": [], "idcg": [], "ndcg": []}
    for name, ranked, rank_col in (
        ("tfidf", search_ranked(sf_dir, tokens=tokens, k=k).to_pandas(), "search_rank"),
        ("bm25", search_bm25(sf_dir, tokens=tokens, k=k).to_pandas(), "bm25_rank"),
    ):
        ids = ranked.sort_values(rank_col)["doc_id"].to_numpy()
        rel_seq = np.array([rel_map.get(int(i), 0) for i in ids], dtype=np.int64)
        dcg = dcg_fp(rel_seq)
        rows["retriever"].append(name)
        rows["k"].append(k)
        rows["n_rel_docs"].append(n_rel)
        rows["dcg"].append(float(duckdb_round(np.array([dcg / NDCG_FP]), 6)[0]))
        rows["idcg"].append(float(duckdb_round(np.array([idcg / NDCG_FP]), 6)[0]))
        rows["ndcg"].append(float(duckdb_round(np.array([dcg / max(idcg, 1)]), 6)[0]))
    return rd.from_arrow(
        pa.table(
            {
                "retriever": pa.array(rows["retriever"], type=pa.string()),
                "k": pa.array(rows["k"], type=pa.int64()),
                "n_rel_docs": pa.array(rows["n_rel_docs"], type=pa.int64()),
                "dcg": pa.array(rows["dcg"], type=pa.float64()),
                "idcg": pa.array(rows["idcg"], type=pa.float64()),
                "ndcg": pa.array(rows["ndcg"], type=pa.float64()),
            }
        )
    )
