"""BPE tokenizer training + application over the ``documents`` table.

The tokenizer-training half of a corpus pipeline (vocab_coverage_curve
and subword_stats audit an EXISTING tokenization; this LEARNS one):
byte-pair-encoding merge rules from corpus word frequencies, then a
distributed apply pass measuring the learned tokenizer's compression.

Scale discipline: the corpus-scale piece is the word-frequency
reduction (map-side Counter combiners → one vocabulary-bounded
shuffle — the unigram_logprob shape).  Merge LEARNING then runs on
the vocab-sized table (the standard split: HF/SentencePiece trainers
likewise learn from word counts, not the token stream).  The APPLY
pass broadcasts the learned merge ranks and encodes per batch with a
per-word memo in actor state (ST4), so each distinct word is encoded
once per worker, not once per occurrence.

Determinism: merge selection is (pair_count DESC, left ASC, right ASC);
occurrences merge left-to-right non-overlapping — no RNG, no order
dependence, which is what makes the learned table golden-checkable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

BPE_N_MERGES = 20


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def word_counts(sf_dir: str) -> rd.Dataset:
    """Corpus → (word, n) via map-side Counter combiners (the
    single-space-lowercase convention shared with unigram_logprob)."""
    from collections import Counter

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split(" "))
        words = list(c.keys())
        return pa.table(
            {
                "word": pa.array(words, type=pa.string()),
                "n": pa.array([c[w] for w in words], type=pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").groupby("word").aggregate(Sum("n", alias_name="n"))


def merge_word(symbols: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Merge all LEFT-TO-RIGHT non-overlapping (left, right) adjacencies."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_merges(words: list[str], counts: list[int], n_merges: int) -> list[tuple[str, str, int]]:
    """Standard BPE merge learning from a word-frequency table.

    Returns [(left, right, pair_count)] in learned order.  Pair counts
    are occurrence-weighted (each adjacent position counts, scaled by
    word frequency); selection ties break lexicographically.
    """
    seqs: dict[tuple[str, ...], int] = {}
    for w, c in zip(words, counts):
        k = tuple(w)
        if not k:
            continue
        seqs[k] = seqs.get(k, 0) + int(c)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, c in seqs.items():
            ns = merge_word(seq, left, right)
            new_seqs[ns] = new_seqs.get(ns, 0) + c
        seqs = new_seqs
    return merges


def bpe_merges(sf_dir: str, n_merges: int = BPE_N_MERGES) -> rd.Dataset:
    """Learned BPE merge table: (merge_rank, left, right, pair_count).

    One distributed word-count reduction; the merge loop runs on the
    vocabulary-bounded result (the vocab_coverage_curve discipline —
    driver work proportional to vocabulary, never to corpus rows).
    """
    wc = word_counts(sf_dir).to_pandas()
    merges = learn_merges(wc["word"].tolist(), wc["n"].tolist(), n_merges)
    return rd.from_arrow(
        pa.table(
            {
                "merge_rank": pa.array(np.arange(1, len(merges) + 1, dtype=np.int64)),
                "left": pa.array([m[0] for m in merges], type=pa.string()),
                "right": pa.array([m[1] for m in merges], type=pa.string()),
                "pair_count": pa.array([m[2] for m in merges], type=pa.int64()),
            }
        )
    )


def encode_word(word: str, merges: list[tuple[str, str]]) -> int:
    """Subword count of ``word`` under the learned merges (rank order)."""
    seq: tuple[str, ...] = tuple(word)
    for left, right in merges:
        if len(seq) < 2:
            break
        seq = merge_word(seq, left, right)
    return len(seq)


def bpe_encode_stats(sf_dir: str, n_merges: int = BPE_N_MERGES) -> rd.Dataset:
    """Distributed APPLY of the learned tokenizer: per language, token
    and subword totals + the compression ratio subwords/token — the
    fertility metric a tokenizer is judged by across domains.

    The merge list broadcasts via ray.put; encoding memoizes per WORD
    in actor state, so per-batch cost is distinct-words, not tokens.
    Output: (lang, n_tokens, n_subwords, subwords_per_token).
    """
    from ..stages.common import duckdb_round

    wc = word_counts(sf_dir).to_pandas()  # bounded: distinct-word vocabulary (sublinear in corpus)
    merges = [(m[0], m[1]) for m in learn_merges(wc["word"].tolist(), wc["n"].tolist(), n_merges)]
    mref = ray.put(merges)

    class Encode:
        def __init__(self):
            self.merges = ray.get(mref)
            self.memo: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            langs = t["lang"].to_pylist()
            n_tok = np.zeros(t.num_rows, dtype=np.int64)
            n_sub = np.zeros(t.num_rows, dtype=np.int64)
            for i, s in enumerate(t["text"].to_pylist()):
                toks = s.lower().split(" ")
                n_tok[i] = len(toks)
                tot = 0
                for w in toks:
                    v = self.memo.get(w)
                    if v is None:
                        v = encode_word(w, self.merges)
                        self.memo[w] = v
                    tot += v
                n_sub[i] = tot
            return pa.table(
                {
                    "lang": pa.array(langs, type=pa.string()),
                    "n_tok": pa.array(n_tok),
                    "n_sub": pa.array(n_sub),
                }
            )

    agg = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(Encode, batch_format="pyarrow", batch_size=2048, concurrency=(1, 8))
        .groupby("lang")
        .aggregate(Sum("n_tok", alias_name="n_tokens"), Sum("n_sub", alias_name="n_subwords"))
    )

    def finish(t: pa.Table) -> pa.Table:
        r = t["n_subwords"].to_numpy().astype(np.float64) / t["n_tokens"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "n_subwords": pc.cast(t["n_subwords"], pa.int64()),
                "subwords_per_token": pa.array(duckdb_round(r, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
