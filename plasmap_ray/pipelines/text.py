"""Text-analysis pipelines over the ``documents`` table.

Training-data operators (prompt requirement beyond the reference's own
inventory): token counting, quality scoring, language-ID, document
fingerprinting.  Hot paths are vectorized pyarrow.compute / pandas str
kernels; the language model (stopword tables, compiled regexes) is
actor-pool state loaded once per worker (ST4 pattern).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def token_stats(sf_dir: str) -> rd.Dataset:
    """Per-document token/char counts (SQL-mirrored; single-space split
    semantics so DuckDB ``string_split(text, ' ')`` agrees exactly)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        t = t.append_column("n_tokens", pc.cast(pc.list_value_length(toks), pa.int64()))
        t = t.append_column("n_chars", pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        return t.drop_columns(["text"])

    return ds.map_batches(stats, batch_format="pyarrow")


def lang_histogram(sf_dir: str) -> rd.Dataset:
    """Document counts + mean length per language tag (A3 analogue)."""
    ds = _read_docs(sf_dir, ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars"))

    import functools

    from ..stages.common import round_columns

    return out.map_batches(functools.partial(round_columns, cols=("avg_chars",), ndigits=4), batch_format="pyarrow")


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "auf", "für", "ein", "eine", "nicht", "im", "zu"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "dans", "pour", "que", "qui", "sur"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una", "es", "por", "con", "para"},
}


class TextQuality:
    """Actor-pool stage: language-ID (stopword voting) + quality scores.

    State built once per actor (__init__): compiled tokenizer regex and
    stopword lookup tables — the ST4 'cold start once per process'
    pattern.  Per batch: vectorized pandas str ops + per-doc token sets.
    """

    def __init__(self):
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        lower = text.str.lower()
        tokens = lower.map(self.word_re.findall)
        n_tok = tokens.map(len).astype(np.int64)
        n_chars = text.str.len().astype(np.int64)

        def vote(toks: list[str]) -> str:
            if not toks:
                return "und"
            best, best_n = "und", 0
            for lang, ws in self.stop.items():
                n = sum(1 for t in toks if t in ws)
                if n > best_n:
                    best, best_n = lang, n
            return best

        batch["pred_lang"] = tokens.map(vote)
        batch["n_tokens"] = n_tok
        batch["mean_token_len"] = tokens.map(lambda ts: float(np.mean([len(t) for t in ts])) if ts else 0.0)
        alpha = text.str.count(r"[A-Za-z]")
        batch["alpha_ratio"] = (alpha / n_chars.clip(lower=1)).astype(np.float64)
        stop_all = frozenset().union(*self.stop.values())
        batch["stop_ratio"] = tokens.map(lambda ts: sum(t in stop_all for t in ts) / max(1, len(ts)))
        # simple composite quality score in [0,1]
        length_ok = ((n_tok >= 10) & (n_tok <= 5000)).astype(float)
        batch["quality"] = (0.4 * length_ok + 0.3 * batch["alpha_ratio"].clip(0, 1) + 0.3 * batch["stop_ratio"].clip(0, 1)).round(6)
        return batch.drop(columns=["text"])


def quality_pipeline(sf_dir: str) -> rd.Dataset:
    """Per-doc language prediction + quality features (actor pool)."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    return ds.map_batches(TextQuality, batch_format="pandas", batch_size=2048, concurrency=(1, 8))


def heavy_hitters(sf_dir: str, k: int = 20, capacity: int = 1 << 15) -> rd.Dataset:
    """Top-k most frequent tokens via a mergeable Space-Saving sketch
    (A4's heavy-hitter sibling: bounded-state summaries folded inside
    Ray's aggregation tree — the driver receives ONE summary, never the
    token stream or even the per-batch summaries).

    Tokenization mirrors the oracle exactly (single-space lowercase
    split).  With ``capacity`` >= the corpus vocabulary no eviction
    occurs and the counts are exact — the regime the driver verifies;
    at 10^12 tokens the capacity caps summary memory and the sketch's
    err bounds (asserted zero here) carry the approximation contract.
    Output: (hh_rank, token, n) ranked by (count desc, token asc).
    """
    from ..stages.sketch import heavy_hitters_approx

    ds = _read_docs(sf_dir, ["text"])

    def tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table({"token": toks.flatten()})

    top = heavy_hitters_approx(ds.map_batches(tokens, batch_format="pyarrow"), "token", k=k, capacity=capacity)
    # wrap the k-row result as a Dataset: every queries() entry is
    # fn(sf_dir) -> Dataset (driver contract)
    return rd.from_arrow(
        pa.table(
            {
                "hh_rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
                "token": pa.array([t for t, _, _ in top], type=pa.string()),
                "n": pa.array([c for _, c, _ in top], type=pa.int64()),
                "max_err": pa.array([e for _, _, e in top], type=pa.int64()),
            }
        )
    )


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"


def redact_pii(sf_dir: str) -> rd.Dataset:
    """Training-data cleaning: redact email/phone-shaped spans and
    report per-doc hit counts (the scrub every corpus pipeline runs
    before tokenization).  Vectorized Arrow regex kernels
    (``pc.count_substring_regex`` / ``pc.replace_substring_regex``) —
    no Python-level row loop; patterns mirror the DuckDB oracle's
    ``regexp_matches``/``regexp_replace(..., 'g')`` exactly.
    Output: (doc_id, n_emails, n_phones, clean_len).
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_emails = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
        cleaned = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
        n_phones = pc.cast(pc.count_substring_regex(cleaned, PHONE_RE), pa.int64())
        cleaned = pc.replace_substring_regex(cleaned, PHONE_RE, "<PHONE>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_emails": n_emails,
                "n_phones": n_phones,
                "clean_len": pc.cast(pc.utf8_length(cleaned), pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def fingerprint(sf_dir: str) -> rd.Dataset:
    """64-bit rolling-hash document fingerprint (content identity key).

    Polynomial rolling hash over utf-8 bytes, vectorized per batch with
    cumulative modular products — a content address usable as a dedup /
    shard key at scale.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    B = np.uint64(1099511628211)

    def fp(t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, dtype=np.int64)
        with np.errstate(over="ignore"):
            for i, v in enumerate(t["text"]):
                b = np.frombuffer(v.as_py().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if b.size == 0:
                    out[i] = 0
                    continue
                # h = sum(b[j] * B^(n-j)) mod 2^64 — wraparound uint64
                # arithmetic is the modulus; cumprod vectorizes the powers.
                powers = np.cumprod(np.full(b.size, B, dtype=np.uint64))[::-1]
                out[i] = (b * powers).sum().astype(np.uint64).view(np.int64)
        return t.drop_columns(["text"]).append_column("fingerprint", pa.array(out, type=pa.int64()))

    return ds.map_batches(fp, batch_format="pyarrow")
