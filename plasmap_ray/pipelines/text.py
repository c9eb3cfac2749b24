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
from ray.data.aggregate import Count, Mean, Sum
from ..stages.common import safe_join


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


_VOWEL_RUN = re.compile(r"[aeiouy]+")
_SENT_MARK = re.compile(r"[.!?]")


def readability_scores(sf_dir: str) -> rd.Dataset:
    """Per-document Flesch reading-ease + Flesch–Kincaid grade from
    the classic surface statistics (words / sentences / vowel-run
    syllable heuristic, each word floored at 1 syllable) — the
    readability stratification column a text-curation pipeline buckets
    on (Flesch 1948; Kincaid et al. 1975).

    Definition shared with the SQL oracle: words = non-empty
    single-space tokens; syllables(word) = max(1, count of [aeiouy]+
    runs); sentences = max(1, count of [.!?] marks); both scores are
    ONE mirrored float expression over these integers.

    Scale shape: map-ONLY — per-doc token loop inside the batch fn
    (ALU-bound, compiled regex), three int64s + two floats per doc
    leave the task.  Output: (doc_id, n_words, n_sentences,
    n_syllables, flesch_ease, fk_grade).
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        n_words = np.zeros(n, dtype=np.int64)
        n_syl = np.zeros(n, dtype=np.int64)
        n_sent = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(texts):
            words = [w for w in s.split(" ") if w]
            n_words[i] = len(words)
            n_syl[i] = sum(max(1, len(_VOWEL_RUN.findall(w))) for w in words)
            n_sent[i] = max(1, len(_SENT_MARK.findall(s)))
        w = np.maximum(n_words, 1).astype(np.float64)
        sent = n_sent.astype(np.float64)
        syl = n_syl.astype(np.float64)
        ease = 206.835 - 1.015 * (w / sent) - 84.6 * (syl / w)
        grade = 0.39 * (w / sent) + 11.8 * (syl / w) - 15.59
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words, type=pa.int64()),
                "n_sentences": pa.array(n_sent, type=pa.int64()),
                "n_syllables": pa.array(n_syl, type=pa.int64()),
                "flesch_ease": pa.array(duckdb_round(ease, 6), type=pa.float64()),
                "fk_grade": pa.array(duckdb_round(grade, 6), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


MTLD_NUM, MTLD_DEN = 72, 100  # factor completes when 100·types < 72·tokens


def _mtld_factors(tokens: list) -> tuple[int, float]:
    """One directional MTLD pass: (complete_factors, partial) with the
    INTEGER threshold rule 100·types < 72·tokens (no float compare).
    Partial = (1 − TTR_end)/(1 − 0.72) over the trailing fragment."""
    factors = 0
    seen: set = set()
    n_tok = 0
    for w in tokens:
        n_tok += 1
        seen.add(w)
        if MTLD_DEN * len(seen) < MTLD_NUM * n_tok:
            factors += 1
            seen.clear()
            n_tok = 0
    partial = 0.0
    if n_tok:
        ttr = len(seen) / n_tok
        partial = (1.0 - ttr) / (1.0 - MTLD_NUM / MTLD_DEN)
    return factors, partial


def mtld_diversity(sf_dir: str) -> rd.Dataset:
    """Per-document MTLD lexical diversity (McCarthy & Jarvis 2010):
    mean length of sequential token stretches that keep type-token
    ratio above 0.72, averaged over forward and backward passes — the
    length-robust vocabulary-richness column a curation pipeline
    buckets on where raw TTR collapses with document length
    (complements lz78_complexity's character view with a token view).

    Shared definition with the golden oracle: single-space non-empty
    tokens; the factor boundary is the INTEGER rule 100·types <
    72·tokens; partial factor (1−TTR)/(0.28); mtld_dir =
    n_tokens/(factors+partial); mtld = (fwd+bwd)/2.  The oracle
    recomputes with per-position dict bookkeeping (different state
    machine).

    Scale shape: map-ONLY per-doc scan (compiled-free, ALU-bound in
    the batch fn).  Output: (doc_id, n_tokens, factors_fwd,
    factors_bwd, mtld_fwd, mtld_bwd, mtld) rounded 6.
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, dtype=np.int64)
        f_f = np.zeros(n, dtype=np.int64)
        f_b = np.zeros(n, dtype=np.int64)
        m_f = np.zeros(n, dtype=np.float64)
        m_b = np.zeros(n, dtype=np.float64)
        for i, s in enumerate(texts):
            toks = [w for w in s.split(" ") if w]
            n_tok[i] = len(toks)
            if not toks:
                continue
            ff, pf = _mtld_factors(toks)
            fb, pb = _mtld_factors(toks[::-1])
            f_f[i], f_b[i] = ff, fb
            m_f[i] = len(toks) / (ff + pf) if (ff + pf) > 0 else 0.0
            m_b[i] = len(toks) / (fb + pb) if (fb + pb) > 0 else 0.0
        mt = (m_f + m_b) / 2.0
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "factors_fwd": pa.array(f_f, type=pa.int64()),
                "factors_bwd": pa.array(f_b, type=pa.int64()),
                "mtld_fwd": pa.array(duckdb_round(m_f, 6), type=pa.float64()),
                "mtld_bwd": pa.array(duckdb_round(m_b, 6), type=pa.float64()),
                "mtld": pa.array(duckdb_round(mt, 6), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


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


# ---------------------------------------------------------------------------
# Corpus-quality operators (round 2 session 8): intra-doc repetition,
# corpus-LM scoring, cross-doc n-gram duplication — the Gopher/C4-style
# quality-filter signals a training-data pipeline runs before dedup.
# ---------------------------------------------------------------------------


def _doc_trigrams(texts: list[str]) -> list[list[str]]:
    """Per-doc word 3-grams, joined with a single space — exactly
    DuckDB's ``ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]`` over
    ``string_split(text, ' ')``."""
    out = []
    for s in texts:
        toks = s.split(" ")
        out.append([" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)])
    return out


def repetition_ratio(sf_dir: str) -> rd.Dataset:
    """Intra-document repetition: fraction of a doc's word 3-grams that
    are duplicates of an earlier 3-gram in the SAME doc (the Gopher
    rep-signal; template/spam text scores high).  Map-only — no
    shuffle; the per-doc loop is inherent (like simhash) and the
    integer distinct/total quotient is bit-exact across engines.
    Docs with <3 tokens have no grams and drop (inner semantics,
    mirroring the SQL unnest)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def per_doc(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        grams = _doc_trigrams(t["text"].to_pylist())
        keep, n_g, n_d = [], [], []
        for i, g in enumerate(grams):
            if not g:
                continue
            keep.append(ids[i])
            n_g.append(len(g))
            n_d.append(len(set(g)))
        n_g_arr = np.asarray(n_g, dtype=np.int64)
        n_d_arr = np.asarray(n_d, dtype=np.int64)
        from ..stages.common import duckdb_round

        ratio = duckdb_round(1.0 - n_d_arr / n_g_arr.astype(np.float64), 6) if len(n_g) else np.empty(0)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(keep, dtype=np.int64)),
                "n_grams": pa.array(n_g_arr),
                "n_distinct": pa.array(n_d_arr),
                "rep_ratio": pa.array(ratio, type=pa.float64()),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


def unigram_logprob(sf_dir: str) -> rd.Dataset:
    """Corpus-LM scoring: per-doc mean unigram log-probability under the
    corpus's own token distribution — the classic perplexity-proxy
    quality filter (gibberish scores low, stop-wordy boilerplate high).

    Two-phase: pass 1 reduces the corpus to (token, count) with
    map-side Counter combiners (one bounded shuffle: vocabulary, not
    tokens); the vocab log-prob table broadcasts to pass 2's map-only
    scoring stage.  At planet scale the vocab dict travels via ray.put
    (it is already built once per worker here through the batch-fn
    closure).  ln is libm in both engines; round-6 absorbs the
    summation-order ulp in the mean (the search_bm25 discipline).
    """
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split(" "))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, type=pa.string()),
                         "n": pa.array([c[k] for k in toks], type=pa.int64())})

    vocab_tbl = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = float(vocab_tbl["n"].sum())
    logprob = {t: float(np.log(n / total)) for t, n in zip(vocab_tbl["token"], vocab_tbl["n"])}

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        n_toks = np.empty(len(ids), dtype=np.int64)
        means = np.empty(len(ids), dtype=np.float64)
        for i, s in enumerate(t["text"].to_pylist()):
            toks = s.lower().split(" ")
            n_toks[i] = len(toks)
            means[i] = sum(logprob[w] for w in toks) / len(toks)
        from ..stages.common import duckdb_round

        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_toks),
            "lm_score": pa.array(duckdb_round(means, 6), type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def common_ngram_fraction(sf_dir: str) -> rd.Dataset:
    """Cross-document duplication: per doc, the fraction of its DISTINCT
    word 3-grams that also occur in at least one OTHER doc (>=2 docs
    total) — the C4 repeated-substring corpus filter, and the
    gram-level view of near-duplication that MinHash approximates.

    Shape: per-doc distinct grams explode to (doc_id, gram) pairs
    (map-side set() keeps the explosion distinct); one gram-keyed
    shuffle counts documents per gram; a hash join back on gram tags
    each pair with its doc count; a doc-keyed reduce emits the
    fraction.  The pair table is materialized once and reused for
    both sides of the join (object-store blocks, spillable); at
    planet scale swap the gram string for its 64-bit hash before the
    exchange (collision-correctable) — the string key is kept here
    for the bit-exact SQL mirror.
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode_distinct(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        grams = _doc_trigrams(t["text"].to_pylist())
        out_ids, out_g = [], []
        for i, g in enumerate(grams):
            for x in set(g):
                out_ids.append(ids[i])
                out_g.append(x)
        return pa.table({"doc_id": pa.array(np.asarray(out_ids, dtype=np.int64)),
                         "g": pa.array(out_g, type=pa.string())})

    pairs = ds.map_batches(explode_distinct, batch_format="pyarrow").materialize()
    gram_docs = pairs.groupby("g").aggregate(_Count(alias_name="nd"))
    tagged = safe_join(pairs, gram_docs, join_type="inner", num_partitions=8, on=("g",), right_on=("g",))

    def flag(t: pa.Table) -> pa.Table:
        common = pc.cast(pc.greater_equal(t["nd"], pa.scalar(2, type=pa.int64())), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "is_common": common})

    per_doc = (
        tagged.map_batches(flag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(_Count(alias_name="n_distinct"), _Sum("is_common", alias_name="n_common"))
    )

    def ratio(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        f = t["n_common"].to_numpy().astype(np.float64) / t["n_distinct"].to_numpy().astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
            "n_common": pc.cast(t["n_common"], pa.int64()),
            "common_frac": pa.array(duckdb_round(f, 6), type=pa.float64()),
        })

    return per_doc.map_batches(ratio, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# subword_stats + bigram_pmi (tokenizer-facing corpus statistics)
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer classes (RE2 in BOTH engines: Arrow kernels and
# DuckDB regexp_* share the dialect, so counts agree bit-for-bit)
SUBWORD_ALPHA = "[a-z]+"
SUBWORD_DIGIT = "[0-9]+"
SUBWORD_PUNCT = "[^a-z0-9 ]"


def subword_stats(sf_dir: str) -> rd.Dataset:
    """Per-document BPE-ish pre-tokenization counts: alpha runs, digit
    runs, punctuation marks and their total — the tokenizer-budget
    profile (SURVEY §2's 'BPE-ish regex' token counting).  Map-only;
    all counting via vectorized RE2 kernels (pc.count_substring_regex),
    integer outputs bit-exact against DuckDB's regexp_extract_all."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        a = pc.cast(pc.count_substring_regex(low, SUBWORD_ALPHA), pa.int64())
        d = pc.cast(pc.count_substring_regex(low, SUBWORD_DIGIT), pa.int64())
        p = pc.cast(pc.count_substring_regex(low, SUBWORD_PUNCT), pa.int64())
        tot = pc.add(pc.add(a, d), p)
        return pa.table(
            {"doc_id": t["doc_id"], "n_alpha": a, "n_digit": d, "n_punct": p, "n_subwords": tot}
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def bigram_pmi(sf_dir: str, min_count: int = 30, k: int = 50) -> rd.Dataset:
    """Collocation mining: top-k adjacent-token bigrams by pointwise
    mutual information — the phrase detector a tokenizer/vocab builder
    runs over the corpus (word2vec-phrases style).

    Two bounded shuffles: bigram counts and unigram counts, both with
    map-side Counter combiners (shuffle volume = vocabulary, never
    tokens); the unigram table broadcasts back as a lookup dict and the
    PMI is one mirrored float expression over integer counts, rounded
    before the (pmi desc, w1, w2) top-k so ordering cannot diverge.
    """
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    ds = _read_docs(sf_dir, ["text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            toks = s.lower().split(" ")
            c.update(zip(toks[:-1], toks[1:]))
        keys = list(c.keys())
        return pa.table({
            "w1": pa.array([a for a, _ in keys], type=pa.string()),
            "w2": pa.array([b for _, b in keys], type=pa.string()),
            "n": pa.array([c[x] for x in keys], type=pa.int64()),
        })

    def unigram_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split(" "))
        keys = list(c.keys())
        return pa.table({
            "w": pa.array(keys, type=pa.string()),
            "n": pa.array([c[x] for x in keys], type=pa.int64()),
        })

    bi = (
        ds.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(_Sum("n", alias_name="c_xy"))
    )
    uni_df = (
        ds.map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(_Sum("n", alias_name="c"))
        .to_pandas()
    )
    uni = dict(zip(uni_df["w"], uni_df["c"].astype(np.int64)))
    n_uni = float(sum(uni.values()))
    bi = bi.filter(expr=f"c_xy >= {min_count}")
    n_bi = float(n_uni - _read_docs(sf_dir, ["doc_id"]).count())  # Σ(len-1) = Σlen - n_docs

    def pmi(t: pa.Table) -> pa.Table:
        from ..stages.common import duckdb_round

        c_xy = t["c_xy"].to_numpy().astype(np.float64)
        c1 = np.array([uni[w] for w in t["w1"].to_pylist()], dtype=np.float64)
        c2 = np.array([uni[w] for w in t["w2"].to_pylist()], dtype=np.float64)
        val = duckdb_round(np.log(c_xy * n_uni * n_uni / (n_bi * c1 * c2)), 6)
        return pa.table({
            "w1": t["w1"], "w2": t["w2"],
            "c_xy": pc.cast(t["c_xy"], pa.int64()),
            "pmi": pa.array(val, type=pa.float64()),
        })

    return bi.map_batches(pmi, batch_format="pyarrow").sort(
        ["pmi", "w1", "w2"], descending=[True, False, False]
    ).limit(k)


def langid_confusion(sf_dir: str) -> rd.Dataset:
    """Classifier evaluation for the language-ID stage: the (stored
    lang x predicted lang) confusion matrix — per-language precision/
    recall fall straight out, and a drifting corpus shows up as
    off-diagonal mass.  Reuses the TextQuality actor (ST4 state) and
    reduces to a (langs² )-bounded integer count.
    Output: (lang, pred_lang, n_docs)."""
    from ray.data.aggregate import Count as _Count

    preds = quality_pipeline(sf_dir)
    return (
        preds.select_columns(["lang", "pred_lang"])
        .groupby(["lang", "pred_lang"])
        .aggregate(_Count(alias_name="n_docs"))
        .sort(["lang", "pred_lang"])
    )


COVERAGE_KS = (16, 64, 256, 1024, 4096)


def vocab_coverage_curve(sf_dir: str, ks: tuple[int, ...] = COVERAGE_KS) -> rd.Dataset:
    """Tokenizer-planning COVERAGE CURVE: what fraction of all token
    occurrences do the top-K vocabulary entries cover, at K = 16..4096
    — the Heaps/Zipf summary that sizes a vocabulary before training a
    tokenizer (complement of subword_stats' BPE-ish merge counts).

    Scale shape: per-batch token-count combiner -> ONE vocab-bounded
    groupby; the ranking runs on the AGGREGATE (distinct tokens), never
    on occurrences.  Ties rank deterministically by (count desc, token
    asc) in both engines.

    Output: (k, n_vocab_used, covered, total, coverage).
    """
    import pyarrow.compute as pc

    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["text"])

    def count_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(pc.utf8_lower(t["text"]), " "))
        flat = pa.table({"token": toks})
        g = flat.group_by("token").aggregate([("token", "count")])
        return pa.table(
            {
                "token": g["token"],
                "n": pa.array(g["token_count"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # vocab-bounded (distinct tokens)
    )
    order = np.lexsort((counts["token"].to_numpy(), -counts["n"].to_numpy()))
    n_sorted = counts["n"].to_numpy()[order].astype(np.int64)
    total = int(n_sorted.sum())
    cum = np.cumsum(n_sorted)
    rows = {"k": [], "n_vocab_used": [], "covered": [], "total": [], "coverage": []}
    for k in ks:
        used = min(k, len(n_sorted))
        cov = int(cum[used - 1]) if used else 0
        rows["k"].append(k)
        rows["n_vocab_used"].append(used)
        rows["covered"].append(cov)
        rows["total"].append(total)
        rows["coverage"].append(float(duckdb_round(np.array([cov / total]), 6)[0]))
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rows["k"], type=pa.int64()),
                "n_vocab_used": pa.array(rows["n_vocab_used"], type=pa.int64()),
                "covered": pa.array(rows["covered"], type=pa.int64()),
                "total": pa.array(rows["total"], type=pa.int64()),
                "coverage": pa.array(rows["coverage"], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Corpus-composition operators (domain mixing, shard balancing,
# substring-level duplication) — the data-mixture half of a training-
# data pipeline, alongside the per-doc quality/dedup filters above.
# ---------------------------------------------------------------------------


def domain_mixture_weights(sf_dir: str, alpha: float = 0.5) -> rd.Dataset:
    """Temperature-based domain sampling weights: per language,
    p(lang) ∝ n_tokens^alpha (the multilingual alpha-sampling rule of
    XLM-R / mT5; alpha<1 upsamples low-resource domains).  Output per
    lang: doc/token counts, natural token share, sampled weight, and
    the implied upsample factor weight/share.

    Shape: ONE combiner pass reduces the corpus to (lang, n_docs,
    n_tokens) partials (pa.compute split-length, no Python loop), one
    lang-keyed aggregate (≤ #langs rows), and the normalization runs
    in a single map over that tiny table — nothing driver-side, no
    second scan.  Token convention = single-space split, the same as
    token_stats/unigram_logprob so the SQL mirror is bit-exact.
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64())
        return pa.table({"lang": t["lang"], "one": pa.array(np.ones(t.num_rows, dtype=np.int64)), "n_tok": n_tok})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("one", alias_name="n_docs"), Sum("n_tok", alias_name="n_tokens"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy().astype(np.float64)
        share = n / n.sum()
        w = np.sqrt(n) if alpha == 0.5 else np.power(n, alpha)
        w = w / w.sum()
        ups = w / share
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "token_share": pa.array(duckdb_round(share, 6), type=pa.float64()),
                "weight": pa.array(duckdb_round(w, 6), type=pa.float64()),
                "upsample": pa.array(duckdb_round(ups, 6), type=pa.float64()),
            }
        )

    # normalization needs every lang row at once: ≤ #langs rows, one block
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def domain_kl_matrix(sf_dir: str) -> rd.Dataset:
    """Pairwise Jensen–Shannon divergence between per-language unigram
    distributions — the domain-similarity matrix behind mixture design
    (which domains are near-duplicates of each other, which add real
    diversity).  JS is computed over the token UNION; tokens absent
    from one side contribute their full ln(2)-weighted mass, folded in
    closed form: js = 0.5·(Σ_common[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
    + ln2·((1−Σ_common p) + (1−Σ_common q))).

    Shape: the corpus reduces to a (lang, token, count) table via
    map-side Counter combiners (one vocab-bounded shuffle — the
    unigram_logprob discipline); the pairwise fold then runs on that
    vocab-sized table (L·V rows, L ≤ dozens), dense-pivoted in one
    task.  Output: (lang_a, lang_b, n_common_tokens, js_divergence)
    for lang_a < lang_b, pairs sharing ≥1 token.
    """
    from collections import Counter

    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["lang", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        langs = t["lang"].to_pylist()
        for lg, s in zip(langs, t["text"].to_pylist()):
            for w in s.lower().split(" "):
                c[(lg, w)] += 1
        keys = list(c.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], type=pa.string()),
                "token": pa.array([k[1] for k in keys], type=pa.string()),
                "n": pa.array([c[k] for k in keys], type=pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def pairwise(t: pa.Table) -> pa.Table:
        langs_col = t["lang"].to_pylist()
        toks = t["token"].to_pylist()
        cnt = t["n"].to_numpy().astype(np.float64)
        langs = sorted(set(langs_col))
        tok_ix = {w: i for i, w in enumerate(sorted(set(toks)))}
        P = np.zeros((len(langs), len(tok_ix)), dtype=np.float64)
        li = {lg: i for i, lg in enumerate(langs)}
        for lg, w, c in zip(langs_col, toks, cnt):
            P[li[lg], tok_ix[w]] = c
        tot = P.sum(axis=1, keepdims=True)
        P = P / tot  # pr = cnt / tot, per-element — same doubles as SQL
        rows = {"lang_a": [], "lang_b": [], "n_common_tokens": [], "js_divergence": []}
        for i in range(len(langs)):
            for j in range(i + 1, len(langs)):
                p, q = P[i], P[j]
                both = (p > 0) & (q > 0)
                if not both.any():
                    continue
                pb, qb = p[both], q[both]
                core = (pb * np.log(2.0 * pb / (pb + qb)) + qb * np.log(2.0 * qb / (pb + qb))).sum()
                js = 0.5 * (core + np.log(2.0) * ((1.0 - pb.sum()) + (1.0 - qb.sum())))
                rows["lang_a"].append(langs[i])
                rows["lang_b"].append(langs[j])
                rows["n_common_tokens"].append(int(both.sum()))
                rows["js_divergence"].append(float(duckdb_round(np.array([js]), 6)[0]))
        return pa.table(
            {
                "lang_a": pa.array(rows["lang_a"], type=pa.string()),
                "lang_b": pa.array(rows["lang_b"], type=pa.string()),
                "n_common_tokens": pa.array(rows["n_common_tokens"], type=pa.int64()),
                "js_divergence": pa.array(rows["js_divergence"], type=pa.float64()),
            }
        )

    return vocab.repartition(1).map_batches(pairwise, batch_format="pyarrow")


BALANCED_SHARDS_N = 16


def balanced_shards(sf_dir: str, n_shards: int = BALANCED_SHARDS_N) -> rd.Dataset:
    """Quality-stratified shard assignment: within each language, rank
    documents by (n_chars DESC, doc_id ASC) and deal them round-robin
    into ``n_shards`` training shards — every shard sees the same
    quality distribution per language (no shard is all-short or
    all-one-lang), the property a curriculum/mixture loader needs.

    Distributed rank without a global sort (the global_row_numbers
    two-pass): pass 1 histograms (lang, n_chars) — a key space bounded
    by langs × char-lengths, KBs — whose within-lang descending cumsum
    becomes broadcast rank OFFSETS; pass 2 regroups by that same
    bounded key and ranks locally by doc_id.  Bit-equal to SQL
    ROW_NUMBER; the only exchange is the (lang, n_chars)-keyed regroup.
    Output: (doc_id, lang, n_chars, rn, shard).
    """
    ds = _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    bins = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    bins = bins.sort_values(["lang", "n_chars"], ascending=[True, False])
    offs: dict[tuple[str, int], int] = {}
    for lang, grp in bins.groupby("lang", sort=False):
        cum = np.concatenate([[0], np.cumsum(grp["n"].to_numpy())[:-1]])
        for (nc, off) in zip(grp["n_chars"].to_numpy(), cum):
            offs[(lang, int(nc))] = int(off)

    def number(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lang": pa.array([], type=pa.string()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "rn": pa.array([], type=pa.int64()),
                    "shard": pa.array([], type=pa.int64()),
                }
            )
        g = g.sort_by([("doc_id", "ascending")])
        lang = g["lang"][0].as_py()
        nc = int(g["n_chars"][0].as_py())
        base = offs[(lang, nc)]
        rn = base + 1 + np.arange(g.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "lang": g["lang"],
                "n_chars": pc.cast(g["n_chars"], pa.int64()),
                "rn": pa.array(rn, type=pa.int64()),
                "shard": pa.array((rn - 1) % n_shards, type=pa.int64()),
            }
        )

    return ds.groupby(["lang", "n_chars"]).map_groups(number, batch_format="pyarrow")


DUP_SPAN_W = 30  # shingle width (chars)
DUP_SPAN_STRIDE = 10


def dup_span_fraction(sf_dir: str, width: int = DUP_SPAN_W, stride: int = DUP_SPAN_STRIDE) -> rd.Dataset:
    """Substring-level duplication audit (the Lee-et-al. "Deduplicating
    Training Data" signal at shingle granularity): per document, the
    fraction of its DISTINCT ``width``-char shingles (sampled every
    ``stride`` chars) that also occur in ≥1 other document — catches
    copied PARAGRAPHS inside otherwise-unique documents, which
    doc-level MinHash misses.

    Shape: shingles explode fully vectorized (one concatenated byte
    buffer per batch, 2-D fancy-index gather — no per-doc slicing
    loop on the ASCII fast path), per-batch distinct; one
    shingle-keyed shuffle counts docs per shingle; hash join back +
    doc-keyed reduce — the common_ngram_fraction pipeline shape at
    character level.  At planet scale the 30-byte key would be
    replaced by its 64-bit hash before the exchange; the raw string
    is kept for the bit-exact SQL mirror (DuckDB substr is char-based
    = byte-based on ASCII; non-ASCII batches fall back to per-doc
    str slicing with identical semantics).
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode_distinct(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        lens = np.array([len(s) for s in texts], dtype=np.int64)
        # shingle count per doc: floor((len-W)/S)+1, min 1 (short docs
        # emit themselves once — substr past the end truncates in SQL)
        n_sh = np.maximum((lens - width) // stride + 1, 1)
        if all(s.isascii() for s in texts):
            buf = np.frombuffer(("".join(texts)).encode("ascii"), dtype=np.uint8)
            doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
            doc_ix = np.repeat(np.arange(len(texts)), n_sh)
            local = (np.arange(int(n_sh.sum())) - np.repeat(np.concatenate([[0], np.cumsum(n_sh)[:-1]]), n_sh)) * stride
            starts = doc_off[doc_ix] + local
            # pad the buffer so short-doc windows can over-read, then trim
            pad = np.zeros(width, dtype=np.uint8)
            win = np.concatenate([buf, pad])[starts[:, None] + np.arange(width)]
            grams = win.view(f"S{width}").ravel()
            take = np.minimum(lens[doc_ix] - local, width)  # short docs: whole text
            out_g = [g[:k].decode("ascii") for g, k in zip(grams.tolist(), take.tolist())]
        else:
            doc_ix_l, out_g = [], []
            for i, s in enumerate(texts):
                for j in range(int(n_sh[i])):
                    doc_ix_l.append(i)
                    out_g.append(s[j * stride : j * stride + width])
            doc_ix = np.array(doc_ix_l, dtype=np.int64)
        # per-batch distinct (doc_id, gram) pairs — hash dedup in C
        df = pd.DataFrame({"doc_id": ids[doc_ix], "g": out_g}).drop_duplicates()
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), type=pa.int64()),
                "g": pa.array(df["g"].tolist(), type=pa.string()),
            }
        )

    pairs = ds.map_batches(explode_distinct, batch_format="pyarrow").materialize()
    gram_docs = pairs.groupby("g").aggregate(_Count(alias_name="nd"))
    tagged = safe_join(pairs, gram_docs, join_type="inner", num_partitions=8, on=("g",), right_on=("g",))

    def flag(t: pa.Table) -> pa.Table:
        dup = pc.cast(pc.greater_equal(t["nd"], pa.scalar(2, type=pa.int64())), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "is_dup": dup})

    per_doc = (
        tagged.map_batches(flag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(_Count(alias_name="n_shingles"), _Sum("is_dup", alias_name="n_dup"))
    )

    def ratio(t: pa.Table) -> pa.Table:
        f = t["n_dup"].to_numpy().astype(np.float64) / t["n_shingles"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_shingles": pc.cast(t["n_shingles"], pa.int64()),
                "n_dup": pc.cast(t["n_dup"], pa.int64()),
                "dup_frac": pa.array(duckdb_round(f, 6), type=pa.float64()),
            }
        )

    return per_doc.map_batches(ratio, batch_format="pyarrow")


def dup_spans(sf_dir: str, width: int = DUP_SPAN_W, stride: int = DUP_SPAN_STRIDE, parts: int = 64) -> rd.Dataset:
    """Merged duplicated SPANS per document — dup_span_fraction's
    actionable output: instead of a per-doc ratio, the actual character
    ranges [span_start, span_end] (1-based, inclusive) where this
    document repeats content found in other documents, adjacent
    duplicated shingles coalesced (the span-removal granularity of
    Lee-et-al.-style substring dedup, where only the copied PART of a
    document is cut).

    Shape: positioned shingle explode (the dup_span_fraction gather,
    plus the 1-based offset column) → gram-keyed distinct-doc count →
    hash join back → doc-sharded run-scan that sorts each doc's dup
    positions and merges stride-consecutive runs (gaps-and-islands,
    vectorized: one np.diff per partition).  Output: (doc_id,
    span_start, span_end, n_shingles), one row per island.
    """
    from ray.data.aggregate import Count as _Count

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode_pos(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        lens = np.array([len(s) for s in texts], dtype=np.int64)
        n_sh = np.maximum((lens - width) // stride + 1, 1)
        doc_ix = np.repeat(np.arange(len(texts)), n_sh)
        local = (np.arange(int(n_sh.sum())) - np.repeat(np.concatenate([[0], np.cumsum(n_sh)[:-1]]), n_sh)) * stride
        if all(s.isascii() for s in texts):
            buf = np.frombuffer(("".join(texts)).encode("ascii"), dtype=np.uint8)
            doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
            starts = doc_off[doc_ix] + local
            pad = np.zeros(width, dtype=np.uint8)
            win = np.concatenate([buf, pad])[starts[:, None] + np.arange(width)]
            grams = win.view(f"S{width}").ravel()
            take = np.minimum(lens[doc_ix] - local, width)
            out_g = [g[:k].decode("ascii") for g, k in zip(grams.tolist(), take.tolist())]
        else:
            out_g = [texts[d][j : j + width] for d, j in zip(doc_ix.tolist(), local.tolist())]
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_ix], type=pa.int64()),
                "i": pa.array(local + 1, type=pa.int64()),  # 1-based, matches SQL substr
                "g": pa.array(out_g, type=pa.string()),
                "L": pa.array(lens[doc_ix], type=pa.int64()),
            }
        )

    positioned = ds.map_batches(explode_pos, batch_format="pyarrow").materialize()

    def distinct_docs(t: pa.Table) -> pa.Table:
        # all shingles of a doc live in one batch, so per-batch distinct
        # (doc, g) pairs are globally distinct
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(), "g": t["g"].to_pylist()}).drop_duplicates()
        return pa.table({"g": pa.array(df["g"].tolist(), type=pa.string())})

    gram_docs = (
        positioned.map_batches(distinct_docs, batch_format="pyarrow")
        .groupby("g")
        .aggregate(_Count(alias_name="nd"))
    )
    tagged = safe_join(positioned, gram_docs, join_type="inner", num_partitions=8, on=("g",), right_on=("g",))

    def dup_only(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t["nd"], pa.scalar(2, type=pa.int64()))
        t = t.filter(m)
        part = pc.cast(pc.bit_wise_and(t["doc_id"], pa.scalar(parts - 1, type=pa.int64())), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "i": t["i"], "L": t["L"], "part": part})

    def islands(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "span_start": pa.array([], type=pa.int64()),
                    "span_end": pa.array([], type=pa.int64()),
                    "n_shingles": pa.array([], type=pa.int64()),
                }
            )
        g = g.sort_by([("doc_id", "ascending"), ("i", "ascending")])
        d = g["doc_id"].to_numpy()
        i = g["i"].to_numpy()
        L = g["L"].to_numpy()
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (i[1:] - i[:-1] != stride)
        grp = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:] - 1, [len(d) - 1]])
        return pa.table(
            {
                "doc_id": pa.array(d[starts], type=pa.int64()),
                "span_start": pa.array(i[starts], type=pa.int64()),
                "span_end": pa.array(np.minimum(i[ends] + width - 1, L[ends]), type=pa.int64()),
                "n_shingles": pa.array(ends - starts + 1, type=pa.int64()),
            }
        )

    return (
        tagged.map_batches(dup_only, batch_format="pyarrow")
        .groupby("part")
        .map_groups(islands, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Sequence packing (concatenate-and-chunk) — the GPT-style pretraining
# packer: the corpus token stream is conceptually concatenated in doc_id
# order and sliced every PACK_CTX tokens into fixed-length training
# sequences.  The manifest says, per document, where its tokens land.
# ---------------------------------------------------------------------------

PACK_CTX = 2048  # tokens per packed training sequence
PACK_BIN_DOCS = 1024  # docs per prefix-scan bin (doc_id // PACK_BIN_DOCS)
PAD_MULTIPLE = 128  # pad-to-multiple bucket width for unpacked batching


def _doc_token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tok, bin) with the single-space token convention
    token_stats uses, so DuckDB ``len(string_split(text, ' '))``
    mirrors it bit-for-bit."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64())
        doc = t["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "n_tok": n,
                "bin": pa.array(doc // PACK_BIN_DOCS, type=pa.int64()),
            }
        )

    return ds.map_batches(toks, batch_format="pyarrow")


def _pack_manifest(sf_dir: str, ctx: int) -> rd.Dataset:
    return _pack_manifest_from(_doc_token_counts(sf_dir), ctx)


def _pack_manifest_from(tok: rd.Dataset, ctx: int) -> rd.Dataset:
    """Distributed prefix scan over doc_id order (the global_row_numbers
    two-pass shape) on any (doc_id, n_tok, bin) dataset: (1) per-bin
    token sums -> tiny bins-sized aggregate whose cumsum is each bin's
    global token OFFSET (broadcast dict); (2) bin-keyed regroup sorts
    locally and adds the offset.  The only exchange is the bin regroup;
    nothing global ever sorts."""

    bins = (
        tok.map_batches(
            lambda t: pa.table(
                {
                    "bin": t["bin"],
                    "n": t["n_tok"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: fixed length-bin groups
    )
    if len(bins) == 0:  # nothing survived upstream: typed empty manifest
        z = pa.array([], type=pa.int64())
        return rd.from_arrow(
            pa.table(
                {"doc_id": z, "n_tok": z, "start_tok": z, "first_seq": z, "last_seq": z, "n_seqs": z}
            )
        )
    bins = bins.sort_values("bin")
    offs = dict(
        zip(
            bins["bin"].astype(np.int64),
            np.concatenate([[0], np.cumsum(bins["n"].to_numpy(np.int64))[:-1]]),
        )
    )

    def number(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"doc_id": z, "n_tok": z, "start_tok": z, "first_seq": z, "last_seq": z, "n_seqs": z}
            )
        g = g.sort_by([("doc_id", "ascending")])
        n = g["n_tok"].to_numpy().astype(np.int64)
        base = int(offs[int(g["bin"][0].as_py())])
        end = base + np.cumsum(n)
        start = end - n
        first = start // ctx
        last = (end - 1) // ctx
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tok": pa.array(n, type=pa.int64()),
                "start_tok": pa.array(start, type=pa.int64()),
                "first_seq": pa.array(first, type=pa.int64()),
                "last_seq": pa.array(last, type=pa.int64()),
                "n_seqs": pa.array(last - first + 1, type=pa.int64()),
            }
        )

    return tok.groupby("bin").map_groups(number, batch_format="pyarrow")


def sequence_packing(sf_dir: str, ctx: int = PACK_CTX) -> rd.Dataset:
    """Per-document packing manifest: token offsets and the span of
    fixed-length training sequences each document occupies after
    concatenate-and-chunk at ``ctx`` tokens.

    Scale shape: pass 1 is a combiner-style per-bin token-sum groupby
    (bins = docs/1024 rows, KB-scale broadcast); pass 2 regroups by the
    SAME bin key and runs one numpy cumsum per group.  No global sort,
    no driver-side row data.  Output: (doc_id, n_tok, start_tok,
    first_seq, last_seq, n_seqs) — int64 throughout.
    """
    return _pack_manifest(sf_dir, ctx)


def packing_stats(sf_dir: str, ctx: int = PACK_CTX) -> rd.Dataset:
    """One-row corpus packing audit: total tokens, number of packed
    sequences, documents straddling a sequence boundary, and tail
    padding — the numbers a pretraining data loader reports before a
    run.  Derived from the manifest with a map-side partial + single
    tiny aggregate."""
    man = _pack_manifest(sf_dir, ctx)

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_tok"].to_numpy().astype(np.int64)
        spans = t["n_seqs"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "n_docs": pa.array([len(n)], type=pa.int64()),
                "total_tokens": pa.array([int(n.sum())], type=pa.int64()),
                "n_boundary_docs": pa.array([int((spans > 1).sum())], type=pa.int64()),
            }
        )

    agg = (
        man.map_batches(partial, batch_format="pyarrow")
        .sum(["n_docs", "total_tokens", "n_boundary_docs"])
    )
    total = int(agg["sum(total_tokens)"])
    n_seqs = -(-total // ctx)
    return rd.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([int(agg["sum(n_docs)"])], type=pa.int64()),
                "total_tokens": pa.array([total], type=pa.int64()),
                "n_seqs": pa.array([n_seqs], type=pa.int64()),
                "n_boundary_docs": pa.array([int(agg["sum(n_boundary_docs)"])], type=pa.int64()),
                "tail_pad": pa.array([n_seqs * ctx - total], type=pa.int64()),
            }
        )
    )


def length_bucket_padding(sf_dir: str, multiple: int = PAD_MULTIPLE) -> rd.Dataset:
    """Pad-to-multiple batching audit (the text sibling of
    aspect_buckets): bucket every document at ceil(n_tok/multiple) *
    multiple and report per-bucket doc counts, real tokens and padding
    waste — what a variable-length fine-tuning loader pays per bucket.

    Scale shape: map-side (bucket, count, tok_sum) combiner -> groupby
    over ≤ max_len/multiple bucket rows per partition.  Output:
    (bucket_len, n_docs, sum_tokens, pad_tokens) sorted by bucket_len.
    """
    tok = _doc_token_counts(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_tok"].to_numpy().astype(np.int64)
        b = -(-n // multiple) * multiple
        ub, inv = np.unique(b, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table(
            {
                "bucket_len": pa.array(ub, type=pa.int64()),
                "n_docs": pa.array(cnt, type=pa.int64()),
                "sum_tokens": pa.array(s, type=pa.int64()),
            }
        )

    out = (
        tok.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket_len")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_tokens", alias_name="sum_tokens"))
    )

    def pad(t: pa.Table) -> pa.Table:
        waste = pc.subtract(pc.multiply(t["bucket_len"], t["n_docs"]), t["sum_tokens"])
        return t.append_column("pad_tokens", pc.cast(waste, pa.int64()))

    return out.map_batches(pad, batch_format="pyarrow").sort("bucket_len")


# ---------------------------------------------------------------------------
# C4-style sequential quality-filter funnel
# ---------------------------------------------------------------------------

FUNNEL_MIN_TOK = 10
FUNNEL_MAX_TOK = 5000
FUNNEL_RULES = ("too_short", "too_long", "low_alpha", "no_terminal_punct", "spam_markers")


def filter_funnel(sf_dir: str) -> rd.Dataset:
    """Sequential quality-filter attrition audit (the C4 cleaning
    recipe's reporting pass): five rules applied IN ORDER — too few /
    too many tokens, alpha chars under half the text, no terminal
    punctuation, spam markers ('{' or 'lorem ipsum') — each counted
    only over the survivors of the rules before it, which is exactly
    what a data-cleaning run log shows.

    Scale shape: ONE corpus scan computing all five flags vectorized
    (Arrow kernels, RE2), per-batch partial counts, one 6-int
    aggregate; the 5-row funnel is assembled from those constants.
    Output: (rule_idx, rule, n_in, n_dropped, n_out) in application
    order.
    """
    ds = _read_docs(sf_dir, ["text"])

    def flags(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_tok = pc.list_value_length(pc.split_pattern(txt, " ")).to_numpy().astype(np.int64)
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_alpha = pc.count_substring_regex(txt, "[A-Za-z]").to_numpy().astype(np.int64)
        endp = pc.match_substring_regex(txt, r"[.!?]$").to_numpy(zero_copy_only=False)
        # one RE2 scan == contains('{') OR contains(lower(text), 'lorem ipsum')
        spam = pc.match_substring_regex(txt, r"\{|(?i)lorem ipsum").to_numpy(zero_copy_only=False)
        r1 = n_tok < FUNNEL_MIN_TOK
        r2 = ~r1 & (n_tok > FUNNEL_MAX_TOK)
        r3 = ~r1 & ~r2 & (n_alpha * 2 < n_chars)
        r4 = ~r1 & ~r2 & ~r3 & ~endp
        r5 = ~r1 & ~r2 & ~r3 & ~r4 & spam
        return pa.table(
            {
                "n": pa.array([len(n_tok)], type=pa.int64()),
                "d1": pa.array([int(r1.sum())], type=pa.int64()),
                "d2": pa.array([int(r2.sum())], type=pa.int64()),
                "d3": pa.array([int(r3.sum())], type=pa.int64()),
                "d4": pa.array([int(r4.sum())], type=pa.int64()),
                "d5": pa.array([int(r5.sum())], type=pa.int64()),
            }
        )

    agg = ds.map_batches(flags, batch_format="pyarrow").sum(["n", "d1", "d2", "d3", "d4", "d5"])
    n = int(agg["sum(n)"])
    drops = [int(agg[f"sum(d{i})"]) for i in range(1, 6)]
    n_in, rows = n, []
    for i, (rule, d) in enumerate(zip(FUNNEL_RULES, drops), start=1):
        rows.append((i, rule, n_in, d, n_in - d))
        n_in -= d
    idx, names, nin, nd, nout = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "rule_idx": pa.array(idx, type=pa.int64()),
                "rule": pa.array(names, type=pa.string()),
                "n_in": pa.array(nin, type=pa.int64()),
                "n_dropped": pa.array(nd, type=pa.int64()),
                "n_out": pa.array(nout, type=pa.int64()),
            }
        )
    )


def corpus_flagship(sf_dir: str, ctx: int = PACK_CTX) -> rd.Dataset:
    """The canonical pretraining-data pipeline as ONE streaming DAG:
    quality filter (the four STRUCTURAL filter_funnel rules: token
    bounds, alpha-majority, spam markers — the terminal-punctuation
    style rule stays an audit-only signal, filter_funnel reports it
    dropping 100% of this synthetic corpus) → exact content dedup
    (md5(text), smallest doc_id survives) → concatenate-and-chunk
    sequence-packing manifest over the survivors.  What a user of this
    engine actually runs before a training job, end to end.

    Scale shape: stage 1 is map-only (flags + md5 vectorized; text is
    consumed in-stage and never shuffles); stage 2 shuffles 48-byte
    (hash, doc_id, n_tok) rows once, and the aggregate IS the
    survivorship (duplicates share n_tok by construction, so Min folds
    both columns); stage 3 is the two-pass prefix scan (bin-bounded).
    Output: the packing manifest (doc_id, n_tok, start_tok, first_seq,
    last_seq, n_seqs) of the kept corpus.
    """
    import hashlib

    from ray.data.aggregate import Min

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def keep_and_hash(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_tok = pc.list_value_length(pc.split_pattern(txt, " ")).to_numpy().astype(np.int64)
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_alpha = pc.count_substring_regex(txt, "[A-Za-z]").to_numpy().astype(np.int64)
        spam = pc.match_substring_regex(txt, r"\{|(?i)lorem ipsum").to_numpy(zero_copy_only=False)
        keep = (
            (n_tok >= FUNNEL_MIN_TOK)
            & (n_tok <= FUNNEL_MAX_TOK)
            & (n_alpha * 2 >= n_chars)
            & ~spam
        )
        idx = np.nonzero(keep)[0]
        sub = txt.take(pa.array(idx))
        # the hash never leaves this stage, so key on the two int64
        # halves of the digest instead of the 32-char hex string — the
        # same grouping with 4x smaller, integer-comparable sort keys
        dig = [hashlib.md5(s.encode("utf-8")).digest() for s in sub.to_pylist()]
        raw = np.frombuffer(b"".join(dig), dtype=">u8").reshape(-1, 2) if dig else np.empty((0, 2), dtype=">u8")
        h12 = raw.astype(np.uint64).view(np.int64)
        return pa.table(
            {
                "h1": pa.array(h12[:, 0], type=pa.int64()),
                "h2": pa.array(h12[:, 1], type=pa.int64()),
                "doc_id": t["doc_id"].take(pa.array(idx)),
                "n_tok": pa.array(n_tok[idx], type=pa.int64()),
            }
        )

    surv = (
        ds.map_batches(keep_and_hash, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Min("n_tok", alias_name="n_tok"))
    )

    def to_tok(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
                "bin": pa.array(doc // PACK_BIN_DOCS, type=pa.int64()),
            }
        )

    # materialize the (doc_id, n_tok, bin) survivor table (16 B/row —
    # ~16 GB per 10^9 survivors, object-store-resident) so the prefix
    # scan's two consumers don't re-run the md5 dedup DAG twice
    tok = surv.map_batches(to_tok, batch_format="pyarrow").materialize()
    return _pack_manifest_from(tok, ctx)


def shuffled_packing(sf_dir: str, ctx: int = PACK_CTX) -> rd.Dataset:
    """Sequence packing in SHUFFLED order — what a pretraining run
    actually does: documents are globally shuffled (here the
    content-stable md5(doc_id) order, the hash_split_counts
    convention: deterministic, reshard-proof, no RNG state), then
    concatenated and chunked.  Demonstrates the prefix scan is
    order-parametric: any total order with a cheap bin prefix works.

    Scale shape: bins are the first two hex chars of the hash (256
    buckets, hex string order == numeric order since '0'-'9' < 'a'-'f'
    in ASCII), so pass 1 is a 256-row aggregate and pass 2 regroups by
    hash prefix and sorts (h, doc_id) locally.  Output: the same
    manifest columns as sequence_packing.
    """
    import hashlib

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64())
        doc = t["doc_id"].to_numpy().astype(np.int64)
        h = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in doc]
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "n_tok": n,
                "h": pa.array(h, type=pa.string()),
                "bin": pa.array([int(x[:2], 16) for x in h], type=pa.int64()),
            }
        )

    tok = ds.map_batches(toks, batch_format="pyarrow")

    bins = (
        tok.map_batches(lambda t: pa.table({"bin": t["bin"], "n": t["n_tok"]}), batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: fixed length-bin groups
        .sort_values("bin")
    )
    offs = dict(
        zip(
            bins["bin"].astype(np.int64),
            np.concatenate([[0], np.cumsum(bins["n"].to_numpy(np.int64))[:-1]]),
        )
    )

    def number(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table(
                {"doc_id": z, "n_tok": z, "start_tok": z, "first_seq": z, "last_seq": z, "n_seqs": z}
            )
        g = g.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        n = g["n_tok"].to_numpy().astype(np.int64)
        base = int(offs[int(g["bin"][0].as_py())])
        end = base + np.cumsum(n)
        start = end - n
        first = start // ctx
        last = (end - 1) // ctx
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tok": pa.array(n, type=pa.int64()),
                "start_tok": pa.array(start, type=pa.int64()),
                "first_seq": pa.array(first, type=pa.int64()),
                "last_seq": pa.array(last, type=pa.int64()),
                "n_seqs": pa.array(last - first + 1, type=pa.int64()),
            }
        )

    return tok.groupby("bin").map_groups(number, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Interpolated bigram language-model scoring
# ---------------------------------------------------------------------------

BIGRAM_LAMBDA = 0.75  # interpolation weight on the bigram term


def bigram_lm_score(sf_dir: str, lam: float = BIGRAM_LAMBDA) -> rd.Dataset:
    """Per-doc mean log-probability under an INTERPOLATED bigram LM
    trained on the corpus itself — the Jelinek-Mercer smoothed upgrade
    of :func:`unigram_logprob` (a transition the unigram model calls
    fine but the bigram model calls rare marks templated/shuffled text).

    ``P(w2|w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/T``

    Two bounded reduces (unigram: vocabulary; bigram: vocabulary², both
    corpus-size-independent) broadcast into ONE map-only scoring scan —
    the LM never shuffles documents.  At planet scale the bigram table
    rides ``ray.put`` with a count floor (rare tail pruned to the
    unigram backoff); here it broadcasts whole through the batch-fn
    closure.  round-6 absorbs the mean's summation-order ulp (the
    unigram_logprob discipline).
    """
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split(" "))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, type=pa.string()),
                         "n": pa.array([c[k] for k in toks], type=pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            w = s.lower().split(" ")
            c.update(zip(w[:-1], w[1:]))
        keys = list(c.keys())
        return pa.table(
            {
                "w1": pa.array([k[0] for k in keys], type=pa.string()),
                "w2": pa.array([k[1] for k in keys], type=pa.string()),
                "n": pa.array([c[k] for k in keys], type=pa.int64()),
            }
        )

    uni_tbl = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token").aggregate(_Sum("n", alias_name="n")).to_pandas()
    )
    bi_tbl = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"]).aggregate(_Sum("n", alias_name="n")).to_pandas()
    )
    total = float(uni_tbl["n"].sum())
    uni = {t: int(n) for t, n in zip(uni_tbl["token"], uni_tbl["n"])}
    bi = {(a, b): int(n) for a, b, n in zip(bi_tbl["w1"], bi_tbl["w2"], bi_tbl["n"])}

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        out_id, out_n, out_s = [], [], []
        for i, s in enumerate(t["text"].to_pylist()):
            w = s.lower().split(" ")
            if len(w) < 2:
                continue
            lp = np.empty(len(w) - 1)
            for k in range(len(w) - 1):
                w1, w2 = w[k], w[k + 1]
                lp[k] = np.log(lam * (bi[(w1, w2)] / uni[w1]) + (1.0 - lam) * (uni[w2] / total))
            out_id.append(int(ids[i]))
            out_n.append(len(w) - 1)
            out_s.append(round(float(lp.mean()), 6))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_bigrams": pa.array(out_n, type=pa.int64()),
                "lm_score": pa.array(out_s, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def zipf_fit(sf_dir: str) -> rd.Dataset:
    """Zipf's-law fit of the token frequency spectrum: OLS slope of
    ln(freq) on ln(rank) over the (frequency desc, token asc)-ranked
    vocabulary, with R² — the one-row corpus-health scalar (natural
    text sits near slope -1; templated/synthetic corpora flatten or
    steepen it; cf. vocab_coverage_curve for the cumulative view).

    ONE vocabulary-bounded reduce (the unigram_logprob combiner); the
    regression runs on the aggregate (driver-sized by construction).
    Slope/R² use the explicit closed-form sums, written identically in
    the SQL mirror; round-6 absorbs summation-order ulp.
    """
    from collections import Counter

    from ray.data.aggregate import Sum as _Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split(" "))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, type=pa.string()),
                         "n": pa.array([c[k] for k in toks], type=pa.int64())})

    vocab = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("token").aggregate(_Sum("n", alias_name="n")).to_pandas()
    )
    vocab = vocab.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)
    x = np.log(np.arange(1, len(vocab) + 1, dtype=np.float64))
    y = np.log(vocab["n"].to_numpy().astype(np.float64))
    n = float(len(x))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, syy, sxy = float((x * x).sum()), float((y * y).sum()), float((x * y).sum())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return rd.from_arrow(
        pa.table(
            {
                "n_tokens": pa.array([len(vocab)], type=pa.int64()),
                "zipf_slope": pa.array([round(slope, 6)], type=pa.float64()),
                "r2": pa.array([round(r2, 6)], type=pa.float64()),
            }
        )
    )


CURRICULUM_TIERS = 4


def curriculum_buckets(sf_dir: str, tiers: int = CURRICULUM_TIERS, lam: float = BIGRAM_LAMBDA) -> rd.Dataset:
    """Curriculum manifest: NTILE(``tiers``) of the corpus by bigram-LM
    score (ascending — tier 1 = hardest/most surprising text), counted
    per (tier, lang).  The difficulty-bucketed sampling plan curriculum
    training consumes, built as a DISTRIBUTED NTILE: no global sort.

    Shape (the global_row_numbers two-phase, keyed on the score instead
    of time): per-batch histogram over the ROUNDED score (6 dp — the
    score's own output resolution, so bins are exact fixed-point keys)
    → one bins-sized aggregate whose cumsums are rank offsets → a
    score-keyed regroup assigns rank = offset + local (doc_id) position
    → tier from the exact NTILE split (first N%T tiles get one extra).
    At web scale coarsen the histogram key to score quantile sketches;
    here distinct rounded scores are corpus-bounded and tiny.
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    from collections import Counter

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def uni_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(s.lower().split(" "))
        toks = list(c.keys())
        return pa.table({"token": pa.array(toks, type=pa.string()),
                         "n": pa.array([c[k] for k in toks], type=pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t["text"].to_pylist():
            w = s.lower().split(" ")
            c.update(zip(w[:-1], w[1:]))
        keys = list(c.keys())
        return pa.table(
            {
                "w1": pa.array([k[0] for k in keys], type=pa.string()),
                "w2": pa.array([k[1] for k in keys], type=pa.string()),
                "n": pa.array([c[k] for k in keys], type=pa.int64()),
            }
        )

    uni_tbl = ds.map_batches(uni_partial, batch_format="pyarrow").groupby("token").aggregate(_Sum("n", alias_name="n")).to_pandas()
    bi_tbl = ds.map_batches(bi_partial, batch_format="pyarrow").groupby(["w1", "w2"]).aggregate(_Sum("n", alias_name="n")).to_pandas()
    total = float(uni_tbl["n"].sum())
    uni = {t: int(n) for t, n in zip(uni_tbl["token"], uni_tbl["n"])}
    bi = {(a, b): int(n) for a, b, n in zip(bi_tbl["w1"], bi_tbl["w2"], bi_tbl["n"])}

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        langs = t["lang"].to_pylist()
        out_id, out_lang, out_fp = [], [], []
        for i, s in enumerate(t["text"].to_pylist()):
            w = s.lower().split(" ")
            if len(w) < 2:
                continue
            lp = np.empty(len(w) - 1)
            for k in range(len(w) - 1):
                w1, w2 = w[k], w[k + 1]
                lp[k] = np.log(lam * (bi[(w1, w2)] / uni[w1]) + (1.0 - lam) * (uni[w2] / total))
            out_id.append(int(ids[i]))
            out_lang.append(langs[i])
            # the 6-dp score itself, as an exact fixed-point bin key
            out_fp.append(int(np.int64(round(round(float(lp.mean()), 6) * 1e6))))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "lang": pa.array(out_lang, type=pa.string()),
                "fp": pa.array(out_fp, type=pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    hist = (
        scored.map_batches(
            lambda t: pa.table(
                {
                    "fp": pa.array(np.unique(t["fp"].to_numpy()), type=pa.int64()),
                    "n": pa.array(
                        np.unique(t["fp"].to_numpy(), return_counts=True)[1].astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("fp")
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("fp")
    )
    n_total = int(hist["n"].sum())
    offs = dict(zip(hist["fp"].astype(np.int64), np.concatenate([[0], np.cumsum(hist["n"].to_numpy())[:-1]])))
    q, r = divmod(n_total, tiers)

    def tier_of(rank: np.ndarray) -> np.ndarray:
        # NTILE: first r tiles hold q+1 rows, the rest q
        cut = r * (q + 1)
        small = rank <= cut
        t = np.where(small, (rank - 1) // (q + 1) + 1, r + (rank - cut - 1) // max(q, 1) + 1)
        return t.astype(np.int64)

    def assign(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        base = int(offs[int(g["fp"][0].as_py())])
        rank = base + 1 + np.arange(g.num_rows, dtype=np.int64)
        return pa.table({"tier": pa.array(tier_of(rank), type=pa.int64()), "lang": g["lang"]})

    return (
        scored.groupby("fp")
        .map_groups(assign, batch_format="pyarrow")
        .groupby(["tier", "lang"])
        .aggregate(_Count(alias_name="n_docs"))
    )


# ---------------------------------------------------------------------------
# token_budget_sample (per-source token-budget subsampling manifest)
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 800  # per-source token budget (tokens kept per source)


def token_budget_sample(sf_dir: str, budget: int = TOKEN_BUDGET) -> rd.Dataset:
    """Deterministic per-source token-budget subsample: walk each
    source's documents in content-stable md5(doc_id) order and keep
    documents while the source's running token total stays within
    ``budget`` — the data-mixing primitive that turns
    domain_mixture_weights into an actual training manifest (take
    exactly B_s tokens of source s, reproducibly, with no RNG state).

    A document is kept iff its INCLUSIVE cumulative total <= budget
    (no overshoot; the first too-big doc and everything after it in
    hash order is dropped).

    Scale shape: the shuffled_packing two-pass prefix scan partitioned
    by source — pass 1 aggregates (source, hash-prefix-bin) token sums
    (bounded: sources x 256 rows) whose per-source cumulative sums
    become bin offsets; pass 2 regroups by (source, bin), sorts (h,
    doc_id) locally, and applies the budget cut.  Bins whose offset
    already exceeds the budget emit nothing (the scan is effectively
    a prefix-prune at planet scale).  Output: (doc_id, source, n_tok,
    cum_tokens) for kept docs.
    """
    import hashlib

    ds = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64())
        doc = t["doc_id"].to_numpy().astype(np.int64)
        h = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in doc]
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "source": t["source"],
                "n_tok": n,
                "h": pa.array(h, type=pa.string()),
                "bin": pa.array([int(x[:2], 16) for x in h], type=pa.int64()),
            }
        )

    tok = ds.map_batches(toks, batch_format="pyarrow")

    bins = (
        tok.map_batches(
            lambda t: pa.table({"source": t["source"], "bin": t["bin"], "n": t["n_tok"]}),
            batch_format="pyarrow",
        )
        .groupby(["source", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["source", "bin"])
    )
    offs: dict[tuple[str, int], int] = {}
    for src, g in bins.groupby("source", sort=False):
        cum = np.concatenate([[0], np.cumsum(g["n"].to_numpy(np.int64))[:-1]])
        for b, o in zip(g["bin"].astype(np.int64), cum):
            offs[(str(src), int(b))] = int(o)

    def cut(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "source": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "cum_tokens": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        src = str(g["source"][0].as_py())
        base = offs[(src, int(g["bin"][0].as_py()))]
        if base >= budget:  # whole bin is past the cut: prefix-prune
            return empty
        g = g.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        n = g["n_tok"].to_numpy().astype(np.int64)
        cum = base + np.cumsum(n)
        keep = cum <= budget
        if not keep.any():
            return empty
        return pa.table(
            {
                "doc_id": g["doc_id"].filter(pa.array(keep)),
                "source": g["source"].filter(pa.array(keep)),
                "n_tok": pa.array(n[keep], type=pa.int64()),
                "cum_tokens": pa.array(cum[keep], type=pa.int64()),
            }
        )

    return tok.groupby(["source", "bin"]).map_groups(cut, batch_format="pyarrow")


def lz78_complexity(sf_dir: str) -> rd.Dataset:
    """Per-document LZ78 phrase count — the compressibility audit a
    training corpus runs to catch machine-generated / templated text
    (low phrase-to-char ratio = highly compressible = repetitive),
    complementing repetition_ratio's fixed-window trigram screen with
    a parser that adapts its window.

    The LZ78 parse is deterministic (greedy longest-known-prefix over
    the char stream; each miss mints one phrase), so the phrase count
    is engine-independent.  Oracle: golden driver recompute with an
    INDEPENDENT dictionary structure (string-keyed trie there,
    (prefix_id, char)-keyed dict here).

    Scale shape: map-ONLY — the per-doc parse is an ALU-bound loop
    inside the batch fn (no exchange at all); three scalars per doc
    leave the task.  Output: (doc_id, n_chars, lz78_phrases,
    lz_ratio).
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def per_doc(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_chars = np.zeros(len(texts), dtype=np.int64)
        phrases = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            n_chars[i] = len(s)
            d: dict[tuple[int, str], int] = {}
            node = 0  # 0 = root
            nxt = 1
            count = 0
            for ch in s:
                key = (node, ch)
                child = d.get(key)
                if child is None:
                    d[key] = nxt
                    nxt += 1
                    count += 1
                    node = 0
                else:
                    node = child
            if node != 0:
                count += 1  # trailing partial phrase
            phrases[i] = count
        ratio = duckdb_round(phrases.astype(np.float64) / np.maximum(n_chars.astype(np.float64), 1.0), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars, type=pa.int64()),
                "lz78_phrases": pa.array(phrases, type=pa.int64()),
                "lz_ratio": pa.array(ratio, type=pa.float64()),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


HEAPS_POINTS = 10  # prefix deciles


def heaps_law(sf_dir: str, points: int = HEAPS_POINTS) -> rd.Dataset:
    """Heaps'-law fit of vocabulary growth: distinct tokens V against
    corpus size N over doc_id-prefix deciles, with the OLS fit
    V ≈ K·N^β in log space — the "how fast does new vocabulary keep
    arriving" scalar that sizes tokenizers and dedup dictionaries
    (β ≈ 0.4-0.6 for natural text; β → 1 flags unique-id pollution;
    β → 0 flags CLOSED-vocabulary templated text — which is exactly
    what it detects on the synthetic fixture corpus, tested in both
    regimes).  Completes the corpus-spectrum trio with zipf_fit and
    vocab_coverage_curve.

    Scale shape: token first-appearance = ONE vocabulary-bounded
    groupby-min over doc_id; prefix token totals = ONE ≤points-row
    bucket reduce; the 10-point OLS runs on the aggregate with
    zipf_fit's explicit closed-form sums (round-6 absorbs ulp).
    Output: (prefix_frac, n_tokens_total, n_distinct, heaps_beta,
    heaps_log_k) — fit columns repeated per row.
    """
    from collections import Counter

    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    import pyarrow.parquet as _pq

    max_doc = int(
        _pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    )  # doc ids are 1..N contiguous (fixture contract, asserted by tests)
    cutoffs = np.array([(max_doc * k) // points for k in range(1, points + 1)], dtype=np.int64)

    def first_partial(t: pa.Table) -> pa.Table:
        first: dict[str, int] = {}
        ids = t["doc_id"].to_numpy()
        for did, s in zip(ids, t["text"].to_pylist()):
            for w in s.lower().split(" "):
                prev = first.get(w)
                if prev is None or did < prev:
                    first[w] = int(did)
        toks = list(first.keys())
        return pa.table(
            {
                "token": pa.array(toks, type=pa.string()),
                "first_doc": pa.array([first[k] for k in toks], type=pa.int64()),
            }
        )

    firsts = (
        ds.map_batches(first_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Min("first_doc", alias_name="first_doc"))
    )

    def v_partial(t: pa.Table) -> pa.Table:
        fd = t["first_doc"].to_numpy()
        b = np.searchsorted(cutoffs, fd)  # bucket where the token first counts
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u.astype(np.int64)), "v": pa.array(c.astype(np.int64))})

    v_buckets = {
        int(r["b"]): int(r["v"])
        for r in firsts.map_batches(v_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(_Sum("v", alias_name="v"))
        .take_all()
    }

    def n_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        ntok = np.array([len(s.lower().split(" ")) for s in t["text"].to_pylist()], dtype=np.int64)
        b = np.searchsorted(cutoffs, ids)
        out_n = np.zeros(points, dtype=np.int64)
        np.add.at(out_n, np.minimum(b, points - 1), ntok)
        return pa.table(
            {"b": pa.array(np.arange(points, dtype=np.int64)), "n": pa.array(out_n)}
        )

    n_buckets = {
        int(r["b"]): int(r["n"])
        for r in ds.map_batches(n_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()
    }

    V = np.cumsum([v_buckets.get(b, 0) for b in range(points)]).astype(np.float64)
    N = np.cumsum([n_buckets.get(b, 0) for b in range(points)]).astype(np.float64)
    x = np.log(N)
    y = np.log(V)
    nf = float(points)
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    beta = (nf * sxy - sx * sy) / (nf * sxx - sx * sx)
    logk = (sy - beta * sx) / nf
    fracs = cutoffs.astype(np.float64) / float(max_doc)
    return rd.from_arrow(
        pa.table(
            {
                "prefix_frac": pa.array(duckdb_round(fracs, 6), type=pa.float64()),
                "n_tokens_total": pa.array(N.astype(np.int64), type=pa.int64()),
                "n_distinct": pa.array(V.astype(np.int64), type=pa.int64()),
                "heaps_beta": pa.array(
                    duckdb_round(np.full(points, beta), 6), type=pa.float64()
                ),
                "heaps_log_k": pa.array(
                    duckdb_round(np.full(points, logk), 6), type=pa.float64()
                ),
            }
        )
    )


# ---------------------------------------------------------------------------
# winnowing_overlap (MOSS-style fingerprint sharing between documents)
# ---------------------------------------------------------------------------

WIN_K = 8  # k-gram length (bytes)
WIN_W = 4  # winnowing window (k-gram hashes per window)
WIN_MIN_SHARED = 60  # pair-match threshold (shared distinct fingerprints)
WIN_BUCKET_CAP = 4096  # degenerate-hash bucket truncation (logged)
_WIN_B = np.uint64(1099511628211)  # FNV prime, the fingerprint() base


def _winnow_doc(data: bytes) -> np.ndarray:
    """Distinct winnowed fingerprints of one document (Schleimer,
    Wilkerson & Aiken 2003): polynomial k-gram hashes mod 2^64, then
    per length-w window the MINIMUM hash, RIGHTMOST occurrence on
    ties (robust winnowing) — guarantees any shared substring of
    length ≥ w+k−1 yields a shared fingerprint."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if len(b) < WIN_K + WIN_W - 1:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        powers = np.cumprod(np.full(WIN_K, _WIN_B, dtype=np.uint64))[::-1]
        grams = np.lib.stride_tricks.sliding_window_view(b, WIN_K)
        hashes = (grams * powers).sum(axis=1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, WIN_W)
    # rightmost min: argmin over the REVERSED window, mapped back
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    sel = win[np.arange(len(win)), WIN_W - 1 - rev_arg]
    return np.unique(sel.view(np.int64))


def winnowing_overlap(sf_dir: str, min_shared: int = WIN_MIN_SHARED) -> rd.Dataset:
    """Document-pair overlap via winnowed fingerprints — the MOSS
    plagiarism/boilerplate detector: docs sharing ≥ min_shared
    winnowed k-gram hashes contain substantial common substrings
    (every shared run of ≥ WIN_W+WIN_K−1 bytes is guaranteed
    represented), sitting between exact dedup (whole-content hash)
    and minhash (set-resemblance) in the dedup family.

    Determinism: hashes are mod-2^64 integer arithmetic; the
    rightmost-min window rule is exact; everything after is the
    audio_fingerprint exchange verbatim.

    Scale shape: fingerprint extraction is map-ONLY (text consumed
    in-stage; ~len/w 8-byte hashes per doc leave) -> (hash)-keyed
    groupby with the LSH bucket discipline (> WIN_BUCKET_CAP
    truncates, logged) -> (pair)-keyed count -> threshold filter.
    Fingerprints, never text, shuffle.

    Output: (doc_a, doc_b, n_shared) for matched pairs.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fingerprints(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        hs: list[np.ndarray] = []
        for did, txt in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
            h = _winnow_doc(txt.encode("utf-8"))
            ids.extend([int(did)] * len(h))
            hs.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "h": pa.array(
                    np.concatenate(hs) if hs else np.empty(0, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(g["doc_id"].to_pylist())
        if len(ids) > WIN_BUCKET_CAP:
            import logging

            logging.getLogger(__name__).warning(
                "winnowing_overlap: hash bucket truncated %d -> %d", len(ids), WIN_BUCKET_CAP
            )
            ids = ids[:WIN_BUCKET_CAP]
        if len(ids) < 2:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
            )
        a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))])
        return pa.table(
            {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
        )

    pairs = (
        ds.map_batches(fingerprints, batch_format="pyarrow")
        .groupby("h")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_shared"))
    )
    return pairs.filter(expr=f"n_shared >= {min_shared}")


# ---------------------------------------------------------------------------
# gopher_rules (published MassiveText/Gopher quality-filter audit)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_RULES = (
    "word_count",      # n_words in [50, 100000]
    "mean_word_len",   # mean word length in [3, 10]
    "hash_ratio",      # '#' per word <= 0.1
    "ellipsis_ratio",  # '...' per word <= 0.3
    "alpha_words",     # >= 80% of words contain a letter
    "stopwords",       # >= 2 distinct common stopwords present
)


def gopher_rules(sf_dir: str) -> rd.Dataset:
    """Corpus audit against the PUBLISHED Gopher/MassiveText quality
    heuristics (Rae et al. 2021, §A1.1): the standard pre-training
    text filter, reported as per-rule fail counts plus the all-rules
    pass count — the number a data curator reads before committing a
    crawl slice to the mixture.

    Every rule is evaluated in EXACT integer arithmetic (e.g. the
    mean-word-length band 3 <= sum_len/n <= 10 becomes
    3n <= sum_len <= 10n) so the engine and the DuckDB mirror agree
    bit-for-bit with no float thresholds.  Word grain: single-space
    split, the corpus convention shared by heavy_hitters and the
    token oracles; substring counts use the replace-length formula —
    non-overlapping, left-to-right — on both sides.

    Scale shape: map-ONLY vectorized Arrow kernels (split offsets +
    reduceat for the per-word letter test; no Python row loop) ->
    8-int64 per-batch partial -> ONE constant-key groupby; the
    finalize reshapes to (rule, n_docs, n_fail, fail_rate).
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        low = pc.utf8_lower(text)
        words = pc.split_pattern(low, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = pc.list_value_length(words).to_numpy().astype(np.int64)
        len_txt = pc.utf8_length(low).to_numpy().astype(np.int64)
        sum_wl = len_txt - (n_words - 1)  # single-space split identity
        n_hash = len_txt - pc.utf8_length(pc.replace_substring(low, "#", "")).to_numpy().astype(np.int64)
        n_ell = (
            len_txt - pc.utf8_length(pc.replace_substring(low, "...", "")).to_numpy().astype(np.int64)
        ) // 3
        flat = words.flatten()
        has_alpha = pc.match_substring_regex(flat, "[a-z]").to_numpy(zero_copy_only=False)
        offs = words.offsets.to_numpy()
        n_alpha = np.add.reduceat(
            np.concatenate([has_alpha.astype(np.int64), [0]]), offs[:-1]
        ) * (n_words > 0)
        n_stop = np.zeros(len(n_words), dtype=np.int64)
        for sw in GOPHER_STOPWORDS:
            n_stop += pc.match_substring_regex(low, rf"\b{sw}\b").to_numpy(zero_copy_only=False).astype(np.int64)
        fail_wc = (n_words < 50) | (n_words > 100_000)
        fail_mwl = (3 * n_words > sum_wl) | (sum_wl > 10 * n_words)
        fail_hash = 10 * n_hash > n_words
        fail_ell = 10 * n_ell > 3 * n_words
        fail_alpha = 10 * n_alpha < 8 * n_words
        fail_stop = n_stop < 2
        pass_all = ~(fail_wc | fail_mwl | fail_hash | fail_ell | fail_alpha | fail_stop)
        cols = {
            "n_docs": len(n_words),
            "f_word_count": int(fail_wc.sum()),
            "f_mean_word_len": int(fail_mwl.sum()),
            "f_hash_ratio": int(fail_hash.sum()),
            "f_ellipsis_ratio": int(fail_ell.sum()),
            "f_alpha_words": int(fail_alpha.sum()),
            "f_stopwords": int(fail_stop.sum()),
            "n_pass": int(pass_all.sum()),
        }
        return pa.table({k: pa.array([v], type=pa.int64()) for k, v in cols.items()}).append_column(
            "_g", pa.array([0], type=pa.int64())
        )

    cols = [
        "n_docs",
        "f_word_count",
        "f_mean_word_len",
        "f_hash_ratio",
        "f_ellipsis_ratio",
        "f_alpha_words",
        "f_stopwords",
        "n_pass",
    ]
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_g")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def finish(t: pa.Table) -> pa.Table:
        nd = int(t["n_docs"][0].as_py())
        rules = list(GOPHER_RULES) + ["pass_all"]
        fails = [int(t[f"f_{r}"][0].as_py()) for r in GOPHER_RULES] + [nd - int(t["n_pass"][0].as_py())]
        rate = duckdb_round(np.asarray(fails, dtype=np.float64) / float(nd), 6)
        return pa.table(
            {
                "rule": pa.array(rules, type=pa.string()),
                "n_docs": pa.array([nd] * len(rules), type=pa.int64()),
                "n_fail": pa.array(fails, type=pa.int64()),
                "fail_rate": pa.array(rate, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# naive_bayes_domain (multinomial NB source classifier, trained + scored
# in-engine — "learning as aggregation" with a full SQL oracle)
# ---------------------------------------------------------------------------

NB_FP = 10**9  # log-weight fixed-point quantum


def naive_bayes_domain(sf_dir: str) -> rd.Dataset:
    """Train a Laplace-smoothed multinomial naive-Bayes classifier
    predicting each document's ``source`` from its tokens, score the
    corpus with it, and report the confusion matrix — the classic
    domain/provenance classifier a mixture curator runs to ask "are
    sources even distinguishable?" (high confusion = homogeneous
    corpus, a clean diagonal = strong domain signal).

    Exactness: every model parameter — class prior ln(n_c/N) and
    token weight ln((cnt+1)/(tot_c+V)) — is fixed to int64 ONCE
    (floor(·FP+0.5)); a document's class score is then an INTEGER sum
    over its token occurrences, so argmax (score desc, class asc) is
    bit-stable and the DuckDB mirror adds the same integers.

    Scale shape: model training is two bounded aggregations (class
    doc-counts; (class, token) counts — vocab x classes, the quantity
    every NB trainer ships); the model broadcasts once (ray.put) into
    a map-ONLY scoring pass (searchsorted token->row, reduceat per
    doc, one (V+1) x C weight GEMM-free lookup); the confusion matrix
    is ONE classes²-bounded groupby.  Docs never shuffle.

    Output: (true_source, pred_source, n_docs).
    """
    import ray

    from ray.data.aggregate import Count as AggCount

    ds = _read_docs(sf_dir, ["doc_id", "text", "source"])

    # --- training aggregations -------------------------------------------
    def tok_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        n_per = pc.list_value_length(words).to_numpy().astype(np.int64)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per)
        df = pd.DataFrame({"source": src, "word": flat})
        g = df.groupby(["source", "word"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "word": pa.array(g["word"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(tok_partial, batch_format="pyarrow")
        .groupby(["source", "word"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    doc_counts = (
        ds.map_batches(
            lambda t: pa.table({"source": t["source"]}), batch_format="pyarrow"
        )
        .groupby("source")
        .aggregate(AggCount(alias_name="n_docs"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    classes = doc_counts["source"].tolist()
    n_total = int(doc_counts["n_docs"].sum())
    vocab = np.array(sorted(counts["word"].unique()))
    V = len(vocab)
    C = len(classes)
    cnt = np.zeros((V, C), dtype=np.int64)
    widx = {w: i for i, w in enumerate(vocab)}
    cidx = {c: i for i, c in enumerate(classes)}
    for s, w, nn in zip(counts["source"], counts["word"], counts["n"]):
        cnt[widx[w], cidx[s]] = int(nn)
    tot_c = cnt.sum(axis=0)
    fp = float(NB_FP)
    # (V+1, C): last row is the unseen-token default per class
    W = np.empty((V + 1, C), dtype=np.int64)
    W[:V] = np.floor(np.log((cnt + 1).astype(np.float64) / (tot_c + V).astype(np.float64)) * fp + 0.5).astype(np.int64)
    W[V] = np.floor(np.log(1.0 / (tot_c + V).astype(np.float64)) * fp + 0.5).astype(np.int64)
    prior = np.floor(
        np.log(doc_counts["n_docs"].to_numpy().astype(np.float64) / float(n_total)) * fp + 0.5
    ).astype(np.int64)
    model_ref = ray.put({"vocab": vocab, "W": W, "prior": prior, "classes": np.array(classes)})

    # --- scoring pass -----------------------------------------------------
    class Score:
        def __init__(self):
            m = ray.get(model_ref)
            self.vocab, self.W, self.prior, self.classes = m["vocab"], m["W"], m["prior"], m["classes"]

        def __call__(self, t: pa.Table) -> pa.Table:
            words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
            if isinstance(words, pa.ChunkedArray):
                words = words.combine_chunks()
            flat = words.flatten().to_numpy(zero_copy_only=False)
            offs = words.offsets.to_numpy().astype(np.int64)
            pos = np.searchsorted(self.vocab, flat)
            pos = np.where((pos < len(self.vocab)) & (self.vocab[np.minimum(pos, len(self.vocab) - 1)] == flat), pos, len(self.vocab))
            tw = self.W[pos]  # (n_tokens, C) int64
            padded = np.concatenate([tw, np.zeros((1, tw.shape[1]), dtype=np.int64)])
            scores = np.add.reduceat(padded, offs[:-1], axis=0)
            empty = np.diff(offs) == 0
            scores[empty] = 0
            scores = scores + self.prior[None, :]
            pred = self.classes[np.argmax(scores, axis=1)]
            return pa.table(
                {
                    "true_source": t["source"],
                    "pred_source": pa.array(pred, type=pa.string()),
                }
            )

    return (
        ds.map_batches(Score, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))
        .groupby(["true_source", "pred_source"])
        .aggregate(AggCount(alias_name="n_docs"))
    )


# ---------------------------------------------------------------------------
# huffman_code_lengths (optimal prefix-code audit of the corpus vocabulary)
# ---------------------------------------------------------------------------


def huffman_tree_lengths(tokens: list, counts: list) -> dict:
    """Deterministic Huffman code lengths: leaves enter the heap as
    (count, seq) with seq = index in TOKEN-SORTED order; merged nodes
    take the next seq — a total order that pins the tree shape, so
    engine and golden agree on LENGTHS exactly (not just their sum)."""
    import heapq

    order = sorted(range(len(tokens)), key=lambda i: tokens[i])
    heap = []
    for seq, i in enumerate(order):
        heap.append((int(counts[i]), seq, ("leaf", tokens[i])))
    heapq.heapify(heap)
    nxt = len(heap)
    depth: dict = {}
    if len(heap) == 1:
        return {heap[0][2][1]: 1}
    while len(heap) > 1:
        c1, s1, n1 = heapq.heappop(heap)
        c2, s2, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (c1 + c2, nxt, ("node", n1, n2)))
        nxt += 1
    stack = [(heap[0][2], 0)]
    while stack:
        node, d = stack.pop()
        if node[0] == "leaf":
            depth[node[1]] = d
        else:
            stack.append((node[1], d + 1))
            stack.append((node[2], d + 1))
    return depth


def huffman_code_lengths(sf_dir: str) -> rd.Dataset:
    """Optimal prefix-code table for the corpus token distribution —
    the information-theoretic capstone of the compression-audit family:
    Huffman lengths are the ACHIEVABLE integer-bit encoding
    (entropy <= avg_bits < entropy + 1), so comparing them against
    zipf_fit / compression_stats says how much of the corpus'
    compressibility a token-level code captures.

    Scale shape: ONE vocabulary-bounded token-count reduce (the
    token_doc_frequency exchange); the O(V log V) tree build runs on
    the aggregate — corpus-size-independent.  Determinism: heap
    entries are (count, sorted-token-seq), a total order, so the tree
    and every code length are bit-stable; the golden builds the same
    tree with the INDEPENDENT two-queue algorithm from DuckDB counts
    (per-token depth agreement, not just the Kraft-optimal total).

    Output: (token, n, code_len), one row per vocabulary token.
    """
    ds = _read_docs(sf_dir, ["text"])

    def tok(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        u, c = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "token": pa.array(u, type=pa.string()),
                "n": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(tok, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    depths = huffman_tree_lengths(counts["token"].tolist(), counts["n"].tolist())
    lens = np.array([depths[t] for t in counts["token"]], dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(counts["token"], type=pa.string()),
                "n": pa.array(counts["n"].to_numpy().astype(np.int64), type=pa.int64()),
                "code_len": pa.array(lens, type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# good_turing_unseen (unseen-mass / richness estimate per source)
# ---------------------------------------------------------------------------


def good_turing_unseen(sf_dir: str) -> rd.Dataset:
    """Per-source Good-Turing unseen-probability mass and Chao1
    richness — "how much of this domain's vocabulary have we NOT seen
    yet?", the coverage question a crawl planner asks before deciding
    whether another pass over a source is worth it (high f1/N = the
    domain is far from exhausted; Chao1 projects the asymptotic
    vocabulary).

        unseen_mass = f1 / N          (Good 1953)
        chao1       = V + f1*(f1-1) / (2*(f2+1))   (bias-corrected)

    Scale shape: per-batch (source, token) combiner -> ONE
    (source, token)-keyed count reduce (the NB-training exchange) ->
    a frequency-of-frequencies fold per source (rows = sources x
    distinct counts, bounded) -> driver finalize on the source-bounded
    table.  All counts exact int64; the two ratios are mirrored float
    expressions rounded to 6.

    Output: (source, n_tokens, vocab, f1, f2, unseen_mass, chao1).
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["text", "source"])

    def tok_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        n_per = pc.list_value_length(words).to_numpy().astype(np.int64)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per)
        df = pd.DataFrame({"source": src, "word": flat})
        g = df.groupby(["source", "word"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "word": pa.array(g["word"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(tok_partial, batch_format="pyarrow")
        .groupby(["source", "word"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fof(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": t["source"].to_numpy(zero_copy_only=False), "n": t["n"].to_numpy()}
        )
        g = df.groupby("source", sort=False).agg(
            n_tokens=("n", "sum"),
            vocab=("n", "size"),
            f1=("n", lambda s: int((s == 1).sum())),
            f2=("n", lambda s: int((s == 2).sum())),
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "n_tokens": pa.array(g["n_tokens"].to_numpy().astype(np.int64), type=pa.int64()),
                "vocab": pa.array(g["vocab"].to_numpy().astype(np.int64), type=pa.int64()),
                "f1": pa.array(g["f1"].to_numpy().astype(np.int64), type=pa.int64()),
                "f2": pa.array(g["f2"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    per_src = (
        counts.map_batches(fof, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("vocab", alias_name="vocab"),
            Sum("f1", alias_name="f1"),
            Sum("f2", alias_name="f2"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy().astype(np.float64)
        v = t["vocab"].to_numpy().astype(np.float64)
        f1 = t["f1"].to_numpy().astype(np.float64)
        f2 = t["f2"].to_numpy().astype(np.float64)
        unseen = duckdb_round(f1 / n, 6)
        chao1 = duckdb_round(v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0)), 6)
        return (
            t.append_column("unseen_mass", pa.array(unseen, type=pa.float64()))
            .append_column("chao1", pa.array(chao1, type=pa.float64()))
        )

    return per_src.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified_kfold (deterministic stratified cross-validation manifest)
# ---------------------------------------------------------------------------

KFOLD_K = 5


def stratified_kfold(sf_dir: str, k: int = KFOLD_K) -> rd.Dataset:
    """Deterministic stratified k-fold assignment over documents:
    fold = (rank of doc_id within its source) mod k — every fold gets
    an equal share of EVERY source (the stratification guarantee),
    reproducible with no RNG (the hash_split_counts discipline, but
    rank-based so strata split exactly even instead of only in
    expectation).  Reported as the (source, fold) count matrix plus
    per-fold language balance — the audit a curator reads to confirm
    folds are exchangeable before cross-validation.

    Scale shape: ranks come from a source-keyed groupby (per-stratum
    rows co-locate; per-key size is the per-source doc count — the
    sessionize contract; at web scale switch to the
    global_row_numbers two-phase rank, documented); the audit is ONE
    (source, fold)-bounded count reduce joined with a lang-bounded
    fold profile.

    Output: (source, fold, n_docs, n_langs).
    """
    from ray.data.aggregate import Count as AggCount

    ds = _read_docs(sf_dir, ["doc_id", "source", "lang"])

    def assign(g: pa.Table) -> pa.Table:
        order = np.argsort(g["doc_id"].to_numpy())
        fold = np.empty(g.num_rows, dtype=np.int64)
        fold[order] = np.arange(g.num_rows, dtype=np.int64) % k
        return pa.table(
            {
                "source": g["source"],
                "lang": g["lang"],
                "fold": pa.array(fold, type=pa.int64()),
            }
        )

    folded = ds.groupby("source").map_groups(assign, batch_format="pyarrow")

    # distinct-language count via the two-level reduce (the
    # caption_conflict_dups discipline — robust to any re-batching of
    # the map_groups output): (source, fold, lang) counts first, then
    # fold the lang axis
    per_lang = (
        folded.groupby(["source", "fold", "lang"]).aggregate(AggCount(alias_name="n"))
    )

    def fold_axis(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "fold": t["fold"].to_numpy(),
                "n": t["n"].to_numpy(),
            }
        )
        g = df.groupby(["source", "fold"], sort=False).agg(
            n_docs=("n", "sum"), n_langs=("n", "size")
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "fold": pa.array(g["fold"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_docs": pa.array(g["n_docs"].to_numpy().astype(np.int64), type=pa.int64()),
                "n_langs": pa.array(g["n_langs"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return (
        per_lang.map_batches(fold_axis, batch_format="pyarrow")
        .groupby(["source", "fold"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_langs", alias_name="n_langs"))
    )


# ---------------------------------------------------------------------------
# word_burstiness (Church-Gale contagion audit per token)
# ---------------------------------------------------------------------------

BURST_MIN_N = 20


def word_burstiness(sf_dir: str, min_n: int = BURST_MIN_N) -> rd.Dataset:
    """Per-token burstiness: observed document frequency vs the
    Poisson expectation  D·(1 − e^(−n/D))  — Church & Gale's classic
    observation that content words are CONTAGIOUS (they repeat within
    few documents; df_obs << df_poisson) while function words spread
    evenly.  The beyond-frequency lexical statistic a mixture curator
    uses to find topical/templated vocabulary that plain counts hide.

    Exactness: n (total occurrences), df (documents containing) and D
    (corpus size) are exact int64 from two bounded reduces (the
    token_doc_frequency exchanges); the expectation and the ratio are
    mirrored float expressions rounded to 6.

    Scale shape: (token, doc) distinct combiner -> token-keyed count
    for df; token-keyed sum for n; ONE vocabulary-bounded join of the
    two aggregates.  Output: (token, n, df, df_expected, burstiness)
    for tokens with n >= min_n, burstiness = df_expected / df (>1 =
    bursty/contagious).
    """
    from ray.data.aggregate import Count as AggCount

    from ..stages.common import duckdb_round, safe_join

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()

    def tok(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        n_per = pc.list_value_length(words).to_numpy().astype(np.int64)
        did = np.repeat(t["doc_id"].to_numpy(), n_per)
        df = pd.DataFrame({"doc_id": did, "token": flat})
        g = df.groupby(["doc_id", "token"], sort=False).size().reset_index(name="k")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64), type=pa.int64()),
                "token": pa.array(g["token"], type=pa.string()),
                "k": pa.array(g["k"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    per_doc = (
        ds.map_batches(tok, batch_format="pyarrow")
        .groupby(["doc_id", "token"])
        .aggregate(Sum("k", alias_name="k"))
        .materialize()
    )
    stats_tbl = (
        per_doc.groupby("token")
        .aggregate(Sum("k", alias_name="n"), AggCount(alias_name="df"))
        .filter(expr=f"n >= {min_n}")
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.float64)
        df = t["df"].to_numpy().astype(np.float64)
        d = float(n_docs)
        exp_df = d * (1.0 - np.exp(-n / d))
        return pa.table(
            {
                "token": t["token"],
                "n": t["n"],
                "df": t["df"],
                "df_expected": pa.array(duckdb_round(exp_df, 6), type=pa.float64()),
                "burstiness": pa.array(duckdb_round(exp_df / df, 6), type=pa.float64()),
            }
        )

    return stats_tbl.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ams_f2_eval (AMS second-moment sketch, error-audited)
# ---------------------------------------------------------------------------

AMS_ROWS = 64


def _ams_sign(tok_hash: np.ndarray, row: int) -> np.ndarray:
    """Deterministic ±1 sign per (token, estimator row): murmur-style
    integer mix — the 4-wise-independent hash family stand-in, pinned
    identically in engine and golden."""
    with np.errstate(over="ignore"):
        mix = np.uint64(row) * np.uint64(0x9E3779B97F4A7C15)  # wraparound is the modulus
        h = (tok_hash ^ mix) * np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return np.where((h & np.uint64(1)) == 1, 1, -1).astype(np.int64)


def _tok_hash64(tokens: np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit of utf-8 token bytes, vectorized per token."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        out[i] = h
    return out


def ams_f2_eval(sf_dir: str, rows: int = AMS_ROWS) -> rd.Dataset:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996),
    error-audited against the exact F2 = Σ n_t² — the join-size /
    self-join-cardinality estimator every planner wants, completing
    the sketch-audit family (KMV distinct, Space-Saving heavy
    hitters, Count-Min point queries, HLL registers).

    Exactness: each estimator row's sketch Z_i = Σ_t n_t·s_i(t) is a
    LINEAR functional of token counts -> per-batch int64 partials are
    merge-order-proof; Z_i² and the exact F2 are integers; only the
    mean-of-squares and relative error are rounded floats.

    Scale shape: ONE pass computes all 64 sketch partials (token
    hashes once per batch, signs by integer mix) + the exact-side
    (token, n) reduce for F2; network carries 64+vocab ints.
    Output: one row (n_tokens, vocab, f2_exact, f2_est, rel_err).
    """
    from ..stages.common import duckdb_round

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        u, c = np.unique(flat, return_counts=True)
        th = _tok_hash64(u)
        cols = {"n_tok": int(c.sum())}
        for r in range(rows):
            cols[f"z{r}"] = int((c.astype(np.int64) * _ams_sign(th, r)).sum())
        tbl = pa.table(
            {"_g": pa.array([0], type=pa.int64())}
            | {k2: pa.array([v], type=pa.int64()) for k2, v in cols.items()}
        )
        return tbl

    sketch = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_g")
        .aggregate(*[Sum(k2, alias_name=k2) for k2 in ["n_tok"] + [f"z{r}" for r in range(rows)]])
        .to_pandas()  # bounded: single-group sketch rows
    )
    # exact side: vocabulary-bounded count reduce
    def tok(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(t["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten().to_numpy(zero_copy_only=False)
        u, c = np.unique(flat, return_counts=True)
        return pa.table(
            {"token": pa.array(u, type=pa.string()), "n": pa.array(c.astype(np.int64))}
        )

    counts = (
        ds.map_batches(tok, batch_format="pyarrow").groupby("token").aggregate(Sum("n", alias_name="n")).to_pandas()  # bounded: token vocabulary
    )
    nv = counts["n"].to_numpy().astype(object)
    f2_exact = int(sum(v * v for v in nv))
    zs = np.array([int(sketch[f"z{r}"][0]) for r in range(rows)], dtype=object)
    f2_est = float(sum(z * z for z in zs)) / rows
    rel = abs(f2_est - f2_exact) / f2_exact
    return rd.from_arrow(
        pa.table(
            {
                "n_tokens": pa.array([int(sketch["n_tok"][0])], type=pa.int64()),
                "vocab": pa.array([len(counts)], type=pa.int64()),
                "f2_exact": pa.array([f2_exact], type=pa.int64()),
                "f2_est": pa.array(duckdb_round(np.array([f2_est]), 6), type=pa.float64()),
                "rel_err": pa.array(duckdb_round(np.array([rel]), 6), type=pa.float64()),
            }
        )
    )
