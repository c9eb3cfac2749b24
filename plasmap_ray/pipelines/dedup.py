"""Deduplication pipelines: exact, MinHash-LSH, SimHash, phash-Hamming.

Rebuild + extension of the reference's dedup stages (D1/D2,
Queries.scala:297,330,340 — bloom-filter approximate dedup with FP
drop-risk).  Here dedup is EXACT (hash-partition + per-group first):
a superset-safe deviation, documented in SURVEY.md §2.7.  The
approximate family (MinHash/SimHash/phash-LSH) targets *near*-dups —
the training-data use case — with banded LSH shuffles:
``signature -> explode (band, key) -> groupby -> verify within group``.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Min
from ..stages.common import safe_join


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def exact_dedup_by_key(sf_dir: str, buckets: int = 400) -> rd.Dataset:
    """Exact first-wins dedup over a derived collision key (D1 shape).

    ``dup_key = doc_id % buckets`` plants deterministic collisions; the
    survivor is the minimum doc_id per key (hash-partition + per-group
    first — the scalable replacement for the reference's bloom dedup).
    """
    ds = _read_docs(sf_dir, ["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"].to_numpy()
        return t.append_column("dup_key", pa.array(np.asarray(ids, dtype=np.int64) % buckets, type=pa.int64()))

    ds = ds.map_batches(key, batch_format="pyarrow")
    return ds.groupby("dup_key").aggregate(Min("doc_id", alias_name="first_doc_id"), Count(alias_name="n_dups"))


DECON_FRAC = 0.1  # fraction of docs standing in for the benchmark corpus


def decontaminate(sf_dir: str, frac: float = DECON_FRAC) -> rd.Dataset:
    """Benchmark decontamination: drop every document whose md5(text)
    appears in the held-out 'benchmark' slice of the corpus.

    The benchmark slice is the deterministic LCG-mix Bernoulli sample
    (trajectory.sample_u) of doc_ids — at real scale this is the
    external eval-set table.  Its content hashes are collected ONCE
    (small side), ``ray.put`` broadcast, and the corpus is filtered
    map-side against the set — the anti_search broadcast anti-join
    pattern, no shuffle.  Content-level: a non-benchmark doc whose text
    duplicates a benchmark doc is dropped too.
    """
    import ray

    from .trajectory import sample_u

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(sample_u(ids) < frac))
        h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(h, type=pa.string())})

    blocked = set(docs.map_batches(bench_hashes, batch_format="pyarrow").unique("h"))
    ref = ray.put(blocked)

    def scrub(t: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        mask = np.fromiter((x not in bl for x in h), dtype=bool, count=len(h))
        return t.drop_columns(["text"]).filter(pa.array(mask))

    full = _read_docs(sf_dir, ["doc_id", "text", "lang", "source"])
    return full.map_batches(scrub, batch_format="pyarrow")


def text_md5_dedup(sf_dir: str) -> rd.Dataset:
    """Exact content dedup by md5(text) (SQL mirror: DuckDB ``md5``)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def add_md5(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return t.drop_columns(["text"]).append_column("text_md5", pa.array(h, type=pa.string()))

    ds = ds.map_batches(add_md5, batch_format="pyarrow")
    return ds.groupby("text_md5").aggregate(Min("doc_id", alias_name="first_doc_id"), Count(alias_name="n_copies"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (documents)
# ---------------------------------------------------------------------------

NUM_HASHES = 64
SHINGLE = 5
BANDS = 8  # 8 bands x 8 rows
ROWS_PER_BAND = NUM_HASHES // BANDS


class MinHashSignature:
    """Actor-pool stage: char-shingle MinHash signatures per document.

    Permutation coefficients generated once per actor (seeded — every
    actor derives the identical family).  Shingling + hashing is
    vectorized NumPy per row (sliding windows, wraparound uint64
    arithmetic as the modulus).
    """

    def __init__(self, num_hashes: int = NUM_HASHES, shingle: int = SHINGLE, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 61, num_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 62, num_hashes).astype(np.uint64)
        self.shingle = shingle
        self.pw = (np.uint64(257) ** np.arange(shingle, dtype=np.uint64)).astype(np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if b.size < self.shingle:
            b = np.pad(b, (0, self.shingle - b.size), constant_values=32)
        win = np.lib.stride_tricks.sliding_window_view(b, self.shingle)
        with np.errstate(over="ignore"):
            return np.unique((win * self.pw[None, :]).sum(axis=1, dtype=np.uint64))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        with np.errstate(over="ignore"):
            return (self.a[:, None] * sh[None, :] + self.b[:, None]).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = np.empty((batch.num_rows, len(self.a)), dtype=np.uint64)
        for i, v in enumerate(batch["text"]):
            sigs[i] = self.signature(v.as_py())
        return batch.drop_columns(["text"]).append_column(
            "minhash", pa.array(list(sigs.view(np.int64)), type=pa.list_(pa.int64(), len(self.a)))
        )


def _band_explode(batch: pa.Table, bands: int = BANDS, rows: int = ROWS_PER_BAND) -> pa.Table:
    """(doc_id, minhash) -> one row per band: (doc_id, band, band_key, minhash)."""
    sigs = np.asarray(batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(
        batch.num_rows, bands * rows
    ).view(np.uint64)
    parts = []
    with np.errstate(over="ignore"):
        mix = np.cumprod(np.full(rows, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64))
        for band in range(bands):
            key = (sigs[:, band * rows : (band + 1) * rows] * mix[None, :]).sum(axis=1, dtype=np.uint64)
            t = batch.append_column("band", pa.array(np.full(batch.num_rows, band, dtype=np.int32)))
            t = t.append_column("band_key", pa.array(key.view(np.int64), type=pa.int64()))
            parts.append(t)
    return pa.concat_tables(parts)


import logging

logger = logging.getLogger(__name__)

MAX_LSH_GROUP = 4096  # cap quadratic pair expansion per bucket (truncation is logged)
PAIR_CHUNK = 1 << 21  # candidate pairs verified per vectorized slice (bounds task memory)


LSH_KEY_SHARDS = 32  # key-space shards per band: shuffle parallelism = bands*shards


def _shard_band_key(t: pa.Table, shards: int = LSH_KEY_SHARDS) -> pa.Table:
    """Shuffle key refinement: (band) -> (band, band_key % shards).

    Rows sharing a band_key stay co-located (shard is a function of the
    key), but one task now holds only a 1/shards slice of a band's key
    space instead of the band's ENTIRE corpus — the round-1 per-band
    grouping put the whole dataset into `bands` tasks, unbounded memory
    and parallelism capped at 4-8.  Results are identical: the run scan
    inside each task already handles many keys per partition."""
    key = t["band_key"].to_numpy().view(np.uint64)
    return t.append_column("shard", pa.array((key % np.uint64(shards)).astype(np.int64), type=pa.int64()))


def minhash_near_dup(sf_dir: str, sim_threshold: float = 0.8) -> rd.Dataset:
    """MinHash+LSH near-duplicate pairs over documents.

    shingle->minhash (actor pool) -> band explode -> (band, key-shard)
    shuffle -> sort + key-run scan per shard -> signature-agreement
    verify -> distinct pairs.  (Run-scan per shard instead of a groupby
    over thousands of tiny (band,key) buckets, whose per-group dispatch
    dominates; shard count bounds per-task memory at scale.)
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(MinHashSignature, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8))
    exploded = sigs.map_batches(_band_explode, batch_format="pyarrow").map_batches(
        _shard_band_key, batch_format="pyarrow"
    )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["band_key"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        sig_m = np.stack(g["minhash"].to_numpy())

        def verify(i, j):
            return (sig_m[i] == sig_m[j]).mean(axis=1)

        # real doc ids as the in-run sort tiebreak -> deterministic pair
        # order (and deterministic truncation under the skew cap)
        ia, ib, est = pairs_in_key_runs(keys, ids, verify)
        keep = est >= sim_threshold
        a = ids[ia[keep]]
        b = ids[ib[keep]]
        swap = a > b
        return pd.DataFrame(
            {
                "doc_a": np.where(swap, b, a),
                "doc_b": np.where(swap, a, b),
                "est_jaccard": np.round(est[keep], 6),
            }
        )

    pairs = exploded.groupby(["band", "shard"]).map_groups(band_pairs, batch_format="pandas")
    # a pair can surface from several bands -> keep one row per pair
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("est_jaccard", alias_name="est_jaccard"))


def ngram_jaccard_near_dup(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """EXACT n-gram (char-shingle) Jaccard near-dup pairs.

    Same banded-LSH candidate generation as :func:`minhash_near_dup`,
    but the verify step computes the TRUE Jaccard of the documents'
    shingle-hash sets instead of the signature estimate — the shingle
    sets travel with the rows as list columns.  This is the
    exact-verify variant (per-doc payload ~ unique shingles × 8 B
    through the shuffle); at 10^12 docs use the signature estimate and
    reserve exact verify for the candidate pairs only.
    """

    class SignatureAndShingles(MinHashSignature):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            sigs = np.empty((batch.num_rows, len(self.a)), dtype=np.uint64)
            shingles: list[np.ndarray] = []
            for i, v in enumerate(batch["text"]):
                sh = self.shingle_hashes(v.as_py())
                shingles.append(sh)
                with np.errstate(over="ignore"):
                    sigs[i] = (self.a[:, None] * sh[None, :] + self.b[:, None]).min(axis=1)
            out = batch.drop_columns(["text"])
            out = out.append_column(
                "minhash", pa.array(list(sigs.view(np.int64)), type=pa.list_(pa.int64(), len(self.a)))
            )
            return out.append_column(
                "shingles", pa.array([s.view(np.int64) for s in shingles], type=pa.list_(pa.int64()))
            )

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(SignatureAndShingles, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8))
    exploded = sigs.map_batches(_band_explode, batch_format="pyarrow").map_batches(
        _shard_band_key, batch_format="pyarrow"
    )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["band_key"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        sets = [np.asarray(s, dtype=np.int64) for s in g["shingles"]]

        def verify(i, j):
            # exact |A∩B| / |A∪B| per candidate pair (sets are sorted-unique)
            out = np.empty(len(i))
            for t, (a, b) in enumerate(zip(i, j)):
                inter = np.intersect1d(sets[a], sets[b], assume_unique=True).size
                out[t] = inter / (sets[a].size + sets[b].size - inter)
            return out

        ia, ib, jac = pairs_in_key_runs(keys, ids, verify)
        keep = jac >= threshold
        a = ids[ia[keep]]
        b = ids[ib[keep]]
        swap = a > b
        return pd.DataFrame(
            {
                "doc_a": np.where(swap, b, a),
                "doc_b": np.where(swap, a, b),
                "jaccard": np.round(jac[keep], 6),
            }
        )

    pairs = exploded.groupby(["band", "shard"]).map_groups(band_pairs, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("jaccard", alias_name="jaccard"))


# edit-distance (Levenshtein) verify of LSH candidates ----------------------

LEV_SIM_DEN = 5  # keep iff lev*5 <= maxlen  (normalized similarity >= 0.8)
LEV_EST_HALF = 2  # prefilter: signature agreement 2*eq >= n_sig (est >= 0.5)


def levenshtein_rows(a: str, b: str) -> int:
    """Exact Levenshtein distance via the two-row DP with the
    left-dependency resolved by a running-minimum transform — every
    row is pure NumPy (cur[j] = min(cur[j], min_{k<j} cur[k] + (j−k))
    computed as accumulate(cur − j) + j), no per-cell Python."""
    if a == b:
        return 0
    x = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    y = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(x) == 0 or len(y) == 0:
        return max(len(x), len(y))
    idx = np.arange(1, len(y) + 1, dtype=np.int64)
    prev = np.arange(len(y) + 1, dtype=np.int64)
    for i in range(1, len(x) + 1):
        sub = prev[:-1] + (y != x[i - 1])
        cur = np.minimum(prev[1:] + 1, sub)
        # resolve insertions (left dependency) exactly:
        cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
        prev = np.concatenate(([i], cur))
    return int(prev[-1])


def edit_distance_verify(sf_dir: str) -> rd.Dataset:
    """Record-linkage verify pass: LSH candidate pairs re-scored with
    EXACT Levenshtein distance — the character-level duplicate
    confirmation (OCR noise, near-identical boilerplate) that n-gram
    Jaccard's set view can miss or over-credit; Jaro-Winkler
    (fuzzy_name_match) covers short names, this covers documents.

    Shared integer contract with the golden oracle: candidates come
    from the SAME banded/sharded LSH exchange as minhash_near_dup,
    prefiltered by signature agreement (2·eq ≥ n_sig) and kept iff
    5·lev ≤ max(len_a, len_b) (= similarity ≥ 0.8, no float in the
    decision).  The engine's DP is row-vectorized NumPy (running-min
    transform); the oracle's is a k-banded Ukkonen scan — independent
    algorithms, identical integers.

    Scale shape: texts travel only INTO the (band, shard) verify task
    (like ngram_jaccard_near_dup's shingle sets); per-pair work is
    O(len²/SIMD); output pairs dedupe via one keyed Min.
    Output: (doc_a, doc_b, lev_dist, max_len, sim) rounded 6.
    """

    class SignatureAndTextCols(MinHashSignature):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            sigs = np.empty((batch.num_rows, len(self.a)), dtype=np.uint64)
            for i, v in enumerate(batch["text"]):
                sigs[i] = self.signature(v.as_py())
            return batch.append_column(
                "minhash", pa.array(list(sigs.view(np.int64)), type=pa.list_(pa.int64(), len(self.a)))
            )

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(SignatureAndTextCols, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8))
    exploded = sigs.map_batches(_band_explode, batch_format="pyarrow").map_batches(
        _shard_band_key, batch_format="pyarrow"
    )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["band_key"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        texts = list(g["text"])
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in g["minhash"]])
        n_sig = sig.shape[1]

        def verify(i, j):
            out = np.full(len(i), -1.0)
            for t, (a, b) in enumerate(zip(i, j)):
                eq = int((sig[a] == sig[b]).sum())
                if LEV_EST_HALF * eq < n_sig:  # signature-agreement prefilter
                    continue
                lev = levenshtein_rows(texts[a], texts[b])
                ml = max(len(texts[a]), len(texts[b]))
                out[t] = lev * 100000.0 + ml
            return out

        ia, ib, val = pairs_in_key_runs(keys, ids, verify)
        ok = val >= 0
        lev = (val[ok] // 100000.0).astype(np.int64)
        ml = (val[ok] % 100000.0).astype(np.int64)
        keep = lev * LEV_SIM_DEN <= ml
        a = ids[ia[ok][keep]]
        b = ids[ib[ok][keep]]
        swap = a > b
        sim = np.round(1.0 - lev[keep].astype(np.float64) / ml[keep], 6)
        return pd.DataFrame(
            {
                "doc_a": np.where(swap, b, a),
                "doc_b": np.where(swap, a, b),
                "lev_dist": lev[keep],
                "max_len": ml[keep],
                "sim": sim,
            }
        )

    pairs = exploded.groupby(["band", "shard"]).map_groups(band_pairs, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("lev_dist", alias_name="lev_dist"),
        Min("max_len", alias_name="max_len"),
        Min("sim", alias_name="sim"),
    )


# ---------------------------------------------------------------------------
# SimHash (documents)
# ---------------------------------------------------------------------------


class SimHash:
    """Actor-pool stage: 64-bit SimHash over word tokens (crc32-seeded)."""

    def __init__(self):
        import re

        self.word_re = re.compile(r"[\w']+", re.UNICODE)

    @staticmethod
    def _expand64(h32: np.ndarray) -> np.ndarray:
        """splitmix64-style expansion of 32-bit token hashes to 64 bits."""
        x = h32.astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return x

    def simhash(self, text: str) -> int:
        import zlib

        toks = self.word_re.findall(text.lower())
        if not toks:
            return 0
        h32 = np.array([zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64)
        h64 = self._expand64(h32)
        bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        v = np.uint64(0)
        for i in np.nonzero(acc > 0)[0]:
            v |= np.uint64(1) << np.uint64(i)
        return int(v.view(np.int64) if hasattr(v, "view") else v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.array([self.simhash(v.as_py()) for v in batch["text"]], dtype=np.uint64).view(np.int64)
        return batch.drop_columns(["text"]).append_column("simhash", pa.array(out, type=pa.int64()))


def simhash_pipeline(sf_dir: str) -> rd.Dataset:
    """Per-document 64-bit SimHash fingerprints."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(SimHash, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8))


# ---------------------------------------------------------------------------
# Hamming-LSH near-dup over 64-bit hashes (phash / simhash)
# ---------------------------------------------------------------------------


def hamming_band_explode(batch: pa.Table, hash_col: str, id_col: str, bands: int = 4) -> pa.Table:
    """Band a 64-bit hash into ``bands`` 16-bit keys (Hamming LSH):
    two hashes within Hamming distance < bands share >=1 exact band."""
    h = np.asarray(batch[hash_col].combine_chunks().to_numpy(zero_copy_only=False)).view(np.uint64)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    parts = []
    for band in range(bands):
        key = (h >> np.uint64(band * width)) & mask
        t = batch.select([id_col, hash_col])
        t = t.append_column("band", pa.array(np.full(batch.num_rows, band, dtype=np.int32)))
        t = t.append_column("band_key", pa.array(key.view(np.int64), type=pa.int64()))
        parts.append(t)
    return pa.concat_tables(parts)


def pairs_in_key_runs(
    keys: np.ndarray, ids: np.ndarray, verify, max_group: int = MAX_LSH_GROUP
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Candidate pairs among rows sharing a key, via ONE sort + run
    detection (replaces a groupby over millions of tiny buckets, whose
    per-group overhead dominates at scale).  ``verify(i, j) -> value``
    maps candidate index pairs to a verification metric; returns
    (id_a, id_b, value) arrays for verified pairs (caller filters).
    ``ids`` orders rows within a run, so output (and the skew cap) is
    deterministic across shuffles.

    Verification is sliced into ``PAIR_CHUNK``-pair blocks so a large
    bucket costs bounded MEMORY (quadratic WORK is inherent to emitting
    every pair); only runs beyond ``max_group`` rows — degenerate skew,
    e.g. one constant hash band across millions of images — are
    truncated, and that truncation is logged (SURVEY §4).
    """
    order = np.lexsort((ids, keys))
    sk = keys[order]
    boundaries = np.nonzero(np.diff(sk))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(sk)]])
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    truncated = 0
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        if n > max_group:
            truncated += 1
            e = s + max_group
            n = max_group
        run = order[s:e]
        ai, bi = np.triu_indices(n, k=1)
        for lo in range(0, len(ai), PAIR_CHUNK):
            sl = slice(lo, lo + PAIR_CHUNK)
            v = verify(run[ai[sl]], run[bi[sl]])
            out_a.append(run[ai[sl]])
            out_b.append(run[bi[sl]])
            out_v.append(np.asarray(v))
    if truncated:
        logger.warning(
            "pairs_in_key_runs: %d bucket(s) exceeded max_group=%d and were truncated — "
            "pairs beyond the cap are NOT emitted (skew guard, SURVEY §4)",
            truncated,
            max_group,
        )
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0)
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_v)


def hamming_pairs(sf_dir_or_ds, hash_col: str, id_col: str, max_dist: int = 3, bands: int = 4) -> rd.Dataset:
    """Near-dup pairs by banded Hamming LSH + exact popcount verify.

    RECALL CONTRACT: with ``bands`` equal-width bands, every pair within
    Hamming distance < bands shares at least one exact band and is
    guaranteed found; pairs at larger distances are found only when a
    band happens to match.  The default ``max_dist = bands - 1`` keeps
    the output's recall exact; raising it returns extra (non-exhaustive)
    more-distant pairs.

    Shuffle shape: (band, band_key %% shards) — rows sharing a key stay
    co-located, each task holds only one key-space shard of one band
    (bounded memory, parallelism = bands*shards), then a single sort +
    run scan per task finds same-key candidates — the per-bucket groupby
    alternative spends more time in per-group dispatch than in the
    comparisons.
    """
    from .. import codecs

    ds = sf_dir_or_ds

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["band_key"].to_numpy()
        ids = g[id_col].to_numpy()
        hs = g[hash_col].to_numpy().astype(np.int64)

        def verify(i, j):
            return codecs.hamming64(hs[i], hs[j])

        # ids may be strings (image_id): order by them for determinism
        ia, ib, d = pairs_in_key_runs(keys, ids, verify)
        keep = d <= max_dist
        a = ids[ia[keep]]
        b = ids[ib[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({id_col + "_a": a2, id_col + "_b": b2, "hamming": d[keep].astype(np.int64)})

    exploded = ds.map_batches(
        functools.partial(hamming_band_explode, hash_col=hash_col, id_col=id_col, bands=bands), batch_format="pyarrow"
    ).map_batches(_shard_band_key, batch_format="pyarrow")
    out = exploded.groupby(["band", "shard"]).map_groups(band_pairs, batch_format="pandas")
    return out.groupby([id_col + "_a", id_col + "_b"]).aggregate(Min("hamming", alias_name="hamming"))


DECON_NGRAM_N = 8  # contamination n-gram width (Dolma/GPT-3 discipline)


def ngram_decontaminate(sf_dir: str, frac: float = DECON_FRAC, n: int = DECON_NGRAM_N) -> rd.Dataset:
    """Substring-level benchmark contamination screen: flag every
    NON-benchmark document sharing at least one ``n``-token n-gram with
    the benchmark slice — the decontamination step real LLM corpora run
    (exact-hash ``decontaminate`` misses paraphrased inclusions; this
    catches any verbatim n-token span).

    The benchmark slice is the same deterministic LCG Bernoulli sample
    as :func:`decontaminate`; its DISTINCT n-grams are collected once
    (benchmark-sized, not corpus-sized), broadcast via ``ray.put``, and
    the corpus scan counts per-doc distinct overlapping n-grams
    map-side — the broadcast anti-join pattern, no shuffle.  At real
    scale the broadcast set holds 64-bit n-gram hashes (+ a Bloom front)
    rather than strings; the fixture corpus ships strings so the SQL
    mirror is direct.

    Output: (doc_id, n_hits) for contaminated docs only, sorted.
    """
    import ray

    from .trajectory import sample_u

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def doc_ngrams(text: str) -> set:
        toks = text.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    def bench_ngrams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(sample_u(ids) < frac))
        out: set = set()
        for s in t["text"].to_pylist():
            out |= doc_ngrams(s)
        return pa.table({"ng": pa.array(sorted(out), type=pa.string())})

    blocked = set(docs.map_batches(bench_ngrams, batch_format="pyarrow").unique("ng"))
    ref = ray.put(blocked)

    def scan(t: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        ids = t["doc_id"].to_numpy()
        keep = sample_u(ids) >= frac  # benchmark docs are not re-flagged
        ids = ids[keep]
        texts = [s for s, k in zip(t["text"].to_pylist(), keep) if k]
        hit_ids, hits = [], []
        for did, s in zip(ids, texts):
            c = len(doc_ngrams(s) & bl)
            if c:
                hit_ids.append(int(did))
                hits.append(c)
        return pa.table(
            {
                "doc_id": pa.array(hit_ids, type=pa.int64()),
                "n_hits": pa.array(hits, type=pa.int64()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow").sort("doc_id")


SNAP_DEL_MOD = 17  # snapshot B deletes doc_id % 17 == 0
SNAP_EDIT_MOD = 13  # snapshot B rewrites doc_id % 13 == 0


def snapshot_diff(sf_dir: str) -> rd.Dataset:
    """Dataset-version diff: classify every doc across two corpus
    snapshots as removed / changed / unchanged by CONTENT hash — the
    audit step between training-data releases ('what moved since v1?').
    Snapshot A is the corpus; snapshot B is its deterministic next
    release (docs deleted where id % 17 == 0, texts rewritten where
    id % 13 == 0) so both engines derive identical versions.

    Scale shape: each side collapses to (doc_id, md5) map-side
    (hash-sized rows, text never shuffles); ONE full-outer hash join on
    doc_id; classification is a vectorized null/equality check; the
    status rollup is a 3-row groupby.  Output: (status, n_docs).
    """
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def hash_a(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "h_a": pa.array(h, type=pa.string())})

    def hash_b(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = ids % SNAP_DEL_MOD != 0
        ids = ids[keep]
        texts = [s for s, k in zip(t["text"].to_pylist(), keep) if k]
        texts = [s + " v2" if i % SNAP_EDIT_MOD == 0 else s for i, s in zip(ids, texts)]
        h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "h_b": pa.array(h, type=pa.string())})

    a = docs.map_batches(hash_a, batch_format="pyarrow")
    b = docs.map_batches(hash_b, batch_format="pyarrow")
    j = safe_join(a, b, join_type="full_outer", num_partitions=4, on=("doc_id",))

    def classify(t: pa.Table) -> pa.Table:
        ha = t["h_a"].to_numpy(zero_copy_only=False)
        hb = t["h_b"].to_numpy(zero_copy_only=False)
        status = np.where(
            pd.isna(hb), "removed", np.where(pd.isna(ha), "added", np.where(ha == hb, "unchanged", "changed"))
        )
        return pa.table({"status": pa.array(status, type=pa.string())})

    return (
        j.map_batches(classify, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Count(alias_name="n_docs"))
        .sort("status")
    )


SPLIT_OF_HEX = {**{c: "train" for c in "0123456789ab"}, "c": "val", "d": "val", "e": "test", "f": "test"}


def hash_split_counts(sf_dir: str) -> rd.Dataset:
    """Split-integrity audit: assign every document to train/val/test
    by the first hex digit of md5(doc_id) (12/2/2 of 16 — the standard
    content-stable hash split that survives re-shards and appends) and
    report counts per (split, lang) — the class-balance-per-split check
    run before training.

    Scale shape: the split is a pure map (no state, no shuffle); ONE
    (split, lang)-bounded count groupby.  Output: (split, lang, n_docs).
    """
    docs = _read_docs(sf_dir, ["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        split = [SPLIT_OF_HEX[hashlib.md5(str(int(i)).encode()).hexdigest()[0]] for i in ids]
        return pa.table({"split": pa.array(split, type=pa.string()), "lang": t["lang"]})

    return (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby(["split", "lang"])
        .aggregate(Count(alias_name="n_docs"))
        .sort(["split", "lang"])
    )


def minhash_accuracy_eval(sf_dir: str, sim_threshold: float = 0.8) -> rd.Dataset:
    """MinHash quality harness: for every pair the LSH near-dup
    pipeline reports, compare its signature-agreement ESTIMATE against
    the EXACT shingle Jaccard — the measured-accuracy gate that turns
    the sketch's error bound into a checked number (ann_recall_eval's
    sibling for the text dedup path).

    Scale shape: the reported pair set is bounded (near-dups), so the
    involved-doc id list broadcasts; one corpus scan extracts shingle-
    hash sets for ONLY those docs (searchsorted membership, map-side);
    the exact Jaccards are computed on the pair-bounded result.
    Output: (doc_a, doc_b, est_jaccard, exact_jaccard, abs_err).
    """
    import ray

    from ..stages.common import duckdb_round

    pairs = minhash_near_dup(sf_dir, sim_threshold).to_pandas()  # pair-bounded
    if len(pairs) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64()),
                "exact_jaccard": pa.array([], type=pa.float64()),
                "abs_err": pa.array([], type=pa.float64()),
            }
        )
    involved = np.array(sorted(set(pairs["doc_a"]) | set(pairs["doc_b"])), dtype=np.int64)
    iref = ray.put(involved)

    def extract(t: pa.Table) -> pa.Table:
        inv = ray.get(iref)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(inv, ids), len(inv) - 1)
        keep = inv[pos] == ids
        kernel = MinHashSignature()
        S = kernel.shingle
        kept_ids = ids[keep]
        texts = [s for s, k in zip(t["text"].to_pylist(), keep) if k]
        if not texts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "hashes": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        # one flattened pass over ALL kept docs: hash every S-byte window
        # of the concatenated buffer, drop windows spanning a doc
        # boundary, then segment-unique per doc — identical values to
        # the per-doc shingle_hashes() (same pad byte, same uint64
        # Horner weights, same uint64 sort order before the int64 view)
        enc = [s.encode("utf-8") for s in texts]
        enc = [e if len(e) >= S else e + b" " * (S - len(e)) for e in enc]
        lens = np.array([len(e) for e in enc], dtype=np.int64)
        buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(buf, S)
        with np.errstate(over="ignore"):
            h = (win * kernel.pw[None, :]).sum(axis=1, dtype=np.uint64)
        doc_of = np.repeat(np.arange(len(enc), dtype=np.int64), lens)
        starts = np.arange(len(h))
        valid = doc_of[starts] == doc_of[starts + S - 1]
        d, hv = doc_of[starts][valid], h[valid]
        order = np.lexsort((hv, d))
        d, hv = d[order], hv[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (hv[1:] != hv[:-1])
        d, hv = d[first], hv[first]
        # every padded doc yields >= 1 valid window, so counts cover all
        counts = np.bincount(d, minlength=len(enc))
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        hashes = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(hv.view(np.int64), type=pa.int64()),
        )
        return pa.table(
            {
                "doc_id": pa.array(kept_ids, type=pa.int64()),
                "hashes": hashes,
            }
        )

    sh = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(extract, batch_format="pyarrow").to_pandas()
    sets = {int(r.doc_id): set(r.hashes) for r in sh.itertuples()}
    a = pairs["doc_a"].to_numpy().astype(np.int64)
    b = pairs["doc_b"].to_numpy().astype(np.int64)
    est = pairs["est_jaccard"].to_numpy().astype(np.float64)
    exact = np.array(
        [len(sets[int(x)] & sets[int(y)]) / np.float64(len(sets[int(x)] | sets[int(y)])) for x, y in zip(a, b)]
    )
    exact = duckdb_round(exact, 6)
    err = duckdb_round(np.abs(est - exact), 6)
    order = np.lexsort((b, a))
    return pa.table(
        {
            "doc_a": pa.array(a[order], type=pa.int64()),
            "doc_b": pa.array(b[order], type=pa.int64()),
            "est_jaccard": pa.array(est[order], type=pa.float64()),
            "exact_jaccard": pa.array(exact[order], type=pa.float64()),
            "abs_err": pa.array(err[order], type=pa.float64()),
        }
    )


def dedup_survivorship(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Dedup SURVIVORSHIP over exact-content clusters: for every
    md5(text) cluster, keep the canonical copy — the LONGEST document
    (by n_chars), ties broken by smallest doc_id — and report cluster
    size.  The policy step after text_md5_dedup: a training-set build
    must decide WHICH copy's metadata/lineage survives, not only count
    copies (the text twin of images.image_dedup_survivor).

    Scale shape: md5 computed map-side (text never shuffles — only the
    32-hex key + n_chars + doc_id move); per-batch <=1-candidate-per-
    key argmax combiner; ONE key-coarsened exchange (md5 bucket %
    parts) closed by a per-slice run-scan.

    Output: (text_md5, n_copies, survivor_doc_id, survivor_n_chars).
    """
    ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])

    def combiner(t: pa.Table) -> pa.Table:
        h = np.asarray([hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()])
        did = t["doc_id"].to_numpy().astype(np.int64)
        nch = t["n_chars"].to_numpy().astype(np.int64)
        order = np.lexsort((did, -nch, h))
        h, did, nch = h[order], did[order], nch[order]
        starts = np.concatenate([[0], np.nonzero(h[1:] != h[:-1])[0] + 1])
        runlen = np.diff(np.append(starts, len(h)))
        bucket = np.asarray([int(x[:8], 16) for x in h[starts]], dtype=np.int64)
        return pa.table(
            {
                "text_md5": pa.array(h[starts], type=pa.string()),
                "doc_id": pa.array(did[starts], type=pa.int64()),
                "n_chars": pa.array(nch[starts], type=pa.int64()),
                "n": pa.array(runlen.astype(np.int64), type=pa.int64()),
                "part": pa.array(bucket % parts, type=pa.int64()),
            }
        )

    def regroup(g: pa.Table) -> pa.Table:
        h = np.asarray(g["text_md5"].to_pylist())
        did = g["doc_id"].to_numpy().astype(np.int64)
        nch = g["n_chars"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        order = np.lexsort((did, -nch, h))
        h, did, nch, n = h[order], did[order], nch[order], n[order]
        starts = np.concatenate([[0], np.nonzero(h[1:] != h[:-1])[0] + 1])
        total = np.add.reduceat(n, starts)
        return pa.table(
            {
                "text_md5": pa.array(h[starts], type=pa.string()),
                "n_copies": pa.array(total.astype(np.int64), type=pa.int64()),
                "survivor_doc_id": pa.array(did[starts], type=pa.int64()),
                "survivor_n_chars": pa.array(nch[starts], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .groupby("part")
        .map_groups(regroup, batch_format="pyarrow")
    )


BLOCKING_SAMPLE_MOD = 2  # minimum mod (deterministic eval sample: doc_id % MOD == 0)
BLOCKING_SAMPLE_TARGET = 250  # target sample SIZE; mod scales with corpus size


def resolve_blocking_mod(sf_dir: str) -> int:
    """Sample modulus targeting ~``BLOCKING_SAMPLE_TARGET`` docs
    regardless of corpus size (parquet-footer count only — no data
    read).  ``doc_id % mod == 0`` with a FIXED mod would select a
    constant fraction, making the driver-side O(n²) exact-Jaccard truth
    pass grow quadratically with the corpus; scaling the mod keeps the
    eval bounded at any scale."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    n = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in sorted(_glob.glob(_os.path.join(sf_dir, "documents*.parquet")))
        or [_os.path.join(sf_dir, "documents.parquet")]
    )
    return max(BLOCKING_SAMPLE_MOD, -(-n // BLOCKING_SAMPLE_TARGET))


def lsh_blocking_eval(sf_dir: str, sim_threshold: float = 0.8, sample_mod: int | None = None) -> rd.Dataset:
    """BLOCKING-quality evaluation of the banded-LSH candidate
    generator (record-linkage metrics): on a deterministic doc sample,
    compare the blocking's candidate pairs against exact-Jaccard truth
    and report PAIRS COMPLETENESS (recall of true pairs) and REDUCTION
    RATIO (fraction of the quadratic pair space pruned) — the two
    numbers that justify a blocking scheme (Christen 2012).  Closes the
    eval-harness quartet: ann recall, pixel verify, sketch error, and
    now blocking recall.

    Scale discipline: the evaluation runs on a ~FIXED-SIZE sample —
    ``doc_id % mod == 0`` with the mod SCALED to the corpus size
    (:func:`resolve_blocking_mod`, targeting ~250 docs) — so the
    driver-side exact-Jaccard truth pass and the ``to_pandas`` stay
    bounded at any corpus size; the corpus-wide blocking quality is
    estimated by the sample, exactly how production linkage pipelines
    audit blocking.

    Output: one row (n_sample_docs, n_sample_pairs, n_true_pairs,
    n_candidate_pairs, n_caught, completeness, reduction_ratio).
    """
    from ..stages.common import duckdb_round

    if sample_mod is None:
        sample_mod = resolve_blocking_mod(sf_dir)

    def sample_filter(t: pa.Table) -> pa.Table:
        m = (t["doc_id"].to_numpy() % sample_mod) == 0
        return t.filter(pa.array(m))

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(sample_filter, batch_format="pyarrow")
    sigs = ds.map_batches(MinHashSignature, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))
    exploded = sigs.map_batches(_band_explode, batch_format="pyarrow")

    # blocking candidates: distinct pairs sharing >= 1 (band, key) bucket
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy().astype(np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = (
        exploded.groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # sample-bounded
    )
    cand_set = set(zip(cand["doc_a"].astype(int), cand["doc_b"].astype(int))) if len(cand) else set()

    # exact truth on the sample: shingle sets are sample-bounded
    kernel = MinHashSignature()
    docs = (
        ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    shs = [set(kernel.shingle_hashes(t).tolist()) for t in docs["text"]]
    n = len(ids)
    true_pairs = set()
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(shs[i] & shs[j])
            if inter == 0:
                continue
            jac = inter / (len(shs[i]) + len(shs[j]) - inter)
            if jac >= sim_threshold:
                true_pairs.add((int(ids[i]), int(ids[j])))
    n_pairs = n * (n - 1) // 2
    caught = len(true_pairs & cand_set)
    comp = caught / len(true_pairs) if true_pairs else 1.0
    red = 1.0 - (len(cand_set) / n_pairs if n_pairs else 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "n_sample_docs": pa.array([n], type=pa.int64()),
                "n_sample_pairs": pa.array([n_pairs], type=pa.int64()),
                "n_true_pairs": pa.array([len(true_pairs)], type=pa.int64()),
                "n_candidate_pairs": pa.array([len(cand_set)], type=pa.int64()),
                "n_caught": pa.array([caught], type=pa.int64()),
                "completeness": pa.array([float(duckdb_round(np.array([comp]), 6)[0])], type=pa.float64()),
                "reduction_ratio": pa.array([float(duckdb_round(np.array([red]), 6)[0])], type=pa.float64()),
            }
        )
    )


def dedup_manifest(sf_dir: str, sim_threshold: float = 0.8, num_partitions: int = 8) -> rd.Dataset:
    """The curation CAPSTONE: one keep/drop manifest per document from
    ALL dedup evidence combined — exact content clusters (md5) and
    MinHash+LSH near-dup pairs union into one edge set, connected
    components merge transitive duplicates ACROSS detectors (doc A
    exact-dups B, B near-dups C -> one cluster), and the canonical
    survivor (minimum doc_id) is kept.  This is the table a training
    run actually consumes: every upstream detector feeds it.

    Scale shape: md5 star-edges map-side (each doc pairs with its
    group's min — groupby(md5).Min + one hash join back, no pairwise
    blowup), LSH pairs from the sharded band run-scan, ONE component
    propagation (size-adaptive union-find / min-label rounds), one
    left join to mark singletons.

    Output: (doc_id, cluster_id, keep).
    """
    from .cluster import connected_components

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def add_md5(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "text_md5": pa.array(h, type=pa.string())})

    hashed = docs.map_batches(add_md5, batch_format="pyarrow").materialize()
    firsts = hashed.groupby("text_md5").aggregate(Min("doc_id", alias_name="first_doc"))
    star = safe_join(hashed, firsts, join_type="inner", num_partitions=num_partitions, on=("text_md5",))

    def star_edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy().astype(np.int64)
        f = t["first_doc"].to_numpy().astype(np.int64)
        m = d != f
        return pa.table(
            {
                "doc_a": pa.array(f[m], type=pa.int64()),
                "doc_b": pa.array(d[m], type=pa.int64()),
            }
        )

    exact_edges = star.map_batches(star_edges, batch_format="pyarrow")

    def near_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": pa.array(t["doc_a"].to_numpy().astype(np.int64), type=pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    near = minhash_near_dup(sf_dir, sim_threshold=sim_threshold).map_batches(
        near_edges, batch_format="pyarrow"
    )
    labels = connected_components(
        exact_edges.union(near), a_col="doc_a", b_col="doc_b", num_partitions=num_partitions
    )

    assembled = safe_join(hashed.select_columns(["doc_id"]), 
        labels, join_type="left_outer", num_partitions=num_partitions, on=("doc_id",), right_on=("node",)
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy().astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.float64)
        cluster = np.where(np.isnan(lab), d, np.nan_to_num(lab)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d, type=pa.int64()),
                "cluster_id": pa.array(cluster, type=pa.int64()),
                "keep": pa.array(d == cluster, type=pa.bool_()),
            }
        )

    return assembled.map_batches(finish, batch_format="pyarrow")


def incremental_md5_dedup(sf_dir: str) -> rd.Dataset:
    """INCREMENTAL exact-dedup manifest merge — the daily-crawl shape:
    the corpus arrives as an OLD shard (doc_id < split) whose manifest
    already exists and a NEW increment; instead of recomputing over the
    union, each shard builds its own (text_md5, first_doc_id, n_copies)
    manifest and the two manifests merge with one hash-keyed aggregate
    (Min folds first-wins, Sum folds counts).  The result must be
    IDENTICAL to the batch recompute (text_md5_dedup's oracle verifies
    exactly that), which is the invariant that makes manifest-merge a
    safe substitute for full reprocessing at 100 TB.

    Scale shape: per-shard manifests shuffle hash-keyed rows once each
    (bounded by distinct content); the merge aggregate moves manifest
    rows, never documents — an increment costs O(increment + manifest),
    not O(corpus).  Split = half the id space (deterministic; stands in
    for yesterday/today).
    """
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    split = (int(ds.max("doc_id")) + 1) // 2

    def shard_manifest(part: rd.Dataset) -> rd.Dataset:
        def add_md5(t: pa.Table) -> pa.Table:
            h = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
            return t.drop_columns(["text"]).append_column("text_md5", pa.array(h, type=pa.string()))

        return (
            part.map_batches(add_md5, batch_format="pyarrow")
            .groupby("text_md5")
            .aggregate(Min("doc_id", alias_name="first_doc_id"), Count(alias_name="n_copies"))
        )

    old = shard_manifest(ds.filter(expr=f"doc_id < {split}"))
    new = shard_manifest(ds.filter(expr=f"doc_id >= {split}"))
    return (
        old.union(new)
        .groupby("text_md5")
        .aggregate(Min("first_doc_id", alias_name="first_doc_id"), Sum("n_copies", alias_name="n_copies"))
    )


CDC_WINDOW = 16  # rolling-hash window bytes
CDC_MASK_BITS = 6  # boundary when (h & mask) == 0 -> ~64-byte avg chunks
CDC_P = np.uint64(1099511628211)  # FNV-ish odd multiplier (mod 2^64 ring)


def _cdc_boundaries(b: np.ndarray) -> np.ndarray:
    """Content-defined boundary positions for one byte array: a
    polynomial rolling hash over CDC_WINDOW bytes in the mod-2^64 ring
    (numpy uint64 wraparound IS the modulus), boundary wherever the low
    CDC_MASK_BITS bits are zero.  Pure vectorized (sliding windows ×
    precomputed power vector); no min/max clamp at fixture scale —
    production FastCDC adds normalized chunking on the same hash."""
    if len(b) < CDC_WINDOW:
        return np.array([], dtype=np.int64)
    pw = np.empty(CDC_WINDOW, dtype=np.uint64)
    pw[-1] = np.uint64(1)
    for j in range(CDC_WINDOW - 2, -1, -1):
        pw[j] = pw[j + 1] * CDC_P
    win = np.lib.stride_tricks.sliding_window_view(b.astype(np.uint64), CDC_WINDOW)
    h = (win * pw[None, :]).sum(axis=1, dtype=np.uint64)
    mask = np.uint64((1 << CDC_MASK_BITS) - 1)
    # boundary AFTER the window end: cut points in (0, len)
    pos = np.nonzero((h & mask) == np.uint64(0))[0] + CDC_WINDOW
    return pos[pos < len(b)].astype(np.int64)


def cdc_chunk_dedup(sf_dir: str) -> rd.Dataset:
    """Storage-level dedup view: split every document at CONTENT-DEFINED
    boundaries (rolling hash, so an insertion only reshapes chunks near
    the edit — the property fixed-size blocks lack) and report chunks
    appearing more than once across the corpus.  This is the
    backup/blob-store dedup primitive beside the shingle (similarity)
    view: shared chunks = byte ranges a chunk store would store once.

    Scale shape: chunking + chunk-hashing is map-only (text consumed
    in-stage); ONE (chunk_hash, doc_id)-keyed groupby collapses
    within-doc repeats, then ONE chunk_hash groupby folds occurrence /
    doc / byte counts — both exchanges carry 48-byte metadata rows
    bounded by chunk count, never text.  Output: (chunk_hash,
    n_occurrences, n_docs, chunk_bytes) for chunks with n_occurrences
    > 1, sorted.
    """
    from ray.data.aggregate import Max, Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        out_h, out_d, out_b = [], [], []
        ids = t["doc_id"].to_numpy()
        for did, s in zip(ids, t["text"].to_pylist()):
            raw = s.encode("utf-8")
            b = np.frombuffer(raw, dtype=np.uint8)
            cuts = _cdc_boundaries(b)
            starts = np.concatenate([[0], cuts])
            ends = np.concatenate([cuts, [len(raw)]])
            for st, en in zip(starts, ends):
                out_h.append(hashlib.md5(raw[st:en]).hexdigest())
                out_d.append(int(did))
                out_b.append(int(en - st))
        return pa.table(
            {
                "chunk_hash": pa.array(out_h, type=pa.string()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "chunk_bytes": pa.array(out_b, type=pa.int64()),
            }
        )

    per_doc = (
        ds.map_batches(chunk, batch_format="pyarrow")
        .groupby(["chunk_hash", "doc_id"])
        .aggregate(Count(alias_name="n"), Max("chunk_bytes", alias_name="chunk_bytes"))
    )
    agg = (
        per_doc.groupby("chunk_hash")
        .aggregate(
            Sum("n", alias_name="n_occurrences"),
            Count(alias_name="n_docs"),
            Max("chunk_bytes", alias_name="chunk_bytes"),
        )
    )
    return agg.filter(expr="n_occurrences > 1").sort("chunk_hash")


def cdc_savings(sf_dir: str) -> rd.Dataset:
    """One-row storage-savings summary of the CDC view: how many bytes
    a content-addressed chunk store would hold vs the raw corpus — the
    number a storage-dedup report leads with.

    Scale shape: the same map-only chunk stream as cdc_chunk_dedup;
    totals fold map-side (2 ints/batch); uniques need ONE chunk_hash
    groupby (metadata rows) followed by a 2-int fold.  Output:
    (n_chunks, n_unique_chunks, total_bytes, unique_bytes,
    dedup_ratio round 6).
    """
    from ray.data.aggregate import Max, Sum

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        out_h, out_b = [], []
        for s in t["text"].to_pylist():
            raw = s.encode("utf-8")
            b = np.frombuffer(raw, dtype=np.uint8)
            cuts = _cdc_boundaries(b)
            starts = np.concatenate([[0], cuts])
            ends = np.concatenate([cuts, [len(raw)]])
            for st, en in zip(starts, ends):
                out_h.append(hashlib.md5(raw[st:en]).hexdigest())
                out_b.append(int(en - st))
        return pa.table(
            {
                "chunk_hash": pa.array(out_h, type=pa.string()),
                "chunk_bytes": pa.array(out_b, type=pa.int64()),
            }
        )

    chunks = ds.map_batches(chunk, batch_format="pyarrow")

    def totals(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "b": pa.array([int(np.sum(t["chunk_bytes"].to_numpy()))], type=pa.int64()),
            }
        )

    tot = chunks.map_batches(totals, batch_format="pyarrow").sum(["n", "b"])
    uni = (
        chunks.groupby("chunk_hash")
        .aggregate(Max("chunk_bytes", alias_name="chunk_bytes"))
        .map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array([t.num_rows], type=pa.int64()),
                    "b": pa.array([int(np.sum(t["chunk_bytes"].to_numpy()))], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sum(["n", "b"])
    )
    total_b, uniq_b = int(tot["sum(b)"]), int(uni["sum(b)"])
    return rd.from_arrow(
        pa.table(
            {
                "n_chunks": pa.array([int(tot["sum(n)"])], type=pa.int64()),
                "n_unique_chunks": pa.array([int(uni["sum(n)"])], type=pa.int64()),
                "total_bytes": pa.array([total_b], type=pa.int64()),
                "unique_bytes": pa.array([uniq_b], type=pa.int64()),
                "dedup_ratio": pa.array([round(total_b / uniq_b, 6)], type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# PPJoin-style COMPLETE exact set-similarity self-join (documents)
# ---------------------------------------------------------------------------

SETSIM_WORDS = 3  # word 3-gram shingles (SQL mirror: list comprehension)
SETSIM_THRESHOLD = 0.6
SETSIM_SHARDS = 32


def _shingle_key64(shingles: list[str]) -> np.ndarray:
    """Stable 64-bit shuffle key per shingle string (md5 prefix).

    Collisions only MERGE runs in the pair scan (extra candidates,
    verified exactly) — they can never lose a pair, so the key needs
    stability, not injectivity."""
    out = np.empty(len(shingles), dtype=np.int64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big", signed=True)
    return out


def set_similarity_join(sf_dir: str, threshold: float = SETSIM_THRESHOLD) -> rd.Dataset:
    """COMPLETE exact Jaccard self-join over word-3-gram shingle sets
    (AllPairs/PPJoin prefix filtering — Bayardo et al., WWW'07;
    Xiao et al., WWW'08).

    Unlike :func:`minhash_near_dup` / :func:`ngram_jaccard_near_dup`
    (banded LSH — probabilistic recall), this path is *guaranteed
    complete*: under one global shingle order, any pair with
    ``J(A,B) >= t`` must collide on at least one of the first
    ``|A| - ceil(t*|A|) + 1`` shingles of each side, so exploding only
    those prefix shingles generates every qualifying pair.  Ordering
    rare-shingles-first (ascending document frequency) makes prefix
    collisions — and therefore candidates — as infrequent as the data
    allows.

    Scale shape: the document-frequency table is bounded by the shingle
    vocabulary, not the corpus (and only the *frequent* head of the
    order matters for pruning — at web scale broadcast the top-K df
    entries and order the long tail lexicographically); candidates
    shuffle on (shingle-hash % shards) exactly like the LSH band paths;
    verification is exact set intersection inside the run scan.

    Reference analogue: D4's near-dup family (Queries.scala:297,330) —
    this is the exact-complete member of that family.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def doc_shingles(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        out_id: list[int] = []
        out_sh: list[list[str]] = []
        for i, v in enumerate(t["text"]):
            w = v.as_py().lower().split(" ")
            if len(w) < SETSIM_WORDS:
                continue
            sh = sorted({" ".join(w[j : j + SETSIM_WORDS]) for j in range(len(w) - SETSIM_WORDS + 1)})
            out_id.append(int(ids[i]))
            out_sh.append(sh)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "shingles": pa.array(out_sh, type=pa.list_(pa.string())),
            }
        )

    docs = ds.map_batches(doc_shingles, batch_format="pyarrow")

    # global order: ascending document frequency, shingle string as the
    # tiebreak.  df table is vocabulary-bounded (NOT corpus-bounded) —
    # collected once and ray.put-broadcast like the POI registry.
    def explode_shingles(t: pa.Table) -> pa.Table:
        flat: list[str] = []
        for row in t["shingles"]:
            flat.extend(row.as_py())
        return pa.table({"shingle": pa.array(flat, type=pa.string())})

    import ray

    df_tbl = (
        docs.map_batches(explode_shingles, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Count(alias_name="df"))
        .to_pandas()
    )
    rank = {s: r for r, (_, s) in enumerate(sorted(zip(df_tbl["df"], df_tbl["shingle"])))}
    rank_ref = ray.put(rank)

    def prefix_explode(t: pa.Table) -> pa.Table:
        rk = ray.get(rank_ref)
        keys: list[str] = []
        ids: list[int] = []
        sets: list[list[str]] = []
        did = t["doc_id"].to_numpy()
        for i, row in enumerate(t["shingles"]):
            sh = row.as_py()
            n = len(sh)
            sh.sort(key=lambda s: (rk.get(s, len(rk)), s))
            # prefix length n - ceil(t*n) + 1; the 1e-9 guard keeps a
            # float ulp above an integral t*n from inflating the ceil
            # (a too-short prefix breaks completeness; one extra
            # prefix shingle only costs candidates)
            p = n - int(np.ceil(threshold * n - 1e-9)) + 1
            for s in sh[:p]:
                keys.append(s)
                ids.append(int(did[i]))
                sets.append(sh)
        return pa.table(
            {
                "key": pa.array(_shingle_key64(keys), type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.array(sets, type=pa.list_(pa.string())),
            }
        )

    exploded = docs.map_batches(prefix_explode, batch_format="pyarrow").map_batches(
        lambda t: t.append_column(
            "shard", pa.array((t["key"].to_numpy().view(np.uint64) % np.uint64(SETSIM_SHARDS)).astype(np.int64), type=pa.int64())
        ),
        batch_format="pyarrow",
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["key"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        sets = [np.asarray(s, dtype=object) for s in g["shingles"]]

        def verify(i, j):
            out = np.empty(len(i))
            for t_, (a, b) in enumerate(zip(i, j)):
                sa, sb = sets[a], sets[b]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                out[t_] = inter / (sa.size + sb.size - inter)
            return out

        ia, ib, jac = pairs_in_key_runs(keys, ids, verify)
        keep = (jac >= threshold) & (ids[ia] != ids[ib])
        a, b = ids[ia[keep]], ids[ib[keep]]
        swap = a > b
        return pd.DataFrame(
            {
                "doc_a": np.where(swap, b, a),
                "doc_b": np.where(swap, a, b),
                "jaccard": np.round(jac[keep], 6),
            }
        )

    pairs = exploded.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
    # a pair can collide on several prefix shingles -> one row per pair
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("jaccard", alias_name="jaccard"))


# ---------------------------------------------------------------------------
# Blocked fuzzy entity matching (Jaro-Winkler over catalog names)
# ---------------------------------------------------------------------------

JW_THRESHOLD = 0.9
JW_PREFIX_WEIGHT = 0.1  # Winkler boost (standard p = 0.1, applied when jaro > 0.7)
JW_BOOST_FLOOR = 0.7
JW_MAX_BLOCK = 4096  # skew cap per blocking key (truncation is logged)


def _jaro(s1: str, s2: str) -> float:
    """Textbook Jaro similarity; bit-identical to DuckDB's
    ``jaro_similarity`` (verified over the part-name corpus)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - md), min(i + md + 1, l2)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    k = 0
    trans = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                trans += 1
            k += 1
    trans //= 2
    return (matches / l1 + matches / l2 + (matches - trans) / matches) / 3


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler with the standard prefix boost (p=0.1 over the first
    <=4 common chars when jaro > 0.7) — DuckDB-identical."""
    j = _jaro(s1, s2)
    if j > JW_BOOST_FLOOR:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j = j + l * JW_PREFIX_WEIGHT * (1.0 - j)
    return j


def fuzzy_name_match(sf_dir: str, threshold: float = JW_THRESHOLD) -> rd.Dataset:
    """Blocked fuzzy entity matching: part-name pairs with
    Jaro-Winkler similarity >= ``threshold`` inside ``p_brand`` blocks —
    the record-linkage shape (blocking key + pairwise string scorer)
    catalog/metadata dedup runs before training-data joins.

    Shape: ONE brand-keyed groupby (the blocking exchange); inside a
    block the scorer is a per-pair char loop — ALU-bound work that
    stays inside the batch fn, like the tokenizer loops (SURVEY §4).
    Blocks are catalog-bounded (#parts / #brands); degenerate blocks
    beyond ``JW_MAX_BLOCK`` rows are truncated and logged — at web
    scale refine the blocking key first (sorted-neighborhood windows or
    name-prefix sub-blocks), exactly like the LSH band-shard refinement.

    The scorer is bit-identical to DuckDB's
    ``jaro_winkler_similarity`` (tests pin 200+ corpus pairs), so the
    oracle is pure SQL — no golden file.
    """
    ds = rd.read_parquet(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name", "p_brand"])

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("p_partkey")
        if len(g) > JW_MAX_BLOCK:
            logger.warning("fuzzy_name_match: block of %d truncated to %d", len(g), JW_MAX_BLOCK)
            g = g.iloc[:JW_MAX_BLOCK]
        keys = g["p_partkey"].to_numpy()
        names = g["p_name"].to_list()
        brand = g["p_brand"].iloc[0]
        pa_, pb_, sim_ = [], [], []
        for i in range(len(keys)):
            ni = names[i]
            for j in range(i + 1, len(keys)):
                s = jaro_winkler(ni, names[j])
                if s >= threshold:
                    pa_.append(keys[i])
                    pb_.append(keys[j])
                    sim_.append(round(s, 6))
        return pd.DataFrame(
            {
                "p_brand": np.repeat(brand, len(pa_)),
                "part_a": np.asarray(pa_, dtype=np.int64),
                "part_b": np.asarray(pb_, dtype=np.int64),
                "sim": np.asarray(sim_, dtype=np.float64),
            }
        )

    return ds.groupby("p_brand").map_groups(block_pairs, batch_format="pandas")
