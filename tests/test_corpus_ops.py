"""Corpus-composition operators: domain mixing, shard balancing,
substring-level duplication, SemDeDup (round-3 additions)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from plasmap_ray import golden
from plasmap_ray.pipelines import ann, text

SF0001 = "/root/testdata/sf0.001"


def test_domain_mixture_weights_invariants(ray_session):
    df = text.domain_mixture_weights(SF0001).to_pandas().sort_values("n_tokens")
    # probabilities: both share and weight sum to 1 (round-6 slack)
    assert abs(df["token_share"].sum() - 1.0) < 1e-4
    assert abs(df["weight"].sum() - 1.0) < 1e-4
    # alpha=0.5 flattens: the lowest-resource lang is upsampled, the
    # highest-resource downsampled, and upsample decreases with size
    ups = df["upsample"].to_numpy()
    assert ups[0] > 1.0 > ups[-1]
    assert (np.diff(ups) <= 1e-9).all()


def test_domain_kl_matrix_bounds(ray_session):
    df = text.domain_kl_matrix(SF0001).to_pandas()
    langs = {"en", "de", "fr", "es", "zh"}
    assert len(df) == 10  # all C(5,2) pairs share tokens in this corpus
    assert (df["lang_a"] < df["lang_b"]).all()
    assert set(df["lang_a"]) | set(df["lang_b"]) == langs
    # JS divergence is bounded: 0 <= js <= ln 2
    assert (df["js_divergence"] >= 0).all()
    assert (df["js_divergence"] <= np.log(2.0) + 1e-9).all()


def test_domain_kl_matrix_identical_distributions_zero(ray_session, tmp_path):
    # two langs with the SAME texts -> unigram distributions equal -> js == 0
    texts = ["alpha beta gamma", "beta beta delta", "gamma alpha"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array(texts + texts, type=pa.string()),
            "lang": pa.array(["aa"] * 3 + ["bb"] * 3, type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    df = text.domain_kl_matrix(str(tmp_path)).to_pandas()
    assert len(df) == 1
    assert df["js_divergence"].iloc[0] == 0.0


def test_balanced_shards_round_robin(ray_session):
    df = text.balanced_shards(SF0001).to_pandas()
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]).to_pandas()
    assert len(df) == len(docs)
    for lang, grp in df.groupby("lang"):
        n = len(grp)
        # rn is a dense 1..n permutation within the lang
        assert sorted(grp["rn"]) == list(range(1, n + 1))
        # round-robin balance: shard sizes differ by at most 1
        sizes = grp["shard"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        # rank respects (n_chars DESC, doc_id ASC)
        srt = grp.sort_values("rn")
        nc = srt["n_chars"].to_numpy()
        assert (np.diff(nc) <= 0).all()
        ids = srt["doc_id"].to_numpy()
        same = nc[1:] == nc[:-1]
        assert (ids[1:][same] > ids[:-1][same]).all()


def test_dup_span_fraction_planted_copies(ray_session, tmp_path):
    # doc 1 copies doc 0 verbatim; doc 2 embeds doc 0's first 40 chars
    # inside otherwise-unique text; doc 3 is fully unique
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    uniq = "zebra quartz vexing jackdaws my big sphinx of black quartz judge now " * 3
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array([base, base, base[:40] + uniq, "xyzzy plugh"], type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    df = text.dup_span_fraction(str(tmp_path)).to_pandas().set_index("doc_id")
    # exact copies: every shingle duplicated
    assert df.loc[0, "dup_frac"] == 1.0
    assert df.loc[1, "dup_frac"] == 1.0
    # partial copy: some but not all shingles duplicated
    assert 0.0 < df.loc[2, "dup_frac"] < 1.0
    # unique short doc: nothing duplicated
    assert df.loc[3, "dup_frac"] == 0.0
    assert df.loc[3, "n_shingles"] == 1  # shorter than one window


def test_dup_span_fraction_matches_bruteforce(ray_session):
    W, S = text.DUP_SPAN_W, text.DUP_SPAN_STRIDE
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"]).to_pandas()
    per_doc = {}
    from collections import Counter

    counts: Counter = Counter()
    for _, r in docs.iterrows():
        s = r["text"]
        sh = {s[i : i + W] for i in range(0, max(len(s) - W, 0) + 1, S)}
        per_doc[r["doc_id"]] = sh
        counts.update(sh)
    df = text.dup_span_fraction(SF0001).to_pandas().set_index("doc_id")
    assert len(df) == len(docs)
    for did, sh in per_doc.items():
        n_dup = sum(1 for g in sh if counts[g] >= 2)
        assert df.loc[did, "n_shingles"] == len(sh)
        assert df.loc[did, "n_dup"] == n_dup


def test_semantic_dedup_matches_golden(ray_session):
    got = (
        ann.semantic_dedup(SF0001, threshold=0.40)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(golden.semantic_dedup_path(SF0001, threshold=0.40))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    # survivorship sanity: reps are kept, rep <= member id, same cluster
    assert (got.loc[got["keep"] == 1, "rep_id"] == got.loc[got["keep"] == 1, "vec_id"]).all()
    assert (got["rep_id"] <= got["vec_id"]).all()
    rep_cluster = got.set_index("vec_id")["cluster"]
    assert (got["cluster"].to_numpy() == rep_cluster.loc[got["rep_id"]].to_numpy()).all()


def test_semantic_dedup_within_cluster_only(ray_session):
    got = ann.semantic_dedup(SF0001, threshold=0.40).to_pandas()
    # at least one actual drop at this threshold in this corpus
    assert (got["keep"] == 0).any()
    # every cluster keeps at least one representative
    assert got.groupby("cluster")["keep"].max().min() == 1


def test_dup_spans_planted_copy_boundaries(ray_session, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    uniq = "zebra quartz vexing jackdaws my big sphinx of black quartz judge now " * 3
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array([base, base, base[:40] + uniq, "xyzzy plugh"], type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    df = text.dup_spans(str(tmp_path)).to_pandas()
    spans = {d: [(int(r["span_start"]), int(r["span_end"])) for _, r in g.iterrows()] for d, g in df.groupby("doc_id")}
    # full copies: ONE span covering the whole doc
    assert spans[0] == [(1, len(base))]
    assert spans[1] == [(1, len(base))]
    # prefix copy: span covers exactly the copied region [1, 40]
    # (last dup shingle starts at 11 -> 11 + 30 - 1 = 40)
    assert spans[2] == [(1, 40)]
    # unique doc: no spans at all
    assert 3 not in spans


def test_dup_spans_consistent_with_dup_span_fraction(ray_session):
    spans = text.dup_spans(SF0001).to_pandas()
    frac = text.dup_span_fraction(SF0001).to_pandas().set_index("doc_id")
    # per doc, island shingle counts must sum to a value <= n_dup of the
    # fraction view (islands count positions; the fraction counts
    # DISTINCT grams — repeated grams in one doc collapse there)
    per_doc = spans.groupby("doc_id")["n_shingles"].sum()
    for did, n in per_doc.items():
        assert n >= frac.loc[did, "n_dup"]
    # every doc with a span has a nonzero dup fraction
    assert (frac.loc[per_doc.index, "n_dup"] > 0).all()


def test_bpe_merges_known_corpus(ray_session, tmp_path):
    # classic BPE example: "low lower lowest" — first merges are (l,o), (lo,w)
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["low low low lower lower", "lowest low lower"], type=pa.string()),
            "lang": pa.array(["en", "en"], type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    from plasmap_ray.pipelines import bpe

    df = bpe.bpe_merges(str(tmp_path), n_merges=4).to_pandas().sort_values("merge_rank")
    got = list(zip(df["left"], df["right"]))
    # every word starts 'lo': (l,o) count 8 dominates, then (lo,w) 8 -> 'low'
    assert got[0] == ("l", "o")
    assert got[1] == ("lo", "w")
    assert ("low", "e") in got  # lower/lowest continue merging


def test_bpe_matches_golden_and_compresses(ray_session):
    import pyarrow.parquet as pq_

    from plasmap_ray.pipelines import bpe

    got_m = bpe.bpe_merges(SF0001).to_pandas().reset_index(drop=True)
    exp_m = pq_.read_table(golden.bpe_merges_path(SF0001, bpe.BPE_N_MERGES)).to_pandas().reset_index(drop=True)
    assert got_m.equals(exp_m)
    assert len(got_m) == bpe.BPE_N_MERGES  # corpus is rich enough to learn all
    # counts are non-increasing in rank ONLY within a round's recount —
    # but every count must be >= 2 (the learning floor)
    assert (got_m["pair_count"] >= 2).all()

    got_e = bpe.bpe_encode_stats(SF0001).to_pandas().sort_values("lang").reset_index(drop=True)
    exp_e = (
        pq_.read_table(golden.bpe_encode_stats_path(SF0001, bpe.BPE_N_MERGES))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert got_e.equals(exp_e)
    # merges compress: fewer subwords than characters, more than tokens
    assert (got_e["n_subwords"] >= got_e["n_tokens"]).all()
    zero = bpe.bpe_encode_stats(SF0001, n_merges=0).to_pandas().set_index("lang")
    for _, r in got_e.iterrows():
        assert r["n_subwords"] < zero.loc[r["lang"], "n_subwords"]  # vs char-level


def test_pca_project_properties(ray_session):
    from plasmap_ray.pipelines import ann as ann_

    df = ann_.pca_project(SF0001).to_pandas()
    exp = pq.read_table(golden.pca_project_path(SF0001, ann_.PCA_K, ann_.PCA_FP)).to_pandas()
    g = df.sort_values("vec_id").reset_index(drop=True)
    x = exp.sort_values("vec_id").reset_index(drop=True)
    assert g.equals(x)
    # residual is the orthogonal complement: non-negative up to round-6 slack
    assert (g["residual"] >= -1e-6).all()
    # explained variance is a proper scree: positive, cumulative <= 1, increasing
    ev = ann_.pca_explained_variance(SF0001).to_pandas().sort_values("pc")
    assert (ev["eigenvalue"] > 0).all()
    assert (np.diff(ev["eigenvalue"]) <= 1e-12).all()  # sorted desc
    assert (np.diff(ev["cum_explained"]) > 0).all()
    assert ev["cum_explained"].iloc[-1] <= 1.0 + 1e-9
    # run-to-run determinism: a second execution is bit-identical
    again = ann_.pca_project(SF0001).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert again.equals(g)


def test_sequence_packing_matches_bruteforce(ray_session):
    # brute-force: concatenate token counts in doc_id order, chunk at ctx
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    n_tok = docs["text"].str.split(" ").map(len).to_numpy(np.int64)
    cum = np.cumsum(n_tok)
    start = cum - n_tok
    ctx = text.PACK_CTX
    exp_first, exp_last = start // ctx, (cum - 1) // ctx

    df = text.sequence_packing(SF0001).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (df["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (df["n_tok"].to_numpy() == n_tok).all()
    assert (df["start_tok"].to_numpy() == start).all()
    assert (df["first_seq"].to_numpy() == exp_first).all()
    assert (df["last_seq"].to_numpy() == exp_last).all()
    assert (df["n_seqs"].to_numpy() == exp_last - exp_first + 1).all()


def test_packing_stats_consistent_with_manifest(ray_session):
    man = text.sequence_packing(SF0001).to_pandas()
    st = text.packing_stats(SF0001).to_pandas()
    assert len(st) == 1
    row = st.iloc[0]
    total = int(man["n_tok"].sum())
    ctx = text.PACK_CTX
    assert row["n_docs"] == len(man)
    assert row["total_tokens"] == total
    assert row["n_seqs"] == -(-total // ctx)
    assert row["n_boundary_docs"] == int((man["n_seqs"] > 1).sum())
    assert row["tail_pad"] == row["n_seqs"] * ctx - total
    # packing invariant: offsets tile the stream with no gaps/overlaps
    m = man.sort_values("doc_id")
    ends = (m["start_tok"] + m["n_tok"]).to_numpy()
    assert m["start_tok"].iloc[0] == 0
    assert (m["start_tok"].to_numpy()[1:] == ends[:-1]).all()
    assert ends[-1] == total


def test_length_bucket_padding_invariants(ray_session):
    df = text.length_bucket_padding(SF0001).to_pandas()
    mult = text.PAD_MULTIPLE
    assert (df["bucket_len"] % mult == 0).all()
    assert (df["pad_tokens"] == df["bucket_len"] * df["n_docs"] - df["sum_tokens"]).all()
    assert (df["pad_tokens"] >= 0).all()
    # every doc pads less than one full multiple
    assert (df["pad_tokens"] < df["n_docs"] * mult).all()
    # totals reconcile with token_stats
    tok = text.token_stats(SF0001).to_pandas()
    assert df["n_docs"].sum() == len(tok)
    assert df["sum_tokens"].sum() == tok["n_tokens"].sum()


def test_filter_funnel_matches_bruteforce(ray_session):
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["text"]).to_pandas()
    txt = docs["text"].astype(str)
    n_tok = txt.str.split(" ").map(len).to_numpy(np.int64)
    n_chars = txt.str.len().to_numpy(np.int64)
    n_alpha = txt.str.count("[A-Za-z]").to_numpy(np.int64)
    endp = txt.str.contains(r"[.!?]$", regex=True).to_numpy()
    spam = (txt.str.contains("{", regex=False) | txt.str.lower().str.contains("lorem ipsum")).to_numpy()
    import plasmap_ray.pipelines.text as text_mod

    r1 = n_tok < text_mod.FUNNEL_MIN_TOK
    r2 = ~r1 & (n_tok > text_mod.FUNNEL_MAX_TOK)
    r3 = ~r1 & ~r2 & (n_alpha * 2 < n_chars)
    r4 = ~r1 & ~r2 & ~r3 & ~endp
    r5 = ~r1 & ~r2 & ~r3 & ~r4 & spam
    exp_drops = [int(r.sum()) for r in (r1, r2, r3, r4, r5)]

    df = text.filter_funnel(SF0001).to_pandas().sort_values("rule_idx").reset_index(drop=True)
    assert list(df["rule"]) == list(text_mod.FUNNEL_RULES)
    assert list(df["n_dropped"]) == exp_drops
    # funnel chain: n_out of rule i == n_in of rule i+1; starts at corpus size
    assert df["n_in"].iloc[0] == len(docs)
    assert (df["n_out"].to_numpy()[:-1] == df["n_in"].to_numpy()[1:]).all()
    assert (df["n_out"] == df["n_in"] - df["n_dropped"]).all()


def test_split_leakage_phash_matches_bruteforce(ray_session):
    import hashlib

    from plasmap_ray.pipelines import images as img_p
    from plasmap_ray.pipelines.dedup import SPLIT_OF_HEX

    t = pq.read_table(img_p.images_path_for(SF0001), columns=["image_id", "phash"]).to_pandas()
    t["split"] = [SPLIT_OF_HEX[hashlib.md5(s.encode()).hexdigest()[0]] for s in t["image_id"]]
    d = t[["phash", "split"]].drop_duplicates()
    from collections import Counter

    exp = Counter()
    for _, grp in d.groupby("phash"):
        s = sorted(grp["split"])
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                exp[(s[i], s[j])] += 1

    df = img_p.split_leakage_phash(SF0001).to_pandas()
    got = {(r.split_a, r.split_b): r.n_shared_phashes for r in df.itertuples()}
    assert got == dict(exp)
    # the fixture corpus plants exact duplicates, so SOME leakage exists
    assert sum(got.values()) > 0 or len(d) == len(t["phash"].unique())


def test_corpus_flagship_dedups_and_tiles(ray_session):
    man = text.corpus_flagship(SF0001).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"]).to_pandas()
    # survivors are a subset; exact duplicates collapse to the smallest doc_id
    import hashlib

    docs["h"] = docs["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    n_tok = docs["text"].str.split(" ").map(len)
    keep = (n_tok >= text.FUNNEL_MIN_TOK) & (n_tok <= text.FUNNEL_MAX_TOK)
    alpha = docs["text"].str.count("[A-Za-z]")
    keep &= alpha * 2 >= docs["text"].str.len()
    keep &= ~(docs["text"].str.contains("{", regex=False) | docs["text"].str.lower().str.contains("lorem ipsum"))
    exp_ids = sorted(docs[keep].groupby("h")["doc_id"].min())
    assert list(man["doc_id"]) == exp_ids
    assert len(man) <= keep.sum()  # duplicates (if any at this SF) collapse
    # manifest tiles the survivor stream with no gaps
    ends = (man["start_tok"] + man["n_tok"]).to_numpy()
    assert man["start_tok"].iloc[0] == 0
    assert (man["start_tok"].to_numpy()[1:] == ends[:-1]).all()


def test_pack_manifest_empty_input_is_typed(ray_session, tmp_path):
    # a corpus where nothing survives must yield a typed empty manifest
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["a b", "c d"], type=pa.string()),  # too short
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = text.corpus_flagship(str(tmp_path))
    assert out.count() == 0
    # typed empty: schema survives even with zero rows
    assert out.schema().names == ["doc_id", "n_tok", "start_tok", "first_seq", "last_seq", "n_seqs"]


def test_packing_formula_property():
    """Pure-kernel property: the closed-form (first_seq, last_seq) must
    equal brute-force token-level chunk assignment for any token-count
    sequence and any ctx."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60),
        st.integers(min_value=1, max_value=4096),
    )
    def check(n_toks, ctx):
        n = np.asarray(n_toks, dtype=np.int64)
        end = np.cumsum(n)
        start = end - n
        first, last = start // ctx, (end - 1) // ctx
        # brute force: which chunk holds each doc's first and last token
        stream = np.repeat(np.arange(len(n)), n)  # doc id per token
        chunk = np.arange(len(stream)) // ctx
        for i in range(len(n)):
            toks = np.nonzero(stream == i)[0]
            assert chunk[toks[0]] == first[i]
            assert chunk[toks[-1]] == last[i]
            assert last[i] - first[i] + 1 == len(np.unique(chunk[toks]))

    check()


def test_incremental_md5_dedup_equals_batch(ray_session):
    from plasmap_ray.pipelines import dedup

    inc = dedup.incremental_md5_dedup(SF0001).to_pandas().sort_values("text_md5").reset_index(drop=True)
    bat = dedup.text_md5_dedup(SF0001).to_pandas().sort_values("text_md5").reset_index(drop=True)
    assert inc.equals(bat)


def test_incremental_md5_dedup_cross_split_duplicate(ray_session, tmp_path):
    # duplicate text straddles the old/new split: first-wins must come
    # from the OLD shard and the counts must sum across shards
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),  # split = 2
            "text": pa.array(["same text here", "unique old", "same text here", "unique new"], type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    from plasmap_ray.pipelines import dedup

    df = dedup.incremental_md5_dedup(str(tmp_path)).to_pandas()
    import hashlib

    h = hashlib.md5(b"same text here").hexdigest()
    row = df[df["text_md5"] == h].iloc[0]
    assert row["first_doc_id"] == 0 and row["n_copies"] == 2
    assert len(df) == 3


def test_cdc_boundaries_shift_invariance():
    """The CDC property that motivates content-defined chunking: an
    insertion near the front only moves boundaries locally — boundaries
    far past the edit stay at the same CONTENT positions (fixed-size
    blocks would all shift)."""
    from plasmap_ray.pipelines.dedup import CDC_WINDOW, _cdc_boundaries

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=4000, dtype=np.uint8)
    ins = rng.integers(0, 256, size=13, dtype=np.uint8)
    edited = np.concatenate([base[:100], ins, base[100:]])
    b0 = set(_cdc_boundaries(base).tolist())
    b1 = set((_cdc_boundaries(edited) - 13).tolist())
    far = {p for p in b0 if p > 100 + CDC_WINDOW}
    # every far boundary survives the edit at its shifted position
    assert far and far <= b1


def test_cdc_chunk_dedup_finds_planted_shared_chunks(ray_session, tmp_path):
    # two docs share a long middle; unique heads/tails -> the shared
    # chunks must be reported with n_docs == 2
    rng = np.random.default_rng(3)
    mid = "".join(chr(65 + int(c)) for c in rng.integers(0, 26, size=2000))
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["HEAD0 " + mid, "HEAD1111 " + mid, "totally unrelated"], type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    from plasmap_ray.pipelines import dedup as dd

    df = dd.cdc_chunk_dedup(str(tmp_path)).to_pandas()
    assert len(df) > 0
    shared2 = df[df["n_docs"] == 2]
    assert len(shared2) > 0  # interior chunks of the common middle
    assert (df["n_occurrences"] >= df["n_docs"]).all()


def test_cdc_savings_consistency(ray_session):
    from plasmap_ray.pipelines import dedup as dd

    st = dd.cdc_savings(SF0001).to_pandas().iloc[0]
    assert st["n_unique_chunks"] <= st["n_chunks"]
    assert st["unique_bytes"] <= st["total_bytes"]
    assert st["dedup_ratio"] >= 1.0
    # totals reconcile with the raw corpus byte size
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["text"]).to_pandas()
    raw = int(docs["text"].str.encode("utf-8").str.len().sum())
    assert st["total_bytes"] == raw


def test_shuffled_packing_is_a_permutation_of_sequential(ray_session):
    sh = text.shuffled_packing(SF0001).to_pandas()
    sq = text.sequence_packing(SF0001).to_pandas()
    # same docs, same token counts, same total stream
    assert sorted(sh["doc_id"]) == sorted(sq["doc_id"])
    assert sh["n_tok"].sum() == sq["n_tok"].sum()
    # the shuffled stream tiles with no gaps in HASH order
    import hashlib

    sh = sh.assign(h=[hashlib.md5(str(int(i)).encode()).hexdigest() for i in sh["doc_id"]])
    sh = sh.sort_values(["h", "doc_id"]).reset_index(drop=True)
    ends = (sh["start_tok"] + sh["n_tok"]).to_numpy()
    assert sh["start_tok"].iloc[0] == 0
    assert (sh["start_tok"].to_numpy()[1:] == ends[:-1]).all()
    # and it is genuinely a different order than doc_id order
    assert list(sh["doc_id"]) != sorted(sh["doc_id"])


def test_jaro_winkler_matches_duckdb_scalar():
    """The Python scorer is bit-identical to DuckDB's
    jaro_winkler_similarity across textbook and corpus pairs."""
    import duckdb

    from plasmap_ray.pipelines import dedup

    names = pq.read_table(f"{SF0001}/part.parquet", columns=["p_name"])["p_name"].to_pylist()
    pairs = [("martha", "marhta"), ("dixon", "dicksonx"), ("duane", "dwayne"), ("", "x"), ("abc", "abc")]
    rng = np.random.RandomState(7)
    idx = rng.randint(0, len(names), size=(200, 2))
    pairs += [(names[a], names[b]) for a, b in idx]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.sql("SELECT jaro_winkler_similarity(?, ?)", params=[a, b]).fetchone()[0]
        assert dedup.jaro_winkler(a, b) == want, (a, b)


def test_fuzzy_name_match_vs_sql(ray_session):
    """Blocked JW join == the brute within-brand SQL join."""
    import duckdb

    from plasmap_ray.pipelines import dedup

    got = dedup.fuzzy_name_match(SF0001).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF0001}/part.parquet')")
    exp = con.sql(f"""
SELECT a.p_brand, a.p_partkey AS part_a, b.p_partkey AS part_b,
       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= {dedup.JW_THRESHOLD!r}""").df()
    assert len(exp) >= 10  # blocking really yields matches
    cols = ["p_brand", "part_a", "part_b", "sim"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(e)


def test_bigram_lm_score_vs_bruteforce(ray_session):
    """Engine LM scores == a local numpy recompute of the interpolated
    bigram model (and templated near-dup docs score HIGHER than the
    corpus median — the LM recognises repeated structure)."""
    from collections import Counter

    docs = pq.read_table(f"{SF0001}/documents.parquet", columns=["doc_id", "text"])
    uni: Counter = Counter()
    bi: Counter = Counter()
    toks = {}
    for did, s in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = s.lower().split(" ")
        toks[did] = w
        uni.update(w)
        bi.update(zip(w[:-1], w[1:]))
    total = float(sum(uni.values()))
    lam = text.BIGRAM_LAMBDA
    got = text.bigram_lm_score(SF0001).to_pandas().set_index("doc_id")
    assert len(got) == sum(1 for w in toks.values() if len(w) >= 2)
    for did, w in list(toks.items())[:100]:
        if len(w) < 2:
            continue
        lp = np.array([
            np.log(lam * (bi[(a, b)] / uni[a]) + (1.0 - lam) * (uni[b] / total))
            for a, b in zip(w[:-1], w[1:])
        ])
        assert got.loc[did, "n_bigrams"] == len(w) - 1
        assert abs(got.loc[did, "lm_score"] - round(float(lp.mean()), 6)) <= 1e-9


def test_zipf_fit_brute(ray_session):
    """Slope/R² equal the closed-form OLS on a local recount; the
    word-soup fixture corpus is flat (|slope| < 1) but well-fit."""
    from collections import Counter

    got = text.zipf_fit(SF0001).to_pandas().iloc[0]
    docs = pq.read_table(f"{SF0001}/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for s in docs["text"].to_pylist():
        c.update(s.lower().split(" "))
    freqs = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(freqs) + 1, dtype=float))
    y = np.log(np.array([f for _, f in freqs], dtype=float))
    n = float(len(x))
    sx, sy, sxx, syy, sxy = x.sum(), y.sum(), (x * x).sum(), (y * y).sum(), (x * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert got["n_tokens"] == len(freqs)
    assert abs(got["zipf_slope"] - round(slope, 6)) <= 1e-9
    assert abs(got["r2"] - round(r2, 6)) <= 1e-9
    assert -5 < got["zipf_slope"] < 0 and 0 <= got["r2"] <= 1


def test_curriculum_buckets_ntile_exact(ray_session):
    """Distributed NTILE == pandas qcut-free brute: tier sizes differ by
    at most one, tiers ordered by score, per-(tier,lang) counts match a
    local recompute from the engine's own scores."""
    got = text.curriculum_buckets(SF0001).to_pandas()
    scores = text.bigram_lm_score(SF0001).to_pandas()
    docs = pq.read_table(f"{SF0001}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    m = scores.merge(docs, on="doc_id").sort_values(["lm_score", "doc_id"]).reset_index(drop=True)
    n, t = len(m), text.CURRICULUM_TIERS
    q, r = divmod(n, t)
    tiers = np.concatenate([np.full(q + (1 if i < r else 0), i + 1, dtype=np.int64) for i in range(t)])
    m["tier"] = tiers
    want = m.groupby(["tier", "lang"]).size().reset_index(name="n_docs")
    g = got.sort_values(["tier", "lang"]).reset_index(drop=True)
    w = want.sort_values(["tier", "lang"]).reset_index(drop=True)
    assert g["n_docs"].astype("int64").tolist() == w["n_docs"].astype("int64").tolist()
    assert list(g["tier"]) == list(w["tier"]) and list(g["lang"]) == list(w["lang"])
    sizes = got.groupby("tier")["n_docs"].sum()
    assert sizes.max() - sizes.min() <= 1


def test_token_budget_sample_invariants(ray_session):
    """Budget respected per source; kept set is an exact hash-order
    prefix (the first dropped doc would overshoot the budget)."""
    import hashlib

    got = text.token_budget_sample(SF0001).to_pandas()
    docs = pq.read_table(f"{SF0001}/documents.parquet", columns=["doc_id", "source", "text"]).to_pandas()
    docs["n_tok"] = docs["text"].str.split(" ").str.len()
    docs["h"] = docs["doc_id"].map(lambda i: hashlib.md5(str(int(i)).encode()).hexdigest())
    kept_tot = got.groupby("source")["n_tok"].sum()
    assert (kept_tot <= text.TOKEN_BUDGET).all()
    for src, g in docs.groupby("source"):
        g = g.sort_values(["h", "doc_id"]).reset_index(drop=True)
        cum = g["n_tok"].cumsum()
        want = set(g.loc[cum <= text.TOKEN_BUDGET, "doc_id"])
        have = set(got.loc[got["source"] == src, "doc_id"])
        assert have == want, src
        # greedy-prefix property: first excluded doc would overshoot
        dropped = g.loc[~g["doc_id"].isin(want)]
        if len(dropped):
            first = dropped.index.min()
            assert cum.iloc[first] > text.TOKEN_BUDGET


def test_lz78_complexity_known_strings(ray_session):
    """LZ78 parse counts on textbook cases + repetitive text compresses."""
    import pyarrow as pa

    from plasmap_ray.pipelines import text as text_mod

    # classic example: 'aaaa...' parses as a, aa, aaa, ... (triangular)
    batch = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                      "text": pa.array(["aaaaaa", "abcdef", "ababababab"])})
    # drive the pipeline on a temp parquet
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(batch, os.path.join(td, "documents.parquet"))
        out = text_mod.lz78_complexity(td).to_pandas().set_index("doc_id")
    # 'aaaaaa' -> a, aa, aaa (6 chars exactly) = 3 phrases
    assert out.loc[1, "lz78_phrases"] == 3
    # all-distinct chars: every char is its own phrase
    assert out.loc[2, "lz78_phrases"] == 6
    # 'ababababab' -> a, b, ab, aba, ba, b(trailing)... recompute by hand:
    # a | b | ab | aba | ba | b -> 6 phrases over 10 chars
    assert out.loc[3, "lz78_phrases"] == 6
    # repetitive text has lower ratio than random-ish text
    assert out.loc[1, "lz_ratio"] < out.loc[2, "lz_ratio"]


def test_lz78_matches_golden(ray_session):
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import text as text_mod

    sf = "/root/testdata/sf0.001"
    got = text_mod.lz78_complexity(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = pq.read_table(golden.lz78_complexity_path(sf)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_readability_scores_known_text(ray_session):
    """Hand-checked Flesch arithmetic on tiny docs routed through the
    real pipeline batch fn."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.pipelines.text import _SENT_MARK, _VOWEL_RUN

    # "the cat sat. it ran!" -> 5 words, syllables 1 each, 2 sentences
    s = "the cat sat. it ran!"
    words = [w for w in s.split(" ") if w]
    assert len(words) == 5
    syl = sum(max(1, len(_VOWEL_RUN.findall(w))) for w in words)
    assert syl == 5
    assert len(_SENT_MARK.findall(s)) == 2
    ease = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
    assert abs(ease - 119.6975) < 1e-9


def test_readability_scores_pipeline(ray_session):
    from plasmap_ray.pipelines import text as text_p

    out = text_p.readability_scores("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["n_words"] > 0).all()
    # fixture docs are unpunctuated word soup: one "sentence" each, so
    # the ease score is dominated by the words-per-sentence penalty
    assert (out["n_sentences"] == 1).all()
    assert (out["n_syllables"] >= out["n_words"]).all()
    recomputed = (
        206.835
        - 1.015 * (out["n_words"] / out["n_sentences"])
        - 84.6 * (out["n_syllables"] / out["n_words"])
    )
    assert np.allclose(out["flesch_ease"], recomputed.round(6), atol=1e-6)


def test_mtld_factors_known_sequence(ray_session):
    """Hand-traced MTLD pass: a fully repetitive stream fragments into
    many factors; an all-distinct stream never completes one."""
    from plasmap_ray.pipelines.text import _mtld_factors

    # all same token: TTR after 2 tokens = 1/2 < 0.72 -> factor every 2
    f, p = _mtld_factors(["x"] * 10)
    assert f == 5 and p == 0.0
    # all distinct: TTR stays 1.0, one partial with TTR 1 -> partial 0
    f, p = _mtld_factors([str(i) for i in range(10)])
    assert f == 0 and p == 0.0
    # boundary check: types=7, tokens=10 -> 100*7 < 72*10 -> factor
    toks = list("abcdefg") + ["a", "b", "c"]
    f, p = _mtld_factors(toks)
    assert f == 1 and p == 0.0


def test_mtld_pipeline_sane(ray_session):
    from plasmap_ray.pipelines import text as text_p

    out = text_p.mtld_diversity("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0 and (out["n_tokens"] > 0).all()
    assert (out["mtld"] >= 0).all()
    # a short diverse doc EXTRAPOLATES beyond its own length via the
    # partial factor (that's the MTLD length-robustness by design), but
    # with >=1 complete factor the estimate is bounded by n_tokens
    both = (out["factors_fwd"] >= 1) & (out["factors_bwd"] >= 1)
    assert (out.loc[both, "mtld"] <= out.loc[both, "n_tokens"] + 1e-9).all()
    assert np.allclose(out["mtld"], ((out["mtld_fwd"] + out["mtld_bwd"]) / 2).round(6), atol=2e-6)


def test_heaps_law_monotone_and_fit(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as text_p

    sf = "/root/testdata/sf0.001"
    out = text_p.heaps_law(sf).to_pandas()
    assert len(out) == text_p.HEAPS_POINTS
    # both curves are nondecreasing and end at the full-corpus totals
    assert out["n_tokens_total"].is_monotonic_increasing
    assert out["n_distinct"].is_monotonic_increasing
    t = pq.read_table(sf + "/documents.parquet", columns=["text"])
    all_toks = []
    for s in t["text"].to_pylist():
        all_toks.extend(s.lower().split(" "))
    assert out["n_tokens_total"].iloc[-1] == len(all_toks)
    assert out["n_distinct"].iloc[-1] == len(set(all_toks))
    # the fixture corpus is CLOSED-vocabulary word soup (31 tokens):
    # Heaps beta == 0 is the correct templated-text detection
    assert out["heaps_beta"].iloc[0] == 0.0
    assert out["n_distinct"].nunique() == 1


def test_heaps_law_open_vocabulary(ray_session, tmp_path):
    """A corpus that keeps minting new tokens fits 0 < beta <= 1."""
    import numpy as np
    import pyarrow as pa

    from plasmap_ray.pipelines import text as text_p

    rng = np.random.default_rng(7)
    texts = []
    minted = 0
    for d in range(60):
        toks = []
        for _ in range(40):
            if rng.random() < 0.3:
                minted += 1
                toks.append(f"new{minted}")
            else:
                toks.append(f"common{int(rng.integers(0, 20))}")
        texts.append(" ".join(toks))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1, 61, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = text_p.heaps_law(str(tmp_path)).to_pandas()
    beta = out["heaps_beta"].iloc[0]
    assert 0.0 < beta <= 1.0
    assert out["n_distinct"].is_monotonic_increasing
    assert out["n_distinct"].iloc[-1] > out["n_distinct"].iloc[0]


def test_winnowing_guarantee_and_pairs(ray_session):
    """Winnowing's coverage guarantee: any shared substring of length
    >= W+K-1 yields a shared fingerprint; reported pairs match exact
    set intersections."""
    from plasmap_ray.pipelines.text import WIN_K, WIN_W, _winnow_doc, winnowing_overlap

    shared = b"the quick brown fox jumps over the lazy dog once more"
    a = b"PREFIX-A " + shared + b" SUFFIX-A"
    b_ = b"other lead-in text " + shared + b" different tail"
    fa, fb = set(_winnow_doc(a).tolist()), set(_winnow_doc(b_).tolist())
    assert len(shared) >= WIN_W + WIN_K - 1
    assert fa & fb  # guaranteed shared fingerprint
    # disjoint byte alphabets -> no shared fingerprints
    fc = set(_winnow_doc(b"0123456789" * 10).tolist())
    fd = set(_winnow_doc(b"abcdefghij" * 10).tolist())
    assert not (fc & fd)

    out = winnowing_overlap("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq2

    t = pq2.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    sets = {
        int(t["doc_id"][i].as_py()): set(_winnow_doc(t["text"][i].as_py().encode()).tolist())
        for i in range(t.num_rows)
    }
    assert len(out) > 0
    for r in out.itertuples():
        assert len(sets[r.doc_a] & sets[r.doc_b]) == r.n_shared


def test_gopher_rules_bruteforce(ray_session):
    """Per-rule fail counts recomputed with a plain Python loop."""
    import re

    from plasmap_ray.pipelines import text as text_mod

    out = text_mod.gopher_rules(SF0001).to_pandas().set_index("rule")
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["text"])["text"].to_pylist()
    fails = {r: 0 for r in text_mod.GOPHER_RULES}
    n_pass = 0
    for txt in docs:
        low = txt.lower()
        words = low.split(" ")
        nw = len(words)
        sum_wl = sum(len(w) for w in words)
        n_hash = low.count("#")
        n_ell = low.count("...")  # str.count is non-overlapping, same as replace-len
        n_alpha = sum(1 for w in words if re.search("[a-z]", w))
        n_stop = sum(1 for sw in text_mod.GOPHER_STOPWORDS if re.search(rf"\b{sw}\b", low))
        f = {
            "word_count": nw < 50 or nw > 100_000,
            "mean_word_len": 3 * nw > sum_wl or sum_wl > 10 * nw,
            "hash_ratio": 10 * n_hash > nw,
            "ellipsis_ratio": 10 * n_ell > 3 * nw,
            "alpha_words": 10 * n_alpha < 8 * nw,
            "stopwords": n_stop < 2,
        }
        for r, v in f.items():
            fails[r] += int(v)
        n_pass += int(not any(f.values()))
    for r in text_mod.GOPHER_RULES:
        assert int(out.loc[r, "n_fail"]) == fails[r], r
    assert int(out.loc["pass_all", "n_fail"]) == len(docs) - n_pass


def test_naive_bayes_domain_bruteforce(ray_session):
    """Confusion matrix recomputed with a plain dict-based NB."""
    import math
    from collections import Counter, defaultdict

    from plasmap_ray.pipelines import text as text_mod

    out = (
        text_mod.naive_bayes_domain(SF0001)
        .to_pandas()
        .set_index(["true_source", "pred_source"])["n_docs"]
        .to_dict()
    )
    t = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["text", "source"])
    docs = [(txt.lower().split(" "), s) for txt, s in zip(t["text"].to_pylist(), t["source"].to_pylist())]
    cnt = defaultdict(Counter)
    ndocs = Counter()
    vocab = set()
    for words, s in docs:
        ndocs[s] += 1
        cnt[s].update(words)
        vocab.update(words)
    V = len(vocab)
    classes = sorted(ndocs)
    FP = text_mod.NB_FP
    q = lambda x: math.floor(x * FP + 0.5)  # noqa: E731
    want = Counter()
    for words, s in docs:
        best = None
        for c in classes:
            tot = sum(cnt[c].values())
            score = q(math.log(ndocs[c] / len(docs)))
            for w in words:
                score += q(math.log((cnt[c][w] + 1) / (tot + V)))
            if best is None or score > best[0]:
                best = (score, c)
        want[(s, best[1])] += 1
    assert out == dict(want)


def test_huffman_kraft_and_optimality(ray_session):
    """Kraft equality for a full binary tree + entropy optimality band."""
    from plasmap_ray.pipelines import text as text_mod

    out = text_mod.huffman_code_lengths(SF0001).to_pandas()
    assert len(out) > 1
    # Kraft: sum 2^-len == 1 exactly for a Huffman (full) tree
    from fractions import Fraction

    kraft = sum(Fraction(1, 2 ** int(l)) for l in out["code_len"])
    assert kraft == 1
    # entropy <= avg bits < entropy + 1
    n = out["n"].to_numpy().astype(np.float64)
    p = n / n.sum()
    ent = -(p * np.log2(p)).sum()
    avg = (p * out["code_len"].to_numpy()).sum()
    assert ent - 1e-9 <= avg < ent + 1.0


def test_good_turing_bruteforce(ray_session):
    from collections import Counter

    from plasmap_ray.pipelines import text as text_mod

    out = text_mod.good_turing_unseen(SF0001).to_pandas().set_index("source")
    t = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["text", "source"])
    per = {}
    for txt, s in zip(t["text"].to_pylist(), t["source"].to_pylist()):
        per.setdefault(s, Counter()).update(txt.lower().split(" "))
    for s, cnt in per.items():
        row = out.loc[s]
        assert int(row["n_tokens"]) == sum(cnt.values())
        assert int(row["vocab"]) == len(cnt)
        f1 = sum(1 for v in cnt.values() if v == 1)
        f2 = sum(1 for v in cnt.values() if v == 2)
        assert int(row["f1"]) == f1 and int(row["f2"]) == f2
        assert abs(row["unseen_mass"] - round(f1 / sum(cnt.values()), 6)) < 1e-9
        assert row["chao1"] >= len(cnt) - 1e-9  # projection never below observed


def test_stratified_kfold_balance(ray_session):
    from plasmap_ray.pipelines import text as text_mod

    out = text_mod.stratified_kfold(SF0001).to_pandas()
    k = text_mod.KFOLD_K
    # stratification: within every source, fold sizes differ by <= 1
    for s, grp in out.groupby("source"):
        sizes = grp.set_index("fold")["n_docs"]
        assert sizes.max() - sizes.min() <= 1, s
        assert set(grp["fold"]) <= set(range(k))
    # totals: every document assigned exactly once
    docs = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["source"])
    assert int(out["n_docs"].sum()) == docs.num_rows
    assert (out["n_langs"] >= 1).all()


def test_word_burstiness_function_vs_content(ray_session):
    from plasmap_ray.pipelines import text as text_mod

    out = text_mod.word_burstiness(SF0001).to_pandas()
    assert len(out) > 0
    # df can never exceed the Poisson ceiling by much: expected >= df
    # is not guaranteed, but burstiness must be positive and df <= n
    assert (out["df"] <= out["n"]).all()
    assert (out["burstiness"] > 0).all()
    # exact recompute for one token
    import collections

    t = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["text"])
    docs = [txt.lower().split(" ") for txt in t["text"].to_pylist()]
    tok = out["token"].iloc[0]
    n = sum(d.count(tok) for d in docs)
    df = sum(1 for d in docs if tok in d)
    row = out[out["token"] == tok].iloc[0]
    assert int(row["n"]) == n and int(row["df"]) == df
