"""Tag normalization (M4/M5), KMV sketch (A4), inverted index (S11/J8)."""

import numpy as np
import pyarrow as pa
import pytest

from plasmap_ray.stages import sketch, tags


def _tag_table():
    return pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "tags": pa.array(
                [
                    [("amenity", "restaurant"), ("name", "Zur Post"), ("junk:key", "x"), ("amenity", "restaurant")],
                    [("boundary", "administrative"), ("admin_level", "6"), ("addr:city", "Essen")],
                    [("weird", "tag")],
                ],
                type=pa.map_(pa.string(), pa.string()),
            ),
        }
    )


def test_normalize_tags_vocabulary_intersection():
    out = tags.normalize_tags(_tag_table())
    rows = out["tags"].to_pylist()
    assert rows[0] == [("amenity", "restaurant")]  # whitelist + distinct
    assert sorted(rows[1]) == [("admin_level", "6"), ("boundary", "administrative")]
    assert rows[2] == []  # fully out-of-vocabulary


def test_project_index_tags_whitelist_and_drop():
    out = tags.project_index_tags(_tag_table())
    got = list(zip(out["id"].to_pylist(), out["key"].to_pylist(), out["value"].to_pylist()))
    assert (1, "name", "Zur Post") in got
    assert (2, "addr:city", "Essen") in got
    assert all(k in tags.INDEX_KEYS for _, k, _v in got)
    assert 3 not in {i for i, _, _ in got}  # no indexable tags -> no rows


def test_has_tag_mask():
    m = tags.has_tag_mask(_tag_table(), "amenity", "restaurant")
    assert m.tolist() == [True, False, False]


def test_canonical_vocabulary_size():
    assert len(tags.CANONICAL_TAGS) >= 75


def test_kmv_exact_below_saturation():
    s = sketch.KMVSketch(k=256).update(np.arange(100, dtype=np.int64))
    assert s.estimate() == 100.0
    # duplicates don't inflate
    s.update(np.arange(100, dtype=np.int64))
    assert s.estimate() == 100.0


def test_kmv_estimate_accuracy_and_merge():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 62, 200_000, dtype=np.int64)
    true = len(np.unique(vals))
    whole = sketch.KMVSketch(k=1024).update(vals)
    est = whole.estimate()
    assert abs(est - true) / true < 0.1
    # merge of halves == sketch of whole (associativity)
    a = sketch.KMVSketch(k=1024).update(vals[:100_000])
    b = sketch.KMVSketch(k=1024).update(vals[100_000:])
    merged = a.merge(b)
    assert np.array_equal(merged.mins, whole.mins)
    # serialize round trip
    back = sketch.KMVSketch.deserialize(merged.serialize(), k=1024)
    assert back.estimate() == merged.estimate()


def test_distinct_count_approx_on_dataset(ray_session):
    import ray.data as rd

    ids = np.repeat(np.arange(1000, dtype=np.int64), 5)  # 5000 rows, 1000 distinct
    ds = rd.from_arrow(pa.table({"user_id": pa.array(ids)}))
    est = sketch.distinct_count_approx(ds, "user_id", k=2048)
    assert est == 1000.0  # below saturation -> exact


def test_inverted_index_roundtrip(ray_session):
    from plasmap_ray.pipelines import index

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["Spark beats spark", "plain words"], type=pa.string()),
        }
    )
    out = index.tokenize_explode(t).to_pydict()
    pairs = set(zip(out["token"], out["doc_id"]))
    assert ("spark", 1) in pairs and ("beats", 1) in pairs
    # per-doc dedup: 'spark' appears once for doc 1
    assert sum(1 for tok, d in pairs if tok == "spark" and d == 1) == 1


def test_anti_search_complements_search(ray_session):
    """semi-join + anti-join partition the corpus exactly."""
    from plasmap_ray.pipelines import index

    sf = "/root/testdata/sf0.001"
    hits = index.search_by_token(sf, "spark").to_pandas()
    misses = index.anti_search(sf, "spark").to_pandas()
    assert len(hits) + len(misses) == 500
    assert set(hits["doc_id"]).isdisjoint(set(misses["doc_id"]))


def test_bm25_saturation_and_length_norm(ray_session, tmp_path):
    """BM25 semantics pinned on a hand-built corpus: (a) term-frequency
    saturates (score < idf*(k1+1) no matter how stuffed the doc), and
    (b) with equal tf, the SHORTER document outranks the longer one."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import index as idx

    texts = [
        "spark " * 50 + "x",          # doc 0: stuffed
        "spark data",                  # doc 1: short, tf=1
        "spark " + "pad " * 30,        # doc 2: long, tf=1
        "nothing here",                # doc 3: no hit
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array([s.strip() for s in texts]),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = idx.search_bm25(str(tmp_path), tokens=("spark",), k=4).to_pandas()
    got = got.set_index("doc_id")["score"]
    assert 3 not in got.index
    k1 = 1.2
    n, df = 4, 3
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    assert got[0] < idf * (k1 + 1.0)  # saturation bound
    assert got[1] > got[2]  # equal tf, shorter doc wins


def test_repetition_ratio_planted_template(ray_session, tmp_path):
    """A doc that repeats one 3-gram scores high; a no-repeat doc scores 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as textmod

    spam = " ".join(["buy cheap pills"] * 10)  # 30 tokens, 28 grams, few distinct
    clean = " ".join(f"w{i}" for i in range(30))
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()), "text": [spam, clean]}),
        str(tmp_path / "documents.parquet"),
    )
    out = textmod.repetition_ratio(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[2, "rep_ratio"] == 0.0
    assert out.loc[1, "rep_ratio"] > 0.8
    assert out.loc[1, "n_grams"] == 28


def test_common_ngram_fraction_exact_dup_is_one(ray_session, tmp_path):
    """Two identical docs share every 3-gram (frac 1.0); a unique doc shares none."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as textmod

    a = " ".join(f"a{i}" for i in range(20))
    b = " ".join(f"b{i}" for i in range(20))
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()), "text": [a, a, b]}),
        str(tmp_path / "documents.parquet"),
    )
    out = textmod.common_ngram_fraction(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "common_frac"] == 1.0
    assert out.loc[2, "common_frac"] == 1.0
    assert out.loc[3, "common_frac"] == 0.0


def test_unigram_logprob_orders_rarity(ray_session, tmp_path):
    """Docs made of corpus-frequent tokens outscore docs of rare tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as textmod

    common = " ".join(["the"] * 20)
    rare = " ".join(f"zq{i}" for i in range(20))  # each token appears once
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()), "text": [common, rare]}),
        str(tmp_path / "documents.parquet"),
    )
    out = textmod.unigram_logprob(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "lm_score"] > out.loc[2, "lm_score"]


def test_bigram_pmi_finds_planted_collocation(ray_session, tmp_path):
    """A bigram that always co-occurs outranks independent pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as textmod

    rng_words = [f"w{i}" for i in range(20)]
    docs = []
    for i in range(40):
        base = " ".join(rng_words[j % 20] for j in range(i, i + 15))
        docs.append(base + " new york")  # planted collocation every doc
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()), "text": docs}),
        str(tmp_path / "documents.parquet"),
    )
    out = textmod.bigram_pmi(str(tmp_path), min_count=30, k=5).to_pandas()
    assert (out["w1"].iloc[0], out["w2"].iloc[0]) == ("new", "york")


def test_subword_stats_classes(ray_session, tmp_path):
    """Alpha/digit/punct run counts match hand counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as textmod

    pq.write_table(
        pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": ["Hello world42, x-9!"]}),
        str(tmp_path / "documents.parquet"),
    )
    out = textmod.subword_stats(str(tmp_path)).to_pandas().iloc[0]
    # lower: "hello world42, x-9!" -> alpha: hello, world, x (3); digit: 42, 9 (2); punct: , - ! (3)
    assert out["n_alpha"] == 3 and out["n_digit"] == 2 and out["n_punct"] == 3
    assert out["n_subwords"] == 8


def test_langid_confusion_marginals(ray_session):
    """Confusion-matrix row sums equal the per-language doc counts."""
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import text as textmod

    sf = "/root/testdata/sf0.001"
    cm = textmod.langid_confusion(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["lang"]).to_pandas()
    truth = docs["lang"].value_counts()
    rows = cm.groupby("lang")["n_docs"].sum()
    for lang, n in truth.items():
        assert int(rows[lang]) == int(n)
    assert cm["n_docs"].sum() == len(docs)


def test_interpolated_quantiles_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.01"
    out = stats.interpolated_quantiles(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"]).to_pandas()
    for (et, q), grp in out.groupby(["event_type", "q"]):
        exp = np.quantile(ev[ev["event_type"] == et]["value"].to_numpy(), q, method="linear")
        assert abs(grp["q_value"].iloc[0] - exp) < 1e-5, (et, q)
    assert set(out["q"]) == {0.25, 0.5, 0.75, 0.9}


def test_hour_type_pivot_row_sums(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.01"
    out = stats.hour_type_pivot(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "ts"]).to_pandas()
    totals = ev.groupby("event_type").size()
    hcols = [f"h{h:02d}" for h in range(24)]
    assert len(out.columns) == 25
    for _, r in out.iterrows():
        assert sum(int(r[c]) for c in hcols) == int(totals[r["event_type"]])
    # spot-check one (type, hour) cell
    hr = (ev["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000) % 24
    et0 = out["event_type"].iloc[0]
    assert int(out.set_index("event_type").loc[et0, "h05"]) == int(((ev["event_type"] == et0) & (hr == 5)).sum())


def test_mad_robust_stats_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.01"
    out = stats.mad_robust_stats(sf).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"]).to_pandas()
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy()
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        assert abs(out.loc[et, "median"] - med) < 1e-5
        assert abs(out.loc[et, "mad"] - mad) < 1e-5
        assert out.loc[et, "n"] == len(v)


def test_vocab_coverage_curve_monotone(ray_session):
    from plasmap_ray.pipelines import text as tp

    out = tp.vocab_coverage_curve("/root/testdata/sf0.01").to_pandas().sort_values("k")
    assert list(out["k"]) == [16, 64, 256, 1024, 4096]
    assert (np.diff(out["coverage"]) >= 0).all()
    assert ((out["coverage"] > 0) & (out["coverage"] <= 1)).all()
    assert (out["covered"] <= out["total"]).all()
    # the Zipf head must dominate: top-4096 covers (almost) everything
    assert out["coverage"].iloc[-1] > 0.9


def test_value_concentration_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.01"
    out = stats.value_concentration(sf).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "user_id", "value"]).to_pandas()
    ev["cents"] = np.copysign(np.floor(np.abs(ev["value"] * 100.0) + 0.5), ev["value"]).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        per = g.groupby("user_id")["cents"].sum().reset_index()
        per = per.sort_values(["cents", "user_id"], ascending=[False, True])
        n = len(per)
        k = (n + 9) // 10
        row = out.loc[et]
        assert row["n_users"] == n and row["top_k"] == k
        assert row["top_cents"] == int(per["cents"].iloc[:k].sum())
        assert row["total_cents"] == int(per["cents"].sum())
        assert abs(row["top_share"] - row["top_cents"] / row["total_cents"]) < 1e-6
        # concentration must exceed the uniform share
        assert row["top_share"] > k / n


def test_rrf_fusion_ranks(ray_session):
    """RRF fuses the two k-bounded rankings: every fused doc comes from
    at least one input list, scores are the exact reciprocal-rank sums,
    and the head of the fusion agrees with a doc ranked well by BOTH."""
    from plasmap_ray.pipelines import index

    sf = "/root/testdata/sf0.001"
    r1 = index.search_ranked(sf, tokens=("spark", "data"), k=20).to_pandas()
    r2 = index.search_bm25(sf, tokens=("spark", "data"), k=20).to_pandas()
    fused = index.rrf_fusion(sf, tokens=("spark", "data"), k=20).to_pandas()
    rank1 = dict(zip(r1["doc_id"], r1["search_rank"]))
    rank2 = dict(zip(r2["doc_id"], r2["bm25_rank"]))
    assert set(fused["doc_id"]) == set(rank1) | set(rank2)
    for r in fused.itertuples():
        want = (1.0 / (60 + rank1[r.doc_id]) if r.doc_id in rank1 else 0.0) + (
            1.0 / (60 + rank2[r.doc_id]) if r.doc_id in rank2 else 0.0
        )
        assert abs(r.rrf_score - round(want, 6)) <= 1e-12
        assert r.r_tfidf == rank1.get(r.doc_id, 0)
        assert r.r_bm25 == rank2.get(r.doc_id, 0)
    # fusion_rank is 1..n in (rrf desc, doc_id) order
    assert list(fused["fusion_rank"]) == list(range(1, len(fused) + 1))
    s = fused.sort_values(["rrf_score", "doc_id"], ascending=[False, True])
    assert list(s["doc_id"]) == list(fused["doc_id"])


def test_rbo_rankings_properties(ray_session):
    """RBO in [0,1]; identical rankings give RBO == truncated-weight
    total; engine overlaps equal a set recompute of its own inputs."""
    import numpy as np

    from plasmap_ray.pipelines import index

    sf = "/root/testdata/sf0.001"
    out = index.rbo_rankings(sf).to_pandas().sort_values("depth").reset_index(drop=True)
    k = len(out)
    a = index.search_ranked(sf, k=k).to_pandas().sort_values("search_rank")["doc_id"].to_numpy()
    b = index.search_bm25(sf, k=k).to_pandas().sort_values("bm25_rank")["doc_id"].to_numpy()
    for _, r in out.iterrows():
        d = int(r["depth"])
        assert r["overlap"] == len(set(a[:d]) & set(b[:d]))
    rbo = out["rbo"].iloc[0]
    p = index.RBO_P
    max_rbo = (1 - p) * sum(p ** (d - 1) for d in range(1, k + 1))
    assert 0.0 <= rbo <= max_rbo + 1e-9
    # self-RBO sanity: overlap == depth everywhere would hit max_rbo
    if (out["overlap"].to_numpy() == out["depth"].to_numpy()).all():
        assert abs(rbo - max_rbo) < 1e-4


def test_ndcg_eval_bounds_and_perfect_ranking(ray_session):
    """NDCG in [0, 1]; a ranking equal to the ideal scores exactly 1."""
    from plasmap_ray.pipelines import index as I

    out = I.ndcg_eval("/root/testdata/sf0.001").to_pandas()
    assert set(out["retriever"]) == {"tfidf", "bm25"}
    assert ((out["ndcg"] >= 0) & (out["ndcg"] <= 1.0)).all()
    assert (out["dcg"] <= out["idcg"]).all()
    assert (out["n_rel_docs"] > 0).all()
