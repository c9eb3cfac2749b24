"""Round-2 operator tests: exact block-pair embedding near-dup, the
banded hyperplane-LSH scale path (recall on a planted-near-dup corpus),
TF-IDF ranked search, deterministic sampling, KMV AggregateFn fold, and
exact polygon containment."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from plasmap_ray import fixtures, geometry
from plasmap_ray.pipelines import ann, index, windows

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


def _brute_pairs(path: str, threshold: float) -> dict[tuple[int, int], float]:
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    mn = m / np.where(norms == 0, 1.0, norms)[:, None]
    sims = mn @ mn.T
    ai, bj = np.triu_indices(len(ids), k=1)
    keep = sims[ai, bj] >= threshold
    return {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b]))): float(sims[a, b])
        for a, b in zip(ai[keep], bj[keep])
    }


def test_block_pair_join_matches_brute(ray_session):
    """The distributed block-pair self-join emits EXACTLY the brute-force
    pair set (each unordered pair met in exactly one block-pair group)."""
    want = _brute_pairs(f"{SF0001}/embeddings.parquet", 0.40)
    got = ann.embedding_near_dup(SF0001, threshold=0.40).to_pandas()
    got_pairs = {(int(r.vec_a), int(r.vec_b)) for r in got.itertuples()}
    assert got_pairs == set(want)
    # sims match to the rounding applied in the final projection
    for r in got.itertuples():
        assert abs(r.sim - want[(int(r.vec_a), int(r.vec_b))]) < 1e-6


def test_lsh_pair_join_recall_and_precision(ray_session):
    """Scale path on the planted-near-dup corpus: precision is exact
    (every emitted pair is cosine-verified) and recall at the 0.9
    threshold is high (banded hyperplane LSH, 16 bands x 8 planes)."""
    path = fixtures.embeddings_parquet_path()
    want = _brute_pairs(path, 0.9)
    assert len(want) >= 30  # the corpus really plants near-dups
    got = ann.embedding_near_dup_lsh(path, threshold=0.9).to_pandas()
    got_pairs = {(int(r.vec_a), int(r.vec_b)) for r in got.itertuples()}
    assert got_pairs <= set(want)  # exact precision
    recall = len(got_pairs) / len(want)
    assert recall >= 0.95, f"LSH recall {recall:.3f}"


def test_ivf_topk_recall(ray_session):
    """IVF coarse-quantizer ANN: recall vs the exact top-k rises with
    nprobe (weakly clustered corpus -> partial recall by design)."""
    exact = set(ann.ann_topk(SF001, k=10, vec_id=1).to_pandas()["vec_id"])
    r4 = len(exact & set(ann.ivf_topk(SF001, k=10, vec_id=1, nprobe=4).to_pandas()["vec_id"])) / 10
    r8 = len(exact & set(ann.ivf_topk(SF001, k=10, vec_id=1, nprobe=8).to_pandas()["vec_id"])) / 10
    assert r4 >= 0.4
    assert r8 >= r4
    assert r8 >= 0.7


def test_search_ranked_scores(ray_session):
    """TF-IDF ranking: ranks are 1..k, scores non-increasing, and the
    top hit's score equals a locally recomputed tf*idf."""
    df = index.search_ranked(SF001, tokens=("spark", "data"), k=20).to_pandas()
    assert list(df["search_rank"]) == list(range(1, len(df) + 1))
    assert (np.diff(df["score"]) <= 1e-12).all()
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lower(text) AS t FROM read_parquet('{SF001}/documents.parquet')"
    ).fetchdf()
    toks = docs["t"].str.split(" ")
    tf_spark = toks.map(lambda ts: ts.count("spark"))
    tf_data = toks.map(lambda ts: ts.count("data"))
    n = len(docs)
    idf_s = np.log(n / (tf_spark > 0).sum())
    idf_d = np.log(n / (tf_data > 0).sum())
    score = tf_spark * idf_s + tf_data * idf_d
    top_doc = int(df.iloc[0]["doc_id"])
    local = float(score[docs["doc_id"] == top_doc].iloc[0])
    assert abs(df.iloc[0]["score"] - round(local, 6)) < 1e-9


def test_sampled_event_stats_deterministic(ray_session):
    a = windows.sampled_event_stats(SF0001).to_pandas().sort_values("event_type").reset_index(drop=True)
    b = windows.sampled_event_stats(SF0001).to_pandas().sort_values("event_type").reset_index(drop=True)
    assert a.equals(b)
    total = a["n_sampled"].sum()
    assert 0.1 < total / 1000 < 0.3  # ~frac of the sf0.001 events table


def test_kmv_aggregate_fold(ray_session):
    """AggregateFn-folded KMV: exact below saturation, bounded error
    above (no driver-side per-batch collection)."""
    from plasmap_ray.stages.sketch import distinct_count_approx

    ids = pa.table({"v": pa.array(np.arange(10_000, dtype=np.int64) % 3000)})
    ds = rd.from_arrow(ids)
    exact_regime = distinct_count_approx(ds, "v", k=4096)
    assert exact_regime == 3000.0
    approx = distinct_count_approx(ds, "v", k=256)
    assert abs(approx - 3000) / 3000 < 0.15


def test_polygon_within_concave_outer():
    """The case bbox/vertex-only containment gets wrong: a U-shaped
    (concave) outer whose bbox contains a square sitting in the notch."""
    outer = np.array(
        [[0, 0], [10, 0], [10, 10], [7, 10], [7, 3], [3, 3], [3, 10], [0, 10]], dtype=float
    )
    notch_square = np.array([[4, 6], [6, 6], [6, 8], [4, 8]], dtype=float)  # inside bbox, in the notch
    left_arm = np.array([[0.5, 4], [2.5, 4], [2.5, 9], [0.5, 9]], dtype=float)  # genuinely inside
    straddler = np.array([[2, 5], [5, 5], [5, 7], [2, 7]], dtype=float)  # crosses the notch wall
    assert not geometry.polygon_within(notch_square, outer)
    assert geometry.polygon_within(left_arm, outer)
    assert not geometry.polygon_within(straddler, outer)
    # bbox containment would claim all three
    env = geometry.envelope(outer)
    for ring in (notch_square, left_arm, straddler):
        e = geometry.envelope(ring)
        assert e[0] >= env[0] and e[1] >= env[1] and e[2] <= env[2] and e[3] <= env[3]


def test_polygon_within_shared_edges_and_holes():
    outer = np.array([[0, 0], [6, 0], [6, 6], [0, 6]], dtype=float)
    shared_edge = np.array([[0, 0], [3, 0], [3, 3], [0, 3]], dtype=float)  # touches boundary
    assert geometry.polygon_within(shared_edge, outer)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4]], dtype=float)
    in_hole = np.array([[2.5, 2.5], [3.5, 2.5], [3.5, 3.5], [2.5, 3.5]], dtype=float)
    beside_hole = np.array([[4.5, 0.5], [5.5, 0.5], [5.5, 5.5], [4.5, 5.5]], dtype=float)
    assert not geometry.polygon_within(in_hole, outer, outer_holes=[hole])
    assert geometry.polygon_within(beside_hole, outer, outer_holes=[hole])
    around_hole = np.array([[1, 1], [5, 1], [5, 5], [1, 5]], dtype=float)  # hole inside inner
    assert not geometry.polygon_within(around_hole, outer, outer_holes=[hole])
    # ...unless the inner polygon's OWN hole covers the outer's hole:
    # the punched-out area was never inner area, so containment holds
    big_own_hole = np.array([[1.5, 1.5], [4.5, 1.5], [4.5, 4.5], [1.5, 4.5]], dtype=float)
    assert geometry.polygon_within(around_hole, outer, inner_holes=[big_own_hole], outer_holes=[hole])
    small_own_hole = np.array([[2.2, 2.2], [3.0, 2.2], [3.0, 3.0], [2.2, 3.0]], dtype=float)
    assert not geometry.polygon_within(around_hole, outer, inner_holes=[small_own_hole], outer_holes=[hole])


def test_late_event_stats_gapped_sparse_ids(ray_session, tmp_path):
    """Watermark prefix chain must survive EMPTY partitions (gapped /
    offset arrival-id spaces), matching the SQL windowed-MAX semantics."""
    import duckdb
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    # sparse, offset, gapped ids: two far-apart clusters
    ids = np.concatenate([np.arange(5_000_000, 5_000_400), np.arange(9_000_000, 9_000_600)])
    base_ts = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = base_ts + rng.integers(0, 7 * 24 * 3600, size=len(ids)) * 1_000_000
    t = pa.table(
        {
            "event_id": pa.array(ids, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["click", "view"] * (len(ids) // 2), type=pa.string()),
        }
    )
    p = str(tmp_path / "events.parquet")
    pq.write_table(t, p)
    got = (
        windows.late_event_stats(str(tmp_path), lag_min=60)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            f"""
WITH w AS (
  SELECT event_type, ts,
         max(ts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM read_parquet('{p}'))
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN wm IS NOT NULL AND ts < wm - INTERVAL 60 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY event_type ORDER BY event_type"""
        )
        .fetchdf()
    )
    assert list(got["n_events"]) == list(want["n_events"])
    assert list(got["n_late"]) == list(want["n_late"])
    assert got["n_late"].sum() > 0  # the scenario actually has late events


def test_kmeans_fixed_point_merge_order_independent():
    """The determinism keystone: int64 fixed-point partials sum to the
    same totals under ANY merge order, so distributed centroids match
    the sequential golden bit-for-bit."""
    import numpy as np

    from plasmap_ray.pipelines import ann

    rng = np.random.default_rng(1)
    m = rng.standard_normal((300, 8))
    q = np.rint(m * ann.KMEANS_SCALE).astype(np.int64)
    assign = rng.integers(0, 4, 300)
    # sequential
    seq = np.zeros((4, 9), dtype=np.int64)
    seq[:, 0] = np.bincount(assign, minlength=4)
    np.add.at(seq[:, 1:], assign, q)
    # three shards merged in both orders
    shards = []
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        s = np.zeros((4, 9), dtype=np.int64)
        s[:, 0] = np.bincount(assign[lo:hi], minlength=4)
        np.add.at(s[:, 1:], assign[lo:hi], q[lo:hi])
        shards.append(s)
    np.testing.assert_array_equal(seq, shards[0] + (shards[1] + shards[2]))
    np.testing.assert_array_equal(seq, (shards[2] + shards[0]) + shards[1])


def test_kmeans_partitions_and_improves(ray_session):
    """Distributed k-means: every vector gets exactly one cluster, all
    k clusters are used on the fixture corpus, and more Lloyd
    iterations never worsen the quantization objective."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    got = ann.kmeans_embeddings(sf, k=4, iters=3).to_pandas()
    t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
    assert sorted(got["vec_id"]) == sorted(t["vec_id"].to_numpy().tolist())
    assert set(got["cluster"]) == set(range(4))

    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    ids = t["vec_id"].to_numpy()

    def objective(assign_df, iters):
        # recompute final centroids as the mean of members, then sum of
        # squared distances (the Lloyd objective)
        a = assign_df.set_index("vec_id")["cluster"].reindex(ids).to_numpy()
        obj = 0.0
        for c in range(4):
            sel = m[a == c]
            if len(sel):
                obj += ((sel - sel.mean(axis=0)) ** 2).sum()
        return obj

    few = ann.kmeans_embeddings(sf, k=4, iters=1).to_pandas()
    assert objective(got, 3) <= objective(few, 1) + 1e-9


def test_zone_embedding_centroid_batch_invariant(ray_session):
    """Centroids are bit-identical under different batch splits (the
    fixed-point order-free sum contract) and match a direct recompute."""
    import pyarrow.parquet as pq

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines.ann import CENTROID_FP, zone_embedding_centroid

    sf = "/root/testdata/sf0.01"
    out = zone_embedding_centroid(sf).to_pandas().sort_values(["rel_id", "dim"]).reset_index(drop=True)
    t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False), np.float64).reshape(len(ids), -1)
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    best = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    for r in fixtures.admin_rects():
        inside = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        best = np.minimum(best, np.where(inside, np.int64(r["rel_id"]), best))
    zone = np.where(best == np.iinfo(np.int64).max, -1, best)
    fpv = np.floor(m * CENTROID_FP + 0.5).astype(np.int64)
    rows = []
    for z in np.unique(zone):
        sel = zone == z
        s = fpv[sel].sum(axis=0)
        n = int(sel.sum())
        for d in range(m.shape[1]):
            rows.append((int(z), d, n, np.round(s[d] / CENTROID_FP / n, 6)))
    import pandas as pd
    exp = pd.DataFrame(rows, columns=["rel_id", "dim", "n_vecs", "mean"]).sort_values(["rel_id", "dim"]).reset_index(drop=True)
    assert (out["rel_id"] == exp["rel_id"]).all() and (out["n_vecs"] == exp["n_vecs"]).all()
    assert np.allclose(out["mean"], exp["mean"], atol=0, rtol=0)


def test_zone_embedding_dispersion_matches_bruteforce(ray_session):
    """Per-(zone, dim) variance matches an exact-moment recompute and is
    nonnegative; a zone with >= 2 distinct vectors has some variance."""
    import pyarrow.parquet as pq

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines.ann import CENTROID_FP, zone_embedding_dispersion

    sf = "/root/testdata/sf0.01"
    out = zone_embedding_dispersion(sf).to_pandas().sort_values(["rel_id", "dim"]).reset_index(drop=True)
    t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False), np.float64).reshape(len(ids), -1)
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    best = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    for r in fixtures.admin_rects():
        inside = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        best = np.minimum(best, np.where(inside, np.int64(r["rel_id"]), best))
    zone = np.where(best == np.iinfo(np.int64).max, -1, best)
    q = np.floor(m * CENTROID_FP + 0.5).astype(np.int64)
    fp2 = float(CENTROID_FP) * float(CENTROID_FP)
    got = {(int(r.rel_id), int(r.dim)): (int(r.n_vecs), r.var) for r in out.itertuples()}
    assert (out["var"] >= 0).all()
    saw_positive = False
    for z in np.unique(zone):
        sel = zone == z
        n = float(sel.sum())
        s = q[sel].sum(axis=0).astype(np.float64)
        sq = (q[sel] * q[sel]).sum(axis=0).astype(np.float64)
        var = np.round((n * sq - s * s) / (n * n * fp2), 6)
        for d in range(m.shape[1]):
            gn, gv = got[(int(z), d)]
            assert gn == int(n) and gv == var[d]
            saw_positive = saw_positive or var[d] > 0
    assert saw_positive


def test_pq_encode_compresses_and_reconstructs(ray_session):
    """PQ codes are in range and beat the 1-centroid quantizer on
    reconstruction error (the codebooks actually learned something)."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    out = ann.pq_encode(sf).to_pandas()
    for j in range(ann.PQ_M):
        assert out[f"code_{j}"].between(0, ann.PQ_KSUB - 1).all()
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    trivial_sse = ((mat - mat.mean(axis=0)) ** 2).sum(axis=1)
    assert out["recon_fp"].sum() / 1e9 < trivial_sse.sum()
    assert (out["recon_fp"] >= 0).all()


def test_embedding_label_outliers_planted(ray_session, tmp_path):
    """A vector planted far from its label's cluster ranks as the #1
    outlier for that label."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 0.05, size=(40, 8)).astype(np.float32)
    labels = np.array([0] * 20 + [1] * 20, dtype=np.int32)
    vecs[:20] += 1.0   # label-0 cluster center
    vecs[20:] -= 1.0   # label-1 cluster center
    vecs[5] = -1.0     # planted mislabel: label 0, sitting in cluster 1
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(40), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    out = ann.embedding_label_outliers(str(tmp_path)).to_pandas()
    top0 = out[(out["label"] == 0) & (out["outlier_rank"] == 1)]
    assert list(top0["vec_id"]) == [5]


def test_zone_label_purity_shares(ray_session):
    """Purity is a valid share and top_n is the modal count."""
    from plasmap_ray.pipelines import ann

    out = ann.zone_label_purity("/root/testdata/sf0.001").to_pandas()
    assert (out["purity"] > 0).all() and (out["purity"] <= 1).all()
    assert (out["top_n"] <= out["n_vecs"]).all()


def test_knn_classify_separated_clusters(ray_session, tmp_path):
    """Well-separated clusters classify perfectly; a planted mislabel
    lowers only its own label's accuracy."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 0.05, size=(60, 8)).astype(np.float32)
    labels = np.array([0] * 30 + [1] * 30, dtype=np.int32)
    vecs[:30] += 1.0
    vecs[30:] -= 1.0
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(60), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    out = ann.knn_classify(str(tmp_path)).to_pandas().set_index("label")
    assert out.loc[0, "accuracy"] == 1.0 and out.loc[1, "accuracy"] == 1.0


def test_knn_pr_curve_consistency(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.knn_pr_curve(SF001, k=5).to_pandas()
    # 5 thresholds per label; monotone counts: tp and fp fall (weakly)
    # as the threshold rises, fn rises
    for lb, g in out.groupby("label"):
        g = g.sort_values("threshold")
        assert list(g["threshold"]) == [1, 2, 3, 4, 5]
        assert (np.diff(g["tp"]) <= 0).all()
        assert (np.diff(g["fp"]) <= 0).all()
        assert (np.diff(g["fn"]) >= 0).all()
        # tp + fn = class support, constant across thresholds
        assert g["tp"].to_numpy()[0] + g["fn"].to_numpy()[0] == g["tp"].to_numpy()[-1] + g["fn"].to_numpy()[-1]
    # threshold=3 majority vote: accuracy-like agreement with knn_classify
    cls = ann.knn_classify(SF001, k=5).to_pandas()
    assert set(out["label"]) == set(cls["label"])
    assert ((out["precision"] >= 0) & (out["precision"] <= 1)).all()
    assert ((out["recall"] >= 0) & (out["recall"] <= 1)).all()


def test_dedup_survivorship_matches_bruteforce(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import dedup

    out = dedup.dedup_survivorship(SF001).to_pandas()
    t = pq.read_table(f"{SF001}/documents.parquet", columns=["doc_id", "text", "n_chars"]).to_pandas()
    t["text_md5"] = [hashlib.md5(s.encode()).hexdigest() for s in t["text"]]
    expected = {}
    for h, g in t.groupby("text_md5"):
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        expected[h] = (len(g), int(g.iloc[0]["doc_id"]), int(g.iloc[0]["n_chars"]))
    got = {
        r["text_md5"]: (int(r["n_copies"]), int(r["survivor_doc_id"]), int(r["survivor_n_chars"]))
        for _, r in out.iterrows()
    }
    assert got == expected

    # planted-dup corpus: clusters of 3 copies, longest (then smallest
    # id) must survive
    import os
    import tempfile

    import pyarrow as pa

    with tempfile.TemporaryDirectory() as td:
        texts = [f"doc body {i % 10}" + " pad" * (i % 3) for i in range(30)]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(30), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(td, "documents.parquet"))
        out2 = dedup.dedup_survivorship(td).to_pandas()
        assert out2["n_copies"].sum() == 30
        # every (i % 10, i % 3) pair appears exactly once -> 30 distinct
        # texts? no: texts repeat when both i%10 and i%3 repeat (lcm 30)
        t2 = tbl.to_pandas()
        t2["text_md5"] = [hashlib.md5(s.encode()).hexdigest() for s in t2["text"]]
        exp2 = {}
        for h, g in t2.groupby("text_md5"):
            g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            exp2[h] = (len(g), int(g.iloc[0]["doc_id"]), int(g.iloc[0]["n_chars"]))
        got2 = {
            r["text_md5"]: (int(r["n_copies"]), int(r["survivor_doc_id"]), int(r["survivor_n_chars"]))
            for _, r in out2.iterrows()
        }
        assert got2 == exp2


def test_lsh_blocking_eval_sane(ray_session):
    from plasmap_ray.pipelines import dedup

    out = dedup.lsh_blocking_eval(SF001).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_caught"] <= r["n_true_pairs"]
    assert r["n_caught"] <= r["n_candidate_pairs"]
    assert 0.0 <= r["completeness"] <= 1.0
    # banded LSH with 8x8 bands catches >=99% of 0.8-Jaccard pairs in
    # expectation; the planted near-dup corpus must be found
    assert r["n_true_pairs"] > 0
    assert r["completeness"] >= 0.9
    # blocking must prune almost the whole quadratic space
    assert r["reduction_ratio"] > 0.99


def test_dedup_manifest_consistency(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import dedup

    out = dedup.dedup_manifest(SF001).to_pandas()
    docs = pq.read_table(f"{SF001}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    assert len(out) == len(docs)
    # cluster representative is kept, everything else dropped
    assert (out["keep"] == (out["doc_id"] == out["cluster_id"])).all()
    # cluster ids are cluster minima
    mins = out.groupby("cluster_id")["doc_id"].min()
    assert (mins.index == mins.values).all()
    # exact dups always share a cluster
    docs["md5"] = [hashlib.md5(s.encode()).hexdigest() for s in docs["text"]]
    cl = out.set_index("doc_id")["cluster_id"]
    for _, g in docs.groupby("md5"):
        if len(g) > 1:
            assert cl[g["doc_id"]].nunique() == 1
    # near-dup pairs always share a cluster
    near = dedup.minhash_near_dup(SF001).to_pandas()
    assert (cl[near["doc_a"]].to_numpy() == cl[near["doc_b"]].to_numpy()).all()
    # and some drops actually happen
    assert (~out["keep"]).sum() > 0


def test_simplified_silhouette_bounds_and_consistency(ray_session):
    sf = "/root/testdata/sf0.001"
    df = ann.simplified_silhouette(sf).to_pandas()
    # silhouette is bounded in [-1, 1]; clusters sorted and distinct
    assert (df["mean_silhouette"] >= -1.0).all() and (df["mean_silhouette"] <= 1.0).all()
    assert df["cluster"].is_monotonic_increasing and df["cluster"].is_unique
    # member counts agree with the kmeans assignment
    sizes = ann.kmeans_embeddings(sf).to_pandas().groupby("cluster").size()
    got = dict(zip(df["cluster"], df["n_vecs"]))
    assert got == sizes.to_dict()
    assert df["n_vecs"].sum() == sizes.sum()
    # a well-separated synthetic check: the overall mean is positive on
    # the fixture corpus (clusters exist by construction)
    w = (df["mean_silhouette"] * df["n_vecs"]).sum() / df["n_vecs"].sum()
    assert w > 0.0


def test_sq8_quantization_error_bound(ray_session):
    sf = "/root/testdata/sf0.001"
    df = ann.sq8_quantization_error(sf).to_pandas()
    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    d = len(emb["embedding"][0].as_py())
    assert list(df["dim_idx"]) == list(range(d))
    # quantization error is bounded by half a level everywhere in-range
    half = df["scale"].to_numpy() / 2.0
    assert (df["max_abs_err"].to_numpy() <= half + 1e-9).all()
    assert (df["mse"].to_numpy() <= half**2 + 1e-9).all()
    assert (df["mse"] >= 0).all() and (df["scale"] >= 0).all()
    assert (df["max_v"] >= df["min_v"]).all()


def test_ivfpq_topk_recall_vs_exact(ray_session):
    sf = "/root/testdata/sf0.001"
    approx = ann.ivfpq_topk(sf, k=10, vec_id=1).to_pandas()
    exact = ann.ann_topk(sf, k=10, vec_id=1).to_pandas()
    assert list(approx.columns) == ["sim_rank", "vec_id"]
    assert list(approx["sim_rank"]) == list(range(1, len(approx) + 1))
    # recall@10 of the composite index against brute-force cosine
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / len(exact)
    assert recall >= 0.5  # coarse-probe + 16-bit codes + exact re-rank
    # the top-1 survives quantization on this corpus
    assert exact["vec_id"].iloc[0] in set(approx["vec_id"])


def _brute_shingle_jaccard(sf: str, threshold: float):
    """Brute-force word-3-gram Jaccard pairs, independent of the engine."""
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    sets = {}
    for did, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = txt.lower().split(" ")
        if len(w) < 3:
            continue
        sets[did] = {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if jac >= threshold:
                out[(a, b)] = round(jac, 6)
    return out


def test_set_similarity_join_complete_and_exact(ray_session):
    """PPJoin prefix filtering is COMPLETE: the engine emits exactly the
    brute-force pair set (no LSH recall loss), with exact Jaccard."""
    from plasmap_ray.pipelines import dedup

    sf = "/root/testdata/sf0.001"
    want = _brute_shingle_jaccard(sf, dedup.SETSIM_THRESHOLD)
    assert len(want) >= 10  # the corpus really contains near-dups
    got = dedup.set_similarity_join(sf).to_pandas()
    got_pairs = {(int(r.doc_a), int(r.doc_b)): float(r.jaccard) for r in got.itertuples()}
    assert got_pairs == want


def test_set_similarity_prefix_is_shorter_than_set(ray_session):
    """The prefix-length formula prunes (p < n) for all n past the
    trivial sizes, and never prunes below one shingle."""
    import numpy as np

    from plasmap_ray.pipelines import dedup

    t = dedup.SETSIM_THRESHOLD
    for n in range(1, 200):
        p = n - int(np.ceil(t * n - 1e-9)) + 1
        assert 1 <= p <= n
        if n >= 3:
            assert p < n  # real pruning


def test_knn_graph_reciprocity_bruteforce(ray_session):
    """Edges and reciprocal counts equal a dense numpy recompute."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    out = ann.knn_graph_reciprocity(sf).to_pandas().set_index("label")
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    lab = t["label"].to_numpy().astype(np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    k = ann.KNN_GRAPH_K
    eset = set()
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))
        order = order[ids[order] != ids[i]][:k]
        for j in order:
            eset.add((ids[i], ids[j]))
    per = {}
    for s, d in eset:
        li = lab[np.searchsorted(ids, s)] if ids[np.searchsorted(ids, s)] == s else None
        row = per.setdefault(int(li), [0, 0])
        row[0] += 1
        row[1] += (d, s) in eset
    for l, (ne, nr) in per.items():
        assert out.loc[l, "n_edges"] == ne
        assert out.loc[l, "n_reciprocal"] == nr
    assert out["n_edges"].sum() == len(eset)
    assert (out["reciprocity"] <= 1.0).all() and (out["reciprocity"] > 0.0).all()


def test_levenshtein_rows_known_strings():
    from plasmap_ray.pipelines.dedup import levenshtein_rows

    assert levenshtein_rows("kitten", "sitting") == 3
    assert levenshtein_rows("", "abc") == 3
    assert levenshtein_rows("abc", "") == 3
    assert levenshtein_rows("same", "same") == 0
    assert levenshtein_rows("flaw", "lawn") == 2
    assert levenshtein_rows("a" * 100, "a" * 99 + "b") == 1
    # cross-check vs classic full-matrix DP on random-ish pairs
    import numpy as np

    rng = np.random.default_rng(11)
    alpha = "abcdef "
    for _ in range(25):
        a = "".join(rng.choice(list(alpha), size=rng.integers(0, 40)))
        b = "".join(rng.choice(list(alpha), size=rng.integers(0, 40)))
        n, m = len(a), len(b)
        dp = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            dp[i][0] = i
        for j in range(m + 1):
            dp[0][j] = j
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i][j] = min(
                    dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + (a[i - 1] != b[j - 1])
                )
        assert levenshtein_rows(a, b) == dp[n][m], (a, b)


def test_edit_distance_verify_finds_planted_dups(ray_session):
    from plasmap_ray.pipelines import dedup as dd

    out = dd.edit_distance_verify("/root/testdata/sf0.001").to_pandas()
    # planted near-dups must survive the exact character-level verify
    assert len(out) > 0
    assert (out["sim"] >= 0.8 - 1e-9).all()
    assert (out["lev_dist"] * dd.LEV_SIM_DEN <= out["max_len"]).all()
    assert (out["doc_a"] < out["doc_b"]).all()


def test_jl_projection_audit_unbiased_and_exact(ray_session):
    """Pair distances reconcile with a dense recompute; the mean ratio
    is near 1 (JL unbiasedness) and the sign matrix is balanced."""
    out = ann.jl_projection_audit(SF0001).to_pandas().sort_values("vec_a").reset_index(drop=True)
    assert len(out) > 0
    t = pq.read_table(SF0001 + "/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    q = {
        int(r.vec_id): np.floor(np.asarray(r.embedding, dtype=np.float64) * ann.JL_FP + 0.5).astype(np.int64)
        for r in t.itertuples()
    }
    for r in out.head(20).itertuples():
        d2o = int(((q[r.vec_a] - q[r.vec_b]) ** 2).sum())
        assert d2o == r.d2_orig
    # unbiasedness: E[d2_proj] = K * d2_orig -> mean ratio near 1
    assert 0.5 < out["ratio"].mean() < 1.5
    # deterministic sign hash is roughly balanced over the K x d matrix
    d = len(next(iter(q.values())))
    S = ann._jl_sign(
        np.repeat(np.arange(ann.JL_K), d).reshape(ann.JL_K, d),
        np.tile(np.arange(d), ann.JL_K).reshape(ann.JL_K, d),
    )
    assert abs(int(S.sum())) < ann.JL_K * d // 3


def test_mutual_nn_pairs_bruteforce(ray_session):
    """Mutual pairs recomputed from the full cosine matrix."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann as ann_mod

    out = ann_mod.mutual_nn_pairs(SF0001).to_pandas()
    t = pq.read_table(ann_mod._emb_path(SF0001))
    ids = t["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[order]).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.floor((m @ m.T) * 1e12 + 0.5)  # engine's fixed-point grid
    np.fill_diagonal(sims, -np.inf)
    nn = ids[np.argmax(sims, axis=1)]
    nn_of = dict(zip(ids.tolist(), nn.tolist()))
    want = sorted(
        (int(a), int(nn_of[a]))
        for a in ids.tolist()
        if nn_of[nn_of[a]] == a and a < nn_of[a]
    )
    got = sorted(zip(out["vec_a"].tolist(), out["vec_b"].tolist()))
    assert got == want
    assert len(got) > 0  # the planted duplicates guarantee mutual pairs
