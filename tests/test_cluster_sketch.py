"""Tests for the dedup last-mile operators: connected components /
cluster assignment, deterministic bloom dedup (ST3 parity), the
mergeable Space-Saving heavy-hitter sketch, and batched multi-query
ANN."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from plasmap_ray import golden
from plasmap_ray.pipelines import ann, cluster

SF0001 = "/root/testdata/sf0.001"


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(ray_session):
    # a long path (forces several propagation rounds), a clique, a pair
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    edges += [(20, 21), (20, 22), (21, 22)]
    edges += [(30, 31)]
    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
            "doc_b": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )
    got = {
        int(r["node"]): int(r["label"])
        for r in cluster.connected_components(rd.from_arrow(t), num_partitions=2).take_all()
    }
    assert got == _union_find(edges)


def test_connected_components_empty_edges(ray_session):
    empty = pa.table(
        {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
    )
    out = cluster.connected_components(rd.from_arrow(empty))
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "label"}


def test_near_dup_clusters_no_pairs(ray_session, tmp_path):
    # a corpus with pairwise-distinct texts -> every doc is a singleton
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    "alpha bravo charlie delta echo foxtrot",
                    "golf hotel india juliet kilo lima",
                    "mike november oscar papa quebec romeo",
                    "sierra tango uniform victor whiskey xray",
                ]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = cluster.near_dup_clusters(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert (df["cluster_id"].to_numpy() == df["doc_id"].to_numpy()).all()
    assert df["keep"].all()


def test_near_dup_clusters_invariants(ray_session):
    df = cluster.near_dup_clusters(SF0001).to_pandas()
    docs = pq.read_table(f"{SF0001}/documents.parquet", columns=["doc_id"])
    assert len(df) == docs.num_rows  # every doc assigned, incl. singletons
    # survivor = cluster min; one survivor per cluster
    mins = df.groupby("cluster_id")["doc_id"].min().sort_index()
    survivors = df[df.keep].set_index("cluster_id")["doc_id"].sort_index()
    assert mins.index.equals(survivors.index)
    assert (mins.to_numpy() == survivors.to_numpy()).all()
    assert df.keep.sum() == df.cluster_id.nunique()
    # matches the union-find golden recompute
    exp = pq.read_table(golden.near_dup_clusters_path(SF0001)).to_pandas()
    got = df.sort_values("doc_id").reset_index(drop=True)
    assert (got["cluster_id"].to_numpy() == exp["cluster_id"].to_numpy()).all()


def test_bloom_dedup_deterministic_and_first_wins(ray_session):
    df = cluster.bloom_dedup(SF0001, 1000, 0.01, 8).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # a key's FIRST occurrence is either kept, or dropped by a bloom
    # false positive — and then it MUST be flagged false_drop (that is
    # the column's contract; "all firsts kept" would only hold when the
    # fixture happens to produce zero false positives)
    firsts = df.groupby("dup_key")["doc_id"].min()
    first_rows = df[df.doc_id.isin(set(firsts))]
    assert (first_rows.kept | first_rows.false_drop).all()
    # exact later-duplicates are dropped with false_drop == False
    later_dups = df.merge(firsts.rename("first_id"), on="dup_key")
    later_dups = later_dups[later_dups.doc_id != later_dups.first_id]
    assert (~later_dups.kept).all()
    assert (~later_dups.false_drop).all()
    # matches the pure-Python golden recompute bit-for-bit
    exp = pq.read_table(golden.bloom_dedup_path(SF0001, 1000, 0.01, 8)).to_pandas()
    for c in ["doc_id", "dup_key", "kept", "false_drop"]:
        assert (df[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_space_saving_exact_under_capacity():
    from plasmap_ray.stages.sketch import SpaceSaving

    rng = np.random.default_rng(3)
    stream = rng.choice([f"t{i}" for i in range(50)], p=np.linspace(1, 5, 50) / np.linspace(1, 5, 50).sum(), size=5000)
    truth = collections.Counter(stream)
    # sharded accumulate + tree merge, capacity > vocabulary -> exact
    parts = [SpaceSaving(64) for _ in range(7)]
    for i, tok in enumerate(stream):
        parts[i % 7].offer(str(tok), 1)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    top = merged.top(10)
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(t, c) for t, c, e in top] == want
    assert all(e == 0 for _, _, e in top)


def test_space_saving_error_bound_under_eviction():
    from plasmap_ray.stages.sketch import SpaceSaving

    rng = np.random.default_rng(11)
    stream = ["hot"] * 500 + [f"cold{i}" for i in rng.integers(0, 400, size=1500)]
    rng.shuffle(stream)
    sk = SpaceSaving(32)
    for tok in stream:
        sk.offer(tok, 1)
    truth = collections.Counter(stream)
    for tok, count, err in sk.top(5):
        assert count >= truth[tok] >= count - err  # classic SS bracket
    # the heavy key survives eviction pressure
    assert sk.top(1)[0][0] == "hot"


def test_space_saving_merge_bound_sound_after_eviction():
    """Merging a summary that evicted a key with one where that key is
    heavy must keep the [count-err, count] bracket valid (the naive
    merge loses the evicted mass and reports err=0 for a wrong count)."""
    from plasmap_ray.stages.sketch import SpaceSaving

    a = SpaceSaving(2)
    for tok in ["a", "a", "b", "b", "c", "c", "c"]:
        a.offer(tok, 1)  # 'a' or 'b' evicted once capacity 2 is hit
    b = SpaceSaving(2)
    for tok in ["a"] * 5 + ["d"]:
        b.offer(tok, 1)
    merged = a.merge(b)
    truth = {"a": 7, "b": 2, "c": 3, "d": 1}
    for key, count, err in [(k, merged.counts[k], merged.errs[k]) for k in merged.counts]:
        assert count >= truth[key] >= count - err, (key, count, err)
    # keys absent from the merged summary are bounded by the floor
    for key in set(truth) - set(merged.counts):
        assert truth[key] <= merged.absent_bound(), key


def test_ann_multi_topk_matches_brute(ray_session):
    vec_ids = (1, 2, 3)
    k = 5
    got = ann.ann_multi_topk(SF0001, k=k, vec_ids=vec_ids).to_pandas()
    t = pq.read_table(f"{SF0001}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    for qid in vec_ids:
        q = m[list(ids).index(qid)]
        sims = (m @ (q / np.linalg.norm(q))) / np.where(norms == 0, 1.0, norms)
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:k]
        want = ids[mask][order].tolist()
        sub = got[got.query_vec_id == qid].sort_values("sim_rank")
        assert sub["vec_id"].tolist() == want


def test_redact_pii_counts_and_redacts(ray_session, tmp_path):
    """The fixture corpus contains no PII-shaped spans (the oracle row
    is all-zero there), so exercise the kernel on planted emails/phones:
    counts, replacement, and post-redaction length must all agree."""
    from plasmap_ray.pipelines import text as text_pipe

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "contact alice@example.com or bob.smith+tag@mail.co.uk today",
                    "call +1 (555) 123-4567 or 030 1234 5678 now",
                    "clean text with no identifiers at all",
                ]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = text_pipe.redact_pii(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["n_emails"].tolist() == [2, 0, 0]
    assert df["n_phones"].tolist() == [0, 2, 0]
    # doc 3 untouched -> clean_len == original length
    assert df["clean_len"][2] == len(t["text"][2].as_py())
    # doc 1: both emails replaced by the 7-char token
    orig = t["text"][0].as_py()
    assert df["clean_len"][0] == len(orig) - len("alice@example.com") - len("bob.smith+tag@mail.co.uk") + 2 * len("<EMAIL>")


def test_value_quantiles_bin_refine_exact(ray_session, tmp_path):
    """The two-pass bin-refine quantile equals a full sort on a skewed
    corpus with heavy ties (including ties ACROSS bin boundaries)."""
    from plasmap_ray.pipelines import stats

    rng = np.random.default_rng(7)
    v = np.concatenate(
        [
            rng.exponential(5.0, 5000).round(1),  # heavy ties after rounding
            np.full(2000, 3.0),  # one massive tie run
            rng.uniform(0, 100, 3000).round(0),
        ]
    )
    t = pa.table({"event_type": pa.array(["x"] * len(v)), "value": pa.array(v, type=pa.float64()), "ts": pa.array(np.arange(len(v)))})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    qs = (0.1, 0.5, 0.9, 0.99)
    got = stats.value_quantiles(str(tmp_path), qs=qs, bins=64).to_pandas().sort_values("q")
    s = np.sort(v, kind="stable")
    import math

    want = [float(s[max(1, math.ceil(q * len(s))) - 1]) for q in qs]
    assert got["value"].tolist() == want


def test_value_quantiles_skips_nulls_and_nans(ray_session, tmp_path):
    """NULL/NaN values must be skipped exactly like quantile_disc does
    (they would otherwise poison min/max, the bin arithmetic, and the
    rank count)."""
    from plasmap_ray.pipelines import stats

    v = [1.0, 2.0, None, float("nan"), 3.0, 4.0, None]
    t = pa.table(
        {
            "event_type": pa.array(["x"] * len(v)),
            "value": pa.array(v, type=pa.float64()),
            "ts": pa.array(np.arange(len(v))),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = stats.value_quantiles(str(tmp_path), qs=(0.5, 1.0), bins=8).to_pandas().sort_values("q")
    # valid set is [1,2,3,4]: disc(0.5) = ceil(0.5*4)=2nd -> 2.0; disc(1.0) -> 4.0
    assert got["value"].tolist() == [2.0, 4.0]


# --- property-based suite (hypothesis) --------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    stream=st.lists(st.integers(0, 30), min_size=1, max_size=400),
    capacity=st.integers(2, 16),
    shards=st.integers(1, 5),
)
def test_space_saving_bracket_property(stream, capacity, shards):
    """For ANY stream, sharding, and capacity: every reported counter
    brackets its true count ([count-err, count]) and every absent key is
    bounded by absent_bound() — the mergeable-summary contract under
    arbitrary eviction/truncation interleavings."""
    from plasmap_ray.stages.sketch import SpaceSaving

    truth = collections.Counter(f"k{v}" for v in stream)
    parts = [SpaceSaving(capacity) for _ in range(shards)]
    for i, v in enumerate(stream):
        parts[i % shards].offer(f"k{v}", 1)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    for key, count in merged.counts.items():
        err = merged.errs[key]
        assert count >= truth[key] >= count - err, (key, count, err, truth[key])
    bound = merged.absent_bound()
    for key, n in truth.items():
        if key not in merged.counts:
            assert n <= bound, (key, n, bound)


def test_conversion_funnel_strict_ordering(ray_session, tmp_path):
    """Hand-crafted journeys pin the strict-after semantics: a click
    BEFORE the first view does not count, ties on ts fall back to
    event_id order, and stages cannot share the qualifying event."""
    import pandas as pd

    from plasmap_ray.pipelines import windows as w

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # u1: full funnel in order -> reaches 3
        (1, t0, 1, "view"), (1, t0 + pd.Timedelta("1min"), 2, "click"), (1, t0 + pd.Timedelta("2min"), 3, "purchase"),
        # u2: click before view -> only stage 1
        (2, t0, 10, "click"), (2, t0 + pd.Timedelta("1min"), 11, "view"),
        # u3: view and click at the SAME ts -> event_id breaks the tie (click after view)
        (3, t0, 20, "view"), (3, t0, 21, "click"),
        # u4: no view at all -> reaches 0
        (4, t0, 30, "purchase"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows]),
            "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([0.0] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = w.conversion_funnel(str(tmp_path)).to_pandas().sort_values("stage_idx")
    assert got["n_users"].tolist() == [3, 2, 1]  # view: u1,u2,u3; click: u1,u3; purchase: u1


def test_connected_components_long_path(ray_session):
    """Pointer jumping must resolve a diameter-9 path to one label in
    O(log d) rounds (would exceed CC_MAX_ITERS only if propagation
    were broken)."""
    import pyarrow as pa
    import ray.data as rd

    from plasmap_ray.pipelines import cluster as cl

    nodes = list(range(10, 20))
    pairs = rd.from_arrow(
        pa.table({"doc_a": nodes[:-1], "doc_b": nodes[1:]})
    )
    out = cl.connected_components(pairs).to_pandas()
    assert sorted(out["node"]) == nodes
    assert (out["label"] == 10).all()


def test_dbscan_matches_bruteforce(ray_session):
    """Engine DBSCAN at sf0.001 vs a direct O(N^2)+BFS recompute with
    the same deterministic border rule."""
    import duckdb  # noqa: F401  (parity with oracle harness env)
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import cluster as cl

    sf = "/root/testdata/sf0.001"
    got = (
        cl.dbscan_clusters(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        pq.read_table(golden.dbscan_path(sf, cl.DBSCAN_EPS, cl.DBSCAN_MIN_PTS))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.shape == exp.shape
    assert (got["doc_id"] == exp["doc_id"]).all()
    assert (got["cluster_id"] == exp["cluster_id"]).all()
    assert (got["kind"] == exp["kind"]).all()


def test_dissolve_zones_matches_union_find(ray_session):
    import itertools

    import numpy as np

    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import cluster

    rects = fixtures.admin_rects()
    parent = {r["rel_id"]: r["rel_id"] for r in rects}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(rects, 2):
        if a["admin_level"] != b["admin_level"]:
            continue
        if (
            a["lon_min"] <= b["lon_max"]
            and b["lon_min"] <= a["lon_max"]
            and a["lat_min"] <= b["lat_max"]
            and b["lat_min"] <= a["lat_max"]
        ):
            ra, rb = find(a["rel_id"]), find(b["rel_id"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    exp = {}
    for r in rects:
        lab = find(r["rel_id"])
        e = exp.setdefault(lab, {"n": 0, "area": 0, "lv": r["admin_level"],
                                 "lon_min": np.inf, "lat_min": np.inf,
                                 "lon_max": -np.inf, "lat_max": -np.inf})
        e["n"] += 1
        w = r["lon_max"] - r["lon_min"]
        h = r["lat_max"] - r["lat_min"]
        e["area"] += int(np.floor(w * h * cluster.DISSOLVE_AREA_FP + 0.5))
        e["lon_min"] = min(e["lon_min"], r["lon_min"])
        e["lat_min"] = min(e["lat_min"], r["lat_min"])
        e["lon_max"] = max(e["lon_max"], r["lon_max"])
        e["lat_max"] = max(e["lat_max"], r["lat_max"])

    out = cluster.dissolve_zones().to_pandas()
    assert len(out) == len(exp)
    assert len(out) < len(rects)  # something actually merged
    for r in out.itertuples():
        e = exp[r.region_id]
        assert (r.n_zones, r.admin_level, r.area_fp) == (e["n"], e["lv"], e["area"])
        assert (r.lon_min, r.lat_min, r.lon_max, r.lat_max) == (
            e["lon_min"], e["lat_min"], e["lon_max"], e["lat_max"])


def test_cluster_label_confusion_marginals(ray_session):
    """Confusion-matrix marginals equal cluster sizes and corpus size."""
    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    cm = ann.cluster_label_confusion(sf).to_pandas()
    sizes = ann.kmeans_cluster_sizes(sf).to_pandas().set_index("cluster")["n_vecs"]
    per_cluster = cm.groupby("cluster")["n_vecs"].sum()
    for c, n in per_cluster.items():
        assert int(sizes[c]) == int(n)
    import pyarrow.parquet as pq

    assert cm["n_vecs"].sum() == pq.read_metadata(f"{sf}/embeddings.parquet").num_rows


def test_st_dbscan_matches_bruteforce(ray_session):
    from plasmap_ray import fixtures
    from plasmap_ray.pipelines import cluster

    sf = SF0001
    eps, eps_t, min_pts = 0.4, 24 * 3600 * 1_000_000, 4
    out = cluster.st_dbscan(sf, eps=eps, eps_t_us=eps_t, min_pts=min_pts).to_pandas()

    t = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "ts"])
    ids = t["event_id"].to_numpy()
    tus = t["ts"].cast("int64").to_numpy()
    lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
    n = len(ids)
    nbrs = [[] for _ in range(n)]
    for i in range(n):
        d2 = (lon - lon[i]) ** 2 + (lat - lat[i]) ** 2
        dt = np.abs(tus - tus[i])
        for j in np.nonzero((d2 <= eps * eps) & (dt <= eps_t))[0]:
            if j != i:
                nbrs[i].append(int(j))
    is_core = np.array([len(v) + 1 >= min_pts for v in nbrs])
    label = np.full(n, -1, dtype=np.int64)
    seen = np.zeros(n, dtype=bool)
    for s in range(n):
        if not is_core[s] or seen[s]:
            continue
        comp, stack = [s], [s]
        seen[s] = True
        while stack:
            u = stack.pop()
            for v in nbrs[u]:
                if is_core[v] and not seen[v]:
                    seen[v] = True
                    comp.append(v)
                    stack.append(v)
        label[comp] = int(ids[comp].min())
    kind = np.where(is_core, "core", "noise").astype(object)
    for i in range(n):
        if is_core[i]:
            continue
        cn = [v for v in nbrs[i] if is_core[v]]
        if cn:
            kind[i] = "border"
            label[i] = min(int(label[v]) for v in cn)

    got = out.set_index("event_id").sort_index()
    assert (got["cluster_id"].to_numpy() == label[np.argsort(ids)]).all()
    assert (got["kind"].to_numpy() == kind[np.argsort(ids)]).all()
    assert (got["kind"] == "core").sum() > 0 and (got["kind"] != "core").sum() > 0


def test_hll_sketch_accuracy_and_merge():
    """HLL registers: merge == rebuild (order-free max), estimate within
    ~3 sigma of truth at both small and saturated regimes."""
    import numpy as np

    from plasmap_ray.stages.sketch import HLLSketch

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1 << 62, size=200_000).astype(np.int64)
    truth = len(np.unique(vals))
    whole = HLLSketch(12).update(vals)
    parts = [HLLSketch(12).update(c) for c in np.array_split(vals, 7)]
    merged = parts[0]
    for s in parts[1:]:
        merged = merged.merge(s)
    assert np.array_equal(merged.regs, whole.regs)  # fold == one-shot
    err = abs(whole.estimate() - truth) / truth
    assert err < 3 * 1.04 / np.sqrt(4096), err
    # small-range regime (LinearCounting branch)
    small = HLLSketch(12).update(np.arange(500, dtype=np.int64))
    assert abs(small.estimate() - 500) / 500 < 0.05


def test_distinct_users_hll_query(ray_session):
    """The distributed fold equals the golden local recompute."""
    import pyarrow.parquet as pq

    from plasmap_ray import golden
    from plasmap_ray.pipelines import windows

    sf = "/root/testdata/sf0.001"
    got = windows.distinct_users_hll(sf).to_pandas()
    exp = pq.read_table(golden.hll_distinct_path(sf)).to_pandas()
    assert got.equals(exp)
    assert got["rel_err"].iloc[0] < 0.1


def test_count_min_never_underestimates(ray_session):
    """CMS point estimates are >= exact counts; merge order cannot change
    the sketch (elementwise adds commute); top-k audit rows agree with a
    pandas recompute."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import windows
    from plasmap_ray.stages.sketch import CountMinSketch, cms_cols

    sf = "/root/testdata/sf0.001"
    out = windows.count_min_eval(sf).to_pandas()
    users = pq.read_table(f"{sf}/events.parquet", columns=["user_id"])["user_id"].to_numpy()
    exact = pd.Series(users).value_counts()
    # engine top-k matches exact counts and one-sided error holds
    assert (out["overestimate"] >= 0).all()
    for _, r in out.iterrows():
        assert exact[r["user_id"]] == r["n_exact"]
    # sketch built in one shot equals the engine's tree-folded counts
    cms = CountMinSketch().update(users)
    est = cms.estimate(out["user_id"].to_numpy())
    assert (est == out["n_est"].to_numpy()).all()
    # ranking: exact desc, user_id asc
    sorted_ref = out.sort_values(["n_exact", "user_id"], ascending=[False, True])
    assert (sorted_ref["rank"].to_numpy() == np.arange(1, len(out) + 1)).all()


def test_hist_quantile_eval_guarantee(ray_session):
    """Sketch estimate vs bruteforce: the bin upper edge must sit at or
    above the exact quantile, and the rank error within 1/bins + slack
    of per-bin mass."""
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import stats

    sf = "/root/testdata/sf0.001"
    out = stats.hist_quantile_eval(sf).to_pandas().sort_values("q").reset_index(drop=True)
    v = pq.read_table(sf + "/events.parquet", columns=["value"])["value"].to_numpy()
    v = np.sort(v[~np.isnan(v)])
    n = len(v)
    assert (out["n_values"] == n).all()
    for row in out.itertuples():
        k = max(1, int(np.ceil(row.q * n)))
        exact = v[k - 1]
        assert abs(row.exact_value - round(exact, 6)) < 1e-9
        # upper-edge estimate can never undershoot the exact value
        assert row.est_value >= row.exact_value - 1e-9
        # realized rank of the estimate must be >= q (one-sided)
        assert row.rank_err >= -1e-9
        # and within the histogram resolution guarantee (max bin mass)
        counts, _ = np.histogram(v, bins=512)
        assert row.rank_err <= counts.max() / n + 1e-9


def test_binary_hamming_topk_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    k, vec_ids = 5, (1, 2, 3)
    got = ann.binary_hamming_topk(sf, k=k, vec_ids=vec_ids).to_pandas()

    t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy(), dtype=np.int64)
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    bits = m > 0.0
    for qid in vec_ids:
        qb = bits[ids == qid][0]
        mask = ids != qid
        ham = (bits[mask] != qb).sum(axis=1)
        top = np.lexsort((ids[mask], ham))[:k]
        exp = list(zip(ids[mask][top].tolist(), ham[top].tolist()))
        g = got[got["query_vec_id"] == qid].sort_values("ham_rank")
        assert list(zip(g["vec_id"], g["hamming"])) == exp


def test_binary_embedding_eval_range(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.binary_embedding_eval("/root/testdata/sf0.001", k=10).to_pandas()
    assert len(out) == 8
    assert ((out["recall"] >= 0.0) & (out["recall"] <= 1.0)).all()
    assert (out["n_overlap"] == (out["recall"] * 10).round().astype(int)).all()
    # sign bits at dim 32 retain SOME signal on average
    assert out["recall"].mean() > 0.2


def test_mmd_two_sample_gram_identity(ray_session):
    """The engine's moment-matrix contraction equals the explicit
    all-pairs kernel sum on a tiny controlled input, and MMD detects a
    planted mean shift."""
    import numpy as np

    fp = 100
    rng = np.random.default_rng(3)
    A = rng.normal(0, 1, (20, 8))
    B = rng.normal(0, 1, (25, 8)) + 2.0  # shifted group
    C = rng.normal(0, 1, (22, 8))  # same dist as A
    qa = np.floor(A * fp + 0.5).astype(np.int64)
    qb = np.floor(B * fp + 0.5).astype(np.int64)
    qc = np.floor(C * fp + 0.5).astype(np.int64)

    def pair_sum(X, Y):
        s = 0
        for x in X.tolist():
            for y in Y.tolist():
                d = sum(a * b for a, b in zip(x, y))
                s += d * d
        return s

    def gram(X, Y):
        Mx = (X.T @ X).astype(object)
        My = (Y.T @ Y).astype(object)
        return int((Mx * My).sum())

    for X, Y in ((qa, qa), (qa, qb), (qb, qc)):
        assert pair_sum(X, Y) == gram(X, Y)

    def mmd2(X, Y):
        fp4 = float(fp) ** 4
        na, nb = float(len(X)), float(len(Y))
        return (
            (gram(X, X) / fp4) / (na * na)
            + (gram(Y, Y) / fp4) / (nb * nb)
            - 2.0 * (gram(X, Y) / fp4) / (na * nb)
        )

    assert mmd2(qa, qb) > 10 * abs(mmd2(qa, qc))


def test_mmd_two_sample_pipeline(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.mmd_two_sample("/root/testdata/sf0.001").to_pandas()
    n_labels = out[["label_a"]].nunique().iloc[0] + 1
    assert len(out) == n_labels * (n_labels - 1) // 2
    assert (out["label_a"] < out["label_b"]).all()
    # MMD^2 under the biased V-statistic is non-negative
    assert (out["mmd2"] >= -1e-9).all()


def test_knn_calibration_consistency(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.knn_calibration("/root/testdata/sf0.001", k=5).to_pandas()
    # vote counts span a subset of 1..5 (majority needs >= ceil(5/len?) but
    # with 10 labels a 1-vote plurality is possible)
    assert out["n_votes"].between(1, 5).all()
    assert (out["n_correct"] <= out["n_samples"]).all()
    # total samples = corpus size
    import pyarrow.parquet as pq

    n = pq.ParquetFile("/root/testdata/sf0.001/embeddings.parquet").metadata.num_rows
    assert out["n_samples"].sum() == n
    # abs_gap is exactly |confidence - accuracy| (the ECE integrand);
    # no monotonicity is asserted — miscalibration is what's measured
    # (the fixture's planted near-dup clusters produce unanimous-but-
    # wrong neighborhoods, a real label-noise signature)
    assert np.allclose(out["abs_gap"], (out["confidence"] - out["accuracy"]).abs().round(6), atol=2e-6)


def test_intrinsic_dimension_planted_manifold(ray_session, tmp_path):
    """Vectors on a known low-dim manifold embedded in high-d recover
    approximately that dimension."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import ann

    rng = np.random.default_rng(5)
    n, d_int, d_amb = 400, 3, 16
    basis = rng.normal(0, 1, (d_int, d_amb))
    pts = rng.normal(0, 1, (n, d_int)) @ basis  # a 3-dim linear manifold
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in pts],
                                  type=pa.list_(pa.float32(), d_amb)),
        }
    )
    path = os.path.join(tmp_path, "embeddings.parquet")
    pq.write_table(t, path)
    out = ann.intrinsic_dimension(str(path)).to_pandas().iloc[0]
    assert out.n_used == n
    # TwoNN on 400 samples of a 3-manifold: expect ~3 (generous band)
    assert 1.8 < out.intrinsic_dim < 4.5


def test_intrinsic_dimension_fixture(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.intrinsic_dimension("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert out.n_vectors == out.n_used + out.n_zero_r1
    assert out.intrinsic_dim > 0


def test_hill_tail_index_pareto_recovery(ray_session, tmp_path):
    """On planted Pareto(alpha) data the Hill estimator recovers alpha."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from plasmap_ray.pipelines import stats as stats_p

    rng = np.random.default_rng(9)
    alpha = 2.5
    n = 20000
    vals = (1.0 / rng.random(n)) ** (1.0 / alpha)  # Pareto(alpha), xm=1
    t = pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "value": pa.array(vals, type=pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = stats_p.hill_tail_index(str(tmp_path)).to_pandas().iloc[0]
    assert 1.8 < out.hill_alpha < 3.3  # k=100 sampling noise band
    assert out.x_k1 > 1.0 and out.mean_excess > 0


def test_hill_tail_index_fixture(ray_session):
    from plasmap_ray.pipelines import stats as stats_p

    out = stats_p.hill_tail_index("/root/testdata/sf0.001").to_pandas().iloc[0]
    assert out.k == stats_p.HILL_K
    assert out.sum_ln_fp > 0 and out.hill_alpha > 0


def test_kcenter_coreset_properties(ray_session):
    from plasmap_ray.pipelines import ann

    out = ann.kcenter_coreset("/root/testdata/sf0.001").to_pandas()
    assert len(out) == ann.KCENTER_K
    assert out["rank"].tolist() == list(range(1, ann.KCENTER_K + 1))
    # greedy k-center radii are NON-INCREASING (each pick can only
    # shrink the worst covering distance)
    r = out["covering_radius"].to_numpy()
    assert (np.diff(r) <= 1e-9).all()
    assert r[-1] >= 0
    # centers are distinct
    assert out["vec_id"].nunique() == len(out)
    # verify the final radius by bruteforce
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    centers = m[np.isin(ids, out["vec_id"].to_numpy())]
    d2 = ((m[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    assert abs(np.sqrt(d2.max()) - r[-1]) < 1e-4
