"""Brute-force recompute tests for the corpus-audit statistics added in
round 3: Benford first-digit audit, exact-int128 Pearson matrix, hourly
ACF, Theil-Sen robust cell trend, EB-shrunk cell rates."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from plasmap_ray import fixtures
from plasmap_ray.pipelines import hotspot, stats, windows

SF = "/root/testdata/sf0.001"


def test_benford_digits_from_bruteforce(ray_session):
    out = stats.benford_audit(SF).to_pandas().sort_values("digit").reset_index(drop=True)
    prices = pq.read_table(os.path.join(SF, "lineitem.parquet"))["l_extendedprice"].to_numpy()
    lead = np.array([int(str(int(np.floor(p)))[0]) for p in prices])
    want = np.bincount(lead, minlength=10)[1:10]
    assert list(out["digit"]) == list(range(1, 10))
    assert (out["n"].to_numpy() == want).all()
    # fractions sum to 1 (within rounding) and Benford expectation is a pmf
    assert abs(out["obs_frac"].sum() - 1.0) < 1e-4
    assert abs(out["exp_frac"].sum() - 1.0) < 1e-4
    assert (out["chi2_term"].to_numpy() >= 0).all()


def test_corr_matrix_matches_numpy(ray_session):
    out = stats.lineitem_corr_matrix(SF).to_pandas()
    t = pq.read_table(os.path.join(SF, "lineitem.parquet"), columns=list(stats._CORR_COLS))
    cents = {
        c: np.floor(t[c].to_numpy() * 100.0 + 0.5).astype(np.int64) for c in stats._CORR_COLS
    }
    assert len(out) == 6
    for _, row in out.iterrows():
        a, b = cents[row["col_a"]], cents[row["col_b"]]
        want = np.corrcoef(a.astype(np.float64), b.astype(np.float64))[0, 1]
        # engine output is rounded to 6 decimals; allow the rounding grid
        assert abs(row["pearson_r"] - want) < 5.1e-7, (row["col_a"], row["col_b"])
    assert (out["pearson_r"].abs() <= 1.0).all()


def test_acf_hourly_matches_dense_recompute(ray_session):
    out = windows.acf_hourly(SF).to_pandas().sort_values("lag").reset_index(drop=True)
    ts = pq.read_table(os.path.join(SF, "events.parquet"), columns=["ts"])["ts"]
    h = ts.cast("int64").to_numpy() // 3_600_000_000
    lo, hi = h.min(), h.max()
    dense = np.bincount((h - lo).astype(np.int64), minlength=int(hi - lo + 1)).astype(np.float64)
    dx = dense - dense.mean()
    den = (dx * dx).sum()
    for _, row in out.iterrows():
        k = int(row["lag"])
        want = (dx[k:] * dx[:-k]).sum() / den
        assert abs(row["acf"] - want) < 1e-6, k
    assert list(out["lag"]) == list(range(1, 25))
    assert (out["acf"].abs() <= 1.0 + 1e-9).all()


def test_theil_sen_matches_bruteforce(ray_session):
    out = hotspot.theil_sen_cell_trend(SF).to_pandas()
    ids = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_id", "ts"])
    ev = ids["event_id"].to_numpy()
    day = ids["ts"].cast("int64").to_numpy() // hotspot.DAY_US
    lon, lat = fixtures.derive_lon(ev), fixtures.derive_lat(ev)
    cx = np.floor((lon - fixtures.LON_MIN) / hotspot.GI_EPS).astype(np.int64)
    cy = np.floor((lat - fixtures.LAT_MIN) / hotspot.GI_EPS).astype(np.int64)
    df = pd.DataFrame({"cx": cx, "cy": cy, "day": day})
    counts = df.groupby(["cx", "cy", "day"]).size().reset_index(name="y")
    want_rows = 0
    got = {(int(r["cx"]), int(r["cy"])): r for _, r in out.iterrows()}
    for (gx, gy), g in counts.groupby(["cx", "cy"]):
        d = g["day"].to_numpy()
        y = g["y"].to_numpy()
        if len(d) < hotspot.TREND_MIN_DAYS:
            assert (gx, gy) not in got
            continue
        want_rows += 1
        o = np.argsort(d)
        d, y = d[o], y[o]
        i, j = np.triu_indices(len(d), k=1)
        slopes = (y[j] - y[i]) / (d[j] - d[i]).astype(np.float64)
        row = got[(gx, gy)]
        assert row["n_days"] == len(d)
        assert abs(row["ts_slope"] - np.median(slopes)) < 1e-6
    assert len(out) == want_rows


def test_eb_shrinkage_pulls_toward_global(ray_session):
    out = hotspot.eb_shrunk_rates(SF).to_pandas()
    p = out["x"].sum() / out["n"].sum()
    # shrunk rate lies strictly between the raw rate and the global rate
    # (or equals both when they coincide)
    lo = np.minimum(out["rate"], p) - 1e-6
    hi = np.maximum(out["rate"], p) + 1e-6
    assert ((out["shrunk_rate"] >= lo) & (out["shrunk_rate"] <= hi)).all()
    # small-n cells shrink more: |shrunk - rate| decreasing in n on average
    gap = (out["shrunk_rate"] - out["rate"]).abs()
    small = gap[out["n"] < out["n"].median()].mean()
    large = gap[out["n"] >= out["n"].median()].mean()
    assert small >= large


def test_discount_elasticity_bruteforce(ray_session):
    """Per-brand r equals a pandas merge + corrcoef recompute."""
    got = stats.discount_elasticity(SF).to_pandas().set_index("p_brand")
    li = pq.read_table(
        os.path.join(SF, "lineitem.parquet"), columns=["l_partkey", "l_discount", "l_quantity"]
    ).to_pandas()
    pt = pq.read_table(os.path.join(SF, "part.parquet"), columns=["p_partkey", "p_brand"]).to_pandas()
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j["x"] = np.floor(j["l_discount"] * 100.0 + 0.5).astype(np.int64)
    j["y"] = np.floor(j["l_quantity"] * 100.0 + 0.5).astype(np.int64)
    for brand, g in j.groupby("p_brand"):
        want = np.corrcoef(g["x"].astype(float), g["y"].astype(float))[0, 1]
        row = got.loc[brand]
        assert row["n"] == len(g)
        assert abs(row["pearson_r"] - want) < 5.1e-7, brand


def test_kmv_overlap_eval_bruteforce(ray_session):
    """Exact counts match set algebra; estimates within 25% of truth
    at K=128 (|err| ~ 1/sqrt(K) per sketch); estimator formula pinned."""
    import hashlib

    got = stats.kmv_overlap_eval(SF).to_pandas().iloc[0]
    ev = pq.read_table(os.path.join(SF, "events.parquet"), columns=["user_id", "event_type"]).to_pandas()
    ua = set(ev.loc[ev["event_type"] == stats.KMVO_SET_A, "user_id"].astype(int))
    ub = set(ev.loc[ev["event_type"] == stats.KMVO_SET_B, "user_id"].astype(int))
    assert got["n_a"] == len(ua) and got["n_b"] == len(ub)
    assert got["n_inter"] == len(ua & ub)

    def est(users):
        hs = sorted(hashlib.md5(str(u).encode()).hexdigest() for u in users)
        if len(hs) <= stats.KMVO_K:
            return float(len(hs))
        return (stats.KMVO_K - 1) / (int(hs[stats.KMVO_K - 1][:8], 16) / 4294967296.0)

    assert abs(got["est_a"] - est(ua)) < 1e-4
    assert abs(got["est_union"] - est(ua | ub)) < 1e-4
    if len(ua) > 2 * stats.KMVO_K:
        assert abs(got["est_a"] - len(ua)) / len(ua) < 0.25


def test_ks_weekend_matches_scipy_free_recompute(ray_session):
    """D equals the brute-force sup over merged CDFs (scipy-free)."""
    got = stats.ks_weekend_test(SF).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["ts", "value"]).to_pandas()
    day = t["ts"].astype("int64").to_numpy() // 86_400_000_000
    we = (day % 7 == 2) | (day % 7 == 3)
    cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    a = np.sort(cents[~we])
    b = np.sort(cents[we])
    assert got["n_weekday"] == len(a) and got["n_weekend"] == len(b)
    grid = np.unique(cents)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fb - fa)
    assert abs(got["d_stat"] - d.max()) < 1e-6
    assert 0.0 <= got["ks_p"] <= 1.0
    # the reported argmax location attains the sup
    i = np.searchsorted(grid, got["at_cents"])
    assert abs(d[i] - d.max()) < 1e-12


def test_chi2_independence_matches_scipy_formula(ray_session):
    """chi2/dof/cramers_v equal a dense pandas-crosstab recompute."""
    out = stats.chi2_independence(SF).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_type", "ts"]).to_pandas()
    hr = (t["ts"].astype("int64").to_numpy() // 3_600_000_000) % 24
    ct = pd.crosstab(t["event_type"], hr).to_numpy().astype(np.float64)
    N = ct.sum()
    e = ct.sum(axis=1)[:, None] * ct.sum(axis=0)[None, :] / N
    chi2 = ((ct - e) ** 2 / e).sum()
    R, C = ct.shape
    assert out["n_total"] == N
    assert out["n_types"] == R and out["n_hours"] == C
    assert out["dof"] == (R - 1) * (C - 1)
    assert abs(out["chi2"] - chi2) < 1e-4
    assert abs(out["cramers_v"] - np.sqrt(chi2 / (N * min(R - 1, C - 1)))) < 1e-6


def test_rank_correlation_matches_scipy_definition(ray_session):
    """Exact histogram Spearman/Kendall equal the midrank/pair-count
    definitions computed directly (scipy-equivalent formulas)."""
    from plasmap_ray.pipelines import relational

    out = relational.rank_correlation(SF).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(SF, "lineitem.parquet"), columns=["l_quantity", "l_discount"]).to_pandas()
    q = t["l_quantity"].to_numpy().astype(np.int64)
    d = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    # midrank Spearman = Pearson of average ranks
    rq = pd.Series(q).rank(method="average").to_numpy()
    rdd = pd.Series(d).rank(method="average").to_numpy()
    rho = np.corrcoef(rq, rdd)[0, 1]
    assert out["n"] == len(q)
    assert abs(out["spearman_rho"] - rho) < 1e-6
    # Kendall tau-b via scipy if available, else pair-count on a sample
    try:
        from scipy.stats import kendalltau

        tau = kendalltau(q, d).statistic
        assert abs(out["kendall_tau"] - tau) < 1e-6
    except ImportError:
        pass
    assert -1.0 <= out["kendall_tau"] <= 1.0


def test_mann_whitney_matches_bruteforce_ranks(ray_session):
    """U and z equal a dense midrank recompute (scipy-free)."""
    got = stats.mann_whitney_u(SF).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["ts", "value"]).to_pandas()
    day = t["ts"].astype("int64").to_numpy() // 86_400_000_000
    we = (day % 7 == 2) | (day % 7 == 3)
    cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    ranks = pd.Series(cents).rank(method="average").to_numpy()
    m, n = int((~we).sum()), int(we.sum())
    assert got["n_weekday"] == m and got["n_weekend"] == n
    r_we = float(ranks[we].sum())
    u = r_we - n * (n + 1) / 2.0
    assert abs(got["u2_weekend"] / 2.0 - u) < 1e-6
    _, counts = np.unique(cents, return_counts=True)
    tie = float((counts.astype(np.float64) ** 3 - counts).sum())
    N = m + n
    sigma = np.sqrt(m * n / 12.0 * ((N + 1) - tie / (N * (N - 1))))
    assert abs(got["z"] - (u - m * n / 2.0) / sigma) < 1e-5


def test_hbos_outliers_matches_dense_recompute(ray_session):
    """Top-k combos equal a dense pandas marginal-product recompute."""
    got = stats.hbos_outliers(SF).to_pandas()
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    ).to_pandas()
    df = pd.DataFrame(
        {
            "qty": t["l_quantity"].astype(np.int64),
            "disc_cents": np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64),
            "price_bin": np.floor(t["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
            // stats.HBOS_PRICE_BIN_CENTS,
        }
    )
    c = df.groupby(["qty", "disc_cents", "price_bin"]).size().reset_index(name="n_rows")
    for col in ("qty", "disc_cents", "price_bin"):
        c = c.join(df.groupby(col).size().rename("n_" + col.split("_")[0]), on=col)
    c = c.rename(columns={"n_disc_cents": "n_disc", "n_price_bin": "n_price"})
    c["score"] = c["n_qty"] * c["n_disc"] * c["n_price"]
    exp = c.sort_values(["score", "qty", "disc_cents", "price_bin"]).head(stats.HBOS_TOPK)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        exp[got.columns].reset_index(drop=True).astype("int64"),
    )
    # every reported combo is rarer (by product) than any unreported one
    rest = c.sort_values(["score"]).iloc[stats.HBOS_TOPK:]
    if len(rest):
        assert got["score"].max() <= rest["score"].min()


def test_bootstrap_ci_brackets_mean_and_weights_poisson(ray_session):
    """CI brackets the point estimate; hash weights average ~1 and are
    batch-invariant (the partition-independence Poisson bootstrap needs)."""
    got = stats.bootstrap_ci(SF).to_pandas().iloc[0]
    assert got["ci_lo"] <= got["mean_value"] <= got["ci_hi"]
    assert got["se_boot"] > 0
    ids = np.arange(1, 20001, dtype=np.int64)
    w = stats._boot_weights(ids, 7)
    assert abs(w.mean() - 1.0) < 0.05  # Poisson(1) mass
    assert w.max() <= 8
    # reshard-proof: weights depend only on (id, b), not array position
    assert (stats._boot_weights(ids[::-1], 7)[::-1] == w).all()


def test_expectations_audit_counts(ray_session):
    """Per-rule pass counts equal a dense pandas recompute; the clean
    fixture passes its own contract."""
    out = stats.expectations_audit(SF).to_pandas()
    assert list(out["rule_id"]) == [r for r, _ in stats.EXPECT_RULES]
    t = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    n = len(t)
    assert (out["n_rows"] == n).all()
    exp = {
        1: int(((t["l_quantity"] >= 1) & (t["l_quantity"] <= 50)).sum()),
        2: int(((t["l_discount"] >= 0) & (t["l_discount"] <= 0.10)).sum()),
        3: int((t["l_tax"] >= 0).sum()),
        4: int(t["l_returnflag"].isin(["A", "N", "R"]).sum()),
        5: int(t["l_shipdate"].notna().sum()),
        6: int((t["l_extendedprice"] > 0).sum()),
    }
    for r in out.itertuples():
        assert r.n_pass == exp[r.rule_id], r.rule
        assert r.n_fail == n - exp[r.rule_id]


def test_neyman_allocation_optimality(ray_session):
    """Allocation matches the N_h*S_h rule and beats proportional
    allocation on the stratified-variance objective."""
    out = stats.neyman_allocation(SF).to_pandas()
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_type", "value"]).to_pandas()
    t["c"] = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    g = t.groupby("event_type")["c"].agg(["size", "std"])
    w = (g["size"] * g["std"]).sort_index()
    exp_alloc = np.floor(stats.NEYMAN_BUDGET * w / w.sum() + 0.5).astype(np.int64)
    got = out.set_index("event_type").sort_index()
    assert (got["n_alloc"].to_numpy() == exp_alloc.to_numpy()).all()
    # Neyman variance <= proportional variance (sum N_h^2 S_h^2 / n_h)
    N, S = g["size"].to_numpy().astype(float), g["std"].to_numpy()
    ney = got["n_alloc"].to_numpy().astype(float)
    prop = stats.NEYMAN_BUDGET * N / N.sum()
    v_ney = ((N * S) ** 2 / np.maximum(ney, 1)).sum()
    v_prop = ((N * S) ** 2 / prop).sum()
    assert v_ney <= v_prop * 1.0001


def test_runs_test_formula_and_planted_patterns(ray_session):
    """Engine matches the textbook formula; planted alternating /
    blocked sequences land on the right z sign."""
    got = stats.runs_test(SF).to_pandas().iloc[0]
    assert got["n_above"] + got["n_below"] == got["n_days"]
    assert 1 <= got["n_runs"] <= got["n_days"]
    n1, n2, n = got["n_above"], got["n_below"], got["n_days"]
    mu = 1 + 2 * n1 * n2 / n
    sig = np.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1)))
    assert abs(got["z"] - (got["n_runs"] - mu) / sig) < 1e-5
    # planted: alternating -> many runs (z >> 0); blocked -> few (z << 0)
    def z_of(seq):
        ab = np.asarray(seq, dtype=bool)
        n = len(ab)
        n1 = int(ab.sum()); n2 = n - n1
        r = 1 + int((ab[1:] != ab[:-1]).sum())
        mu = 1 + 2 * n1 * n2 / n
        sig = np.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1)))
        return (r - mu) / sig
    assert z_of([0, 1] * 30) > 5
    assert z_of([0] * 30 + [1] * 30) < -5


def test_ols_regression_matches_lstsq(ray_session):
    out = stats.ols_regression(SF).to_pandas().set_index("l_returnflag").sort_index()
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )
    flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
    for f in np.unique(flag):
        m = flag == f
        X = np.column_stack([np.ones(m.sum()), x1[m], x2[m]]).astype(np.float64)
        beta, _, _, _ = np.linalg.lstsq(X, y[m].astype(np.float64), rcond=None)
        row = out.loc[f]
        assert int(row["n"]) == int(m.sum())
        assert abs(row["b0"] - beta[0]) < 1e-3
        assert abs(row["b1"] - beta[1]) < 1e-3
        assert abs(row["b2"] - beta[2]) < 1e-3
        pred = X @ beta
        resid = y[m] - pred
        sst = ((y[m] - y[m].mean()) ** 2).sum()
        assert abs(row["r2"] - (1.0 - (resid**2).sum() / sst)) < 1e-5
        assert 0.0 <= row["r2"] <= 1.0


def test_decision_stump_bruteforce(ray_session):
    """Best split per feature recomputed by scanning every threshold."""
    out = stats.decision_stump(SF).to_pandas().set_index("feature")
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount", "l_shipdate"],
    )
    y = (np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R").astype(np.int64)
    qty = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
    month = (sd.astype(np.int64) % 12) + 1
    for name, v in (("quantity", qty), ("discount_pct", disc), ("ship_month", month)):
        best = (2.0, None)
        for thr in np.unique(v)[:-1]:
            le = v <= thr
            nl, pl = le.sum(), y[le].sum()
            ng, pg = (~le).sum(), y[~le].sum()
            nt = len(v)
            g = (nl / nt) * (1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2) + (ng / nt) * (
                1 - (pg / ng) ** 2 - ((ng - pg) / ng) ** 2
            )
            g = round(g, 6)
            if g < best[0] or (g == best[0] and thr < best[1]):
                best = (g, int(thr))
        row = out.loc[name]
        assert int(row["threshold"]) == best[1], name
        assert abs(row["gini"] - best[0]) < 1e-9, name
        assert int(row["n_le"]) + int(row["n_gt"]) == len(v)
        assert int(row["pos_le"]) + int(row["pos_gt"]) == int(y.sum())


def test_logistic_newton_is_a_stationary_point(ray_session):
    """The fitted beta must satisfy the logistic score equations
    (gradient ~ 0) under an independent float recompute, and beat the
    intercept-only model on log loss."""
    out = stats.logistic_newton(SF).to_pandas().iloc[0]
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    y = (np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R").astype(np.float64)
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5)
    beta = np.array([out["b0"], out["b1"], out["b2"]])
    p = 1.0 / (1.0 + np.exp(-(beta[0] + beta[1] * x1 + beta[2] * x2)))
    X = np.column_stack([np.ones_like(x1), x1, x2])
    grad = X.T @ (y - p) / len(y)
    assert np.abs(grad).max() < 1e-3
    base = y.mean()
    base_loss = -(y * np.log(base) + (1 - y) * np.log(1 - base)).mean()
    assert out["log_loss"] <= base_loss + 1e-9
    assert 0.0 <= out["accuracy"] <= 1.0


def test_psi_drift_bruteforce(ray_session):
    out = stats.psi_drift(SF).to_pandas().set_index("feature")
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
    )
    sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
    late = sd >= np.datetime64(stats.PSI_SPLIT_DATE)
    feats = {
        "quantity": np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64) // 5,
        "discount_pct": np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64),
        "price_10k": np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64) // 10_000,
    }
    for name, v in feats.items():
        bins = np.unique(v)
        a = np.array([(v[~late] == b).sum() for b in bins]) + 1
        l = np.array([(v[late] == b).sum() for b in bins]) + 1
        p, q = a / a.sum(), l / l.sum()
        psi = ((p - q) * np.log(p / q)).sum()
        row = out.loc[name]
        assert int(row["n_early"]) == int((~late).sum())
        assert int(row["n_late"]) == int(late.sum())
        assert abs(row["psi"] - psi) < 1e-6
        assert row["psi"] >= 0.0  # PSI is a symmetrized KL: nonnegative


def test_conformal_interval_guarantee(ray_session):
    """The conformal rank must deliver >= 1-alpha empirical coverage,
    and q must be an actual residual value (exact rank selection)."""
    out = stats.conformal_interval(SF).to_pandas().iloc[0]
    n = int(out["n"])
    assert out["coverage"] >= 1.0 - stats.CONF_ALPHA - 1e-9
    # exactness: recompute residual cents and confirm q is the k-th smallest
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    y = np.floor(t["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
    r = y.astype(np.float64) - (out["b0"] + out["b1"] * x1 + out["b2"] * x2)
    rc = np.sort(np.floor(np.abs(r) * 100.0 + 0.5).astype(np.int64))
    import math as _math

    k = min(n, _math.ceil((n + 1) * (1.0 - stats.CONF_ALPHA)))
    # b is rounded to 6 in the output, so allow the rank neighborhood
    assert abs(int(out["q_cents"]) - int(rc[k - 1])) <= 200
    assert int(out["n_within"]) >= k


def test_mutual_info_rank_bruteforce(ray_session):
    out = stats.mutual_info_rank(SF).to_pandas().set_index("feature")
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount", "l_shipdate"],
    )
    y = np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False))
    qty = np.floor(t["l_quantity"].to_numpy() + 0.5).astype(np.int64) // 5
    disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
    month = (sd.astype(np.int64) % 12) + 1
    for name, v in (("quantity5", qty), ("discount_pct", disc), ("ship_month", month)):
        n = len(v)
        mi = 0.0
        for b in np.unique(v):
            for c in np.unique(y):
                nxy = int(((v == b) & (y == c)).sum())
                if nxy == 0:
                    continue
                nx, ny = int((v == b).sum()), int((y == c).sum())
                mi += (nxy / n) * np.log(n * nxy / (nx * ny))
        row = out.loc[name]
        assert abs(row["mi_nats"] - mi) < 1e-6, name
        assert row["mi_nats"] >= -1e-9  # MI is nonnegative
        assert int(row["n_bins"]) == len(np.unique(v))


def test_quantile_regression_orders_and_calibrates(ray_session):
    """tau=0.9 plane sits above tau=0.5 on average, and the fraction of
    points below each fitted plane approximates tau."""
    out = stats.quantile_regression(SF).to_pandas().set_index("tau")
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5)
    y = np.floor(t["l_extendedprice"].to_numpy() + 0.5)
    fracs = {}
    preds = {}
    for tau in (0.5, 0.9):
        r = out.loc[tau]
        pred = r["b0"] + r["b1"] * x1 + r["b2"] * x2
        preds[tau] = pred
        fracs[tau] = float((y <= pred).mean())
    assert (preds[0.9] >= preds[0.5]).mean() > 0.95
    assert abs(fracs[0.5] - 0.5) < 0.05
    assert abs(fracs[0.9] - 0.9) < 0.05


def test_isotonic_and_tail_dependence(ray_session):
    iso = stats.isotonic_calibration(SF).to_pandas()
    # monotone non-decreasing fitted rates; pooled mean preserved
    r = iso["iso_rate"].to_numpy()
    assert (np.diff(r) >= -1e-12).all()
    total_pred = float((iso["n"] * iso["iso_rate"]).sum())
    assert abs(total_pred - iso["n_returns"].sum()) < 1.0  # mean-preserving up to rounding
    td = stats.tail_dependence(SF).to_pandas().iloc[0]
    # quantiles are data elements; tails hold ~10% of rows
    assert 0.05 < td["n_xhi"] / td["n"] < 0.15
    assert 0.0 <= td["lambda_upper"] <= 1.0 and 0.0 <= td["lambda_lower"] <= 1.0
    # synthetic TPC-H quantity/price are near-independent: both lambdas
    # should sit near the 1-q = 0.1 baseline, far from comonotone 1.0
    assert td["lambda_upper"] < 0.3 and td["lambda_lower"] < 0.3


def test_gmm_em_is_a_proper_mixture(ray_session):
    out = stats.gmm_em(SF).to_pandas()
    assert len(out) == 2
    assert abs(out["weight"].sum() - 1.0) < 1e-6
    assert (out["sigma"] > 0).all()
    # log-likelihood must beat a single-Gaussian fit (more parameters,
    # same family nested inside)
    t = pq.read_table(os.path.join(SF, "lineitem.parquet"), columns=["l_extendedprice"])
    x = np.log(np.floor(t["l_extendedprice"].to_numpy() + 0.5))
    mu, sd = x.mean(), x.std()
    single = float(np.mean(-0.5 * ((x - mu) / sd) ** 2 - np.log(sd * np.sqrt(2 * np.pi))))
    assert out["loglik_per_row"].iloc[0] >= single - 1e-6


def test_cca_bounds_and_pairwise_floor(ray_session):
    """Canonical correlations lie in [0,1] and the FIRST one dominates
    every pairwise |corr| between the blocks (CCA optimality)."""
    out = stats.cca_analysis(SF).to_pandas()
    assert len(out) == 2
    cc = out["can_corr"].to_numpy()
    assert (cc >= 0).all() and (cc <= 1.0).all()
    assert cc[0] >= cc[1] - 1e-12
    t = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_extendedprice", "l_tax"],
    )
    x1 = np.floor(t["l_quantity"].to_numpy() + 0.5)
    x2 = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5)
    y1 = np.floor(t["l_extendedprice"].to_numpy() + 0.5)
    y2 = np.floor(t["l_tax"].to_numpy() * 100.0 + 0.5)
    best_pair = max(
        abs(np.corrcoef(a, b)[0, 1]) for a in (x1, x2) for b in (y1, y2)
    )
    assert cc[0] >= best_pair - 1e-6


def test_perceptron_averaging_deterministic_and_useful(ray_session):
    a = stats.perceptron_averaging(SF).to_pandas()
    b = stats.perceptron_averaging(SF).to_pandas()
    assert a.equals(b)  # bit-stable across runs (full-tuple ordering)
    row = a.iloc[0]
    assert row["n_shards"] >= 2
    # better than the majority-class baseline would be too strong for a
    # one-pass linear model on weak features; at least both classes are
    # separable above chance-coin level
    assert 0.3 <= row["accuracy"] <= 1.0


def test_simpsons_paradox_signs_exact(ray_session):
    out = stats.simpsons_paradox(SF).to_pandas()
    assert set(out["global_sign"]) <= {-1, 0, 1}
    assert len(set(out["global_sign"])) == 1  # one global sign repeated
    # recompute one brand's sign exactly
    li = pq.read_table(os.path.join(SF, "lineitem.parquet"), columns=["l_partkey", "l_discount", "l_quantity"]).to_pandas()
    pt = pq.read_table(os.path.join(SF, "part.parquet"), columns=["p_partkey", "p_brand"]).to_pandas()
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    brand = out["p_brand"].iloc[0]
    sub = j[j["p_brand"] == brand]
    x = np.floor(sub["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    y = np.floor(sub["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    num = int(len(x)) * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    want = 0 if num == 0 else (1 if num > 0 else -1)
    assert int(out[out["p_brand"] == brand]["slope_num_sign"].iloc[0]) == want
    assert int(out[out["p_brand"] == brand]["n"].iloc[0]) == len(sub)


def test_als_reconstructs_better_than_mean(ray_session):
    out = stats.als_factorization(SF).to_pandas()
    rmse = float(out[out["event_type"] == "__rmse__"]["v0"].iloc[0])
    # baseline: per-type column-mean reconstruction RMSE
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["user_id", "event_type"]).to_pandas()
    piv = t.groupby(["user_id", "event_type"]).size().unstack(fill_value=0)
    R = piv.to_numpy(dtype=float)
    base = np.sqrt(((R - R.mean(axis=0)) ** 2).mean())
    assert rmse < base  # rank-2 fit beats the rank-1 column-mean model
    assert rmse > 0
    assert len(out) == piv.shape[1] + 1


def test_jackknife_and_ams(ray_session):
    from plasmap_ray.pipelines import text as text_mod

    jk = stats.jackknife_se(SF).to_pandas().iloc[0]
    # jackknife SE of a mean ~ classical SE for iid shards: same order
    t = pq.read_table(os.path.join(SF, "orders.parquet"), columns=["o_totalprice"])
    cents = np.floor(t["o_totalprice"].to_numpy() * 100.0 + 0.5)
    classical = cents.std(ddof=1) / np.sqrt(len(cents))
    assert 0.5 * classical < jk["se_cents"] < 2.0 * classical
    assert abs(jk["mean_cents"] - cents.mean()) < 1.0
    ams = text_mod.ams_f2_eval(SF).to_pandas().iloc[0]
    # 64 estimator rows: relative error should be modest for this skew
    assert ams["rel_err"] < 0.5
    assert ams["f2_exact"] > ams["n_tokens"]  # skewed counts push F2 above N


def test_pps_sample_thresholds_and_pps_property(ray_session):
    from plasmap_ray.pipelines import relational

    out = relational.pps_sample(SF).to_pandas()
    assert list(out["k"]) == list(range(relational.PPS_N))
    sup = pq.read_table(os.path.join(SF, "supplier.parquet"), columns=["s_suppkey", "s_acctbal"]).to_pandas()
    sup = sup.sort_values("s_suppkey").reset_index(drop=True)
    sizes = np.abs(np.floor(sup["s_acctbal"].to_numpy() * 100.0 + 0.5)).astype(np.int64)
    total = int(sizes.sum())
    cum = np.concatenate([[0], np.cumsum(sizes)])
    n = relational.PPS_N
    for r in out.itertuples():
        i = int(np.nonzero(sup["s_suppkey"].to_numpy() == r.s_suppkey)[0][0])
        target = (2 * int(r.k) + 1) * total
        assert int(cum[i]) * 2 * n <= target < int(cum[i + 1]) * 2 * n


def test_capture_recapture_estimates_true_population(ray_session):
    out = stats.capture_recapture(SF).to_pandas().iloc[0]
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["user_id"])
    true_n = len(np.unique(t["user_id"].to_numpy()))
    # both windows observed and overlap; the estimate lands near truth
    assert out["m"] >= 1
    assert out["n_hat"] >= max(out["n1"], out["n2"]) - 1e-9
    assert abs(out["n_hat"] - true_n) / true_n < 0.2


def test_mediation_identity_holds_exactly(ray_session):
    """total = c' + a·b is an algebraic OLS identity, not an estimate."""
    out = stats.mediation_analysis(SF).to_pandas().iloc[0]
    assert abs(out["total"] - (out["c_prime"] + out["indirect"])) < 1e-4
    assert out["n"] > 0
