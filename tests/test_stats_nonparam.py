"""Property + replay tests for the nonparametric stats module: each
query is cross-checked against an independent pure-Python computation
on the same fixture rows (laws the DuckDB differential oracle shares
by construction can't falsify — a third implementation can)."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _events(sf_dir):
    return duckdb.sql(
        "SELECT event_type, CAST(ROUND(value*100,0) AS BIGINT) AS c, "
        "user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()


def test_mann_whitney_matches_python_replay(spark, sf_dir):
    """U from tie-averaged ranks computed the naive O(n log n) way in
    Python must equal the domain-bounded groupBy formulation."""
    rows = _events(sf_dir)
    a = sorted(c for t, c, _, _ in rows if t == "purchase")
    b = sorted(c for t, c, _, _ in rows if t == "click")
    merged = sorted((c, s) for s, xs in (("a", a), ("b", b)) for c in xs)
    # average ranks with ties
    ranks: dict[int, float] = {}
    i = 0
    while i < len(merged):
        j = i
        while j < len(merged) and merged[j][0] == merged[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        ranks[merged[i][0]] = avg
        i = j
    r_a = sum(ranks[c] for c in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    out = QUERIES["q_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["u_stat"] - u_a) < 0.51  # rounded to 1 dp
    assert -1.0 <= out["rank_biserial"] <= 1.0
    assert 0.0 <= out["u_stat"] <= len(a) * len(b)


def test_ks_matches_python_ecdf(spark, sf_dir):
    rows = _events(sf_dir)
    a = sorted(c for t, c, _, _ in rows if t == "purchase")
    b = sorted(c for t, c, _, _ in rows if t == "view")
    grid = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b)
        )
        for x in grid
    )
    out = QUERIES["q_ks_two_sample"](spark, sf_dir).collect()[0]
    assert abs(out["d_stat"] - d) < 1e-5
    assert 0.0 <= out["d_stat"] <= 1.0
    assert out["reject_05"] == (out["d_stat"] > out["d_crit_05"])


def test_bh_rejections_are_a_prefix_and_thresholds_monotone(spark, sf_dir):
    rows = QUERIES["q_bh_fdr_discoveries"](spark, sf_dir).collect()
    assert rows and len(rows) <= 25
    ps = [r["p_bound"] for r in rows]
    assert ps == sorted(ps)  # ranked by p
    rej = [r["rejected"] for r in rows]
    # BH rejects a prefix of the sorted p-values
    assert all(rej[i] or not rej[i + 1] for i in range(len(rej) - 1))
    for r in rows:
        assert 0.0 <= r["p_bound"] <= 1.0
        assert r["n"] >= 10


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    """The window formulation (cumsum minus running extremum) must
    equal Page's textbook sequential recursion replayed in Python."""
    rows = _events(sf_dir)
    daily: dict[str, int] = {}
    for t, c, _, day in rows:
        if t == "purchase":
            daily[day] = daily.get(day, 0) + c
    days = sorted(daily)
    mean = sum(daily.values()) / len(days)
    s_pos = s_neg = 0.0
    expect = {}
    for d in days:
        s_pos = max(0.0, s_pos + (daily[d] - mean))
        s_neg = max(0.0, s_neg + (mean - daily[d]))
        expect[d] = (s_pos / 100.0, s_neg / 100.0)
    out = QUERIES["q_cusum_changepoint"](spark, sf_dir).collect()
    assert len(out) == len(days)
    for r in out:
        ep, en = expect[r["day"]]
        assert abs(r["cusum_pos"] - ep) < 0.01
        assert abs(r["cusum_neg"] - en) < 0.01
        assert r["cusum_pos"] >= 0.0 and r["cusum_neg"] >= 0.0


def test_acf_matches_python_and_bounded(spark, sf_dir):
    rows = _events(sf_dir)
    daily: dict[str, int] = {}
    for _, c, _, day in rows:
        daily[day] = daily.get(day, 0) + c
    xs = [daily[d] for d in sorted(daily)]
    mean = sum(xs) / len(xs)
    den = sum((x - mean) ** 2 for x in xs)
    out = {r["lag"]: r for r in QUERIES["q_autocorr_acf"](spark, sf_dir).collect()}
    assert set(out) == {1, 2, 3, 7}
    for k, r in out.items():
        num = sum(
            (xs[i] - mean) * (xs[i - k] - mean) for i in range(k, len(xs))
        )
        assert abs(r["acf"] - num / den) < 1e-5
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] == len(xs) - k
