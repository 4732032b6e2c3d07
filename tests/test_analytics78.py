"""Behavior tests for the round-4 continuation operators
(analytics7/analytics8) — semantic properties the oracle-parity hash
can't express on its own."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkstreamingproject_spark.queries import REGISTRY


def test_cusum_matches_bruteforce_recurrence(spark, sf_dir):
    """The telescoped window form (prefix-sum − running-min) must equal
    the literal S_t = max(0, S_{t-1} + (x_t − mean)) recurrence."""
    rows = REGISTRY["ts_cusum_nation_drift"].fn(spark, sf_dir).collect()
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    total = sum(r.x for r in rows)
    mean = total / len(rows)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.day)
        s = 0.0
        for r in rs:
            s = max(0.0, s + (r.x - mean))
            assert math.isclose(r.cusum, round(s, 4), abs_tol=2e-4), (
                f"{nation} {r.day}: window {r.cusum} vs recurrence {s}")


def test_ewma_matches_numpy_kernel(spark, sf_dir):
    """Truncated-EWMA output equals the renormalized weighted sum
    computed independently in Python over the same daily series."""
    from sparkstreamingproject_spark.queries.analytics7 import (
        _EWMA_ALPHA, _EWMA_K,
    )
    out = REGISTRY["ts_ewma_priority_revenue"].fn(spark, sf_dir).collect()
    series: dict = {}
    for r in out:
        series.setdefault(r.o_orderpriority, []).append(r)
    for prio, rs in series.items():
        rs.sort(key=lambda r: r.day)
        cents = [int(round(r.revenue * 100)) for r in rs]
        for t, r in enumerate(rs):
            num = den = 0.0
            for i in range(min(_EWMA_K, t + 1)):
                w = (1.0 - _EWMA_ALPHA) ** i
                num += w * cents[t - i]
                den += w
            assert math.isclose(r.ewma, round(num / den / 100.0, 4),
                                abs_tol=2e-4), f"{prio} {r.day}"


def test_fuzzy_blocked_join_is_complete(spark, sf_dir):
    """Multi-pass blocking (first-char ∪ last-char, ±1 length band)
    must recover EVERY single-deletion probe at distance ≤ 1, and the
    canonical match must be a real dictionary name."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n_parts = part.count()
    names = {r.p_name for r in part.select("p_name").distinct().collect()}
    out = REGISTRY["join_fuzzy_blocked"].fn(spark, sf_dir).collect()
    # every probe is a one-char deletion of an existing name -> every
    # probe must find at least one verified match
    assert len(out) == n_parts
    for r in out:
        assert r.dist <= 1
        assert r.matched_name in names
        assert r.n_candidates >= 1


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """state ⊕ delta must reproduce the direct full-history rollup —
    the invariant that makes incremental maintenance trustworthy."""
    merged = {r.day: (r.n_orders, r.revenue)
              for r in REGISTRY["agg_incremental_merge"]
              .fn(spark, sf_dir).collect()}
    direct = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .groupBy(F.to_date("o_orderdate").alias("day"))
              .agg(F.count("*").alias("n"),
                   F.round(F.sum(F.expr(
                       "CAST(round(o_totalprice * 100) AS BIGINT)"))
                       / 100.0, 2).alias("rev")).collect())
    assert merged == {r.day: (r.n, r.rev) for r in direct}


def test_dq_report_known_violations(spark, sf_dir):
    """On the synthetic TPC-H data every expectation passes except
    ship-date ordering is allowed to have violations only if the data
    actually contains them (report must agree with direct counts)."""
    rep = {r.expectation: r
           for r in REGISTRY["dq_expectations_report"]
           .fn(spark, sf_dir).collect()}
    assert len(rep) == 6
    for name, r in rep.items():
        assert r.n_checked > 0
        assert (r.passed == 1) == (r.n_violations == 0)
    # structural expectations hold on the generated data
    assert rep["orders.o_orderkey unique"].passed == 1
    assert rep["lineitem.l_orderkey fk orders"].passed == 1
    assert rep["customer.c_name not null"].passed == 1


def test_seasonal_decompose_identity(spark, sf_dir):
    """trend + seasonal + residual must reconstruct the observation
    (up to the 4dp rounding of each component)."""
    out = REGISTRY["ts_seasonal_decompose"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert abs(r.x - (r.trend + r.seasonal + r.residual)) < 3e-4


def test_bpe_first_merge_matches_bruteforce(spark, sf_dir):
    """Iteration-1 winner must be the true most-frequent adjacent
    character pair (freq-weighted), counted independently in Python."""
    from collections import Counter
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    wc: Counter = Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wc[w] += 1
    pc: Counter = Counter()
    for w, f in wc.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += f
    best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {r.iteration: r
           for r in REGISTRY["bpe_learn_merges"].fn(spark, sf_dir)
           .collect()}
    assert len(out) == 3
    assert (out[1].l, out[1].r) == best[0]
    assert out[1].cnt == best[1]
    # later merges build on earlier symbols: each side is a single
    # character or a previously learned merge
    learned: set = set()
    for it in (1, 2, 3):
        r = out[it]
        assert all(len(part) == 1 or part in learned
                   for part in (r.l, r.r))
        learned.add(r.l + r.r)


def test_poisson_bootstrap_ci_brackets_mean(spark, sf_dir):
    """The 90% bootstrap CI must be a proper interval around the point
    estimate for a well-behaved mean."""
    r = REGISTRY["sample_poisson_bootstrap"].fn(spark, sf_dir).collect()[0]
    assert r.ci_lo < r.ci_hi
    assert r.ci_lo <= r.mean <= r.ci_hi
    # CI width is O(sd/sqrt(n)) — sanity: within 10% of the mean
    assert (r.ci_hi - r.ci_lo) < 0.1 * r.mean


def test_winsorized_stats_bounds(spark, sf_dir):
    """Winsorized mean sits inside the raw value range and the std is
    no larger than the raw std (clipping cannot widen spread)."""
    raw = (spark.read.parquet(f"{sf_dir}/events.parquet")
           .filter(F.col("value").isNotNull())
           .groupBy("event_type")
           .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
                F.stddev("value").alias("sd")).collect())
    bounds = {r.event_type: r for r in raw}
    for r in REGISTRY["agg_winsorized_stats"].fn(spark, sf_dir).collect():
        b = bounds[r.event_type]
        assert b.lo - 0.01 <= r.wins_mean <= b.hi + 0.01
        assert r.wins_std <= b.sd + 1e-6


def test_chi_square_family_statistics_are_nonnegative(spark, sf_dir):
    """Oracle parity cannot catch algebra that is wrong IDENTICALLY in
    both engines (the r04 Friedman /4 bug). Chi-square-family
    statistics are nonnegative by definition — pin that property."""
    from sparkstreamingproject_spark.queries import REGISTRY
    checks = {
        "stat_friedman_test": "q_stat",
        "stat_kruskal_wallis": "h_stat",
        "stat_chi_square": None,  # first double col
        "stat_anova_oneway": "f_stat",
    }
    for name, col in checks.items():
        row = REGISTRY[name].fn(spark, sf_dir).first()
        if col is None:
            vals = [v for v in row if isinstance(v, float)]
        else:
            vals = [row[col]]
        for v in vals:
            assert v is not None and v >= 0, f"{name}: {col}={v}"


def test_friedman_perfect_agreement_equals_2n(spark):
    """Friedman Q on perfectly consistent blocks must equal 2n for
    k=3 (closed form) — an absolute-value check no oracle can fake."""
    from pyspark.sql import functions as F

    from sparkstreamingproject_spark.queries.analytics15 import (
        stat_friedman_test)
    import sparkstreamingproject_spark.queries.analytics15 as a15

    # 6 blocks where 1993 < 1994 < 1995 spend strictly, built by
    # monkey-driving the query over a fabricated orders/customer pair
    rows_o, rows_c = [], []
    for b in range(6):
        rows_c.append((b, b))
        for yi, y in enumerate(a15._FR_YEARS):
            rows_o.append((b * 10 + yi, b, f"{y}-06-01", 100.0 * (yi + 1)))
    o = spark.createDataFrame(
        rows_o, ["o_orderkey", "o_custkey", "d", "o_totalprice"]
    ).withColumn("o_orderdate", F.col("d").cast("timestamp")).drop("d")
    c = spark.createDataFrame(rows_c, ["c_custkey", "c_nationkey"])

    import sparkstreamingproject_spark.queries.base as base
    orig = base.table
    try:
        base.table = lambda s, sd, n: {"orders": o, "customer": c}[n]
        a15.table = base.table
        out = stat_friedman_test(spark, "ignored").first()
    finally:
        base.table = orig
        a15.table = orig
    assert out["n"] == 6
    assert abs(out["q_stat"] - 12.0) < 1e-9  # 2n = 12 for n=6, k=3
