"""Mergeable histogram quantile sketch — the missing classic in the
sketch family (HLL = distinct, CountMin = frequency, KMV = set
overlap, Bloom = membership; THIS = quantiles).

Exact percentiles need a global sort (or a full value histogram, which
the winsorized/percentile queries already use at value-domain
cardinality). The production pattern at 100 TB is a FIXED-BIN
histogram: per-partition bin counts are one map-side aggregate, bins
merge by ADDITION (associative/commutative — the same mergeability as
HLL register max), and any quantile reads off the cumulative counts.
Error is bounded by bin width; state is bins × groups regardless of
row count — the trade every serving system (Prometheus, HDR-histogram)
makes. ``streaming/histogram_maintain.py`` folds the same bins
incrementally under the crash-safe swap + batch-id markers.

Determinism discipline: bin index, cumulative ranks, and the midpoint
estimate are ALL integer arithmetic (cents, truncating div), written
identically in both engines; the only float is the terminal /100
dollars conversion.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import register, table

HQ_WIDTH_CENTS = 400        # bin width: $4
HQ_BINS = 256               # covers values up to $1024, clamp above
_HQ_QS = (50, 90, 99)


def value_bins(events):
    """(bin, n) integer histogram of event value cents — the sketch.
    One map-side-combinable aggregate; ≤ HQ_BINS rows out."""
    b = F.expr(f"least(CAST(round(value * 100) AS BIGINT)"
               f" div {HQ_WIDTH_CENTS}, {HQ_BINS - 1})")
    return (events.filter(F.col("value").isNotNull())
            .select(b.cast("long").alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("n")))


@register(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH h AS (
      SELECT least(CAST(round(value * 100) AS BIGINT)
                   // {HQ_WIDTH_CENTS}, {HQ_BINS - 1}) AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    c AS (
      SELECT bin, n,
             sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER () AS total
      FROM h),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q),
    r AS (
      SELECT qs.q,
             min(c.bin) AS qbin,
             max(c.total) AS total
      FROM qs JOIN c
        ON c.cum * 100 >= qs.q * c.total
      GROUP BY qs.q)
    SELECT CAST(q AS INT) AS q,
           CAST(total AS BIGINT) AS n_rows,
           round((qbin * {HQ_WIDTH_CENTS} + {HQ_WIDTH_CENTS} // 2)
                 / 100.0, 2) AS est_value
    FROM r
    """,
    tags=("sketch", "stats"),
)
def sketch_histogram_quantiles(spark, sf_dir):
    """P50/P90/P99 of event value from the fixed-bin histogram sketch:
    rank r(q) = smallest bin whose cumulative count covers q% of rows
    (integer cross-multiplication ``cum·100 ≥ q·total`` — no float
    ranks), estimate = bin midpoint in cents. Accuracy is ±half a bin
    width ($2 here) by construction. The cumulative window runs over
    at most 256 bins — a constant — so the whole quantile read costs one
    tiny ordered pass after a map-side-combinable aggregate; at 1000
    executors the fact scan never shuffles more than bins × partitions
    partial rows."""
    h = value_bins(table(spark, sf_dir, "events"))
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    wt = Window.partitionBy()
    c = h.select("bin", F.sum("n").over(wc).alias("cum"),
                 F.sum("n").over(wt).alias("total"))
    qs = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(q) for q in _HQ_QS])).alias("q"))
    r = (qs.join(F.broadcast(c),
                 F.col("cum") * 100 >= F.col("q") * F.col("total"))
         .groupBy("q")
         .agg(F.min("bin").alias("qbin"), F.max("total").alias("total")))
    return r.select(
        F.col("q").cast("int").alias("q"),
        F.col("total").cast("long").alias("n_rows"),
        F.round((F.col("qbin") * HQ_WIDTH_CENTS + HQ_WIDTH_CENTS // 2)
                / 100.0, 2).alias("est_value"))


@register(
    "sketch_histogram_quantiles_by_type",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             least(CAST(round(value * 100) AS BIGINT)
                   // {HQ_WIDTH_CENTS}, {HQ_BINS - 1}) AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM h),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q),
    r AS (
      SELECT c.event_type, qs.q,
             min(c.bin) AS qbin,
             max(c.total) AS total
      FROM qs JOIN c
        ON c.cum * 100 >= qs.q * c.total
      GROUP BY c.event_type, qs.q)
    SELECT event_type, CAST(q AS INT) AS q,
           CAST(total AS BIGINT) AS n_rows,
           round((qbin * {HQ_WIDTH_CENTS} + {HQ_WIDTH_CENTS} // 2)
                 / 100.0, 2) AS est_value
    FROM r
    """,
    tags=("sketch", "stats"),
)
def sketch_histogram_quantiles_by_type(spark, sf_dir):
    """Per-event-type P50/P90/P99 from the grouped histogram sketch —
    the percentile-dashboard shape (latency by endpoint, value by
    type). Same integer discipline as the global form; the cumulative
    window partitions by the group key, so per-group state stays at
    most HQ_BINS rows and the groups parallelize independently —
    quantiles over any number of groups cost one map-side-combinable
    aggregate plus a bins-sized ordered pass per group."""
    ev = table(spark, sf_dir, "events")
    b = F.expr(f"least(CAST(round(value * 100) AS BIGINT)"
               f" div {HQ_WIDTH_CENTS}, {HQ_BINS - 1})")
    h = (ev.filter(F.col("value").isNotNull())
         .select("event_type", b.cast("long").alias("bin"))
         .groupBy("event_type", "bin").agg(F.count("*").alias("n")))
    wc = (Window.partitionBy("event_type").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("event_type")
    c = h.select("event_type", "bin",
                 F.sum("n").over(wc).alias("cum"),
                 F.sum("n").over(wt).alias("total"))
    qs = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(q) for q in _HQ_QS])).alias("q"))
    r = (qs.join(F.broadcast(c),
                 F.col("cum") * 100 >= F.col("q") * F.col("total"))
         .groupBy("event_type", "q")
         .agg(F.min("bin").alias("qbin"), F.max("total").alias("total")))
    return r.select(
        "event_type", F.col("q").cast("int").alias("q"),
        F.col("total").cast("long").alias("n_rows"),
        F.round((F.col("qbin") * HQ_WIDTH_CENTS + HQ_WIDTH_CENTS // 2)
                / 100.0, 2).alias("est_value"))


# ------------------------------------------------- per-group KMV

_KB_K = 256


@register(
    "sketch_kmv_distinct_by_type",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL),
    bk AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY h) AS rn
           FROM hv),
    kk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
                  max(h) AS hk
           FROM bk WHERE rn <= {_KB_K} GROUP BY 1),
    ex AS (SELECT event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM events WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT event_type, n_kept,
           CASE WHEN n_kept < {_KB_K} THEN CAST(n_kept AS DOUBLE)
                ELSE CAST(round(CAST({_KB_K - 1} AS DOUBLE)
                                * {1 << 60} / hk, 2) AS DOUBLE)
           END AS kmv_est,
           n_exact
    FROM kk JOIN ex USING (event_type)
    """,
    tags=("sketch", "agg", "streaming-twin"),
)
def sketch_kmv_distinct_by_type(spark, sf_dir):
    """Per-event-type KMV bottom-k distinct-user sketch + estimate,
    exact count as the audit column — the BATCH twin of the
    streaming fold in `streaming/kmv_maintain.py` (identical md5
    15-hex arithmetic, so maintained state equals this query's sketch
    byte-for-byte; the stream-equals-batch test pins it). Below k
    retained hashes the sketch is the distinct hash set and the
    estimate is exact, so both estimator branches are exercised
    across SFs. Per-group bottom-k is one hash shuffle on (type, h)
    then a k-bounded window; state out is <= k longs per group."""
    from ..streaming.kmv_maintain import (
        estimate_distinct_by_type, type_user_hashes, _bottom_k)
    ev = table(spark, sf_dir, "events")
    sk = _bottom_k(type_user_hashes(ev), _KB_K)
    ex = (ev.filter(F.col("user_id").isNotNull())
          .groupBy("event_type")
          .agg(F.countDistinct("user_id").alias("n_exact")))
    return (estimate_distinct_by_type(sk, _KB_K)
            .join(ex, "event_type")
            .select("event_type", "n_kept", "kmv_est", "n_exact"))


# ------------------------------------------------ priority sampling

_PRIO_K = 64


@register(
    "sample_priority_topk",
    oracle=f"""
    WITH w AS (
      SELECT o_orderkey AS okey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS w,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                  1, 15)) AS BIGINT) + 1 AS u
      FROM orders),
    pr AS (SELECT okey, w,
                  CAST(CAST(w AS HUGEINT) * {1 << 60} // u AS BIGINT)
                    AS p,
                  row_number() OVER (ORDER BY
                    CAST(CAST(w AS HUGEINT) * {1 << 60} // u AS BIGINT)
                      DESC, okey) AS rn
           FROM w),
    tau AS (SELECT p AS tau FROM pr WHERE rn = {_PRIO_K + 1}),
    est AS (SELECT CAST(sum(greatest(w, tau)) AS BIGINT)
              AS est_total_cents
            FROM pr CROSS JOIN tau WHERE rn <= {_PRIO_K}),
    ex AS (SELECT CAST(sum(w) AS BIGINT) AS exact_total_cents,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM w)
    SELECT {_PRIO_K} AS k, n_rows, tau, est_total_cents,
           exact_total_cents,
           CAST(abs(est_total_cents - exact_total_cents)
                * CAST(1000000 AS HUGEINT)
                // exact_total_cents AS BIGINT) AS err_ppm
    FROM est CROSS JOIN ex CROSS JOIN tau
    """,
    tags=("sample", "sketch"),
)
def sample_priority_topk(spark, sf_dir):
    """Priority sampling (Duffield-Lund-Thorup): weight-aware
    without-replacement sample of k orders with an UNBIASED total
    estimator — priority p_i = w_i/u_i with u_i uniform in (0,1],
    keep the top k, threshold tau = the (k+1)-th priority, and
    estimate sum(w) by sum over the sample of max(w_i, tau). The
    deterministic-u discipline of every sampling query here: u_i is
    the md5 15-hex prefix of the key (+1 to dodge the zero divisor),
    so membership is reproducible across engines, retries, and
    appends. p and tau are exact truncating DECIMAL(38,0)/HUGEINT
    ratios (w*2^60 passes int64); the audit columns carry the exact
    total and the ppm error of the estimate.

    Scale shape: top-(k+1) by priority is TakeOrdered (per-partition
    heap + (k+1)-row driver merge, no global sort); the estimator is
    one aggregate over k rows. This is the sampling primitive for
    'estimate sum(spend) from a fixed-size sample with heavy items
    always in' — the weighted complement of bottom-k KMV."""
    from pyspark.sql.window import Window as W

    o = table(spark, sf_dir, "orders")
    w = o.select(
        F.col("o_orderkey").alias("okey"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("w"),
        (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                            1, 15), 16, 10).cast("long") + 1).alias("u"))
    # top-(k+1) via sort-limit => TakeOrderedAndProject (per-partition
    # heap + tiny driver merge); the rank window then runs on k+1 rows
    topk1 = (w.withColumn(
        "p", F.expr(f"CAST(CAST(w AS DECIMAL(38,0)) * {1 << 60}"
                    " div u AS BIGINT)"))
        .orderBy(F.desc("p"), "okey").limit(_PRIO_K + 1))
    pr = topk1.withColumn("rn", F.row_number().over(
        W.orderBy(F.desc("p"), "okey")))
    tau = (pr.filter(F.col("rn") == _PRIO_K + 1)
           .select(F.col("p").alias("tau")))
    est = (pr.filter(F.col("rn") <= _PRIO_K)
           .crossJoin(F.broadcast(tau))
           .agg(F.sum(F.greatest("w", "tau")).cast("long")
                .alias("est_total_cents")))
    ex = w.agg(F.sum("w").cast("long").alias("exact_total_cents"),
               F.count("*").alias("n_rows"))
    return (est.crossJoin(F.broadcast(ex)).crossJoin(F.broadcast(tau))
            .select(F.lit(_PRIO_K).cast("int").alias("k"),
                    "n_rows", "tau", "est_total_cents",
                    "exact_total_cents",
                    F.expr("CAST(abs(est_total_cents -"
                           " exact_total_cents)"
                           " * CAST(1000000 AS DECIMAL(38,0))"
                           " div exact_total_cents AS BIGINT)")
                    .alias("err_ppm")))


# ------------------------- KLL-shaped level-sampling quantile sketch
#
# The fixed-bin histogram sketch above is right for bounded integer
# domains (money in cents) and wrong for arbitrary-range metrics: the
# bin width bakes the domain in. This closes the gap (VERDICT r10
# §next 6) with the hash-coin LEVEL-SAMPLING form of the KLL compactor
# cascade (Karnin-Lang-Liberty, FOCS 2016): an item survives level L
# iff the low L bits of its 60-bit md5 item-hash are zero, so the
# retained sample is a deterministic 2^-L uniform thinning with every
# survivor weighing 2^L. Rank error is O(1/sqrt(K)) like the paper's
# single-compactor bound; the full KLL cascade only improves the
# constant. Two properties the fixed-bin sketch cannot offer:
#   - domain-free: no bin width, any value range, floats included;
#   - MERGEABLE BY UNION: inclusion masks are nested (h & mask(L) = 0
#     implies h & mask(L') = 0 for L' <= L), so merging sketches built
#     at different levels is union + one re-thin at the combined
#     level — bit-identical to sketching the concatenated input
#     (pinned by tests/test_sketches.py).
# Determinism: the "coins" are item hashes, so both engines and any
# partitioning produce the SAME sample — the same discipline that made
# KMV/HLL oracle-expressible.

KLL_K = 256            # target sample size (error ~ 1/sqrt(K) ≈ 6%)
_KLL_QS = (50, 90, 99)
_KLL_QLIST = "[" + ", ".join(str(q) for q in _KLL_QS) + "]"

# level: smallest L with n/2^L <= K, as pure integer bit-width
# arithmetic — L = bit_length(ceil(n/K) - 1); never floor(log2()).
_KLL_LVL_SQL = ("CAST(CASE WHEN {n} <= {k} THEN 0 ELSE "
                "length(bin(({n} + {k1}) {div} {k} - 1)) END AS INT)")


def kll_hash(key_col):
    """60-bit md5 item hash — the deterministic coin supply."""
    return F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                              1, 15), 16, 10).cast("long")


def kll_level(n_col, k: int = KLL_K):
    return F.expr(_KLL_LVL_SQL.format(n=n_col, k=k, k1=k - 1, div="div"))


def kll_sample(hv, level_col: str = "lvl"):
    """Thin a (cents, h) relation to the survivors of ``level_col``:
    keep rows whose low ``lvl`` hash bits are zero (weight 2^lvl
    each). ``lvl`` arrives as a 1-row broadcast (global) or a join on
    the group key (per-group form)."""
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), {level_col}) - 1")
    return hv.filter((F.col("h").bitwiseAND(mask)) == 0)


@register(
    "sketch_kll_quantiles",
    oracle=f"""
    WITH hv AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
      FROM orders),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hv),
    lvl AS (SELECT n,
                   {_KLL_LVL_SQL.format(n="n", k=KLL_K, k1=KLL_K - 1,
                                        div="//")} AS lvl
            FROM n),
    s AS (SELECT cents, h FROM hv, lvl
          WHERE (h & ((CAST(1 AS BIGINT) << lvl) - 1)) = 0),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, h) AS rn,
             count(*) OVER () AS ms
      FROM s),
    qs AS (SELECT unnest({_KLL_QLIST}) AS q),
    r AS (
      SELECT qs.q, min(ranked.cents) AS qc, max(ranked.ms) AS ms
      FROM qs JOIN ranked ON ranked.rn * 100 >= qs.q * ranked.ms
      GROUP BY qs.q)
    SELECT CAST(q AS INT) AS q, lvl.lvl AS level,
           lvl.n AS n_rows, CAST(ms AS BIGINT) AS sample_size,
           round(qc / 100.0, 2) AS est_value
    FROM r, lvl
    """,
    tags=("sketch", "stats"),
)
def sketch_kll_quantiles(spark, sf_dir):
    """P50/P90/P99 of order totals from the level-sampling sketch —
    a domain the fixed-bin sketch can't hold (totals run to ~$500k;
    $4 bins would need 125k of them, and a float metric would need
    none of this). One scan computes (cents, hash); the count fixes
    the level; the thinned sample (≤ ~K rows) is sorted once and the
    nearest-rank read is integer cross-multiplication, exactly like
    the histogram sketch. At 100 TB the thinning predicate pushes to
    the scan side of every shuffle: only ~K rows ever leave the map
    stage, whatever the row count; merges across shards are unions
    plus one re-thin."""
    hv = kll_order_rows(table(spark, sf_dir, "orders"))
    lvl = (hv.agg(F.count("*").cast("long").alias("n"))
           .select("n", kll_level("n").alias("lvl")))
    s = kll_sample(hv.crossJoin(F.broadcast(lvl)))
    return kll_quantile_read(spark, s, lvl)


def kll_order_rows(orders):
    """(cents, h) sketch input rows — shared by the batch query above
    and the streaming fold (``streaming/kll_maintain.py``), so the
    maintained sample is the batch sample by construction."""
    return orders.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        kll_hash("o_orderkey").alias("h"))


def kll_quantile_read(spark, s, lvl):
    """Quantile read over a level-thinned sample ``s`` (cents, h) and
    a 1-row (n, lvl) relation — shared by the batch query and the
    maintained-state read (stream≡batch by shared code)."""
    ranked = s.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "h")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("ms"))
    qs = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(q) for q in _KLL_QS])).alias("q"))
    r = (qs.join(F.broadcast(ranked),
                 F.col("rn") * 100 >= F.col("q") * F.col("ms"))
         .groupBy("q")
         .agg(F.min("cents").alias("qc"), F.max("ms").alias("ms")))
    return (r.crossJoin(F.broadcast(lvl))
            .select(F.col("q").cast("int").alias("q"),
                    F.col("lvl").alias("level"),
                    F.col("n").alias("n_rows"),
                    F.col("ms").cast("long").alias("sample_size"),
                    F.round(F.col("qc") / 100.0, 2).alias("est_value")))


@register(
    "sketch_kll_quantiles_by_priority",
    oracle=f"""
    WITH hv AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
      FROM orders),
    n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM hv GROUP BY 1),
    lvl AS (SELECT grp, n,
                   {_KLL_LVL_SQL.format(n="n", k=KLL_K, k1=KLL_K - 1,
                                        div="//")} AS lvl
            FROM n),
    s AS (SELECT hv.grp, hv.cents, hv.h
          FROM hv JOIN lvl ON lvl.grp = hv.grp
          WHERE (h & ((CAST(1 AS BIGINT) << lvl) - 1)) = 0),
    ranked AS (
      SELECT grp, cents,
             row_number() OVER (PARTITION BY grp ORDER BY cents, h) AS rn,
             count(*) OVER (PARTITION BY grp) AS ms
      FROM s),
    qs AS (SELECT unnest({_KLL_QLIST}) AS q),
    r AS (
      SELECT ranked.grp, qs.q, min(ranked.cents) AS qc,
             max(ranked.ms) AS ms
      FROM qs JOIN ranked ON ranked.rn * 100 >= qs.q * ranked.ms
      GROUP BY ranked.grp, qs.q)
    SELECT r.grp AS o_orderpriority, CAST(r.q AS INT) AS q,
           lvl.lvl AS level, lvl.n AS n_rows,
           CAST(r.ms AS BIGINT) AS sample_size,
           round(r.qc / 100.0, 2) AS est_value
    FROM r JOIN lvl ON lvl.grp = r.grp
    """,
    tags=("sketch", "stats"),
)
def sketch_kll_quantiles_by_priority(spark, sf_dir):
    """Per-group form: each order priority carries its own level
    (smaller groups thin less — the sketch adapts state to group
    size, K rows per group max). The group key partitions both the
    rank window and the level join, so state is groups × K no matter
    the fact size — the per-key generalization every serving system
    needs."""
    o = table(spark, sf_dir, "orders")
    hv = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        kll_hash("o_orderkey").alias("h"))
    lvl = (hv.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
           .select("grp", "n", kll_level("n").alias("lvl")))
    s = kll_sample(hv.join(lvl, "grp"))
    ranked = s.select(
        "grp", "cents",
        F.row_number().over(Window.partitionBy("grp").orderBy("cents", "h"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("grp")).alias("ms"))
    qs = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(q) for q in _KLL_QS])).alias("q"))
    r = (qs.join(ranked,
                 F.col("rn") * 100 >= F.col("q") * F.col("ms"))
         .groupBy("grp", "q")
         .agg(F.min("cents").alias("qc"), F.max("ms").alias("ms")))
    return (r.join(lvl, "grp")
            .select(F.col("grp").alias("o_orderpriority"),
                    F.col("q").cast("int").alias("q"),
                    F.col("lvl").alias("level"),
                    F.col("n").alias("n_rows"),
                    F.col("ms").cast("long").alias("sample_size"),
                    F.round(F.col("qc") / 100.0, 2).alias("est_value")))
