"""Round-4 continuation additions (round-5 driver-window candidates):
exponential smoothing, CUSUM drift detection, cross-document
boilerplate measurement, KMV set-intersection sketching, Theil–Sen
robust trend, and key-skew diagnostics.

Float discipline (queries/base.py): integer/DECIMAL accumulation
everywhere an aggregate crosses partitions; float math only in
fixed-arity textual expressions evaluated identically by both engines
(a truncated EWMA kernel, a pairwise slope, a terminal division).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..llm import dedup as D
from .base import register, table

# ------------------------------------------------------------ EWMA

_EWMA_ALPHA = 0.3
_EWMA_K = 8  # truncated lookback (rows)
# full-precision literals; both engines parse the repr back to the
# identical double, and the kernel is a fixed left-associative sum —
# no data-dependent accumulation order anywhere
_EWMA_W = [repr((1.0 - _EWMA_ALPHA) ** i) for i in range(_EWMA_K)]

_EWMA_NUM = " + ".join(
    f"coalesce({w} * x{i}, 0.0)" for i, w in enumerate(_EWMA_W))
_EWMA_DEN = " + ".join(
    f"(CASE WHEN x{i} IS NOT NULL THEN {w} ELSE 0.0 END)"
    for i, w in enumerate(_EWMA_W))
_EWMA_LAGS_SQL = ",\n             ".join(
    ["cents AS x0"]
    + [f"lag(cents, {i}) OVER (PARTITION BY o_orderpriority "
       f"ORDER BY day) AS x{i}" for i in range(1, _EWMA_K)])


@register(
    "ts_ewma_priority_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    l AS (SELECT o_orderpriority, day,
             {_EWMA_LAGS_SQL}
          FROM daily)
    SELECT o_orderpriority, day,
           round(x0 / 100.0, 2) AS revenue,
           round(({_EWMA_NUM}) / ({_EWMA_DEN}) / 100.0, 4) AS ewma
    FROM l
    """,
    tags=("timeseries", "window", "stats"),
)
def ts_ewma_priority_revenue(spark, sf_dir):
    """Exponentially-weighted moving average of daily revenue per
    order priority — the standard low-lag smoother next to the plain
    moving average (`ts_moving_avg_pct_change`).

    True EWMA is a running recurrence (order-dependent float state);
    this is the truncated form every at-scale system actually ships:
    the last K=8 observations with weights (1-α)^i, renormalized over
    the lags that exist. The kernel is ONE fixed-arity expression over
    window lags — no data-dependent summation order, so the result is
    bit-stable under any partitioning (the r03 covariance lesson).
    Daily revenue accumulates as exact integer cents BEFORE any float
    touches it. The ordered window runs per priority over the daily
    aggregate — dimension × |days| rows, never the order stream."""
    daily = (table(spark, sf_dir, "orders")
             .groupBy("o_orderpriority",
                      F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(F.expr(
                 "CAST(round(o_totalprice * 100) AS BIGINT)"))
                 .alias("cents")))
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    lagged = daily.select(
        "o_orderpriority", "day", F.col("cents").alias("x0"),
        *[F.lag("cents", i).over(w).alias(f"x{i}")
          for i in range(1, _EWMA_K)])
    return lagged.select(
        "o_orderpriority", "day",
        F.round(F.col("x0") / 100.0, 2).alias("revenue"),
        F.round(F.expr(f"({_EWMA_NUM}) / ({_EWMA_DEN})") / 100.0, 4)
        .alias("ewma"))


# ------------------------------------------------------------ CUSUM

@register(
    "ts_cusum_nation_drift",
    oracle="""
    WITH d AS (
      SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
             count(*) AS x
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2),
    g AS (SELECT CAST(sum(x) AS BIGINT) AS total,
                 count(*) AS nrows FROM d),
    r AS (
      SELECT d.n_name, d.day, d.x, g.nrows,
             g.nrows * CAST(sum(d.x) OVER w AS BIGINT)
               - g.total * row_number() OVER w AS rr
      FROM d, g
      WINDOW w AS (PARTITION BY d.n_name ORDER BY d.day)),
    s AS (
      SELECT n_name, day, x, nrows,
             rr - least(min(rr) OVER (PARTITION BY n_name ORDER BY day),
                        0) AS sc
      FROM r)
    SELECT n_name, day, x,
           round(sc / nrows, 4) AS cusum,
           CAST(CASE WHEN sc > 100 * nrows THEN 1 ELSE 0 END AS INT)
             AS is_drift
    FROM s
    """,
    tags=("timeseries", "window", "stats"),
)
def ts_cusum_nation_drift(spark, sf_dir):
    """One-sided CUSUM drift detector over each nation's daily order
    volume: S_t = max(0, S_{t-1} + (x_t - mean)) flags nations whose
    volume runs persistently above the global per-(nation,day) mean —
    the classic sequential change-point statistic.

    The recurrence looks inherently serial, but
    max(0, S+y) telescopes to S_t = R_t - min(0, min_{j<=t} R_j)
    where R is the prefix sum of residuals — two stock window
    functions, no iteration and no stateful UDF. Residuals stay exact
    integers by scaling with the global row count (R = nrows·prefix -
    total·t), so every accumulation is order-free BIGINT; the single
    division by nrows happens at output. Windows run over the
    (nation × day) aggregate — dimension cardinality."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    d = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy("n_name", F.to_date("o_orderdate").alias("day"))
         .agg(F.count("*").alias("x")))
    g = d.agg(F.sum("x").alias("total"), F.count("*").alias("nrows"))
    w = Window.partitionBy("n_name").orderBy("day")
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = (d.crossJoin(F.broadcast(g))
         .withColumn("rr", F.col("nrows") * F.sum("x").over(wp)
                     - F.col("total") * F.row_number().over(w)))
    s = r.withColumn(
        "sc", F.col("rr") - F.least(F.min("rr").over(wp), F.lit(0)))
    return s.select(
        "n_name", "day", "x",
        F.round(F.col("sc") / F.col("nrows"), 4).alias("cusum"),
        F.when(F.col("sc") > 100 * F.col("nrows"), 1).otherwise(0)
        .cast("int").alias("is_drift"))


# ------------------------------------- cross-document boilerplate

@register(
    "corpus_boilerplate_shingles",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
               AS shingle
      FROM words),
    df AS (SELECT shingle, count(DISTINCT doc_id) AS ndocs
           FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shared,
           round(sum(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS boilerplate_frac
    FROM sh s JOIN df ON s.shingle = df.shingle
    GROUP BY s.doc_id
    """,
    tags=("llm", "curation", "text"),
)
def corpus_boilerplate_shingles(spark, sf_dir):
    """Cross-document boilerplate score: the fraction of each
    document's distinct 3-word shingles that also occur in at least
    one OTHER document — the corpus-level repetition signal (headers,
    navigation chrome, license blocks) that within-document
    `text_repetition_stats` cannot see. High-fraction docs are the
    template/boilerplate candidates a curation pass drops or trims.

    Shape at scale: documents reduce to distinct (doc_id, shingle)
    pairs; shingle document-frequency is ONE hash aggregate over that
    relation (bounded by realized vocabulary, not corpus bytes); the
    join back is shingle-keyed — never doc×doc, same posting-list
    discipline as `decontaminate_ngram`. All counts integer; one
    terminal division."""
    sh = D.word_shingles(table(spark, sf_dir, "documents"))
    df_ = sh.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("ndocs"))
    shared = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0))
    return (sh.join(df_, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 shared.alias("n_shared"),
                 F.round(shared * 1.0 / F.count("*"), 6)
                 .alias("boilerplate_frac")))


# --------------------------------------------- KMV set intersection

_KMV_J_K = 256
_HEX15 = float(16 ** 15)


@register(
    "sketch_kmv_jaccard",
    oracle=f"""
    WITH words AS (
      SELECT CAST(substr(source, 4) AS INT) % 2 AS side,
             string_split(text, ' ') AS ws
      FROM documents),
    sh AS (
      SELECT DISTINCT side,
             unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
               AS shingle
      FROM words),
    hv AS (SELECT DISTINCT side,
                  CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT)
                    AS h
           FROM sh),
    bk AS (SELECT side, h,
                  row_number() OVER (PARTITION BY side ORDER BY h)
                    AS rn
           FROM hv),
    kk AS (SELECT side, h FROM bk WHERE rn <= {_KMV_J_K}),
    merged AS (SELECT DISTINCT h FROM kk ORDER BY h
               LIMIT {_KMV_J_K}),
    bb AS (SELECT h, count(DISTINCT side) AS ns
           FROM kk GROUP BY h),
    est AS (
      SELECT CAST(sum(CASE WHEN b.ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS inter_k,
             count(*) AS n_b, max(m.h) AS hk
      FROM merged m JOIN bb b ON m.h = b.h),
    ex AS (
      SELECT CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inter,
             count(*) AS n_union
      FROM (SELECT h, count(DISTINCT side) AS ns FROM hv GROUP BY h)),
    u AS (
      SELECT inter_k, n_b,
             CASE WHEN n_b < {_KMV_J_K} THEN n_b * 1.0
                  ELSE {_KMV_J_K - 1}.0 * {_HEX15!r} / hk END
               AS union_est
      FROM est)
    SELECT round(inter_k * 1.0 / n_b, 6) AS jaccard_est,
           round(union_est, 2) AS union_est,
           round(inter_k * 1.0 / n_b * union_est, 2) AS inter_est,
           round(n_inter * 1.0 / n_union, 6) AS jaccard_exact
    FROM u, ex
    """,
    tags=("sketch", "llm"),
)
def sketch_kmv_jaccard(spark, sf_dir):
    """Set-intersection estimation between two corpus halves from
    bottom-k (KMV / theta-style) sketches: Jaccard from the merged
    sketch, union size from the k-th minimum hash, intersection =
    Ĵ·|union| — the mergeable primitive behind "how much do these two
    crawls overlap?" without ever materializing the intersection.
    Exact Jaccard rides along as the audit column.

    Each side reduces to distinct shingle hashes, then to its k
    smallest via TakeOrderedAndProject (heap per partition + k-row
    driver merge — the sketch is k longs regardless of corpus size;
    at 100 TB the sides never co-shuffle, only two k-row relations
    meet). Hash arithmetic is exact integer md5 in both engines; the
    only float ops are the two terminal estimator divisions."""
    w = (table(spark, sf_dir, "documents")
         .withColumn("side",
                     F.substring("source", 4, 10).cast("int") % 2))
    sh = D.word_shingles(w, id_col="side")
    hv = (sh.select("side",
                    F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
                    .cast("long").alias("h"))
          .distinct())
    kk = (hv.filter(F.col("side") == 0).orderBy("h").limit(_KMV_J_K)
          .unionAll(
              hv.filter(F.col("side") == 1).orderBy("h").limit(_KMV_J_K)))
    merged = kk.select("h").distinct().orderBy("h").limit(_KMV_J_K)
    both = kk.groupBy("h").agg(F.countDistinct("side").alias("ns"))
    est = (merged.join(both, "h")
           .agg(F.sum(F.when(F.col("ns") == 2, 1).otherwise(0))
                .alias("inter_k"),
                F.count("*").alias("n_b"), F.max("h").alias("hk")))
    ex = (hv.groupBy("h").agg(F.countDistinct("side").alias("ns"))
          .agg(F.sum(F.when(F.col("ns") == 2, 1).otherwise(0))
               .alias("n_inter"),
               F.count("*").alias("n_union")))
    union_est = F.when(
        F.col("n_b") < _KMV_J_K, F.col("n_b") * 1.0).otherwise(
        F.lit(float(_KMV_J_K - 1)) * F.lit(_HEX15) / F.col("hk"))
    return (est.withColumn("union_est_v", union_est)
            .crossJoin(F.broadcast(ex))
            .select(
                F.round(F.col("inter_k") * 1.0 / F.col("n_b"), 6)
                .alias("jaccard_est"),
                F.round("union_est_v", 2).alias("union_est"),
                F.round(F.col("inter_k") * 1.0 / F.col("n_b")
                        * F.col("union_est_v"), 2).alias("inter_est"),
                F.round(F.col("n_inter") * 1.0 / F.col("n_union"), 6)
                .alias("jaccard_exact")))


# ------------------------------------------------ Theil–Sen trend

@register(
    "stat_theil_sen_trend",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS mo,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    p AS (
      SELECT a.o_orderpriority,
             (b.cents - a.cents) * 1.0 / (b.mo - a.mo) AS slope,
             a.mo AS mi, b.mo AS mj
      FROM m a JOIN m b
        ON a.o_orderpriority = b.o_orderpriority AND a.mo < b.mo),
    r AS (
      SELECT o_orderpriority, slope,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY slope, mi, mj) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM p)
    SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_pairs,
           round(avg(slope) / 100.0, 6) AS ts_slope
    FROM r
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY o_orderpriority
    """,
    tags=("stats", "window"),
)
def stat_theil_sen_trend(spark, sf_dir):
    """Theil–Sen robust trend of monthly revenue per order priority:
    the MEDIAN of all pairwise slopes — the estimator that shrugs off
    the outlier months that wreck the OLS fit in `stat_linear_trend`
    (its natural companion query).

    The pair set is quadratic in MONTHS (a time-range constant, ~80
    here → ~3k pairs/group), never in rows — the fact stream collapses
    to the monthly aggregate first, so 100 TB of orders still yields
    the same bounded pair relation. Each slope divides two exact
    integers (identical IEEE result in both engines); the median is an
    exact order statistic via row_number with a full (slope, mi, mj)
    tiebreak, averaging the two middle elements on even counts — a
    two-operand commutative sum, not an accumulation."""
    m = (table(spark, sf_dir, "orders")
         .groupBy("o_orderpriority",
                  (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                  .cast("long").alias("mo"))
         .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .alias("cents")))
    a, b = m.alias("a"), m.alias("b")
    p = (a.join(b, (F.col("a.o_orderpriority")
                    == F.col("b.o_orderpriority"))
                & (F.col("a.mo") < F.col("b.mo")))
         .select(F.col("a.o_orderpriority").alias("o_orderpriority"),
                 ((F.col("b.cents") - F.col("a.cents")) * 1.0
                  / (F.col("b.mo") - F.col("a.mo"))).alias("slope"),
                 F.col("a.mo").alias("mi"), F.col("b.mo").alias("mj")))
    wr = Window.partitionBy("o_orderpriority").orderBy("slope", "mi", "mj")
    wn = Window.partitionBy("o_orderpriority")
    r = p.select("o_orderpriority", "slope",
                 F.row_number().over(wr).alias("rn"),
                 F.count("*").over(wn).alias("n"))
    mid = r.filter((F.col("rn") == F.expr("(n + 1) div 2"))
                   | (F.col("rn") == F.expr("(n + 2) div 2")))
    return (mid.groupBy("o_orderpriority")
            .agg(F.max("n").cast("long").alias("n_pairs"),
                 F.round(F.avg("slope") / 100.0, 6).alias("ts_slope")))


# ------------------------------------------------ key-skew profile

@register(
    "fact_key_skew_profile",
    oracle="""
    WITH cnt AS (SELECT l_suppkey, count(*) AS x
                 FROM lineitem GROUP BY l_suppkey),
    r AS (
      SELECT x,
             row_number() OVER (ORDER BY x, l_suppkey) AS i,
             count(*) OVER () AS n,
             CAST(sum(x) OVER () AS BIGINT) AS tot
      FROM cnt)
    SELECT CAST(max(n) AS BIGINT) AS n_keys,
           CAST(max(tot) AS BIGINT) AS total_rows,
           round(CAST(sum(CAST(2 * i - n - 1 AS DECIMAL(38,0)) * x)
                      AS DOUBLE)
                 / (CAST(max(n) AS DOUBLE) * max(tot)), 6) AS gini,
           round(max(x) * 1.0 / max(tot), 6) AS top1_share,
           round(CAST(sum(CASE WHEN i > n - 10 THEN x ELSE 0 END)
                      AS BIGINT) * 1.0 / max(tot), 6) AS top10_share
    FROM r
    """,
    tags=("stats", "scale"),
)
def fact_key_skew_profile(spark, sf_dir):
    """Shuffle-key skew diagnostics for the lineitem→supplier join
    key: key count, Gini coefficient of the per-key row distribution,
    and top-1/top-10 key shares — the numbers that decide whether a
    join needs salting (`join_salted_skew`) or AQE skew splitting
    before it runs. An engine that plans 100 TB joins needs this
    observability query as much as the joins themselves.

    One hash aggregate over the fact table → per-key counts (key
    cardinality rows); the rank window and Gini sum run over that
    dimension-sized relation. Gini numerator Σ(2i−n−1)·x stays exact
    BIGINT (rank ties broken by key ⇒ total order ⇒ identical i in
    both engines); the three shares are terminal divisions."""
    cnt = (table(spark, sf_dir, "lineitem")
           .groupBy("l_suppkey").agg(F.count("*").alias("x")))
    wi = Window.orderBy("x", "l_suppkey")
    wa = Window.partitionBy()
    r = cnt.select(
        "x", F.row_number().over(wi).alias("i"),
        F.count("*").over(wa).alias("n"),
        F.sum("x").over(wa).alias("tot"))
    # Gini numerator Σ(2i−n−1)·x and the n·total denominator product
    # square past int64 once the key domain nears ~1e9 (SF ~1e3 for
    # suppliers): exact DECIMAL(38,0) numerator, double denominator —
    # both engines identically (Spark would wrap silently, DuckDB raise)
    return r.agg(
        F.max("n").cast("long").alias("n_keys"),
        F.max("tot").cast("long").alias("total_rows"),
        F.round(F.sum((2 * F.col("i") - F.col("n") - 1)
                      .cast("decimal(38,0)") * F.col("x")).cast("double")
                / (F.max("n").cast("double") * F.max("tot")), 6)
        .alias("gini"),
        F.round(F.max("x") * 1.0 / F.max("tot"), 6).alias("top1_share"),
        F.round(F.sum(F.when(F.col("i") > F.col("n") - 10,
                             F.col("x")).otherwise(0))
                * 1.0 / F.max("tot"), 6).alias("top10_share"))
