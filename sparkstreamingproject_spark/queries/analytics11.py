"""Round-4 continuation, wave 11 (round-5 driver-window fillers):
one-way ANOVA, RAKE keyword extraction, customer segment-migration
matrix, Neyman sampling allocation, map-function surface, and lagged
cross-correlation. With these the never-driver-checked backlog is
exactly 50 — one r05 window closes the ledger again.

Float discipline: fixed-arity float expressions over exactly-computed
integer aggregates only (conditional pivots give deterministic operand
order; no float is ever summed across a variable number of rows).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


# ------------------------------------------------ one-way ANOVA

def _anova_oracle() -> str:
    cells = []
    for i, p in enumerate(_PRIORITIES, 1):
        cells.append(
            f"CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i},\n"
            f"             CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN cents ELSE 0 END) AS BIGINT) AS s{i}")
    ssb = " + ".join(
        f"CAST(s{i} AS DOUBLE) * s{i} / n{i}" for i in range(1, 6))
    return f"""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    g AS (
      SELECT {cells[0]},
             {cells[1]},
             {cells[2]},
             {cells[3]},
             {cells[4]},
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             sum(CAST(cents AS DECIMAL(38,0)) * cents) AS q
      FROM c)
    SELECT CAST(4 AS INT) AS df_between,
           CAST(n - 5 AS BIGINT) AS df_within,
           round((({ssb}) - CAST(s AS DOUBLE) * s / n) / 4.0
                 / ((CAST(q AS DOUBLE) - ({ssb})) / (n - 5)), 4) AS f_stat,
           round((({ssb}) - CAST(s AS DOUBLE) * s / n)
                 / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
             AS eta_sq
    FROM g
    """


@register(
    "stat_anova_oneway",
    oracle=_anova_oracle(),
    tags=("stat",),
)
def stat_anova_oneway(spark, sf_dir):
    """One-way ANOVA: does order priority explain any variance in
    order value? F = (SSB/(k−1)) / (SSW/(n−k)) across the five
    priority groups, plus the η² effect size — the k-group
    generalization of `stat_ttest_welch`.

    The five groups are pivoted into FIXED columns (n_g, S_g) by
    conditional aggregation, so the between-group sum of squares is a
    fixed-arity float expression over exactly-computed integer sums —
    operand order is literal in the query text, never partition order.
    One scan, one aggregate row, identical IEEE arithmetic in both
    engines. On a cluster this is a map-side partial aggregate — the
    whole test costs one pass regardless of row count."""
    c = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"))
    aggs = []
    for i, p in enumerate(_PRIORITIES, 1):
        aggs += [
            F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
            .cast("long").alias(f"n{i}"),
            F.sum(F.when(F.col("o_orderpriority") == p,
                         F.col("cents")).otherwise(0))
            .cast("long").alias(f"s{i}")]
    g = c.agg(*aggs,
              F.count("*").cast("long").alias("n"),
              F.sum("cents").cast("long").alias("s"),
              # cents² sums exceed a signed long from sf0.01 up — exact
              # DECIMAL(38,0) partials, converted to double only in the
              # terminal SSW expression
              F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
              .cast("decimal(38,0)").alias("q"))
    ssb_terms = " + ".join(
        f"CAST(s{i} AS DOUBLE) * s{i} / n{i}" for i in range(1, 6))
    return g.selectExpr(
        "CAST(4 AS INT) AS df_between",
        "CAST(n - 5 AS BIGINT) AS df_within",
        f"round((({ssb_terms}) - CAST(s AS DOUBLE) * s / n) / 4.0"
        f" / ((CAST(q AS DOUBLE) - ({ssb_terms})) / (n - 5)), 4) AS f_stat",
        f"round((({ssb_terms}) - CAST(s AS DOUBLE) * s / n)"
        f" / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6) AS eta_sq")


# ------------------------------------------------ RAKE keywords

_RAKE_STOPS = ("a", "the", "and", "of", "to", "in", "is", "on")
_RAKE_TOPK = 20


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
    tok2 AS (
      SELECT doc_id, w, pos,
             CASE WHEN w IN {_RAKE_STOPS} THEN 1 ELSE 0 END AS is_stop
      FROM tok),
    ph AS (
      SELECT doc_id, w,
             sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id,
             is_stop
      FROM tok2),
    pw AS (
      SELECT doc_id, w, phrase_id,
             count(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
      FROM ph WHERE is_stop = 0),
    stats AS (
      SELECT w AS keyword,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(phrase_len) AS BIGINT) AS degree
      FROM pw GROUP BY 1)
    SELECT keyword, freq, degree,
           round(degree * 1.0 / freq, 4) AS score
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY degree * 1.0 / freq DESC, freq DESC, keyword) AS rn
      FROM stats)
    WHERE rn <= {_RAKE_TOPK}
    """,
    tags=("llm", "text"),
)
def text_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free word runs; a word's score is
    degree/frequency where degree sums the lengths of every phrase
    containing it — words that live in long content phrases outrank
    words that appear alone. Top-20 corpus keywords. The classic
    cheap, language-agnostic keyword pass a training-data pipeline
    runs before anything embedding-based.

    Phrase segmentation is a running stopword count (one window per
    doc, partitioned by doc_id — embarrassingly parallel); phrase
    length is a second doc-local window; the scoring aggregate is
    integer (freq, degree) with the division at the end. The global
    top-k is a TakeOrderedAndProject-shaped 20-row cut with full
    tie-break (score, freq, keyword)."""
    tok = (table(spark, sf_dir, "documents")
           .select("doc_id", F.posexplode(F.split("text", " "))
                   .alias("pos", "w"))
           .withColumn("is_stop",
                       F.when(F.col("w").isin(*_RAKE_STOPS), 1).otherwise(0)))
    wp = Window.partitionBy("doc_id").orderBy("pos")
    ph = tok.withColumn("phrase_id", F.sum("is_stop").over(wp))
    pw = (ph.filter(F.col("is_stop") == 0)
          .withColumn("phrase_len",
                      F.count("*").over(
                          Window.partitionBy("doc_id", "phrase_id"))))
    stats = (pw.groupBy(F.col("w").alias("keyword"))
             .agg(F.count("*").cast("long").alias("freq"),
                  F.sum("phrase_len").cast("long").alias("degree")))
    score = F.col("degree") * 1.0 / F.col("freq")
    wr = Window.orderBy(score.desc(), F.col("freq").desc(), F.col("keyword"))
    return (stats.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= _RAKE_TOPK)
            .select("keyword", "freq", "degree",
                    F.round(score, 4).alias("score")))


# ------------------------------------------------ segment migration

def _seg(col: str) -> str:
    return (f"CASE WHEN {col} IS NULL THEN 'none' "
            f"WHEN {col} < 20000000 THEN 'low' "
            f"WHEN {col} < 60000000 THEN 'mid' "
            f"ELSE 'high' END")


@register(
    "rfm_migration_matrix",
    oracle=f"""
    WITH y94 AS (
      SELECT o_custkey, CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) = 1994 GROUP BY 1),
    y95 AS (
      SELECT o_custkey, CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
    m AS (
      SELECT c.c_custkey,
             {_seg('a.cents')} AS seg_1994,
             {_seg('b.cents')} AS seg_1995
      FROM customer c
      LEFT JOIN y94 a ON c.c_custkey = a.o_custkey
      LEFT JOIN y95 b ON c.c_custkey = b.o_custkey)
    SELECT seg_1994, seg_1995, CAST(count(*) AS BIGINT) AS n_customers
    FROM m GROUP BY 1, 2
    """,
    tags=("analytics", "agg"),
)
def rfm_migration_matrix(spark, sf_dir):
    """Customer segment-migration matrix: each customer's annual-spend
    segment in 1994 vs 1995 (none/low/mid/high on fixed cent
    thresholds), cross-tabulated — the churn/upgrade report behind
    every retention deck ('how many high-value customers lapsed to
    none?'). Complements `cohort_retention_matrix` (activity) with
    value-band movement.

    Fixed thresholds keep the banding integer-deterministic (no
    tertile windows whose boundaries drift with data); the two annual
    aggregates join back to the customer dimension customer-keyed, so
    the matrix costs two fact passes + one dim-keyed join and the
    result is at most 16 cells."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")

    def year_spend(y):
        return (o.filter(F.year("o_orderdate") == y)
                .groupBy("o_custkey")
                .agg(F.sum(F.expr("round(o_totalprice * 100)"))
                     .cast("long").alias("cents")))

    def seg(col):
        return (F.when(col.isNull(), "none")
                .when(col < 20000000, "low")
                .when(col < 60000000, "mid")
                .otherwise("high"))

    a = year_spend(1994).select(F.col("o_custkey").alias("k94"),
                                F.col("cents").alias("c94"))
    b = year_spend(1995).select(F.col("o_custkey").alias("k95"),
                                F.col("cents").alias("c95"))
    m = (c.join(a, c.c_custkey == a.k94, "left")
         .join(b, c.c_custkey == b.k95, "left")
         .select(seg(F.col("c94")).alias("seg_1994"),
                 seg(F.col("c95")).alias("seg_1995")))
    return (m.groupBy("seg_1994", "seg_1995")
            .agg(F.count("*").cast("long").alias("n_customers")))


# ------------------------------------------------ Neyman allocation

_NEYMAN_BUDGET = 1000


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             CAST(sum(CAST(round(c_acctbal * 100) AS DECIMAL(38,0))
                      * CAST(round(c_acctbal * 100) AS BIGINT)) AS DECIMAL(38,0)) AS sum_c2
      FROM customer GROUP BY 1),
    w AS (
      SELECT c_nationkey, n_h,
             CAST(round(n_h * sqrt((CAST(sum_c2 AS DOUBLE) * n_h - CAST(sum_c AS DOUBLE) * sum_c)
                                   / (CAST(n_h AS DOUBLE) * n_h))) AS BIGINT) AS wgt
      FROM s),
    t AS (SELECT CAST(sum(wgt) AS BIGINT) AS total_w FROM w)
    SELECT w.c_nationkey AS nationkey, w.n_h, w.wgt,
           CAST(({_NEYMAN_BUDGET} * w.wgt) // t.total_w AS BIGINT) AS alloc
    FROM w, t
    """,
    tags=("sampling", "stat"),
)
def sample_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified-sample allocation: split a
    {_NEYMAN_BUDGET}-row sampling budget across nation strata
    proportional to N_h·σ_h (population × spread of account balance)
    — the design that minimizes estimator variance for a fixed budget;
    the planning step ahead of `sample_weighted_systematic` /
    `split_stratified_hash`, which do the drawing.

    Determinism across engines: each stratum's N_h·σ_h is computed
    from exact integer moments (the variance numerator n·Σx²−S² is
    exact cents²), then ROUNDED TO AN INTEGER WEIGHT per stratum —
    so the cross-stratum total is an integer sum, never an
    order-dependent float reduction — and the allocation is integer
    floor division of budget·weight/total. One aggregate + one
    broadcast total; 25 rows."""
    c = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"))
    s = (c.groupBy("c_nationkey")
         .agg(F.count("*").cast("long").alias("n_h"),
              F.sum("cents").cast("long").alias("sum_c"),
              # Σcents² per stratum passes int64 once a nation holds
              # ~1e7 customers (SF ~1e4): exact DECIMAL(38,0) both
              # sides, converted to double only inside sqrt
              F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
              .cast("decimal(38,0)").alias("sum_c2")))
    sd = F.sqrt((F.col("sum_c2").cast("double") * F.col("n_h")
                 - F.col("sum_c").cast("double") * F.col("sum_c"))
                / (F.col("n_h").cast("double") * F.col("n_h")))
    w = s.select("c_nationkey", "n_h",
                 F.round(F.col("n_h") * sd).cast("long").alias("wgt"))
    t = w.agg(F.sum("wgt").cast("long").alias("total_w"))
    return (w.crossJoin(F.broadcast(t))
            .select(F.col("c_nationkey").alias("nationkey"), "n_h", "wgt",
                    F.expr(f"CAST(({_NEYMAN_BUDGET} * wgt) DIV total_w"
                           " AS BIGINT)").alias("alloc")))


# ------------------------------------------------ map functions

@register(
    "map_functions_surface",
    oracle="""
    WITH j AS (
      SELECT n.n_name AS nation, o.o_orderpriority AS prio,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT nation,
           CAST(count(*) AS INT) AS n_priorities,
           CAST(sum(CASE WHEN cnt > 150 THEN 1 ELSE 0 END) AS INT) AS n_busy,
           CAST(sum(cnt) AS BIGINT) AS total_orders,
           CAST(max(cnt) AS BIGINT) AS max_priority_orders
    FROM j GROUP BY 1
    """,
    tags=("functions", "map"),
)
def map_functions_surface(spark, sf_dir):
    """MapType column surface: per nation, the priority→order-count
    map is BUILT (map_from_entries over sorted entries), then folded
    entirely with map higher-order functions — map_filter for the
    busy-priority count, map_values + aggregate for the total and
    max — before the scalars leave the row. This is §1.4's
    'wide-column cf/qualifier cells → MapType column' mapping
    (`HbaseDML.java:98-149`) exercised end-to-end: qualifiers as map
    keys, cell reads as lambda folds.

    The oracle states the same semantics relationally — the map is an
    implementation detail of the Spark plan, not of the answer. Entries
    are sorted before map construction so the build is
    partition-order-proof; per-nation maps are bounded at 5 entries,
    so every lambda evaluates map-side in codegen."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy(F.col("n_name").alias("nation"),
                  F.col("o_orderpriority").alias("prio"))
         .agg(F.count("*").cast("long").alias("cnt")))
    m = (j.groupBy("nation")
         .agg(F.map_from_entries(
             F.sort_array(F.collect_list(F.struct("prio", "cnt"))))
             .alias("pm")))
    return m.select(
        "nation",
        F.size("pm").alias("n_priorities"),
        F.size(F.expr("map_filter(pm, (k, v) -> v > 150)")).alias("n_busy"),
        F.expr("aggregate(map_values(pm), 0L, (acc, x) -> acc + x)")
        .alias("total_orders"),
        F.expr("aggregate(map_values(pm), 0L, "
               "(acc, x) -> CASE WHEN x > acc THEN x ELSE acc END)")
        .alias("max_priority_orders"))


# ------------------------------------------------ cross-correlation

_CCF_LAGS = [-3, -2, -1, 0, 1, 2, 3]


def _ccf_terms(k: int) -> str:
    i = k + 3  # column suffix index, 0-based
    return (f"CAST(m{i} AS DOUBLE)", f"p{i}", f"sx{i}", f"sy{i}",
            f"qx{i}", f"qy{i}")


def _ccf_oracle() -> str:
    lead_cols = []
    for k in _CCF_LAGS:
        i = k + 3
        fn = f"lead(y, {k})" if k >= 0 else f"lag(y, {-k})"
        lead_cols.append(f"{fn} OVER (ORDER BY d) AS y{i}")
    aggs = []
    for k in _CCF_LAGS:
        i = k + 3
        aggs.append(
            f"CAST(count(y{i}) AS BIGINT) AS m{i},\n             "
            f"CAST(sum(x * y{i}) AS BIGINT) AS p{i},\n             "
            f"CAST(sum(CASE WHEN y{i} IS NOT NULL THEN x ELSE 0 END) AS BIGINT) AS sx{i},\n             "
            f"CAST(sum(y{i}) AS BIGINT) AS sy{i},\n             "
            f"CAST(sum(CASE WHEN y{i} IS NOT NULL THEN x * x ELSE 0 END) AS BIGINT) AS qx{i},\n             "
            f"CAST(sum(y{i} * y{i}) AS BIGINT) AS qy{i}")
    rows = []
    for k in _CCF_LAGS:
        i = k + 3
        num = f"CAST(m{i} AS DOUBLE) * p{i} - CAST(sx{i} AS DOUBLE) * sy{i}"
        den = (f"sqrt(CAST(m{i} AS DOUBLE) * qx{i} - CAST(sx{i} AS DOUBLE) * sx{i})"
               f" * sqrt(CAST(m{i} AS DOUBLE) * qy{i} - CAST(sy{i} AS DOUBLE) * sy{i})")
        rows.append(f"""
    SELECT {k} AS lag, m{i} AS pairs,
           round(({num}) / ({den}), 6) AS ccf
    FROM g""")
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    l AS (
      SELECT x,
             {",             ".join(lead_cols)}
      FROM daily),
    g AS (
      SELECT {",             ".join(aggs)}
      FROM l)
    {'''
    UNION ALL'''.join(rows)}
    """


@register(
    "ts_cross_correlation",
    oracle=_ccf_oracle(),
    tags=("timeseries", "stat"),
)
def ts_cross_correlation(spark, sf_dir):
    """Cross-correlation function between the URGENT and LOW daily
    order-count series at lags −3..+3 — does one stream lead the
    other? The pair-series diagnostic (`ts_autocorrelation_lags` is
    the self-series case); a lead-lag peak off lag 0 is the classic
    signal that two pipelines share an upstream driver with delay.

    Per lag, Pearson r over the valid overlap is assembled from six
    exact integer sums (m, Σxy, Σx, Σy, Σx², Σy² — conditionally
    masked to the overlap), with the two sqrts and one division as
    the only float ops, written identically in both engines. The
    lag/lead windows run over the day-grain aggregate, thousands of
    rows at any corpus size."""
    daily = (table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderdate").alias("d"))
             .agg(F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                        .otherwise(0)).cast("long").alias("x"),
                  F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1)
                        .otherwise(0)).cast("long").alias("y")))
    w = Window.orderBy("d")
    lead_cols = []
    for k in _CCF_LAGS:
        i = k + 3
        col = F.lead("y", k).over(w) if k >= 0 else F.lag("y", -k).over(w)
        lead_cols.append(col.alias(f"y{i}"))
    l = daily.select("x", *lead_cols)
    aggs = []
    for k in _CCF_LAGS:
        i = k + 3
        yi = F.col(f"y{i}")
        aggs += [
            F.count(yi).cast("long").alias(f"m{i}"),
            F.sum(F.col("x") * yi).cast("long").alias(f"p{i}"),
            F.sum(F.when(yi.isNotNull(), F.col("x")).otherwise(0))
            .cast("long").alias(f"sx{i}"),
            F.sum(yi).cast("long").alias(f"sy{i}"),
            F.sum(F.when(yi.isNotNull(), F.col("x") * F.col("x"))
                  .otherwise(0)).cast("long").alias(f"qx{i}"),
            F.sum(yi * yi).cast("long").alias(f"qy{i}")]
    g = l.agg(*aggs)
    g.createOrReplaceTempView("ccf_g")
    selects = []
    for k in _CCF_LAGS:
        i = k + 3
        num = f"CAST(m{i} AS DOUBLE) * p{i} - CAST(sx{i} AS DOUBLE) * sy{i}"
        den = (f"sqrt(CAST(m{i} AS DOUBLE) * qx{i} - CAST(sx{i} AS DOUBLE) * sx{i})"
               f" * sqrt(CAST(m{i} AS DOUBLE) * qy{i} - CAST(sy{i} AS DOUBLE) * sy{i})")
        selects.append(
            f"SELECT {k} AS lag, m{i} AS pairs, "
            f"round(({num}) / ({den}), 6) AS ccf FROM ccf_g")
    return spark.sql("\nUNION ALL\n".join(selects))
