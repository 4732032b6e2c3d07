"""Round-5 wave 6: Kaplan-Meier survival estimation (right-censored
time-to-event — the fulfillment/churn analysis primitive) and
ColBERT-style MaxSim late-interaction scoring (multi-vector retrieval,
the modern contrast to single-vector cosine).

Float discipline: the KM product is a cumulative sum of per-step
log-survival factors quantized to BIGINT micro-units (exact integer
window sum; one terminal exp + 4dp round), and MaxSim sums per-token
maxima of cosines quantized to BIGINT 1e-6 units — no float crosses a
variable row count on either side.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

#: censoring horizon (days): orders still unshipped at the horizon
#: count as at-risk, never as events
_KM_HORIZON = 30

#: tokens per pseudo-document for the multi-vector index
_MV_GROUP = 10
_MV_QUERIES = 3
_MV_TOP = 10


@register(
    "survival_km_ship_latency",
    oracle=f"""
    WITH f AS (SELECT l_orderkey, min(l_shipdate) AS ship0
               FROM lineitem GROUP BY 1),
    lat AS (SELECT o.o_orderpriority AS pri,
                   date_diff('day', o.o_orderdate, f.ship0) AS lt
            FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
            WHERE date_diff('day', o.o_orderdate, f.ship0) >= 0),
    ev AS (SELECT pri,
                  CASE WHEN lt > {_KM_HORIZON} THEN {_KM_HORIZON} + 1
                       ELSE lt END AS t,
                  CASE WHEN lt > {_KM_HORIZON} THEN 0 ELSE 1 END
                    AS died
           FROM lat),
    g AS (SELECT pri, t, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(died) AS BIGINT) AS d
          FROM ev GROUP BY 1, 2),
    tot AS (SELECT pri, CAST(sum(cnt) AS BIGINT) AS total
            FROM g GROUP BY 1),
    r AS (SELECT g.pri, g.t, g.d,
                 tot.total
                   - (CAST(sum(g.cnt) OVER (PARTITION BY g.pri
                                            ORDER BY g.t) AS BIGINT)
                      - g.cnt) AS n
          FROM g JOIN tot ON tot.pri = g.pri),
    q AS (SELECT pri, t, d, n,
                 CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n) * 1000000)
                      AS BIGINT) AS ql
          FROM r WHERE d > 0 AND d < n AND t <= {_KM_HORIZON}),
    s AS (SELECT pri, t, d, n,
                 CAST(sum(ql) OVER (PARTITION BY pri ORDER BY t)
                      AS BIGINT) AS cql
          FROM q)
    SELECT pri, t, d, n, round(exp(cql / 1000000.0), 4) AS surv
    FROM s
    """,
    tags=("analytics", "stats", "window"),
)
def survival_km_ship_latency(spark, sf_dir):
    """Kaplan-Meier survival of order-to-first-shipment latency per
    priority, right-censored at the {30}-day horizon (unshipped-by-
    horizon orders stay in the risk set but never become events —
    exactly how churn/fulfillment survival is estimated on live data).

    Plan: one lineitem partial-agg (first ship per order), a keyed
    join, a per-priority grouped day histogram, and two partitioned
    windows (exclusive cumulative risk set; cumulative log-survival).
    The KM product Π(1 - d/n) is computed as exp of an EXACT integer
    cumsum of micro-unit-quantized ln factors — a windowed float
    product would accumulate engine-specific rounding; the quantized
    sum is bit-identical everywhere. Negative latencies (synthetic
    uncorrelated dates) are excluded as data errors, and a day that
    exhausts the whole remaining risk set (d == n, survival exactly 0
    — ln(0) is -inf in DuckDB but NULL in Spark) is excluded by the
    identical d < n predicate on both sides."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    f = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship0"))
    lt = F.datediff(F.col("ship0").cast("date"),
                    F.col("o_orderdate").cast("date"))
    lat = (o.join(f, o.o_orderkey == f.l_orderkey)
           .select(F.col("o_orderpriority").alias("pri"),
                   lt.alias("lt"))
           .filter(F.col("lt") >= 0))
    ev = lat.select(
        "pri",
        F.when(F.col("lt") > _KM_HORIZON, _KM_HORIZON + 1)
        .otherwise(F.col("lt")).alias("t"),
        F.when(F.col("lt") > _KM_HORIZON, 0).otherwise(1).alias("died"))
    g = (ev.groupBy("pri", "t")
         .agg(F.count("*").alias("cnt"), F.sum("died").alias("d")))
    tot = g.groupBy("pri").agg(F.sum("cnt").alias("total"))
    wcum = (Window.partitionBy("pri").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = (g.join(tot, "pri")
         .withColumn("n", F.col("total")
                     - (F.sum("cnt").over(wcum) - F.col("cnt"))))
    q = (r.filter((F.col("d") > 0) & (F.col("d") < F.col("n"))
                  & (F.col("t") <= _KM_HORIZON))
         .withColumn("ql", F.round(F.log(
             F.lit(1.0) - F.col("d").cast("double") / F.col("n"))
             * 1_000_000, 0).cast("bigint")))
    s = q.withColumn("cql", F.sum("ql").over(
        Window.partitionBy("pri").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return s.select("pri", "t", "d", F.col("n").cast("long").alias("n"),
                    F.round(F.exp(F.col("cql") / 1_000_000.0), 4)
                    .alias("surv"))


@register(
    "sim_maxsim_late_interaction",
    oracle=f"""
    WITH tok AS (SELECT vec_id, vec_id // {_MV_GROUP} AS did, embedding
                 FROM embeddings),
    qt AS (SELECT * FROM tok WHERE did < {_MV_QUERIES}),
    dt AS (SELECT * FROM tok WHERE did >= {_MV_QUERIES}),
    pairs AS (SELECT q.did AS qid, d.did AS did, q.vec_id AS qtok,
                     CAST(round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(d.embedding AS DOUBLE[])) * 1000000)
                       AS BIGINT) AS cos_e6
              FROM qt q JOIN dt d ON true),
    mx AS (SELECT qid, did, qtok, max(cos_e6) AS m
           FROM pairs GROUP BY 1, 2, 3),
    sc AS (SELECT qid, did, CAST(sum(m) AS BIGINT) AS score_e6
           FROM mx GROUP BY 1, 2)
    SELECT qid, did, score_e6, rnk FROM (
      SELECT qid, did, score_e6,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score_e6 DESC, did) AS rnk
      FROM sc)
    WHERE rnk <= {_MV_TOP}
    """,
    tags=("llm", "similarity"),
)
def sim_maxsim_late_interaction(spark, sf_dir):
    """ColBERT-style late interaction: embeddings grouped into
    10-token pseudo-documents; a query document scores a candidate as
    Σ over its tokens of the MAX cosine against the candidate's
    tokens (MaxSim), top-10 candidates per query. Cosines are
    quantized to BIGINT 1e-6 units before the max/sum, so the scoring
    is exact integer arithmetic. Scale: query tokens broadcast
    against the token index (a query set is always small); max+sum
    are two keyed partial aggregations; per-query top-k is a bounded
    window — the plan is the standard scatter-gather of multi-vector
    retrieval with no all-pairs beyond query×corpus tokens."""
    from ..functions.vector import cosine_similarity
    emb = table(spark, sf_dir, "embeddings")
    tok = emb.select("vec_id",
                     F.expr(f"vec_id div {_MV_GROUP}").alias("did"),
                     "embedding")
    qt = (tok.filter(F.col("did") < _MV_QUERIES)
          .select(F.col("did").alias("qid"),
                  F.col("vec_id").alias("qtok"),
                  F.col("embedding").alias("q_emb")))
    dt = (tok.filter(F.col("did") >= _MV_QUERIES)
          .select("did", F.col("embedding").alias("d_emb")))
    pairs = (dt.crossJoin(F.broadcast(qt))
             .select("qid", "did", "qtok",
                     F.round(cosine_similarity("q_emb", "d_emb")
                             * 1_000_000, 0).cast("bigint")
                     .alias("cos_e6")))
    mx = (pairs.groupBy("qid", "did", "qtok")
          .agg(F.max("cos_e6").alias("m")))
    sc = mx.groupBy("qid", "did").agg(F.sum("m").alias("score_e6"))
    w = (Window.partitionBy("qid")
         .orderBy(F.desc("score_e6"), "did"))
    return (sc.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _MV_TOP)
            .select("qid", "did", "score_e6", "rnk"))


@register(
    "dq_psi_price_drift",
    oracle="""
    WITH lab AS (SELECT CASE WHEN year(o_orderdate) <= 1997
                             THEN 'base' ELSE 'cur' END AS per,
                        CAST(least(greatest(CAST(floor(o_totalprice
                                                       / 60000) AS BIGINT),
                                            0), 9) AS INT) AS bin
                 FROM orders),
    c AS (SELECT bin,
                 CAST(sum(CASE WHEN per = 'base' THEN 1 ELSE 0 END)
                      AS BIGINT) AS base_n,
                 CAST(sum(CASE WHEN per = 'cur' THEN 1 ELSE 0 END)
                      AS BIGINT) AS cur_n
          FROM lab GROUP BY bin),
    tot AS (SELECT CAST(sum(base_n) AS BIGINT) AS bt,
                   CAST(sum(cur_n) AS BIGINT) AS ct FROM c),
    t AS (SELECT c.bin, c.base_n, c.cur_n,
                 CAST(round(((c.base_n + 1.0) / (tot.bt + 10)
                             - (c.cur_n + 1.0) / (tot.ct + 10))
                            * ln(((c.base_n + 1.0) / (tot.bt + 10))
                                 / ((c.cur_n + 1.0) / (tot.ct + 10)))
                            * 1000000) AS BIGINT) AS term_e6
          FROM c CROSS JOIN tot)
    SELECT bin, base_n, cur_n, term_e6,
           CAST(sum(term_e6) OVER () AS BIGINT) AS psi_e6
    FROM t
    """,
    tags=("analytics", "quality", "stats"),
)
def dq_psi_price_drift(spark, sf_dir):
    """Population Stability Index between early (<=1997) and late
    (>=1998) order-price distributions over 10 fixed-width bins — the
    tabular drift metric every deployed-model monitor computes
    (PSI > 0.2 = retrain signal). Fixed bin edges (never quantile
    edges: cross-engine quantile interpolation can move a boundary by
    one ulp and reshuffle counts), Laplace-smoothed proportions so no
    bin can hit ln(0), per-bin terms quantized to BIGINT micro-units
    summed by an exact integer window. One scan, one 10-row
    aggregate."""
    o = table(spark, sf_dir, "orders")
    bin_ = F.least(F.greatest(F.floor(F.col("o_totalprice") / 60000)
                              .cast("bigint"), F.lit(0)),
                   F.lit(9)).cast("int")
    per = F.when(F.year("o_orderdate") <= 1997, "base").otherwise("cur")
    c = (o.select(per.alias("per"), bin_.alias("bin"))
         .groupBy("bin")
         .agg(F.sum(F.when(F.col("per") == "base", 1).otherwise(0))
              .alias("base_n"),
              F.sum(F.when(F.col("per") == "cur", 1).otherwise(0))
              .alias("cur_n")))
    tot = c.agg(F.sum("base_n").alias("bt"), F.sum("cur_n").alias("ct"))
    p = (F.col("base_n") + 1.0) / (F.col("bt") + 10)
    q = (F.col("cur_n") + 1.0) / (F.col("ct") + 10)
    t = (c.crossJoin(F.broadcast(tot))
         .select("bin", "base_n", "cur_n",
                 F.round((p - q) * F.log(p / q) * 1_000_000, 0)
                 .cast("bigint").alias("term_e6")))
    return t.withColumn("psi_e6", F.sum("term_e6").over(
        Window.partitionBy(F.lit(1))).cast("bigint"))
