"""Round-4 continuation, wave 5 (round-5 driver-window candidates):
marketing attribution, market-basket association rules, next-word
suggestion. Exact-algebra discipline throughout (integer counts and
µs timestamps; terminal divisions only).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_US_7D = 7 * 86_400_000_000


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      FROM events),
    t AS (
      SELECT user_id, us, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN us END IGNORE NULLS)
               OVER w AS touch_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    conv AS (
      SELECT coalesce(CASE WHEN us - touch_us <= {_US_7D}
                           THEN touch_type END, 'organic')
               AS attributed_to
      FROM t WHERE event_type = 'purchase')
    SELECT attributed_to, count(*) AS n_conversions
    FROM conv GROUP BY attributed_to
    """,
    tags=("events", "window", "analytics"),
)
def events_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: every purchase is credited to the most
    recent non-purchase event by the same user within a 7-day
    lookback, else 'organic' — the marketing-analytics primitive
    behind every channel-ROI dashboard.

    One user-keyed ordered window with IGNORE NULLS `last_value`
    carries the latest touch (type, time) forward; the lookback is an
    exact integer-µs comparison applied at the conversion row. The
    window runs over the per-user event stream once; output is a
    touch-type-cardinality aggregate. All integers and strings —
    nothing float anywhere."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id",
        "event_type")
    w = (Window.partitionBy("user_id").orderBy("us", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch_t = F.last(F.when(F.col("event_type") != "purchase",
                            F.col("event_type")), ignorenulls=True).over(w)
    touch_u = F.last(F.when(F.col("event_type") != "purchase",
                            F.col("us")), ignorenulls=True).over(w)
    t = e.select("us", "event_type", touch_t.alias("touch_type"),
                 touch_u.alias("touch_us"))
    conv = (t.filter(F.col("event_type") == "purchase")
            .select(F.coalesce(
                F.when(F.col("us") - F.col("touch_us") <= _US_7D,
                       F.col("touch_type")),
                F.lit("organic")).alias("attributed_to")))
    return (conv.groupBy("attributed_to")
            .agg(F.count("*").alias("n_conversions")))


@register(
    "basket_association_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items),
    supp AS (SELECT p_brand, count(*) AS cnt FROM items GROUP BY 1),
    pairs AS (
      SELECT a.p_brand AS lhs, b.p_brand AS rhs, count(*) AS both_cnt
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2),
    rules AS (
      SELECT p.lhs, p.rhs, p.both_cnt,
             sa.cnt AS lhs_cnt, sb.cnt AS rhs_cnt, nb.n_baskets
      FROM pairs p
      JOIN supp sa ON p.lhs = sa.p_brand
      JOIN supp sb ON p.rhs = sb.p_brand, nb
      WHERE p.both_cnt * 100 >= nb.n_baskets)
    SELECT lhs, rhs, CAST(both_cnt AS BIGINT) AS both_cnt,
           round(both_cnt * 1.0 / n_baskets, 6) AS support,
           round(both_cnt * 1.0 / lhs_cnt, 6) AS confidence,
           round(both_cnt * 1.0 * n_baskets / (lhs_cnt * rhs_cnt), 6)
             AS lift
    FROM rules
    ORDER BY lift DESC, lhs, rhs LIMIT 25
    """,
    tags=("analytics", "join"),
)
def basket_association_rules(spark, sf_dir):
    """Market-basket association rules over order baskets: for brand
    pairs co-occurring in ≥1% of baskets, report support, confidence
    and lift — single-level Apriori, the classic retail co-purchase
    miner.

    The pair join is keyed on the basket id, so cost is Σ(items per
    basket)² — bounded by basket width (TPC-H orders hold ≤7 items),
    NEVER |items|²; the support filter prunes before the dimension
    joins. Counts are integers; support/confidence/lift are terminal
    divisions; top-25 by (lift, lhs, rhs) total order via
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    items = (li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                     li.l_partkey == p.p_partkey)
             .select("l_orderkey", "p_brand").distinct())
    nb = items.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    supp = items.groupBy("p_brand").agg(F.count("*").alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.p_brand") < F.col("b.p_brand")))
             .groupBy(F.col("a.p_brand").alias("lhs"),
                      F.col("b.p_brand").alias("rhs"))
             .agg(F.count("*").alias("both_cnt")))
    sa = supp.select(F.col("p_brand").alias("lhs"),
                     F.col("cnt").alias("lhs_cnt"))
    sb = supp.select(F.col("p_brand").alias("rhs"),
                     F.col("cnt").alias("rhs_cnt"))
    rules = (pairs.join(F.broadcast(sa), "lhs")
             .join(F.broadcast(sb), "rhs")
             .crossJoin(F.broadcast(nb))
             .filter(F.col("both_cnt") * 100 >= F.col("n_baskets")))
    out = rules.select(
        "lhs", "rhs", F.col("both_cnt").cast("long").alias("both_cnt"),
        F.round(F.col("both_cnt") * 1.0 / F.col("n_baskets"), 6)
        .alias("support"),
        F.round(F.col("both_cnt") * 1.0 / F.col("lhs_cnt"), 6)
        .alias("confidence"),
        F.round(F.col("both_cnt") * 1.0 * F.col("n_baskets")
                / (F.col("lhs_cnt") * F.col("rhs_cnt")), 6)
        .alias("lift"))
    return out.orderBy(F.desc("lift"), "lhs", "rhs").limit(25)


@register(
    "text_next_word_suggest",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    big AS (
      SELECT ws[i] AS w, ws[i + 1] AS nxt, count(*) AS cnt
      FROM w, unnest(range(1, len(ws))) AS g(i)
      GROUP BY 1, 2),
    tot AS (SELECT w, CAST(sum(cnt) AS BIGINT) AS w_cnt
            FROM big GROUP BY w),
    r AS (
      SELECT b.w, b.nxt, b.cnt, t.w_cnt,
             row_number() OVER (PARTITION BY b.w
                                ORDER BY b.cnt DESC, b.nxt) AS rnk
      FROM big b JOIN tot t ON b.w = t.w)
    SELECT w, nxt, CAST(rnk AS INT) AS rnk,
           CAST(cnt AS BIGINT) AS cnt,
           round(cnt * 1.0 / w_cnt, 6) AS p
    FROM r WHERE rnk <= 3
    """,
    tags=("llm", "text"),
)
def text_next_word_suggest(spark, sf_dir):
    """Next-word suggestion table: the top-3 continuations of every
    word with conditional probability P(next|word) — the
    autocomplete / speculative-decoding lookup structure distilled
    from the corpus (the serving-side sibling of
    `text_bigram_lm_score`, which SCORES docs with these counts).

    Bigram pairing is a map-side higher-order-function zip (no
    self-join); counts aggregate once keyed by the pair; per-word
    ranking windows run over the bigram vocabulary — bounded by
    realized vocab², not corpus size. Integer counts; one terminal
    division per row."""
    w = (table(spark, sf_dir, "documents")
         .select("doc_id", F.split("text", " ").alias("ws"))
         # guard: Spark's sequence(1, 0) auto-steps DOWN; single-word
         # docs must produce no bigrams, as DuckDB's range(1, 1) does
         .filter(F.size("ws") >= 2))
    big = (w.select(F.explode(F.expr(
        "transform(sequence(1, size(ws) - 1), i -> "
        "struct(element_at(ws, i) AS w, element_at(ws, i + 1) AS nxt))"))
        .alias("b"))
        .groupBy("b.w", "b.nxt").agg(F.count("*").alias("cnt")))
    tot = big.groupBy("w").agg(F.sum("cnt").alias("w_cnt"))
    wr = Window.partitionBy("w").orderBy(F.desc("cnt"), "nxt")
    r = (big.join(tot, "w")
         .withColumn("rnk", F.row_number().over(wr))
         .filter(F.col("rnk") <= 3))
    return r.select(
        "w", "nxt", F.col("rnk").cast("int").alias("rnk"),
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") * 1.0 / F.col("w_cnt"), 6).alias("p"))
