"""Round-4 continuation, wave 13: k-group and paired nonparametric
tests (Kruskal-Wallis, Wilcoxon signed-rank, Kendall tau-b), funnel
time-to-convert percentiles, split-document edge-overlap detection,
and per-document n-gram novelty scoring.

Float discipline: rank statistics keep ranks DOUBLED so tied averages
stay integers (the stat_mann_whitney_u recipe); every sum that crosses
a variable number of rows is an exact integer / DECIMAL(38,0) sum; the
test statistic itself is a fixed-arity terminal float expression
written with the identical shape in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


# ------------------------------------------------ Kruskal-Wallis

def _kw_oracle() -> str:
    rd = []
    for i, p in enumerate(_PRIORITIES, 1):
        rd.append(
            f"CAST(sum(CASE WHEN grp = {i} THEN 1 ELSE 0 END) AS BIGINT) AS n{i},\n"
            f"             CAST(sum(CASE WHEN grp = {i} THEN CAST(dr AS DECIMAL(38,0))"
            f" ELSE 0 END) AS DECIMAL(38,0)) AS rd{i}")
    grp_case = "CASE " + " ".join(
        f"WHEN o_orderpriority = '{p}' THEN {i}"
        for i, p in enumerate(_PRIORITIES, 1)) + " END"
    ssum = " + ".join(
        f"CAST(rd{i} AS DOUBLE) * rd{i} / n{i}" for i in range(1, 6))
    return f"""
    WITH p AS (
      SELECT {grp_case} AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    r AS (
      SELECT grp,
             2 * rank() OVER (ORDER BY cents)
               + count(*) OVER (PARTITION BY cents) - 1 AS dr
      FROM p),
    a AS (
      SELECT {rd[0]},
             {rd[1]},
             {rd[2]},
             {rd[3]},
             {rd[4]},
             CAST(count(*) AS BIGINT) AS n
      FROM r),
    t AS (
      SELECT CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS DECIMAL(38,0)) AS tsum
      FROM (SELECT count(*) AS c FROM p GROUP BY cents))
    SELECT n, CAST(4 AS INT) AS df,
           round((3.0 / (CAST(n AS DOUBLE) * (n + 1))) * ({ssum})
                 - 3.0 * (n + 1), 4) AS h_stat,
           round(((3.0 / (CAST(n AS DOUBLE) * (n + 1))) * ({ssum})
                  - 3.0 * (n + 1))
                 / (1.0 - CAST(tsum AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n * n - n)), 4) AS h_tie_corrected
    FROM a, t
    """


@register("stat_kruskal_wallis", oracle=_kw_oracle(), tags=("stat",))
def stat_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H: do the 5 order priorities draw totalprice from
    one distribution? The k-group generalization of
    `stat_mann_whitney_u` (one-way ANOVA's nonparametric sibling, cf.
    `stat_anova_oneway`). Doubled average ranks keep every rank sum an
    exact integer; H (with and without the tie correction) is a
    fixed-arity float over the 5 exact per-group (n_i, Rd_i) pairs.
    Scale: ranks come from a value-histogram + prefix offsets — state
    is bounded by distinct cent values, and the per-group sums are one
    conditional aggregate over that bounded relation."""
    grp = F.when(F.col("o_orderpriority") == _PRIORITIES[0], 1)
    for i, p in enumerate(_PRIORITIES[1:], 2):
        grp = grp.when(F.col("o_orderpriority") == p, i)
    p = (table(spark, sf_dir, "orders")
         .select(grp.alias("grp"),
                 F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                 .alias("cents")))
    # value histogram: one row per distinct cent value with per-group
    # counts — the ordered rank pass runs over THIS bounded relation,
    # never the fact table (the oracle keeps the per-row rank form;
    # the algebra is identical)
    vc = (p.groupBy("cents")
          .agg(F.count("*").alias("t"),
               *[F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
                 .alias(f"g{i}") for i in range(1, 6)]))
    wv = (Window.orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # doubled average rank of every row holding value v:
    # dr_v = 2*(count strictly below) + t_v + 1
    vc = vc.withColumn("dr", 2 * (F.sum("t").over(wv) - F.col("t"))
                       + F.col("t") + 1)
    aggs = []
    # per-group rank sums Rd_i ≈ n_i·2n square past int64 once orders
    # near ~3e9 rows (SF ~2000): exact DECIMAL(38,0) both sides —
    # Spark (ANSI off) would wrap silently where DuckDB raised
    for i in range(1, 6):
        aggs.append(F.sum(f"g{i}").cast("long").alias(f"n{i}"))
        aggs.append(F.sum(F.col(f"g{i}")
                          * F.col("dr").cast("decimal(38,0)"))
                    .cast("decimal(38,0)").alias(f"rd{i}"))
    aggs.append(F.sum("t").cast("long").alias("n"))
    aggs.append(F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")
                      * F.col("t") - F.col("t")).cast("decimal(38,0)")
                .alias("tsum"))
    j = vc.agg(*aggs)
    ssum = None
    for i in range(1, 6):
        term = (F.col(f"rd{i}").cast("double") * F.col(f"rd{i}")
                / F.col(f"n{i}"))
        ssum = term if ssum is None else ssum + term
    nd = F.col("n").cast("double")
    h = (3.0 / (nd * (F.col("n") + 1))) * ssum - 3.0 * (F.col("n") + 1)
    corr = 1.0 - F.col("tsum").cast("double") / (nd * F.col("n") * F.col("n")
                                                 - F.col("n"))
    return j.select("n", F.lit(4).cast("int").alias("df"),
                    F.round(h, 4).alias("h_stat"),
                    F.round(h / corr, 4).alias("h_tie_corrected"))


# ------------------------------------------------ Wilcoxon signed-rank

@register(
    "stat_wilcoxon_signed_rank",
    oracle="""
    WITH y AS (
      SELECT n_name,
             CAST(sum(CASE WHEN year(o_orderdate) = 1994
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS c94,
             CAST(sum(CASE WHEN year(o_orderdate) = 1995
                           THEN CAST(round(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS c95
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) IN (1994, 1995)
      GROUP BY n_name),
    d AS (SELECT n_name, c95 - c94 AS d FROM y WHERE c95 <> c94),
    r AS (
      SELECT d,
             2 * rank() OVER (ORDER BY abs(d))
               + count(*) OVER (PARTITION BY abs(d)) - 1 AS dr
      FROM d),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN d > 0 THEN dr ELSE 0 END) AS BIGINT)
               AS wplus_x2
      FROM r)
    SELECT n, wplus_x2,
           round((CAST(wplus_x2 AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24),
                 4) AS z
    FROM a
    """,
    tags=("stat",),
)
def stat_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test on paired per-nation revenue, 1994 vs
    1995 — the paired sibling of `stat_mann_whitney_u` (a YoY shift
    test that doesn't assume normal differences). Differences are exact
    integer cents; |d| ranks are doubled integers; W+ is an exact
    integer sum; the normal-approximation z is the one terminal
    float."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    yr = F.year("o_orderdate")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    y = (o.filter(yr.isin(1994, 1995))
         .join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy("n_name")
         .agg(F.sum(F.when(yr == 1994, cents).otherwise(0))
              .cast("long").alias("c94"),
              F.sum(F.when(yr == 1995, cents).otherwise(0))
              .cast("long").alias("c95")))
    d = (y.filter(F.col("c95") != F.col("c94"))
         .select((F.col("c95") - F.col("c94")).alias("d")))
    dr = (2 * F.rank().over(Window.orderBy(F.abs("d")))
          + F.count("*").over(Window.partitionBy(F.abs("d"))) - 1)
    r = d.select("d", dr.alias("dr"))
    a = r.agg(F.count("*").cast("long").alias("n"),
              F.sum(F.when(F.col("d") > 0, F.col("dr")).otherwise(0))
              .cast("long").alias("wplus_x2"))
    nd = F.col("n").cast("double")
    z = ((F.col("wplus_x2").cast("double") / 2 - nd * (F.col("n") + 1) / 4)
         / F.sqrt(nd * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24))
    return a.select("n", "wplus_x2", F.round(z, 4).alias("z"))


# ------------------------------------------------ Kendall tau-b

@register(
    "stat_kendall_tau",
    oracle="""
    WITH m AS (
      SELECT n_nationkey AS k,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1),
    p AS (
      SELECT CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS conc,
             CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS disc,
             CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
               AS tx,
             CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
               AS ty,
             CAST(count(*) AS BIGINT) AS n0
      FROM m a JOIN m b ON a.k < b.k)
    SELECT n0, conc, disc,
           round((CAST(conc AS DOUBLE) - disc)
                 / sqrt((CAST(n0 AS DOUBLE) - tx)
                        * (CAST(n0 AS DOUBLE) - ty)), 4) AS tau_b
    FROM p
    """,
    tags=("stat",),
)
def stat_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank correlation between per-nation revenue and
    order count — the concordance sibling of `stat_spearman_rank`
    (robust to monotone transforms, exact with ties). The pair join is
    bounded by the NATION dimension (n(n-1)/2 = 300 pairs at any fact
    size — the fact table collapses to 25 aggregate rows first);
    concordant/discordant/tie counts are exact integers and tau-b is
    one terminal float. For high-cardinality variables the same
    statistic comes from a merge-sort inversion count, never this pair
    join."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    m = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .groupBy(F.col("n_nationkey").alias("k"))
         .agg(F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").alias("x"),
              F.count("*").cast("long").alias("y")))
    a = m.select(F.col("k").alias("ka"), F.col("x").alias("xa"),
                 F.col("y").alias("ya"))
    b = m.select(F.col("k").alias("kb"), F.col("x").alias("xb"),
                 F.col("y").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("ka") < F.col("kb"))
    sgn = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    p = pairs.agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
        .cast("long").alias("tx"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0))
        .cast("long").alias("ty"),
        F.count("*").cast("long").alias("n0"))
    tau = ((F.col("conc").cast("double") - F.col("disc"))
           / F.sqrt((F.col("n0").cast("double") - F.col("tx"))
                    * (F.col("n0").cast("double") - F.col("ty"))))
    return p.select("n0", "conc", "disc", F.round(tau, 4).alias("tau_b"))


# ------------------------------------------------ funnel latency

@register(
    "funnel_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS v_us
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT v.user_id, min(epoch_us(e.ts)) - v.v_us AS delay_us
      FROM v JOIN events e ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.v_us
      GROUP BY v.user_id, v.v_us),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_viewers FROM v),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_converted,
             round(quantile_cont(delay_us, 0.5), 2) AS p50_delay_us,
             round(quantile_cont(delay_us, 0.9), 2) AS p90_delay_us
      FROM p)
    SELECT a.n_viewers, s.n_converted,
           round(CAST(s.n_converted AS DOUBLE) / a.n_viewers, 4) AS cvr,
           s.p50_delay_us, s.p90_delay_us
    FROM a, s
    """,
    tags=("behavioral", "funnel"),
)
def funnel_time_to_convert(spark, sf_dir):
    """Conversion latency: per user, first 'view' to first subsequent
    'purchase' — the how-long companion to `funnel_3step_conversion`'s
    how-many. Delays are exact integer microseconds; the p50/p90 use
    the shared linear-interpolation percentile definition
    (`agg_median_percentiles` precedent). Scale: two user-keyed
    aggregates + one user-keyed join — the same single-shuffle shape
    as sessionization; the percentile runs over the converted-users
    relation (one row per user)."""
    e = table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("v_us")))
    pu = (v.join(e.filter(F.col("event_type") == "purchase"), "user_id")
          .filter(F.unix_micros("ts") > F.col("v_us"))
          .groupBy("user_id", "v_us")
          .agg((F.min(F.unix_micros("ts")) - F.col("v_us").cast("long"))
               .alias("delay_us"))
          .select("user_id", "delay_us"))
    a = v.agg(F.count("*").cast("long").alias("n_viewers"))
    s = pu.agg(F.count("*").cast("long").alias("n_converted"),
               F.round(F.expr("percentile(delay_us, 0.5)"), 2)
               .alias("p50_delay_us"),
               F.round(F.expr("percentile(delay_us, 0.9)"), 2)
               .alias("p90_delay_us"))
    return (a.crossJoin(F.broadcast(s))
            .select("n_viewers", "n_converted",
                    F.round(F.col("n_converted").cast("double")
                            / F.col("n_viewers"), 4).alias("cvr"),
                    "p50_delay_us", "p90_delay_us"))


# ------------------------------------------------ split-doc edges

@register(
    "dedup_doc_edge_overlap",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    pre AS (SELECT doc_id, ws[1] || ' ' || ws[2] || ' ' || ws[3] AS k
            FROM w WHERE len(ws) >= 6),
    suf AS (SELECT doc_id,
                   ws[-3] || ' ' || ws[-2] || ' ' || ws[-1] AS k
            FROM w WHERE len(ws) >= 6),
    hot AS (
      SELECT k FROM (
        SELECT k FROM pre UNION ALL SELECT k FROM suf)
      GROUP BY k HAVING count(*) > 50)
    SELECT s.doc_id AS id_suffix, p.doc_id AS id_prefix, s.k AS edge_key
    FROM suf s JOIN pre p ON s.k = p.k AND s.doc_id <> p.doc_id
    WHERE s.k NOT IN (SELECT k FROM hot)
    """,
    tags=("llm", "dedup"),
)
def dedup_doc_edge_overlap(spark, sf_dir):
    """Split-document detection: doc A's trailing 3 tokens equal doc
    B's leading 3 tokens — the signature of one source document split
    across chunks by a scraper, which per-doc dedup can never see.
    Candidate pairs come from an equi-join on the edge keys (each doc
    contributes exactly one prefix row and one suffix row — at corpus
    scale only a 16-byte key hash per doc shuffles), with a stop-key
    cap: edge keys appearing in > 50 edge rows (a scraper banner
    shared by thousands of docs) are dropped before pair generation,
    the same quadratic-blowup guard as `dedup_ngram_jaccard`'s
    max_postings. A stitching pass would order the pairs into chains
    with `dedup_connected_components`."""
    from ..llm.dedup import words_col
    d = table(spark, sf_dir, "documents")
    ws = words_col("text")
    w = (d.select("doc_id", ws.alias("ws"))
         .filter(F.size("ws") >= 6))
    pre = w.select(F.col("doc_id").alias("id_prefix"),
                   F.concat_ws(" ", F.slice("ws", 1, 3)).alias("k"))
    suf = w.select(F.col("doc_id").alias("id_suffix"),
                   F.concat_ws(" ", F.slice("ws", -3, 3)).alias("k"))
    hot = (pre.select("k").unionAll(suf.select("k"))
           .groupBy("k").agg(F.count("*").alias("c"))
           .filter(F.col("c") > 50).select("k"))
    return (suf.join(pre, "k")
            .join(hot, "k", "left_anti")
            .filter(F.col("id_suffix") != F.col("id_prefix"))
            .select("id_suffix", "id_prefix", F.col("k").alias("edge_key")))


# ------------------------------------------------ n-gram novelty

@register(
    "docs_ngram_novelty",
    oracle=None,  # set below (shares llm.py's SHINGLES_CTE)
    tags=("llm", "text"),
)
def docs_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's distinct
    shingles that no earlier doc (smaller doc_id — ingestion order)
    contains. The curation signal behind 'near-duplicate of earlier
    data' down-weighting during corpus construction: novelty ~1 means
    fresh content, ~0 means the doc restates what the corpus already
    holds. One shingle-keyed aggregate (min doc_id = first-seen) + one
    doc-keyed aggregate — two shuffles, integer counts, terminal
    ratio."""
    from ..llm.dedup import word_shingles
    d = table(spark, sf_dir, "documents")
    sh = word_shingles(d)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (sh.join(first, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                       .otherwise(0)).cast("long").alias("n_novel"))
            .select("doc_id", "n_shingles", "n_novel",
                    F.round(F.col("n_novel").cast("double")
                            / F.col("n_shingles"), 6).alias("novelty")))


def _novelty_oracle() -> str:
    from .llm import SHINGLES_CTE
    return f"""
    WITH {SHINGLES_CTE},
    first AS (SELECT shingle, min(doc_id) AS first_doc
              FROM shingles GROUP BY shingle)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS novelty
    FROM shingles s JOIN first f ON s.shingle = f.shingle
    GROUP BY s.doc_id
    """


from .base import REGISTRY as _REG  # noqa: E402

_REG["docs_ngram_novelty"].oracle = _novelty_oracle()
