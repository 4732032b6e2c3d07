"""Extended relational surface: the SQL entry point, subqueries,
percentiles, grouping sets, string/date function families — rounding
out the analytics surface a reference user would expect after
migration (the reference declares spark-sql as a dependency but never
uses it; here SQL is a first-class entry point).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table


@register(
    "sql_entrypoint_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("sql", "subquery"),
)
def sql_entrypoint_correlated(spark, sf_dir):
    """spark.sql() as an engine surface: correlated scalar subquery
    (orders > 2× that customer's average). Catalyst de-correlates this
    into an aggregate + join — no per-row re-execution, unlike a
    hand-rolled loop."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM orders_v o2
                                  WHERE o2.o_custkey = o.o_custkey)
    """)


@register(
    "scalar_subquery_filter",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) + 5.0 FROM part)
    """,
    tags=("sql", "subquery"),
)
def scalar_subquery_filter(spark, sf_dir):
    """Uncorrelated scalar subquery → broadcast scalar; the filter
    still pushes to the scan once the scalar resolves."""
    p = table(spark, sf_dir, "part")
    avg_price = p.agg((F.avg("p_retailprice") + 5.0).alias("cutoff"))
    return (p.join(F.broadcast(avg_price))
            .filter(F.col("p_retailprice") > F.col("cutoff"))
            .select("p_partkey", "p_name", "p_retailprice"))


@register(
    "window_percent_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           ntile(4) OVER w AS quartile,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def window_percent_ntile(spark, sf_dir):
    """Distribution window functions (percent_rank / ntile / cume_dist).
    percent_rank is (rank-1)/(n-1) on identical integers — identical
    IEEE division in both engines; rounded anyway for safety."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (table(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment",
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.ntile(4).over(w).cast("long").alias("quartile"),
                    F.cume_dist().over(w).alias("cume")))


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (DataFrame API only
    exposes rollup/cube; sets compose them)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """)


@register(
    "agg_filtered_conditional",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 100000) AS big_orders,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_orderpriority = '1-URGENT'), 2) AS DOUBLE)
             AS urgent_total
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_filtered_conditional(spark, sf_dir):
    """Conditional aggregation: FILTER clauses / CASE-counting — the
    one-pass multi-metric pattern (no N scans for N metrics)."""
    o = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return (o.groupBy("o_orderstatus")
            .agg(F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("big_orders"),
                 F.count(F.when(urgent, 1)).alias("urgent"),
                 F.round(F.sum(F.when(urgent, F.col("o_totalprice").cast("decimal(18,2)"))), 2)
                 .cast("double").alias("urgent_total")))


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 1, 8) AS name8,
           regexp_replace(c_name, '[0-9]+', '#') AS masked,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           trim(' ' || c_name || ' ') AS trimmed,
           len(string_split(c_name, '#')) AS parts,
           reverse(c_mktsegment) AS rev_seg,
           left(c_mktsegment, 3) AS seg3
    FROM customer WHERE c_custkey <= 200
    """,
    tags=("scalar", "string"),
)
def string_functions(spark, sf_dir):
    """String function family (H2 extended): substr / regexp_replace /
    lpad / trim / split / reverse / left."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name8"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("masked"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.size(F.split("c_name", "#")).cast("long").alias("parts"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("scalar", "date"),
)
def date_functions(spark, sf_dir):
    """Date/time function family over naive wall-clock timestamps
    (machine-tz-safe: extraction and arithmetic on the wall value)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n)
    SELECT doc_id, word, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word) AS rn
      FROM scored)
    WHERE rn <= 3
    """,
    tags=("llm", "text"),
)
def text_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document — built entirely from joins and
    window rank; document frequency broadcast (one row per term), the
    corpus size as a broadcast 1-row aggregate crossJoined in-plan (no
    separate count() job for one scalar).

    r16 corpus-scan reuse (guide §2.4; VERDICT r15 §next 5): the r15
    audit plan ran the full word explode TWICE (tf and df prune
    different columns, so the subtrees canonicalize unequal and
    ReusedExchange never fires) plus a third scan for n_docs. Now
    ``df`` derives FROM ``tf`` — tf has exactly one row per distinct
    (doc_id, word), so ``count(*)`` per word over tf IS
    ``countDistinct(doc_id)`` over words (value-identical, and it
    drops the distinct-expand machinery) — and ``tf`` is
    localCheckpointed at the junction: one explode feeds both
    consumers. Storage note: tf pins the distinct (doc, word) relation
    on executors — corpus-scale but strictly smaller than the words
    explode it replaces re-running (see llm/dedup.py module note)."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint()
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (tf.join(F.broadcast(df), "word")
              .crossJoin(F.broadcast(n_docs))
              .select("doc_id", "word",
                      F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4)
                      .alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3).select("doc_id", "word", "tfidf"))


@register(
    "multimodal_payload_b64",
    oracle="""
    SELECT doc_id, to_base64(encode(text)) AS payload_b64,
           octet_length(encode(text)) AS byte_len
    FROM documents WHERE doc_id < 100
    """,
    tags=("llm", "multimodal"),
)
def multimodal_payload_b64(spark, sf_dir):
    """Binary payload transport encoding (base64) — the serialization
    path for shipping media bytes through JSON/text sinks."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    payload = F.encode(F.col("text"), "utf-8")
    # Spark's base64 emits MIME line breaks every 76 chars; strip to
    # canonical (RFC 4648) form
    b64 = F.regexp_replace(F.base64(payload), "\r\n", "")
    return d.select("doc_id",
                    b64.alias("payload_b64"),
                    F.length(payload).cast("long").alias("byte_len"))


@register(
    "agg_median_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           round(quantile_cont(c_acctbal, 0.5), 4) AS median,
           round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
           count(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_median_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (both engines use the
    same linear-interpolation definition). At extreme scale swap for
    approx_percentile (t-digest) — same call shape."""
    c = table(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment")
            .agg(F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
                 F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median"),
                 F.round(F.expr("percentile(c_acctbal, 0.75)"), 4).alias("p75"),
                 F.count("*").alias("n")))


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_pivot(spark, sf_dir):
    """PIVOT with an explicit value list (never let pivot scan for
    distinct values at scale — that's an extra full pass)."""
    return (table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["O", "F", "P"])
            .count()
            .select("o_orderpriority",
                    F.coalesce("O", F.lit(0)).alias("O"),
                    F.coalesce("F", F.lit(0)).alias("F"),
                    F.coalesce("P", F.lit(0)).alias("P")))


@register(
    "explode_with_position",
    oracle="""
    SELECT doc_id,
           unnest(range(0, len(string_split(text, ' ')))) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 50
    """,
    tags=("explode",),
)
def explode_with_position(spark, sf_dir):
    """posexplode: array → (position, element) rows — the ordinal
    variant of D1 (order column in PageDisplayLog is exactly this)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (d.select("doc_id",
                     F.posexplode(F.split("text", " ")).alias("pos", "word"))
            .select("doc_id", F.col("pos").cast("long").alias("pos"), "word"))


@register(
    "null_functions",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS st_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS st_filled,
           (o_orderstatus IS DISTINCT FROM 'P') AS not_pending,
           CASE WHEN o_orderstatus IS NULL THEN 'null' ELSE 'set' END AS null_class
    FROM orders WHERE o_orderkey <= 300
    """,
    tags=("scalar",),
)
def null_functions(spark, sf_dir):
    """Null-handling family (H5 extended): nullif / coalesce /
    null-safe comparison / null classification."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.expr("nullif(o_orderstatus, 'P')").alias("st_or_null"),
        F.coalesce(F.expr("nullif(o_orderstatus, 'P')"), F.lit("PENDING"))
        .alias("st_filled"),
        (~F.col("o_orderstatus").eqNullSafe("P")).alias("not_pending"),
        F.when(F.col("o_orderstatus").isNull(), "null").otherwise("set")
        .alias("null_class"),
    )


@register(
    "sim_ann_ivf_cells",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cell, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT e.vec_id, c.cell,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(c.c_emb AS DOUBLE[])), 6) AS sim
      FROM embeddings e CROSS JOIN cents c),
    ranked AS (
      SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cell) AS rn
      FROM scored)
    SELECT vec_id, cell FROM ranked WHERE rn = 1
    """,
    tags=("llm", "similarity"),
)
def sim_ann_ivf_cells(spark, sf_dir):
    """IVF coarse assignment (the second ANN scale path next to LSH):
    nearest-centroid cell per vector. Search over nprobe cells is
    exercised in tests/test_llm.py (ivf_topk recall)."""
    from ..llm.similarity import ivf_assign
    emb = table(spark, sf_dir, "embeddings")
    return ivf_assign(emb).select("vec_id", "cell")
