"""Round-5 wave 9: feature hashing (the hashing-trick text
vectorizer) driving cross-representation retrieval, and HLL set
intersection via inclusion-exclusion over mergeable registers — two
more large-pipeline staples.

Float discipline: hashed document vectors and e3-quantized embedding
coordinates make every dot/norm an exact integer; ranking uses
sign-preserving squared cosine in 1e-6 units (truncating integer
division). The HLL arithmetic is the driver-green
``sketch_hll_distinct`` recipe verbatim — integer registers, one
identical-order float expression at the end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_FH_DIMS = 64
_FH_DOCS = 5
_FH_TOP = 3
_HLL_M = 512
_ALPHA_NUM = (0.7213 / (1 + 1.079 / _HLL_M)) * (_HLL_M * _HLL_M)
_POW33 = 8589934592  # 2^33


@register(
    "text_feature_hash_retrieval",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < {_FH_DOCS}),
    wf AS (SELECT doc_id, word, md5(word) AS h FROM w WHERE word <> ''),
    dims AS (SELECT doc_id,
                    CAST(('0x' || substr(h, 1, 4)) AS BIGINT)
                      % {_FH_DIMS} AS dim,
                    CASE WHEN CAST(('0x' || substr(h, 5, 1)) AS BIGINT)
                              % 2 = 0 THEN 1 ELSE -1 END AS sgn
             FROM wf),
    v AS (SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS vd
          FROM dims GROUP BY 1, 2),
    nv AS (SELECT doc_id, CAST(sum(vd * vd) AS BIGINT) AS nv2
           FROM v GROUP BY 1),
    eq AS (SELECT vec_id, i - 1 AS dim,
                  CAST(round(embedding[i] * 1000) AS BIGINT) AS ed
           FROM embeddings, unnest(range(1, {_FH_DIMS + 1})) AS g(i)),
    ne AS (SELECT vec_id, CAST(sum(ed * ed) AS BIGINT) AS ne2
           FROM eq GROUP BY 1),
    dot AS (SELECT v.doc_id, eq.vec_id,
                   CAST(sum(v.vd * eq.ed) AS BIGINT) AS d
            FROM v JOIN eq ON eq.dim = v.dim GROUP BY 1, 2),
    sc AS (SELECT dot.doc_id, dot.vec_id,
                  CAST((CASE WHEN dot.d < 0 THEN -1 ELSE 1 END)
                       * (CAST(dot.d AS HUGEINT) * dot.d * 1000000)
                       // (CAST(nv.nv2 AS HUGEINT) * ne.ne2)
                       AS BIGINT) AS cos2_e6
           FROM dot JOIN nv ON nv.doc_id = dot.doc_id
                    JOIN ne ON ne.vec_id = dot.vec_id
           WHERE nv.nv2 > 0 AND ne.ne2 > 0)
    SELECT doc_id, vec_id, cos2_e6, rnk FROM (
      SELECT doc_id, vec_id, cos2_e6,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cos2_e6 DESC, vec_id) AS rnk
      FROM sc)
    WHERE rnk <= {_FH_TOP}
    """,
    tags=("llm", "text", "similarity"),
)
def text_feature_hash_retrieval(spark, sf_dir):
    """The hashing trick (Vowpal-Wabbit-style feature hashing): docs
    vectorize into a fixed 64-dim space via md5(word) -> (dim, ±1)
    with NO vocabulary table — the technique that makes text
    featurization stateless and embarrassingly parallel at any corpus
    size — then retrieve nearest embeddings cross-representation.
    Hashed vectors are integers; embedding coordinates quantize once
    to e3 ints; the ranking key is sign-preserving squared cosine in
    exact integer 1e-6 units. The sparse dot is a dim-keyed join —
    |dims| = 64 keys, so the query side broadcasts. The d²·1e6 and
    nv2·ne2 products run in 128-bit integers (DECIMAL(38,0) here,
    HUGEINT in the oracle): d² passes int64 once |d| > ~3e6, which
    long documents reach at corpus scale, and Spark (ANSI off) would
    wrap silently while DuckDB raised."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    w = (docs.filter(F.col("doc_id") < _FH_DOCS)
         .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
         .filter(F.col("word") != "")
         .withColumn("h", F.md5("word")))
    dims = w.select(
        "doc_id",
        (F.conv(F.substring("h", 1, 4), 16, 10).cast("long") % _FH_DIMS)
        .alias("dim"),
        F.when(F.conv(F.substring("h", 5, 1), 16, 10).cast("long") % 2
               == 0, 1).otherwise(-1).alias("sgn"))
    v = dims.groupBy("doc_id", "dim").agg(F.sum("sgn").alias("vd"))
    nv = v.groupBy("doc_id").agg(F.sum(F.col("vd") * F.col("vd"))
                                 .alias("nv2"))
    eq = (emb.select("vec_id", F.posexplode("embedding")
                     .alias("dim", "e"))
          .select("vec_id", "dim",
                  F.round(F.col("e") * 1000, 0).cast("bigint")
                  .alias("ed")))
    ne = eq.groupBy("vec_id").agg(F.sum(F.col("ed") * F.col("ed"))
                                  .alias("ne2"))
    dot = (eq.join(F.broadcast(v), "dim")
           .groupBy("doc_id", "vec_id")
           .agg(F.sum(F.col("vd") * F.col("ed")).alias("d")))
    sc = (dot.join(F.broadcast(nv), "doc_id").join(ne, "vec_id")
          .filter((F.col("nv2") > 0) & (F.col("ne2") > 0))
          .select("doc_id", "vec_id",
                  (F.when(F.col("d") < 0, -1).otherwise(1)
                   * F.expr("(CAST(d AS DECIMAL(38,0)) * d * 1000000)"
                            " div (CAST(nv2 AS DECIMAL(38,0)) * ne2)"))
                  .cast("bigint").alias("cos2_e6")))
    wnd = (Window.partitionBy("doc_id")
           .orderBy(F.desc("cos2_e6"), "vec_id"))
    return (sc.withColumn("rnk", F.row_number().over(wnd))
            .filter(F.col("rnk") <= _FH_TOP)
            .select("doc_id", "vec_id", "cos2_e6", "rnk"))


def _hll_regs(rel, tag_col="tag", key_col="k"):
    """md5 -> (bucket, leading-one register) — byte-identical to the
    driver-green sketch_hll_distinct recipe, per tag."""
    hx = rel.select(tag_col, F.md5(F.col(key_col).cast("string"))
                    .alias("hx"))
    parts = hx.select(
        tag_col,
        (F.conv(F.substring("hx", 1, 3), 16, 10).cast("long") % _HLL_M)
        .alias("bucket"),
        F.conv(F.substring("hx", 4, 8), 16, 10).cast("long").alias("w"))
    return (parts.groupBy(tag_col, "bucket")
            .agg(F.max(F.when(F.col("w") == 0, 33)
                       .otherwise(33 - F.length(F.bin("w"))))
                 .alias("m")))


def _hll_est(regs, group_cols):
    s = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - m AS INT))"))
        .alias("sf"),
        F.count("*").alias("v"))
    return s.select(
        *group_cols,
        F.round((F.lit(_ALPHA_NUM) * F.lit(float(_POW33)))
                / (F.col("sf") + (F.lit(_HLL_M) - F.col("v"))
                   * F.lit(_POW33)), 2).alias("e"))


@register(
    "sketch_hll_intersect_estimate",
    oracle=f"""
    WITH ab AS (
      SELECT DISTINCT 'a' AS tag, l_orderkey AS k FROM lineitem
      WHERE l_returnflag = 'R'
      UNION
      SELECT DISTINCT 'b', l_orderkey FROM lineitem
      WHERE l_returnflag = 'N'),
    h AS (SELECT tag, md5(CAST(k AS VARCHAR)) AS hx FROM ab),
    parts AS (SELECT tag,
                     CAST(('0x' || substr(hx, 1, 3)) AS BIGINT)
                       % {_HLL_M} AS bucket,
                     CAST(('0x' || substr(hx, 4, 8)) AS BIGINT) AS w
              FROM h),
    regs AS (SELECT tag, bucket,
                    max(CASE WHEN w = 0 THEN 33
                             ELSE 33 - length(bin(w)) END) AS m
             FROM parts GROUP BY 1, 2),
    uregs AS (SELECT bucket, max(m) AS m FROM regs GROUP BY bucket),
    est AS (SELECT tag,
                   round((CAST({_ALPHA_NUM!r} AS DOUBLE)
                          * {float(_POW33)!r})
                         / (sum(CAST(1 AS BIGINT) << (33 - m))
                            + ({_HLL_M} - count(*)) * {_POW33}), 2) AS e
            FROM regs GROUP BY tag),
    uest AS (SELECT round((CAST({_ALPHA_NUM!r} AS DOUBLE)
                           * {float(_POW33)!r})
                          / (sum(CAST(1 AS BIGINT) << (33 - m))
                             + ({_HLL_M} - count(*)) * {_POW33}), 2)
                      AS e
             FROM uregs),
    exact AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'N'))
    SELECT (SELECT e FROM est WHERE tag = 'a') AS est_a,
           (SELECT e FROM est WHERE tag = 'b') AS est_b,
           (SELECT e FROM uest) AS est_union,
           round((SELECT e FROM est WHERE tag = 'a')
                 + (SELECT e FROM est WHERE tag = 'b')
                 - (SELECT e FROM uest), 2) AS est_intersect,
           (SELECT n FROM exact) AS exact_intersect
    """,
    tags=("sketch", "agg"),
)
def sketch_hll_intersect_estimate(spark, sf_dir):
    """HLL set algebra: returned-orders vs normal-orders key sets
    sketched into mergeable registers (the sketch_hll_distinct recipe
    verbatim), union by register max, intersection by
    inclusion-exclusion of the three estimates — how distinct-overlap
    questions are answered at 100 TB without ever materializing the
    sets side by side (512-byte state per set, merged with max()).
    The exact intersection rides along as the accuracy reference."""
    li = table(spark, sf_dir, "lineitem")

    def keys(flag, tag):
        return (li.filter(F.col("l_returnflag") == flag)
                .select(F.lit(tag).alias("tag"),
                        F.col("l_orderkey").alias("k")).distinct())

    ab = keys("R", "a").union(keys("N", "b")).distinct()
    regs = _hll_regs(ab).localCheckpoint()
    est = _hll_est(regs, ["tag"])
    uregs = (regs.groupBy("bucket").agg(F.max("m").alias("m"))
             .withColumn("g", F.lit(1)))
    uest = _hll_est(uregs, ["g"]).select(F.col("e").alias("eu"))
    ea = est.filter(F.col("tag") == "a").select(F.col("e").alias("est_a"))
    eb = est.filter(F.col("tag") == "b").select(F.col("e").alias("est_b"))
    r = (li.filter(F.col("l_returnflag") == "R")
         .select("l_orderkey").distinct())
    n = (li.filter(F.col("l_returnflag") == "N")
         .select("l_orderkey").distinct())
    exact = (r.join(n, "l_orderkey", "left_semi")
             .agg(F.count("*").alias("exact_intersect")))
    return (ea.crossJoin(F.broadcast(eb)).crossJoin(F.broadcast(uest))
            .crossJoin(F.broadcast(exact))
            .select("est_a", "est_b", F.col("eu").alias("est_union"),
                    F.round(F.col("est_a") + F.col("est_b")
                            - F.col("eu"), 2).alias("est_intersect"),
                    "exact_intersect"))
