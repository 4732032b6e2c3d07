"""Round-5 wave 5: TextRank keyphrase extraction (PageRank on the
word-adjacency graph — the classic unsupervised keyword algorithm)
and item-item co-occurrence cosine (the collaborative-filtering
similarity primitive behind "customers also bought").

Float discipline: TextRank mirrors the driver-green
``graph_pagerank_transitions`` recipe exactly — 6dp rounding after
every damped iteration on both engine sides, so the engines iterate
on identical values; item-item cosine is exact integer (squared
cosine in 1e-8 units via truncating division).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_TR_ITER = 10
_TR_DAMP = 0.85
_TR_TOP = 15
_CF_TOP = 50


def _textrank_oracle() -> str:
    d = _TR_DAMP
    parts = [f"""
    toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    raw AS (SELECT t[i] AS a, t[i+1] AS b
            FROM toks, unnest(range(1, len(t))) AS g(i)
            WHERE t[i] <> t[i+1] AND t[i] <> '' AND t[i+1] <> ''),
    edges AS (SELECT DISTINCT a AS src, b AS dst FROM raw
              UNION
              SELECT DISTINCT b AS src, a AS dst FROM raw),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    outdeg AS (SELECT src AS node, count(*) AS deg FROM edges
               GROUP BY src),
    r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 6) AS rank
           FROM nodes)"""]
    for k in range(1, _TR_ITER + 1):
        parts.append(f"""
    c{k} AS (
      SELECT e.dst AS node, sum(r.rank / od.deg) AS s
      FROM edges e
      JOIN r{k - 1} r ON r.node = e.src
      JOIN outdeg od ON od.node = e.src
      GROUP BY e.dst),
    r{k} AS (
      SELECT n.node,
             round((1 - {d}) / (SELECT n FROM nn)
                   + {d} * coalesce(c.s, 0), 6) AS rank
      FROM nodes n LEFT JOIN c{k} c USING (node))""")
    return ("WITH" + ",".join(parts) + f"""
    SELECT word, rank, rnk FROM (
      SELECT node AS word, rank,
             row_number() OVER (ORDER BY rank DESC, node) AS rnk
      FROM r{_TR_ITER})
    WHERE rnk <= {_TR_TOP}""")


@register("text_keyphrase_textrank", oracle=_textrank_oracle(),
          tags=("llm", "text", "graph"))
def text_keyphrase_textrank(spark, sf_dir):
    """TextRank keyword extraction: PageRank over the symmetrized
    word-adjacency graph (adjacent-word edges, self-loops dropped),
    top words by stationary score. Reuses operators/graph.py:pagerank
    — the generic per-round join+sum edge-list iteration with 6dp
    re-quantization each round (identical values in both engines) —
    on a vocabulary-cardinality graph: the fact scan builds the edge
    list once; every iteration touches only |V|+|E| rows, so corpus
    size only affects the first aggregation."""
    from ..operators.graph import pagerank
    docs = table(spark, sf_dir, "documents")
    t = docs.select(F.split("text", " ").alias("t"))
    raw = (t.select(F.posexplode("t").alias("i", "a"), "t")
           .select("a", F.expr("get(t, i + 1)").alias("b"))
           .filter(F.col("b").isNotNull()
                   & (F.col("a") != F.col("b"))
                   & (F.col("a") != "") & (F.col("b") != "")))
    edges = (raw.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .union(raw.select(F.col("b").alias("src"),
                               F.col("a").alias("dst")))
             .distinct())
    pr = pagerank(edges, "src", "dst", n_iter=_TR_ITER, damping=_TR_DAMP)
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("rank"), "node")
    return (pr.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _TR_TOP)
            .select(F.col("node").alias("word"), "rank", "rnk"))


@register(
    "sim_item_cooccurrence_cosine",
    oracle=f"""
    WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                FROM lineitem),
    n AS (SELECT i, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY i),
    co AS (SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS co
           FROM bi a JOIN bi b ON a.o = b.o AND a.i < b.i
           GROUP BY 1, 2),
    s AS (SELECT ia, ib, co, na.cnt AS ca, nb.cnt AS cb,
                 CAST((co * co * 100000000) // (na.cnt * nb.cnt)
                      AS BIGINT) AS cos2_e8
          FROM co JOIN n na ON na.i = ia JOIN n nb ON nb.i = ib)
    SELECT ia, ib, co, ca, cb, cos2_e8 FROM s
    ORDER BY cos2_e8 DESC, ia, ib LIMIT {_CF_TOP}
    """,
    tags=("similarity", "analytics", "join"),
)
def sim_item_cooccurrence_cosine(spark, sf_dir):
    """Item-item collaborative filtering: cosine similarity between
    parts over the order-basket incidence matrix —
    cos(a,b) = co(a,b)/sqrt(n_a·n_b) — shipped as the exact-integer
    SQUARED cosine in 1e-8 units (squaring removes the sqrt, the
    ordering is identical). Co-occurrence pairs are bounded by
    Σ C(basket_size, 2) — linear in orders for bounded baskets, never
    |items|²; the count join is two broadcast-size dimension lookups;
    top-k is TakeOrderedAndProject."""
    li = (table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("i")).distinct())
    n = li.groupBy("i").agg(F.count("*").alias("cnt"))
    a, b = li.alias("a"), li.alias("b")
    co = (a.join(b, (F.col("a.o") == F.col("b.o"))
                 & (F.col("a.i") < F.col("b.i")))
          .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
          .agg(F.count("*").alias("co")))
    s = (co.join(n.select(F.col("i").alias("ia"),
                          F.col("cnt").alias("ca")), "ia")
         .join(n.select(F.col("i").alias("ib"),
                        F.col("cnt").alias("cb")), "ib")
         .select("ia", "ib", "co", "ca", "cb",
                 F.expr("(co * co * 100000000) div (ca * cb)")
                 .alias("cos2_e8")))
    return s.orderBy(F.desc("cos2_e8"), "ia", "ib").limit(_CF_TOP)
