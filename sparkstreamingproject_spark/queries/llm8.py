"""Round-7 continued unfreeze, wave 2: exact repeated-substring span
accounting — the curation classic the dedup family still lacked.

``corpus_boilerplate_shingles`` scores *how much* of a doc is shared
shingle mass; the exact-substring-dedup pattern from the dedup
literature needs *where*: the maximal token spans covered by k-gram
shingles that occur more than once anywhere in the corpus (within- or
cross-document). Those spans are what a substring-level deduper would
cut, and span/coverage accounting is the report a curation pipeline
runs before committing to the cut.

Shape (all shuffles key-bounded, no all-pairs anywhere):
  1. k-gram shingles with 1-based start positions (posexplode — one
     row per token, same cardinality as tokenization);
  2. duplicated shingles via a map-side-combinable count ≥ 2
     (shuffle on the shingle key);
  3. shuffle-join positions back on the shingle key;
  4. per-doc gaps-and-islands over start positions with a variable
     gap: starts ≤ K apart produce contiguous token coverage, so they
     merge into one maximal span (break when gap > K) — the window is
     partitioned by doc, never global.

Determinism: positions, span bounds, and token counts are all integer
arithmetic; the single float (coverage fraction) is rounded to 6dp
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

#: shingle width in tokens — spans are unions of K-token windows
_RS_K = 5


@register(
    "dedup_repeated_substring",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
    ps AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(w, i, i + {_RS_K - 1}), ' ') AS s
      FROM toks, unnest(range(1, len(w) - {_RS_K - 2})) AS g(i)
      WHERE len(w) >= {_RS_K}),
    dup AS (SELECT s FROM ps GROUP BY s HAVING count(*) >= 2),
    d AS (SELECT p.doc_id, p.pos FROM ps p JOIN dup USING (s)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) <= {_RS_K}
                  THEN 0 ELSE 1 END AS brk
      FROM d),
    grps AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM isl),
    spans AS (
      SELECT doc_id, min(pos) AS span_start,
             max(pos) + {_RS_K - 1} AS span_end
      FROM grps GROUP BY doc_id, grp),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
             CAST(max(span_end - span_start + 1) AS BIGINT) AS longest_span
      FROM spans GROUP BY doc_id)
    SELECT a.doc_id, a.n_spans, a.dup_tokens, a.longest_span,
           CAST(len(t.w) AS BIGINT) AS n_tokens,
           round(a.dup_tokens * 1.0 / len(t.w), 6) AS dup_frac
    FROM agg a JOIN toks t USING (doc_id)
    """,
    tags=("llm", "dedup", "curation", "scale"),
)
def dedup_repeated_substring(spark, sf_dir):
    """Maximal repeated-substring spans per document: for every K-token
    shingle occurring ≥ 2 times corpus-wide, merge its start positions
    into maximal contiguous token spans (starts ≤ K apart cover
    contiguous tokens, so ``dup_tokens`` is the EXACT number of tokens
    lying under at least one duplicated shingle — no double counting).

    100 TB: tokenize and shingle are narrow; the only shuffles are the
    shingle-count aggregate (map-side combinable, keys = distinct
    shingles) and the join back on the shingle key; islands are
    per-doc windows. Nothing is proportional to docs², and no shingle
    text survives past the join — downstream carries (doc_id, pos)
    pairs only."""
    k = _RS_K
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("w"))
    ps = (toks.filter(F.size("w") >= k)
          .select("doc_id",
                  F.posexplode(F.expr(
                      f"transform(sequence(1, size(w) - {k - 1}), "
                      f"i -> concat_ws(' ', slice(w, i, {k})))"))
                  .alias("p0", "s"))
          .select("doc_id", (F.col("p0") + 1).alias("pos"), "s"))
    dup = (ps.groupBy("s").agg(F.count("*").alias("c"))
           .filter(F.col("c") >= 2).select("s"))
    d = ps.join(dup, "s").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = d.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0))
        .otherwise(F.lit(1)))
    grps = isl.withColumn("grp", F.sum("brk").over(run))
    spans = (grps.groupBy("doc_id", "grp")
             .agg(F.min("pos").alias("span_start"),
                  (F.max("pos") + (k - 1)).alias("span_end"))
             .withColumn("span_len",
                         F.col("span_end") - F.col("span_start") + 1))
    agg = (spans.groupBy("doc_id")
           .agg(F.count("*").alias("n_spans"),
                F.sum("span_len").alias("dup_tokens"),
                F.max("span_len").cast("long").alias("longest_span")))
    return (agg.join(toks.select(
                "doc_id", F.size("w").cast("long").alias("n_tokens")),
                "doc_id")
            .select("doc_id", "n_spans", "dup_tokens", "longest_span",
                    "n_tokens",
                    F.round(F.col("dup_tokens") / F.col("n_tokens"), 6)
                    .alias("dup_frac")))
