"""Round-13 LLM wave: paragraph-granularity dedup with document
reconstruction — the CCNet / RefinedWeb pipeline op (dedup the corpus
at sub-document granularity, then PUT THE DOCUMENTS BACK TOGETHER from
their surviving pieces) that the registry's document-level dedup
family (exact / MinHash / SimHash / semantic) did not cover.

The synthetic ``documents`` corpus has no paragraph separators (flat
word streams), so the sub-document unit is a deterministic fixed-width
word chunk — the same chunking contract as ``text_chunk_windows``,
non-overlapping. The op's SHAPE is what matters and is
granularity-agnostic: hash each unit, keep the corpus-wide FIRST
occurrence (smallest (doc_id, position)), drop every later duplicate,
and reconstruct each document from its surviving units in original
order. On a real corpus the unit is a paragraph split on blank lines;
swapping the splitter changes one projection, not the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

# Chunk width (words). 10 gives multi-chunk docs at every driver SF
# (docs average ~60 words) and plenty of cross-doc repetition in the
# small shared vocabulary — the dedup actually fires.
PARA_W = 10


def chunks_cte(w: int = PARA_W) -> str:
    """``words`` + ``chunks`` oracle CTE pair (DuckDB) — the SQL twin
    of ``chunk_relation``, shared by the paragraph-dedup oracle below
    and the r14 report oracles (`llm21.py`) so the chunking convention
    lives in exactly one place on each side."""
    return f"""words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    chunks AS (
      SELECT doc_id, i AS cidx,
             array_to_string(ws[(i*{w}+1):((i+1)*{w})], ' ') AS chunk
      FROM words,
           LATERAL unnest(generate_series(
               0, CAST(ceil(len(ws) / {float(w)!r}) AS BIGINT) - 1)) t(i))"""


def _para_oracle(w: int = PARA_W) -> str:
    return f"""
    WITH {chunks_cte(w)},
    ranked AS (
      SELECT doc_id, cidx, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, cidx) AS rn
      FROM chunks)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY cidx), '') AS dedup_text
    FROM ranked
    GROUP BY doc_id
    """


def chunk_relation(docs, w: int = PARA_W):
    """(doc_id, cidx, chunk) — every document's fixed-width word
    chunks, built by in-row slicing (narrow; no word-level explode).
    Shared by the batch query below and the streaming ingest fold
    (`streaming/paragraph_maintain.py`)."""
    words = docs.select("doc_id", F.split("text", " ").alias("ws"))
    return (words
            .select("doc_id",
                    F.expr(f"""
        transform(sequence(0, CAST(ceil(size(ws) / {float(w)!r}) AS INT) - 1),
                  i -> struct(i AS cidx,
                              array_join(slice(ws, i*{w} + 1, {w}), ' ')
                                  AS chunk))
                    """).alias("cs"))
            .select("doc_id", F.explode("cs").alias("c"))
            .select("doc_id", F.col("c.cidx").alias("cidx"),
                    F.col("c.chunk").alias("chunk")))


def reconstruct_docs(ranked):
    """(doc_id, n_chunks, n_kept, dedup_text) off a (doc_id, cidx,
    chunk, rn) relation where rn == 1 marks surviving chunks. The
    struct array_sort keeps the aggregation order-insensitive to
    partitioning."""
    return (ranked
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_chunks"),
                 F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                 .cast("long").alias("n_kept"),
                 F.coalesce(
                     F.array_join(
                         F.transform(
                             F.array_sort(F.collect_list(
                                 F.when(F.col("rn") == 1,
                                        F.struct("cidx", "chunk")))),
                             lambda s: s["chunk"]),
                         " "),
                     F.lit("")).alias("dedup_text")))


@register(
    "dedup_paragraph_reconstruct",
    oracle=_para_oracle(),
    tags=("llm", "dedup", "text"),
)
def dedup_paragraph_reconstruct(spark, sf_dir):
    """Sub-document (paragraph-granularity) dedup with reconstruction:
    every document is split into fixed-width word chunks; a chunk
    survives only at its corpus-wide FIRST occurrence (smallest
    (doc_id, chunk-position) — the deterministic keep-first rule CCNet
    uses per shard); each document is rebuilt from its surviving
    chunks in original order. Output per doc: total chunks, kept
    chunks, and the reconstructed text (empty string when every chunk
    was seen earlier — such docs are pure boilerplate).

    Scale shape (the canonical CCNet paragraph-dedup plan): chunking
    is one narrow pass (split + transform — no explode of words, the
    chunk array is built by slicing inside the row); the ONLY
    wide stages are (1) the keep-first decision — a window over
    md5(chunk), i.e. one shuffle hash-partitioned on the chunk hash,
    never a self-join — and (2) the groupBy(doc_id) reconstruction
    shuffle. Both are linear in total chunk count at any corpus size;
    there is no pairwise stage at all, which is why production
    pipelines run paragraph dedup BEFORE the pairwise near-dup
    passes. Reconstruction aggregates (cidx, chunk) structs with
    array_sort — order-insensitive to partitioning (the struct sort
    is the determinism discipline, not collect order)."""
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_relation(docs)
    from pyspark.sql import Window
    rn = F.row_number().over(
        Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "cidx"))
    return reconstruct_docs(chunks.withColumn("rn", rn))
