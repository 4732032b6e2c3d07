"""Round-15 wave: lakehouse table-maintenance planning.

`layout_file_compaction_plan` closes the one layout-family gap the
registry had: zonemap pruning and Hilbert/Z-order address WHERE rows
land inside files; nothing addressed HOW MANY files a partition
should hold. At 100 TB the small-files problem (thousands of KB-scale
files per partition → footer/open overhead dominates scans) and its
inverse (one monolithic file → no scan parallelism) are the two
failure modes every table-maintenance service plans against; the
planner here is the aggregate that drives those OPTIMIZE/compaction
jobs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

# Target bytes per file for the synthetic corpus (n_chars is the byte
# proxy): 8 KiB sits inside the per-(source,lang) byte range at every
# test SF, so all three actions (split/keep/compact) are exercised.
# Production uses the same plan with a 128 MiB-1 GiB target.
_FC_TARGET = 8192


@register(
    "layout_file_compaction_plan",
    oracle=f"""
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS est_bytes,
           CAST(greatest(1, (sum(n_chars) + {_FC_TARGET - 1})
                            // {_FC_TARGET}) AS BIGINT) AS target_files,
           CAST((count(*) + greatest(1, (sum(n_chars) + {_FC_TARGET - 1})
                                        // {_FC_TARGET}) - 1)
                // greatest(1, (sum(n_chars) + {_FC_TARGET - 1})
                               // {_FC_TARGET}) AS BIGINT)
               AS docs_per_file,
           CAST(sum(n_chars) * 100 // {_FC_TARGET} AS BIGINT)
               AS pct_of_target,
           CASE WHEN sum(n_chars) > {_FC_TARGET} THEN 'split'
                WHEN sum(n_chars) * 4 < {_FC_TARGET} THEN 'compact'
                ELSE 'keep' END AS action
    FROM documents GROUP BY source, lang
    """,
    tags=("layout", "scale"),
)
def layout_file_compaction_plan(spark, sf_dir):
    """File-sizing plan for a (source, lang)-partitioned documents
    table: per partition, the byte estimate (n_chars as the UTF-8
    proxy), the target file count for an 8 KiB file goal (production
    uses 128 MiB-1 GiB with the same plan)
    (ceil by integer arithmetic — never a double cast, whose rounding
    differs across engines), docs per output file, fill percentage,
    and the maintenance action — 'split' when the partition overflows
    one target file, 'compact' when it sits under a quarter target
    (the small-files signal), else 'keep'.

    Scale: ONE scan and one hash aggregate at partition-key
    cardinality — the plan output is dimension-sized however large
    the table, which is what lets a maintenance service run it every
    few minutes. All outputs are exact integers/strings; integer
    ceil via (a + b - 1) div b."""
    d = table(spark, sf_dir, "documents")
    tgt = F.lit(_FC_TARGET)
    agg = (d.groupBy("source", "lang")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("est_bytes")))
    target_files = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(est_bytes + {_FC_TARGET - 1}) div {_FC_TARGET}"))
    out = agg.withColumn("target_files", target_files.cast("long"))
    return (out
            .withColumn("docs_per_file",
                        F.expr("(n_docs + target_files - 1) "
                               "div target_files").cast("long"))
            .withColumn("pct_of_target",
                        F.expr(f"est_bytes * 100 div {_FC_TARGET}")
                        .cast("long"))
            .withColumn("action",
                        F.when(F.col("est_bytes") > tgt, "split")
                        .when(F.col("est_bytes") * 4 < tgt, "compact")
                        .otherwise("keep")))
