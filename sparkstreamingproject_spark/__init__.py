"""sparkstreamingproject_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference project ``dudulife/sparkStreamingProject``
(a Spark-DStream real-time data-warehouse pipeline; see SURVEY.md) on
idiomatic Spark primitives: DataFrame / Spark SQL / Catalyst /
Structured Streaming. Extended with a full relational operator surface
and LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis), each designed for 100 TB scale.

Layout
------
- ``session``    SparkSession builders with scale-tuned defaults
- ``schemas``    StructType schemas (log envelope, CDC envelope, DWD beans)
- ``sources``    batch + streaming source builders (parquet, json, kafka, rate)
- ``operators``  batch operators (flatten, explode, routing, relational, kv)
- ``functions``  scalar/text/vector column-function library (JVM-side)
- ``streaming``  Structured Streaming jobs (split, dim upsert, windows, dedup)
- ``llm``        LLM-data-pipeline ops (dedup, similarity, text stats, multimodal)
- ``plans``      plan-inspection helpers (pushdown/broadcast assertions)
- ``queries``    the driver-facing query registry + DuckDB oracle SQL
"""

__version__ = "0.1.0"
