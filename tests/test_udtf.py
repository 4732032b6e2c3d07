"""Python UDTF extension surface (Spark 4): SQL-addressable row→rows
functions, verified against an equivalent DataFrame-native expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingproject_spark.functions.table_functions import (
    CHUNK_STRIDE, CHUNK_TOKENS, register,
)


def test_chunk_text_udtf_matches_dataframe_expansion(spark, sf_dir):
    register(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM udtf_docs d, LATERAL chunk_text(d.text) c
    """)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.floor((n - CHUNK_TOKENS - 1) / CHUNK_STRIDE) + 2)
    want = (docs
            .select("doc_id", toks.alias("t"), n.alias("n"),
                    F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"))
            .select("doc_id", F.col("i").cast("int").alias("chunk_idx"),
                    F.array_join(
                        F.slice("t", F.col("i") * CHUNK_STRIDE + 1,
                                CHUNK_TOKENS), " ").alias("chunk"),
                    F.least(F.lit(CHUNK_TOKENS),
                            F.col("n") - F.col("i") * CHUNK_STRIDE)
                    .cast("int").alias("n_tokens")))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > docs.count()  # actually expands


def test_chunk_text_udtf_empty_and_short(spark):
    register(spark)
    df = spark.createDataFrame([(1, ""), (2, "one two")],
                               "doc_id long, text string")
    df.createOrReplaceTempView("udtf_short")
    rows = spark.sql("""
        SELECT d.doc_id, c.* FROM udtf_short d, LATERAL chunk_text(d.text) c
    """).collect()
    # empty text yields no rows; short text yields exactly one window
    assert {(r["doc_id"], r["chunk_idx"]) for r in rows} == {(2, 0)}
    assert rows[0]["n_tokens"] == 2
