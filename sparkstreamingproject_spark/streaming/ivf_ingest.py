"""Streaming IVF index maintenance — keep the inverted-list ANN index
(``llm/similarity.py:ivf_assign``/``ivf_topk``) current as embeddings
arrive, the similarity-family sibling of ``dedup_ingest``.

The coarse quantizer (centroid set) is FROZEN at index creation
(``init_centroids``) — cells must not drift per micro-batch or old
postings would silently live in the wrong list; production re-trains
centroids offline and rebuilds, exactly like FAISS. Each micro-batch
assigns its vectors to the nearest frozen centroid (broadcast cross
score + argmin window — the ``ivf_assign`` kernel with an explicit
centroid relation) and appends postings PARTITIONED BY cell, so a
probe reads only its ``nprobe`` cell directories (partition pruning)
no matter how many batches ever landed.

Replay safety: postings are append-only (no read of the index during
ingest), so idempotence needs only deterministic per-batch output
locations — each micro-batch OVERWRITES ``ingest_batch=<epoch>`` under
the postings root; a crashed attempt's partial partition is replaced
wholesale on retry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine_similarity
from ..llm.similarity import N_IVF_CELLS


def init_centroids(embeddings: DataFrame, index_dir: str,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   n_cells: int = N_IVF_CELLS) -> None:
    """Freeze the coarse quantizer: the first ``n_cells`` vectors by id
    (the ``ivf_assign`` convention — deterministic; production k-means
    a sample offline). One tiny parquet relation, read+broadcast by
    every subsequent batch."""
    (embeddings.filter(F.col(id_col) < n_cells)
     .select(F.col(id_col).alias("cell"), F.col(emb_col).alias("c_emb"))
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{index_dir}/centroids"))


def assign_to_centroids(df: DataFrame, cents: DataFrame,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding") -> DataFrame:
    """``ivf_assign``'s kernel against an EXPLICIT (frozen) centroid
    relation: broadcast cross score in codegen, argmin via window with
    the same (sim desc, cell) tiebreak."""
    scored = (df.select(F.col(id_col), F.col(emb_col))
              .crossJoin(F.broadcast(cents))
              .select(id_col, emb_col, "cell",
                      F.round(cosine_similarity(emb_col, "c_emb"), 6)
                      .alias("sim")))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, emb_col, "cell"))


def ingest_embeddings_batch(batch: DataFrame, index_dir: str,
                            batch_id: int | None = None,
                            id_col: str = "vec_id",
                            emb_col: str = "embedding") -> None:
    """One micro-batch: assign to frozen cells, append postings
    partitioned by cell (idempotently when ``batch_id`` is given)."""
    spark = batch.sparkSession
    cents = spark.read.parquet(f"{index_dir}/centroids")
    assigned = assign_to_centroids(batch, cents, id_col, emb_col)
    root = f"{index_dir}/postings"
    # refuse to mix the flat cell=-partitioned append layout with the
    # ingest_batch=/cell= batch layout on one root (ADVICE r07): the
    # mix only fails later, at read time, as a partition-discovery
    # error — fail loudly at the write that would create it.
    if os.path.isdir(root):
        top = os.listdir(root)
        if batch_id is None and any(e.startswith("ingest_batch=")
                                    for e in top):
            raise ValueError(
                f"{root} holds ingest_batch= partitions; append mode "
                "would corrupt partition discovery — pass the batch_id.")
        if batch_id is not None and any(e.startswith("cell=")
                                        for e in top):
            raise ValueError(
                f"{root} holds flat cell= partitions; batch-id mode "
                "would corrupt partition discovery — use a fresh root.")
    if batch_id is None:
        assigned.write.partitionBy("cell").mode("append").parquet(root)
    else:
        (assigned.write.partitionBy("cell").mode("overwrite")
         .parquet(f"{root}/ingest_batch={int(batch_id)}"))


def read_postings(spark, index_dir: str) -> DataFrame:
    return spark.read.parquet(f"{index_dir}/postings")


def ivf_ingest_stream(emb_stream: DataFrame, index_dir: str,
                      checkpoint: str,
                      trigger_seconds: int | None = None):
    """Attach the IVF ingest to an embedding stream; foreachBatch's
    epoch id keys the idempotent partition writes."""
    if not os.path.isdir(f"{index_dir}/centroids"):
        raise ValueError("init_centroids must run before streaming "
                         "ingest — the quantizer is frozen at creation")
    writer = (emb_stream.writeStream
              .foreachBatch(lambda b, i: ingest_embeddings_batch(
                  b, index_dir, batch_id=i))
              .option("checkpointLocation", checkpoint))
    if trigger_seconds is None:
        return writer.trigger(availableNow=True).start()
    return writer.trigger(processingTime=f"{trigger_seconds} seconds").start()


def probe_postings(spark, queries: DataFrame, index_dir: str, k: int = 5,
                   nprobe: int = 2, id_col: str = "vec_id",
                   emb_col: str = "embedding") -> DataFrame:
    """Search the MAINTAINED index: rank the frozen centroids per
    query, read only the ``nprobe`` best cells' posting lists
    (partition pruning on the cell directories), score within them —
    ``ivf_topk``'s probe path against the on-disk inverted lists, no
    reassignment of the corpus. This is the read side that makes
    streaming maintenance pay off: query cost tracks cell sizes, not
    corpus size or batch count."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    qscored = (queries.select(F.col(id_col).alias("query_id"),
                              F.col(emb_col).alias("q_emb"))
               .crossJoin(F.broadcast(cents))
               .select("query_id", "q_emb", "cell",
                       F.round(cosine_similarity("q_emb", "c_emb"), 6)
                       .alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    probes = (qscored.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "q_emb", "cell"))
    posts = (read_postings(spark, index_dir)
             .select(F.col(id_col).alias("cand_id"),
                     F.col(emb_col).alias("cand_emb"), "cell"))
    scored = (posts.join(F.broadcast(probes), "cell")
              .filter(F.col("cand_id") != F.col("query_id"))
              .select("query_id", "cand_id",
                      F.round(cosine_similarity("q_emb", "cand_emb"), 6)
                      .alias("cosine")))
    wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))
