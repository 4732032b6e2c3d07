"""Distributed text classification for corpus curation.

Training-data pipelines routinely score every document with a cheap
linear classifier (fastText-style quality / language / domain models).
This module provides the Spark-native equivalent: a multinomial Naive
Bayes trained and applied in ONE declarative plan — counts, smoothed
log-likelihoods, and the argmax are all DataFrame operations, so
Catalyst sees the whole dataflow and the model relations (per-class
token counts over a bounded vocabulary) stay broadcast-joinable.

Scale shape: the corpus is scanned twice (train token counts, test
scoring) and every model-side relation has vocabulary x classes
cardinality — kilobytes even for a 1M-type vocabulary — so the scoring
join is a broadcast hash join against the token stream; no all-pairs,
no shuffle keyed on doc content.

Determinism: log-probabilities are quantized ONCE to scaled integers
(``CAST(round(ln(p) * 1e6) AS BIGINT)`` — the same expression a SQL
oracle runs), so per-document score sums are exact integer arithmetic:
bit-identical under any partitioning and engine, and the per-class
argmax (with class-name tiebreak) can never flip on float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale for quantized log-probabilities
_NB_SCALE = 1_000_000


def nb_train_predict(docs: DataFrame, label_col: str = "lang",
                     text_col: str = "text", id_col: str = "doc_id",
                     holdout_mod: int = 5) -> DataFrame:
    """Train add-one multinomial NB on docs with id % mod != 0 and
    predict the held-out rest. Returns (id, actual, predicted).

    Tokens are whitespace words; features are per-class token counts
    with Laplace smoothing over the train vocabulary; unseen test
    tokens get the smoothed unknown mass 1/(T_c + V).
    """
    is_test = (F.col(id_col) % holdout_mod) == 0

    words = (docs.select(id_col, label_col,
                         F.explode(F.split(F.col(text_col), " "))
                         .alias("word"))
             .filter(F.col("word") != ""))
    train_w = words.filter(~is_test)
    test_w = words.filter(is_test).select(id_col, "word")

    # model relations: classes x vocab counts, class totals, vocab size,
    # doc priors — all tiny, all broadcast below
    wc = train_w.groupBy(label_col, "word").agg(F.count("*").alias("c"))
    tot = wc.groupBy(label_col).agg(F.sum("c").alias("t"))
    vocab = train_w.agg(F.countDistinct("word").alias("v"))
    pri = (docs.filter(~is_test).groupBy(label_col)
           .agg(F.count("*").alias("nd"))
           .withColumn("ntr", F.sum("nd").over(
               Window.partitionBy(F.lit(1)))))

    def _q(x):  # quantized natural log — exact-integer downstream sums
        return F.round(F.log(x) * _NB_SCALE, 0).cast("bigint")

    cls = (tot.join(pri, label_col).crossJoin(F.broadcast(vocab))
           .select(F.col(label_col).alias("cls"), "t", "v",
                   _q(F.col("nd").cast("double") / F.col("ntr"))
                   .alias("qprior"),
                   _q(F.lit(1.0) / (F.col("t") + F.col("v")))
                   .alias("qunk")))
    qp = (wc.join(tot, label_col).crossJoin(F.broadcast(vocab))
          .select(F.col(label_col).alias("cls"), "word",
                  _q((F.col("c") + F.lit(1.0))
                     / (F.col("t") + F.col("v"))).alias("q")))

    scored = (test_w.crossJoin(F.broadcast(cls.select("cls", "qprior",
                                                      "qunk")))
              .join(F.broadcast(qp), ["cls", "word"], "left")
              .groupBy(id_col, "cls", "qprior")
              .agg(F.sum(F.coalesce("q", "qunk")).alias("s"))
              .select(id_col, "cls",
                      (F.col("qprior") + F.col("s")).alias("score")))
    pred = (scored.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy(id_col)
            .orderBy(F.desc("score"), F.asc("cls"))))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("cls").alias("predicted")))

    actual = (docs.filter(is_test)
              .select(id_col, F.col(label_col).alias("actual")))
    return actual.join(pred, id_col)
