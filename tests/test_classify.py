"""Behavior tests for classifier-based curation and token-budget
sharding (oracle parity covers the registry queries; these pin
operator semantics on constructed fixtures)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkstreamingproject_spark.llm.classify import nb_train_predict
from sparkstreamingproject_spark.llm.curation import shard_by_token_budget

DOCS_SCHEMA = "doc_id bigint, lang string, text string"


def test_nb_learns_separable_vocabulary(spark):
    """Two classes with disjoint vocabularies: every held-out doc must
    be classified correctly."""
    rows = []
    for i in range(20):
        # even ids -> test split (id % 5 == 0 for 0,10; rest train)
        lang = "aa" if i % 2 == 0 else "bb"
        word = "apple" if lang == "aa" else "banana"
        rows.append((i, lang, " ".join([word] * 8)))
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = nb_train_predict(docs, holdout_mod=5).collect()
    assert len(got) == 4  # ids 0,5,10,15
    assert all(r["actual"] == r["predicted"] for r in got)


def test_nb_unseen_words_fall_back_to_prior(spark):
    """A test doc of only unseen words gets the majority-prior class.
    After the modulo holdout (doc_id % 5 == 0) both classes carry the
    SAME train token total — 24 'x' tokens for big (24 one-token
    train docs) vs 24 for small (8 three-token train docs) — so the
    smoothed unknown mass 1/(T+V) is identical and only the doc prior
    (24 big train docs vs 8 small) can break the tie."""
    rows = [(i, "big", "x") for i in range(1, 40) if i % 4]
    rows += [(i, "small", "x y z") for i in range(1, 40) if not i % 4]
    rows.append((40, "small", "unseen words only"))  # id 40 % 5 == 0
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r["doc_id"]: r for r in
           nb_train_predict(docs, holdout_mod=5).collect()}
    assert got[40]["predicted"] == "big"


def test_nb_output_covers_exactly_the_holdout(spark):
    rows = [(i, "aa", "w w w") for i in range(30)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = nb_train_predict(docs, holdout_mod=3).collect()
    assert sorted(r["doc_id"] for r in got) == [i for i in range(30)
                                                if i % 3 == 0]


def test_shard_budget_prefix_sums_match_serial_order(spark):
    """The distributed two-phase prefix sum must equal the serial
    cumulative sum over (md5(id), id) order."""
    rows = [(i, "xx", " ".join(["tok"] * (5 + i % 7))) for i in range(60)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    budget = 40
    got = {r["doc_id"]: r for r in
           shard_by_token_budget(docs, budget).collect()}
    serial = sorted(
        ((hashlib.md5(str(i).encode()).hexdigest(), i, 5 + i % 7)
         for i in range(60)))
    cum = 0
    for h, i, ntok in serial:
        assert got[i]["ntok"] == ntok
        assert got[i]["shard"] == cum // budget, f"doc {i}"
        cum += ntok
    assert len(got) == 60


def test_shard_budget_is_partitioning_invariant(spark):
    rows = [(i, "xx", " ".join(["t"] * (3 + i % 5))) for i in range(50)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    one = sorted(map(tuple, shard_by_token_budget(
        docs.coalesce(1), 25).collect()))
    many = sorted(map(tuple, shard_by_token_budget(
        docs.repartition(13), 25).collect()))
    assert one == many


def test_shard_sizes_hug_the_budget(spark):
    """No shard except the last may end more than one doc short of its
    budget: shard k's token span is [k*B, (k+1)*B) by construction."""
    rows = [(i, "xx", " ".join(["t"] * 10)) for i in range(100)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    per_shard = (shard_by_token_budget(docs, 97)
                 .groupBy("shard").agg(F.sum("ntok").alias("tokens"))
                 .collect())
    total = sum(r["tokens"] for r in per_shard)
    assert total == 1000
    last = max(r["shard"] for r in per_shard)
    for r in per_shard:
        if r["shard"] != last:
            # spans a full budget window (can overhang into the next)
            assert r["tokens"] >= 97 - 9  # budget minus max doc size


def test_write_token_shards_one_file_per_shard(spark, tmp_path):
    """The writer must emit exactly one parquet file per shard dir and
    round-trip every document with its assignment."""
    import glob
    import os

    from sparkstreamingproject_spark.llm.curation import write_token_shards

    rows = [(i, "xx", " ".join(["t"] * 10)) for i in range(80)]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    path = str(tmp_path / "shards")
    n = write_token_shards(docs, 100, path)
    dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(dirs) == n == 8  # 800 tokens / 100
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    back = spark.read.parquet(path)
    assert back.count() == 80
    assert back.select("doc_id").distinct().count() == 80
    # per-shard token mass equals the assignment's promise
    per = (back.groupBy("shard")
           .agg(F.count("*").alias("docs")).collect())
    assert all(r["docs"] == 10 for r in per)
