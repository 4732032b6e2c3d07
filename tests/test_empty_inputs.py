"""Empty-input robustness: every core operator must return an empty
result (correct schema, no crash) on an empty DataFrame — at cluster
scale empty partitions/filtered-to-nothing inputs are routine."""

from __future__ import annotations


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_dedup_ops_on_empty(spark):
    from sparkstreamingproject_spark.llm.dedup import (
        exact_dedup, jaccard_pairs, lsh_candidate_pairs,
        minhash_signatures, simhash, word_shingles)
    d = _empty_docs(spark)
    assert word_shingles(d).count() == 0
    assert exact_dedup(d).count() == 0
    assert minhash_signatures(d).count() == 0
    assert lsh_candidate_pairs(d).count() == 0
    assert jaccard_pairs(d).count() == 0
    assert simhash(d).count() == 0


def test_similarity_ops_on_empty(spark):
    from sparkstreamingproject_spark.llm.similarity import (
        embedding_near_dup_pairs, kmeans_centroids, lsh_bucket,
        lsh_multi_table_pairs)
    e = _empty_emb(spark)
    assert lsh_bucket(e).count() == 0
    assert lsh_multi_table_pairs(e).count() == 0
    assert embedding_near_dup_pairs(e).count() == 0
    assert kmeans_centroids(e, n_iter=1).count() == 0


def test_curation_ops_on_empty(spark):
    from sparkstreamingproject_spark.llm.curation import (
        char_entropy, decontaminate, incremental_dedup, pack_sequences,
        pii_scrub, repetition_stats)
    d = _empty_docs(spark)
    assert decontaminate(d, d).count() == 0
    assert repetition_stats(d).count() == 0
    assert pii_scrub(d).count() == 0
    assert incremental_dedup(d, d).count() == 0
    assert pack_sequences(d).count() == 0
    assert char_entropy(d).count() == 0


def test_misc_ops_on_empty(spark):
    from sparkstreamingproject_spark.llm.dedup import connected_components
    from sparkstreamingproject_spark.operators.bloom import (
        build_bloom, optimal_params)
    from sparkstreamingproject_spark.operators.temporal import scd2_history
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0
    ev = spark.createDataFrame([], "k long, ts timestamp, p double")
    assert scd2_history(ev, "k", "ts", ["p"]).count() == 0
    m, kk = optimal_params(1)
    bits = build_bloom(spark.createDataFrame([], "x long"), "x", m, kk)
    assert bits == bytes(len(bits))  # all-zero bitset


def test_round3_ops_on_empty(spark):
    from sparkstreamingproject_spark.llm.dedup import containment_pairs
    from sparkstreamingproject_spark.llm.multimodal import (
        image_resize_plan, resize_stub,
    )
    from sparkstreamingproject_spark.operators.temporal import asof_join
    from sparkstreamingproject_spark.streaming.anomaly import (
        daily_count_baseline, zscore_flags,
    )
    d = _empty_docs(spark)
    assert containment_pairs(d).count() == 0
    media = spark.createDataFrame([], "doc_id long, byte_len long, payload binary")
    plan = image_resize_plan(media)
    assert plan.count() == 0
    assert resize_stub(plan.join(media.select("doc_id", "payload"),
                                 "doc_id")).count() == 0
    ev = spark.createDataFrame([], "event_id long, ts timestamp, event_type string")
    base = daily_count_baseline(ev)
    assert base.count() == 0
    daily = spark.createDataFrame([], "event_type string, day long, n long")
    assert zscore_flags(daily, base).count() == 0
    # forward asof on empty right side: left rows kept with nulls
    left = spark.createDataFrame([(1, 10, 0)], "k long, lts long, lid long")
    right = spark.createDataFrame([], "k long, rts long, rid long")
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    right_cols=["rid"], direction="forward")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["rid"] is None


def test_round4_covariance_and_centroids_on_empty(spark):
    from sparkstreamingproject_spark.llm.features import covariance_matrix
    e = _empty_emb(spark)
    assert covariance_matrix(e).count() == 0


def test_bloom_on_empty_build_side(spark):
    from sparkstreamingproject_spark.operators.bloom import (
        bloom_prune, build_bloom)
    d = _empty_docs(spark)
    bits = build_bloom(d, "doc_id", m_bits=256, k=3)
    assert isinstance(bits, bytes) and len(bits) == 32
    assert set(bits) == {0}  # zero bitset prunes everything
    probe = spark.createDataFrame([(1,), (2,)], "doc_id long")
    assert bloom_prune(probe, "doc_id", bits, 256, 3).count() == 0
