"""Scale-pattern tests: stream-stream joins, salted skew joins,
bucketed co-located joins — the 100 TB toolkit, behavior-verified."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreamingproject_spark.operators.relational import salted_join
from sparkstreamingproject_spark.plans.inspect import explain_str
from sparkstreamingproject_spark.sources.streams import file_stream
from sparkstreamingproject_spark.streaming.joins import (
    stream_static_enrich, stream_stream_join, stream_stream_left_join,
)


def _clicks_views(spark):
    """Two event streams: views then clicks within minutes, same user."""
    views = [(i, 1_700_000_000_000_000 + i * 60_000_000, i % 5, "view")
             for i in range(60)]
    clicks = [(1000 + i, 1_700_000_000_000_000 + i * 60_000_000 + 120_000_000,
               i % 5, "click") for i in range(0, 60, 2)]
    mk = lambda rows: (spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, kind string")
        .select("event_id", F.timestamp_micros("ts_us").alias("ts"),
                "user_id", "kind"))
    return mk(views), mk(clicks)


@pytest.mark.slow
def test_stream_stream_join_matches_batch(spark, tmp_path):
    views, clicks = _clicks_views(spark)
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    views.coalesce(1).write.parquet(vsrc)
    clicks.coalesce(1).write.parquet(csrc)

    vstream = file_stream(spark, vsrc, views.schema).select(
        F.col("event_id").alias("view_id"), "ts", "user_id")
    cstream = file_stream(spark, csrc, clicks.schema).select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"), "user_id")
    joined = stream_stream_join(vstream, cstream, "ts", "cts",
                                key="user_id", within="5 minutes")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (joined.select("view_id", "click_id")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out).count()
    vb = views.select(F.col("event_id").alias("view_id"), "ts", "user_id")
    cb = clicks.select(F.col("event_id").alias("click_id"),
                       F.col("ts").alias("cts"), "user_id")
    expected = vb.join(cb, (vb.user_id == cb.user_id)
                       & (cb.cts >= vb.ts)
                       & (cb.cts <= vb.ts + F.expr("INTERVAL 5 MINUTES"))).count()
    assert got == expected
    assert got > 0


@pytest.mark.slow
def test_stream_stream_left_join_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs emit normally;
    unmatched left rows emit with a NULL right side only once the
    watermark proves no match can still arrive. The global watermark
    is the MIN across all watermarked inputs, so BOTH sides get a
    late flush row (plus one extra right-side batch — eviction output
    is produced in the batch after the watermark advances)."""
    T = 1_700_000_000_000_000
    H3 = 10_800_000_000  # 3 hours in µs
    mk = lambda rows: (spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long")
        .select("event_id", F.timestamp_micros("ts_us").alias("ts"),
                "user_id"))
    vsrc, csrc = str(tmp_path / "vo"), str(tmp_path / "co")
    mk([(i, T + i * 1_000_000, i) for i in range(5)]
       ).coalesce(1).write.parquet(vsrc)
    mk([(998, T + H3, 98)]).coalesce(1).write.mode("append").parquet(vsrc)
    mk([(100, T + 120_000_000, 0), (101, T + 120_000_000, 1)]
       ).coalesce(1).write.mode("append").parquet(csrc)
    mk([(999, T + H3, 99)]).coalesce(1).write.mode("append").parquet(csrc)
    mk([(997, T + H3 + 60_000_000, 99)]
       ).coalesce(1).write.mode("append").parquet(csrc)

    schema = spark.read.parquet(vsrc).schema
    vs = file_stream(spark, vsrc, schema, max_files_per_trigger=1).select(
        F.col("event_id").alias("view_id"), "ts", "user_id")
    cs = file_stream(spark, csrc, schema, max_files_per_trigger=1).select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("cts"),
        "user_id")
    joined = stream_stream_left_join(
        vs, cs, "ts", "cts", key="user_id",
        left_watermark="10 minutes", right_watermark="10 minutes",
        within="5 minutes")
    out, ck = str(tmp_path / "outo"), str(tmp_path / "cko")
    q = (joined.select("view_id", "click_id")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = sorted((r.view_id, r.click_id)
                 for r in spark.read.parquet(out).collect()
                 if r.view_id != 998)  # flush row may still be buffered
    assert got == [(0, 100), (1, 101), (2, None), (3, None), (4, None)]


@pytest.mark.slow
def test_stream_static_enrich(spark, tmp_path, sf_dir):
    views, _ = _clicks_views(spark)
    src = str(tmp_path / "v2")
    views.coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [(i, f"user-{i}") for i in range(5)], "user_id long, name string")
    stream = file_stream(spark, src, views.schema)
    out, ck = str(tmp_path / "out2"), str(tmp_path / "ck2")
    q = (stream_static_enrich(stream, dim, "user_id")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == views.count()
    assert got.filter(F.col("name").isNull()).count() == 0


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change join semantics — compare against the
    plain join on a deliberately skewed dataset."""
    skewed = spark.range(0, 20_000).select(
        (F.when(F.col("id") % 10 == 0, F.lit(1)).otherwise(F.col("id") % 100))
        .alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 100).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("w"))
    plain = skewed.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")).collect()[0]
    salted = salted_join(skewed, dim, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


@pytest.fixture()
def bucketed_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_test")
    yield "bucket_test"
    spark.sql("DROP DATABASE IF EXISTS bucket_test CASCADE")


def test_bucketed_join_avoids_shuffle(spark, sf_dir, bucketed_db):
    """Bucketing both sides on the join key pre-partitions the data on
    disk: the sort-merge join runs with NO Exchange — the co-located
    join that saves the dominant shuffle at 100 TB."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable(f"{bucketed_db}.orders_b"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable(f"{bucketed_db}.lineitem_b"))

    ob = spark.table(f"{bucketed_db}.orders_b")
    lb = spark.table(f"{bucketed_db}.lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
            "o_orderkey", "l_quantity")
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")


def test_persisted_ivf_index_prunes_cell_partitions(spark, tmp_path, sf_dir):
    """The 100 TB ANN story made concrete: persist the IVF assignment
    partitioned BY CELL, then probe with a cell filter — the scan must
    read only the probed cells' directories (partition pruning), and
    the pruned probe must score exactly the rows the in-memory
    assignment holds for those cells."""
    from pyspark.sql import functions as F
    from sparkstreamingproject_spark.llm.similarity import ivf_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned = ivf_assign(emb)
    idx = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("cell").parquet(idx)

    probe_cells = [1, 3]
    pruned = spark.read.parquet(idx).filter(F.col("cell").isin(probe_cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the cell filter is applied at the source, not
    # as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters")[1][:120], plan[:800]

    want = {r["vec_id"] for r in
            assigned.filter(F.col("cell").isin(probe_cells)).collect()}
    got = {r["vec_id"] for r in pruned.collect()}
    assert got == want and got, "pruned probe read wrong cell contents"


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew-join split is the automatic path our manual
    salted_join backstops: with adaptive execution on, a sort-merge
    join whose one shuffle partition dwarfs the median is split at
    RUNTIME into parallel sub-partitions (SortMergeJoin(skew=true)) —
    no code change, no salting. Thresholds are lowered so the test's
    ~MB-scale skew triggers the same re-plan a 100 TB hot key would."""
    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "262144")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "131072")
        # no broadcast: force the shuffled sort-merge join AQE rewrites
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        # 90% of left rows share key 7 → one shuffle partition ≫ median
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s"))
        row = joined.collect()[0]
        assert row["n"] == 300_000  # semantics unchanged by the split
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path,
                                                       sf_dir):
    """Dynamic partition pruning: a partitioned fact joined to a
    filtered dim must prune fact partitions at RUNTIME from the dim's
    build side — at 100 TB this is the difference between scanning one
    priority's files and scanning all of them. Pinned by the
    `dynamicpruning` subquery expression in the optimized plan AND by
    result equality with the pre-filtered join."""
    fact_path = str(tmp_path / "orders_part")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o.write.partitionBy("o_orderpriority").mode("overwrite") \
        .parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = (spark.createDataFrame(
        [("1-URGENT", "u"), ("5-LOW", "x")], ["prio", "tag"])
        .filter(F.col("tag") == "u"))  # selective predicate -> DPP fires
    joined = (fact.join(dim, fact.o_orderpriority == dim.prio)
              .select("o_orderkey", "tag"))
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = (fact.filter(F.col("o_orderpriority") == "1-URGENT")
                .count())
    assert joined.count() == expected


def test_pq_and_ivfadc_plans_broadcast_codebooks(spark, sf_dir):
    """The PQ/IVFADC kernels must keep their codebook/LUT joins
    broadcast (the codebook is KBs by design) and never plan a
    cartesian product — the property that lets the codes scan scale
    linearly."""
    from sparkstreamingproject_spark.queries import REGISTRY
    for name in ("embedding_pq_codebook", "sim_ann_pq_adc",
                 "sim_ann_ivfadc"):
        plan = (REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution()
                .executedPlan().toString())
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_containment_kernels_never_hint_per_document_broadcast(
        spark, sf_dir):
    """The containment kernels' final joins attach per-DOCUMENT count
    relations — an unconditional ``F.broadcast`` hint there would OOM
    the driver at 10^9 docs (VERDICT r10 §wrong 2). The analyzed plan
    must carry NO broadcast hint at all for these two queries: AQE is
    the only party allowed to choose broadcast, because it sees actual
    runtime sizes."""
    from sparkstreamingproject_spark.queries import REGISTRY
    for name in ("dedup_containment_lsh_ensemble",
                 "dedup_minhash_containment_estimate",
                 "dedup_ngram_jaccard", "dedup_containment"):
        df = REGISTRY[name].fn(spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, (
            f"{name} carries an explicit join hint:\n{analyzed[:1500]}")
        assert "CartesianProduct" not in (
            df._jdf.queryExecution().executedPlan().toString()), name


def test_runtime_bloom_filter_join_injection(spark, sf_dir):
    """Spark's runtime row-level Bloom filter (InjectRuntimeFilter):
    a selective dim side injects a bloom_filter_agg subquery whose
    might_contain() prunes fact rows BEFORE the shuffle — the built-in
    engine counterpart of operators/bloom.py's explicit kernel, and
    the standard big-join reducer at 100 TB (shuffle only rows that
    can match). Pinned by plan markers + result equality."""
    saved = {}
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "10GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .filter(F.col("o_orderpriority") == "1-URGENT"))
        j = li.join(o, li.l_orderkey == o.o_orderkey).select("l_quantity")
        opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom" in opt, opt[:1500]
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys.lower(), phys[:1500]
        n_with = j.count()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        n_without = (li.join(o, li.l_orderkey == o.o_orderkey)
                     .select("l_quantity").count())
        assert n_with == n_without
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_analyze_table_records_catalog_statistics(spark, sf_dir,
                                                  bucketed_db):
    """ANALYZE TABLE is the CBO feed at scale (join reordering and
    build-side choice read catalog stats, not file listings, on a
    Hive metastore — the in-memory test catalog always has file-size
    estimates, so what is pinnable here is the stats themselves):
    table-level rowCount must be EXACT and column-level min/max/ndv
    must land in the catalog for the optimizer to consume."""
    spark.sql(f"DROP TABLE IF EXISTS {bucketed_db}.nation_s")
    (spark.read.parquet(f"{sf_dir}/nation.parquet")
     .write.saveAsTable(f"{bucketed_db}.nation_s"))
    spark.sql(f"ANALYZE TABLE {bucketed_db}.nation_s COMPUTE STATISTICS "
              "FOR COLUMNS n_nationkey, n_name")
    n_rows = spark.table(f"{bucketed_db}.nation_s").count()
    desc = spark.sql(
        f"DESCRIBE EXTENDED {bucketed_db}.nation_s").collect()
    stats_row = [r for r in desc if r.col_name == "Statistics"]
    assert stats_row and f"{n_rows} rows" in stats_row[0].data_type
    cdesc = {r.info_name: r.info_value for r in spark.sql(
        f"DESCRIBE EXTENDED {bucketed_db}.nation_s n_nationkey").collect()}
    assert cdesc.get("distinct_count") == str(n_rows)
    assert cdesc.get("min") == "0" and cdesc.get("max") == str(n_rows - 1)


@pytest.mark.slow
def test_joined_stream_to_table_stream_equals_batch(spark, tmp_path):
    """Fold #15 (VERDICT r12 §next 6): the stream-stream join result
    maintained as a manifest-committed table across MULTIPLE
    micro-batches equals the batch join of the same data."""
    from sparkstreamingproject_spark.streaming.joins import (
        joined_stream_to_table)
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_cdc_facts)

    views, clicks = _clicks_views(spark)
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    # several files per side -> several micro-batches at 1 file/trigger
    for r in range(3):
        views.filter(F.col("event_id") % 3 == r).coalesce(1) \
            .write.mode("append").parquet(vsrc)
        clicks.filter(F.col("event_id") % 3 == r).coalesce(1) \
            .write.mode("append").parquet(csrc)

    vs = file_stream(spark, vsrc, views.schema,
                     max_files_per_trigger=1).select(
        F.col("event_id").alias("view_id"), "ts", "user_id")
    cs = file_stream(spark, csrc, clicks.schema,
                     max_files_per_trigger=1).select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"), "user_id")
    joined = stream_stream_join(vs, cs, "ts", "cts",
                                key="user_id", within="5 minutes")
    out, ck = str(tmp_path / "jout"), str(tmp_path / "jck")
    q = joined_stream_to_table(joined.select("view_id", "click_id"),
                               out, ck)
    q.awaitTermination(180)

    got = sorted((r.view_id, r.click_id) for r in read_cdc_facts(
        spark, out, "view_id long, click_id long, batch_id long")
        .select("view_id", "click_id").collect())
    vb = views.select(F.col("event_id").alias("view_id"), "ts", "user_id")
    cb = clicks.select(F.col("event_id").alias("click_id"),
                       F.col("ts").alias("cts"), "user_id")
    exp = sorted((r.view_id, r.click_id) for r in vb.join(
        cb, (vb.user_id == cb.user_id) & (cb.cts >= vb.ts)
        & (cb.cts <= vb.ts + F.expr("INTERVAL 5 MINUTES")))
        .select("view_id", "click_id").collect())
    assert got == exp and len(exp) > 0


@pytest.mark.slow
def test_joined_stream_crash_drill_manifest_last(spark, tmp_path,
                                                 monkeypatch):
    """Fold #15 crash drill: the manifest rename dies on a LATER
    micro-batch commit — readers must stay exactly on the previously
    committed output (in-window invisibility), and the restarted query
    (join state + offsets replay from the checkpoint) converges to the
    batch answer."""
    import os as _os

    from sparkstreamingproject_spark.streaming import manifest_commit
    from sparkstreamingproject_spark.streaming.joins import (
        joined_stream_to_table)
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_cdc_facts)

    views, clicks = _clicks_views(spark)
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    for r in range(3):
        views.filter(F.col("event_id") % 3 == r).coalesce(1) \
            .write.mode("append").parquet(vsrc)
        clicks.filter(F.col("event_id") % 3 == r).coalesce(1) \
            .write.mode("append").parquet(csrc)

    def _streams():
        vs = file_stream(spark, vsrc, views.schema,
                         max_files_per_trigger=1).select(
            F.col("event_id").alias("view_id"), "ts", "user_id")
        cs = file_stream(spark, csrc, clicks.schema,
                         max_files_per_trigger=1).select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"), "user_id")
        return stream_stream_join(vs, cs, "ts", "cts", key="user_id",
                                  within="5 minutes") \
            .select("view_id", "click_id")

    out, ck = str(tmp_path / "jout"), str(tmp_path / "jck")
    real_replace = _os.replace
    calls = {"n": 0}

    def crash_on_second(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected crash before join manifest rename")
        return real_replace(src, dst)

    monkeypatch.setattr(manifest_commit.os, "replace", crash_on_second)
    q = joined_stream_to_table(_streams(), out, ck)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)

    # in-window invisibility: only the FIRST committed batch is
    # visible; the crashed batch's staging dir is on disk but unnamed
    sch = "view_id long, click_id long, batch_id long"
    mid = read_cdc_facts(spark, out, sch)
    committed = manifest_commit.cdc_manifest_info(out)
    assert len(committed["facts"]) <= 1
    assert mid.select("batch_id").distinct().count() <= 1
    staged = [d for d in _os.listdir(f"{out}/facts")
              if d.startswith("commit=")]
    assert len(staged) > len(committed["facts"])

    # restart from the checkpoint: the engine replays the crashed
    # micro-batch (same join state, same offsets) and converges
    monkeypatch.setattr(manifest_commit.os, "replace", real_replace)
    joined_stream_to_table(_streams(), out, ck).awaitTermination(180)

    got = sorted((r.view_id, r.click_id) for r in read_cdc_facts(
        spark, out, sch).select("view_id", "click_id").collect())
    vb = views.select(F.col("event_id").alias("view_id"), "ts", "user_id")
    cb = clicks.select(F.col("event_id").alias("click_id"),
                       F.col("ts").alias("cts"), "user_id")
    exp = sorted((r.view_id, r.click_id) for r in vb.join(
        cb, (vb.user_id == cb.user_id) & (cb.cts >= vb.ts)
        & (cb.cts <= vb.ts + F.expr("INTERVAL 5 MINUTES")))
        .select("view_id", "click_id").collect())
    assert got == exp and len(exp) > 0


@pytest.mark.slow
def test_joined_stream_left_outer_to_table_nulls_delayed(spark, tmp_path):
    """Fold #15 × LEFT OUTER: the watermark-delayed null semantics
    survive the manifest sink — matched pairs commit in early batches,
    unmatched left rows commit with a NULL right side only in LATER
    batches (once the watermark proves no match can arrive), and the
    per-row batch_id column the sink stamps makes that ordering
    directly assertable."""
    from sparkstreamingproject_spark.streaming.joins import (
        joined_stream_to_table)
    from sparkstreamingproject_spark.streaming.manifest_commit import (
        read_cdc_facts)

    T = 1_700_000_000_000_000
    H3 = 10_800_000_000  # 3 hours in µs
    mk = lambda rows: (spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long")
        .select("event_id", F.timestamp_micros("ts_us").alias("ts"),
                "user_id"))
    vsrc, csrc = str(tmp_path / "vo"), str(tmp_path / "co")
    mk([(i, T + i * 1_000_000, i) for i in range(5)]
       ).coalesce(1).write.parquet(vsrc)
    mk([(998, T + H3, 98)]).coalesce(1).write.mode("append").parquet(vsrc)
    mk([(100, T + 120_000_000, 0), (101, T + 120_000_000, 1)]
       ).coalesce(1).write.mode("append").parquet(csrc)
    mk([(999, T + H3, 99)]).coalesce(1).write.mode("append").parquet(csrc)
    mk([(997, T + H3 + 60_000_000, 99)]
       ).coalesce(1).write.mode("append").parquet(csrc)

    schema = spark.read.parquet(vsrc).schema
    vs = file_stream(spark, vsrc, schema, max_files_per_trigger=1).select(
        F.col("event_id").alias("view_id"), "ts", "user_id")
    cs = file_stream(spark, csrc, schema, max_files_per_trigger=1).select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("cts"),
        "user_id")
    joined = stream_stream_left_join(
        vs, cs, "ts", "cts", key="user_id",
        left_watermark="10 minutes", right_watermark="10 minutes",
        within="5 minutes")
    out, ck = str(tmp_path / "louto"), str(tmp_path / "lcko")
    q = joined_stream_to_table(joined.select("view_id", "click_id"),
                               out, ck)
    q.awaitTermination(180)

    rows = read_cdc_facts(
        spark, out, "view_id long, click_id long, batch_id long").collect()
    got = sorted((r.view_id, r.click_id) for r in rows
                 if r.view_id != 998)  # flush row may still be buffered
    assert got == [(0, 100), (1, 101), (2, None), (3, None), (4, None)]
    matched_batches = {r.batch_id for r in rows
                       if r.click_id is not None and r.view_id < 5}
    null_batches = {r.batch_id for r in rows if r.click_id is None}
    # eviction output is produced only after the watermark advances —
    # strictly later micro-batches than the matches
    assert null_batches and min(null_batches) > max(matched_batches)


@pytest.mark.smoke
def test_levenshtein_blocked_equals_quadratic(spark, sf_dir):
    """VERDICT r14 §next 3 drill: the prefix-filtered blocked form must
    return EXACTLY the quadratic `string_levenshtein_pairs` result set
    (lossless blocking: length band + q-gram count bound + AllPairs
    prefix filter), while generating candidates from prefix-gram
    collisions instead of |vocab|² pairs."""
    from sparkstreamingproject_spark.queries import REGISTRY

    blocked = sorted(map(tuple, REGISTRY["string_levenshtein_blocked"]
                         .fn(spark, sf_dir).collect()))
    quad = sorted(map(tuple, REGISTRY["string_levenshtein_pairs"]
                      .fn(spark, sf_dir).collect()))
    assert blocked == quad and len(blocked) > 0
    # every surviving pair respects the verify threshold and ordering
    assert all(a < b and d <= 3 for a, b, d in blocked)
