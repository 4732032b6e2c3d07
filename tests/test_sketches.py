"""Behavior tests for sketches, Bloom pruning, sampling, chunking, and
z-order layout — properties the DuckDB oracle hash-compare cannot
express (error bounds, false-positive rates, file-level locality)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from sparkstreamingproject_spark.operators.bloom import (
    bloom_prune, bloom_semi_join, build_bloom, optimal_params)
from sparkstreamingproject_spark.operators.zorder import (
    write_zordered, zorder_key)
from sparkstreamingproject_spark.queries import REGISTRY


def test_bloom_has_no_false_negatives_and_bounded_fp(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    build = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    n = build.count()
    m_bits, k = optimal_params(n, fpp=0.01)
    bits = build_bloom(build, "o_orderkey", m_bits, k)

    probe = o.select("o_orderkey")
    kept = bloom_prune(probe, "o_orderkey", bits, m_bits, k)
    kept_keys = {r.o_orderkey for r in kept.collect()}
    true_keys = {r.o_orderkey for r in build.collect()}
    # every true member survives the filter
    assert true_keys <= kept_keys
    # false positives bounded (allow 5x slack on the asymptotic rate)
    n_non_members = probe.count() - n
    fp = len(kept_keys - true_keys)
    assert fp <= max(10, 0.05 * n_non_members)


def test_bloom_semi_join_equals_exact_semi_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    build = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .filter(F.col("o_orderpriority") == "1-URGENT")
             .select("o_orderkey"))
    got = (bloom_semi_join(li, build, "l_orderkey", "o_orderkey")
           .groupBy().count().collect()[0][0])
    want = (li.join(build, li.l_orderkey == build.o_orderkey, "left_semi")
            .count())
    assert got == want


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    """KMV (k=256) and HLL (m=512) both carry ~1/sqrt(k|m) relative
    error; assert a loose 20% envelope at small SF."""
    for name in ("sketch_kmv_distinct", "sketch_hll_distinct"):
        row = REGISTRY[name].fn(spark, sf_dir).collect()[0]
        est = row[0]
        exact = row["n_exact"]
        assert abs(est - exact) / exact < 0.20, (name, est, exact)


def test_chunk_windows_cover_every_token_exactly(spark, sf_dir):
    """Per doc: chunks start at 0, step by the stride, the last chunk
    ends exactly at the token count, and every length is in (0, 64]."""
    df = REGISTRY["text_chunk_windows"].fn(spark, sf_dir)
    bad = df.filter((F.col("tok_len") <= 0) | (F.col("tok_len") > 64)
                    | (F.col("tok_start") != F.col("chunk_id") * 32)).count()
    assert bad == 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
    ends = (df.groupBy("doc_id")
            .agg(F.max(F.col("tok_start") + F.col("tok_len")).alias("end"),
                 F.min("tok_start").alias("first")))
    joined = ends.join(docs, "doc_id")
    assert joined.filter((F.col("end") != F.col("n"))
                         | (F.col("first") != 0)).count() == 0


def test_zorder_key_is_bijective_and_orders_locally(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 25, 3)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
    collected = out.collect()
    # bijective on the sample
    assert len({r.z for r in collected}) == len(rows)
    # interleave of small coords stays small: both coords < 2^b ⇒ z < 2^2b
    for r in collected:
        assert r.z < 4 ** max(r.x.bit_length(), r.y.bit_length(), 1)


def test_write_zordered_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Each z-ordered output file should cover a small slice of BOTH
    key ranges — the property that lets parquet min/max stats prune on
    either predicate. Compare per-file custkey span against the global
    span."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    path = str(tmp_path / "zordered")
    write_zordered(c, path, "c_custkey", "c_nationkey", n_files=8)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) >= 4
    global_span = (c.agg(F.max("c_custkey") - F.min("c_custkey"))
                   .collect()[0][0])
    spans = []
    for f in files:
        mm = (spark.read.parquet(f)
              .agg(F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi"))
              .collect()[0])
        spans.append(mm.hi - mm.lo)
    # average per-file span well below the global span ⇒ files are
    # clustered, not striped
    assert sum(spans) / len(spans) < 0.6 * global_span


@pytest.mark.parametrize("name", ["sample_hash_bernoulli",
                                  "sample_stratified_hash",
                                  "split_train_val_test"])
def test_sampling_is_deterministic_across_runs(spark, sf_dir, name):
    fn = REGISTRY[name].fn
    a = sorted(map(str, fn(spark, sf_dir).collect()))
    b = sorted(map(str, fn(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_hist_quantile_within_bin_width_of_exact(spark, sf_dir):
    """The 64-bin estimate must sit within one bin width of the exact
    discrete percentile."""
    from sparkstreamingproject_spark.queries.analytics3 import (
        N_HIST_BINS, sketch_hist_quantiles)
    import pyspark.sql.functions as F
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = li.select((F.round(F.col("l_extendedprice") * 100))
                      .cast("long").alias("v"))
    lo, hi = cents.agg(F.min("v"), F.max("v")).collect()[0]
    width = (hi - lo + 1) / N_HIST_BINS
    exact = {q: cents.agg(F.expr(f"percentile(v, {q / 100})")).collect()[0][0]
             for q in (50, 90, 99)}
    got = {r["q"]: r["est_cents"]
           for r in sketch_hist_quantiles(spark, sf_dir).collect()}
    for q in (50, 90, 99):
        assert abs(got[q] - exact[q]) <= width + 1, \
            f"q{q}: est {got[q]} vs exact {exact[q]} (width {width})"


def test_scd2_intervals_tile_per_key(spark, sf_dir):
    """SCD2 invariants: per key, exactly one open (is_current) row and
    each version's valid_to equals the next version's valid_from."""
    from sparkstreamingproject_spark.operators.temporal import scd2_history
    import pyspark.sql.functions as F
    ev = (spark.read.parquet(f"{sf_dir}/orders.parquet")
          .select(F.col("o_custkey").alias("k"),
                  F.col("o_orderdate").cast("timestamp").alias("ts"),
                  F.col("o_orderkey").alias("oid"),
                  F.col("o_totalprice").alias("p")))
    h = scd2_history(ev, "k", "ts", ["p"], tiebreak_cols=("oid",)).collect()
    from collections import defaultdict
    per_key = defaultdict(list)
    for r in h:
        per_key[r["k"]].append(r)
    assert per_key
    for k, rows in per_key.items():
        rows.sort(key=lambda r: r["valid_from_us"])
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["valid_to_us"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]


def test_bloom_fpr_sweep_monotone_and_bounded(spark, sf_dir):
    """A bigger filter can only clear bits relative to a smaller one's
    load: measured FPR must be non-increasing in m, and every count
    must sit inside [0, n_probes]."""
    from sparkstreamingproject_spark.queries import REGISTRY
    rows = sorted((r.m_bits, r.n_false_pos, r.n_probes, r.fpr)
                  for r in REGISTRY["sketch_bloom_fpr_sweep"]
                  .fn(spark, sf_dir).collect())
    assert [m for m, *_ in rows] == [4096, 16384, 65536]
    fprs = [f for *_, f in rows]
    assert fprs == sorted(fprs, reverse=True)
    for m, nfp, n_probes, fpr in rows:
        assert 0 <= nfp <= n_probes
        assert fpr == round(nfp / n_probes, 6)


def test_zonemap_pruning_zorder_bounds_both_dims(spark, sf_dir):
    """The point of the z-curve, measured: the x-sorted layout cannot
    prune a y-only predicate (touches every file), while the z-ordered
    layout bounds BOTH dimensions, and its 2-D-predicate cost is no
    worse than either of its 1-D costs."""
    from sparkstreamingproject_spark.queries import REGISTRY
    rows = {r.layout: r for r in REGISTRY["layout_zonemap_pruning"]
            .fn(spark, sf_dir).collect()}
    xs, zo = rows["xsort"], rows["zorder"]
    assert xs.touch_y == xs.n_files          # no pruning on y
    assert xs.touch_x < xs.n_files           # perfect pruning on x
    assert zo.touch_y < zo.n_files           # z-curve prunes y too
    assert zo.touch_both <= min(zo.touch_x, zo.touch_y)
    assert zo.touch_both <= xs.touch_both    # 2-D winner


def test_salting_spreads_hot_key_load(spark, sf_dir):
    """Salting a low-cardinality hot key must strictly improve the
    simulated reducer balance: more partitions used, lower load
    factor, and invariants n_parts <= P, max*P/total == load_factor."""
    from sparkstreamingproject_spark.queries import REGISTRY
    rows = {r.strategy: r for r in REGISTRY["events_salting_load_balance"]
            .fn(spark, sf_dir).collect()}
    raw, salted = rows["raw"], rows["salted8"]
    assert raw.total_rows == salted.total_rows
    assert salted.n_parts_used > raw.n_parts_used
    assert salted.load_factor < raw.load_factor
    for r in (raw, salted):
        assert r.n_parts_used <= 32
        assert r.load_factor == round(r.max_part_rows * 32
                                      / r.total_rows, 4)


def test_kll_sketch_rank_error_and_union_merge(spark, sf_dir):
    """The level-sampling quantile sketch's two contract properties
    (VERDICT r10 §next 6):
    1. RANK ERROR: every estimated quantile's true rank lies within
       3/sqrt(K) of the requested rank (3 sigma of the 2^-L thinning;
       K=256 -> 18.75%, and the fixture lands far inside it).
    2. MERGEABILITY: sketches built on disjoint shards at their OWN
       levels union + one re-thin at the combined level into a sample
       BIT-IDENTICAL to sketching the concatenated input — because
       hash-coin inclusion masks are nested (h & mask(L)=0 implies
       h & mask(L')=0 for L'<=L), the property a fixed random sample
       cannot offer."""
    from sparkstreamingproject_spark.queries.sketches2 import (
        KLL_K, kll_hash, kll_level, kll_sample)

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hv = o.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        kll_hash("o_orderkey").alias("h"))
    n = hv.count()

    # 1. rank error of each registered estimate
    rows = REGISTRY["sketch_kll_quantiles"].fn(spark, sf_dir).collect()
    assert {r.q for r in rows} == {50, 90, 99}
    tol = 3.0 / (KLL_K ** 0.5)
    for r in rows:
        cents = int(round(r.est_value * 100))
        lo = hv.filter(F.col("cents") < cents).count()
        hi = hv.filter(F.col("cents") <= cents).count()
        target = r.q / 100.0 * n
        assert lo <= target + tol * n and hi >= target - tol * n, (
            r.q, r.est_value, lo, hi, target, tol * n)
        assert r.n_rows == n

    # 2. union-merge == direct sketch, bit-identical
    shard_a = hv.filter(F.col("h") % 2 == 0)
    shard_b = hv.filter(F.col("h") % 2 == 1)
    lvl_of = lambda df: (df.agg(F.count("*").cast("long").alias("n"))
                         .select("n", kll_level("n").alias("lvl")))
    samp = lambda df: kll_sample(
        df.crossJoin(F.broadcast(lvl_of(df))))
    # each shard thinned at its own (smaller-or-equal) level
    sa = samp(shard_a).select("cents", "h")
    sb = samp(shard_b).select("cents", "h")
    combined_lvl = lvl_of(hv)
    merged = kll_sample(
        sa.unionByName(sb).crossJoin(F.broadcast(combined_lvl)))
    direct = kll_sample(hv.crossJoin(F.broadcast(combined_lvl)))
    m = sorted((r.cents, r.h) for r in merged.select("cents", "h").collect())
    d = sorted((r.cents, r.h) for r in direct.select("cents", "h").collect())
    assert m == d and len(d) > 0
    # shard levels never exceed the combined level (nested masks hold)
    la = lvl_of(shard_a).first().lvl
    lb = lvl_of(shard_b).first().lvl
    lc = combined_lvl.first().lvl
    assert max(la, lb) <= lc
