"""Approximate sketches, deterministic sampling, and layout keys.

The 100 TB rationale: exact distinct counts and uniform samples are
shuffle-heavy or nondeterministic at scale; sketches compress to KB
regardless of input size and merge associatively (partial aggregation →
tiny final merge), and hash-based sampling is reproducible across
engines, retries, and re-runs — the property a training-data pipeline
needs for stable train/val/test membership.

Every estimator here is built from **md5 arithmetic identical in Spark
and DuckDB** (see queries/base.py timezone/decimal discipline;
hex→int via Spark ``conv(x,16,10)`` == DuckDB ``CAST('0x'||x AS
BIGINT)``), so even the *approximate* results hash-match the oracle
exactly: register sums are exact BIGINTs, and the float estimate is a
single identical-order IEEE expression on both sides.  We do NOT use
Spark's ``approx_count_distinct`` / DuckDB's ``approx_distinct`` for
verified queries — their internal HLL implementations differ.

Reference parity: the reference has no sketches; this extends the
engine surface per SURVEY.md §7.5 (the Redis set-cardinality idiom
`Jedis_Pool.java:83-88` scaled past memory).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table
from .relational import _dec, money_sum

# ---------------------------------------------------------------- KMV

_KMV_K = 256
_HEX15 = 1 << 60  # value domain of a 15-hex-digit hash prefix


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                           AS BIGINT) AS h
      FROM lineitem),
    kth AS (SELECT max(h) AS kmin FROM (SELECT h FROM hv ORDER BY h LIMIT {_KMV_K})),
    ex AS (SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem)
    SELECT CAST(round(CAST({_KMV_K - 1} AS DOUBLE) * {_HEX15} / kmin, 2) AS DOUBLE)
             AS kmv_est,
           n_exact
    FROM kth, ex
    """,
    tags=("sketch", "agg"),
)
def sketch_kmv_distinct(spark, sf_dir):
    """KMV (bottom-k / k-minimum-values) distinct-count sketch over
    l_orderkey: keep the k smallest hash values; the k-th smallest
    estimates the hash density, so n̂ = (k-1)·2^60/h_(k). The top-k is
    a per-partition heap + tiny driver merge (TakeOrdered — no full
    sort); the sketch state is k longs regardless of input size.
    Exact count included for comparison; at sf0.01 the estimate lands
    within ~1/√k ≈ 6% of 14 743."""
    li = table(spark, sf_dir, "lineitem")
    hv = (li.select(
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15),
               16, 10).cast("long").alias("h"))
        .distinct())
    kth = (hv.orderBy("h").limit(_KMV_K)
           .agg(F.max("h").alias("kmin")))
    ex = li.agg(F.countDistinct("l_orderkey").alias("n_exact"))
    return (kth.join(F.broadcast(ex))
            .select(
                F.round(F.lit(float(_KMV_K - 1)) * F.lit(_HEX15) / F.col("kmin"), 2)
                .cast("double").alias("kmv_est"),
                F.col("n_exact")))


# ---------------------------------------------------------------- HLL

_HLL_M = 512  # registers; 4096 (3 hex digits) % 512 == 0 → unbiased


def _hll_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT md5(CAST(l_orderkey AS VARCHAR)) AS hx
      FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
    parts AS (
      SELECT CAST(('0x' || substr(hx, 1, 3)) AS BIGINT) % {_HLL_M} AS bucket,
             CAST(('0x' || substr(hx, 4, 8)) AS BIGINT) AS w
      FROM h),
    regs AS (
      SELECT bucket,
             max(CASE WHEN w = 0 THEN 33
                      ELSE 33 - length(bin(w)) END) AS m
      FROM parts GROUP BY bucket),
    s AS (
      SELECT sum(CAST(1 AS BIGINT) << (33 - m)) AS s_filled,
             count(*) AS v
      FROM regs),
    ex AS (SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem)
    SELECT CAST(round(
             ((0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M * _HLL_M} * 8589934592.0)
             / (s_filled + ({_HLL_M} - v) * 8589934592), 2) AS DOUBLE) AS hll_est,
           v AS buckets_used, n_exact
    FROM s, ex
    """


@register("sketch_hll_distinct", oracle=_hll_oracle(), tags=("sketch", "agg"))
def sketch_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct count built from first principles so both
    engines compute identical registers: md5 → 12-bit bucket (mod 512,
    unbiased since 4096 % 512 = 0) + 32-bit suffix w; register =
    max(position of w's leading 1-bit) per bucket. The leading-zero
    count uses length(bin(w)) — integer string ops, NOT floor(log2(w)),
    whose libm rounding can differ between engines at exact powers of
    two. The harmonic sum Σ2^-M is kept as the exact BIGINT Σ2^(33-M)
    (empty buckets contribute 2^33), so the only float math is one
    identical-order expression. Sketch state: 512 bytes; merges with
    max() — partial agg does the heavy lifting at scale.

    The standard linear-counting small-range correction is omitted (and
    would not trigger here: n̂ ≈ 15k ≫ 2.5·m = 1280) because its ln()
    is another cross-engine libm hazard; document, don't hash-break."""
    li = table(spark, sf_dir, "lineitem")
    hx = (li.select("l_orderkey").distinct()
          .select(F.md5(F.col("l_orderkey").cast("string")).alias("hx")))
    parts = hx.select(
        (F.conv(F.substring("hx", 1, 3), 16, 10).cast("long") % _HLL_M)
        .alias("bucket"),
        F.conv(F.substring("hx", 4, 8), 16, 10).cast("long").alias("w"))
    regs = (parts.groupBy("bucket")
            .agg(F.max(F.when(F.col("w") == 0, 33)
                       .otherwise(33 - F.length(F.bin("w")))).alias("m")))
    s = regs.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - m AS INT))"))
        .alias("s_filled"),
        F.count("*").alias("v"))
    ex = li.agg(F.countDistinct("l_orderkey").alias("n_exact"))
    alpha_num = (0.7213 / (1 + 1.079 / _HLL_M)) * (_HLL_M * _HLL_M)
    return (s.join(F.broadcast(ex))
            .select(
                F.round((F.lit(alpha_num) * F.lit(8589934592.0))
                        / (F.col("s_filled")
                           + (F.lit(_HLL_M) - F.col("v")) * F.lit(8589934592)),
                        2).cast("double").alias("hll_est"),
                F.col("v").alias("buckets_used"),
                F.col("n_exact")))


# ------------------------------------------------------- Bloom pruning

@register(
    "bloom_semi_join_prune",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_qty
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    tags=("join", "sketch"),
)
def bloom_semi_join_prune(spark, sf_dir):
    """Semi join with Bloom pre-pruning (operators/bloom.py): urgent
    orders' keys are compressed to a ~24 KB bitset broadcast to the
    lineitem scan, which drops non-matching rows *before* the exact
    semi join — at cluster scale that is shuffle-volume × selectivity
    instead of shuffle-volume. The trailing exact join removes Bloom
    false positives, so the result equals the plain semi join the
    oracle runs. False-positive rate and plan shape are pytest-checked
    in tests/test_sketches.py."""
    from ..operators.bloom import bloom_semi_join
    li = table(spark, sf_dir, "lineitem")
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .select("o_orderkey"))
    joined = bloom_semi_join(li, o, "l_orderkey", "o_orderkey", fpp=0.01)
    return joined.agg(F.count("*").alias("n"),
                      money_sum(_dec("l_quantity")).alias("total_qty"))


# ------------------------------------------- deterministic sampling

_BERN_THRESH = 42949672  # floor(0.01 * 2^32): ~1% of the 32-bit hash space


@register(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 8))
               AS BIGINT) < {_BERN_THRESH}
    """,
    tags=("sample",),
)
def sample_hash_bernoulli(spark, sf_dir):
    """Deterministic ~1% Bernoulli sample: keep rows whose 32-bit key
    hash falls below p·2^32. Unlike TABLESAMPLE/df.sample this is
    reproducible across engines, partitionings, and retries — the
    membership of a row depends only on its key. Pure scan + filter:
    no shuffle, trivially parallel at any scale."""
    li = table(spark, sf_dir, "lineitem")
    h = F.conv(F.substring(
        F.md5(F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))),
        1, 8), 16, 10).cast("long")
    return (li.filter(h < _BERN_THRESH)
            .select("l_orderkey", "l_linenumber", "l_quantity"))


@register(
    "sample_stratified_hash",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY md5(l_orderkey || '-' || l_linenumber),
                        l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn <= 50
    """,
    tags=("sample", "window"),
)
def sample_stratified_hash(spark, sf_dir):
    """Deterministic stratified sample: exactly 50 rows per stratum
    (l_returnflag), chosen by smallest key-hash — an order-by-hash
    row_number, i.e. a per-stratum uniform draw that every engine
    reproduces. At scale the window is one shuffle on the stratum key;
    for heavily skewed strata use the two-phase per-partition top-k
    (operators/relational.py:topk_by_score pattern) instead."""
    from pyspark.sql import Window
    li = table(spark, sf_dir, "lineitem")
    h = F.md5(F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")))
    w = (Window.partitionBy("l_returnflag")
         .orderBy(h, F.col("l_orderkey"), F.col("l_linenumber")))
    return (li.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 50)
            .select("l_returnflag", "l_orderkey", "l_linenumber"))


@register(
    "split_train_val_test",
    oracle="""
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS b
      FROM documents)
    GROUP BY 1
    """,
    tags=("sample", "llm"),
)
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by document-id hash
    — the canonical training-pipeline split: membership is a pure
    function of doc_id, so re-runs, engine swaps, and incremental
    appends never move a document across splits (no leakage). Map-only
    except the final 3-group count."""
    d = table(spark, sf_dir, "documents")
    b = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long") % 100)
    split = (F.when(b < 80, "train").when(b < 90, "val").otherwise("test"))
    return (d.groupBy(split.alias("split"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


# ------------------------------------------------------ text chunking

_CHUNK, _STRIDE = 64, 32


@register(
    "text_chunk_windows",
    oracle=f"""
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_STRIDE} AS BIGINT) AS tok_start,
           CAST(least({_CHUNK}, n - i * {_STRIDE}) AS BIGINT) AS tok_len
    FROM (
      SELECT doc_id, n,
             unnest(range(0, CASE WHEN n <= {_CHUNK} THEN 1
                                  ELSE (n - {_CHUNK + 1}) // {_STRIDE} + 2
                             END)) AS i
      FROM (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n
        FROM documents))
    """,
    tags=("llm", "text"),
)
def text_chunk_windows(spark, sf_dir):
    """Fixed-size sliding token windows (size 64, stride 32) per
    document — the LLM-context chunking primitive. Emits (doc_id,
    chunk_id, tok_start, tok_len) via explode(sequence(...)): the
    chunk *plan* is computed from the token count only, all integer
    arithmetic (no float ceil — `(n-65) div 32 + 1` — so both engines
    agree exactly); slicing the actual token arrays is a downstream
    `slice(tokens, start, len)` when needed. Map-side only: no
    shuffle, output rows ∝ Σ tokens/stride."""
    d = table(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    last = F.when(n <= _CHUNK, F.lit(0)).otherwise(
        F.expr(f"CAST((size(split(trim(text), '\\\\s+')) - {_CHUNK + 1}) "
               f"div {_STRIDE} AS INT) + 1"))
    return (d.select("doc_id", n.alias("n"), last.alias("last"))
            .select("doc_id", "n",
                    F.explode(F.sequence(F.lit(0), F.col("last"))).alias("i"))
            .select("doc_id",
                    F.col("i").cast("long").alias("chunk_id"),
                    (F.col("i") * _STRIDE).cast("long").alias("tok_start"),
                    F.least(F.lit(_CHUNK), F.col("n") - F.col("i") * _STRIDE)
                    .cast("long").alias("tok_len")))


# ------------------------------------------------------ z-order layout

@register(
    "zorder_layout_key",
    oracle=None,  # set below — generated from the same bit-interleave loop
    tags=("layout",),
)
def zorder_layout_key(spark, sf_dir):
    """Morton z-curve key over (c_custkey, c_nationkey) — the layout
    column write_zordered clusters files by, so range predicates on
    EITHER dimension prune parquet row groups. The interleave is an
    unrolled shift/or chain (operators/zorder.py) that stays in
    whole-stage codegen; the oracle SQL is emitted from the same loop,
    so keys are byte-identical. Returns the 100 smallest keys with
    their coordinates (deterministic: zkey ↔ (x, y) is a bijection)."""
    from ..operators.zorder import zorder_key
    c = table(spark, sf_dir, "customer")
    return (c.select("c_custkey", "c_nationkey",
                     zorder_key(F.col("c_custkey"), F.col("c_nationkey"))
                     .alias("zkey"))
            .orderBy("zkey", "c_custkey")
            .limit(100))


def _zorder_oracle() -> str:
    from ..operators.zorder import zorder_sql
    z = zorder_sql("c_custkey", "c_nationkey")
    return f"""
    SELECT c_custkey, c_nationkey, {z} AS zkey
    FROM customer
    ORDER BY zkey, c_custkey LIMIT 100
    """


from .base import REGISTRY as _REG  # noqa: E402
_REG["zorder_layout_key"].oracle = _zorder_oracle()


_HLL_G = 256  # per-group registers; 4096 % 256 == 0 → unbiased bucketing


def _hll_group_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT l_returnflag AS grp,
             md5(CAST(l_orderkey AS VARCHAR)) AS hx
      FROM (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem)),
    parts AS (
      SELECT grp,
             CAST(('0x' || substr(hx, 1, 3)) AS BIGINT) % {_HLL_G} AS bucket,
             CAST(('0x' || substr(hx, 4, 8)) AS BIGINT) AS w
      FROM h),
    regs AS (
      SELECT grp, bucket,
             max(CASE WHEN w = 0 THEN 33
                      ELSE 33 - length(bin(w)) END) AS m
      FROM parts GROUP BY grp, bucket),
    s AS (
      SELECT grp,
             sum(CAST(1 AS BIGINT) << (33 - m)) AS s_filled,
             count(*) AS v
      FROM regs GROUP BY grp),
    ex AS (SELECT l_returnflag AS grp,
                  count(DISTINCT l_orderkey) AS n_exact
           FROM lineitem GROUP BY l_returnflag)
    SELECT s.grp AS l_returnflag,
           CAST(round(
             ((0.7213 / (1 + 1.079 / {_HLL_G})) * {_HLL_G * _HLL_G} * 8589934592.0)
             / (s_filled + ({_HLL_G} - v) * 8589934592), 2) AS DOUBLE) AS hll_est,
           v AS buckets_used, n_exact
    FROM s JOIN ex ON s.grp = ex.grp
    """


@register("sketch_hll_per_group", oracle=_hll_group_oracle(),
          tags=("sketch", "agg"))
def sketch_hll_per_group(spark, sf_dir):
    """Per-GROUP HyperLogLog — the mergeable form that matters in
    production: registers keyed by (group, bucket), so the sketch
    state is m longs per group, merged with max() in partial
    aggregation. Same first-principles register math as
    sketch_hll_distinct (md5 buckets, bin()-length leading zeros,
    exact BIGINT register sums); per-group distinct orderkeys per
    returnflag vs the exact count."""
    li = table(spark, sf_dir, "lineitem")
    hx = (li.select("l_returnflag", "l_orderkey").distinct()
          .select(F.col("l_returnflag").alias("grp"),
                  F.md5(F.col("l_orderkey").cast("string")).alias("hx")))
    parts = hx.select(
        "grp",
        (F.conv(F.substring("hx", 1, 3), 16, 10).cast("long") % _HLL_G)
        .alias("bucket"),
        F.conv(F.substring("hx", 4, 8), 16, 10).cast("long").alias("w"))
    regs = (parts.groupBy("grp", "bucket")
            .agg(F.max(F.when(F.col("w") == 0, 33)
                       .otherwise(33 - F.length(F.bin("w")))).alias("m")))
    s = (regs.groupBy("grp")
         .agg(F.sum(F.expr(
             "shiftleft(CAST(1 AS BIGINT), CAST(33 - m AS INT))"))
             .alias("s_filled"),
             F.count("*").alias("v")))
    ex = (li.groupBy(F.col("l_returnflag").alias("grp"))
          .agg(F.countDistinct("l_orderkey").alias("n_exact")))
    alpha_num = (0.7213 / (1 + 1.079 / _HLL_G)) * (_HLL_G * _HLL_G)
    return (s.join(ex, "grp")
            .select(F.col("grp").alias("l_returnflag"),
                    F.round((F.lit(alpha_num) * F.lit(8589934592.0))
                            / (F.col("s_filled")
                               + (F.lit(_HLL_G) - F.col("v"))
                               * F.lit(8589934592)), 2)
                    .cast("double").alias("hll_est"),
                    F.col("v").alias("buckets_used"),
                    F.col("n_exact")))


@register(
    "sample_weighted_systematic",
    oracle="""
    WITH w AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS wc
      FROM lineitem),
    c AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, wc,
             CAST(sum(wc) OVER (PARTITION BY l_returnflag
                                ORDER BY l_orderkey, l_linenumber
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
      FROM w)
    SELECT l_returnflag, l_orderkey, l_linenumber
    FROM c WHERE cw // 500000 > (cw - wc) // 500000
    """,
    tags=("sample", "weighted"),
)
def sample_weighted_systematic(spark, sf_dir):
    """Weighted systematic sampling: a row is selected iff the running
    weight total crosses a step boundary — inclusion probability ∝
    weight, entirely INTEGER arithmetic (quantity cents, step 5000.00),
    so membership is engine-exact and replay-stable (no RNG, no float
    thresholds — the cross-engine-safe alternative to u^(1/w)
    A-ES sampling). Partitioned by returnflag: each stream's running
    sum is an independent window — the same bucketing discipline as
    pack_sequences; at scale buckets = parallel sampler streams."""
    from pyspark.sql import Window
    li = table(spark, sf_dir, "lineitem")
    w = li.select("l_orderkey", "l_linenumber", "l_returnflag",
                  F.round(F.col("l_quantity") * 100).cast("long").alias("wc"))
    win = (Window.partitionBy("l_returnflag")
           .orderBy("l_orderkey", "l_linenumber")
           .rowsBetween(Window.unboundedPreceding, 0))
    c = w.withColumn("cw", F.sum("wc").over(win))
    step = 500000
    sel = (F.floor(F.col("cw") / step)
           > F.floor((F.col("cw") - F.col("wc")) / step))
    return c.filter(sel).select("l_returnflag", "l_orderkey", "l_linenumber")


def _hll_time_merge_oracle() -> str:
    return f"""
    WITH h AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM (SELECT DISTINCT event_type,
                   epoch_us(ts) // 86400000000 AS d0, ts, user_id
            FROM events)),
    parts AS (
      SELECT event_type, day,
             CAST(('0x' || substr(hx, 1, 3)) AS BIGINT) % {_HLL_G} AS bucket,
             CAST(('0x' || substr(hx, 4, 8)) AS BIGINT) AS w
      FROM h),
    daily AS (
      SELECT event_type, day, bucket,
             max(CASE WHEN w = 0 THEN 33
                      ELSE 33 - length(bin(w)) END) AS m
      FROM parts GROUP BY 1, 2, 3),
    weekly AS (
      SELECT event_type, day // 7 AS week, bucket, max(m) AS m,
             count(DISTINCT day) AS days_merged
      FROM daily GROUP BY 1, 2, 3),
    s AS (
      SELECT event_type, week,
             sum(CAST(1 AS BIGINT) << (33 - m)) AS s_filled,
             count(*) AS v,
             max(days_merged) AS days_merged
      FROM weekly GROUP BY 1, 2),
    ex AS (
      SELECT event_type, epoch_us(ts) // 86400000000 // 7 AS week,
             count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1, 2)
    SELECT s.event_type, s.week,
           CAST(round(
             ((0.7213 / (1 + 1.079 / {_HLL_G})) * {_HLL_G * _HLL_G} * 8589934592.0)
             / (s_filled + ({_HLL_G} - v) * 8589934592), 2) AS DOUBLE)
             AS hll_est,
           v AS buckets_used, n_exact
    FROM s JOIN ex ON s.event_type = ex.event_type AND s.week = ex.week
    """


@register("sketch_hll_time_merge", oracle=_hll_time_merge_oracle(),
          tags=("sketch", "agg", "timeseries"))
def sketch_hll_time_merge(spark, sf_dir):
    """Sketch MERGEABILITY across time partitions — the warehouse
    pattern that makes distinct counts cheap at 100 TB: per-(type, day)
    HLL registers are the stored pre-aggregate (m longs per key); the
    weekly distinct-user count is a register max-merge of the daily
    sketches, never a rescan of raw events. Register math is the same
    first-principles construction as sketch_hll_per_group (md5 buckets,
    bin()-length leading zeros, exact BIGINT harmonic sums), so both
    engines agree bit-for-bit through BOTH aggregation levels; the
    exact weekly count rides along for error inspection."""
    ev = table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros("ts") / 86400000000).cast("long")
    hx = (ev.select("event_type", day.alias("day"), "user_id").distinct()
          .select("event_type", "day",
                  F.md5(F.col("user_id").cast("string")).alias("hx")))
    parts = hx.select(
        "event_type", "day",
        (F.conv(F.substring("hx", 1, 3), 16, 10).cast("long") % _HLL_G)
        .alias("bucket"),
        F.conv(F.substring("hx", 4, 8), 16, 10).cast("long").alias("w"))
    daily = (parts.groupBy("event_type", "day", "bucket")
             .agg(F.max(F.when(F.col("w") == 0, 33)
                        .otherwise(33 - F.length(F.bin("w")))).alias("m")))
    weekly = (daily.groupBy("event_type",
                            F.floor(F.col("day") / 7).cast("long")
                            .alias("week"), "bucket")
              .agg(F.max("m").alias("m")))
    s = (weekly.groupBy("event_type", "week")
         .agg(F.sum(F.expr(
             "shiftleft(CAST(1 AS BIGINT), CAST(33 - m AS INT))"))
             .alias("s_filled"),
             F.count("*").alias("v")))
    week = F.floor(day / 7).cast("long")
    ex = (ev.groupBy("event_type", week.alias("week"))
          .agg(F.countDistinct("user_id").alias("n_exact")))
    alpha_num = (0.7213 / (1 + 1.079 / _HLL_G)) * (_HLL_G * _HLL_G)
    return (s.join(ex, ["event_type", "week"])
            .select("event_type", "week",
                    F.round((F.lit(alpha_num) * F.lit(8589934592.0))
                            / (F.col("s_filled")
                               + (F.lit(_HLL_G) - F.col("v"))
                               * F.lit(8589934592)), 2)
                    .cast("double").alias("hll_est"),
                    F.col("v").alias("buckets_used"), "n_exact"))


# ------------------------------------------------------- count-min sketch

_CMS_W = 1024   # buckets per hash row
_CMS_D = 4      # independent hash rows

_CMS_PROBES = ("data", "key", "the", "spark", "row", "zzz_never_seen")


def _cms_probe_values_sql() -> str:
    return ", ".join(f"('{w}')" for w in _CMS_PROBES)


@register(
    "sketch_countmin_words",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    rows_ AS (SELECT unnest(range(0, {_CMS_D})) AS d),
    cnt AS (
      SELECT r.d,
             CAST(('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || w.word),
                                  1, 15)) AS BIGINT) % {_CMS_W} AS bucket,
             count(*) AS c
      FROM w, rows_ r GROUP BY 1, 2),
    probe AS (SELECT word FROM (VALUES {_cms_probe_values_sql()}) v(word)),
    pb AS (
      SELECT p.word, r.d,
             CAST(('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || p.word),
                                  1, 15)) AS BIGINT) % {_CMS_W} AS bucket
      FROM probe p, rows_ r),
    est AS (
      SELECT pb.word, min(coalesce(cnt.c, 0)) AS cms_est
      FROM pb LEFT JOIN cnt ON cnt.d = pb.d AND cnt.bucket = pb.bucket
      GROUP BY pb.word),
    tru AS (SELECT word, count(*) AS true_n FROM w GROUP BY word)
    SELECT est.word, est.cms_est,
           coalesce(tru.true_n, 0) AS true_n,
           est.cms_est - coalesce(tru.true_n, 0) AS overestimate
    FROM est LEFT JOIN tru ON tru.word = est.word
    """,
    tags=("sketch", "llm", "text"),
)
def sketch_countmin_words(spark, sf_dir):
    """Count-min sketch over corpus words, probed for a fixed word set
    — the fixed-memory frequency estimator behind heavy-hitter
    detection on unbounded streams (d=4 hash rows × w=1024 integer
    counters ≈ 16 KB regardless of vocabulary; estimates only ever
    OVERcount, so `overestimate` is provably ≥ 0 — the query exposes it
    for audit).

    Scale shape: the sketch build is one explode (4 rows/word) into a
    (d × w)-bounded partial-agg groupBy — counters merge by addition,
    so map-side combine does almost all the work and the final state is
    dimension-bounded. Probing joins the 24-row probe relation against
    the counter table. Hashes are the repo's cross-engine md5 idiom
    (sketches.py header) — bit-identical buckets in Spark and DuckDB;
    every output column is an exact integer."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))

    def bucket(word_col, d):
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(str(d)), F.lit(":"), word_col)), 1, 15),
            16, 10).cast("long") % _CMS_W)

    rows = words.select(F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 bucket(F.col("word"), d).alias("bucket"))
        for d in range(_CMS_D)])).alias("rb"))
    cnt = (rows.select("rb.d", "rb.bucket")
           .groupBy("d", "bucket").agg(F.count("*").alias("c")))
    probe = spark.createDataFrame([(w,) for w in _CMS_PROBES],
                                  "word string")
    pb = probe.select("word", F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 bucket(F.col("word"), d).alias("bucket"))
        for d in range(_CMS_D)])).alias("rb")).select("word", "rb.d",
                                                      "rb.bucket")
    est = (pb.join(F.broadcast(cnt), ["d", "bucket"], "left")
           .groupBy("word")
           .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est")))
    tru = (words.filter(F.col("word").isin(*_CMS_PROBES))
           .groupBy("word").agg(F.count("*").alias("true_n")))
    return (est.join(F.broadcast(tru), "word", "left")
            .select("word", "cms_est",
                    F.coalesce("true_n", F.lit(0)).alias("true_n"),
                    (F.col("cms_est") - F.coalesce("true_n", F.lit(0)))
                    .alias("overestimate")))
