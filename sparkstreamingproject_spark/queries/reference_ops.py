"""Queries for the reference's own operator inventory (SURVEY.md §2).

The reference's ops run over Kafka JSON streams; the driver's testdata
expresses the same shapes relationally: ``events`` (event_id, ts,
user_id, event_type, value, props-JSON) plays the behavioral-log /
CDC stream, ``customer``/``part`` play the keyed KV tables. Each query
keeps the *semantics* of the reference op (cited per query) and is
verified against DuckDB.

Kafka-transport ops (A1/A2/E4) and streaming-lifecycle ops (F1-F4) are
not oracle-expressible — they live in ``sources.kafka`` and
``streaming.*`` with pytest coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.kv import kv_get, kv_multi_get, kv_range_scan, topk_by_score
from .base import register, table

# --- A3 source_file_batch: scan with pushdown -------------------------------


@register(
    "source_file_batch",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem WHERE l_quantity > 45.0
    """,
    tags=("source", "pushdown"),
)
def source_file_batch(spark, sf_dir):
    """A3: batch parquet scan. Filter + projection reach the scan
    (PushedFilters / pruned ReadSchema) — asserted in tests/test_plans.py."""
    return (table(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") > 45.0)
            .select("l_orderkey", "l_partkey", "l_quantity"))


# --- B1 json_parse -----------------------------------------------------------


@register(
    "json_parse",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("parse",),
)
def json_parse(spark, sf_dir):
    """B1: JSON-string parsing (``OdsBaseLogApp.scala:57-64``) via
    JVM-side get_json_object, then aggregate on the extracted field."""
    return (table(spark, sf_dir, "events")
            .select("event_type",
                    F.get_json_object("props", "$.k").cast("long").alias("k"))
            .groupBy("event_type")
            .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n")))


# --- B2 project_flatten_common: projection + rename --------------------------


@register(
    "project_flatten_common",
    oracle="""
    SELECT event_id AS mid, user_id AS uid, event_type AS channel, value
    FROM events WHERE user_id % 97 = 0
    """,
    tags=("projection",),
)
def project_flatten_common(spark, sf_dir):
    """B2: the flatten-and-rename projection (ar→province_id etc.,
    ``OdsBaseLogApp.scala:102-111``) — here the same select+alias shape
    over events."""
    return (table(spark, sf_dir, "events")
            .filter(F.col("user_id") % 97 == 0)
            .select(F.col("event_id").alias("mid"),
                    F.col("user_id").alias("uid"),
                    F.col("event_type").alias("channel"),
                    "value"))


# --- B4 struct_pack_serialize -------------------------------------------------


@register(
    "struct_pack_serialize",
    oracle="""
    SELECT to_json(struct_pack(event_id := event_id, event_type := event_type)) AS value
    FROM events WHERE event_id < 100
    """,
    tags=("serialize",),
)
def struct_pack_serialize(spark, sf_dir):
    """B4: assemble struct → JSON string for the sink
    (``JSON.toJSONString``, ``OdsBaseLogApp.scala:129-131``)."""
    return (table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 100)
            .select(F.to_json(F.struct("event_id", "event_type")).alias("value")))


# --- C5 case_when_map_optype --------------------------------------------------


@register(
    "case_when_map_optype",
    oracle="""
    SELECT op, count(*) AS n FROM (
      SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 'I'
                  WHEN event_type = 'click' THEN 'U' END AS op
      FROM events)
    WHERE op IS NOT NULL GROUP BY op
    """,
    tags=("filter",),
)
def case_when_map_optype(spark, sf_dir):
    """C5: the Maxwell op mapping + drop (``OdsBaseDbApp.scala:114-121``)
    applied to event_type."""
    op = (F.when(F.col("event_type").isin("purchase", "signup"), "I")
           .when(F.col("event_type") == "click", "U"))
    return (table(spark, sf_dir, "events")
            .select(op.alias("op"))
            .filter(F.col("op").isNotNull())
            .groupBy("op").agg(F.count("*").alias("n")))


# --- C6 filter_isin_broadcast --------------------------------------------------


@register(
    "filter_isin_broadcast",
    oracle="""
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users
    FROM events WHERE event_type IN ('view', 'click', 'error')
    GROUP BY event_type
    """,
    tags=("filter",),
)
def filter_isin_broadcast(spark, sf_dir):
    """C6: set-membership routing against a (broadcastable) config list
    (``OdsBaseDbApp.scala:123,139``, lists fetched ``:89-94``)."""
    fact_tables = ["view", "click", "error"]  # the FACT:TABLES analog
    return (table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin(*fact_tables))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("users")))


# --- E1 split_5way_log (flagship) ---------------------------------------------

SPLIT_CASE_SQL = """
      CASE WHEN event_type = 'error'    THEN 'DWD_ERROR_LOG'
           WHEN event_type = 'view'     THEN 'DWD_PAGE_LOG'
           WHEN event_type = 'click'    THEN 'DWD_PAGE_ACTION'
           WHEN event_type = 'purchase' THEN 'DWD_PAGE_DISPLAY'
           ELSE 'DWD_START_LOG' END
"""


@register(
    "split_5way_log",
    oracle=f"""
    SELECT {SPLIT_CASE_SQL} AS topic,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("routing", "flagship"),
)
def split_5way_log(spark, sf_dir):
    """E1: the 5-way demultiplex (``OdsBaseLogApp.scala:85-207``) as a
    single tagged pass — routing is a column, one scan instead of five
    (the 100 TB version of the reference's per-record if/else)."""
    label = (F.when(F.col("event_type") == "error", "DWD_ERROR_LOG")
              .when(F.col("event_type") == "view", "DWD_PAGE_LOG")
              .when(F.col("event_type") == "click", "DWD_PAGE_ACTION")
              .when(F.col("event_type") == "purchase", "DWD_PAGE_DISPLAY")
              .otherwise("DWD_START_LOG"))
    return (table(spark, sf_dir, "events")
            .select(label.alias("topic"), "value")
            .groupBy("topic")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                 .cast("double").alias("total_value")))


# --- E2 route_dynamic_topic -----------------------------------------------------


@register(
    "route_dynamic_topic",
    oracle="""
    SELECT upper(event_type) || '_' ||
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'I' ELSE 'U' END AS topic,
           count(*) AS n
    FROM events WHERE event_type IN ('purchase', 'signup', 'click')
    GROUP BY 1
    """,
    tags=("routing",),
)
def route_dynamic_topic(spark, sf_dir):
    """E2: data-dependent sink address ``upper(table) || '_' || op``
    (``OdsBaseDbApp.scala:123-129``) — the Kafka sink takes this as a
    ``topic`` column; here we verify the address computation."""
    op = F.when(F.col("event_type").isin("purchase", "signup"), "I").otherwise("U")
    return (table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("purchase", "signup", "click"))
            .select(F.concat(F.upper("event_type"), F.lit("_"), op).alias("topic"))
            .groupBy("topic").agg(F.count("*").alias("n")))


# --- E3 dim_upsert_kv: last-write-wins ------------------------------------------


@register(
    "dim_upsert_kv",
    oracle="""
    SELECT user_id, event_type AS last_event_type, value AS last_value
    FROM (SELECT user_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    tags=("upsert",),
)
def dim_upsert_kv(spark, sf_dir):
    """E3: last-write-wins dim upsert (``OdsBaseDbApp.scala:160-164``).
    The reference relies on Kafka per-key ordering; here the win is
    explicit — row_number over (ts DESC, event_id DESC) is deterministic
    under any parallelism. At scale this is the CDC-compaction pattern:
    one shuffle by key, no global sort.
    """
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (table(spark, sf_dir, "events")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id",
                    F.col("event_type").alias("last_event_type"),
                    F.col("value").alias("last_value")))


# --- G1/G3/G7 keyed-table access -------------------------------------------------


@register(
    "kv_get",
    oracle="SELECT * FROM customer WHERE c_custkey = 77",
    tags=("kv", "pushdown"),
)
def kv_get_q(spark, sf_dir):
    """G1 point lookup (``HbaseDML.java:98-113``): equality predicate
    pushed to the parquet scan (row-group pruning at scale)."""
    return kv_get(table(spark, sf_dir, "customer"), "c_custkey", 77)


@register(
    "kv_range_scan",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part WHERE p_partkey >= 50 AND p_partkey < 100
    """,
    tags=("kv", "pushdown"),
)
def kv_range_scan_q(spark, sf_dir):
    """G3 range scan ``[start, stop)`` (``HbaseDML.java:127-149``)."""
    return (kv_range_scan(table(spark, sf_dir, "part"), "p_partkey", 50, 100)
            .select("p_partkey", "p_name", "p_brand", "p_retailprice"))


@register(
    "kv_multi_get_set",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_custkey IN (1, 7, 42, 99, 123)
    """,
    tags=("kv",),
)
def kv_multi_get_q(spark, sf_dir):
    """G7 batched mget (``Jedis_Pool.java:62-68``) — IN-list predicate."""
    return (kv_multi_get(table(spark, sf_dir, "customer"), "c_custkey",
                         [1, 7, 42, 99, 123])
            .select("c_custkey", "c_name", "c_acctbal"))


# --- G8/G9 list & set structure ops ----------------------------------------------


@register(
    "kv_list_set_ops",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types,
           len(list_distinct(list(event_type))) AS n_types,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
    tags=("kv",),
)
def kv_list_set_ops(spark, sf_dir):
    """G8/G9: Redis list/set ops (``Jedis_Pool.java:72-88``) as array
    columns: collect_set + array_sort + size, serialized to a string for
    stable cross-engine comparison."""
    return (table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("event_types"),
                 F.size(F.collect_set("event_type")).cast("long").alias("n_types"),
                 F.count("*").alias("n_events")))


# --- G10 zset top-k ----------------------------------------------------------------


@register(
    "kv_zset_ops",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rank FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rank
      FROM customer)
    WHERE rank <= 5
    """,
    tags=("kv", "window"),
)
def kv_zset_ops(spark, sf_dir):
    """G10 scored sorted-set (``Jedis_Pool.java:93-98``) as per-group
    top-k: window rank, partial sort per group — never a global sort."""
    df = topk_by_score(table(spark, sf_dir, "customer"),
                       ["c_mktsegment"], "c_acctbal", 5, ["c_custkey"])
    return df.select("c_mktsegment", "c_custkey", "c_acctbal",
                     F.col("rank").cast("long").alias("rank"))


# --- H1-H5 scalar functions ----------------------------------------------------------


@register(
    "scalar_functions",
    oracle="""
    SELECT n_nationkey,
           upper(n_name) AS uname,
           'NATION_' || n_name AS topic,
           CAST(n_nationkey AS VARCHAR) AS key_str,
           CAST(n_regionkey AS BIGINT) AS region_long,
           coalesce(NULL, n_name, 'missing') AS coalesced
    FROM nation
    """,
    tags=("scalar",),
)
def scalar_functions(spark, sf_dir):
    """H1-H5: upper / concat / cast / coalesce
    (``OdsBaseDbApp.scala:127,162``, ``MyOffsetUtils.scala:54,76-77``)."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.upper("n_name").alias("uname"),
        F.concat(F.lit("NATION_"), F.col("n_name")).alias("topic"),
        F.col("n_nationkey").cast("string").alias("key_str"),
        F.col("n_regionkey").cast("long").alias("region_long"),
        F.coalesce(F.lit(None), F.col("n_name"), F.lit("missing")).alias("coalesced"),
    )


# --- G2/E3 kv_put: merge-style upsert --------------------------------------------


@register(
    "kv_put_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, round(c_acctbal + 1000.0, 2) AS c_acctbal, 2 AS version
      FROM customer WHERE c_custkey <= 10),
    base AS (
      SELECT c_custkey, c_name, c_acctbal, 1 AS version FROM customer),
    merged AS (
      SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY version DESC) AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM updates))
    SELECT c_custkey, c_name, c_acctbal, version
    FROM merged WHERE rn = 1
    """,
    tags=("kv", "upsert"),
)
def kv_put_upsert(spark, sf_dir):
    """G2 single-cell put (``HbaseDML.java:116-124``) generalized to a
    MERGE-shaped upsert: union(base, updates) → keep highest version
    per key (the ``operators.kv.kv_upsert`` primitive). One shuffle on
    the key; at scale this is the CDC-compaction/MERGE INTO pattern."""
    from ..operators.kv import kv_upsert
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    base = c.withColumn("version", F.lit(1))
    updates = (c.filter(F.col("c_custkey") <= 10)
               .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 1000.0, 2))
               .withColumn("version", F.lit(2)))
    return kv_upsert(base, updates, ["c_custkey"], "version")


# --- G4 kv_delete -----------------------------------------------------------------


@register(
    "kv_delete",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey != 3
    """,
    tags=("kv",),
)
def kv_delete_q(spark, sf_dir):
    """G4 delete-by-key (``HbaseDML.java:152-162``) — anti-predicate;
    on a DML table format this is DELETE WHERE."""
    from ..operators.kv import kv_delete
    return (kv_delete(table(spark, sf_dir, "supplier"), "s_suppkey", 3)
            .select("s_suppkey", "s_name"))


@register(
    "json_parse_corrupt_routing",
    oracle="""
    WITH raw AS (
      SELECT event_id, event_type,
             CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 10 = 0
                  THEN substr(props, 1, greatest(length(props) - 2, 1))
                  ELSE props END AS payload
      FROM events)
    SELECT event_type,
           CAST(sum(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ok,
           CAST(sum(CASE WHEN json_valid(payload)
                         THEN CAST(json_extract_string(payload, '$.k')
                                   AS BIGINT) END) AS BIGINT) AS sum_k
    FROM raw GROUP BY event_type
    """,
    tags=("parse", "error-handling"),
)
def json_parse_corrupt_routing(spark, sf_dir):
    """B1's failure path: the reference wraps JSON.parseObject in
    try/catch and routes unparseable records aside
    (``OdsBaseLogApp.scala:57-64``). Declaratively: ``from_json``
    yields NULL for malformed input (PERMISSIVE), so corrupt-vs-ok is
    a null test — no exceptions, no Python, and the corrupt branch
    keeps flowing to its own sink. Malformed records are synthesized
    deterministically (1-in-10 by id hash, truncated payload) so both
    engines see identical inputs."""
    ev = table(spark, sf_dir, "events")
    bucket = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                 1, 8), 16, 10).cast("long") % 10)
    payload = F.when(
        bucket == 0,
        F.substring(F.col("props"), 1,
                    F.greatest(F.length("props") - 2, F.lit(1)))
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json yields an all-null-fields struct (not a
    # NULL struct) for malformed input; the explicit corrupt-record
    # column is the reliable malformed marker
    parsed = F.from_json(
        payload, "k INT, source STRING, _corrupt_record STRING",
        {"mode": "PERMISSIVE",
         "columnNameOfCorruptRecord": "_corrupt_record"})
    raw = ev.select("event_type", payload.alias("payload"),
                    parsed.alias("p"))
    ok = F.col("p._corrupt_record").isNull()
    return (raw.groupBy("event_type")
            .agg(F.sum(F.when(ok, 0).otherwise(1)).cast("long")
                 .alias("n_corrupt"),
                 F.sum(F.when(ok, 1).otherwise(0)).cast("long")
                 .alias("n_ok"),
                 F.sum(F.when(ok, F.col("p.k").cast("long")))
                 .alias("sum_k")))


_TTL_DAYS = 10


@register(
    "kv_ttl_expiry_sweep",
    oracle=f"""
    WITH w AS (SELECT event_type, user_id, ts FROM events
               WHERE user_id IS NOT NULL),
    nowt AS (SELECT max(ts) AS now FROM w),
    last AS (SELECT event_type, user_id, max(ts) AS last_write
             FROM w GROUP BY 1, 2),
    flagged AS (
      SELECT event_type,
             CASE WHEN epoch_us(last_write)
                       + {_TTL_DAYS * 86400 * 1_000_000}
                       > epoch_us(now)
                  THEN 1 ELSE 0 END AS live
      FROM last CROSS JOIN nowt)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(live) AS BIGINT) AS n_live,
           CAST(count(*) - sum(live) AS BIGINT) AS n_expired,
           CAST(sum(live) * 10000 // count(*) AS BIGINT) AS live_bp
    FROM flagged GROUP BY 1
    """,
    tags=("kv", "reference"),
)
def kv_ttl_expiry_sweep(spark, sf_dir):
    """G11 Redis EXPIRE/TTL eviction report
    (operators/kv.py:kv_expire_sweep; the reference's Jedis cache
    idiom `Jedis_Pool.java:62-98` paired with SETEX TTLs): each
    (event_type, user_id) key's TTL is reset by every write, so
    liveness is the LATEST write vs the sweep clock — an expired key
    is gone even if older writes are recent enough. Clock = max event
    time (deterministic sweep); TTL = {_TTL_DAYS} days against the
    30-day fixture span, so both populations are non-empty at every
    SF. Per-key argmax is a map-side-combinable aggregate; the clock
    is a broadcast scalar; comparisons are unix-micros integers
    (timezone-safe)."""
    from ..operators.kv import kv_expire_sweep
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select("event_type", "user_id", "ts"))
    now_df = ev.agg(F.max("ts").alias("now"))
    swept = kv_expire_sweep(ev, ["event_type", "user_id"], "ts",
                            _TTL_DAYS * 86400, now_df)
    return (swept.groupBy("event_type")
            .agg(F.count("*").alias("n_keys"),
                 F.sum(F.col("live").cast("long")).alias("n_live"))
            .select("event_type", "n_keys", "n_live",
                    (F.col("n_keys") - F.col("n_live"))
                    .alias("n_expired"),
                    F.expr("CAST(n_live * 10000 div n_keys AS BIGINT)")
                    .alias("live_bp")))
