"""Modern engine SQL surfaces (Spark 4): VARIANT semi-structured
values, collation-aware string comparison, and ANSI-safe try_
arithmetic. Each is oracle-verified like every other query — the
point is that the NEW surfaces obey the same correctness discipline
as the classic ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY 1, 2
    """,
    tags=("json", "variant"),
)
def json_variant_extract(spark, sf_dir):
    """Semi-structured extraction through VariantType (Spark 4's
    binary semi-structured encoding — `parse_json` once in the scan
    projection, typed `variant_get` paths after): the modern
    alternative to stringly `get_json_object` re-parsing per path. At
    scale the parse happens once per row regardless of how many paths
    are extracted, and the variant column prunes like any other. Same
    aggregate as the classic json_parse family so the two mechanisms
    are directly comparable."""
    ev = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k")))


@register(
    "string_collation_ci_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS et
      FROM events)
    SELECT lower(et) AS event_type, CAST(count(*) AS BIGINT) AS n
    FROM mixed GROUP BY lower(et)
    """,
    tags=("string", "collation"),
)
def string_collation_ci_group(spark, sf_dir):
    """Collation-aware grouping (Spark 4 COLLATE): a deterministically
    case-mangled key grouped under UNICODE_CI collapses case variants
    in the ENGINE's comparator — no lower() normalization column, and
    range/equality predicates on the collated column stay sargable.
    The oracle normalizes explicitly; outputs are lower()-projected so
    both engines emit identical keys. (Every member of a CI group
    lowers to the same string, so lower(min(...)) is deterministic.)"""
    ev = table(spark, sf_dir, "events")
    mixed = F.when(F.col("event_id") % 2 == 0,
                   F.upper("event_type")).otherwise(F.col("event_type"))
    return (ev.select(mixed.alias("et"))
            .groupBy(F.collate("et", "UNICODE_CI").alias("key"))
            .agg(F.count("*").alias("n"))
            .select(F.lower("key").alias("event_type"), "n"))


@register(
    "ansi_try_arithmetic",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           round(avg(CASE WHEN k = 0 THEN NULL ELSE 100.0 / k END), 4)
             AS avg_ratio
    FROM x GROUP BY event_type
    """,
    tags=("ansi", "scalar"),
)
def ansi_try_arithmetic(spark, sf_dir):
    """ANSI-mode-safe arithmetic via try_divide: under Spark 4's
    default ANSI dialect a plain 100/k THROWS on k=0 and kills the
    whole job at row one — try_divide degrades to NULL per row, which
    is what a 100 TB batch wants (quarantine, don't crash). The oracle
    expresses the identical semantics with explicit CASE guards."""
    ev = table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    ratio = F.try_divide(F.lit(100.0), F.col("k"))
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
                 .alias("n_div_null"),
                 F.round(F.avg(ratio), 4).alias("avg_ratio")))


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("sql", "modern"),
)
def sql_group_by_all(spark, sf_dir):
    """Modern SQL ergonomics surface: `SELECT * EXCEPT (...)` +
    `GROUP BY ALL` (Spark 4 SQL) — every non-aggregate select item
    becomes a grouping key without repetition, and the star-except
    prunes the payload columns BEFORE aggregation (so column pruning
    reaches the scan even in the sugar form; the oracle is the
    desugared standard GROUP BY). The engine-level capability being
    verified is that the sugar resolves to the identical aggregate."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql("""
        SELECT s.* EXCEPT (cents),
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM (SELECT o_orderstatus, o_orderpriority,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders_gba) s
        GROUP BY ALL
    """)
