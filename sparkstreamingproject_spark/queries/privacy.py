"""Round-4 continuation, wave 9 (round-5 driver-window candidates):
privacy engineering — keyed pseudonymization that preserves
referential integrity, and a k-anonymity audit over quasi-identifiers.
Both all-integer/string (no float discipline needed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import register, table

_SALT = "corpus-v1"  # rotation key; a real deployment pulls this from KMS


@register(
    "pii_pseudonymize_fk",
    oracle=f"""
    WITH c AS (
      SELECT substr(md5('{_SALT}' || CAST(c_custkey AS VARCHAR)), 1, 16)
               AS pseud, c_nationkey
      FROM customer),
    o AS (
      SELECT substr(md5('{_SALT}' || CAST(o_custkey AS VARCHAR)), 1, 16)
               AS pseud,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders)
    SELECT c.c_nationkey AS nationkey,
           count(DISTINCT c.pseud) AS n_pseudonyms,
           count(o.pseud) AS n_orders,
           round(CAST(sum(o.cents) AS BIGINT) / 100.0, 2) AS revenue
    FROM c LEFT JOIN o ON c.pseud = o.pseud
    GROUP BY 1
    """,
    tags=("privacy", "join"),
)
def pii_pseudonymize_fk(spark, sf_dir):
    """Keyed pseudonymization with referential integrity: customer
    keys are replaced by salted-hash pseudonyms in BOTH the customer
    dimension and the orders fact, and the analysis (revenue by
    nation) still joins correctly through the pseudonym — the
    privacy-engineering property that lets an anonymized extract stay
    analytically useful (`pii_scrub_redact` handles free text; this
    handles keys).

    The pseudonym is a deterministic keyed hash (salt ∥ key → md5,
    truncated to 64 bits) computed map-side in both relations, so the
    join shuffles pseudonyms exactly as it would the raw keys — same
    plan shape, same scale. Salt rotation = new extract generation.
    Counts integer; revenue exact cents."""
    pseud = lambda col: F.substring(
        F.md5(F.concat(F.lit(_SALT), F.col(col).cast("string"))), 1, 16)
    c = (table(spark, sf_dir, "customer")
         .select(pseud("c_custkey").alias("pseud"), "c_nationkey"))
    o = (table(spark, sf_dir, "orders")
         .select(pseud("o_custkey").alias("pseud"),
                 F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                 .alias("cents")))
    return (c.join(o, "pseud", "left")
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.countDistinct("pseud").alias("n_pseudonyms"),
                 F.count("cents").alias("n_orders"),
                 F.round(F.sum("cents") / 100.0, 2).alias("revenue")))


@register(
    "privacy_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS order_year,
             o.o_orderpriority AS priority,
             o.o_custkey
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey),
    g AS (
      SELECT nation, order_year, priority,
             count(DISTINCT o_custkey) AS k
      FROM q GROUP BY 1, 2, 3)
    SELECT CAST(CASE WHEN k < 5 THEN '<5'
                     WHEN k < 20 THEN '5-19'
                     ELSE '>=20' END AS VARCHAR) AS k_band,
           count(*) AS n_groups,
           CAST(sum(k) AS BIGINT) AS n_individuals,
           CAST(min(k) AS BIGINT) AS min_k
    FROM g GROUP BY 1
    """,
    tags=("privacy", "agg"),
)
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit: how many quasi-identifier groups (nation ×
    order year × priority) contain fewer than k distinct individuals
    — the re-identification risk report a privacy review runs before
    any extract ships. Groups with k < 5 are the ones requiring
    suppression or generalization.

    One fact-dim join (dims broadcast), one distinct-count aggregate
    over the quasi-identifier key, then a 3-row banding — the audit
    costs one scan regardless of table size. All integers."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    q = (o.join(c, o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .select(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("order_year"),
                 F.col("o_orderpriority").alias("priority"),
                 "o_custkey"))
    g = (q.groupBy("nation", "order_year", "priority")
         .agg(F.countDistinct("o_custkey").alias("k")))
    band = (F.when(F.col("k") < 5, "<5")
            .when(F.col("k") < 20, "5-19").otherwise(">=20"))
    return (g.groupBy(band.alias("k_band"))
            .agg(F.count("*").alias("n_groups"),
                 F.sum("k").cast("long").alias("n_individuals"),
                 F.min("k").cast("long").alias("min_k")))


@register(
    "privacy_dp_histogram",
    oracle="""
    WITH h AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY 1, 2),
    u AS (SELECT source, lang, n,
                 (CAST(('0x' || substr(md5('dp-' || source || '-' || lang),
                                       1, 8)) AS BIGINT) + 0.5)
                   / 4294967296.0 AS uu
          FROM h)
    SELECT source, lang, n,
           round(n - sign(uu - 0.5) * ln(1 - 2 * abs(uu - 0.5)), 4)
             AS noisy_n
    FROM u
    """,
    tags=("privacy",),
)
def privacy_dp_histogram(spark, sf_dir, seed: str = "dp-"):
    """Laplace-noised histogram (eps=1, sensitivity 1 for a
    per-document count): every (source, lang) cell gets Laplace(1)
    noise via inverse-CDF sampling of a uniform derived from
    md5(seed || cell key), so the release is reproducible across
    engines, partitionings, and retries.

    PRIVACY CAVEAT (do not skip): the noise is a deterministic
    function of (seed, cell key). The mechanism is only a real DP
    release when ``seed`` is a SECRET, per-release value that is
    never published or derivable from the released columns — with a
    known seed anyone can recompute the noise and subtract it to
    recover exact counts. The default ``seed="dp-"`` here is public
    by construction (the DuckDB oracle must reproduce it), so THIS
    REGISTRY ENTRY IS AN ENGINE-PARITY FIXTURE demonstrating the
    seeded-reproducibility plumbing, NOT a private release.
    Production use: pass a fresh secret seed per release and destroy
    it after publishing.

    Scale: noise is a per-cell scalar expression fused onto a
    cell-cardinality aggregate — nothing beyond the base groupBy
    touches data."""
    docs = table(spark, sf_dir, "documents")
    h = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    uu = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(seed), F.col("source"), F.lit("-"),
                       F.col("lang"))), 1, 8), 16, 10).cast("long")
        + F.lit(0.5)) / F.lit(4294967296.0))
    noise = (F.signum(uu - 0.5)
             * F.log(F.lit(1.0) - 2 * F.abs(uu - F.lit(0.5))))
    return h.select("source", "lang", "n",
                    F.round(F.col("n") - noise, 4).alias("noisy_n"))
