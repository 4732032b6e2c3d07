"""Frequency sketches, string similarity, and advanced window frames.

Count-Min sketch completes the sketch family (KMV/HLL in
queries/sketches.py count *distinct*; CMS estimates *per-item
frequency* in sublinear space). Probe bucket positions are md5-derived
constants computed once in Python (hashlib.md5 == Spark md5 == DuckDB
md5) and embedded as literals in BOTH plans, so the whole query is
integer-exact across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from .base import register, table
from .relational import _dec

# ------------------------------------------------------ Count-Min sketch

CMS_D = 3       # hash rows
CMS_W = 1024    # counters per row
CMS_PROBES = ["join", "hash", "row", "batch", "scan", "customer",
              "column", "filter", "zzz_absent"]


def _cms_pos(j: int, word: str) -> int:
    return int(hashlib.md5(f"cms{j}:{word}".encode()).hexdigest()[:8], 16) % CMS_W


def _cms_oracle() -> str:
    rows = ", ".join(
        "('{w}', {p})".format(w=w, p=", ".join(
            str(_cms_pos(j, w)) for j in range(CMS_D)))
        for w in CMS_PROBES)
    joins, mins = [], []
    for j in range(CMS_D):
        joins.append(
            f"LEFT JOIN counters c{j} ON c{j}.j = {j} AND c{j}.pos = p.p{j}")
        mins.append(f"coalesce(c{j}.n, 0)")
    return f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    counters AS (
      SELECT j, CAST(('0x' || substr(md5('cms' || j || ':' || word), 1, 8))
                     AS BIGINT) % {CMS_W} AS pos, count(*) AS n
      FROM w CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS j)
      GROUP BY 1, 2),
    probes(word, {", ".join(f"p{j}" for j in range(CMS_D))}) AS (VALUES {rows}),
    exact AS (SELECT word, count(*) AS n FROM w GROUP BY 1)
    SELECT p.word, least({", ".join(mins)}) AS cms_est,
           coalesce(e.n, 0) AS exact_count
    FROM probes p
    {chr(10).join(joins)}
    LEFT JOIN exact e ON e.word = p.word
    """


@register("sketch_cms_frequency", oracle=_cms_oracle(), tags=("sketch", "llm"))
def sketch_cms_frequency(spark, sf_dir):
    """Count-Min sketch word frequencies (d=3 rows × w=1024 counters —
    12 KB regardless of corpus size): counter[j][h_j(word)] += 1 per
    occurrence, estimate = min_j counter[j][h_j(word)] ≥ truth (classic
    CMS overestimate; absent words show only hash-collision mass). The
    counter build is a single explode + groupBy — mergeable partial
    aggregation, the property that lets a 100 TB corpus reduce to 12 KB
    on the way INTO the shuffle rather than after it. Probes join via
    md5-literal positions; counts are integers, so estimate AND truth
    hash-match the oracle exactly."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    pos_structs = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (F.conv(F.substring(
                     F.md5(F.concat(F.lit(f"cms{j}:"), F.col("word"))), 1, 8),
                     16, 10).cast("long") % CMS_W).alias("pos"))
        for j in range(CMS_D)])
    counters = (words.select(F.explode(pos_structs).alias("s"))
                .groupBy(F.col("s.j").alias("j"), F.col("s.pos").alias("pos"))
                .agg(F.count("*").alias("n")))
    probes = spark.createDataFrame(
        [(w, *[_cms_pos(j, w) for j in range(CMS_D)]) for w in CMS_PROBES],
        ["word"] + [f"p{j}" for j in range(CMS_D)])
    out = F.broadcast(probes)
    for j in range(CMS_D):
        cj = (counters.filter(F.col("j") == j)
              .select(F.col("pos").alias(f"pos{j}"), F.col("n").alias(f"n{j}")))
        out = out.join(cj, out[f"p{j}"] == cj[f"pos{j}"], "left")
    exact = (words.groupBy("word").agg(F.count("*").alias("ne"))
             .withColumnRenamed("word", "eword"))
    est = F.least(*[F.coalesce(F.col(f"n{j}"), F.lit(0))
                    for j in range(CMS_D)])
    return (out.join(exact, out.word == exact.eword, "left")
            .select("word", est.alias("cms_est"),
                    F.coalesce("ne", F.lit(0)).alias("exact_count")))


# --------------------------------------------------- string similarity

@register(
    "string_levenshtein_pairs",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("llm", "text", "similarity"),
)
def string_levenshtein_pairs(spark, sf_dir):
    """Edit-distance near-match pairs over the distinct part-name
    vocabulary — fuzzy string matching as both engines' built-in
    levenshtein (identical Wagner–Fischer semantics). The distinct()
    first is the scale move: pair generation runs on |vocabulary|²,
    not |rows|², and vocabulary is broadcastable. For corpus-scale
    fuzzy joins, pre-block by length band or first-character before
    the quadratic step."""
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= 3))


# Blocked-pairs constants: edit distance <= LEV_K verified exactly;
# one edit rewrites at most LEV_Q trigram positions, so two strings
# within LEV_K edits share >= max(|Ga|,|Gb|) - LEV_K*LEV_Q distinct
# trigrams, and (AllPairs prefix-filter theorem, global rarity order)
# must then share a gram within each side's LEV_K*LEV_Q + 1 rarest
# grams. Complete for names >= LEV_K*LEV_Q + 3 chars (TPC-H p_name
# is 5 color words, >= 19 chars).
LEV_K = 3                      # max edit distance (same as _pairs)
LEV_Q = 3                      # trigram width
LEV_PFX = LEV_K * LEV_Q + 1    # prefix size: 10 rarest grams


@register(
    "string_levenshtein_blocked",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part
                   WHERE length(p_name) >= {LEV_Q}),
    grams AS (
      SELECT DISTINCT p_name,
             unnest(list_transform(range(1, length(p_name) - {LEV_Q - 2}),
                    i -> substr(p_name, CAST(i AS INT), {LEV_Q}))) AS g
      FROM names),
    freq AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
    pfx AS (
      SELECT p_name, g FROM (
        SELECT gr.p_name, gr.g,
               row_number() OVER (PARTITION BY gr.p_name
                                  ORDER BY f.c, gr.g) AS rk
        FROM grams gr JOIN freq f USING (g))
      WHERE rk <= {LEV_PFX}),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM pfx a JOIN pfx b
        ON a.g = b.g AND a.p_name < b.p_name
       AND abs(length(a.p_name) - length(b.p_name)) <= {LEV_K})
    SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
    FROM cand WHERE levenshtein(name_a, name_b) <= {LEV_K}
    """,
    tags=("llm", "text", "similarity", "scale"),
)
def string_levenshtein_blocked(spark, sf_dir):
    """The production shape of `string_levenshtein_pairs` — same
    result set (asserted in tests/test_scale_patterns.py), WITHOUT the
    |vocab|² pair generation (SCALE.md §known-shortcuts' named
    cluster form, VERDICT r14 §next 3).

    Blocking is lossless by construction: (1) length band ±LEV_K
    (an edit changes length by at most 1); (2) q-gram count bound —
    each of the ≤LEV_K edits rewrites at most LEV_Q trigram
    positions, so a true pair shares ≥ max(|Ga|,|Gb|) − LEV_K·LEV_Q
    distinct trigrams; (3) the AllPairs prefix filter — order every
    name's grams by GLOBAL frequency (rarest first, gram string
    tie-break) and keep only the first LEV_PFX: any pair meeting the
    count bound must collide inside these prefixes. Candidates =
    prefix-gram collisions (rare grams → small blocks), then exact
    `levenshtein` verify. Pair work scales with Σ|block|² over RARE
    grams, never |vocab|² — the same blocking+verify contract as
    `join_fuzzy_blocked` and `dedup_lsh_verified`."""
    from pyspark.sql import Window

    names = (table(spark, sf_dir, "part").select("p_name").distinct()
             .filter(F.length("p_name") >= LEV_Q))
    grams = (names.select(
        "p_name",
        F.explode(F.expr(
            f"transform(sequence(1, length(p_name) - {LEV_Q - 1}), "
            f"i -> substring(p_name, i, {LEV_Q}))")).alias("g"))
        .distinct())
    freq = grams.groupBy("g").agg(F.count("*").alias("c"))
    pfx = (grams.join(freq, "g")
           .withColumn("rk", F.row_number().over(
               Window.partitionBy("p_name").orderBy("c", "g")))
           .filter(F.col("rk") <= LEV_PFX)
           .select("p_name", "g"))
    a = pfx.select(F.col("p_name").alias("name_a"), "g")
    b = pfx.select(F.col("p_name").alias("name_b"), "g")
    cand = (a.join(b, "g")
            .filter((F.col("name_a") < F.col("name_b"))
                    & (F.abs(F.length("name_a") - F.length("name_b"))
                       <= LEV_K))
            .select("name_a", "name_b").distinct())
    return (cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= LEV_K))


# ------------------------------------------------ RANGE window frames

@register(
    "window_range_30d_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY (CAST(o_orderdate AS DATE) - DATE '1995-01-01')
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS rev_30d
    FROM orders
    """,
    tags=("window",),
)
def window_range_30d_revenue(spark, sf_dir):
    """Trailing-30-day revenue per customer — a RANGE frame (value
    window, not row window): the frame covers all orders within 30
    *days*, however many rows that is. Ordering key is integer
    days-since-epoch-date — timezone-free, so both engines bound the
    frame identically (see queries/base.py timezone discipline). One
    shuffle on o_custkey; decimal-exact sums inside the frame."""
    from pyspark.sql import Window
    o = table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    w = (Window.partitionBy("o_custkey").orderBy(days.cast("long"))
         .rangeBetween(-30, 0))
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum(_dec("o_totalprice")).over(w), 2)
        .cast("double").alias("rev_30d"))


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_first_last_nth(spark, sf_dir):
    """first/last/nth_value navigation functions per customer order
    history. last_value needs the full-partition frame (the default
    frame stops at CURRENT ROW — a classic cross-engine gotcha, pinned
    explicitly here); ordering is tie-broken by key so both engines
    pick identical rows. Raw stored doubles pass through unrounded
    (bit-identical)."""
    from pyspark.sql import Window
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey", "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"))


# --------------------------------------------- skew / reshaping / SQL depth

@register(
    "join_salted_skew",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags=("join", "scale"),
)
def join_salted_skew(spark, sf_dir):
    """Salted equi-join (operators/relational.py:salted_join): the
    left side's key is salted over 8 buckets and the right side
    replicated ×8, so a pathological hot key spreads across 8 reducers
    instead of stalling one. Semantically identical to the plain join
    the oracle runs — salting is a physical rewrite. AQE skew-split
    handles most skew automatically; explicit salting remains for the
    single-hot-key case (null/default keys) AQE cannot split."""
    from ..operators.relational import salted_join
    li = table(spark, sf_dir, "lineitem")
    o = (table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .select(F.col("o_orderkey").alias("l_orderkey")))
    joined = salted_join(li, o, "l_orderkey", salt_buckets=8)
    return (joined.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(_dec("l_extendedprice")), 2).cast("double")
                 .alias("total_price")))


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice,
                                  l_discount, l_tax))
    """,
    tags=("reshape",),
)
def unpivot_measures(spark, sf_dir):
    """UNPIVOT (wide → long): the four lineitem measures melt into
    (metric, value) rows — the inverse of agg_pivot. Spark's unpivot
    is a zero-shuffle map-side expansion (like explode); values are
    raw stored doubles, bit-identical across engines."""
    li = (table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < 100)
          .select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice", "l_discount", "l_tax"))
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "value")


@register(
    "gaps_islands_orderkeys",
    oracle="""
    WITH keys AS (SELECT DISTINCT o_orderkey FROM orders),
    grp AS (
      SELECT o_orderkey,
             o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS g
      FROM keys)
    SELECT min(o_orderkey) AS island_start, max(o_orderkey) AS island_end,
           count(*) AS island_len
    FROM grp GROUP BY g
    """,
    tags=("window", "sql"),
)
def gaps_islands_orderkeys(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive orderkeys via the
    classic key − row_number() grouping constant. The global-ordered
    row_number is the scale caveat: one ordering pass (range-partitioned
    sort), then the island grouping shuffles on the derived constant.
    Integer-only — exact everywhere."""
    from pyspark.sql import Window
    keys = table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    g = (F.col("o_orderkey")
         - F.row_number().over(Window.orderBy("o_orderkey")))
    return (keys.withColumn("g", g)
            .groupBy("g")
            .agg(F.min("o_orderkey").alias("island_start"),
                 F.max("o_orderkey").alias("island_end"),
                 F.count("*").alias("island_len"))
            .drop("g"))


@register(
    "agg_argmax_customer",
    oracle="""
    WITH m AS (SELECT c_nationkey AS nk, max(c_acctbal) AS top_acctbal
               FROM customer GROUP BY c_nationkey)
    SELECT nk AS c_nationkey, min(c_custkey) AS top_custkey, top_acctbal
    FROM customer JOIN m
      ON c_nationkey = nk AND c_acctbal = top_acctbal
    GROUP BY nk, top_acctbal
    """,
    tags=("agg", "subquery"),
)
def agg_argmax_customer(spark, sf_dir):
    """arg-max per group: the customer holding each nation's maximum
    balance. Deliberately NOT max_by/arg_max — those are
    nondeterministic under ties (a real cross-engine divergence, and
    neither engine accepts a composite tiebreak value here). Instead:
    max per group, broadcast join-back on the (raw, bit-identical)
    double, min(custkey) among holders — deterministic by
    construction. The join-back side is |groups| rows → broadcast."""
    c = table(spark, sf_dir, "customer")
    m = (c.groupBy(F.col("c_nationkey").alias("nk"))
         .agg(F.max("c_acctbal").alias("top_acctbal")))
    return (c.join(F.broadcast(m),
                   (c.c_nationkey == m.nk)
                   & (c.c_acctbal == m.top_acctbal))
            .groupBy("nk", "top_acctbal")
            .agg(F.min("c_custkey").alias("top_custkey"))
            .select(F.col("nk").alias("c_nationkey"),
                    "top_custkey", "top_acctbal"))
