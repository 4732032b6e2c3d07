"""Round-4 continuation, wave 16a: Friedman k-related-samples test,
nearest-in-time as-of join, and multimodal scene-cut detection over
ordered frame sequences.

Float discipline: Friedman's within-block ranks are fixed-arity CASE
expressions over 3 exact integer year-aggregates (doubled for ties);
the nearest as-of picks by exact integer |microsecond| deltas; scene
cuts count integer hash-bucket transitions. Terminal floats only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_FR_YEARS = (1993, 1994, 1995)


# ------------------------------------------------ Friedman test

def _friedman_oracle() -> str:
    ys = _FR_YEARS
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN year(o_orderdate) = {y} THEN {cents} "
        f"ELSE 0 END) AS BIGINT) AS c{y}" for y in ys)
    # doubled average rank of c{y} among the 3 year values:
    # 2*(#strictly-less) + (#equal-others) + 2
    dr = {}
    for y in ys:
        others = [o for o in ys if o != y]
        less = " + ".join(
            f"(CASE WHEN c{o} < c{y} THEN 1 ELSE 0 END)" for o in others)
        eq = " + ".join(
            f"(CASE WHEN c{o} = c{y} THEN 1 ELSE 0 END)" for o in others)
        dr[y] = f"2 * ({less}) + ({eq}) + 2"
    rsum = ",\n             ".join(
        f"CAST(sum({dr[y]}) AS BIGINT) AS rd{y}" for y in ys)
    ssum = " + ".join(f"CAST(rd{y} AS DOUBLE) * rd{y}" for y in ys)
    return f"""
    WITH p AS (
      SELECT c_nationkey AS block,
             {cols}
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE year(o_orderdate) IN {ys}
      GROUP BY 1),
    r AS (
      SELECT {rsum},
             CAST(count(*) AS BIGINT) AS n
      FROM p),
    k AS (SELECT 3 AS k)
    SELECT n, CAST(2 AS INT) AS df,
           round((3.0 / (CAST(n AS DOUBLE) * k.k * (k.k + 1)))
                 * ({ssum})
                 - 3.0 * n * (k.k + 1), 4) AS q_stat
    FROM r, k
    """


@register("stat_friedman_test", oracle=_friedman_oracle(), tags=("stat",))
def stat_friedman_test(spark, sf_dir):
    """Friedman test: does per-nation revenue differ across 1993-1995
    when each nation serves as its own block? The repeated-measures
    sibling of `stat_kruskal_wallis` (between-block level differences
    cancel — only within-block ordering matters). Each block pivots to
    3 fixed year columns (one conditional aggregate), so the doubled
    within-block ranks are fixed-arity CASE integers — no window, no
    pooled sort; Q is one terminal float over the 3 exact rank sums.
    Scale: one fact scan + a 25-row pivot, invariant to corpus size."""
    ys = _FR_YEARS
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    yr = F.year("o_orderdate")
    p = (o.filter(yr.isin(*ys))
         .join(c, o.o_custkey == c.c_custkey)
         .groupBy(F.col("c_nationkey").alias("block"))
         .agg(*[F.sum(F.when(yr == y, cents).otherwise(0))
                .cast("long").alias(f"c{y}") for y in ys]))

    def dr(y):
        others = [oy for oy in ys if oy != y]
        less = sum(F.when(F.col(f"c{o2}") < F.col(f"c{y}"), 1).otherwise(0)
                   for o2 in others)
        eq = sum(F.when(F.col(f"c{o2}") == F.col(f"c{y}"), 1).otherwise(0)
                 for o2 in others)
        return 2 * less + eq + 2

    r = p.agg(*[F.sum(dr(y)).cast("long").alias(f"rd{y}") for y in ys],
              F.count("*").cast("long").alias("n"))
    ssum = None
    for y in ys:
        term = F.col(f"rd{y}").cast("double") * F.col(f"rd{y}")
        ssum = term if ssum is None else ssum + term
    # Q = 12/(nk(k+1))·ΣR² − 3n(k+1); with doubled ranks ΣR² = ΣRd²/4,
    # so the 12 becomes 3 — the /4 is ALREADY absorbed (perfect
    # agreement must give Q = 2n; verified numerically)
    kk = 3
    q = ((3.0 / (F.col("n").cast("double") * kk * (kk + 1))) * ssum
         - 3.0 * F.col("n") * (kk + 1))
    return r.select("n", F.lit(2).cast("int").alias("df"),
                    F.round(q, 4).alias("q_stat"))


# ------------------------------------------------ nearest as-of

@register(
    "asof_nearest_purchase",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS pus
      FROM events WHERE event_type = 'purchase'),
    ranked AS (
      SELECT c.event_id, c.user_id, p.p_id,
             CAST(p.pus - c.us AS BIGINT) AS delta_us,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY abs(p.pus - c.us),
                        CASE WHEN p.pus > c.us THEN 1 ELSE 0 END,
                        CASE WHEN p.pus <= c.us THEN -p.p_id
                             ELSE p.p_id END) AS rn
      FROM c JOIN p ON p.user_id = c.user_id)
    SELECT event_id, user_id, p_id AS nearest_purchase_id, delta_us
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "temporal"),
)
def asof_nearest_purchase(spark, sf_dir):
    """Nearest-in-time as-of join (operators/temporal.py:
    asof_join_nearest): each 'click' takes the purchase closest in
    time for the same user, EITHER direction — the sensor-alignment /
    attribution variant where before and after both count (backward
    and forward as-of are its one-sided siblings). Composed from one
    backward + one forward tagged-union pass (two key shuffles, no
    click x purchase product); an exact |delta| tie prefers the
    at-or-before match, and equal-timestamp ties inherit each
    direction's id tiebreak (largest backward, smallest forward) — the
    oracle's brute-force window mirrors exactly that rule. Inner
    semantics here (clicks with no purchase drop)."""
    from ..operators.temporal import asof_join_nearest
    ev = table(spark, sf_dir, "events")
    c = (ev.filter(F.col("event_type") == "click")
         .select("event_id", "user_id", "ts"))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("p_id")))
    out = asof_join_nearest(c, p, key="user_id", left_ts="ts",
                            right_ts="p_ts", left_id="event_id",
                            right_cols=["p_ts", "p_id"], tiebreak="p_id")
    return (out.filter(F.col("p_id").isNotNull())
            .select("event_id", "user_id",
                    F.col("p_id").alias("nearest_purchase_id"),
                    (F.unix_micros("p_ts") - F.unix_micros("ts"))
                    .cast("long").alias("delta_us")))


# ------------------------------------------------ scene cuts

_SC_BYTES = 40  # frame size (llm/multimodal.py:FRAME_BYTES convention)


@register(
    "multimodal_scene_cuts",
    oracle=f"""
    WITH media AS (
      SELECT doc_id, text, length(text) AS byte_len FROM documents),
    fr AS (
      SELECT doc_id, CAST(i AS BIGINT) AS idx,
             CAST(('0x' || substr(md5(substr(text,
                     CAST(i * {_SC_BYTES} + 1 AS INT), {_SC_BYTES})),
                   1, 8)) AS BIGINT) % 2 AS sig
      FROM media,
           unnest(range(0, byte_len // {_SC_BYTES})) AS g(i)),
    lagged AS (
      SELECT doc_id, sig,
             lag(sig) OVER (PARTITION BY doc_id ORDER BY idx) AS prev
      FROM fr)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN prev IS NOT NULL AND sig <> prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           round(CAST(count(*) AS DOUBLE)
                 / (sum(CASE WHEN prev IS NOT NULL AND sig <> prev
                             THEN 1 ELSE 0 END) + 1), 4)
             AS avg_scene_frames
    FROM lagged GROUP BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_scene_cuts(spark, sf_dir):
    """Scene-cut detection over ordered frame sequences: adjacent
    frames whose (binary) content signature changes mark a cut; scenes
    are the runs between cuts — the shot-segmentation pass a video
    curation pipeline runs before frame sampling (`multimodal_frame_
    sample` picks within scenes; `multimodal_frame_dedup` dedups
    across media). Runs on the real multimodal plumbing: opaque binary
    payloads, fixed-size binary frame slices, per-media ORDERED window
    over the frame index — the plan shape of any per-video sequential
    analytics. The signature here is a 1-bit hash bucket of the frame
    bytes (a real pipeline plugs a perceptual hash into the same
    slot); counts are integers, one terminal ratio."""
    from ..llm.multimodal import attach_payload
    media = attach_payload(table(spark, sf_dir, "documents"))
    nf = (F.col("byte_len") / _SC_BYTES).cast("long")
    fr = (media.filter(nf >= 1)
          .select("doc_id", "payload",
                  F.explode(F.sequence(F.lit(0), nf - 1)).alias("idx"))
          .select("doc_id", F.col("idx").cast("long").alias("idx"),
                  (F.conv(F.substring(F.md5(F.expr(
                      f"substr(payload, idx * {_SC_BYTES} + 1, "
                      f"{_SC_BYTES})")), 1, 8), 16, 10)
                   .cast("long") % 2).alias("sig")))
    w = Window.partitionBy("doc_id").orderBy("idx")
    lagged = fr.withColumn("prev", F.lag("sig").over(w))
    cut = F.sum(F.when(F.col("prev").isNotNull()
                       & (F.col("sig") != F.col("prev")), 1).otherwise(0))
    return (lagged.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_frames"),
                 cut.cast("long").alias("n_cuts"),
                 F.round(F.count("*").cast("double") / (cut + 1), 4)
                 .alias("avg_scene_frames")))
