"""Round-5 wave 10: Markov removal-effect attribution — the
data-driven multi-touch attribution model (each channel's value = how
much total conversion probability disappears when journeys can no
longer pass through it), completing the attribution suite next to
last-touch and linear.

Float discipline: NONE — the entire chain is integer. Transition
probabilities quantize once to parts-per-million via truncating
division; every absorption-probability iteration is an integer
weighted sum followed by one truncating division (both engines
truncate toward zero); the removal effect is an integer ratio.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_MK_ITER = 12
_CHANNELS = ["view", "click", "signup", "error"]
_SCEN = ["base"] + _CHANNELS
_GAP_US = 1_800_000_000  # 30-minute session gap


def _markov_oracle() -> str:
    scen_vals = ",".join(f"('{s}')" for s in _SCEN)
    parts = [f"""
    e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
          FROM events),
    seq AS (SELECT user_id, event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id) AS nxt
            FROM e),
    starts AS (
      SELECT user_id, event_type AS et,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS rn
      FROM e),
    tr0 AS (
      SELECT cur AS src,
             CASE WHEN nxt IS NULL THEN 'drop'
                  WHEN nxt = 'purchase' THEN 'conv' ELSE nxt END AS dst
      FROM seq WHERE cur <> 'purchase'
      UNION ALL
      SELECT 'start',
             CASE WHEN et = 'purchase' THEN 'conv' ELSE et END
      FROM starts WHERE rn = 1),
    counts AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
               FROM tr0 GROUP BY 1, 2),
    tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM counts
            GROUP BY 1),
    ptab AS (SELECT src, dst,
                    CAST((c * 1000000) // t AS BIGINT) AS p_e6
             FROM counts JOIN tot USING (src)),
    scen(s) AS (VALUES {scen_vals}),
    trs AS (
      SELECT scen.s, ptab.src,
             CASE WHEN ptab.dst = scen.s THEN 'drop'
                  ELSE ptab.dst END AS dst,
             CAST(sum(ptab.p_e6) AS BIGINT) AS p_e6
      FROM ptab CROSS JOIN scen
      WHERE ptab.src <> scen.s
      GROUP BY 1, 2, 3),
    v0 AS (SELECT s, 'conv' AS st, CAST(1000000 AS BIGINT) AS v
           FROM scen)"""]
    prev = "v0"
    for k in range(1, _MK_ITER + 1):
        parts.append(f"""
    v{k} AS (
      SELECT t.s, t.src AS st,
             CAST(sum(t.p_e6 * coalesce(pv.v, 0)) // 1000000
                  AS BIGINT) AS v
      FROM trs t LEFT JOIN {prev} pv ON pv.s = t.s AND pv.st = t.dst
      GROUP BY 1, 2
      UNION ALL
      SELECT s, 'conv', CAST(1000000 AS BIGINT) FROM scen)""")
        prev = f"v{k}"
    return ("WITH" + ",".join(parts) + f""",
    pb AS (SELECT v AS vb FROM {prev}
           WHERE s = 'base' AND st = 'start')
    SELECT s AS channel, v AS p_conv_e6,
           CAST(1000000 - (v * 1000000) // (SELECT vb FROM pb)
                AS BIGINT) AS removal_effect_e6
    FROM {prev} CROSS JOIN pb WHERE st = 'start' AND s <> 'base'""")


@register("events_attribution_markov_removal", oracle=_markov_oracle(),
          tags=("events", "analytics", "graph"))
def events_attribution_markov_removal(spark, sf_dir):
    """Markov removal-effect attribution: model user journeys as a
    first-order chain over event types with absorbing conversion
    (purchase) and dropout states; a channel's credit is how much the
    start-state absorption probability drops when every path through
    that channel is severed (its inbound transitions redirect to
    dropout, its outbound ones vanish).

    Plan shape: one scan builds the transition-count relation
    (state-cardinality rows); the 5 scenarios (base + one removal per
    channel) live as a scenario KEY in one relation, so the
    {12}-iteration absorption recursion is 12 keyed joins over a
    ~50-row DataFrame — never one run per scenario — with lineage cut
    per round. Every iteration is exact integer ppm arithmetic
    (truncating division), so no float ever crosses a variable row
    count and both engines iterate on identical values."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id",
        "event_type")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = (e.withColumn("nxt", F.lead("event_type").over(w))
           .filter(F.col("event_type") != "purchase")
           .select(F.col("event_type").alias("src"),
                   F.when(F.col("nxt").isNull(), "drop")
                   .when(F.col("nxt") == "purchase", "conv")
                   .otherwise(F.col("nxt")).alias("dst")))
    starts = (e.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select(F.lit("start").alias("src"),
                      F.when(F.col("event_type") == "purchase", "conv")
                      .otherwise(F.col("event_type")).alias("dst")))
    counts = (seq.unionAll(starts)
              .groupBy("src", "dst").agg(F.count("*").alias("c")))
    tot = counts.groupBy("src").agg(F.sum("c").alias("t"))
    ptab = (counts.join(tot, "src")
            .select("src", "dst",
                    F.expr("(c * 1000000) div t").alias("p_e6")))
    scen = F.broadcast(e.sparkSession.createDataFrame(
        [(s,) for s in _SCEN], "s string"))
    trs = (ptab.crossJoin(scen)
           .filter(F.col("src") != F.col("s"))
           .groupBy("s", "src",
                    F.when(F.col("dst") == F.col("s"), "drop")
                    .otherwise(F.col("dst")).alias("dst"))
           .agg(F.sum("p_e6").alias("p_e6"))
           .localCheckpoint())
    conv = scen.select("s", F.lit("conv").alias("st"),
                       F.lit(1000000).cast("bigint").alias("v"))
    v = conv
    for _ in range(_MK_ITER):
        pv = v.select(F.col("s").alias("pv_s"),
                      F.col("st").alias("pv_st"),
                      F.col("v").alias("pv_v"))
        v = (trs.join(pv, (F.col("s") == F.col("pv_s"))
                      & (F.col("dst") == F.col("pv_st")), "left")
             .groupBy("s", F.col("src").alias("st"))
             .agg(F.expr("CAST(sum(p_e6 * coalesce(pv_v, 0)) "
                         "div 1000000 AS BIGINT)").alias("v"))
             .unionAll(conv)
             .localCheckpoint())
    pb = (v.filter((F.col("s") == "base") & (F.col("st") == "start"))
          .select(F.col("v").alias("vb")))
    return (v.filter((F.col("st") == "start") & (F.col("s") != "base"))
            .crossJoin(F.broadcast(pb))
            .select(F.col("s").alias("channel"),
                    F.col("v").alias("p_conv_e6"),
                    F.expr("CAST(1000000 - (v * 1000000) div vb "
                           "AS BIGINT)").alias("removal_effect_e6")))


@register(
    "sessions_entry_exit_bounce",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
               FROM events),
    g AS (SELECT user_id, us, event_id, event_type,
                 CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                              ORDER BY us, event_id)
                           > 1800000000
                      OR lag(us) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM e),
    sid AS (SELECT user_id, us, event_id, event_type,
                   sum(brk) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS s
            FROM g),
    rn AS (SELECT user_id, s, event_type,
                  row_number() OVER (PARTITION BY user_id, s
                                     ORDER BY us, event_id) AS r1,
                  row_number() OVER (PARTITION BY user_id, s
                                     ORDER BY us DESC, event_id DESC)
                    AS r2
           FROM sid),
    sess AS (SELECT user_id, s, CAST(count(*) AS BIGINT) AS n_events
             FROM rn GROUP BY 1, 2),
    en AS (SELECT user_id, s, event_type AS entry FROM rn WHERE r1 = 1),
    ex AS (SELECT user_id, s, event_type AS exit FROM rn WHERE r2 = 1)
    SELECT en.entry, ex.exit, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN sess.n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces
    FROM sess JOIN en USING (user_id, s) JOIN ex USING (user_id, s)
    GROUP BY 1, 2
    """,
    tags=("events", "analytics", "window"),
)
def sessions_entry_exit_bounce(spark, sf_dir):
    """Web-analytics session triptych: entry type x exit type x
    session count x bounce count (single-event sessions) over
    30-minute gap sessions. All windows share the (user, time) sort;
    entry/exit are deterministic row_number endpoints (full tiebreak
    on event_id), so the whole query is integers and strings — the
    dashboard query behind every landing/exit-page report."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id",
        "event_type")
    wu = Window.partitionBy("user_id").orderBy("us", "event_id")
    brk = F.when(
        (F.col("us") - F.lag("us").over(wu) > _GAP_US)
        | F.lag("us").over(wu).isNull(), 1).otherwise(0)
    sid = (ev.withColumn("brk", brk)
           .withColumn("s", F.sum("brk").over(
               wu.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))))
    ws = Window.partitionBy("user_id", "s").orderBy("us", "event_id")
    wsd = (Window.partitionBy("user_id", "s")
           .orderBy(F.desc("us"), F.desc("event_id")))
    rn = sid.select("user_id", "s", "event_type",
                    F.row_number().over(ws).alias("r1"),
                    F.row_number().over(wsd).alias("r2"))
    sess = rn.groupBy("user_id", "s").agg(F.count("*").alias("n_events"))
    en = (rn.filter(F.col("r1") == 1)
          .select("user_id", "s", F.col("event_type").alias("entry")))
    ex = (rn.filter(F.col("r2") == 1)
          .select("user_id", "s", F.col("event_type").alias("exit")))
    return (sess.join(en, ["user_id", "s"]).join(ex, ["user_id", "s"])
            .groupBy("entry", "exit")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                 .alias("n_bounces")))
