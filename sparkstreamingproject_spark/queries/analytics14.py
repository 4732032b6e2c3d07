"""Round-4 continuation, wave 15a: Levene's variance-homogeneity test
(median-centered — Brown-Forsythe form), Mann-Kendall trend test,
two-sample Poisson rate test, and the Markov stationary distribution
by integer-requantized power iteration.

Float discipline: Levene reuses the ANOVA fixed-arity SSB pivot over
half-cent integer deviations; Mann-Kendall's S and variance are exact
integers over the bounded daily series; the Markov iteration re-scales
the distribution to integer ppm every step (the HITS recipe) so no
float crosses a variable row count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import register, table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_US_DAY = 86_400_000_000


# ------------------------------------------------ Brown-Forsythe / Levene

def _levene_oracle() -> str:
    cells = []
    for i, p in enumerate(_PRIORITIES, 1):
        cells.append(
            f"CAST(sum(CASE WHEN grp = {i} THEN 1 ELSE 0 END) AS BIGINT) AS n{i},\n"
            f"             CAST(sum(CASE WHEN grp = {i} THEN z2 ELSE 0 END) AS BIGINT) AS s{i}")
    grp_case = "CASE " + " ".join(
        f"WHEN o_orderpriority = '{p}' THEN {i}"
        for i, p in enumerate(_PRIORITIES, 1)) + " END"
    ssb = " + ".join(
        f"CAST(s{i} AS DOUBLE) * s{i} / n{i}" for i in range(1, 6))
    return f"""
    WITH c AS (
      SELECT {grp_case} AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    med AS (
      SELECT grp, quantile_cont(cents, 0.5) * 2 AS med2
      FROM c GROUP BY grp),
    z AS (
      SELECT c.grp,
             CAST(round(abs(2 * c.cents - m.med2)) AS BIGINT) AS z2
      FROM c JOIN med m ON c.grp = m.grp),
    a AS (
      SELECT {cells[0]},
             {cells[1]},
             {cells[2]},
             {cells[3]},
             {cells[4]},
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z2) AS BIGINT) AS s,
             sum(CAST(z2 AS DECIMAL(38,0)) * z2) AS q
      FROM z)
    SELECT n, CAST(4 AS INT) AS df_between,
           CAST(n - 5 AS BIGINT) AS df_within,
           round((CAST(n AS DOUBLE) - 5) / 4.0
                 * (({ssb}) - CAST(s AS DOUBLE) * s / n)
                 / (CAST(q AS DOUBLE) - ({ssb})), 4) AS w_stat
    FROM a
    """


@register("stat_levene_test", oracle=_levene_oracle(), tags=("stat",))
def stat_levene_test(spark, sf_dir):
    """Brown-Forsythe/Levene test: do the 5 order priorities have equal
    totalprice VARIANCE? The homogeneity check that decides whether
    `stat_anova_oneway`'s equal-variance assumption holds (the
    median-centered Brown-Forsythe form — robust, and median-centering
    keeps the algebra exact). Deviations |x - group median| live in
    half-cent INTEGERS (2x scaling absorbs the interpolated median's
    .5); W is then the ANOVA fixed-arity pivot over exact (n_i, S_i)
    plus one DECIMAL(38,0) Σz². Scale: one corpus scan for medians
    (per-group order statistic), one for the pivot — the group medians
    broadcast back."""
    grp = F.when(F.col("o_orderpriority") == _PRIORITIES[0], 1)
    for i, p in enumerate(_PRIORITIES[1:], 2):
        grp = grp.when(F.col("o_orderpriority") == p, i)
    c = (table(spark, sf_dir, "orders")
         .select(grp.alias("grp"),
                 F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                 .alias("cents")))
    med = (c.groupBy("grp")
           .agg((F.expr("percentile(cents, 0.5)") * 2).alias("med2")))
    z = (c.join(F.broadcast(med), "grp")
         .select("grp",
                 F.round(F.abs(2 * F.col("cents") - F.col("med2")))
                 .cast("long").alias("z2")))
    aggs = []
    for i in range(1, 6):
        aggs.append(F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
                    .cast("long").alias(f"n{i}"))
        aggs.append(F.sum(F.when(F.col("grp") == i, F.col("z2")).otherwise(0))
                    .cast("long").alias(f"s{i}"))
    aggs.extend([
        F.count("*").cast("long").alias("n"),
        F.sum("z2").cast("long").alias("s"),
        F.sum(F.col("z2").cast("decimal(38,0)") * F.col("z2")).alias("q"),
    ])
    a = z.agg(*aggs)
    ssb = None
    for i in range(1, 6):
        term = (F.col(f"s{i}").cast("double") * F.col(f"s{i}")
                / F.col(f"n{i}"))
        ssb = term if ssb is None else ssb + term
    nd = F.col("n").cast("double")
    w = ((nd - 5) / 4.0
         * (ssb - F.col("s").cast("double") * F.col("s") / F.col("n"))
         / (F.col("q").cast("double") - ssb))
    return a.select("n", F.lit(4).cast("int").alias("df_between"),
                    (F.col("n") - 5).cast("long").alias("df_within"),
                    F.round(w, 4).alias("w_stat"))


# ------------------------------------------------ Mann-Kendall trend

@register(
    "stat_mann_kendall_trend",
    oracle=f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_US_DAY} AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    s AS (
      SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM d a JOIN d b ON a.day < b.day),
    t AS (SELECT CAST(count(*) AS BIGINT) AS t_n FROM d),
    ties AS (
      SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
               AS tsum
      FROM (SELECT count(*) AS c FROM d GROUP BY cents) WHERE c > 1)
    SELECT t.t_n, s.s_stat,
           round((s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
                                  WHEN s.s_stat < 0 THEN -1
                                  ELSE 0 END)
                 / sqrt((CAST(t.t_n AS DOUBLE) * (t.t_n - 1)
                         * (2 * t.t_n + 5) - ties.tsum) / 18), 4) AS z
    FROM s, t, ties
    """,
    tags=("timeseries", "stat"),
)
def stat_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall monotonic-trend test on the daily revenue series —
    the rank-based significance companion to `stat_theil_sen_trend`
    (Theil-Sen gives the slope, MK says whether a trend exists at
    all). S sums pair signs over the day-grain aggregate (T(T-1)/2
    pairs, bounded by calendar span — 435 here — at any corpus size);
    the tie-corrected variance is exact integer; the
    continuity-corrected z is the one terminal float."""
    e = table(spark, sf_dir, "events")
    d = (e.groupBy((F.unix_micros("ts") / _US_DAY).cast("long").alias("day"))
         .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
              .cast("long").alias("cents")))
    a = d.select(F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = d.select(F.col("day").alias("db"), F.col("cents").alias("cb"))
    s = (a.join(F.broadcast(b), F.col("da") < F.col("db"))
         .agg(F.sum(F.when(F.col("cb") > F.col("ca"), 1)
                    .when(F.col("cb") < F.col("ca"), -1).otherwise(0))
              .cast("long").alias("s_stat"),
              F.count("*").cast("long").alias("n_pairs")))
    t = d.agg(F.count("*").cast("long").alias("t_n"))
    ties = (d.groupBy("cents").agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)),
                F.lit(0)).cast("long").alias("tsum")))
    j = s.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(ties))
    cc = (F.when(F.col("s_stat") > 0, 1)
          .when(F.col("s_stat") < 0, -1).otherwise(0))
    z = ((F.col("s_stat") - cc)
         / F.sqrt((F.col("t_n").cast("double") * (F.col("t_n") - 1)
                   * (2 * F.col("t_n") + 5) - F.col("tsum")) / 18))
    return j.select("t_n", "s_stat", F.round(z, 4).alias("z"))


# ------------------------------------------------ Poisson rate test

@register(
    "stat_poisson_rate_test",
    oracle=f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_US_DAY}
               - (SELECT min(epoch_us(ts) // {_US_DAY}) FROM events
                  WHERE event_type = 'purchase')
               AS rel_day
      FROM events WHERE event_type = 'purchase'),
    a AS (
      SELECT CAST(sum(CASE WHEN rel_day < 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN rel_day >= 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM d)
    SELECT n1, n2,
           round((CAST(n1 AS DOUBLE) - n2) / sqrt(CAST(n1 AS DOUBLE) + n2),
                 4) AS z
    FROM a
    """,
    tags=("stat", "timeseries"),
)
def stat_poisson_rate_test(spark, sf_dir):
    """Two-sample Poisson rate test: did the purchase rate change
    between the first and second 15-day half of the window (halves
    measured from the first PURCHASE day — the same baseline in both
    engines)? Under
    H0 (equal rates, equal exposure) n1 | n1+n2 ~ Binomial(n, 1/2), so
    z = (n1-n2)/sqrt(n1+n2) — the one-line count-data A/B test (the
    count-process sibling of `stat_ab_proportion_ztest`). Two integer
    counts from one scan; one terminal float."""
    e = table(spark, sf_dir, "events")
    day = (F.unix_micros("ts") / _US_DAY).cast("long")
    p = e.filter(F.col("event_type") == "purchase").select(day.alias("day"))
    m = p.agg(F.min("day").alias("d0"))
    a = (p.crossJoin(F.broadcast(m))
         .agg(F.sum(F.when(F.col("day") - F.col("d0") < 15, 1).otherwise(0))
              .cast("long").alias("n1"),
              F.sum(F.when(F.col("day") - F.col("d0") >= 15, 1).otherwise(0))
              .cast("long").alias("n2")))
    z = ((F.col("n1").cast("double") - F.col("n2"))
         / F.sqrt(F.col("n1").cast("double") + F.col("n2")))
    return a.select("n1", "n2", F.round(z, 4).alias("z"))


# ------------------------------------------------ Markov stationary

_MARKOV_ITERS = 3


def _markov_oracle() -> str:
    parts = ["""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    tr AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    q AS (
      SELECT src, dst,
             CAST(round(n * 1000000.0
                        / sum(n) OVER (PARTITION BY src)) AS BIGINT) AS q
      FROM tr),
    states AS (SELECT DISTINCT src AS st FROM tr),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
    pi0 AS (
      SELECT st, CAST(round(1000000.0 / k.k) AS BIGINT) AS pi
      FROM states, k)"""]
    for it in range(1, _MARKOV_ITERS + 1):
        parts.append(f""",
    raw{it} AS (
      SELECT q.dst AS st, CAST(sum(p.pi * q.q) AS BIGINT) AS raw
      FROM pi{it - 1} p JOIN q ON q.src = p.st
      GROUP BY 1),
    pi{it} AS (
      SELECT st, CAST(round(CAST(raw AS DOUBLE) * 1000000
                            / (SELECT sum(raw) FROM raw{it})) AS BIGINT)
               AS pi
      FROM raw{it})""")
    parts.append(f"""
    SELECT st AS event_type, pi AS pi_ppm
    FROM pi{_MARKOV_ITERS}""")
    return "".join(parts)


@register("events_markov_stationary", oracle=_markov_oracle(),
          tags=("analytics", "graph"))
def events_markov_stationary(spark, sf_dir):
    """Stationary distribution of the first-order event-type Markov
    chain (power iteration on `event_path_transitions`' matrix): where
    does a user's behavior settle in the long run? Three iterations
    with the HITS integer discipline — transition probabilities and
    the distribution both live as integer ppm, every propagation is an
    exact integer sum, and re-normalization is a 1-row broadcast.
    Scale: after one corpus-scan window builds the transition counts,
    every iteration runs on the |event_types|-row relation —
    corpus-size independent."""
    ev = table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (ev.withColumn("next_type", F.lead("event_type").over(seq))
          .filter(F.col("next_type").isNotNull())
          .groupBy(F.col("event_type").alias("src"),
                   F.col("next_type").alias("dst"))
          .agg(F.count("*").cast("long").alias("n")))
    by_src = Window.partitionBy("src")
    q = tr.select("src", "dst",
                  F.round(F.col("n") * 1e6 / F.sum("n").over(by_src))
                  .cast("long").alias("q")).localCheckpoint()
    states = q.select(F.col("src").alias("st")).distinct()
    k = states.count()
    pi = states.select("st", F.round(F.lit(1e6 / k)).cast("long").alias("pi"))
    for _ in range(_MARKOV_ITERS):
        raw = (pi.join(q, F.col("st") == F.col("src"))
               .groupBy(F.col("dst").alias("st"))
               .agg(F.sum(F.col("pi") * F.col("q")).cast("long")
                    .alias("raw")))
        tot = raw.agg(F.sum("raw").alias("tot"))
        pi = (raw.crossJoin(F.broadcast(tot))
              .select("st", F.round(F.col("raw").cast("double") * 1e6
                                    / F.col("tot")).cast("long").alias("pi")))
    return pi.select(F.col("st").alias("event_type"),
                     F.col("pi").alias("pi_ppm"))


# ------------------------------------------------ Holt linear forecast

_HOLT_W = 15
_HOLT_ALPHA, _HOLT_BETA = 0.5, 0.3


def _holt_weights():
    """Coefficient vectors of the truncated Holt recursion (l_0 = y_0,
    b_0 = 0, then W-1 update steps) — computed once at import, shared
    as literals by both engines (the `ts_ewma_priority_revenue`
    truncated-kernel recipe extended to two state variables)."""
    lw = [0.0] * _HOLT_W
    bw = [0.0] * _HOLT_W
    lw[0] = 1.0
    for t in range(1, _HOLT_W):
        e = [1.0 if i == t else 0.0 for i in range(_HOLT_W)]
        l_new = [_HOLT_ALPHA * e[i]
                 + (1 - _HOLT_ALPHA) * (lw[i] + bw[i])
                 for i in range(_HOLT_W)]
        b_new = [_HOLT_BETA * (l_new[i] - lw[i])
                 + (1 - _HOLT_BETA) * bw[i] for i in range(_HOLT_W)]
        lw, bw = l_new, b_new
    return ([round(x, 12) for x in lw], [round(x, 12) for x in bw])


_HOLT_LW, _HOLT_BW = _holt_weights()


def _holt_oracle() -> str:
    ycols = ",\n             ".join(
        f"CAST(max(CASE WHEN idx = {i} THEN cents END) AS BIGINT) AS y{i}"
        for i in range(_HOLT_W))
    lsum = " + ".join(f"({w!r} * y{i})" for i, w in enumerate(_HOLT_LW))
    bsum = " + ".join(f"({w!r} * y{i})" for i, w in enumerate(_HOLT_BW))
    return f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_US_DAY} AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    r AS (
      SELECT cents,
             {_HOLT_W} - row_number() OVER (ORDER BY day DESC) AS idx
      FROM d),
    p AS (
      SELECT {ycols},
             CAST(count(*) AS BIGINT) AS n_used
      FROM r WHERE idx >= 0)
    SELECT n_used,
           round(({lsum}) / 100, 4) AS level,
           round(({bsum}) / 100, 4) AS trend,
           round((({lsum}) + ({bsum})) / 100, 4) AS forecast_next
    FROM p
    """


@register("ts_holt_linear_forecast", oracle=_holt_oracle(),
          tags=("timeseries", "forecast"))
def ts_holt_linear_forecast(spark, sf_dir):
    """Holt's linear-trend (double exponential smoothing) one-step
    forecast of daily revenue — the trend-aware upgrade of
    `ts_ewma_priority_revenue`'s level-only smoother, via the same
    truncated-kernel technique: the (level, trend) recursion over the
    last 15 days unrolls at IMPORT time into two fixed literal
    coefficient vectors, so each statistic is a fixed-arity dot
    product of exact integer day-totals with shared literals —
    identical operand order in both engines, no recursion at run
    time. Scale: the kernel reads the day-grain aggregate (bounded by
    calendar span); the pivot to fixed y_i columns is one conditional
    aggregate."""
    e = table(spark, sf_dir, "events")
    d = (e.groupBy((F.unix_micros("ts") / _US_DAY).cast("long").alias("day"))
         .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
              .cast("long").alias("cents")))
    r = d.select(
        "cents",
        (_HOLT_W - F.row_number().over(Window.orderBy(F.col("day").desc())))
        .alias("idx")).filter(F.col("idx") >= 0)
    p = r.agg(
        *[F.max(F.when(F.col("idx") == i, F.col("cents"))).cast("long")
          .alias(f"y{i}") for i in range(_HOLT_W)],
        F.count("*").cast("long").alias("n_used"))
    lsum = None
    bsum = None
    for i in range(_HOLT_W):
        lt = F.lit(_HOLT_LW[i]) * F.col(f"y{i}")
        bt = F.lit(_HOLT_BW[i]) * F.col(f"y{i}")
        lsum = lt if lsum is None else lsum + lt
        bsum = bt if bsum is None else bsum + bt
    return p.select("n_used",
                    F.round(lsum / 100, 4).alias("level"),
                    F.round(bsum / 100, 4).alias("trend"),
                    F.round((lsum + bsum) / 100, 4).alias("forecast_next"))


# ------------------------------------------------ periodogram

_PG_DAYS = 28          # 4 complete weeks
_PG_PERIODS = (7, 14, 28)


def _pg_weights():
    """cos/sin weights per (period, day-index) — literal Fourier
    coefficients computed once at import (the Holt-kernel recipe):
    spectral power needs no runtime trig, no libm in either engine."""
    import math
    out = {}
    for p in _PG_PERIODS:
        cos = [round(math.cos(2 * math.pi * i / p), 12)
               for i in range(_PG_DAYS)]
        sin = [round(math.sin(2 * math.pi * i / p), 12)
               for i in range(_PG_DAYS)]
        out[p] = (cos, sin)
    return out


_PG_W = _pg_weights()


def _pg_oracle() -> str:
    ycols = ",\n             ".join(
        f"CAST(coalesce(max(CASE WHEN idx = {i} THEN cents END), 0)"
        f" AS BIGINT) AS y{i}"
        for i in range(_PG_DAYS))
    rows = []
    for p in _PG_PERIODS:
        cos, sin = _PG_W[p]
        cs = " + ".join(f"({w!r} * (y{i} - mu))"
                        for i, w in enumerate(cos))
        sn = " + ".join(f"({w!r} * (y{i} - mu))"
                        for i, w in enumerate(sin))
        rows.append(
            f"SELECT {p} AS period_days, "
            f"round((({cs}) * ({cs}) + ({sn}) * ({sn}))"
            f" / {_PG_DAYS} / 1e4, 4) AS power FROM p")
    union = "\n    UNION ALL\n    ".join(rows)
    return f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_US_DAY} AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    r AS (
      SELECT cents,
             day - (SELECT max(day) FROM d) + {_PG_DAYS} - 1 AS idx
      FROM d),
    p AS (
      SELECT {ycols},
             CAST(sum(cents) AS DOUBLE) / {_PG_DAYS} AS mu
      FROM r WHERE idx >= 0)
    {union}
    """


@register("ts_periodogram", oracle=_pg_oracle(),
          tags=("timeseries", "stat"))
def ts_periodogram(spark, sf_dir):
    """Periodogram of the daily revenue series at candidate periods
    7/14/28 days — the SPECTRAL seasonality detector
    (`ts_seasonal_decompose` assumes weekly structure; this measures
    which period actually carries power). Fourier cos/sin weights are
    import-time literals (no runtime trig, no libm divergence risk);
    each power is a fixed-arity expression over the mean-centered
    last-28-CALENDAR-day pivot of exact integer day totals (missing
    days zero-fill in their own slot, keeping the Fourier phase
    aligned; mean over the fixed 28-day window). Power scaled to
    dollars² per day. Scale: reads the day-grain aggregate only."""
    e = table(spark, sf_dir, "events")
    d = (e.groupBy((F.unix_micros("ts") / _US_DAY).cast("long").alias("day"))
         .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
              .cast("long").alias("cents")))
    mx = d.agg(F.max("day").alias("mxd"))
    # CALENDAR-day index (not observed-row index): a missing day keeps
    # its slot and zero-fills, so the Fourier phase stays aligned on
    # gappy data; the mean uses the fixed 28-day denominator
    r = (d.crossJoin(F.broadcast(mx))
         .select("cents", (F.col("day") - F.col("mxd") + _PG_DAYS - 1)
                 .alias("idx"))
         .filter(F.col("idx") >= 0))
    p = r.agg(
        *[F.coalesce(F.max(F.when(F.col("idx") == i, F.col("cents"))),
                     F.lit(0)).cast("long")
          .alias(f"y{i}") for i in range(_PG_DAYS)],
        (F.sum("cents").cast("double") / _PG_DAYS).alias("mu"))
    outs = []
    for per in _PG_PERIODS:
        cos, sin = _PG_W[per]
        cs = None
        sn = None
        for i in range(_PG_DAYS):
            ct = F.lit(cos[i]) * (F.col(f"y{i}") - F.col("mu"))
            st = F.lit(sin[i]) * (F.col(f"y{i}") - F.col("mu"))
            cs = ct if cs is None else cs + ct
            sn = st if sn is None else sn + st
        outs.append(p.select(
            F.lit(per).cast("int").alias("period_days"),
            F.round((cs * cs + sn * sn) / _PG_DAYS / 1e4, 4)
            .alias("power")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
