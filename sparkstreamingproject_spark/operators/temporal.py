"""Temporal join operators Spark lacks natively: as-of join and
bucketed range join (SURVEY.md §4's "library function choosing between
plans" stance — compositions of built-in operators, no Catalyst rule,
no Python).

Why not the naive formulations:
- as-of as `join(l.ts >= r.ts) → max per left row` materializes
  |L|·|R_key| pairs before reducing — quadratic per key.
- range join as an inequality-only join plans BroadcastNestedLoop —
  O(|L|·|R|) comparisons at any scale.

Both operators here shuffle each input ONCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(df: DataFrame, key: str, ts_col: str,
                 attr_cols: list[str],
                 tiebreak_cols: tuple = ()) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change stream
    (key, ts, attrs...) into versioned history rows
    [valid_from, valid_to) with an is_current flag — the dimension
    layout every warehouse join-backs against. The reference's dim
    path is SCD1 (last-write-wins upsert, ``OdsBaseDbApp.scala:139-164``);
    this is the history-preserving alternative.

    One window over (key, ts): valid_to = next change's ts (open-ended
    for the latest). Epoch-microsecond outputs (instants, not wall
    time — see queries/base.py tz discipline). At scale this is a
    single shuffle on the key, and the window is per-key sorted — no
    global order.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(ts_col, *tiebreak_cols)
    nxt = F.lead(ts_col).over(w)
    return df.select(
        F.col(key), *[F.col(c) for c in attr_cols],
        F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"))


def scd2_lookup(facts: DataFrame, dim_hist: DataFrame, key: str,
                fact_ts_col: str, dim_cols: list[str]) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension: each fact
    row joins the single version whose [valid_from_us, valid_to_us)
    interval contains the fact's event time — the join every
    history-preserving warehouse runs (as-of semantics expressed as an
    interval join, the dual of ``asof_join``'s union+window form).

    Plan shape: an equi-join on the dimension key with the interval
    predicates as post-join filters — one shuffle on the key; versions
    tile per key (``scd2_history`` guarantees it), so the filter keeps
    exactly one version per fact. Facts before the key's first version
    drop (inner join).
    """
    f = facts.withColumn("__ts_us", F.unix_micros(F.col(fact_ts_col)))
    d = dim_hist.select(
        F.col(key).alias("__k"), "valid_from_us", "valid_to_us",
        *[F.col(c).alias(f"dim_{c}") for c in dim_cols])
    cond = ((f[key] == d["__k"])
            & (d["valid_from_us"] <= f["__ts_us"])
            & (d["valid_to_us"].isNull()
               | (f["__ts_us"] < d["valid_to_us"])))
    return f.join(d, cond).drop("__k")


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              tiebreak: str | None = None,
              direction: str = "backward") -> DataFrame:
    """Merge-asof: each left row gets the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same key (``direction=
    "backward"``, the default), or the smallest ``right_ts`` ≥
    ``left_ts`` (``direction="forward"``); null columns if none.

    Implementation: tag and union both sides, one window sorted by
    (key, ts, side) carries the last-seen right row forward
    (``last(..., ignorenulls)``), then keep left rows. One shuffle on
    the key, one per-key sort — the same cost as a sort-merge join,
    independent of how many right rows precede each left row. Forward
    is the same traversal with time reversed.

    ``tiebreak``: right-side column ordering the winner among equal
    ``right_ts`` (greatest wins backward, smallest forward) — without
    it, ties are nondeterministic. The side key sorts BEFORE the
    tiebreak so rights at a boundary-equal timestamp stay visible to
    the left row (left rows carry a null tiebreak, and nulls-first
    ordering would otherwise sort them ahead of the rights they must
    see).
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (key, right_ts)]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    fwd = direction == "forward"
    order = [F.col("_ts").desc() if fwd else F.col("_ts").asc(),
             F.col("_side")]
    if tiebreak:
        tb = F.col(f"_r_{tiebreak}" if tiebreak in right_cols else tiebreak)
        order.append(tb.desc() if fwd else tb.asc())

    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    r = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts (≤)
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(ltypes[c]).alias(f"_l_{c}") for c in left.columns])
    lft = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns])

    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = r.unionByName(lft).select(
        "_k", "_ts", "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
          for c in right_cols],
        *[F.col(f"_l_{c}") for c in left.columns])
    return (carried.filter(F.col("_side") == 1)
            .select(*[F.col(f"_l_{c}").alias(c) for c in left.columns],
                    *[F.col(f"_rv_{c}").alias(c) for c in right_cols]))


def range_join(left: DataFrame, right: DataFrame,
               left_ts: str, right_ts: str, within_seconds: int,
               condition=None) -> DataFrame:
    """Band join: pairs with |left_ts - right_ts| ≤ within_seconds.

    Implementation: bucket both sides by ``within_seconds``; a
    qualifying pair's buckets differ by at most 1, so replicating the
    left side into its 3 adjacent buckets turns the inequality join
    into an equi-join on the bucket (hash join, codegen) plus a cheap
    residual filter. Cost: 3× replication of one side instead of
    |L|·|R| comparisons.

    ``condition``: optional extra join predicate (e.g. key equality —
    which then also joins on the key, shrinking buckets further).
    """
    def bucket(c):
        return F.floor(F.unix_micros(F.col(c)) / (within_seconds * 1_000_000))

    lb = (left.withColumn("_lb", bucket(left_ts))
          .withColumn("_b", F.explode(F.array(
              F.col("_lb") - 1, F.col("_lb"), F.col("_lb") + 1)))
          .drop("_lb"))
    rb = right.withColumn("_b", bucket(right_ts))
    joined = lb.join(rb, on="_b", how="inner")
    if condition is not None:
        joined = joined.filter(condition)
    residual = (F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts)))
                <= within_seconds * 1_000_000)
    return joined.filter(residual).drop("_b")


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bucket_us: int,
                          condition=None) -> DataFrame:
    """Interval × interval overlap join: pairs where
    ``l_start < r_end AND r_start < l_end`` (half-open intervals in
    epoch-microsecond columns).

    Implementation: each interval explodes to the ``bucket_us``-wide
    time buckets it covers; overlapping intervals share at least one
    bucket, so the inequality join becomes a bucket equi-join (hash
    join, codegen) + residual overlap filter + ``distinct`` (a pair
    colliding in k buckets appears k times). Cost: replication factor
    = interval length / bucket width — size ``bucket_us`` near the
    typical interval length so most intervals land in 1-2 buckets.
    The naive inequality join is |L|·|R| comparisons (Spark plans
    BroadcastNestedLoop); this stays a keyed hash join at any scale.

    ``condition``: extra join predicate applied before the residual
    (e.g. a key equality, which co-partitions the buckets further).
    """
    def buckets(s, e):
        # empty/inverted intervals (end <= start) must match nothing:
        # unguarded, F.sequence auto-steps -1 and would silently emit a
        # DESCENDING bucket range — huge arrays when end << start
        return F.when(
            F.col(e) > F.col(s),
            F.sequence(F.floor(F.col(s) / bucket_us),
                       F.floor((F.col(e) - 1) / bucket_us))
        ).otherwise(F.expr("CAST(array() AS array<bigint>)"))

    lb = left.withColumn("_b", F.explode(buckets(l_start, l_end)))
    rb = right.withColumn("_b", F.explode(buckets(r_start, r_end)))
    joined = lb.join(rb, on="_b", how="inner")
    if condition is not None:
        joined = joined.filter(condition)
    overlap = ((F.col(l_start) < F.col(r_end))
               & (F.col(r_start) < F.col(l_end)))
    return joined.filter(overlap).drop("_b").distinct()


def asof_join_nearest(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str, left_id: str,
                      right_cols: list[str], tiebreak: str) -> DataFrame:
    """Nearest-in-time as-of join: each left row takes the right row
    minimizing |right_ts - left_ts| for the same key; an exact
    |delta| tie prefers the backward (at-or-before) match. Composed
    from one backward and one forward ``asof_join`` pass (each one
    key shuffle + per-key sort) + a per-left-row argmin — still
    O(n log n) per key, never left x right. Timestamp columns must be
    TIMESTAMP (compared via unix_micros).

    Preconditions (validated): ``right_ts`` must be listed in
    ``right_cols`` (the argmin needs both candidates' timestamps
    back), and ``left_id`` must uniquely identify left rows — the
    backward/forward recombination joins on it, so duplicates would
    cross-multiply candidate rows.
    """
    if right_ts not in right_cols:
        raise ValueError(
            f"right_ts {right_ts!r} must be included in right_cols "
            f"{right_cols!r} — the nearest argmin compares both "
            "directions' timestamps")
    lcols = left.columns
    b = asof_join(left, right, key, left_ts, right_ts,
                  right_cols=right_cols, tiebreak=tiebreak,
                  direction="backward")
    f = asof_join(left, right, key, left_ts, right_ts,
                  right_cols=right_cols, tiebreak=tiebreak,
                  direction="forward")
    b = b.select(*lcols, *[F.col(c).alias(f"_b_{c}") for c in right_cols])
    f = f.select(F.col(left_id),
                 *[F.col(c).alias(f"_f_{c}") for c in right_cols])
    j = b.join(f, left_id)
    db = F.abs(F.unix_micros(F.col(left_ts))
               - F.unix_micros(F.col(f"_b_{right_ts}")))
    df_ = F.abs(F.unix_micros(F.col(f"_f_{right_ts}"))
                - F.unix_micros(F.col(left_ts)))
    take_b = F.when(F.col(f"_b_{right_ts}").isNull(), F.lit(False)) \
              .when(F.col(f"_f_{right_ts}").isNull(), F.lit(True)) \
              .otherwise(db <= df_)
    picked = [F.when(take_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
              .alias(c) for c in right_cols]
    return j.select(*lcols, *picked)
