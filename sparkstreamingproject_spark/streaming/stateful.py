"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.F gap list: "custom stateful operators").

The reference keeps all state externally (Redis offsets/dims); in
Structured Streaming, arbitrary per-key state lives in the engine's
state store — checkpointed, exactly-once, watermark-expired. Two
operators:

- ``user_profile_stream`` — running per-key profile (event count,
  value sum, last event type): the streaming analog of the DWS layer
  the reference's tutorial builds toward.
- ``funnel_stream`` — two-step view→purchase funnel within a horizon,
  the stateful form of the batch ``ts_funnel_view_purchase`` query
  (queries/timeseries.py) — stream-vs-batch equality is asserted in
  tests/test_stateful.py.

State-store discipline at scale: state is per-key and must be
bounded. Both operators use ``GroupStateTimeout.EventTimeTimeout``
with a watermark on the input and ``state.setTimeoutTimestamp`` —
idle keys expire (``state.remove()`` on ``hasTimedOut``) instead of
accumulating forever; at 1B keys the state store holds only the
watermark-recent working set.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

PROFILE_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("last_type", StringType()),
])

PROFILE_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("last_type", StringType()),
])

PROFILE_IDLE_MS = 24 * 3600 * 1000  # expire keys idle past the watermark


def _update_profile(key, batches: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle key past the watermark: drop state, emit nothing
        state.remove()
        return
    n, total, last_type = state.get if state.exists else (0, 0.0, None)
    max_ms = 0
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_type = str(pdf["event_type"].iloc[-1])
            max_ms = max(max_ms, int(pdf["ts"].max().value // 1_000_000))
    state.update((n, total, last_type))
    # event-time expiry: idle for PROFILE_IDLE_MS beyond the last seen
    # event (must exceed the current watermark or Spark rejects it)
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(max_ms + PROFILE_IDLE_MS, wm + 1))
    yield pd.DataFrame({"user_id": [user_id], "n": [n],
                        "total": [total], "last_type": [last_type]})


def user_profile_stream(events: DataFrame,
                        watermark: str = "10 minutes") -> DataFrame:
    """Running per-user profile over a stream of
    (event_id, ts, user_id, event_type, value). The watermark both
    bounds late data and drives state expiry (EventTimeTimeout)."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id").applyInPandasWithState(
                _update_profile,
                outputStructType=PROFILE_OUTPUT_SCHEMA,
                stateStructType=PROFILE_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))


# --- two-step funnel (stateful form of ts_funnel_view_purchase) -------------

FUNNEL_HORIZON_US = 86_400_000_000  # purchase within 24h of first view

FUNNEL_STATE_SCHEMA = StructType([
    StructField("first_view_us", LongType()),
    StructField("first_purchase_us", LongType()),
])

FUNNEL_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("first_view_us", LongType()),
    StructField("first_purchase_us", LongType()),
])


def _update_funnel(key, batches: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    fv, fp = state.get if state.exists else (None, None)
    purchases: list[int] = []
    max_ms = 0
    for pdf in batches:
        us = pdf["ts"].astype("int64") // 1_000
        if len(us):
            max_ms = max(max_ms, int(us.max()) // 1_000)
        v = us[pdf["event_type"] == "view"]
        if len(v):
            mv = int(v.min())
            fv = mv if fv is None else min(fv, mv)
        purchases.extend(int(x) for x in us[pdf["event_type"] == "purchase"])
    # evaluate purchases AFTER folding this batch's views into fv, so
    # intra-batch disorder can't miss a conversion. Purchases retained
    # in state is unnecessary: a purchase only matters while some view
    # at or before it exists; cross-batch disorder is bounded by the
    # watermark (a view arriving later than watermark-late is dropped
    # by the engine anyway — standard streaming semantics).
    if fv is not None:
        elig = [p for p in purchases if fv < p <= fv + FUNNEL_HORIZON_US]
        if elig:
            mp = min(elig)
            fp = mp if fp is None else min(fp, mp)
        if fp is not None and not (fv < fp <= fv + FUNNEL_HORIZON_US):
            # a late earlier view shifted the window off the old purchase
            fp = None
    state.update((fv, fp))
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(
        max(max_ms + FUNNEL_HORIZON_US // 1_000, wm + 1))
    if fv is not None and fp is not None:
        yield pd.DataFrame({"user_id": [user_id],
                            "first_view_us": [fv],
                            "first_purchase_us": [fp]})


def funnel_stream(events: DataFrame,
                  watermark: str = "10 minutes") -> DataFrame:
    """Two-step funnel as a custom stateful operator: per user, the
    first 'view' and the first 'purchase' within FUNNEL_HORIZON_US
    after it — emitted (update mode) as soon as the pair is known,
    refined if an earlier eligible purchase arrives later. Batch
    equivalent: ts_funnel_view_purchase (queries/timeseries.py) —
    equality asserted in tests/test_stateful.py. State per key is two
    longs; expiry one horizon past the last event."""
    return (events.withWatermark("ts", watermark)
            .select("ts", "user_id", "event_type")
            .groupBy("user_id").applyInPandasWithState(
                _update_funnel,
                outputStructType=FUNNEL_OUTPUT_SCHEMA,
                stateStructType=FUNNEL_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
