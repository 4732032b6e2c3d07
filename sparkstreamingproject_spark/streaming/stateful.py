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
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
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


# --- windowFunnel as a streaming CEP state machine --------------------------

WF_HORIZON_US = 86_400_000_000  # every step within 24h of the chain's view

WF_STATE_SCHEMA = StructType([
    StructField("best_level", LongType()),
    StructField("views", ArrayType(LongType())),
    StructField("clicks", ArrayType(LongType())),
    StructField("purchases", ArrayType(LongType())),
])

WF_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("funnel_level", LongType()),
])


def _chain_level(v: int, clicks: list[int], purchases: list[int]) -> int:
    """Depth of the view→click→purchase chain anchored at view v:
    t2 = first click in [v, v+W), t3 = first purchase in [t2, v+W) —
    the batch window_funnel_levels semantics, verbatim."""
    t2 = min((c for c in clicks if v <= c < v + WF_HORIZON_US),
             default=None)
    if t2 is None:
        return 1
    t3 = min((p for p in purchases if t2 <= p < v + WF_HORIZON_US),
             default=None)
    return 3 if t3 is not None else 2


def _update_window_funnel(key, batches: Iterable[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    best, views, clicks, purchases = (
        state.get if state.exists else (0, [], [], []))
    views, clicks, purchases = list(views), list(clicks), list(purchases)
    max_us = 0
    for pdf in batches:
        us = pdf["ts"].astype("int64") // 1_000
        if len(us):
            max_us = max(max_us, int(us.max()))
        t = pdf["event_type"]
        views.extend(int(x) for x in us[t == "view"])
        clicks.extend(int(x) for x in us[t == "click"])
        purchases.extend(int(x) for x in us[t == "purchase"])
    wm_us = state.getCurrentWatermarkMs() * 1_000
    # chains whose horizon closed below the watermark are FINAL: fold
    # their level into best_level and evict the view; events older than
    # wm - W can only serve final chains — evict them too. State is
    # therefore bounded by one horizon of per-key traffic, the standard
    # CEP state bound, regardless of stream length.
    still_open = []
    for v in views:
        lvl = _chain_level(v, clicks, purchases)
        if v + WF_HORIZON_US <= wm_us:
            best = max(best, lvl)
        else:
            still_open.append(v)
            best = max(best, lvl)  # provisional level also counts NOW
    views = still_open
    clicks = [c for c in clicks if c > wm_us - WF_HORIZON_US]
    purchases = [p for p in purchases if p > wm_us - WF_HORIZON_US]
    state.update((best, views, clicks, purchases))
    state.setTimeoutTimestamp(
        max(max_us // 1_000 + WF_HORIZON_US // 1_000,
            state.getCurrentWatermarkMs() + 1))
    if best > 0:
        yield pd.DataFrame({"user_id": [user_id], "funnel_level": [best]})


def window_funnel_stream(events: DataFrame,
                         watermark: str = "10 minutes") -> DataFrame:
    """windowFunnel (queries/analytics4.py:window_funnel_levels) as a
    streaming CEP state machine: per user, the deepest
    view→click→purchase chain where every step lands within 24 h of
    the chain's own anchoring view, emitted in update mode as the
    level grows. Stream output ≡ the batch query on the same data
    (asserted in tests/test_stateful.py across multi-file
    micro-batches).

    State per key is the horizon-bounded event buffer plus one long —
    chains finalize (and their events evict) as the watermark passes
    their horizon, so state never grows with stream length; the
    emitted level is monotone, so the latest update per key IS the
    answer. This is the reference's per-mid Redis state idiom
    (``DwdOrderWideApp``-style joins keep state externally) replaced
    by the engine's checkpointed state store."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id").applyInPandasWithState(
                _update_window_funnel,
                outputStructType=WF_OUTPUT_SCHEMA,
                stateStructType=WF_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
