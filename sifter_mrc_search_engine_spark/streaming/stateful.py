"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stream processing (SURVEY §2.9); these provide the
stateful-operator half of the Structured Streaming toolkit alongside the
foreachBatch segment builder in incremental.py:

  * ``running_user_totals``: per-user running event counts/sums across
    micro-batches — per-group state is a (count, total) pair updated each
    batch and emitted in update mode. After draining a stream its final
    per-user rows must equal the batch groupBy aggregate over the same
    input (pinned by pytest over multi-chunk availableNow runs).

State lives in the streaming state store keyed by user_id: at 10^12
events the state size is O(distinct users), partitioned by the shuffle on
the grouping key — the standard Spark stateful-op scale model.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EVENTS_DDL = "event_id long, ts timestamp, user_id long, value double"

TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark.

    Append mode: a window row is emitted exactly once, when the watermark
    (max event time − ``watermark``) passes its end; events arriving
    later than the watermark are DROPPED (the late-data contract). The
    batch twin is relational.events_daily_window.
    """
    from pyspark.sql import functions as F

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals: each micro-batch emits the
    updated (user_id, n_events, total_value) for every user seen in it."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_exact(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of ``operators.dedup.dedup_exact``: the
    FIRST-ARRIVED doc per exact content hash survives; re-deliveries
    within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` keys state by ``md5(text)`` and
    EXPIRES entries once the watermark passes them — the state store
    stays bounded by (dedup horizon x ingest rate) instead of growing
    with the full corpus (the unbounded ``dropDuplicates`` would
    accumulate one state row per distinct document forever — the
    classic streaming-dedup OOM). The trade, stated: two identical docs
    arriving farther apart than ``watermark`` BOTH survive; exact
    corpus-wide dedup remains the batch operator's job
    (``prepare_corpus`` / ``dedup_exact``), with this operator as the
    in-flight guard against re-delivered/duplicated events at ingest.
    """
    from pyspark.sql import functions as F

    return (
        docs_stream.withColumn("_h", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )
