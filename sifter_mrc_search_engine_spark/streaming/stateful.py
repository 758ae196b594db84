"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stream processing (SURVEY §2.9); these provide the
stateful-operator half of the Structured Streaming toolkit alongside the
foreachBatch segment builder in incremental.py:

  * ``running_user_totals``: per-user running event counts/sums across
    micro-batches — per-group state is a (count, total) pair updated each
    batch and emitted in update mode. After draining a stream its final
    per-user rows must equal the batch groupBy aggregate over the same
    input (pinned by pytest over multi-chunk availableNow runs).
  * ``stream_dedup_exact``: watermark-bounded exact dedup at ingest.
  * ``stream_near_dup``: the MinHash-LSH near-dup GATE for incremental
    ingest — first-arrived survivor wins across batches via an
    append-only band-bucket store, idempotent per batch.

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


def stream_near_dup(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    perms: int | None = None,
    bands: int | None = None,
    k: int | None = None,
    max_bucket: int | None = 256,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming MinHash-LSH near-duplicate GATE: each micro-batch's
    docs are checked against the accumulated band-bucket store of every
    earlier SURVIVOR — first-arrived wins across batches (the
    ``stream_dedup_exact`` rule, extended from byte-identity to LSH
    near-identity); within a batch the pairwise min-``doc_id`` keeper
    applies (the ``prepare_corpus(near_dup=True)`` rule). Survivors
    land in ``<output>/docs/batch=<id>``; their buckets append to
    ``<output>/lsh_buckets/batch=<id>``.

    Scale/exactness posture:

    * the store is an append-only parquet table keyed (band, bkey) —
      per batch ONE equi-join against it, no pairwise blowup; unlike
      watermark-keyed exact dedup the LSH state cannot expire (a
      near-dup horizon is corpus-wide by definition), so store size is
      O(survivors x bands) rows — the operator to compact it is plain
      ``spark.read.parquet(store).distinct()``.
    * both writes go to ``batch=<id>`` subdirs with mode=overwrite, so
      a replayed batch (failure/restart mid-commit) is IDEMPOTENT —
      the foreachBatch exactly-once recipe.
    * ``max_bucket`` caps only the WITHIN-batch pair expansion (the
      degenerate-boilerplate quadratic); the store join is linear in
      matches and needs no cap.
    """
    from pathlib import Path

    from pyspark.errors import AnalysisException
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_MINHASH_PERMS,
        DEFAULT_SHINGLE_K,
        lsh_band_buckets,
    )

    perms = DEFAULT_MINHASH_PERMS if perms is None else perms
    bands = DEFAULT_BANDS if bands is None else bands
    k = DEFAULT_SHINGLE_K if k is None else k
    store_dir = f"{output_dir}/lsh_buckets"

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark import StorageLevel

        b = lsh_band_buckets(batch_df, perms, bands, k).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            drops = None
            if Path(store_dir).exists() or "://" in store_dir:
                try:
                    store = (
                        spark.read.parquet(store_dir)
                        .select("band", "bkey")
                        .distinct()
                    )
                    drops = (
                        b.join(store, ["band", "bkey"])
                        .select("doc_id")
                        .distinct()
                    )
                except AnalysisException:
                    # first batch against a remote store_dir: the path
                    # does not exist yet. Any OTHER failure (corrupt
                    # store, permissions) must propagate — silently
                    # treating it as "no store" would re-admit dups.
                    drops = None
            capped = b
            if max_bucket is not None:
                sz = F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
                capped = b.withColumn("_sz", sz).filter(
                    F.col("_sz") <= max_bucket
                ).drop("_sz")
            a_, c_ = capped.alias("a"), capped.alias("c")
            in_batch = (
                a_.join(c_, ["band", "bkey"])
                .filter(F.col("a.doc_id") > F.col("c.doc_id"))
                .select(F.col("a.doc_id").alias("doc_id"))
                .distinct()
            )
            drops = in_batch if drops is None else drops.union(in_batch).distinct()
            survivors = batch_df.join(drops, "doc_id", "left_anti")
            survivors.write.mode("overwrite").parquet(
                f"{output_dir}/docs/batch={batch_id}"
            )
            b.join(drops, "doc_id", "left_anti").select(
                "band", "bkey", "doc_id"
            ).write.mode("overwrite").parquet(f"{store_dir}/batch={batch_id}")
        finally:
            b.unpersist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    writer = stream.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
