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

import time
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

from ..functions import fsio

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
      O(survivors x bands) rows — :func:`compact_lsh_store` folds the
      accumulated batch partitions into one distinct slot between runs.
    * both writes go to ``batch=<id>`` subdirs with mode=overwrite, AND
      the store read is restricted to partitions ``batch < batch_id``,
      so a replayed batch (failure/restart mid-commit) is IDEMPOTENT —
      without the restriction a replay would join against its own
      first-attempt buckets, self-collide every survivor, and overwrite
      ``docs/batch=<id>`` with an empty set (permanent loss on exactly
      the crash path the recipe exists for).
    * ``max_bucket`` caps only the WITHIN-batch pair expansion (the
      degenerate-boilerplate quadratic) through the SAME
      :func:`~..operators.dedup.lsh_pairs_from_buckets` the batch
      operator uses; the store join is linear in matches and needs no
      cap. ``0`` disables the cap (the jobs' ``--lsh-max-bucket``
      convention); negatives are rejected rather than silently dropping
      every bucket.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_MINHASH_PERMS,
        DEFAULT_SHINGLE_K,
        lsh_band_buckets,
        lsh_pairs_from_buckets,
    )

    perms = DEFAULT_MINHASH_PERMS if perms is None else perms
    bands = DEFAULT_BANDS if bands is None else bands
    k = DEFAULT_SHINGLE_K if k is None else k
    if max_bucket is not None and max_bucket < 0:
        raise ValueError(
            "max_bucket must be >= 0 (0 disables the cap; a negative "
            "cap would silently drop every LSH bucket)"
        )
    if max_bucket == 0:
        max_bucket = None
    store_dir = f"{output_dir}/lsh_buckets"
    # band/bkey/doc_id from lsh_band_buckets, batch from the partition
    # dir name. Declared explicitly so an existing-but-empty store dir
    # (crash before the first part-file) reads as zero rows instead of
    # dying in schema inference — and so a corrupt store FAILS the
    # batch instead of being swallowed as "no store yet".
    store_schema = "band int, bkey string, doc_id long, batch long"

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # refuse to run while a compaction is mid-flight: a gate batch
        # could otherwise read the store between the compacted slot's
        # install and the superseded partitions' deletion (harmless
        # duplicates) or, worse, write a new batch partition the
        # compaction then deletes without having folded its rows
        # (those survivors' buckets would vanish from the store)
        if fsio.exists(fsio.join(output_dir, "_COMPACTING"), spark):
            raise RuntimeError(
                f"{output_dir} is being compacted (_COMPACTING sentinel "
                f"present) — wait for compact_lsh_store to finish, or "
                f"remove the sentinel if a compaction crashed"
            )
        from pyspark import StorageLevel

        b = lsh_band_buckets(batch_df, perms, bands, k).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            drops = None
            # existence is CHECKED (not sniffed from exception classes: an
            # AnalysisException catch around the read would also swallow
            # an unreadable store and silently re-admit duplicates)
            if fsio.exists(store_dir, spark):
                store = (
                    spark.read.schema(store_schema)
                    .parquet(store_dir)
                    # a replayed batch must not see its own (or any
                    # later uncommitted) first-attempt buckets
                    .where(F.col("batch") < F.lit(batch_id))
                    .select("band", "bkey")
                    .distinct()
                )
                drops = (
                    b.join(store, ["band", "bkey"])
                    .select("doc_id")
                    .distinct()
                )
            in_batch = (
                lsh_pairs_from_buckets(b, max_bucket)
                .select(F.col("doc_b").alias("doc_id"))
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


def compact_lsh_store(spark, output_dir: str) -> int:
    """Fold :func:`stream_near_dup`'s accumulated ``lsh_buckets``
    batch partitions into ONE distinct slot; returns the compacted row
    count. Run it between stream runs, after the previous run DRAINED
    CLEANLY (availableNow terminated) — compacting while a batch is
    written-but-uncommitted would fold that batch's buckets into the
    slot, where its own replay would see them.

    Crash-safe by ordering, not by atomic rename: the distinct rows are
    fully written to a temp dir, INSTALLED as a fresh negative
    ``batch=<slot>`` partition (slot = min(existing) - 1, always below
    any real batch id so every future ``batch < batch_id`` read
    includes it and no install ever collides with a live partition),
    and only THEN are the superseded partitions deleted. A crash at any
    point leaves duplicate rows at worst — the gate's store read
    distincts, so duplicates are harmless; rows are never removed
    before their replacement is fully in place.

    A ``_COMPACTING`` sentinel file guards the no-concurrent-stream
    convention (r5 ADVICE): it is written before the fold and removed
    after the superseded partitions are gone, and
    :func:`stream_near_dup`'s gate REFUSES to process a batch while it
    exists — a concurrent gate could otherwise write a batch partition
    this compaction deletes without folding. A crashed compaction
    leaves the sentinel behind deliberately (the operator must look
    before removing it)."""
    import re as _re

    store_dir = f"{output_dir}/lsh_buckets"
    jvm = spark._jvm
    hstore = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = hstore.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hstore):
        return 0
    # sentinel BEFORE the partition listing: a gate batch that starts
    # after this point is refused, so the fold's snapshot cannot miss a
    # batch written between listStatus and the delete loop. (A gate
    # batch that passed its sentinel check before this line can still
    # race — the documented contract remains "compact between cleanly
    # drained runs"; the sentinel narrows the window, it is not a lock.)
    sentinel = fsio.join(output_dir, "_COMPACTING")
    fsio.write_text(sentinel, str(int(time.time() * 1000)), spark)
    slots = []
    for st in fs.listStatus(hstore):
        m = _re.fullmatch(r"batch=(-?\d+)", st.getPath().getName())
        if m:
            slots.append(int(m.group(1)))
    if len(slots) <= 1:
        # nothing to fold (0 or 1 partition); still report the count
        fsio.delete(sentinel, spark)
        return (
            spark.read.schema(
                "band int, bkey string, doc_id long, batch long"
            ).parquet(store_dir).count()
            if slots
            else 0
        )
    rows = (
        spark.read.schema("band int, bkey string, doc_id long, batch long")
        .parquet(store_dir)
        .select("band", "bkey", "doc_id")
        .distinct()
    )
    tmp = f"{output_dir}/lsh_buckets_compact_tmp"
    htmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(htmp, True)  # leftover from a crashed earlier compaction
    rows.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    slot = min(min(slots), 0) - 1
    if not fs.rename(htmp, jvm.org.apache.hadoop.fs.Path(
        f"{store_dir}/batch={slot}"
    )):
        raise IOError(f"could not install compacted slot batch={slot}")
    for s in slots:  # delete AFTER the replacement is fully in place
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{store_dir}/batch={s}"), True
        )
    fsio.delete(sentinel, spark)
    return n
