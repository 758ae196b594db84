"""applyInPandasWithState: running per-user totals across micro-batches
must converge to the batch aggregate over the same input."""

import pytest
from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.streaming.stateful import (
    EVENTS_DDL,
    running_user_totals,
)


def test_running_totals_across_batches(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    rows = [
        (i, f"2024-01-01 00:{i % 60:02d}:00", i % 5, float(i % 7))
        for i in range(200)
    ]
    full = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    # three arriving chunks
    for c, (lo, hi) in enumerate([(0, 80), (80, 150), (150, 200)]):
        full.filter(f"event_id >= {lo} and event_id < {hi}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{in_dir}/chunk={c}")

    # one file per micro-batch so state must carry ACROSS batches
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/chunk=*")
    )
    updates = []

    def sink(batch_df, batch_id):
        updates.extend(
            (batch_id, r["user_id"], r["n_events"], r["total_value"])
            for r in batch_df.collect()
        )

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # the LAST update per user == the batch aggregate over everything
    final = {}
    for bid, uid, n, tot in sorted(updates):
        final[uid] = (n, tot)
    exp = {
        r["user_id"]: (r["n"], r["t"])
        for r in full.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert {u: n for u, (n, _) in final.items()} == {u: n for u, (n, _) in exp.items()}
    for u in exp:
        assert final[u][1] == pytest.approx(exp[u][1], rel=1e-12)
    # state genuinely accumulated ACROSS batches (not per-batch counts):
    # some user's final count must exceed any single chunk's size share
    assert max(n for n, _ in final.values()) == max(n for n, _ in exp.values()) == 40
    # and updates were emitted in more than one micro-batch
    assert len({bid for bid, *_ in updates}) >= 2


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed counts: an event older than the watermark at
    its arrival batch is dropped; the finalized window is emitted once
    without it."""
    from sifter_mrc_search_engine_spark.streaming.stateful import (
        windowed_event_counts,
    )

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")

    def chunk(c, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id", "value")
        df.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/chunk={c}")

    # batch 0: three on-time events in [00:00, 00:10) + one at 01:00 that
    # will advance the watermark to 00:50
    chunk(0, [
        (0, "2024-01-01 00:01:00", 1, 1.0),
        (1, "2024-01-01 00:03:00", 1, 1.0),
        (2, "2024-01-01 00:07:00", 2, 1.0),
        (3, "2024-01-01 01:00:00", 2, 1.0),
    ])
    # batch 1: fresh data only — the 00:50 watermark takes effect and the
    # [00:00, 00:10) window is finalized/emitted at this batch
    chunk(1, [
        (4, "2024-01-01 01:05:00", 1, 1.0),
    ])
    # batch 2: a LATE event for the already-finalized window — must be
    # dropped, not re-opened/re-emitted — plus a fresh one
    chunk(2, [
        (5, "2024-01-01 00:02:00", 1, 1.0),   # late beyond watermark
        (6, "2024-01-01 01:20:00", 1, 1.0),
    ])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/chunk=*")
    )
    out = []

    def sink(batch_df, batch_id):
        out.extend((r["win_start"], r["n"]) for r in batch_df.collect())

    q = (
        windowed_event_counts(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    finalized = {str(w): n for w, n in out}
    # the 00:00 window finalized with ONLY the 3 on-time events — the late
    # arrival (event 5) was dropped, not re-opened/re-emitted; the 01:00
    # window (events 3 and 4) finalized when event 6 pushed the watermark
    # past its end
    assert finalized == {"2024-01-01 00:00:00": 3, "2024-01-01 01:00:00": 2}, out
    assert len(out) == 2  # each window emitted exactly once (append mode)


def test_stream_dedup_exact(spark, tmp_path):
    """First-arrived doc per content hash survives; re-deliveries within
    the watermark drop; distinct texts all pass. Final output == the
    batch exact-dedup keeper count over the same input."""
    from sifter_mrc_search_engine_spark.streaming.stateful import (
        stream_dedup_exact,
    )

    in_dir = str(tmp_path / "in")
    rows = [
        (0, "2024-01-01 00:00:00", "alpha doc body"),
        (1, "2024-01-01 00:00:10", "beta doc body"),
        (2, "2024-01-01 00:00:20", "alpha doc body"),   # dup of 0
        (3, "2024-01-01 00:01:00", "gamma doc body"),
        (4, "2024-01-01 00:01:30", "beta doc body"),    # dup of 1
        (5, "2024-01-01 00:02:00", "delta doc body"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, ts_s string, text string"
    ).selectExpr(
        "doc_id", "cast(ts_s as timestamp) as ts", "text"
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)

    src = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(in_dir)
    out = stream_dedup_exact(src, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_sink").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == sorted(
        ["alpha doc body", "beta doc body", "gamma doc body", "delta doc body"]
    )
    # first-arrival wins: the surviving doc_ids are the earliest per text
    by_text = {r["text"]: r["doc_id"] for r in got}
    assert by_text["alpha doc body"] == 0 and by_text["beta doc body"] == 1


def test_stream_near_dup_gate(spark, tmp_path):
    """Streaming LSH near-dup gate: within a batch the min-doc_id of a
    colliding pair survives; across batches the FIRST-ARRIVED survivor
    blocks later near-dups via the persisted bucket store; unique docs
    always pass. Near-dup groups use byte-DISTINCT texts with identical
    shingle SETS (cyclic token repetition -> provably identical MinHash
    signatures), so the outcome is deterministic, not probabilistic."""
    from sifter_mrc_search_engine_spark.streaming.stateful import stream_near_dup

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def cyc(r):  # same shingle set for every r >= 2
        return " ".join(["alpha", "beta", "gamma"] * r)

    uniq = lambda i: " ".join(f"tok{i}x{j}" for j in range(8))
    chunk0 = [(10, cyc(2)), (20, cyc(3)), (30, uniq(0))]
    chunk1 = [(40, cyc(4)), (50, uniq(1))]
    for c, rows in enumerate((chunk0, chunk1)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{in_dir}/chunk={c}")

    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )

    got = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/docs").collect()
    }
    # 10 beats 20 in-batch; 40 blocked cross-batch by 10's stored
    # buckets; 30 and 50 unique
    assert got == {10, 30, 50}
    # the store holds only survivors' buckets
    store = spark.read.parquet(f"{out}/lsh_buckets")
    assert set(
        r["doc_id"] for r in store.select("doc_id").distinct().collect()
    ) == {10, 30, 50}

    # restart with the same checkpoint and a NEW chunk: the store still
    # blocks near-dups of batch-0 survivors (state survives restarts)
    chunk2 = [(60, cyc(5)), (70, uniq(2))]
    spark.createDataFrame(chunk2, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{in_dir}/chunk=2")
    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )
    got2 = {r["doc_id"] for r in spark.read.parquet(f"{out}/docs").collect()}
    assert got2 == {10, 30, 50, 70}


def test_stream_near_dup_replay_idempotent(spark, tmp_path):
    """A replayed batch must not join against its own first-attempt
    bucket-store partition: wiping the CHECKPOINT (not the output)
    replays every batch with the store already fully populated. The
    survivors must come out unchanged — the regression shape is every
    survivor self-colliding with its own stored buckets and the
    idempotent overwrite erasing ``docs/batch=<id>``."""
    import shutil

    from sifter_mrc_search_engine_spark.streaming.stateful import stream_near_dup

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def cyc(r):
        return " ".join(["alpha", "beta", "gamma"] * r)

    uniq = lambda i: " ".join(f"tok{i}x{j}" for j in range(8))
    chunks = (
        [(10, cyc(2)), (20, cyc(3)), (30, uniq(0))],
        [(40, cyc(4)), (50, uniq(1))],
    )
    for c, rows in enumerate(chunks):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{in_dir}/chunk={c}")

    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )
    first = {r["doc_id"] for r in spark.read.parquet(f"{out}/docs").collect()}
    assert first == {10, 30, 50}

    shutil.rmtree(ckpt)  # lost checkpoint -> full replay over live output
    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )
    replay = {r["doc_id"] for r in spark.read.parquet(f"{out}/docs").collect()}
    assert replay == first
    store = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/lsh_buckets").collect()
    }
    assert store == first


def test_stream_near_dup_cap_conventions(spark, tmp_path):
    """``max_bucket=0`` means UNCAPPED (the jobs' --lsh-max-bucket
    convention), not 'drop every bucket'; negatives are rejected up
    front instead of silently disabling the gate."""
    import pytest

    from sifter_mrc_search_engine_spark.streaming.stateful import stream_near_dup

    in_dir = str(tmp_path / "in")

    def cyc(r):
        return " ".join(["alpha", "beta", "gamma"] * r)

    rows = [(10, cyc(2)), (20, cyc(3)), (30, "a unique body of tokens")]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{in_dir}/chunk=0")

    with pytest.raises(ValueError, match="max_bucket"):
        stream_near_dup(
            spark,
            f"{in_dir}/chunk=*",
            str(tmp_path / "out_neg"),
            str(tmp_path / "ckpt_neg"),
            max_bucket=-1,
        )

    out = str(tmp_path / "out0")
    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, str(tmp_path / "ckpt0"), max_bucket=0
    )
    got = {r["doc_id"] for r in spark.read.parquet(f"{out}/docs").collect()}
    # uncapped: the near-dup pair still collapses to its min doc_id. A
    # literal size<=0 filter would keep all three docs.
    assert got == {10, 30}


def test_compact_lsh_store(spark, tmp_path):
    """compact_lsh_store folds all batch partitions into one negative
    slot with the same distinct (band, bkey, doc_id) content; the gate
    keeps blocking near-dups of pre-compaction survivors afterward, and
    a second compaction (single slot) is a no-op that reports the row
    count."""
    import os

    from sifter_mrc_search_engine_spark.streaming.stateful import (
        compact_lsh_store,
        stream_near_dup,
    )

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def cyc(r):
        return " ".join(["alpha", "beta", "gamma"] * r)

    uniq = lambda i: " ".join(f"tok{i}x{j}" for j in range(8))
    chunks = ([(10, cyc(2)), (30, uniq(0))], [(50, uniq(1))])
    for c, rows in enumerate(chunks):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{in_dir}/chunk={c}")
    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )
    before = {
        (r["band"], r["bkey"], r["doc_id"])
        for r in spark.read.parquet(f"{out}/lsh_buckets").select(
            "band", "bkey", "doc_id"
        ).collect()
    }

    # missing store: 0, no crash
    assert compact_lsh_store(spark, str(tmp_path / "nowhere")) == 0

    n = compact_lsh_store(spark, out)
    assert n == len(before)
    dirs = sorted(
        d for d in os.listdir(f"{out}/lsh_buckets") if d.startswith("batch=")
    )
    assert dirs == ["batch=-1"]
    after = {
        (r["band"], r["bkey"], r["doc_id"])
        for r in spark.read.parquet(f"{out}/lsh_buckets").select(
            "band", "bkey", "doc_id"
        ).collect()
    }
    assert after == before

    # single-slot store: no-op, same count
    assert compact_lsh_store(spark, out) == n
    assert sorted(
        d for d in os.listdir(f"{out}/lsh_buckets") if d.startswith("batch=")
    ) == ["batch=-1"]

    # the compacted slot still gates: a near-dup of survivor 10 arriving
    # in a NEW batch is blocked
    spark.createDataFrame(
        [(60, cyc(5)), (70, uniq(2))], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/chunk=2")
    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )
    got = {r["doc_id"] for r in spark.read.parquet(f"{out}/docs").collect()}
    assert got == {10, 30, 50, 70}


def test_compaction_sentinel_blocks_gate(spark, tmp_path):
    """The _COMPACTING sentinel (written while compact_lsh_store folds,
    removed on success) makes the streaming gate REFUSE batches: a gate
    running concurrently with a compaction could write a batch
    partition the compaction deletes without folding. Success path
    leaves no sentinel; a planted sentinel fails the stream loudly."""
    import pyspark.errors

    from sifter_mrc_search_engine_spark.functions import fsio
    from sifter_mrc_search_engine_spark.streaming.stateful import (
        compact_lsh_store,
        stream_near_dup,
    )

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    uniq = lambda i: " ".join(f"tok{i}x{j}" for j in range(8))
    for c in range(2):
        spark.createDataFrame(
            [(10 * c + 1, uniq(c))], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/chunk={c}")
    stream_near_dup(
        spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
    )
    compact_lsh_store(spark, out)
    # success removes the sentinel
    assert not fsio.exists(fsio.join(out, "_COMPACTING"), spark)

    # a crashed compaction leaves the sentinel -> the gate refuses
    fsio.write_text(fsio.join(out, "_COMPACTING"), "1", spark)
    spark.createDataFrame(
        [(99, uniq(9))], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/chunk=2")
    import pytest as _pytest

    with _pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException):
        stream_near_dup(
            spark, f"{in_dir}/chunk=*", out, ckpt, max_files_per_trigger=1
        )
    fsio.delete(fsio.join(out, "_COMPACTING"), spark)
