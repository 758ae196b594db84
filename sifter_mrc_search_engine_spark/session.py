"""SparkSession factory with the engine's scale-oriented defaults.

Designed for a multi-executor cluster (AQE on, Arrow on, sensible shuffle
partitioning); in this sandbox it runs local[N]. All knobs live here so the
same code ships unchanged via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sifter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # local[N] -> N shuffle partitions keeps every core busy without
        # tiny-task overhead; on a real cluster pass an explicit value
        # (~2-3x total cores).
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if inner == "*" else max(int(inner), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 100 TB posture: don't let one file become one giant task
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # iterative operators (connected_components 'star') checkpoint
        # per round when a checkpoint dir is set: free superseded rounds
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def claim_session(app_name: str):
    """``(spark, owns)`` for spark-submit jobs that must not stop a
    session they did not create (in-process callers — tests, notebooks —
    keep theirs). ``getOrCreate()`` reuses the process-wide DEFAULT
    session even when no session is active on this thread, so ownership
    checks both; callers stop the session only when ``owns`` is True."""
    get_default = getattr(SparkSession, "getDefaultSession", None)
    default_session = (
        get_default() if callable(get_default)
        else getattr(SparkSession, "_instantiatedSession", None)
    )
    owns = SparkSession.getActiveSession() is None and default_session is None
    return SparkSession.builder.appName(app_name).getOrCreate(), owns
