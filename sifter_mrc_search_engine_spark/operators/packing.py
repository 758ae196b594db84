"""Token-stream packing: lay the corpus out as one concatenated token
stream (doc_id order) and chunk it into fixed-size training sequences —
the GPT-style concatenate-then-chunk preprocessing step.

The core is a GLOBAL exclusive prefix sum of per-doc token counts. The
naive Spark spelling — ``sum() over (ORDER BY doc_id)`` with no
partition key — collapses the whole corpus into ONE task (the classic
window-function scale-killer). This module does the textbook two-phase
distributed scan instead:

  1. doc_id range boundaries are sampled ONCE (approxQuantile) and
     frozen as literals, so every subsequent job buckets rows
     identically — phase 1 and phase 2 cannot disagree the way two
     executions of ``repartitionByRange`` (which re-samples boundaries
     per job) can,
  2. per-bucket token totals (tiny: one row per bucket) collect to the
     driver and their exclusive running sum becomes each bucket's
     global OFFSET, and
  3. a window scan WITHIN each bucket (parallel across buckets) plus
     the broadcast offset yields the global prefix sum.

Where the frozen boundaries fall only affects load balance, never the
result — the output is a pure function of (doc_id, n_tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analyzer import tokenize_expr

__all__ = [
    "materialize_chunks",
    "pack_token_stream",
    "sql_materialize_chunks",
    "sql_pack_token_stream",
]


def pack_token_stream(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """``(doc_id, n_tokens, start_pos, first_chunk, last_chunk)`` —
    each doc's position in the concatenated token stream (docs in
    doc_id order) and the training chunks of size ``budget`` it lands
    in. Zero-token docs take no stream space: start_pos is where the
    next doc begins and first_chunk/last_chunk are -1.
    """
    spark = docs.sparkSession
    n_part = partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 2
    )
    t = docs.select(
        "doc_id", F.size(tokenize_expr(text_col)).cast("long").alias("n_tokens")
    )
    # freeze bucket boundaries as LITERALS (sampled once, one cheap job)
    # so phase 1 and phase 2 bucket rows identically; boundary placement
    # only affects balance, never values. Sampled from doc_id ALONE —
    # a column-pruned scan that never tokenizes
    qs = [i / n_part for i in range(1, n_part)]
    bounds = (
        sorted(set(docs.select("doc_id").stat.approxQuantile("doc_id", qs, 0.001)))
        if qs else []
    )
    pid_expr = F.lit(0)
    for b in bounds:
        pid_expr = pid_expr + (F.col("doc_id") > F.lit(int(b))).cast("int")
    t = t.withColumn("_pid", pid_expr)
    # phase 1: tiny per-bucket totals -> exclusive offsets (driver)
    sums = {
        r["_pid"]: int(r["s"])
        for r in t.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    off = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    # phase 2: within-bucket scan (parallel), plus the global offset
    w = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = (
        F.element_at(off, F.col("_pid")) + F.sum("n_tokens").over(w)
        - F.col("n_tokens")
    )
    out = t.select(
        "doc_id",
        "n_tokens",
        start.alias("start_pos"),
    )
    b = F.lit(int(budget))
    has = F.col("n_tokens") > 0
    return out.select(
        "doc_id",
        "n_tokens",
        "start_pos",
        F.when(has, F.floor(F.col("start_pos") / b))
        .otherwise(F.lit(-1)).cast("long").alias("first_chunk"),
        F.when(has, F.floor((F.col("start_pos") + F.col("n_tokens") - 1) / b))
        .otherwise(F.lit(-1)).cast("long").alias("last_chunk"),
    )


def materialize_chunks(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """Emit the actual fixed-size training sequences:
    ``(chunk_id, n_tokens, chunk_text)`` — every token of the
    concatenated stream lands in exactly one chunk, in stream order
    (chunk_text is the space-joined token run; the tail chunk may be
    short).

    This IS a token-level explode — deliberately: producing packed
    sequences is the one step that must touch every token, and the
    explode keys the single shuffle by chunk_id so each output sequence
    assembles on one reducer. Token order inside a chunk is restored by
    an array_sort on (global position, token) — deterministic, not
    shuffle-order-dependent.

    Cost note: one action tokenizes the corpus three times (the
    phase-1 bucket totals, the position plan's window input, and the
    explode). Collapsing to one pass needs the token arrays
    materialized (checkpoint/persist of corpus-sized state) — at 100 TB
    prefer writing ``docs.select(doc_id, tokens)`` to parquet once and
    feeding derived frames from there.
    """
    pos = pack_token_stream(docs, budget, text_col, partitions).select(
        "doc_id", "start_pos"
    )
    toks = docs.select(
        "doc_id", F.posexplode(tokenize_expr(text_col)).alias("idx", "term")
    )
    g = toks.join(pos, "doc_id").select(
        (F.col("start_pos") + F.col("idx")).alias("gpos"), "term"
    )
    b = F.lit(int(budget))
    return (
        g.select(F.floor(F.col("gpos") / b).alias("chunk_id"), "gpos", "term")
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gpos", "term"))),
                    lambda s: s["term"],
                ),
            ).alias("chunk_text"),
        )
    )


def sql_materialize_chunks(table: str = "documents", budget: int = 512) -> str:
    """DuckDB twin of :func:`materialize_chunks`."""
    toks = "regexp_extract_all(lower(text), '[a-z0-9가-힣]+')"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS tk FROM {table}),
scan AS (
  SELECT doc_id, tk,
         CAST(coalesce(sum(len(tk)) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_pos
  FROM t
),
g AS (
  SELECT scan.start_pos + u.i - 1 AS gpos, tk[u.i] AS term
  FROM scan, LATERAL unnest(range(1, len(tk) + 1)) AS u(i)
)
SELECT CAST(gpos // {budget} AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(term, ' ' ORDER BY gpos) AS chunk_text
FROM g
GROUP BY 1
"""


def sql_pack_token_stream(table: str = "documents", budget: int = 512) -> str:
    """DuckDB twin of :func:`pack_token_stream` (a plain global-order
    window is fine on the oracle's single node)."""
    toks = "len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+'))"
    return f"""
WITH t AS (SELECT doc_id, CAST({toks} AS BIGINT) AS n_tokens FROM {table}),
scan AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_pos
  FROM t
)
SELECT doc_id, n_tokens, start_pos,
       CAST(CASE WHEN n_tokens > 0
            THEN start_pos // {budget} ELSE -1 END AS BIGINT) AS first_chunk,
       CAST(CASE WHEN n_tokens > 0
            THEN (start_pos + n_tokens - 1) // {budget} ELSE -1 END AS BIGINT)
         AS last_chunk
FROM scan
"""
