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


def _positions_from_counts(
    counts: DataFrame,
    bounds_src: DataFrame,
    partitions: int | None,
) -> DataFrame:
    """The two-phase distributed exclusive prefix sum over a frame with
    ``doc_id`` and ``n_tokens`` columns -> adds ``start_pos``. Any extra
    columns (e.g. the token arrays) ride through on the SAME rows — the
    window needs no join to attach positions to payload.

    ``bounds_src`` supplies the doc_id sample for the frozen bucket
    boundaries (pass the raw source so the quantile job is a
    column-pruned scan that never tokenizes). The phase-1 totals
    aggregate is column-pruned by Catalyst, so extra payload columns
    cost nothing there.
    """
    spark = counts.sparkSession
    n_part = partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 2
    )
    # freeze bucket boundaries as LITERALS (sampled once, one cheap job)
    # so phase 1 and phase 2 bucket rows identically; boundary placement
    # only affects balance, never values
    qs = [i / n_part for i in range(1, n_part)]
    bounds = (
        sorted(set(bounds_src.select("doc_id").stat.approxQuantile("doc_id", qs, 0.001)))
        if qs else []
    )
    pid_expr = F.lit(0)
    for b in bounds:
        pid_expr = pid_expr + (F.col("doc_id") > F.lit(int(b))).cast("int")
    t = counts.withColumn("_pid", pid_expr)
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
    return t.select(*counts.columns, start.alias("start_pos"))


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
    counts = docs.select(
        "doc_id", F.size(tokenize_expr(text_col)).cast("long").alias("n_tokens")
    )
    out = _positions_from_counts(counts, docs, partitions)
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

    Two structural choices make this the plan that survives 100x
    (measured at 1.2M pages docs, local[32]: 3.3 s steady-state vs the
    r3 shape's 11.8 s — 3.6x):

    * **No positions join; two passes, not three.** Phase 1 is its own
      NARROW job (tokenize -> size -> per-bucket totals, 32 output
      rows); the returned plan then tokenizes once more and computes
      ``start_pos`` with the within-bucket window ON THE SAME ROWS that
      carry the token arrays — Catalyst inserts one ``_pid`` exchange
      for the window, and no doc_id sort-merge join ships every token
      byte a second time (the r3 shape tokenized 3x AND joined).
      Total: two tokenizes per action, zero joins, zero cached state —
      the operator stays a pure lazy DataFrame (persisting the token
      arrays instead was measured SLOWER cold: columnar-caching
      corpus-sized string arrays costs more than one extra tokenize).
    * **Shuffle pieces, not tokens.** A doc at stream position p with n
      tokens overlaps exactly chunks floor(p/B)..floor((p+n-1)/B), so
      each doc emits one SLICE of its token array per overlapped chunk
      (~1 + n/B rows) rather than one row per token (the r3 shape): the
      chunk-assembly shuffle carries the same text bytes in ~B-times
      fewer, fatter rows, and the reducer sorts ≤(B+1) pieces per chunk
      instead of B token structs. Piece order inside a chunk is
      restored by array_sort on (global position, piece) —
      deterministic, not shuffle-order-dependent.
    """
    counts = docs.select(
        "doc_id",
        tokenize_expr(text_col).alias("_tk"),
    ).withColumn("n_tokens", F.size("_tk").cast("long"))
    b = F.lit(int(budget))
    placed = (
        _positions_from_counts(counts, docs, partitions)
        .filter(F.col("n_tokens") > 0)
        .select(
            "_tk",
            F.col("start_pos").alias("p"),
            F.col("n_tokens").alias("n"),
        )
    )
    pieces = placed.select(
        "_tk", "p", "n",
        F.explode(
            F.sequence(
                F.floor(F.col("p") / b),
                F.floor((F.col("p") + F.col("n") - 1) / b),
            )
        ).alias("chunk_id"),
    ).select(
        "chunk_id",
        # local [lo, hi) token-index window of this doc inside the chunk
        F.greatest(F.col("chunk_id") * b - F.col("p"), F.lit(0)).alias("lo"),
        F.least(F.col("n"), (F.col("chunk_id") + 1) * b - F.col("p")).alias("hi"),
        "_tk", "p",
    ).select(
        "chunk_id",
        (F.col("p") + F.col("lo")).alias("gpos"),
        # pre-join the slice to ONE string per piece before the chunk
        # shuffle: a string serializes as one offset+buffer where the
        # token array pays per-element overhead, and the reducer then
        # concatenates strings instead of flattening arrays. Tokens
        # contain no spaces (analyzer alphabet), so join-then-concat ==
        # flatten-then-join byte-for-byte.
        (F.col("hi") - F.col("lo")).cast("long").alias("n_piece"),
        F.array_join(
            F.slice(
                "_tk",
                (F.col("lo") + 1).cast("int"),
                (F.col("hi") - F.col("lo")).cast("int"),
            ),
            " ",
        ).alias("piece"),
    )
    return pieces.groupBy("chunk_id").agg(
        F.sum("n_piece").cast("long").alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("gpos", "piece"))),
                lambda s: s["piece"],
            ),
        ).alias("chunk_text"),
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
