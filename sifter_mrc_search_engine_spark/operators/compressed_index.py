"""Compressed inverted-index build: occurrences -> salted encode -> bucketed table.

Fresh-build pipeline (SURVEY.md §7 steps 5-6; reshaped in the r6
optimization round):

  docs ──(one scan)──▶ (doc_id, doc_len, term)  token occurrences
       ──▶ groupBy(term, segment) collect       [shuffle 1: token stream]
       ──▶ vectorized encoder: per-doc tf (numpy sort+run-length),
           exact BM25 impacts, varbyte + block-max
       ──▶ repartition(bucket) + (bucket, term) df window [shuffle 2: blobs]
       ──▶ (term, bucket, segment, df, n, max_impact, gaps, tfs, skips, blockmax)

Two exchanges end to end; re-encoding from an EXISTING tf aggregate
(streaming compaction, fielded builds) goes through :func:`encode_tf`,
which adds the (term, doc_id) aggregate exchange its input requires.

Skew defense: terms whose df exceeds SALT_THRESHOLD are split into
SALT_FANOUT doc-id RANGE segments (ranges are disjoint and ordered, so the
segments of a term concatenate back into one sorted posting list — no
re-encode at merge). Everything else is segment 0. The hot-term set is a
tiny driver-collected sample, computed CONCURRENTLY with the doclens
sidecar job by the resumable builder (Zipf head is small by definition).

Scale notes (100 TB): the doc_len rides the tokenize scan (``size(tokens)``
per row) so no doc_id-keyed shuffle is ever needed; df for non-hot terms is
computed inside the encoder group (group size == df); only the Zipf head
needs the sampled decision. Block-max impact bounds are exact at build time
because avgdl/N are fixed by the corpus stats that precede encoding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..constants import BLOCK_SIZE, BM25_B, BM25_K1, SALT_FANOUT, SALT_THRESHOLD, TERM_BUCKETS
from .index_build import term_bucket_expr
from .postings_codec import encode_postings
from ..functions.analyzer import tokenize_expr

INDEX_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("segment", IntegerType(), False),
        StructField("df", LongType(), False),
        StructField("n", LongType(), False),
        StructField("block_size", IntegerType(), False),
        StructField("min_doc", LongType(), False),
        StructField("max_doc", LongType(), False),
        StructField("max_impact", DoubleType(), False),
        StructField("gaps", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("skips", BinaryType(), False),
        StructField("blockmax", BinaryType(), False),
        # weight-free per-block max tf: lets field-weighted scorers (BM25F)
        # bound blocks for ANY query-time weights (blockmax impacts cannot)
        StructField("blockmaxtf", BinaryType(), False),
    ]
)


#: default driver-memory budget for the preload serving tiers (4 GiB):
#: generous for the serving-head indexes preload is FOR, far below the
#: point where a collect() of a 10^12-doc index would OOM the driver
DEFAULT_PRELOAD_BUDGET_BYTES = 4 << 30


class PreloadBudgetExceeded(RuntimeError):
    """Raised instead of letting ``collect()`` OOM the driver."""


def estimate_collect_bytes(df: DataFrame) -> int:
    """Driver-memory estimate for ``df.collect()``: one column-pruned
    aggregate summing every variable-width payload plus a per-row,
    per-field object overhead. Binary/string columns are measured with
    ``octet_length``; nested columns (array/map/struct — a silent
    near-zero estimate there would defeat the guard) through their JSON
    serialization, a same-order proxy for the collected Row objects.
    Deliberately cheap relative to the collect it guards (an agg
    streams; a collect materializes)."""
    from pyspark.sql.types import (
        ArrayType as _A,
        BinaryType as _B,
        MapType as _M,
        StringType as _S,
        StructType as _T,
    )

    blob = F.lit(0).cast("long")
    for fld in df.schema.fields:
        if isinstance(fld.dataType, (_B, _S)):
            blob = blob + F.coalesce(
                F.octet_length(F.col(fld.name)).cast("long"), F.lit(0)
            )
        elif isinstance(fld.dataType, (_A, _M, _T)):
            blob = blob + F.coalesce(
                F.octet_length(F.to_json(F.col(fld.name))).cast("long"),
                F.lit(0),
            )
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(blob).alias("b")
    ).collect()[0]
    n, b = int(row["n"] or 0), int(row["b"] or 0)
    # ~24 bytes per scalar field (Python object + Row slot) + 64/row
    return n * (24 * len(df.schema.fields) + 64) + b


def check_preload_budget(
    df: DataFrame, what: str, budget_bytes: int | None
) -> int:
    """Refuse a driver preload whose estimated size exceeds the budget —
    at 10^12-doc scale ``preload=True`` on a full index is an OOM, and
    the right failure is a clear error naming the knob, not a dead JVM.
    ``budget_bytes=None`` disables the check (caller takes the risk).
    Returns the estimate so a constructor making SEVERAL collects can
    charge them against one budget (pass ``budget - spent_so_far``)."""
    if budget_bytes is None:
        return 0
    est = estimate_collect_bytes(df)
    if est > budget_bytes:
        raise PreloadBudgetExceeded(
            f"refusing to preload {what}: estimated {est:,} bytes of driver "
            f"memory exceeds the remaining {budget_bytes:,}-byte budget. "
            f"Serve this index with preload off (bucket-pruned scans / "
            f"norms='join'), or raise preload_budget_bytes if the driver "
            f"really has the headroom."
        )
    return est


_LAST_TF: DataFrame | None = None


def release_build_cache() -> None:
    """Unpersist the tf intermediate of the most recent build."""
    global _LAST_TF
    if _LAST_TF is not None:
        _LAST_TF.unpersist()
        _LAST_TF = None


def tf_doclen(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(term, doc_id, tf, doc_len)`` in ONE scan + ONE shuffle.

    doc_len rides along from the tokenize expression instead of a separate
    doc_id-keyed join — at scale this removes the single biggest shuffle.

    The tokenize array is projected ONCE below the explode: putting
    ``size(tokenize(text))`` in the same select as the explode made the
    post-Generate projection re-run the regexp against the retained
    ``text`` for every TOKEN row (~avgdl regexp evaluations per doc,
    confirmed in the r5 physical plan) instead of once per doc.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize_expr(text_col).alias("_tk"))
    rows = toks.select(
        "doc_id",
        F.size("_tk").cast("long").alias("doc_len"),
        F.explode("_tk").alias("term"),
    )
    # min == the value (doc_len is constant per doc_id); partial_min is a
    # plain scalar partial agg where partial_first drags a valueSet slot
    # through the exchange
    return rows.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.min("doc_len").alias("doc_len")
    )


def build_compressed_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = TERM_BUCKETS,
    salt_threshold: int = SALT_THRESHOLD,
    salt_fanout: int = SALT_FANOUT,
    k1: float = BM25_K1,
    b: float = BM25_B,
    block_size: int = BLOCK_SIZE,
    stats: tuple[int, float] | None = None,
    persist_tf: bool = False,
    only_buckets: "Sequence[int] | None" = None,
    hot: "tuple[list, int] | None" = None,
) -> DataFrame:
    """Return the compressed index DataFrame (INDEX_SCHEMA).

    ``stats`` = (n_docs, avgdl) if the caller already knows them (the
    resumable build derives them from the doclens sidecar — saves a scan).

    ``persist_tf``: cache the tf aggregate between the hot-term pass and
    the encoder — this takes the two-shuffle :func:`encode_tf` route so
    the persisted frame is reusable. Default OFF: the fresh-build path
    goes through :func:`encode_token_occurrences`, which groups RAW
    token occurrences straight into (term, segment) encoder groups and
    computes tf inside the (vectorized numpy) encoder — ONE shuffle of
    the token stream instead of the tf aggregate's exchange plus the
    encoder regroup (guide §2.4: two operations keyed compatibly share
    one exchange; the per-group sort/run-length is noise next to a full
    extra exchange).
    """
    spark = docs.sparkSession
    if stats is None:
        stats_row = (
            docs.select(F.size(tokenize_expr(text_col)).cast("long").alias("dl"))
            .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
            .collect()[0]
        )
        n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"])
    else:
        n_docs, avgdl = int(stats[0]), float(stats[1])

    if persist_tf:
        from pyspark import StorageLevel

        tf = tf_doclen(docs, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
        global _LAST_TF
        _LAST_TF = tf
        return encode_tf(
            tf, n_docs, avgdl,
            buckets=buckets, salt_threshold=salt_threshold, salt_fanout=salt_fanout,
            k1=k1, b=b, block_size=block_size, only_buckets=only_buckets, hot=hot,
        )

    if hot is None:
        hot = sample_hot_terms(tf_doclen(docs, id_col, text_col), salt_threshold)
    return encode_token_occurrences(
        docs, n_docs, avgdl, id_col=id_col, text_col=text_col,
        buckets=buckets, salt_fanout=salt_fanout,
        k1=k1, b=b, block_size=block_size, only_buckets=only_buckets, hot=hot,
    )


def sample_hot_terms(
    tf: DataFrame, salt_threshold: int = SALT_THRESHOLD, sample_mod: int = 16
) -> tuple[list, int]:
    """Zipf-head detection on a deterministic 1/``sample_mod`` doc-hash
    sample of a ``(term, doc_id, ...)`` frame: ``(hot_terms,
    max_doc_global)``. The salting DECISION only needs approximate dfs
    (salting is a load-balancing choice, never a correctness one: exact
    df comes from the post-encode window sum, and encode-time impact
    bounds use segment-local df which can only OVERestimate idf, keeping
    every block-max a valid upper bound). Split out of :func:`encode_tf`
    so builders can run it CONCURRENTLY with the doclens-sidecar job
    (two independent actions back-fill one another's stragglers) and
    pass the result in via ``hot=``."""
    rows = (
        tf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(sample_mod)) == 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_s"), F.max("doc_id").alias("max_doc"))
        .filter(F.col("df_s") > salt_threshold // sample_mod)
        .collect()
    )
    hot_terms = [r["term"] for r in rows]
    max_doc_global = max((int(r["max_doc"]) for r in rows), default=0)
    return hot_terms, max_doc_global


def encode_tf(
    tf: DataFrame,
    n_docs: int,
    avgdl: float,
    buckets: int = TERM_BUCKETS,
    salt_threshold: int = SALT_THRESHOLD,
    salt_fanout: int = SALT_FANOUT,
    k1: float = BM25_K1,
    b: float = BM25_B,
    block_size: int = BLOCK_SIZE,
    with_impacts: bool = True,
    only_buckets: "Sequence[int] | None" = None,
    hot: "tuple[list, int] | None" = None,
) -> DataFrame:
    """Encode a ``(term, doc_id, tf, doc_len)`` aggregate into the
    compressed index (INDEX_SCHEMA). Shared by the batch builder and the
    streaming compactor.

    Physical strategy (measured ~2x over grouped applyInPandas): the
    grouping, the doc_id sort, and the field extraction all happen
    JVM-side (``array_sort(collect_list(struct(...)))`` + ``transform``)
    so Arrow ships three plain int arrays per (term, segment) row to ONE
    scalar pandas UDF that does only the numpy codec work.

    ``with_impacts=False`` skips the per-posting BM25 impact math AND the
    doc_len column entirely (tf may omit it): blockmax/max_impact are
    stored as zeros. Fielded (BM25F) indexes use this — their pruning
    runs on the weight-free ``blockmaxtf``, impact bounds under fixed
    per-field stats would be dead weight in the shuffle and the UDF.

    ``only_buckets`` prunes to the given term buckets BEFORE the encode
    grouping — a resumed build never re-collects or re-encodes postings
    of already-landed buckets (the r5 shape encoded everything and
    filtered afterwards).

    The returned frame is REPARTITIONED BY ``bucket`` with the exact-df
    window evaluated over (bucket, term) on top of that partitioning:
    ``HashPartitioning(bucket)`` satisfies the window's clustering
    because a term lives in exactly one bucket, so the window adds no
    exchange, and writers can ``partitionBy("bucket")`` without another
    shuffle — three exchanges end to end (tf agg, (term, segment)
    regroup, bucket) where the r5 plan had four (the window-on-term spec
    re-shuffled every encoded blob before the write's repartition).
    """
    spark = tf.sparkSession

    if hot is None:
        hot = sample_hot_terms(tf, salt_threshold)
    hot_terms, max_doc_global = hot
    seg_range = max(1, (max_doc_global + 1 + salt_fanout - 1) // salt_fanout)

    if hot_terms:
        hot_col = F.col("term").isin(hot_terms)
        seg = F.when(hot_col, (F.col("doc_id") / F.lit(seg_range)).cast("int")).otherwise(0)
    else:
        seg = F.lit(0)
    tf_seg = tf.withColumn("segment", seg)
    if only_buckets is not None and len(set(only_buckets)) < buckets:
        tf_seg = tf_seg.filter(
            term_bucket_expr("term", buckets).isin(sorted(set(only_buckets)))
        )

    post_struct = (
        F.struct("doc_id", "tf", "doc_len") if with_impacts else F.struct("doc_id", "tf")
    )
    grouped = tf_seg.groupBy("term", "segment").agg(
        F.count(F.lit(1)).alias("df_local"),
        F.array_sort(F.collect_list(post_struct)).alias("posts"),
    )
    array_cols = [
        F.transform("posts", lambda s: s["doc_id"]).alias("doc_ids"),
        F.transform("posts", lambda s: s["tf"]).alias("tf_arr"),
    ]
    if with_impacts:
        array_cols.append(F.transform("posts", lambda s: s["doc_len"]).alias("dl_arr"))
    arrays = grouped.select("term", "segment", "df_local", *array_cols)

    enc_type = StructType(
        [
            StructField("n", LongType(), False),
            StructField("max_impact", DoubleType(), False),
            StructField("gaps", BinaryType(), False),
            StructField("tfs", BinaryType(), False),
            StructField("skips", BinaryType(), False),
            StructField("blockmax", BinaryType(), False),
            StructField("blockmaxtf", BinaryType(), False),
        ]
    )

    from pyspark.sql.functions import pandas_udf

    cols = ["n", "max_impact", "gaps", "tfs", "skips", "blockmax", "blockmaxtf"]

    if with_impacts:

        @pandas_udf(enc_type)
        def enc_udf(
            terms: pd.Series, doc_ids: pd.Series, tf_arr: pd.Series,
            dl_arr: pd.Series, df_local: pd.Series,
        ) -> pd.DataFrame:
            out = []
            for term, ids, tfs, dls, dfl in zip(terms, doc_ids, tf_arr, dl_arr, df_local):
                ids = np.asarray(ids, dtype=np.int64)
                tfs_np = np.asarray(tfs, dtype=np.int64)
                dls_np = np.asarray(dls, dtype=np.float64)
                # segment-local df <= true df -> idf here >= true idf, so the
                # stored impact bounds remain valid upper bounds for WAND;
                # the exact df for SCORING is the window sum applied below
                df_total = int(dfl)
                idf = np.log(1.0 + (n_docs - df_total + 0.5) / (df_total + 0.5))
                tf_f = tfs_np.astype(np.float64)
                impacts = idf * tf_f * (k1 + 1.0) / (tf_f + k1 * ((1.0 - b) + (b * dls_np) / avgdl))
                e = encode_postings(ids, tfs_np, impacts, block_size)
                out.append(tuple(e[c] for c in cols))
            return pd.DataFrame(out, columns=cols)

        enc_col = enc_udf("term", "doc_ids", "tf_arr", "dl_arr", "df_local")
    else:

        @pandas_udf(enc_type)
        def enc_udf_plain(
            doc_ids: pd.Series, tf_arr: pd.Series
        ) -> pd.DataFrame:
            out = []
            for ids, tfs in zip(doc_ids, tf_arr):
                e = encode_postings(
                    np.asarray(ids, dtype=np.int64),
                    np.asarray(tfs, dtype=np.int64),
                    impacts=None,
                    block_size=block_size,
                )
                out.append(tuple(e[c] for c in cols))
            return pd.DataFrame(out, columns=cols)

        enc_col = enc_udf_plain("doc_ids", "tf_arr")

    encoded = arrays.select(
        "term",
        term_bucket_expr("term", buckets).alias("bucket"),
        "segment",
        "df_local",
        F.element_at("doc_ids", 1).alias("min_doc"),
        F.element_at("doc_ids", -1).alias("max_doc"),
        enc_col.alias("e"),
    )
    return _finalize_encoded(encoded, block_size)


def encode_token_occurrences(
    docs: DataFrame,
    n_docs: int,
    avgdl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = TERM_BUCKETS,
    salt_fanout: int = SALT_FANOUT,
    k1: float = BM25_K1,
    b: float = BM25_B,
    block_size: int = BLOCK_SIZE,
    only_buckets: "Sequence[int] | None" = None,
    hot: "tuple[list, int] | None" = None,
) -> DataFrame:
    """Fresh-build encoder: RAW token occurrences grouped straight into
    (term, segment) encoder groups; the per-doc tf aggregation happens
    INSIDE the encoder as a vectorized numpy sort + run-length instead
    of a separate (term, doc_id) shuffle — the whole tokenize→encode
    pipeline pays ONE exchange of the token stream (plus the bucket
    exchange of the encoded blobs) where :func:`encode_tf` over
    :func:`tf_doclen` pays two. Output is INDEX_SCHEMA, bit-identical
    postings (sorted doc_ids, identical tfs/impacts/blockmax), and the
    same bucket partitioning contract.

    ``hot`` is REQUIRED here (callers sample it concurrently with the
    doclens job): occurrence-level rows cannot reuse the pair-counting
    sampler directly.
    """
    if hot is None:
        raise ValueError("encode_token_occurrences needs a sampled hot set")
    hot_terms, max_doc_global = hot
    seg_range = max(1, (max_doc_global + 1 + salt_fanout - 1) // salt_fanout)

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_expr(text_col).alias("_tk")
    )
    rows = toks.select(
        "doc_id",
        F.size("_tk").cast("long").alias("doc_len"),
        F.explode("_tk").alias("term"),
    )
    if hot_terms:
        seg = F.when(
            F.col("term").isin(hot_terms),
            (F.col("doc_id") / F.lit(seg_range)).cast("int"),
        ).otherwise(0)
    else:
        seg = F.lit(0)
    rows = rows.withColumn("segment", seg)
    if only_buckets is not None and len(set(only_buckets)) < buckets:
        rows = rows.filter(
            term_bucket_expr("term", buckets).isin(sorted(set(only_buckets)))
        )
    grouped = rows.groupBy("term", "segment").agg(
        F.collect_list(F.struct("doc_id", "doc_len")).alias("occs")
    )
    arrays = grouped.select(
        "term",
        "segment",
        F.transform("occs", lambda s: s["doc_id"]).alias("occ_ids"),
        F.transform("occs", lambda s: s["doc_len"]).alias("occ_dls"),
    )

    enc_type = StructType(
        [
            StructField("df_local", LongType(), False),
            StructField("n", LongType(), False),
            StructField("max_impact", DoubleType(), False),
            StructField("gaps", BinaryType(), False),
            StructField("tfs", BinaryType(), False),
            StructField("skips", BinaryType(), False),
            StructField("blockmax", BinaryType(), False),
            StructField("blockmaxtf", BinaryType(), False),
        ]
    )
    from pyspark.sql.functions import pandas_udf

    cols = ["n", "max_impact", "gaps", "tfs", "skips", "blockmax", "blockmaxtf"]

    @pandas_udf(enc_type)
    def enc_occ_udf(occ_ids: pd.Series, occ_dls: pd.Series) -> pd.DataFrame:
        out = []
        for ids, dls in zip(occ_ids, occ_dls):
            ids = np.asarray(ids, dtype=np.int64)
            dls = np.asarray(dls, dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids_s = ids[order]
            uids, starts, counts = np.unique(
                ids_s, return_index=True, return_counts=True
            )
            tfs_np = counts.astype(np.int64)
            udls = dls[order][starts].astype(np.float64)
            df_total = int(uids.size)
            idf = np.log(1.0 + (n_docs - df_total + 0.5) / (df_total + 0.5))
            tf_f = tfs_np.astype(np.float64)
            impacts = (
                idf * tf_f * (k1 + 1.0)
                / (tf_f + k1 * ((1.0 - b) + (b * udls) / avgdl))
            )
            e = encode_postings(uids, tfs_np, impacts, block_size)
            out.append((df_total, *(e[c] for c in cols)))
        return pd.DataFrame(out, columns=["df_local"] + cols)

    # `e` referenced twice below (df_local + the struct) — the two-step
    # projection keeps the UDF evaluated once (multi-referenced aliases
    # are not collapsed)
    enc = arrays.withColumn("e", enc_occ_udf("occ_ids", "occ_dls"))
    encoded = enc.select(
        "term",
        term_bucket_expr("term", buckets).alias("bucket"),
        "segment",
        F.col("e.df_local").alias("df_local"),
        F.array_min("occ_ids").alias("min_doc"),
        F.array_max("occ_ids").alias("max_doc"),
        "e",
    )
    return _finalize_encoded(encoded, block_size)



def _finalize_encoded(pre: "DataFrame", block_size: int) -> DataFrame:
    """Shared encoder tail: repartition by ``bucket``, exact-df window
    over (bucket, term) — no exchange on top of the bucket partitioning
    (a term lives in one bucket) — and the INDEX_SCHEMA projection.
    ``pre`` needs columns (term, bucket, segment, df_local, min_doc,
    max_doc, e{n, max_impact, gaps, tfs, skips, blockmax, blockmaxtf}).
    The ONE copy of the layout/partitioning contract both encoders and
    the writers rely on."""
    from pyspark.sql import Window

    out = pre.repartition("bucket")
    df_col = F.sum("df_local").over(Window.partitionBy("bucket", "term"))
    return out.select(
        "term",
        "bucket",
        F.col("segment").cast("int").alias("segment"),
        df_col.cast("long").alias("df"),
        F.col("e.n").alias("n"),
        F.lit(block_size).cast("int").alias("block_size"),
        F.col("min_doc").cast("long").alias("min_doc"),
        F.col("max_doc").cast("long").alias("max_doc"),
        F.col("e.max_impact").alias("max_impact"),
        F.col("e.gaps").alias("gaps"),
        F.col("e.tfs").alias("tfs"),
        F.col("e.skips").alias("skips"),
        F.col("e.blockmax").alias("blockmax"),
        F.col("e.blockmaxtf").alias("blockmaxtf"),
    )


def decode_index_df(
    index_df: DataFrame, keep_cols: tuple[str, ...] = ("term", "df")
) -> DataFrame:
    """Distributed decode of INDEX_SCHEMA rows back to tf rows:
    ``(*keep_cols, doc_id, tf)``.

    Each encoded (term, segment) row is decoded exactly once inside a
    scalar pandas UDF, then exploded JVM-side — the inverse of
    :func:`encode_tf`, running on executors (never ``collect()``s
    postings to the driver). Shared by the segment compactor and the
    relational batch scorer.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    from .postings_codec import decode_postings

    dec_type = StructType(
        [
            StructField("doc_ids", ArrayType(LongType()), False),
            StructField("tfs_arr", ArrayType(LongType()), False),
        ]
    )

    @pandas_udf(dec_type)
    def decode_udf(
        gaps: pd.Series, tfs: pd.Series, n: pd.Series, skips: pd.Series, bs: pd.Series
    ) -> pd.DataFrame:
        out_ids, out_tfs = [], []
        for g, t, nn, sk, b in zip(gaps, tfs, n, skips, bs):
            ids, tf = decode_postings(
                gaps=bytes(g), tfs=bytes(t), n=int(nn), skips=bytes(sk), block_size=int(b)
            )
            out_ids.append(ids.tolist())
            out_tfs.append(tf.tolist())
        return pd.DataFrame({"doc_ids": out_ids, "tfs_arr": out_tfs})

    return (
        index_df.select(
            *keep_cols,
            decode_udf("gaps", "tfs", "n", "skips", "block_size").alias("d"),
        )
        .select(*keep_cols, F.explode(F.arrays_zip("d.doc_ids", "d.tfs_arr")).alias("p"))
        .select(
            *keep_cols,
            F.col("p.doc_ids").alias("doc_id"),
            F.col("p.tfs_arr").alias("tf"),
        )
    )


def write_index(index_df: DataFrame, path: str) -> None:
    """Persist partitioned by bucket — query-time term lookups prune to the
    buckets of the query's terms (partition pruning on the filter); rows
    term-sorted within files so parquet row-group stats prune further.

    ``encode_tf`` output is already hash-partitioned by bucket, so no
    repartition here; the in-partition sort leads with ``bucket`` so the
    dynamic-partition writer's required ordering is satisfied and it
    inserts no extra sort of its own."""
    (
        index_df.sortWithinPartitions("bucket", "term", "segment")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_doclens(docs: DataFrame, path: str, id_col="doc_id", text_col="text") -> dict:
    """Sidecar norms table ``(doc_id, doc_len)`` + corpus stats.

    At 10^12-doc scale this is range-partitioned by doc_id and memory-mapped
    per executor (Lucene-norms style); here one parquet dir. Returns stats.
    """
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_expr(text_col)).cast("long").alias("doc_len"),
    )
    dl.write.mode("overwrite").parquet(path)
    spark = docs.sparkSession
    row = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return {"n_docs": int(row["n_docs"]), "avgdl": float(row["avgdl"])}
