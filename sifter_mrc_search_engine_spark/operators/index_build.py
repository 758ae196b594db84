"""Inverted-index construction as declarative DataFrame plans.

The reference delegates indexing to an external engine
(reference: modules/mrc_service/search_functions.py:71-114); this module is
the native rebuild: tokenize -> posexplode -> tf/df/doclen aggregations ->
term-bucketed postings. Everything here is stock Catalyst (hash aggregates
with map-side partials, WholeStageCodegen expressions); the only Python is
the optional codec UDF applied downstream (operators/postings_codec.py).

Scale posture (100 TB): tokenization is a JVM regexp expression (no Python
in the scan stage); tf aggregation is a single shuffle on (term, doc_id)
with partial aggregation; postings assembly shuffles once more on
term-bucket. Hot terms (Zipf head) are salted above SALT_THRESHOLD so no
single reducer owns a stopword's full posting list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TERM_BUCKETS
from ..functions.analyzer import tokenize_expr


def combine_search_fields(docs: DataFrame, fields=("title", "content"), out_col: str = "text") -> DataFrame:
    """Concatenate the reference's ``searchField`` list into the indexed
    text (search_functions.py:92-95 searches [title, content]; BM25 over
    the concatenation preserves its single-score contract — the reference
    sets no per-field boosts). Missing/null fields contribute nothing."""
    present = [f for f in fields if f in docs.columns]
    # concat_ws skips NULLs natively — no empty-string padding artifacts
    expr = F.concat_ws(" ", *[F.col(f) for f in present])
    return docs.withColumn(out_col, expr)


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, term, pos)`` — one row per token occurrence.

    posexplode keeps positions (phrase/proximity-ready); the tokenizer is a
    pure Catalyst expression so the scan stage stays in codegen.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_expr(text_col)).alias("pos", "term"),
    )


def term_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(term, doc_id, tf)`` — partial+final hash agg, one shuffle."""
    return (
        tokens(docs, id_col, text_col)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, doc_len)`` — token count per document.

    Computed WITHOUT exploding: ``size(tokenize(text))`` is a per-row
    expression, so this is a scan-only plan (no shuffle at all).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_expr(text_col)).cast("long").alias("doc_len"),
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """``(term, df)`` from the tf table — reuses the (term, doc_id) grouping."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(doclen: DataFrame) -> DataFrame:
    """Single-row ``(n_docs, avgdl)``."""
    return doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )


def term_bucket_expr(term_col="term", buckets: int = TERM_BUCKETS):
    """Stable hash bucket for a term — the index partition key.

    Query-time partition pruning: a query's terms map to a handful of
    buckets, so the postings scan touches only those files (the DataFrame
    filter on ``bucket`` prunes parquet partitions)."""
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = TERM_BUCKETS,
) -> DataFrame:
    """Uncompressed postings: ``(term, bucket, df, postings array<struct>)``.

    ``postings`` is sorted by doc_id (array_sort on the struct sorts by the
    first field); this plan is the logical index — the compressed physical
    form is produced by ``postings_codec.encode_postings_df`` over the same
    grouping. Two shuffles total: (term, doc_id) tf agg, then term regroup.
    """
    tf = term_frequencies(docs, id_col, text_col)
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_sort(
                F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
            ).alias("postings"),
        )
        .withColumn("bucket", term_bucket_expr("term", buckets))
        .select("term", "bucket", "df", "postings")
    )
