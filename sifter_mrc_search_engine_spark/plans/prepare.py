"""Corpus preparation: the end-to-end training-data pipeline composition.

Chains the engine's data-quality operators into the standard pre-training
corpus flow — the reference runs the analogous extract→clean→filter chain
single-process (modules/lm_post_training/train.py:49-70); here it is one
declarative plan over the pages table:

    pages ──▶ extract (byte-identical cleaning, if html)      [Arrow UDF]
          ──▶ quality gate (length / alnum ratio / token min) [codegen]
          ──▶ optional language filter                        [codegen]
          ──▶ exact dedup (md5 min-keeper)                    [1 shuffle]
          ──▶ optional near-dup removal via MinHash-LSH       [1 shuffle]

Returns the surviving documents plus a one-row audit frame (counts per
stage) — a 100 TB pipeline needs the audit as much as the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import extract_html_udf
from ..functions.text_stats import lang_id, quality_scores
from ..operators.dedup import lsh_candidate_pairs


def prepare_corpus(
    docs: DataFrame,
    html_col: str | None = None,
    lang: str | None = None,
    near_dup: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_docs, audit). ``clean_docs`` has (doc_id, text).

    ``near_dup=True`` drops the higher-doc_id side of every MinHash-LSH
    candidate pair (transitively safe for dedup: keeps at least one doc
    of every near-dup cluster, the minimum-id representative of its
    pairwise links).
    """
    spark = docs.sparkSession
    counts = {"input": docs.count()}

    if html_col is not None:
        docs = docs.withColumn(text_col, extract_html_udf(F.col(html_col)))
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    q = quality_scores(base).select("doc_id", "is_quality")
    base = base.join(q, "doc_id").filter(F.col("is_quality")).drop("is_quality")
    counts["after_quality"] = base.count()

    if lang is not None:
        lid = lang_id(base).select("doc_id", "pred_lang")
        base = base.join(lid, "doc_id").filter(F.col("pred_lang") == lang).drop("pred_lang")
        counts["after_lang"] = base.count()

    keep = (
        base.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    base = base.join(keep, "doc_id")
    counts["after_exact_dedup"] = base.count()

    if near_dup:
        pairs = lsh_candidate_pairs(base)
        drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        base = base.join(drop, "doc_id", "left_anti")
        counts["after_near_dedup"] = base.count()

    audit = spark.createDataFrame(
        [tuple(counts.values())], ", ".join(f"{k} long" for k in counts)
    )
    return base, audit
