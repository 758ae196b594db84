"""Nested-JSON corpus extraction: the reference's ``data_DOM`` path walk.

Re-expresses ``Extractor.set_data_from_json`` (reference:
modules/lm_post_training/extractor.py:106-151) declaratively:

  * a path like ``document/*/paragraph/#/form`` navigates nested
    dict/list JSON; ``'#'`` flattens a list in place (≙ ``explode``),
    ``'*'`` marks the article boundary — one output row per element at
    that level, with everything below collected per article
  * an optional condition ``{branch, path, value}`` keeps only subtrees
    whose sibling path equals the value (extractor.py:100-104, :119-127)
    — a plain ``filter`` on the extracted column

The reference walks ``os.walk`` over a JSON directory (extractor.py:179-203)
≙ ``spark.read.json(dir, multiLine=True, recursiveFileLookup=True)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ARTICLE = "*"
FLATTEN = "#"


def read_json_corpus(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """S1: recursive JSON directory scan (extractor.py:154-203)."""
    return (
        spark.read.option("multiLine", multiline)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.json")
        .json(path)
    )


def extract_dom(
    df: DataFrame,
    data_dom: Sequence[str],
    condition: dict | None = None,
    split: bool = False,
) -> DataFrame:
    """Walk ``data_dom`` over a parsed-JSON DataFrame.

    Returns ``(article_id, sentences array<string>)`` — one row per
    article ('*' level, or per input file if no '*'), sentences fully
    flattened below it, matching the 2-level [article][sentence] shape of
    ``Extractor._data`` (extractor.py:13-15, :58-64).

    ``condition = {"path": [...], "value": v}`` filters articles whose
    sibling path equals ``v`` (the reference's branch/path/value triple,
    main.py:122-126); the path is resolved relative to the article level.
    """
    # STABLE file key: hash of (source file name, row payload) — NOT
    # monotonically_increasing_id, whose value depends on partition
    # layout and would make every downstream seeded draw (NSP coin /
    # negative pick hash on article_id) change across re-runs. Identical
    # payloads in different files stay distinct via input_file_name();
    # byte-identical rows in the SAME source are disambiguated by a
    # row_number within their hash group — which row gets which ordinal
    # is arbitrary but the rows are identical, so the output multiset is
    # deterministic under any partitioning (they must NOT collapse into
    # one article with doubled sentences).
    from pyspark.sql import Window

    payload_key = F.xxhash64(F.input_file_name(), F.to_json(F.struct(*df.columns)))
    cur = df.withColumn("_pk", payload_key).withColumn(
        "_file",
        F.xxhash64(
            F.col("_pk"),
            F.row_number().over(Window.partitionBy("_pk").orderBy("_pk")),
        ),
    ).drop("_pk")
    col: Column | None = None
    article_emitted = False
    consumed: list[str] = []

    for step in data_dom:
        if step == ARTICLE:
            # one row per element of the current array — the article level
            base = col if col is not None else F.col(consumed[-1])
            cur = cur.select(
                "_file", F.posexplode(base).alias("_apos", "_article")
            )
            col = F.col("_article")
            article_emitted = True
            if condition is not None:
                cond_col = col
                for p in condition["path"]:
                    cond_col = cond_col.getField(p)
                cur = cur.filter(cond_col == F.lit(condition["value"]))
        elif step == FLATTEN:
            # flatten a list in place: explode, keeping article identity
            keep = [c for c in cur.columns if not c.startswith("_x")]
            base = col if col is not None else F.col(consumed[-1])
            cur = cur.select(*keep, F.explode(base).alias("_x"))
            col = F.col("_x")
            # drop the exploded parent column reference
            cur = cur.withColumn("_cur", col).drop("_x")
            col = F.col("_cur")
        else:
            consumed.append(step)
            col = (col.getField(step)) if col is not None else F.col(step)

    if article_emitted:
        # combine via hash (a multiply-add overflows int64 for large
        # partition ids and collides past 1M articles/file)
        art_key = F.xxhash64(F.col("_file"), F.col("_apos"))
    else:
        art_key = F.col("_file").cast("long")
    out = cur.select(art_key.alias("article_id"), col.alias("sentence"))
    if split:
        # extractor.py:131-134: split each extracted string into sentences;
        # bind the CURRENT splitter by value so a driver-installed kss
        # genuinely runs on executors
        from ..functions.sentences import make_split_sentences_udf

        out = out.select(
            "article_id",
            F.explode(make_split_sentences_udf()(F.col("sentence"))).alias("sentence"),
        )
    return out.groupBy("article_id").agg(
        F.collect_list("sentence").alias("sentences")
    )


def extract_dom_json_strings(
    spark: SparkSession,
    json_strs: Sequence[str],
    data_dom: Sequence[str],
    schema: str,
    condition: dict | None = None,
) -> DataFrame:
    """Same walk over in-memory JSON strings (test fixture entry point):
    parse with an explicit schema, then ``extract_dom``."""
    df = spark.createDataFrame([(s,) for s in json_strs], "js string").select(
        F.from_json("js", schema).alias("root")
    ).select("root.*")
    return extract_dom(df, data_dom, condition)
