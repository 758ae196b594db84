"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-10 query at sf0.001;
``queries()``/``oracle_sql()`` pair every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.constants import BM25_B, BM25_K1
from sifter_mrc_search_engine_spark.operators import bm25, index_build

FLAGSHIP_QUESTION = "the fast query"
TOKEN_RE = "[a-z0-9가-힣]+"

_DUCK_TOKS = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS term "
    "FROM documents"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over documents at sf0.001 → (doc_id, score)."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    out = bm25.bm25_brute_force(docs, FLAGSHIP_QUESTION, top_k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_bm25(question: str, k: int = 10):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = bm25.bm25_brute_force(_docs(spark, sf_dir), question, top_k=k)
        return out.select("doc_id", F.round("score", 4).alias("score"))

    return run


def _q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_build.term_frequencies(_docs(spark, sf_dir))


def _q_doc_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = index_build.term_frequencies(_docs(spark, sf_dir))
    return index_build.doc_frequencies(tf)


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_build.doc_lengths(_docs(spark, sf_dir))


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dl = index_build.doc_lengths(_docs(spark, sf_dir))
    return index_build.corpus_stats(dl).select(
        "n_docs", F.round("avgdl", 6).alias("avgdl")
    )


def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings as (term, df, doc_ids array sorted) — SQL-expressible."""
    p = index_build.build_postings(_docs(spark, sf_dir))
    return p.select(
        "term",
        "df",
        F.transform("postings", lambda s: s["doc_id"]).alias("doc_ids"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_flagship": _q_bm25(FLAGSHIP_QUESTION),
        "bm25_topk_multi": _q_bm25("spark join merge table"),
        "bm25_topk_single": _q_bm25("window", 5),
        "index_term_frequencies": _q_term_frequencies,
        "index_doc_frequencies": _q_doc_frequencies,
        "index_doc_lengths": _q_doc_lengths,
        "index_corpus_stats": _q_corpus_stats,
        "index_postings_lists": _q_postings,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_flagship": bm25.bm25_oracle_sql(FLAGSHIP_QUESTION, 10),
        "bm25_topk_multi": bm25.bm25_oracle_sql("spark join merge table", 10),
        "bm25_topk_single": bm25.bm25_oracle_sql("window", 5),
        "index_term_frequencies": (
            f"SELECT term, doc_id, count(*) AS tf FROM ({_DUCK_TOKS}) GROUP BY 1, 2"
        ),
        "index_doc_frequencies": (
            "SELECT term, count(*) AS df FROM "
            f"(SELECT term, doc_id, count(*) AS tf FROM ({_DUCK_TOKS}) GROUP BY 1, 2) "
            "GROUP BY 1"
        ),
        "index_doc_lengths": (
            "SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS doc_len "
            "FROM documents"
        ),
        "index_corpus_stats": (
            "SELECT count(*) AS n_docs, round(avg(doc_len), 6) AS avgdl FROM "
            f"(SELECT doc_id, count(*) AS doc_len FROM ({_DUCK_TOKS}) GROUP BY 1)"
        ),
        "index_postings_lists": (
            "SELECT term, count(*) AS df, list(doc_id ORDER BY doc_id) AS doc_ids FROM "
            f"(SELECT term, doc_id FROM ({_DUCK_TOKS}) GROUP BY 1, 2) "
            "GROUP BY term"
        ),
    }
