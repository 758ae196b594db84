"""More-like-this: find documents similar to a given document.

The standard fulltext-engine companion query (Lucene/Elasticsearch MLT):
rank the source document's terms by tf·idf, take the ``n_terms``
strongest as a query, BM25-score the corpus with them, exclude the
source document. The reference's front door only takes free-text
questions (modules/mrc_service/search_functions.py:82-97); MLT is the
"related documents" affordance a production fulltext tier adds on the
same machinery.

Determinism contract: term selection orders by the 9-dp ROUNDED tf·idf
(ties term asc) in BOTH the engine and the DuckDB twin — full-precision
float ordering could diverge in the last ULP between the JVM and DuckDB
``ln`` implementations (same recipe as the similarity twins' rounded
cosine ordering).

Scale posture: the term-selection subplan touches one document's terms
(a broadcast semi-join prunes the df aggregate to them) and collects at
most ``n_terms`` strings to the driver — bounded by a user knob, not by
data size; scoring is the ordinary query-term-pruned BM25 plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import BM25_B, BM25_K1, DEFAULT_TOP_K
from .bm25 import idf_expr
from .index_build import corpus_stats, doc_lengths, term_frequencies


def more_like_this_topk(
    docs: DataFrame,
    doc_id: int,
    n_terms: int = 10,
    top_k: int = DEFAULT_TOP_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k ``(doc_id, score)`` most similar to document ``doc_id``
    (excluded from results). Unknown ids return the empty typed frame —
    "nothing is like a document that does not exist" is a result, not
    an error."""
    if n_terms < 1:
        raise ValueError("n_terms must be >= 1")
    spark = docs.sparkSession
    tf = term_frequencies(docs, id_col, text_col)
    dl = doc_lengths(docs, id_col, text_col)
    stats = corpus_stats(dl)

    src = tf.filter(F.col("doc_id") == doc_id)
    dfreq = (
        tf.join(F.broadcast(src.select("term")), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    sel = (
        src.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.round(
                F.col("tf").cast("double") * idf_expr("df", "n_docs"), 9
            ).alias("w"),
        )
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(n_terms)
    )
    terms = sorted(r["term"] for r in sel.collect())
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    # scoring tail = the shared no-explode per-doc BM25 plan (two
    # tokenize scans, zero shuffles) instead of the r5 tf/df/doclen
    # aggregate chain — identical float64 fold, source doc excluded
    from .bm25 import bm25_topk_for_terms

    return bm25_topk_for_terms(
        docs, terms, top_k, id_col, text_col, k1, b, exclude_doc_id=doc_id
    )


def sql_more_like_this_topk(
    doc_id: int,
    n_terms: int = 10,
    top_k: int = DEFAULT_TOP_K,
    table: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`more_like_this_topk` — same 9-dp-rounded
    tf·idf term selection, same full-corpus BM25 scoring, same source
    exclusion."""
    if n_terms < 1:
        raise ValueError("n_terms must be >= 1")
    doc_id = int(doc_id)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS term
  FROM {table}
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS doc_len FROM {table}),
stats AS (SELECT count(*) AS n_docs, avg(doc_len) AS avgdl FROM dl),
dfreq AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM tf WHERE doc_id = {doc_id})
  GROUP BY 1
),
sel AS (
  SELECT tf.term
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
  WHERE tf.doc_id = {doc_id}
  ORDER BY round(tf.tf * ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)), 9) DESC,
           tf.term ASC
  LIMIT {n_terms}
),
contrib AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * dl.doc_len / stats.avgdl)) AS c
  FROM tf
  JOIN sel ON tf.term = sel.term
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.doc_id != {doc_id}
)
SELECT doc_id, round(sum(c), {round_to}) AS score
FROM contrib
GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC
LIMIT {top_k}
"""
