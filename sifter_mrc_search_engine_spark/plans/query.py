"""Query lifecycle over a persisted index (SURVEY.md §3.1 Spark mapping).

analyze(question) -> bucket-pruned postings scan -> WAND kernel -> top-k.

The postings scan filters on BOTH the partition column ``bucket`` (parquet
partition pruning: only the query terms' bucket directories are listed) and
``term`` (row-group pruning via parquet min/max stats). A query touches a
handful of files regardless of index size — this is what makes the design
hold at 10^12 docs.

Doc lengths: loaded once per (process, index) into dense numpy arrays and
cached — the Lucene-norms analogue. At true 10^12 scale the norms sidecar
would be range-partitioned and memory-mapped per executor; the access
pattern (random lookups by doc_id during scoring) is identical.

Batch scoring (``search_many``) distributes queries across executors: each
query's postings rows are joined to it and the WAND kernel runs inside
``applyInPandas`` per query group.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..constants import DEFAULT_TOP_K, MAX_TOP_K, TERM_BUCKETS
from ..functions.analyzer import analyze
from ..functions.xxhash import term_bucket
from ..operators.index_build import term_bucket_expr
from ..operators.wand import wand_topk

_DOCLEN_CACHE: dict[str, tuple] = {}


def _load_norms(spark: SparkSession, index_dir: str):
    """(doclen lookup, n_docs, avgdl), cached.

    Dense numpy array when doc_ids are nonnegative and reasonably packed
    (fast vectorized lookups); dict fallback for sparse / hash-derived /
    negative id spaces.
    """
    if index_dir in _DOCLEN_CACHE:
        return _DOCLEN_CACHE[index_dir]
    stats = json.loads((Path(index_dir) / "stats.json").read_text())
    rows = spark.read.parquet(f"{index_dir}/doclens").collect()
    ids = [r["doc_id"] for r in rows]
    min_id, max_id = min(ids), max(ids)
    if min_id >= 0 and max_id < max(8 * len(ids), 1_000_000):
        dl = np.zeros(max_id + 1, dtype=np.int64)
        for r in rows:
            dl[r["doc_id"]] = r["doc_len"]
        out = (dl, int(stats["n_docs"]), float(stats["avgdl"]))
    else:
        out = (
            {r["doc_id"]: r["doc_len"] for r in rows},
            int(stats["n_docs"]),
            float(stats["avgdl"]),
        )
    _DOCLEN_CACHE[index_dir] = out
    return out


class IndexSearcher:
    """Serve BM25 top-k queries from a built index directory."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        buckets: int = TERM_BUCKETS,
        preload: bool = False,
    ):
        """``preload=True`` pulls the postings table into a driver-side
        term->rows dict — the low-latency serving mode (sub-ms routing, no
        Spark job per query). Appropriate while the hot index fits driver
        memory; at 10^12 docs serving runs against the bucket-pruned scan
        (default) or an external KV tier."""
        self.spark = spark
        self.index_dir = index_dir
        self.buckets = buckets
        self.postings = spark.read.parquet(f"{index_dir}/postings")
        self.doclen, self.n_docs, self.avgdl = _load_norms(spark, index_dir)
        self._mem: dict[str, list] | None = None
        if preload:
            self._mem = {}
            for r in self.postings.collect():
                self._mem.setdefault(r["term"], []).append(r)

    def candidate_rows(self, terms: Sequence[str]) -> list:
        """Postings fetch for a term set.

        Bucket routing is computed DRIVER-SIDE (functions/xxhash.py is
        bit-identical to the JVM xxhash64) so the pruned scan is the only
        Spark job a query pays; preloaded mode pays none.
        """
        tset = sorted(set(terms))
        if not tset:
            return []
        if self._mem is not None:
            return [r for t in tset for r in self._mem.get(t, [])]
        bks = sorted({term_bucket(t, self.buckets) for t in tset})
        return (
            self.postings.filter(F.col("bucket").isin(bks))
            .filter(F.col("term").isin(tset))
            .collect()
        )

    def search(self, question: str, top_k: int = DEFAULT_TOP_K) -> list[tuple[int, float]]:
        """The reference's GET /inference contract (server.py:62-75):
        top_k clamped to [1, MAX_TOP_K]; returns [(doc_id, score)] sorted
        (score desc, doc_id asc)."""
        top_k = max(1, min(int(top_k), MAX_TOP_K))
        terms = analyze(question)
        rows = self.candidate_rows(terms)
        return wand_topk(rows, terms, self.doclen, self.n_docs, self.avgdl, top_k=top_k)

    def search_many_local(
        self, questions: Sequence[str], top_k: int = DEFAULT_TOP_K
    ) -> list[list[tuple[int, float]]]:
        """Scatter-gather batch scoring on the driver: ONE bucket-pruned
        scan fetches the union of all queries' postings, then the
        vectorized kernels run per query locally. The right shape when the
        union of candidate lists fits one node (a serving head); the
        distributed ``search_many`` covers huge batches/indexes."""
        top_k = max(1, min(int(top_k), MAX_TOP_K))
        q_terms = [analyze(q) for q in questions]
        all_terms = sorted({t for ts in q_terms for t in ts})
        rows = self.candidate_rows(all_terms)
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        out = []
        for terms in q_terms:
            cand = [r for t in set(terms) for r in by_term.get(t, [])]
            out.append(
                wand_topk(cand, terms, self.doclen, self.n_docs, self.avgdl, top_k=top_k)
            )
        return out

    def search_many(self, questions: Sequence[str], top_k: int = DEFAULT_TOP_K) -> DataFrame:
        """Distributed batch scoring: one WAND kernel per query group.

        Returns DataFrame (query_id int, rank int, doc_id long, score
        double). Postings rows for ALL queries' terms are fetched with one
        pruned scan, joined to query ids, and grouped; norms ship as a
        broadcast (range-partitioned at real scale).
        """
        top_k = max(1, min(int(top_k), MAX_TOP_K))
        q_terms = {i: analyze(q) for i, q in enumerate(questions)}
        pairs = [(i, t) for i, ts in q_terms.items() for t in ts]
        if not pairs:
            return self.spark.createDataFrame(
                [], "query_id int, rank int, doc_id long, score double"
            )
        qdf = self.spark.createDataFrame(pairs, "query_id int, term string")
        buckets = [
            r["b"] for r in qdf.select(term_bucket_expr("term", self.buckets).alias("b")).distinct().collect()
        ]
        cand = self.postings.filter(F.col("bucket").isin(buckets)).join(
            F.broadcast(qdf), "term"
        )
        bc = self.spark.sparkContext.broadcast(
            (self.doclen, self.n_docs, self.avgdl, dict(q_terms))
        )
        k = top_k

        out_schema = StructType(
            [
                StructField("query_id", IntegerType(), False),
                StructField("rank", IntegerType(), False),
                StructField("doc_id", LongType(), False),
                StructField("score", DoubleType(), False),
            ]
        )

        def score_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
            qid = int(key[0])
            doclen, n_docs, avgdl, terms_map = bc.value
            rows = pdf.drop_duplicates(subset=["term", "segment"]).to_dict("records")
            hits = wand_topk(rows, terms_map[qid], doclen, n_docs, avgdl, top_k=k)
            return pd.DataFrame(
                {
                    "query_id": qid,
                    "rank": range(1, len(hits) + 1),
                    "doc_id": [d for d, _ in hits],
                    "score": [s for _, s in hits],
                }
            )

        return cand.groupBy("query_id").applyInPandas(score_group, out_schema)

    def search_many_relational(
        self, questions: Sequence[str], top_k: int = DEFAULT_TOP_K
    ) -> DataFrame:
        """Batch scoring as ONE relational plan over the compressed index.

        Each candidate posting segment is decoded exactly once (a pandas
        UDF explodes it back to (doc_id, tf) arrays); everything after —
        the BM25 contribution expression, the query fan-out join, the
        ascending-term score fold, the per-query top-k window — is JVM
        Catalyst, bit-identical to the brute-force oracle's float64 path.
        No WAND pruning: this is the throughput shape for query batches
        large enough that exhaustive scoring amortizes (offline eval runs,
        relevance-set generation), scaling with executors, not the driver.

        Returns (query_id int, rank int, doc_id long, score double).
        """
        from pyspark.sql import Window
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, LongType, StructField, StructType

        from ..constants import BM25_B, BM25_K1
        from ..operators.bm25 import idf_expr
        from ..operators.postings_codec import decode_postings

        top_k = max(1, min(int(top_k), MAX_TOP_K))
        q_terms = {i: analyze(q) for i, q in enumerate(questions)}
        pairs = [(i, t) for i, ts in q_terms.items() for t in sorted(set(ts))]
        if not pairs:
            return self.spark.createDataFrame(
                [], "query_id int, rank int, doc_id long, score double"
            )
        qdf = self.spark.createDataFrame(pairs, "query_id int, term string")
        all_terms = sorted({t for _, t in pairs})
        bks = sorted({term_bucket(t, self.buckets) for t in all_terms})
        cand = self.postings.filter(F.col("bucket").isin(bks)).filter(
            F.col("term").isin(all_terms)
        )

        dec_type = StructType(
            [
                StructField("doc_ids", ArrayType(LongType()), False),
                StructField("tfs_arr", ArrayType(LongType()), False),
            ]
        )

        @pandas_udf(dec_type)
        def decode_udf(gaps: pd.Series, tfs: pd.Series, n: pd.Series, skips: pd.Series, bs: pd.Series) -> pd.DataFrame:
            out_ids, out_tfs = [], []
            for g, t, nn, sk, b in zip(gaps, tfs, n, skips, bs):
                ids, tf = decode_postings(
                    gaps=bytes(g), tfs=bytes(t), n=int(nn), skips=bytes(sk), block_size=int(b)
                )
                out_ids.append(ids.tolist())
                out_tfs.append(tf.tolist())
            return pd.DataFrame({"doc_ids": out_ids, "tfs_arr": out_tfs})

        decoded = cand.select(
            "term",
            "df",
            decode_udf("gaps", "tfs", "n", "skips", "block_size").alias("d"),
        ).select(
            "term",
            "df",
            F.explode(F.arrays_zip("d.doc_ids", "d.tfs_arr")).alias("p"),
        ).select(
            "term",
            "df",
            F.col("p.doc_ids").alias("doc_id"),
            F.col("p.tfs_arr").alias("tf"),
        )

        dl = self.spark.read.parquet(f"{self.index_dir}/doclens")
        joined = (
            decoded.join(F.broadcast(qdf), "term")
            .join(dl, "doc_id")
        )
        tf_d = F.col("tf").cast("double")
        norm = tf_d + F.lit(BM25_K1) * (
            F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("doc_len") / F.lit(self.avgdl)
        )
        contrib = (
            idf_expr("df", F.lit(self.n_docs)) * tf_d * F.lit(BM25_K1 + 1.0) / norm
        )
        scored = (
            joined.select("query_id", "doc_id", "term", contrib.alias("contrib"))
            .groupBy("query_id", "doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("score")
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "rank", "doc_id", "score")
        )
