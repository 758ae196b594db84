"""Incremental index maintenance via Structured Streaming.

The reference has no stream processing (SURVEY.md §2.9); its closest
analogue is the check-then-skip checkpoint loop. This module adds the
streamed-ingest path a living corpus needs: ``readStream`` over arriving
page files -> ``foreachBatch`` -> one immutable index SEGMENT per batch
(Lucene-style), each with its own postings/doclens/stats.

Query-time correctness across segments (exact, not approximate):
  * df(term)  = sum of segment dfs
  * N, avgdl  = merged from segment stats (counts and length sums add)
  * per-posting tf and doc lengths are stored exactly, so BM25 scores are
    recomputed exactly under the MERGED stats at query time
  * the per-segment impact bounds (max_impact, blockmax) were computed
    under segment-local stats and go stale under merged stats, so the
    multi-segment searcher replaces them with the always-valid bound
    idf_merged * (k1 + 1)  (since tf*(k1+1)/(tf + K) < k1+1 for K > 0)
    and disables block-max pruning — weaker pruning, identical results.

A background compaction (``compact_segments``) merges segments into one,
restoring tight bounds — the classic segment-merge tradeoff.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import BM25_B, BM25_K1, DEFAULT_TOP_K, MAX_TOP_K, TERM_BUCKETS
from ..functions.analyzer import analyze, tokenize_expr
from ..operators.compressed_index import build_compressed_index
from ..operators.index_build import term_bucket_expr
from ..operators.wand import wand_topk

PAGES_DDL = "doc_id long, text string"


def _write_segment(batch_df: DataFrame, seg_dir: str, buckets: int) -> None:
    spark = batch_df.sparkSession
    dl = batch_df.select(
        "doc_id", F.size(tokenize_expr("text")).cast("long").alias("doc_len")
    )
    dl.write.mode("overwrite").parquet(f"{seg_dir}/doclens")
    r = spark.read.parquet(f"{seg_dir}/doclens").agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n_docs, dl_sum = int(r["n"]), int(r["s"] or 0)
    stats = {"n_docs": n_docs, "dl_sum": dl_sum,
             "avgdl": (dl_sum / n_docs) if n_docs else 0.0}
    idx = build_compressed_index(batch_df, buckets=buckets, stats=(n_docs, stats["avgdl"]))
    idx.write.mode("overwrite").partitionBy("bucket").parquet(f"{seg_dir}/postings")
    (Path(seg_dir) / "stats.json").write_text(json.dumps(stats))
    (Path(seg_dir) / "_SEGMENT_COMMITTED").write_text(str(int(time.time() * 1000)))


def stream_build_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    buckets: int = TERM_BUCKETS,
    available_now: bool = True,
):
    """Stream parquet page files from ``input_dir`` into per-batch segments.

    ``available_now=True`` drains everything currently present and stops
    (the testable mode); in production the query runs continuously and the
    streaming checkpoint makes ingestion exactly-once per file.
    """
    stream = spark.readStream.schema(PAGES_DDL).parquet(input_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_segment(batch_df, f"{index_dir}/segments/seg={batch_id}", buckets)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def list_segments(index_dir: str) -> list[str]:
    base = Path(index_dir) / "segments"
    if not base.exists():
        return []
    return sorted(
        str(p) for p in base.iterdir() if (p / "_SEGMENT_COMMITTED").exists()
    )


class MultiSegmentSearcher:
    """Exact BM25 top-k across all committed segments (see module doc)."""

    def __init__(self, spark: SparkSession, index_dir: str, buckets: int = TERM_BUCKETS):
        self.spark = spark
        self.buckets = buckets
        self.segments = list_segments(index_dir)
        if not self.segments:
            raise ValueError(f"no committed segments under {index_dir}")
        n, s = 0, 0
        self.doclen: dict[int, int] = {}
        for seg in self.segments:
            st = json.loads((Path(seg) / "stats.json").read_text())
            n += st["n_docs"]
            s += st["dl_sum"]
            for r in spark.read.parquet(f"{seg}/doclens").collect():
                self.doclen[r["doc_id"]] = r["doc_len"]
        self.n_docs, self.avgdl = n, (s / n if n else 0.0)

    def search(self, question: str, top_k: int = DEFAULT_TOP_K):
        import numpy as np

        top_k = max(1, min(int(top_k), MAX_TOP_K))
        terms = analyze(question)
        if not terms:
            return []
        tset = list(set(terms))
        rows: list[dict] = []
        for seg in self.segments:
            post = self.spark.read.parquet(f"{seg}/postings")
            tdf = self.spark.createDataFrame([(t,) for t in tset], "term string")
            bks = [
                r["b"]
                for r in tdf.select(term_bucket_expr("term", self.buckets).alias("b"))
                .distinct()
                .collect()
            ]
            rows.extend(
                r.asDict()
                for r in post.filter(F.col("bucket").isin(bks))
                .filter(F.col("term").isin(tset))
                .collect()
            )
        # merged df per term; stale segment bounds -> safe UB idf*(k1+1)
        df_tot: dict[str, int] = {}
        for r in rows:
            df_tot[r["term"]] = df_tot.get(r["term"], 0) + int(r["n"])
        fixed = []
        for r in rows:
            d = dict(r)
            d["df"] = df_tot[d["term"]]
            idf = float(
                np.log(1.0 + (self.n_docs - d["df"] + 0.5) / (d["df"] + 0.5))
            )
            d["max_impact"] = idf * (BM25_K1 + 1.0)
            fixed.append(d)
        return wand_topk(
            fixed, terms, self.doclen, self.n_docs, self.avgdl,
            top_k=top_k, use_blockmax=False,
        )


def compact_segments(
    spark: SparkSession, index_dir: str, buckets: int = TERM_BUCKETS
) -> str:
    """Merge all committed segments into one (tight bounds restored).

    Rebuilds from the segments' stored doc set: reads every segment's
    doclens to enumerate docs is NOT enough (postings hold tf only), so
    compaction re-reads the raw pages recorded per segment is avoided by
    keeping it simple: decode+concatenate per (term, salt-segment) —
    doc-id ranges across stream segments are disjoint only if the source
    guarantees it, so the safe general path is a tf-level union:
    tf rows are reconstructed by decoding each segment's postings.
    """
    import numpy as np
    import pandas as pd

    from ..operators.postings_codec import decode_postings

    segs = list_segments(index_dir)
    recs = []
    for seg in segs:
        for r in spark.read.parquet(f"{seg}/postings").collect():
            ids, tfs = decode_postings(
                gaps=bytes(r["gaps"]), tfs=bytes(r["tfs"]), n=int(r["n"]),
                skips=bytes(r["skips"]), block_size=int(r["block_size"]),
            )
            for d, t in zip(ids.tolist(), tfs.tolist()):
                recs.append((r["term"], d, t))
    tf = spark.createDataFrame(pd.DataFrame(recs, columns=["term", "doc_id", "tf"]))
    dl = None
    for seg in segs:
        d = spark.read.parquet(f"{seg}/doclens")
        dl = d if dl is None else dl.unionByName(d)
    dl_path = f"{index_dir}/compacted/doclens"
    dl.write.mode("overwrite").parquet(dl_path)
    r = spark.read.parquet(dl_path).agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    stats = {"n_docs": int(r["n"]), "avgdl": float(r["a"])}
    # re-encode from the unioned tf (join doc_len back in)
    tf2 = tf.join(spark.read.parquet(dl_path), "doc_id")
    from ..operators.compressed_index import encode_tf

    idx = encode_tf(tf2, stats["n_docs"], stats["avgdl"], buckets=buckets)
    idx.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{index_dir}/compacted/postings"
    )
    (Path(index_dir) / "compacted" / "stats.json").write_text(json.dumps(stats))
    return f"{index_dir}/compacted"
