"""Per-stage instrumentation for the r06 optimization round (guide §1.4).

Times each phase of the expensive bench workloads in isolation with the
noop sink where applicable — NOT the driver contract (bench.py is that).

Usage: python tools/bench_extra.py [pages_docs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000


def main() -> None:
    spark = get_spark("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from sifter_mrc_search_engine_spark.operators.compressed_index import (
        build_compressed_index,
        tf_doclen,
    )
    from sifter_mrc_search_engine_spark.plans.checkpoint import (
        _write_doclens_with_stats,
        build_index_resumable,
    )
    from sifter_mrc_search_engine_spark.sources.pages import synthesize_pages

    corpus_dir = tempfile.mkdtemp(prefix="r06_extra_corpus_")
    work = tempfile.mkdtemp(prefix="r06_extra_work_")
    try:
        synthesize_pages(spark, PAGES_DOCS, partitions=max(2 * CPUS, 8)).selectExpr(
            "cast(split(url, '/')[4] as long) as doc_id", "text"
        ).write.mode("overwrite").parquet(corpus_dir)
        pages = spark.read.parquet(corpus_dir)

        def t(name, fn, n=3):
            vals = []
            out = None
            for _ in range(n):
                sc.setJobDescription(name)
                t0 = time.monotonic()
                out = fn()
                vals.append(round(time.monotonic() - t0, 3))
            sc.setJobDescription(None)
            print(f"{name:28s} {vals}")
            return out

        tk = None
        from sifter_mrc_search_engine_spark.functions.analyzer import tokenize_expr

        tk = tokenize_expr("text")
        t("tokenize_scan_noop", lambda: pages.select(
            F.size(tk).alias("s")).write.format("noop").mode("overwrite").save())
        t("tf_doclen_noop", lambda: tf_doclen(pages).write.format(
            "noop").mode("overwrite").save())

        def doclens_job():
            d = f"{work}/dl"
            shutil.rmtree(d, ignore_errors=True)
            return _write_doclens_with_stats(pages, d, "doc_id", "text")

        stats, _fp = t("doclens_write", doclens_job)

        def hot_job():
            from sifter_mrc_search_engine_spark.constants import SALT_THRESHOLD

            tf = tf_doclen(pages)
            return (
                tf.filter(F.pmod(F.xxhash64("doc_id"), F.lit(16)) == 0)
                .groupBy("term")
                .agg(F.count(F.lit(1)).alias("df_s"), F.max("doc_id").alias("max_doc"))
                .filter(F.col("df_s") > SALT_THRESHOLD // 16)
                .collect()
            )

        t("hot_sample_collect", hot_job)

        def encode_job():
            idx = build_compressed_index(
                pages, stats=(stats["n_docs"], stats["avgdl"]), buckets=64
            )
            idx.write.format("noop").mode("overwrite").save()

        t("encode_noop(incl hot)", encode_job)

        def full_build():
            d = f"{work}/idx"
            shutil.rmtree(d, ignore_errors=True)
            t0 = time.monotonic()
            build_index_resumable(pages, d, buckets=64)
            return round(time.monotonic() - t0, 3)

        t("full_build_resumable", full_build)

        # positional tier
        from sifter_mrc_search_engine_spark.operators import positional as _pos

        def pos_build():
            d = f"{work}/pos"
            shutil.rmtree(d, ignore_errors=True)
            _pos.write_positional_index(pages, d)
            return d

        pos_dir = t("pos_full_build", pos_build, n=2)

        from sifter_mrc_search_engine_spark.sources.pages import VOCAB

        phrases = [f"{VOCAB[0]} {VOCAB[1]}", f"{VOCAB[2]} {VOCAB[3]}",
                   f"{VOCAB[10]} {VOCAB[11]}", f"{VOCAB[100]} {VOCAB[101]}"]
        for ph in phrases:
            t(f"pos_phrase[{ph[:18]}]", lambda ph=ph: _pos.phrase_topk_indexed(
                spark, pos_dir, ph).collect(), n=2)

        # chunk materialization
        from sifter_mrc_search_engine_spark.operators.packing import materialize_chunks

        t("chunk_materialize", lambda: materialize_chunks(pages, budget=1024).count(), n=3)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
