"""spark-submit job: the full training-corpus pipeline in one submit —
extract → quality gate → (lang filter) → exact dedup → (near-dup drop)
→ resumable compressed-index build, with the per-stage audit and build
lineage written next to the index.

    spark-submit --py-files sifter_pkg.zip jobs/prepare_and_index.py \
        --input  /path/to/pages_parquet \
        --output /path/to/index_dir \
        [--html] [--lang en] [--near-dup] [--buckets 64] \
        [--id-col doc_id] [--text-col text] [--max-buckets N]

The reference runs the analogous extract→clean→filter→train chain as
single-process Python (modules/lm_post_training/train.py:49-70); here
every stage is part of ONE declarative plan (plans/prepare.py), the
audit is one aggregate over one input scan, and the index build resumes
from the output dir's manifest if a previous run died mid-way. Output
layout: ``<output>/postings`` + ``stats.json`` + ``manifest.jsonl``
(build lineage) + ``prepare_audit.json`` (per-stage survivor counts).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from pyspark.sql import SparkSession


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html", action="store_true", help="extract from the html binary column")
    ap.add_argument("--lang", default=None, help="keep only this predicted language")
    ap.add_argument("--near-dup", action="store_true", help="drop MinHash-LSH near-dups")
    ap.add_argument("--gopher", action="store_true", help="apply the Gopher quality gates")
    ap.add_argument("--redact", action="store_true", help="redact PII before all stages")
    ap.add_argument("--bench", default=None, help="parquet of benchmark docs to decontaminate against")
    ap.add_argument("--max-buckets", type=int, default=None)
    args = ap.parse_args(argv)

    from sifter_mrc_search_engine_spark.plans.checkpoint import build_index_resumable
    from sifter_mrc_search_engine_spark.plans.prepare import prepare_corpus

    # only stop the session if THIS job created it (in-process callers —
    # tests, notebooks — keep theirs)
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("sifter-prepare-and-index").getOrCreate()
    pages = spark.read.parquet(args.input)

    clean, audit = prepare_corpus(
        pages,
        html_col="html" if args.html else None,
        lang=args.lang,
        near_dup=args.near_dup,
        id_col=args.id_col,
        text_col=args.text_col,
        gopher=args.gopher,
        redact=args.redact,
        bench=spark.read.parquet(args.bench) if args.bench else None,
    )
    # materialize the cleaned corpus ONCE: audit, doclens, and the index
    # encode each consume it, and without this the extraction + dedup
    # window + LSH join would replay per consumer (and again per resumed
    # submit)
    clean_dir = f"{args.output}/clean_corpus"
    audit_path = Path(args.output, "prepare_audit.json")
    # fingerprint of the RAW input + every prepare option: a resumed
    # submit that changed --input or any stage flag must NOT silently
    # index the stale cached corpus (the index build's own
    # input_fingerprint can't catch this — it fingerprints the cached
    # parquet, not what produced it)
    prepare_opts = {
        "input": args.input,
        "html": args.html,
        "lang": args.lang,
        "near_dup": args.near_dup,
        "gopher": args.gopher,
        "redact": args.redact,
        "bench": args.bench,
        "id_col": args.id_col,
        "text_col": args.text_col,
    }
    cached_opts = None
    if audit_path.exists():
        cached_opts = json.loads(audit_path.read_text()).get("_prepare_opts")
    reusable = Path(clean_dir, "_SUCCESS").exists() and cached_opts == prepare_opts
    if not reusable:  # fresh submit, crashed write, or changed inputs/flags
        if cached_opts is not None and cached_opts != prepare_opts:
            # the cached corpus came from DIFFERENT inputs/flags: any
            # index state in this output dir derives from it and is
            # stale too — clear it so the build starts fresh instead of
            # refusing on its own input-fingerprint check
            import shutil

            for stale in ("postings", "doclens", "_manifest.jsonl", "stats.json"):
                p = Path(args.output, stale)
                shutil.rmtree(p, ignore_errors=True) if p.is_dir() else p.unlink(
                    missing_ok=True
                )
        clean.write.mode("overwrite").parquet(clean_dir)
        audit_row = audit.collect()[0].asDict() | {"_prepare_opts": prepare_opts}
        audit_path.write_text(json.dumps(audit_row))
    else:
        audit_row = json.loads(audit_path.read_text())
    clean = spark.read.parquet(clean_dir)

    result = build_index_resumable(
        clean,
        args.output,
        buckets=args.buckets,
        max_buckets_this_run=args.max_buckets,
    )
    print(json.dumps({"audit": audit_row, "build": {
        k: result[k] for k in ("resumed", "skipped", "wall_ms", "n_docs")
    } | {"built_buckets": len(result["built_buckets"])}}))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
