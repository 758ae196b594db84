"""spark-submit job: the full training-corpus pipeline in one submit —
extract → quality gate → (lang filter) → exact dedup → (near-dup drop)
→ resumable compressed-index build, with the per-stage audit and build
lineage written next to the index.

    spark-submit --py-files sifter_pkg.zip jobs/prepare_and_index.py \
        --input  /path/to/pages_parquet \
        --output /path/to/index_dir \
        [--html] [--lang en] [--near-dup] [--lsh-max-bucket 256] \
        [--buckets 64] [--id-col doc_id] [--text-col text] \
        [--max-buckets N]

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


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-option", action="append", default=None,
                    help="reader option key=value for --input (repeatable); "
                         "e.g. Iceberg snapshot-id=... / as-of-timestamp=...")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--id-from", default=None,
                    help="derive doc_id = xxhash64(<col>) from a string key "
                         "(e.g. url) with a collision audit — for url-keyed "
                         "pages tables with no numeric id")
    ap.add_argument("--keep-latest-by", default=None,
                    help="with --id-from: keep only the newest row per key "
                         "by this timestamp column (e.g. warc_ts) before "
                         "hashing — recrawled URLs dedupe keep-latest")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html", action="store_true", help="extract from the html binary column")
    ap.add_argument("--lang", default=None, help="keep only this predicted language")
    ap.add_argument("--near-dup", action="store_true", help="drop MinHash-LSH near-dups")
    ap.add_argument("--lsh-max-bucket", type=int, default=256,
                    help="with --near-dup: drop LSH buckets larger than this "
                         "before the pair join (skew cap; audit records the "
                         "dropped-bucket count). 0 disables the cap")
    ap.add_argument("--gopher", action="store_true", help="apply the Gopher quality gates")
    ap.add_argument("--redact", action="store_true", help="redact PII before all stages")
    ap.add_argument("--bench", default=None, help="parquet of benchmark docs to decontaminate against")
    ap.add_argument("--max-buckets", type=int, default=None)
    args = ap.parse_args(argv)

    from sifter_mrc_search_engine_spark.cli import validate_nonneg

    validate_nonneg(ap, "--lsh-max-bucket", args.lsh_max_bucket)

    from sifter_mrc_search_engine_spark.plans.checkpoint import build_index_resumable
    from sifter_mrc_search_engine_spark.sources.tables import (
        parse_reader_options,
        read_corpus,
    )
    from sifter_mrc_search_engine_spark.session import claim_session
    from sifter_mrc_search_engine_spark.plans.prepare import (
        INDEX_ARTIFACTS,
        assign_doc_ids,
        clear_derived,
        materialize_prepared_corpus,
        prepare_corpus,
        raw_input_fingerprint,
    )

    spark, owns_session = claim_session("sifter-prepare-and-index")
    pages = read_corpus(spark, args.input, parse_reader_options(args.input_option))

    if args.id_from:
        pages = assign_doc_ids(
            pages, from_col=args.id_from, id_col=args.id_col,
            keep_latest_by=args.keep_latest_by,
        )
    clean, audit = prepare_corpus(
        pages,
        html_col="html" if args.html else None,
        lang=args.lang,
        near_dup=args.near_dup,
        lsh_max_bucket=args.lsh_max_bucket or None,
        id_col=args.id_col,
        text_col=args.text_col,
        gopher=args.gopher,
        redact=args.redact,
        bench=read_corpus(spark, args.bench) if args.bench else None,
    )
    # materialize the cleaned corpus ONCE: audit, doclens, and the index
    # encode each consume it, and without this the extraction + dedup
    # window + LSH join would replay per consumer (and again per resumed
    # submit). Resume safety — the fingerprint of the raw input + every
    # CORPUS-affecting flag (incl. the reader options: an Iceberg
    # snapshot pin changes what data is read!), plus stale-derived-
    # artifact clearing — lives in materialize_prepared_corpus.
    # --max-buckets is NOT fingerprinted (it only limits per-run
    # progress, never the final artifacts).
    prepare_opts = {
        "input": args.input,
        "input_content": raw_input_fingerprint(args.input, spark),
        "input_options": parse_reader_options(args.input_option),
        "html": args.html,
        "lang": args.lang,
        "near_dup": args.near_dup,
        "lsh_max_bucket": args.lsh_max_bucket or None,
        "gopher": args.gopher,
        "redact": args.redact,
        "bench": args.bench,
        "id_col": args.id_col,
        "id_from": args.id_from,
        "keep_latest_by": args.keep_latest_by,
        "text_col": args.text_col,
    }
    clean, audit_row = materialize_prepared_corpus(
        spark, clean, audit, args.output, prepare_opts,
        stale_paths=INDEX_ARTIFACTS,
    )

    # --buckets shapes the INDEX artifacts (partition hashing), not the
    # corpus: guard it separately so retuning it rebuilds only the index
    # — a resumed submit with a different count must not be served by a
    # manifest that looks complete for range(new_buckets)
    from pathlib import Path

    bopts = Path(args.output, "index_opts.json")
    if bopts.exists() and json.loads(bopts.read_text()).get("buckets") != args.buckets:
        clear_derived(args.output, INDEX_ARTIFACTS)
    bopts.write_text(json.dumps({"buckets": args.buckets}))

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
