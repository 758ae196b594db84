"""spark-submit job: raw pages -> LLM training data in one submit —
extract -> quality/dedup/decontamination gates -> packed fixed-size
training sequences, with optional NSP-pair and MLM-mask exports.

    spark-submit --py-files sifter_pkg.zip jobs/make_training_data.py \
        --input  /path/to/pages_parquet \
        --output /path/to/training_dir \
        [--html] [--lang en] [--near-dup] [--lsh-max-bucket 256] \
        [--transitive] [--gopher] \
        [--redact] [--bench bench_parquet] [--budget 1024] \
        [--nsp] [--mlm] [--vocab-size 20000] \
        [--id-col doc_id] [--text-col text]

This is the training-corpus twin of jobs/prepare_and_index.py (which
feeds the search index): the same one-plan prepare pipeline and the
same fingerprinted resume (a resumed submit that changed --input or any
stage flag rebuilds the corpus AND clears the derived exports), but the
output is model food:

* ``<output>/clean_corpus``   — the gated corpus + prepare_audit.json
* ``<output>/chunks``         — (chunk_id, n_tokens, chunk_text)
  fixed-``--budget`` packed sequences (concatenate-then-chunk,
  operators/packing.py — piece shuffle, two-pass distributed scan)
* ``<output>/nsp_pairs``      — (first, second, label) sentence pairs
  (--nsp; rule/kss sentence splitter + seeded md5 draws, operators/nsp.py)
* ``<output>/mlm``            — (doc_id, masked_ids, labels) (--mlm;
  80/10/10 masking over hash-bucketed token ids — the id mapping is a
  stand-in tokenizer, swap in a real vocab via --vocab-size + your own
  token-id column upstream)

Every export is skipped when its _SUCCESS marker exists (resumable per
stage); all exports derive from the materialized clean corpus, so the
expensive prepare plan runs once, not once per export.
"""

from __future__ import annotations

import argparse
import json
import sys

from pathlib import Path

from pyspark.sql import functions as F


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-option", action="append", default=None,
                    help="reader option key=value for --input (repeatable); "
                         "e.g. Iceberg snapshot-id=... / as-of-timestamp=...")
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
    ap.add_argument("--html", action="store_true")
    ap.add_argument("--lang", default=None)
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--lsh-max-bucket", type=int, default=256,
                    help="with --near-dup: drop LSH buckets larger than this "
                         "before the pair join (skew cap; audit records the "
                         "dropped-bucket count). 0 disables the cap")
    ap.add_argument("--transitive", action="store_true",
                    help="transitively-safe near-dup drop (connected components)")
    ap.add_argument("--cc-algorithm", choices=("star", "jump"), default="star",
                    help="connected-components variant for --transitive: "
                         "'star' (faster; needs sc.setCheckpointDir on a "
                         "cluster) or 'jump' (no shared storage needed)")
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--redact", action="store_true")
    ap.add_argument("--bench", default=None)
    ap.add_argument("--budget", type=int, default=1024,
                    help="tokens per packed training sequence")
    ap.add_argument("--nsp", action="store_true", help="export NSP sentence pairs")
    ap.add_argument("--mlm", action="store_true", help="export MLM-masked token ids")
    ap.add_argument("--vocab-size", type=int, default=20000)
    args = ap.parse_args(argv)

    from sifter_mrc_search_engine_spark.cli import validate_nonneg

    validate_nonneg(ap, "--lsh-max-bucket", args.lsh_max_bucket)

    from sifter_mrc_search_engine_spark.functions.sentences import (
        make_split_sentences_udf,
    )
    from sifter_mrc_search_engine_spark.operators.nsp import mask_tokens, nsp_pairs
    from sifter_mrc_search_engine_spark.operators.packing import materialize_chunks
    from sifter_mrc_search_engine_spark.sources.tables import (
        parse_reader_options,
        read_corpus,
    )
    from sifter_mrc_search_engine_spark.session import claim_session
    from sifter_mrc_search_engine_spark.plans.prepare import (
        assign_doc_ids,
        materialize_prepared_corpus,
        prepare_corpus,
        raw_input_fingerprint,
    )

    spark, owns_session = claim_session("sifter-make-training-data")
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
        near_dup_transitive=args.transitive,
        cc_algorithm=args.cc_algorithm,
        id_col=args.id_col,
        text_col=args.text_col,
        gopher=args.gopher,
        redact=args.redact,
        bench=read_corpus(spark, args.bench) if args.bench else None,
    )
    # CORPUS-affecting flags only (incl. reader options — an Iceberg
    # snapshot pin changes what data is read): retuning an export knob
    # (--budget / --vocab-size) must NOT re-run the expensive prepare
    # pipeline — each export carries its own opts guard below
    prepare_opts = {
        "input": args.input,
        "input_content": raw_input_fingerprint(args.input, spark),
        "input_options": parse_reader_options(args.input_option),
        "html": args.html,
        "lang": args.lang,
        "near_dup": args.near_dup,
        "lsh_max_bucket": args.lsh_max_bucket or None,
        "transitive": args.transitive,
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
        stale_paths=("chunks", "nsp_pairs", "mlm"),
    )

    def export_ready(d: str, opts: dict) -> bool:
        """An export is reusable iff its write committed AND it was
        produced under the same knobs (the opts marker lives inside the
        parquet dir — Spark ignores underscore-prefixed files)."""
        marker = Path(d, "_EXPORT_OPTS.json")
        return (
            Path(d, "_SUCCESS").exists()
            and marker.exists()
            and json.loads(marker.read_text()) == opts
        )

    def mark_export(d: str, opts: dict) -> None:
        Path(d, "_EXPORT_OPTS.json").write_text(json.dumps(opts))

    summary: dict = {"audit": audit_row, "exports": {}}

    chunks_dir = f"{args.output}/chunks"
    chunk_opts = {"budget": args.budget}
    if not export_ready(chunks_dir, chunk_opts):
        materialize_chunks(clean, budget=args.budget).write.mode(
            "overwrite"
        ).parquet(chunks_dir)
        mark_export(chunks_dir, chunk_opts)
    summary["exports"]["chunks"] = spark.read.parquet(chunks_dir).count()

    if args.nsp:
        nsp_dir = f"{args.output}/nsp_pairs"
        if not export_ready(nsp_dir, {}):
            split_udf = make_split_sentences_udf()
            articles = clean.select(
                F.col("doc_id").alias("article_id"),
                split_udf(F.col("text")).alias("sentences"),
            ).filter(F.size("sentences") >= 2)
            nsp_pairs(articles).write.mode("overwrite").parquet(nsp_dir)
            mark_export(nsp_dir, {})
        summary["exports"]["nsp_pairs"] = spark.read.parquet(nsp_dir).count()

    if args.mlm:
        mlm_dir = f"{args.output}/mlm"
        mlm_opts = {"vocab_size": args.vocab_size}
        if not export_ready(mlm_dir, mlm_opts):
            # hash-bucketed token ids (ids 10..10+vocab): a deterministic
            # stand-in for a real subword vocab — the masking operator
            # only needs SOME stable int ids
            ids = clean.selectExpr(
                "doc_id",
                "transform(regexp_extract_all(lower(text), '[a-z0-9가-힣]+', 0),"
                f" t -> int(10 + pmod(xxhash64(t), {args.vocab_size}))) as token_ids",
            ).filter(F.size("token_ids") > 0)
            mask_tokens(ids).write.mode("overwrite").parquet(mlm_dir)
            mark_export(mlm_dir, mlm_opts)
        summary["exports"]["mlm"] = spark.read.parquet(mlm_dir).count()

    print(json.dumps(summary))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
