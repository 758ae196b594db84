"""Corpus input resolution: parquet paths vs catalog table refs (the
north-rule input shape is an Iceberg table of Common-Crawl-style pages;
Spark resolves Iceberg through the same format-agnostic
``spark.read.table`` API exercised here via in-session tables — the
Iceberg runtime jar is deploy-time configuration, not code)."""

import pytest

from sifter_mrc_search_engine_spark.sources.tables import (
    is_table_ref,
    parse_reader_options,
    read_corpus,
)


def test_is_table_ref():
    assert is_table_ref("catalog.db.pages")
    assert is_table_ref("pages_view")
    assert not is_table_ref("/data/pages.parquet")
    assert not is_table_ref("relative/dir")
    assert not is_table_ref("local.parquet")


def test_parse_reader_options():
    assert parse_reader_options(None) == {}
    assert parse_reader_options(["snapshot-id=42", "as-of-timestamp=99"]) == {
        "snapshot-id": "42", "as-of-timestamp": "99"
    }
    with pytest.raises(ValueError, match="key=value"):
        parse_reader_options(["notanoption"])


def test_read_corpus_path_and_table(spark, tmp_path):
    rows = [(i, f"doc number {i} text") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "pages")
    df.write.parquet(p)
    # filesystem path -> parquet
    assert read_corpus(spark, p).count() == 6
    # catalog/table reference -> spark.read.table (temp view here; an
    # Iceberg `cat.db.tbl` name goes down the same call)
    df.createOrReplaceTempView("pages_ref_view")
    got = read_corpus(spark, "pages_ref_view")
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(6))


def test_jobs_accept_table_refs(spark, tmp_path, capsys):
    """--input can name a saved table instead of a parquet path; the
    whole prepare+index job runs against it unchanged."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.prepare_and_index import main as job_main

    spark.createDataFrame(
        [(i, f"the corpus document number {i} with plenty of words")
         for i in range(10)],
        "doc_id long, text string",
    ).createOrReplaceTempView("job_input_view")
    out = str(tmp_path / "out")
    job_main(["--input", "job_input_view", "--output", out, "--buckets", "4"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["audit"]["input"] == 10
    assert summary["build"]["n_docs"] == 10


def test_is_table_ref_explicit_prefix(tmp_path, monkeypatch):
    """``table:`` forces catalog resolution even when a same-named
    local file exists (the silent-parquet-shadowing hazard, ADVICE r4)."""
    monkeypatch.chdir(tmp_path)
    (tmp_path / "pages").mkdir()  # name collision with a local dir
    assert not is_table_ref("pages")  # heuristic: local dir wins
    assert is_table_ref("table:pages")  # explicit: catalog wins


def test_read_corpus_table_prefix_and_missing_table_error(spark, tmp_path):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    df.createOrReplaceTempView("prefixed_ref_view")
    assert read_corpus(spark, "table:prefixed_ref_view").count() == 1
    # a mistyped slash-free path surfaces the heuristic, not a bare
    # TABLE_OR_VIEW_NOT_FOUND
    with pytest.raises(ValueError, match="path containing '/'"):
        read_corpus(spark, "no_such_input_xyz")


def test_read_corpus_explicit_prefix_raises_plain_catalog_error(spark):
    """A missing table behind an explicit table: prefix should raise
    Spark's own catalog error — the path-vs-table heuristic explanation
    would be noise for a user who already forced table resolution."""
    with pytest.raises(Exception) as ei:
        read_corpus(spark, "table:definitely_missing_xyz")
    assert not isinstance(ei.value, ValueError)


def test_build_index_job_writes_positional_tier(spark, tmp_path, capsys):
    """--positional-output writes the structured-query index in the same
    submit; a structured query serves from the produced dir."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs.build_index import main as job_main

    import sifter_mrc_search_engine_spark.operators.positional as P

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"alpha beta structured tier document {i}") for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(src)
    out, pos = str(tmp_path / "idx"), str(tmp_path / "posidx")
    job_main(["--input", src, "--output", out, "--buckets", "4",
              "--positional-output", pos, "--pos-buckets", "8"])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["positional"]["n_docs"] == 8
    assert summary["positional"]["buckets"] == 8
    hits = P.phrase_topk_indexed(spark, pos, "alpha beta").collect()
    assert len(hits) == 8
