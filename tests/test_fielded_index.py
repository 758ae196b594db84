"""Fielded index: BM25F served from persisted per-field postings must be
rank-identical (scores within 1e-12) to the query-time brute force."""

import pytest
from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.operators.bm25f import bm25f_brute_force
from sifter_mrc_search_engine_spark.operators.fielded_index import (
    FIELD_SEP,
    build_fielded_index,
    search_bm25f,
)

WEIGHTS = {"title": 2.0, "content": 1.0}
QUESTIONS = ["the fast query", "window", "spark join merge table"]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)).alias("title"),
        F.col("text").alias("content"),
    ).cache()


@pytest.fixture(scope="module")
def fielded_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fielded_idx"))
    stats = build_fielded_index(corpus, ["title", "content"], d, buckets=16)
    assert stats["fields"] == ["content", "title"] or stats["fields"] == sorted(["title", "content"])
    return d


@pytest.mark.parametrize("q", QUESTIONS)
def test_fielded_matches_brute_force(spark, corpus, fielded_dir, q):
    exp = [
        (r["doc_id"], r["score"])
        for r in bm25f_brute_force(corpus, q, WEIGHTS, top_k=10).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in search_bm25f(spark, fielded_dir, q, WEIGHTS, top_k=10, buckets=16).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp], q
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)


def test_weights_are_query_time(spark, corpus, fielded_dir):
    """The same persisted index serves DIFFERENT weightings correctly."""
    alt = {"title": 5.0, "content": 0.5}
    exp = [
        (r["doc_id"], r["score"])
        for r in bm25f_brute_force(corpus, "the fast query", alt, top_k=10).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in search_bm25f(spark, fielded_dir, "the fast query", alt, top_k=10, buckets=16).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)


def test_stored_terms_are_field_prefixed(spark, fielded_dir):
    rows = spark.read.parquet(f"{fielded_dir}/postings").select("term").limit(20).collect()
    assert rows and all(FIELD_SEP in r["term"] for r in rows)


def test_pruned_scan_shape(spark, fielded_dir):
    """The fielded query touches only the query terms' buckets — partition
    filters appear in the physical scan."""
    plan = search_bm25f(
        spark, fielded_dir, "the fast query", WEIGHTS, top_k=10, buckets=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan or "bucket#" in plan, plan[:2000]


@pytest.mark.parametrize("preload", [False, True])
def test_fielded_searcher_serving_kernel(spark, corpus, fielded_dir, preload):
    """The driver-side serving kernel (scan-mode and preloaded) matches
    brute force for multiple weightings."""
    from sifter_mrc_search_engine_spark.operators.fielded_index import FieldedSearcher

    s = FieldedSearcher(spark, fielded_dir, buckets=16, preload=preload)
    for w in (WEIGHTS, {"title": 5.0, "content": 0.5}):
        for q in QUESTIONS:
            exp = [
                (r["doc_id"], r["score"])
                for r in bm25f_brute_force(corpus, q, w, top_k=10).collect()
            ]
            got = s.search(q, w, top_k=10)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, w, preload)
            for (gd, gs), (_, es) in zip(got, exp):
                assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)
    # empty/unknown questions behave like the engine contract
    assert s.search("", WEIGHTS) == []
    assert s.search("zzznotaterm", WEIGHTS) == []


@pytest.mark.parametrize("method", ["wand", "exhaustive"])
def test_fielded_wand_vs_exhaustive(spark, corpus, fielded_dir, method):
    """Pruned multi-field WAND == exhaustive kernel == brute force, at a
    small top_k where the threshold actually bites."""
    from sifter_mrc_search_engine_spark.operators.fielded_index import FieldedSearcher

    s = FieldedSearcher(spark, fielded_dir, buckets=16, preload=True)
    assert s._term_df  # build wrote the union-df sidecar
    for q in QUESTIONS + ["the the the", "window table"]:
        exp = [
            (r["doc_id"], r["score"])
            for r in bm25f_brute_force(corpus, q, WEIGHTS, top_k=3).collect()
        ]
        got = s.search(q, WEIGHTS, top_k=3, method=method)
        assert [d for d, _ in got] == [d for d, _ in exp], (q, method)
        for (gd, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)


def test_fielded_term_df_sidecar_is_union_df(spark, corpus, fielded_dir):
    """term_df must be the UNION df (docs containing the term in ANY
    field) — the idf driving both kernels and the oracle."""
    import duckdb

    from pyspark.sql import functions as F

    got = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{fielded_dir}/term_df").collect()
    }
    exp_df = (
        corpus.select(
            "doc_id",
            F.explode(
                F.array_union(
                    F.regexp_extract_all(F.lower("title"), F.lit("[a-z0-9가-힣]+"), F.lit(0)),
                    F.regexp_extract_all(F.lower("content"), F.lit("[a-z0-9가-힣]+"), F.lit(0)),
                )
            ).alias("term"),
        )
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    exp = {r["term"]: r["df"] for r in exp_df.collect()}
    assert got == exp
