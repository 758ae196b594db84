"""Checkpoint/resume + query-serving integration (FIXTURES.md §7)."""

import json
from pathlib import Path

import pytest

from sifter_mrc_search_engine_spark.operators.bm25 import bm25_brute_force
from sifter_mrc_search_engine_spark.plans.checkpoint import (
    build_index_resumable,
    read_manifest,
)
from sifter_mrc_search_engine_spark.plans.query import IndexSearcher
from sifter_mrc_search_engine_spark.sources.pages import VOCAB, synthesize_pages

N_DOCS = 800
BUCKETS = 8


@pytest.fixture(scope="module")
def docs(spark):
    d = (
        synthesize_pages(spark, N_DOCS, partitions=4)
        .selectExpr("cast(split(url, '/')[4] as long) as doc_id", "text")
        .cache()
    )
    d.count()
    return d


def _index_signature(spark, path):
    rows = spark.read.parquet(f"{path}/postings").collect()
    return sorted(
        (
            r["term"], r["segment"], r["bucket"], r["df"], r["n"],
            bytes(r["gaps"]), bytes(r["tfs"]), bytes(r["skips"]), bytes(r["blockmax"]),
        )
        for r in rows
    )


def test_interrupted_then_resumed_equals_uninterrupted(spark, docs, tmp_path_factory):
    full_dir = str(tmp_path_factory.mktemp("idx_full"))
    part_dir = str(tmp_path_factory.mktemp("idx_part"))

    r_full = build_index_resumable(docs, full_dir, buckets=BUCKETS)
    assert not r_full["resumed"]
    assert sorted(r_full["built_buckets"]) == list(range(BUCKETS))

    # simulated kill: only 3 buckets land
    r1 = build_index_resumable(docs, part_dir, buckets=BUCKETS, max_buckets_this_run=3)
    assert len(r1["built_buckets"]) == 3
    m1 = read_manifest(part_dir)
    assert {m.get("kind") for m in m1} >= {"doclens", None}

    # resume: completed buckets are NOT recomputed
    r2 = build_index_resumable(docs, part_dir, buckets=BUCKETS)
    assert r2["resumed"]
    assert r2["skipped"] == 3
    assert len(r2["built_buckets"]) == BUCKETS - 3
    assert set(r1["built_buckets"]).isdisjoint(r2["built_buckets"])

    # identical final index, byte for byte
    assert _index_signature(spark, part_dir) == _index_signature(spark, full_dir)

    # third run is a no-op — and returns the SAME shape as a real build
    # (idempotent callers read n_docs/wall_ms without a KeyError)
    r3 = build_index_resumable(docs, part_dir, buckets=BUCKETS)
    assert r3["built_buckets"] == [] and r3["skipped"] == BUCKETS
    assert r3["n_docs"] == r_full["n_docs"] and r3["wall_ms"] == 0


def test_manifest_lineage_fields(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_lineage"))
    build_index_resumable(docs, d, buckets=BUCKETS)
    m = read_manifest(d)
    bucket_rows = [x for x in m if "bucket" in x]
    assert len(bucket_rows) == BUCKETS
    for row in bucket_rows:
        assert row["input_fingerprint"].startswith("n800_")
        assert row["terms"] >= 0 and row["postings"] >= 0
        assert row["wall_ms"] >= 0 and row["docs_per_sec"] > 0
        assert row["completed_utc_ms"] > 0
    stats = json.loads((Path(d) / "stats.json").read_text())
    assert stats["n_docs"] == N_DOCS


def test_fingerprint_mismatch_refuses(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_fp"))
    build_index_resumable(docs, d, buckets=BUCKETS, max_buckets_this_run=1)
    other = docs.limit(100)
    with pytest.raises(ValueError, match="different input"):
        build_index_resumable(other, d, buckets=BUCKETS)


@pytest.fixture(scope="module")
def searcher(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_search"))
    build_index_resumable(docs, d, buckets=BUCKETS)
    return IndexSearcher(spark, d, buckets=BUCKETS)


QUERIES = [
    VOCAB[0],
    f"{VOCAB[0]} {VOCAB[40]}",
    f"{VOCAB[2]} {VOCAB[7]} {VOCAB[100]}",
    "zzznotaterm",
]


@pytest.mark.parametrize("q", QUERIES)
def test_searcher_matches_brute_force(spark, docs, searcher, q):
    expected = [
        (r["doc_id"], r["score"]) for r in bm25_brute_force(docs, q, top_k=10).collect()
    ]
    got = searcher.search(q, top_k=10)
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)


def test_search_many_matches_search(searcher):
    batch = searcher.search_many(QUERIES, top_k=10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for i, q in enumerate(QUERIES):
        single = searcher.search(q, top_k=10)
        got = [(d, s) for _, d, s in sorted(by_q.get(i, []))]
        assert got == single, q


def test_top_k_clamped_to_reference_ceiling(searcher):
    # server.py:18-19: top_k ∈ [1, 10]
    assert len(searcher.search(VOCAB[0], top_k=99)) == 10
    assert len(searcher.search(VOCAB[0], top_k=0)) == 1


def test_join_norms_serves_without_driver_doclens(spark, docs, searcher, tmp_path_factory):
    """norms='join' must answer single queries with NO doclens collect —
    `_DOCLEN_CACHE` stays empty for the index — and results identical to
    the preload path (the 10^12-doc serving shape: norms stay
    cluster-resident and ride the in-plan join)."""
    from sifter_mrc_search_engine_spark.plans import query as query_mod

    d = str(tmp_path_factory.mktemp("idx_join"))
    build_index_resumable(docs, d, buckets=BUCKETS)
    query_mod.invalidate_norms_cache()
    s = IndexSearcher(spark, d, buckets=BUCKETS, norms="join")
    for q in QUERIES:
        got = s.search(q, top_k=10)
        exp = searcher.search(q, top_k=10)
        assert [d_ for d_, _ in got] == [d_ for d_, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            # JVM Math.log vs libm np.log in idf: allow exactly 1 ulp
            assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)
    assert not any(k[0] == d for k in query_mod._DOCLEN_CACHE), (
        "join mode collected doclens to the driver"
    )


def test_search_many_local_matches_search(searcher):
    batch = searcher.search_many_local(QUERIES, top_k=10)
    for q, got in zip(QUERIES, batch):
        assert got == searcher.search(q, top_k=10), q


def test_search_many_relational_matches_brute_force(spark, docs, searcher):
    """The relational batch path is ALL-JVM float math — must equal the
    brute-force oracle exactly (tolerance 0)."""
    out = searcher.search_many_relational(QUERIES, top_k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for i, q in enumerate(QUERIES):
        expected = [
            (r["doc_id"], r["score"])
            for r in bm25_brute_force(docs, q, top_k=10).collect()
        ]
        got = [(d, s) for _, d, s in sorted(by_q.get(i, []))]
        assert got == expected, q
