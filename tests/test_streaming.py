"""Structured Streaming incremental index: segments must answer queries
identically to a batch build over the full corpus."""

import pytest

from sifter_mrc_search_engine_spark.operators.bm25 import bm25_brute_force
from sifter_mrc_search_engine_spark.sources.pages import VOCAB, synthesize_pages
from sifter_mrc_search_engine_spark.streaming.incremental import (
    MultiSegmentSearcher,
    compact_segments,
    list_segments,
    stream_build_index,
)

N_DOCS = 600


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    in_dir, idx_dir, ckpt = str(root / "in"), str(root / "idx"), str(root / "ckpt")
    docs = synthesize_pages(spark, N_DOCS, partitions=4).selectExpr(
        "cast(split(url, '/')[4] as long) as doc_id", "text"
    ).cache()
    # three arriving chunks
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 600)]):
        docs.filter(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{in_dir}/chunk={i}")
    stream_build_index(spark, f"{in_dir}/chunk=*", idx_dir, ckpt, buckets=8)
    return docs, idx_dir


def test_segments_created(spark, streamed):
    _, idx_dir = streamed
    assert len(list_segments(idx_dir)) >= 1


QUERIES = [VOCAB[0], f"{VOCAB[0]} {VOCAB[40]}", f"{VOCAB[2]} {VOCAB[7]} {VOCAB[100]}"]


@pytest.mark.parametrize("q", QUERIES)
def test_multisegment_search_equals_batch_oracle(spark, streamed, q):
    docs, idx_dir = streamed
    s = MultiSegmentSearcher(spark, idx_dir, buckets=8)
    expected = [
        (r["doc_id"], r["score"]) for r in bm25_brute_force(docs, q, top_k=10).collect()
    ]
    got = s.search(q, top_k=10)
    assert [d for d, _ in got] == [d for d, _ in expected], q
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)


def test_streaming_checkpoint_no_reprocess(spark, streamed):
    docs, idx_dir = streamed
    n_before = len(list_segments(idx_dir))
    # re-running the stream with the same checkpoint ingests nothing new
    import re

    ckpt = idx_dir.replace("idx", "ckpt")
    in_dir = idx_dir.replace("idx", "in")
    stream_build_index(spark, f"{in_dir}/chunk=*", idx_dir, ckpt, buckets=8)
    assert len(list_segments(idx_dir)) == n_before


def test_compaction_preserves_results(spark, streamed):
    docs, idx_dir = streamed
    compact_dir = compact_segments(spark, idx_dir, buckets=8)
    from sifter_mrc_search_engine_spark.plans.query import IndexSearcher

    s = IndexSearcher(spark, compact_dir, buckets=8)
    for q in QUERIES:
        expected = [
            (r["doc_id"], r["score"])
            for r in bm25_brute_force(docs, q, top_k=10).collect()
        ]
        got = s.search(q, top_k=10)
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, rel=1e-12, abs=1e-12)
