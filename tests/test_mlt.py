"""More-like-this: semantics + DuckDB twin parity (the driver-gate shape)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.operators import mlt as M


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "spark query engine distributed index"),
        (2, "spark query engine distributed shuffle"),  # near-twin of 1
        (3, "spark index compression varbyte"),
        (4, "cooking recipes pasta tomato"),
        (5, "pasta tomato basil olive"),
        (6, "distributed query planner spark engine"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return [(r["doc_id"], round(r["score"], 4)) for r in df.collect()]


def test_mlt_semantics(docs):
    got = _rows(M.more_like_this_topk(docs, 1, n_terms=5))
    ids = [d for d, _ in got]
    # the source doc is excluded; its near-twin ranks first; the
    # cooking cluster is nowhere near the top
    assert 1 not in ids
    assert ids[0] in (2, 6)
    assert set(ids[:2]) == {2, 6}
    assert ids.index(4) > ids.index(2) if 4 in ids else True
    # cross-cluster: doc 4's neighbours are the pasta docs
    got4 = _rows(M.more_like_this_topk(docs, 4, n_terms=4))
    assert got4 and got4[0][0] == 5


def test_mlt_oracle_parity(docs):
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    for src, n in [(1, 3), (1, 10), (4, 2), (6, 50)]:
        got = _rows(
            M.more_like_this_topk(docs, src, n_terms=n).select(
                "doc_id", F.round("score", 4).alias("score")
            )
        )
        want = [
            (int(r.doc_id), round(float(r.score), 4))
            for r in con.sql(M.sql_more_like_this_topk(src, n)).df().itertuples()
        ]
        assert got == want, (src, n)


def test_mlt_edges(docs):
    # unknown id -> typed empty, not an error
    out = M.more_like_this_topk(docs, 999)
    assert out.columns == ["doc_id", "score"] and out.count() == 0
    with pytest.raises(ValueError, match="n_terms"):
        M.more_like_this_topk(docs, 1, n_terms=0)
    with pytest.raises(ValueError, match="n_terms"):
        M.sql_more_like_this_topk(1, n_terms=0)


def test_mlt_oracle_parity_with_zero_token_doc(spark):
    # a punctuation-only document has doc_len 0 in the ENGINE
    # (size(tokenize) is per-row) but vanished from the twin's old
    # toks-derived dl CTE, shifting n_docs/avgdl enough to change which
    # terms get SELECTED (r5 review, confirmed divergence) — dl now
    # derives per-row from the table on both sides
    rows = [
        (1, "spark query engine distributed index"),
        (2, "spark query engine distributed shuffle"),
        (3, "cooking recipes pasta tomato"),
        (7, "!!! ... ???"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    for src, n in [(1, 5), (3, 3)]:
        got = [
            (int(r["doc_id"]), round(float(r["score"]), 4))
            for r in M.more_like_this_topk(docs, src, n_terms=n)
            .select("doc_id", F.round("score", 4).alias("score"))
            .collect()
        ]
        want = [
            (int(r.doc_id), round(float(r.score), 4))
            for r in con.sql(M.sql_more_like_this_topk(src, n)).df().itertuples()
        ]
        assert got == want, (src, n)
