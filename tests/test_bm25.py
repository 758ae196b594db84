"""BM25 brute-force scorer vs an independent DuckDB implementation."""

import duckdb
import pytest

from sifter_mrc_search_engine_spark.operators.bm25 import (
    bm25_brute_force,
    bm25_oracle_sql,
)
from sifter_mrc_search_engine_spark.operators.index_build import (
    build_postings,
    corpus_stats,
    doc_frequencies,
    doc_lengths,
    term_frequencies,
)

QUESTIONS = [
    "the fast query",
    "spark join merge",
    "customer order line",
    "nonexistentterm",
    "window",
]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_tf_df_doclen_against_duckdb(docs, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    tf = term_frequencies(docs)
    got_tf = {(r["term"], r["doc_id"]): r["tf"] for r in tf.collect()}
    exp = con.execute(
        "SELECT term, doc_id, count(*) FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS term FROM documents) GROUP BY 1,2"
    ).fetchall()
    assert got_tf == {(t, d): c for t, d, c in exp}

    dl = {r["doc_id"]: r["doc_len"] for r in doc_lengths(docs).collect()}
    exp_dl = dict(
        con.execute(
            "SELECT doc_id, count(*) FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS term FROM documents) GROUP BY 1"
        ).fetchall()
    )
    assert dl == exp_dl

    stats = corpus_stats(doc_lengths(docs)).collect()[0]
    n, avgdl = con.execute(
        "SELECT count(*), avg(n) FROM (SELECT doc_id, count(*) n FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS term FROM documents) GROUP BY 1)"
    ).fetchone()
    assert stats["n_docs"] == n
    assert abs(stats["avgdl"] - avgdl) < 1e-9


@pytest.mark.parametrize("q", QUESTIONS)
def test_bm25_topk_matches_duckdb(docs, sf_dir, q):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    got = [
        (r["doc_id"], round(r["score"], 4))
        for r in bm25_brute_force(docs, q, top_k=10).collect()
    ]
    exp = con.execute(bm25_oracle_sql(q, top_k=10)).fetchall()
    assert got == [(d, s) for d, s in exp], q


def test_postings_sorted_and_df_consistent(docs):
    post = build_postings(docs).collect()
    tf = term_frequencies(docs)
    df_exp = {r["term"]: r["df"] for r in doc_frequencies(tf).collect()}
    for row in post:
        ids = [p["doc_id"] for p in row["postings"]]
        assert ids == sorted(ids)
        assert row["df"] == len(ids) == df_exp[row["term"]]
        assert 0 <= row["bucket"] < 64
