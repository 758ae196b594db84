"""Token-stream packing: the distributed two-phase prefix sum must equal
the single-window oracle at any partitioning, and chunk assignment must
tile the stream exactly."""

import duckdb
import pytest

from sifter_mrc_search_engine_spark.operators.packing import (
    pack_token_stream,
    sql_pack_token_stream,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pack_matches_duckdb_oracle(docs, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = _rows(pack_token_stream(docs, budget=512))
    exp = sorted(tuple(r) for r in con.execute(sql_pack_token_stream(budget=512)).fetchall())
    assert got == exp


@pytest.mark.parametrize("partitions", [2, 7, 32])
def test_pack_partitioning_invariant(docs, partitions):
    """The two-phase scan is a pure function of (doc_id, n_tokens) —
    identical at any partition count (the property the naive global
    window gets for free by not scaling)."""
    base = _rows(pack_token_stream(docs, budget=512, partitions=4))
    assert _rows(pack_token_stream(docs, budget=512, partitions=partitions)) == base


def test_pack_stream_properties(spark):
    rows = [(1, "a b c"), (2, ""), (3, "d e f g h"), (4, "i j")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_token_stream(df, budget=4).collect()}
    # consecutive docs tile the stream: start = prev start + prev tokens
    assert out[1]["start_pos"] == 0 and out[1]["n_tokens"] == 3
    assert out[2]["start_pos"] == 3 and out[2]["first_chunk"] == -1
    assert out[3]["start_pos"] == 3
    assert out[4]["start_pos"] == 8
    # chunks of size 4: doc1 tokens [0,3) -> chunk 0; doc3 [3,8) -> 0..1
    assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 0)
    assert (out[3]["first_chunk"], out[3]["last_chunk"]) == (0, 1)
    assert (out[4]["first_chunk"], out[4]["last_chunk"]) == (2, 2)


def test_materialize_chunks(docs, sf_dir, spark):
    from sifter_mrc_search_engine_spark.operators.packing import (
        materialize_chunks,
        sql_materialize_chunks,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = _rows(materialize_chunks(docs, budget=512))
    exp = sorted(tuple(r) for r in con.execute(sql_materialize_chunks(budget=512)).fetchall())
    assert got == exp
    # every chunk except the tail is exactly `budget` tokens, and chunk
    # texts cover the full stream in order
    sizes = [r[1] for r in got]
    assert all(s == 512 for s in sizes[:-1]) and 0 < sizes[-1] <= 512
    # cross-doc packing really happens: chunk 0 spans multiple docs
    first = got[0][2].split()
    d0 = docs.orderBy("doc_id").first()
    assert len(first) == 512 and len(d0["text"].split()) < 512


def test_materialize_chunks_plan_shape(docs):
    """The r3 version tokenized the corpus 3x per action and joined
    positions back over a doc_id sort-merge join. Contract now: the
    returned plan tokenizes the source EXACTLY ONCE, contains no join
    (start_pos rides the same rows as the token arrays through the
    window), and shuffles exactly twice — the _pid window exchange and
    the chunk_id assembly."""
    from sifter_mrc_search_engine_spark.operators.packing import materialize_chunks

    out = materialize_chunks(docs, budget=512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan
    assert "hashpartitioning(chunk_id" in plan, plan
