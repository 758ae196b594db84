from sifter_mrc_search_engine_spark.operators.index_build import (
    combine_search_fields,
)


def test_combine_search_fields(spark):
    df = spark.createDataFrame(
        [(1, "alpha title", "body words"), (2, None, "only body"), (3, "only title", None)],
        "doc_id long, title string, content string",
    )
    out = {r["doc_id"]: r["text"] for r in combine_search_fields(df).collect()}
    assert out == {1: "alpha title body words", 2: "only body", 3: "only title"}


def test_combine_missing_field_ignored(spark):
    df = spark.createDataFrame([(1, "just content")], "doc_id long, content string")
    out = combine_search_fields(df).collect()[0]
    assert out["text"] == "just content"
