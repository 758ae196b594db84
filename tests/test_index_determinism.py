"""The physical index must be byte-identical regardless of input
partitioning / parallelism — the property that makes the N vs 4N scaling
runs comparable and resume byte-stable."""

from sifter_mrc_search_engine_spark.operators.compressed_index import (
    build_compressed_index,
)
from sifter_mrc_search_engine_spark.sources.pages import synthesize_pages


def _sig(rows):
    return sorted(
        (
            r["term"], r["segment"], r["df"], r["n"],
            bytes(r["gaps"]), bytes(r["tfs"]), bytes(r["skips"]),
            bytes(r["blockmax"]), r["max_impact"],
        )
        for r in rows
    )


def test_index_identical_across_partitioning(spark):
    docs = synthesize_pages(spark, 500, partitions=3).selectExpr(
        "cast(split(url, '/')[4] as long) as doc_id", "text"
    )
    a = build_compressed_index(docs.repartition(2), salt_threshold=200, block_size=16).collect()
    b = build_compressed_index(docs.repartition(17), salt_threshold=200, block_size=16).collect()
    assert _sig(a) == _sig(b)
