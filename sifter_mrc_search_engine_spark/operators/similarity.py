"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (pure Catalyst: zip_with +
aggregate, float64 accumulation — codegen, no Python). The scale path is
sign-random-projection LSH: embeddings bucketed by the bit pattern of
``sign(v · plane_j)`` for deterministic pseudo-random hyperplanes; a query
probes its own bucket plus Hamming-1 neighbors and brute-forces only those.
At 10^12 rows the LSH variant turns a full scan into a bucket-pruned scan
(bucket is a partition column of the stored table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10, round_to: int = 4
) -> DataFrame:
    """Exact cosine top-k vs the embedding of ``query_vec_id``:
    ``(vec_id, cos)`` sorted (cos desc, vec_id asc), query row excluded.

    The query vector is a 1-row broadcast cross join; top-k plans as
    TakeOrderedAndProject.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), F.col("q_emb")), round_to).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def sql_cosine_topk(query_vec_id: int, k: int = 10, table: str = "embeddings", round_to: int = 4) -> str:
    """DuckDB twin: same float64 accumulation via list_dot_product-free
    explicit fold (unnest + sum keeps double math identical)."""
    return f"""
WITH q AS (SELECT embedding AS q_emb FROM {table} WHERE vec_id = {query_vec_id}),
pairs AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))) AS dot,
         sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
         sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM {table} e CROSS JOIN q
  WHERE e.vec_id != {query_vec_id}
)
SELECT vec_id, round(dot / (na * nb), {round_to}) AS cos
FROM pairs ORDER BY dot / (na * nb) DESC, vec_id ASC LIMIT {k}
"""


# --- LSH ANN ----------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (splitmix-seeded gaussian)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_ids(embeddings: DataFrame, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """``(vec_id, bucket)`` — bit b of bucket = sign(v · plane_b) > 0.

    Vectorized pandas UDF (numpy matmul per Arrow batch).
    """
    first = embeddings.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"])
    planes = _planes(dim, n_planes, seed)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket_of(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        bits = (m.astype(np.float64) @ planes.T) > 0
        return pd.Series((bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32))

    return embeddings.select("vec_id", "embedding", bucket_of("embedding").alias("bucket"))


def ann_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """LSH-bucketed approximate top-k: probe the query's bucket and all
    Hamming-1 neighbor buckets, exact-score only those rows.

    With 2^8 buckets over sf0.01's 500 rows this scans ~9/256 of the data;
    at scale ``bucket`` is the table's partition key and the IN-filter
    prunes partitions.
    """
    b = lsh_bucket_ids(embeddings, n_planes, seed)
    qrow = b.filter(F.col("vec_id") == query_vec_id).select("bucket", "embedding").first()
    qb = int(qrow["bucket"])
    probe = [qb] + [qb ^ (1 << i) for i in range(n_planes)]
    q = b.filter(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("q_emb"))
    return (
        b.filter(F.col("bucket").isin(probe))
        .filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), F.col("q_emb")), round_to).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
