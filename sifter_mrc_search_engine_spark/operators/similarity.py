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
FROM pairs ORDER BY round(dot / (na * nb), {round_to}) DESC, vec_id ASC LIMIT {k}
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
    if first is None:  # empty table: keep the output shape, no UDF needed
        return embeddings.select(
            "vec_id", "embedding", F.lit(None).cast("int").alias("bucket")
        )
    dim = int(first["d"])
    planes = _planes(dim, n_planes, seed)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket_of(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        bits = (m.astype(np.float64) @ planes.T) > 0
        return pd.Series((bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32))

    return embeddings.select("vec_id", "embedding", bucket_of("embedding").alias("bucket"))


def sql_ann_topk(
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`ann_topk`, fully self-contained SQL.

    The hyperplanes are seed-fixed, so their coefficients are inlined as
    list literals (``%.17g`` round-trips float64 exactly); each row's
    bucket is re-derived in SQL with the same float64 math, the query's
    bucket plus all Hamming-1 neighbors are probed via ``xor``, and only
    probed rows are exact-scored — the same plan the Spark side runs.
    """
    planes = _planes(dim, n_planes, seed)

    def lit(p: np.ndarray) -> str:
        return "[" + ", ".join(f"{c:.17g}" for c in p) + "]"

    plane_cols = ", ".join(f"{lit(planes[j])} AS p{j}" for j in range(n_planes))
    bucket_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(e.embedding[i] AS DOUBLE) * p.p{j}[i])) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )
    probes = ["q.qb"] + [f"xor(q.qb, {1 << j})" for j in range(n_planes)]
    return f"""
WITH p AS (SELECT {plane_cols}),
b AS (
  SELECT e.vec_id, e.embedding, {bucket_terms} AS bucket
  FROM {table} e CROSS JOIN p
),
q AS (SELECT bucket AS qb, embedding AS q_emb FROM b WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT b.vec_id,
         list_sum(list_transform(range(1, {dim} + 1),
                  i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))) AS dot,
         sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
         sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM b CROSS JOIN q
  WHERE b.bucket IN ({", ".join(probes)}) AND b.vec_id != {query_vec_id}
)
SELECT vec_id, round(dot / (na * nb), {round_to}) AS cos
FROM scored ORDER BY round(dot / (na * nb), {round_to}) DESC, vec_id ASC LIMIT {k}
"""


def _hamming_masks(n_planes: int, hamming: int) -> list[int]:
    """All xor masks over ``n_planes`` bits with popcount <= hamming
    (mask 0 first) — the Hamming-ball probe expansion."""
    import itertools

    masks = [0]
    for r in range(1, hamming + 1):
        for combo in itertools.combinations(range(n_planes), r):
            m = 0
            for j in combo:
                m |= 1 << j
            masks.append(m)
    return masks


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 0,
    seed: int = 42,
    round_to: int = 4,
    hamming: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs:
    ``(vec_a, vec_b, cos)`` with ``vec_a < vec_b`` and cosine >= threshold.

    ``n_planes=0``: exact all-pairs self-join (the verification oracle —
    O(n^2), fine for candidate sets, not for a corpus). ``n_planes>0``:
    LSH-bucketed — only SAME-bucKET pairs are scored, turning the
    self-join into a per-bucket equi-join (the 100 TB shape; recall
    trades against 2^n_planes like any sign-projection LSH).
    ``hamming>0`` is the recall knob: side b explodes into its
    Hamming-ball of buckets (1 + Σ C(n_planes, r) probes), so pairs
    whose buckets differ in <= hamming sign bits are also scored —
    candidate volume grows by the probe count, recall approaches exact
    as hamming -> n_planes. Still a pure equi-join after the explode
    (each (a, b) pair matches at most once: probe buckets per vec are
    distinct)."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    if n_planes > 0:
        ba = lsh_bucket_ids(embeddings, n_planes, seed).select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            F.col("bucket").alias("bkt_a"),
        )
        bb = ba.select(
            F.col("vec_a").alias("vec_b"),
            F.col("emb_a").alias("emb_b"),
            F.col("bkt_a").alias("bkt_b"),
        )
        if hamming > 0:
            masks = _hamming_masks(n_planes, hamming)
            bb = bb.withColumn(
                "bkt_b",
                F.explode(
                    F.array(
                        *[F.col("bkt_b").bitwiseXOR(F.lit(m)) for m in masks]
                    )
                ),
            )
        pairs = ba.join(bb, (ba["bkt_a"] == bb["bkt_b"]) & (ba["vec_a"] < bb["vec_b"]))
    else:
        pairs = a.join(b, a["vec_a"] < b["vec_b"])
    cos = cosine_expr(F.col("emb_a"), F.col("emb_b"))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("_cos"))
        .filter(F.col("_cos") >= threshold)
        .select("vec_a", "vec_b", F.round("_cos", round_to).alias("cos"))
    )


def sql_embedding_near_dup_pairs(
    threshold: float = 0.9,
    n_planes: int = 0,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    round_to: int = 4,
    hamming: int = 0,
) -> str:
    """DuckDB twin of :func:`embedding_near_dup_pairs`; with n_planes>0
    the bucket derivation uses the same inlined hyperplane literals as
    :func:`sql_ann_topk`, and ``hamming>0`` matches any probe in b's
    Hamming ball via the same xor-mask list."""
    dot = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    nrm = (
        "sqrt(list_sum(list_transform({t}.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    cos = f"{dot} / ({nrm.format(t='a')} * {nrm.format(t='b')})"
    if n_planes > 0:
        planes = _planes(dim, n_planes, seed)
        plane_cols = ", ".join(
            "[" + ", ".join(f"{c:.17g}" for c in planes[j]) + f"] AS p{j}"
            for j in range(n_planes)
        )
        bucket_terms = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> CAST(e.embedding[i] AS DOUBLE) * p.p{j}[i])) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
        src = (
            f"WITH p AS (SELECT {plane_cols}), "
            f"src AS (SELECT e.vec_id, e.embedding, {bucket_terms} AS bucket "
            f"FROM {table} e CROSS JOIN p) "
        )
        if hamming > 0:
            masks = ", ".join(str(m) for m in _hamming_masks(n_planes, hamming))
            join_cond = (
                f"list_contains(list_transform([{masks}], "
                "m -> xor(b.bucket, m)), a.bucket) AND a.vec_id < b.vec_id"
            )
        else:
            join_cond = "a.bucket = b.bucket AND a.vec_id < b.vec_id"
        frm = "src a JOIN src b ON " + join_cond
    else:
        src = ""
        frm = f"{table} a JOIN {table} b ON a.vec_id < b.vec_id"
    return f"""
{src}SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, {round_to}) AS cos
FROM {frm}
WHERE {cos} >= {threshold}
"""


def write_bucketed_embeddings(
    embeddings: DataFrame, path: str, n_planes: int = 8, seed: int = 42
) -> None:
    """Persist ``(vec_id, embedding)`` partitioned by LSH bucket — the
    100 TB serving shape: ``ann_topk(buckets=spark.read.parquet(path))``
    turns the probe IN-filter into parquet partition pruning, so each
    query scans ~(1+n_planes)/2^n_planes of the corpus."""
    lsh_bucket_ids(embeddings, n_planes, seed).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path)


def _probe_set(qb: int, n_planes: int, hamming: int) -> list[int]:
    """Query bucket plus all buckets within the given Hamming distance."""
    import itertools

    out = {qb}
    for r in range(1, hamming + 1):
        for combo in itertools.combinations(range(n_planes), r):
            x = qb
            for j in combo:
                x ^= 1 << j
            out.add(x)
    return sorted(out)


def multi_table_bucket_ids(
    embeddings: DataFrame, n_planes: int = 6, n_tables: int = 8, seed: int = 42
) -> DataFrame:
    """``(vec_id, embedding, buckets: array<int>)`` — element ``t`` is the
    sign-projection bucket under table ``t``'s hyperplanes (seed + t).

    ONE vectorized pandas UDF computes every table's bits in a single
    ``(batch, dim) @ (dim, n_tables*n_planes)`` matmul per Arrow batch.
    """
    first = embeddings.select(F.size("embedding").alias("d")).first()
    if first is None:  # empty table: keep the output shape, no UDF needed
        return embeddings.select(
            "vec_id", "embedding", F.lit(None).cast("array<int>").alias("buckets")
        )
    dim = int(first["d"])
    all_planes = np.concatenate(
        [_planes(dim, n_planes, seed + t) for t in range(n_tables)], axis=0
    )  # (n_tables*n_planes, dim)
    weights = 1 << np.arange(n_planes)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def buckets_of(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (m @ all_planes.T) > 0  # (batch, n_tables*n_planes)
        per_table = bits.reshape(m.shape[0], n_tables, n_planes)
        bk = (per_table * weights).sum(axis=2).astype(np.int32)
        return pd.Series(list(bk))

    return embeddings.select("vec_id", "embedding", buckets_of("embedding").alias("buckets"))


def ann_topk_multi(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    hamming: int = 1,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """Multi-table multi-probe LSH ANN: a row is a candidate when ANY of
    the ``n_tables`` independent hash tables places it within Hamming
    distance ``hamming`` of the query's bucket; only candidates are
    exact-scored. Recall behaves as 1-(1-p)^L for per-table hit rate p —
    the standard lever when a single table's recall is not enough (e.g.
    weakly clustered embeddings). At 10^12 rows each table is its own
    bucket-partitioned copy of the id space (the classic LSH memory/
    recall trade); here all tables ride one scan as an array column.

    A missing ``query_vec_id`` (or an empty table) returns an empty
    ``(vec_id, cos)`` frame, mirroring :func:`ivf_topk` (the one qrow
    lookup covers both cases — ``multi_table_bucket_ids`` is empty-safe).
    """
    b = multi_table_bucket_ids(embeddings, n_planes, n_tables, seed)
    qrow = b.filter(F.col("vec_id") == query_vec_id).select("buckets", "embedding").first()
    if qrow is None:
        return embeddings.sparkSession.createDataFrame([], "vec_id long, cos double")
    probes = [
        _probe_set(int(qrow["buckets"][t]), n_planes, hamming) for t in range(n_tables)
    ]
    cond = None
    for t in range(n_tables):
        c = F.element_at("buckets", t + 1).isin(probes[t])
        cond = c if cond is None else (cond | c)
    q_emb = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    return (
        b.filter(cond)
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), q_emb), round_to).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def sql_ann_topk_multi(
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    hamming: int = 1,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`ann_topk_multi`: per-table hyperplanes are
    inlined as ``%.17g`` literals, each row's per-table bucket is
    re-derived with the same float64 math, and the candidate OR-filter
    probes every table's Hamming ball around the query's bucket."""

    def lit(p: np.ndarray) -> str:
        return "[" + ", ".join(f"{c:.17g}" for c in p) + "]"

    plane_cols, bucket_exprs = [], []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed + t)
        for j in range(n_planes):
            plane_cols.append(f"{lit(planes[j])} AS p{t}_{j}")
        bucket_exprs.append(
            " + ".join(
                f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
                f"i -> CAST(e.embedding[i] AS DOUBLE) * p.p{t}_{j}[i])) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
                for j in range(n_planes)
            )
        )
    bucket_sel = ", ".join(f"{ex} AS bucket_{t}" for t, ex in enumerate(bucket_exprs))

    # probe masks: bucket_t must be within the Hamming ball of q.bucket_t;
    # enumerate the xor deltas (identical for every query bucket)
    deltas = [x ^ 0 for x in _probe_set(0, n_planes, hamming)]
    ors = " OR ".join(
        "b.bucket_%d IN (%s)" % (t, ", ".join(f"xor(q.qb_{t}, {d})" for d in deltas))
        for t in range(n_tables)
    )
    q_sel = ", ".join(f"bucket_{t} AS qb_{t}" for t in range(n_tables))
    return f"""
WITH p AS (SELECT {", ".join(plane_cols)}),
b AS (SELECT e.vec_id, e.embedding, {bucket_sel} FROM {table} e CROSS JOIN p),
q AS (SELECT {q_sel}, embedding AS q_emb FROM b WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT b.vec_id,
         list_sum(list_transform(range(1, {dim} + 1),
                  i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))) AS dot,
         sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
         sqrt(list_sum(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM b CROSS JOIN q
  WHERE ({ors}) AND b.vec_id != {query_vec_id}
)
SELECT vec_id, round(dot / (na * nb), {round_to}) AS cos
FROM scored ORDER BY round(dot / (na * nb), {round_to}) DESC, vec_id ASC LIMIT {k}
"""


def ann_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    round_to: int = 4,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: probe the query's bucket and all
    Hamming-1 neighbor buckets, exact-score only those rows.

    ``buckets`` (from :func:`write_bucketed_embeddings`) skips the
    per-call bucket recompute; the probe IN-filter then prunes stored
    partitions. One driver job fetches the query row (bucket + vector);
    the query vector rides the plan as a 64-float literal — no second
    scan, no broadcast join.
    """
    b = buckets if buckets is not None else lsh_bucket_ids(embeddings, n_planes, seed)
    qrow = b.filter(F.col("vec_id") == query_vec_id).select("bucket", "embedding").first()
    if qrow is None:
        return embeddings.sparkSession.createDataFrame([], "vec_id long, cos double")
    qb = int(qrow["bucket"])
    probe = [qb] + [qb ^ (1 << i) for i in range(n_planes)]
    q_emb = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    return (
        b.filter(F.col("bucket").isin(probe))
        .filter(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), q_emb), round_to).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + cluster-pruned scan


def kmeans_centroids(
    embeddings: DataFrame, k: int = 16, iters: int = 5, seed: int = 42
) -> list:
    """Deterministic distributed Lloyd's k-means over the embedding
    column; returns the k centroids as plain Python lists.

    * init: the k vectors with the smallest ``md5(vec_id|seed)`` — a
      seeded draw independent of data order/partitioning
    * assign: nearest centroid by squared L2, centroids inlined as
      float64 literals (pure codegen, no UDF; ``array_position`` of the
      min breaks ties toward the lowest cluster id)
    * update: per-dimension means via ``posexplode`` + groupBy — one
      shuffle per iteration, k·dim rows to the driver — ROUNDED to 9
      decimals before re-inlining, so the ±1-ulp noise of Spark's
      task-order-dependent partial-aggregate merges cannot flip a
      near-boundary assignment between runs (a vector within 1e-9 of
      exactly equidistant could still flip; measure-zero in float data)
    * an emptied cluster keeps its previous centroid

    Iterative and driver-coordinated (the classic Lloyd loop): NOT
    SQL-expressible, so IVF correctness is pinned by a numpy twin in
    pytest rather than a DuckDB oracle. The source is persisted for the
    duration of the loop (seed draw + one assignment scan per
    iteration would otherwise re-read and re-decode it each job).
    """
    from pyspark import StorageLevel

    embeddings = embeddings.persist(StorageLevel.MEMORY_AND_DISK)
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f"|{seed}"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    try:
        seeds = (
            embeddings.select("vec_id", "embedding", draw.alias("_d"))
            .orderBy("_d", "vec_id")
            .limit(k)
            .collect()
        )
        centroids = [[float(x) for x in r["embedding"]] for r in seeds]

        for _ in range(max(iters, 0)):
            assigned = embeddings.select(
                "vec_id", "embedding",
                _nearest_centroid_expr(centroids).alias("cluster"),
            )
            rows = (
                assigned.select("cluster", F.posexplode("embedding").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.avg("v").alias("m"))
                .collect()
            )
            new = [list(c) for c in centroids]  # emptied clusters persist
            by_c: dict = {}
            for r in rows:
                by_c.setdefault(int(r["cluster"]), {})[int(r["dim"])] = round(
                    float(r["m"]), 9
                )
            for c, dims in by_c.items():
                for d, m in dims.items():
                    new[c][d] = m
            centroids = new
    finally:
        embeddings.unpersist()
    return centroids


def _nearest_centroid_expr(centroids: list):
    """0-based nearest-centroid index by squared L2, as one codegen
    expression over inlined centroid literals."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_assignments(embeddings: DataFrame, centroids: list) -> DataFrame:
    """``(vec_id, embedding, cluster)`` under the given centroids."""
    return embeddings.select(
        "vec_id", "embedding", _nearest_centroid_expr(centroids).alias("cluster")
    )


def write_ivf_embeddings(
    embeddings: DataFrame,
    path: str,
    k: int = 16,
    iters: int = 5,
    seed: int = 42,
) -> list:
    """Persist the IVF layout: embeddings PARTITIONED BY cluster (probes
    become parquet partition pruning — the 100 TB serving shape, same
    pattern as :func:`write_bucketed_embeddings`) plus centroids.json,
    written through the Hadoop FileSystem for remote index dirs so an
    ``s3://``/``hdfs://`` layout works end to end, not just the parquet
    half. Returns the centroids."""
    import json as _json

    cents = kmeans_centroids(embeddings, k=k, iters=iters, seed=seed)
    ivf_assignments(embeddings, cents).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(f"{path}/vectors")
    # slim (vec_id, cluster) sidecar, globally SORTED by vec_id so an
    # in-index query lookup is a narrow scan with row-group min/max
    # pruning + ONE pruned partition read — without it, search_id pays
    # a full scan of the wide embedding table per query just to fetch
    # the query row (r5 review). Derived from the written layout
    # (column-pruned: the embedding column is never read back).
    spark = embeddings.sparkSession
    spark.read.parquet(f"{path}/vectors").select("vec_id", "cluster").sort(
        "vec_id"
    ).write.mode("overwrite").parquet(f"{path}/vec_clusters")
    _fs_write_text(spark, f"{path}/centroids.json", _json.dumps(cents))
    return cents


def _fs_write_text(spark, path: str, text: str) -> None:
    """Sidecar write on whatever filesystem ``path`` lives on — thin
    wrapper over the shared :mod:`..functions.fsio` (one copy of the
    local-vs-Hadoop-FS routing for every index family)."""
    from ..functions import fsio

    fsio.write_text(path, text, spark)


def _fs_exists(spark, path: str) -> bool:
    """Existence check via the shared :mod:`..functions.fsio` routing —
    deterministic classification beats catching the reader's exception,
    which would also swallow a corrupt layout."""
    from ..functions import fsio

    return fsio.exists(path, spark)


def _fs_read_text(spark, path: str) -> str:
    """Sidecar read via the shared :mod:`..functions.fsio` routing."""
    from ..functions import fsio

    return fsio.read_text(path, spark)


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 42,
    round_to: int = 4,
    centroids: list | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k: rank centroids by distance to the query vector
    (driver-side — k·dim floats), scan only the ``nprobe`` nearest
    clusters, score those candidates EXACTLY (same cosine expression as
    :func:`cosine_topk`). ``centroids``/``assignments`` accept the
    persisted layout from :func:`write_ivf_embeddings`; by default both
    derive from ``embeddings``."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, k=n_clusters, iters=iters, seed=seed)
    if assignments is None:
        assignments = ivf_assignments(embeddings, centroids)
    qrow = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        "embedding"
    ).collect()
    if not qrow:
        return embeddings.sparkSession.createDataFrame([], "vec_id long, cos double")
    # ONE rank-probe-score implementation (ivf_search_vector) serves
    # ivf_topk, IvfSearcher.search and .search_id — hand-synced copies
    # are how "identical results" parity drifts (r5 review)
    return ivf_search_vector(
        assignments, centroids, [float(x) for x in qrow[0]["embedding"]],
        k=k, nprobe=nprobe, round_to=round_to, exclude_vec_id=query_vec_id,
    )


def sql_ivf_topk(
    query_vec_id: int,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`ivf_topk` — the Lloyd loop UNROLLED as one
    CTE chain (the iteration count is a fixed parameter, so the
    "iterative, not SQL-expressible" loop is in fact a bounded chain of
    ``iters`` assignment+update layers):

    * ``c0``: the k seed vectors by the same md5 draw
      (``('0x'||substr(md5(id||'|seed'),1,15))::BIGINT`` == Spark's
      ``conv(substring(md5(...)))``), cluster id = 0-based rank
    * ``a{{i}}``/``c{{i+1}}``: nearest-centroid assignment (squared-L2
      argmin, ties toward the lowest cluster — ``row_number`` ordered by
      (dist, cluster) mirrors Spark's ``array_position`` of the min),
      then per-dimension means ROUNDED TO 9 DECIMALS — the same rounding
      Spark applies before re-inlining, which is what makes the two
      engines' task-order-dependent float sums agree bitwise (verified:
      DuckDB ``round(x,9)`` == Python ``round(x,9)`` on 20k random
      doubles, 0 mismatches); emptied clusters keep the previous
      centroid via the LEFT JOIN + coalesce
    * final assignment under the converged centroids, centroid ranking
      by distance to the query vector, and exact cosine over the
      ``nprobe`` probed clusters only — the same plan Spark runs.
    """
    q = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM {table}
),
c0 AS (
  SELECT row_number() OVER (ORDER BY d, vec_id) - 1 AS cluster, cent FROM (
    SELECT vec_id, emb AS cent,
           ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '|{seed}'), 1, 15))::BIGINT AS d
    FROM e ORDER BY d, vec_id LIMIT {n_clusters}
  )
)"""
    dist = (
        "list_sum(list_transform(range(1, {dim} + 1), "
        "j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j])))"
    )

    def assign(name: str, cents: str) -> str:
        d = dist.format(dim=dim, a="e.emb", b="c.cent")
        return f""",
{name} AS (
  SELECT vec_id, emb, cluster FROM (
    SELECT e.vec_id, e.emb, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {d}, c.cluster) AS rn
    FROM e CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""

    for i in range(max(iters, 0)):
        q += assign(f"a{i}", f"c{i}")
        q += f""",
c{i + 1} AS (
  SELECT p.cluster, coalesce(u.cent, p.cent) AS cent
  FROM c{i} p LEFT JOIN (
    SELECT cluster, list(m ORDER BY dm) AS cent FROM (
      SELECT a.cluster, t.j AS dm, round(avg(a.emb[t.j]), 9) AS m
      FROM a{i} a, LATERAL unnest(range(1, {dim} + 1)) AS t(j)
      GROUP BY a.cluster, t.j
    ) GROUP BY cluster
  ) u ON p.cluster = u.cluster
)"""
    final_c = f"c{max(iters, 0)}"
    qdist = dist.format(dim=dim, a="q.q_emb", b="c.cent")
    q += assign("af", final_c)
    q += f""",
q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {query_vec_id}),
pr AS (
  SELECT c.cluster FROM {final_c} c CROSS JOIN q
  ORDER BY {qdist}, c.cluster LIMIT {max(nprobe, 1)}
),
scored AS (
  SELECT a.vec_id,
         list_sum(list_transform(range(1, {dim} + 1),
                  j -> a.emb[j] * q.q_emb[j])) AS dot,
         sqrt(list_sum(list_transform(a.emb, x -> x * x))) AS na,
         sqrt(list_sum(list_transform(q.q_emb, x -> x * x))) AS nb
  FROM af a JOIN pr ON a.cluster = pr.cluster CROSS JOIN q
  WHERE a.vec_id != {query_vec_id}
)
SELECT vec_id, round(dot / (na * nb), {round_to}) AS cos
FROM scored ORDER BY round(dot / (na * nb), {round_to}) DESC, vec_id ASC LIMIT {k}
"""
    return q


def ivf_search_vector(
    vectors: DataFrame,
    centroids: list,
    query: list,
    k: int = 10,
    nprobe: int = 4,
    round_to: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVF top-k for an ARBITRARY query vector (not a row of the table —
    the serving shape: embeddings come from a model, not the corpus):
    rank centroids driver-side (k·dim floats), scan only the ``nprobe``
    nearest clusters of ``vectors`` (``(vec_id, embedding, cluster)``;
    over the persisted layout the cluster filter is parquet PARTITION
    PRUNING), score candidates exactly with the query inlined as
    literals — no broadcast, no second scan."""
    qv = [float(x) for x in query]
    if centroids and len(qv) != len(centroids[0]):
        # the likely serving-path mistake is a model/index dim mismatch;
        # unchecked it would rank clusters on a silent zip-truncation
        # and score every candidate to NULL (zip_with pads with nulls)
        raise ValueError(
            f"query vector has {len(qv)} dims but the index was built "
            f"over {len(centroids[0])}-dim embeddings"
        )
    ranked = sorted(
        range(len(centroids)),
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(qv, centroids[c])), c
        ),
    )[: max(nprobe, 1)]
    cand = vectors.filter(F.col("cluster").isin([int(c) for c in ranked]))
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    q_emb = F.array(*[F.lit(x) for x in qv])
    return (
        cand.select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), q_emb), round_to).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


class IvfSearcher:
    """Serve ANN queries from a persisted IVF layout
    (:func:`write_ivf_embeddings`): centroids.json loads once
    (driver-side, k·dim floats — constant in corpus size), every query
    is one cluster-pruned scan over the partitioned vectors table.

    This is the 10^12-vector posture: the driver holds ONLY the coarse
    quantizer; candidate scoring stays a distributed codegen plan whose
    scan reads ``nprobe/k`` of the partitions (PartitionFilters —
    asserted in tests/test_plans.py). Contrast ``preload``-style ANN
    serving, which would collect the vectors and die at scale."""

    def __init__(self, spark, index_dir: str):
        import json as _json

        self.spark = spark
        self.index_dir = index_dir
        self.centroids = _json.loads(
            _fs_read_text(spark, f"{index_dir}/centroids.json")
        )
        self.vectors = spark.read.parquet(f"{index_dir}/vectors")
        clusters_dir = f"{index_dir}/vec_clusters"
        # layouts written before the sidecar existed fall back to the
        # unpruned vec_id lookup in search_id
        self.vec_clusters = (
            spark.read.parquet(clusters_dir)
            if _fs_exists(spark, clusters_dir)
            else None
        )

    def search(
        self, query: list, k: int = 10, nprobe: int = 4, round_to: int = 4
    ) -> DataFrame:
        """Top-k ``(vec_id, cos)`` for a raw query vector."""
        return ivf_search_vector(
            self.vectors, self.centroids, query, k=k, nprobe=nprobe,
            round_to=round_to,
        )

    def search_id(
        self, query_vec_id: int, k: int = 10, nprobe: int = 4,
        round_to: int = 4,
    ) -> DataFrame:
        """Top-k for a vector already IN the index (itself excluded) —
        identical results to :func:`ivf_topk` over the same centroids
        (pinned by pytest; the probe/score path IS
        :func:`ivf_search_vector`, not a reimplementation).

        The query-row fetch goes through the ``vec_clusters`` sidecar
        (sorted narrow scan -> cluster) and then ONE pruned partition of
        the vectors table — NOT a vec_id filter over the full wide
        table, which would full-scan all k partitions per query and
        contradict the cluster-pruned posture above (r5 review)."""
        qrow = None
        if self.vec_clusters is not None:
            hit = (
                self.vec_clusters.filter(F.col("vec_id") == query_vec_id)
                .select("cluster")
                .collect()
            )
            if not hit:
                return self.spark.createDataFrame(
                    [], "vec_id long, cos double"
                )
            qrow = (
                self.vectors.filter(
                    (F.col("cluster") == hit[0]["cluster"])
                    & (F.col("vec_id") == query_vec_id)
                )
                .select("embedding")
                .collect()
            )
        else:  # pre-sidecar layout: unpruned lookup
            qrow = (
                self.vectors.filter(F.col("vec_id") == query_vec_id)
                .select("embedding")
                .collect()
            )
        if not qrow:
            return self.spark.createDataFrame([], "vec_id long, cos double")
        return ivf_search_vector(
            self.vectors, self.centroids,
            [float(x) for x in qrow[0]["embedding"]],
            k=k, nprobe=nprobe, round_to=round_to,
            exclude_vec_id=query_vec_id,
        )
