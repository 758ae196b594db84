"""NSP pair construction + MLM masking — the reference's randomized
operators (J3/R1/R2/R3), re-expressed deterministically for Spark.

The reference builds next-sentence-prediction pairs with Python RNG and an
in-memory used-key set (reference: modules/lm_post_training/
preprocessor.py:214-307) and masks tokens per-row with ``random.shuffle``
(preprocessor.py:309-366). Distributed determinism replaces stateful RNG:

  * positives: ``lead(sentence) over (partition by article order by pos)``
  * the label coin (prob p, preprocessor.py:23, :274-285) and the negative
    draw use seeded hashes of the pair key — reproducible under any
    partitioning (no ``rand()``, whose value depends on partition layout)
  * negatives pair each left sentence with a pseudo-random sentence from a
    DIFFERENT article (hash-rank join), mirroring the retry-until-foreign
    loop (preprocessor.py:228-241); the no-duplicate guarantee holds by
    construction (one negative per left key — the ``no_dupplicate``
    strategy, preprocessor.py:26-27)
  * MLM masking: vectorized numpy with a per-row seeded generator; ratios
    and 80/10/10 splits per preprocessor.py:352-363

The statistical contract mirrors the reference's own tests
(tests/lm_post_training/preprocessor_test.py:71-158): mask ratio mean in
(0.08, 0.15), label balance, prob=1 -> all positive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

MASK_TOKEN = -1  # stand-in id for [MASK]; real vocab ids are >= 10
MAX_MASKS = 40  # preprocessor.py:352
MASK_RATIO = 0.15


def _hash64(col, seed: int):
    """Deterministic nonnegative 60-bit hash of a string column + seed.

    md5-based (NOT xxhash64) so a DuckDB oracle can reproduce every draw:
    ``('0x' || substr(md5(x || '|seed'), 1, 15))::BIGINT`` is the exact
    SQL twin (the repo's established cross-engine hash construct).
    """
    h = F.md5(F.concat(col.cast("string"), F.lit(f"|{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def _hash_u01(col, seed: int):
    """Deterministic uniform [0,1) from a column value + seed."""
    return (F.pmod(_hash64(col, seed), F.lit(1_000_000_007)).cast("double")) / F.lit(
        1_000_000_007.0
    )


def sentence_rows(articles: DataFrame) -> DataFrame:
    """(article_id, pos, sentence) from (article_id, sentences array)."""
    return articles.select(
        "article_id", F.posexplode("sentences").alias("pos", "sentence")
    )


def nsp_pairs(
    articles: DataFrame, prob: float = 0.5, seed: int = 42, pool_buckets: int = 64
) -> DataFrame:
    """``(first, second, label)`` — label 1 = true next sentence.

    Positives from ``lead`` (J3); the per-pair coin decides whether the
    positive is kept or swapped for a foreign negative (R1/R2).

    Scale shape: the negative pool is NEVER broadcast (at corpus scale
    that would broadcast every sentence). Pool sentences are hashed into
    ``pool_buckets`` buckets with a per-bucket seeded rank; each pair
    draws (bucket, rank) from hashes of its own key and the draw resolves
    via a plain shuffled equi-join on (bucket, rank). Only the B-row
    bucket-size table touches the driver. Ranks are assigned by a
    per-bucket window over hash order, so determinism holds under any
    partitioning; at 10^12 sentences raise ``pool_buckets`` so each
    bucket's window sort stays a bounded single-task unit.
    """
    rows = sentence_rows(articles)
    w = Window.partitionBy("article_id").orderBy("pos")
    pairs = rows.select(
        "article_id",
        "pos",
        F.col("sentence").alias("first"),
        F.lead("sentence").over(w).alias("next_sent"),
    ).filter(F.col("next_sent").isNotNull())

    coin = _hash_u01(F.concat_ws("|", "article_id", "pos"), seed)
    pairs = pairs.withColumn("label", (coin < F.lit(prob)).cast("int"))

    # negative pool: bucketed + per-bucket seeded hash rank
    bkt = F.pmod(_hash64(F.col("sentence"), seed + 1), F.lit(pool_buckets)).cast("int")
    wb = Window.partitionBy("bucket").orderBy(
        _hash64(F.col("neg_sent"), seed + 1), "neg_article", "pos"
    )
    pool = (
        rows.select(
            F.col("article_id").alias("neg_article"),
            "pos",
            F.col("sentence").alias("neg_sent"),
            bkt.alias("bucket"),
        )
        .withColumn("rank", F.row_number().over(wb))
        .drop("pos")
    )
    # bucket-size table: <= pool_buckets rows — the ONLY driver traffic
    sizes = {
        int(r["bucket"]): int(r["cnt"])
        for r in pool.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    nonempty = sorted(sizes)
    bkt_arr = F.array(*[F.lit(b) for b in nonempty])
    size_map = F.create_map(
        *[F.lit(x) for b in nonempty for x in (b, sizes[b])]
    )
    key = F.concat_ws("|", "article_id", "pos")
    cand_bucket = F.element_at(
        bkt_arr, (F.pmod(_hash64(key, seed + 2), F.lit(len(nonempty))) + 1).cast("int")
    )
    pairs = pairs.withColumn("cand_bucket", cand_bucket)
    pairs = pairs.withColumn("bsize", F.element_at(size_map, F.col("cand_bucket")))
    pairs = pairs.withColumn(
        "cand_rank",
        F.pmod(_hash64(key, seed + 3), F.col("bsize")) + 1,
    )
    # draw #1: shuffled equi-join on (bucket, rank) — no broadcast
    joined = pairs.join(
        pool,
        (pairs["cand_bucket"] == pool["bucket"]) & (pairs["cand_rank"] == pool["rank"]),
        "left",
    )
    # same-article collision -> fall back to the next rank in the bucket
    collide = F.col("neg_article") == F.col("article_id")
    pairs2 = joined.drop("bucket", "rank").withColumn(
        "cand_rank2", F.when(collide, F.pmod(F.col("cand_rank"), F.col("bsize")) + 1)
    )
    pool2 = pool.select(
        F.col("neg_article").alias("neg_article2"),
        F.col("neg_sent").alias("neg_sent2"),
        F.col("bucket").alias("bucket2"),
        F.col("rank").alias("rank2"),
    )
    joined2 = pairs2.join(
        pool2,
        (pairs2["cand_bucket"] == pool2["bucket2"])
        & (pairs2["cand_rank2"] == pool2["rank2"]),
        "left",
    )
    neg = F.when(collide, F.col("neg_sent2")).otherwise(F.col("neg_sent"))
    neg_art = F.when(collide, F.col("neg_article2")).otherwise(F.col("neg_article"))
    out = joined2.select(
        "article_id",
        "pos",
        "first",
        F.when(F.col("label") == 1, F.col("next_sent")).otherwise(neg).alias("second"),
        "label",
        neg_art.alias("_neg_article"),
    )
    # drop the (rare) pair whose fallback is STILL same-article
    out = out.filter(
        (F.col("label") == 1) | (F.col("_neg_article") != F.col("article_id"))
    )
    return out.select("first", "second", "label")


def sql_nsp_pairs(
    rows_sql: str, prob: float = 0.5, seed: int = 42, pool_buckets: int = 64
) -> str:
    """DuckDB twin of :func:`nsp_pairs`.

    ``rows_sql``: a SELECT yielding ``(article_id, pos, sentence)`` — the
    exploded sentence rows. Every seeded draw (label coin, pool bucket,
    per-bucket rank, candidate bucket/rank, collision fallback) uses the
    same md5-based hash as the Spark side, so the oracle reproduces the
    pair set exactly.
    """

    def H(x: str, s: int) -> str:
        return (
            f"CAST(('0x' || substr(md5({x} || '|{s}'), 1, 15)) AS BIGINT)"
        )

    key = "CAST(p.article_id AS VARCHAR) || '|' || CAST(p.pos AS VARCHAR)"
    return f"""
WITH rows_ AS ({rows_sql}),
pairs0 AS (
  SELECT article_id, pos, sentence AS first,
         lead(sentence) OVER (PARTITION BY article_id ORDER BY pos) AS next_sent
  FROM rows_
),
pairs1 AS (
  SELECT *, CASE WHEN ({H("CAST(article_id AS VARCHAR) || '|' || CAST(pos AS VARCHAR)", seed)}
                       % 1000000007) / 1000000007.0 < {prob}
                 THEN 1 ELSE 0 END AS label
  FROM pairs0 WHERE next_sent IS NOT NULL
),
pool AS (
  SELECT article_id AS neg_article, pos, sentence AS neg_sent,
         CAST({H("sentence", seed + 1)} % {pool_buckets} AS INT) AS bucket
  FROM rows_
),
poolr AS (
  SELECT *, row_number() OVER (
      PARTITION BY bucket ORDER BY {H("neg_sent", seed + 1)}, neg_article, pos
  ) AS rank FROM pool
),
sizes AS (SELECT bucket, count(*) AS cnt FROM poolr GROUP BY 1),
ne AS (
  SELECT bucket, cnt, row_number() OVER (ORDER BY bucket) - 1 AS bidx,
         (SELECT count(*) FROM sizes) AS nb
  FROM sizes
),
cand AS (
  SELECT p.*, ne.bucket AS cand_bucket, ne.cnt AS bsize,
         ({H(key, seed + 3)} % ne.cnt) + 1 AS cand_rank
  FROM pairs1 p
  JOIN ne ON ne.bidx = {H(key, seed + 2)} % ne.nb
),
d1 AS (
  SELECT c.*, pr.neg_article, pr.neg_sent,
         (pr.neg_article = c.article_id) AS collide
  FROM cand c
  LEFT JOIN poolr pr ON pr.bucket = c.cand_bucket AND pr.rank = c.cand_rank
),
d2 AS (
  SELECT d.*, pr2.neg_article AS neg_article2, pr2.neg_sent AS neg_sent2
  FROM d1 d
  LEFT JOIN poolr pr2 ON d.collide AND pr2.bucket = d.cand_bucket
       AND pr2.rank = (d.cand_rank % d.bsize) + 1
),
outp AS (
  SELECT first,
         CASE WHEN label = 1 THEN next_sent
              WHEN collide THEN neg_sent2 ELSE neg_sent END AS second,
         label,
         CASE WHEN collide THEN neg_article2 ELSE neg_article END AS _na,
         article_id
  FROM d2
)
SELECT first, second, label FROM outp
WHERE label = 1 OR _na != article_id
"""


@pandas_udf(ArrayType(IntegerType()))
def mlm_mask_udf(token_ids: pd.Series, row_seed: pd.Series) -> pd.Series:
    """R3: mask min(40, max(1, round(len*0.15))) positions per row;
    80% -> MASK_TOKEN, 10% -> random id in [10, 30000), 10% unchanged
    (preprocessor.py:342-366). Per-row seeded numpy generator."""

    def one(ids, seed):
        ids = np.asarray(ids, dtype=np.int64)
        rng = np.random.default_rng(int(seed))
        n = ids.size
        n_mask = int(min(MAX_MASKS, max(1, round(n * MASK_RATIO))))
        picks = rng.permutation(n)[:n_mask]
        out = ids.copy()
        r = rng.random(n_mask)
        for p, u in zip(picks, r):
            if u < 0.8:
                out[p] = MASK_TOKEN
            elif u < 0.9:
                out[p] = rng.integers(10, 30000)
            # else unchanged (10%)
        return out.astype(np.int32).tolist()

    return pd.Series([one(i, s) for i, s in zip(token_ids, row_seed)])


def mask_tokens(df: DataFrame, ids_col: str = "token_ids", seed: int = 42) -> DataFrame:
    """Apply MLM masking with a deterministic per-row seed."""
    row_seed = F.pmod(F.xxhash64(F.col(ids_col).cast("string"), F.lit(seed)), F.lit(2**31)).cast("long")
    return df.withColumn("masked_ids", mlm_mask_udf(F.col(ids_col), row_seed))
