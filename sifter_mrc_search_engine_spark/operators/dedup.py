"""Deduplication operators for large-scale training-data pipelines.

The reference deduplicates NSP sentence pairs with an in-memory used-key set
(reference: modules/lm_post_training/preprocessor.py:59-118); these are the
corpus-scale equivalents a 100 TB pipeline needs. Every operator is pure
Catalyst (md5 / array exprs — WholeStageCodegen, no Python), deterministic,
and has an exact DuckDB-SQL twin for the correctness harness.

Scale notes: exact dedup is one hash-shuffle; MinHash/LSH turns near-dup
detection into an equi-join on band keys (no O(n^2) pair scan); the
all-pairs Jaccard operator is for candidate VERIFICATION and small corpora —
at scale it runs only on LSH candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import tokenize_expr

DEFAULT_SHINGLE_K = 3
DEFAULT_MINHASH_PERMS = 8
DEFAULT_BANDS = 4  # bands * rows_per_band == perms


# --- exact dedup -----------------------------------------------------------


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(fingerprint, dup_count, keep_doc_id, doc_ids)`` for texts seen >1x.

    fingerprint = md5(text); keeper = min doc_id (stable choice).
    """
    return (
        docs.select(F.col("doc_id"), F.md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keep_doc_id"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents surviving exact dedup: one (min-doc_id) keeper per text."""
    keep = (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return keep.select("doc_id")


# --- shingles / MinHash / LSH ---------------------------------------------


def shingle_expr(k: int = DEFAULT_SHINGLE_K, text_col: str = "text"):
    """The k-token shingle ARRAY of one text column, as a pure Catalyst
    expression (sequence + slice + concat_ws — codegen, no explode)."""
    toks = tokenize_expr(text_col)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    # guard: Spark's sequence(1, n) DESCENDS when n < 1 — short docs must
    # yield no shingles, not a bogus [1, 0] index walk
    return F.when(F.size(toks) >= k, sh).otherwise(
        F.array().cast("array<string>")
    )


def shingles(docs: DataFrame, k: int = DEFAULT_SHINGLE_K, text_col: str = "text") -> DataFrame:
    """Distinct k-token shingles per document: ``(doc_id, shingle)``."""
    return docs.select(
        "doc_id", F.explode(shingle_expr(k, text_col)).alias("shingle")
    ).distinct()


def _perm_hash(perm: int, col: str = "shingle"):
    return F.md5(F.concat_ws("|", F.lit(str(perm)), F.col(col)))


def minhash_signatures(
    docs: DataFrame,
    perms: int = DEFAULT_MINHASH_PERMS,
    k: int = DEFAULT_SHINGLE_K,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, mh0..mh{perms-1})`` — min over md5(perm || shingle).

    Deterministic 'permutations' via seeded md5; the min is taken over the
    hex string (lexicographic), identical in any SQL engine.
    """
    sh = shingles(docs, k, text_col)
    aggs = [F.min(_perm_hash(p)).alias(f"mh{p}") for p in range(perms)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_band_buckets(
    docs: DataFrame,
    perms: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, band, bkey)`` — one row per doc per band; the shared
    bucket construction behind :func:`lsh_candidate_pairs` and
    :func:`lsh_dropped_bucket_stats` (the two must agree on the band
    key, or the audit would count buckets the join never saw)."""
    rows = perms // bands
    sig = minhash_signatures(docs, perms, k, text_col)
    band_cols = []
    for b in range(bands):
        key = F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]))
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("bkey")))
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


def lsh_dropped_stats_from_buckets(buckets: DataFrame, max_bucket: int) -> DataFrame:
    """One-row audit over precomputed :func:`lsh_band_buckets` rows —
    the ONE aggregation behind :func:`lsh_dropped_bucket_stats` and the
    prepare chain (which derives pairs AND this audit from a single
    persisted bucket frame); hand-synced copies of the cap rule are how
    audit/filter parity drifts."""
    sizes = buckets.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("n"))
    return sizes.filter(F.col("n") > max_bucket).agg(
        F.count(F.lit(1)).alias("lsh_dropped_buckets"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias(
            "lsh_dropped_bucket_rows"
        ),
    )


def lsh_dropped_bucket_stats(
    docs: DataFrame,
    max_bucket: int,
    perms: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
    text_col: str = "text",
) -> DataFrame:
    """One-row audit of what the ``max_bucket`` cap discarded:
    ``(lsh_dropped_buckets, lsh_dropped_bucket_rows)`` — no silent
    caps: a capped prepare run must surface HOW MUCH candidate mass it
    skipped so an operator can retune instead of trusting phantom
    recall. Always returns exactly one row (zeros when nothing was
    dropped)."""
    return lsh_dropped_stats_from_buckets(
        lsh_band_buckets(docs, perms, bands, k, text_col), max_bucket
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    perms: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs ``(doc_a, doc_b)`` via banded MinHash.

    Docs sharing ALL rows of at least one band collide in a bucket; the
    pair join is an equi-join on (band, bucket_key) — the scale path.

    ``max_bucket`` is the pathological-skew escape hatch: a (band, key)
    bucket holding B docs emits B·(B−1)/2 pairs, so one degenerate
    signature (boilerplate pages, empty docs) can go quadratic. Buckets
    larger than ``max_bucket`` are DROPPED before the join — a documented
    recall tradeoff (members of an over-full bucket are near-identical
    and still pair through their other bands; exact dedup catches byte
    dups regardless). None (default) keeps exact reference semantics.
    """
    return lsh_pairs_from_buckets(
        lsh_band_buckets(docs, perms, bands, k, text_col), max_bucket
    )


def lsh_pairs_from_buckets(
    buckets: DataFrame, max_bucket: int | None = None
) -> DataFrame:
    """``(doc_a, doc_b)`` with ``doc_a < doc_b`` from precomputed
    :func:`lsh_band_buckets` rows — the ONE cap+self-join implementation
    behind :func:`lsh_candidate_pairs` and the streaming gate
    (``streaming/stateful.stream_near_dup``); hand-synced copies of the
    keeper rule are how batch/stream parity drifts."""
    if max_bucket is not None:
        from pyspark.sql import Window

        sz = F.count(F.lit(1)).over(Window.partitionBy("band", "bkey"))
        buckets = buckets.withColumn("_sz", sz).filter(
            F.col("_sz") <= max_bucket
        ).drop("_sz")
    a = buckets.alias("a")
    b_ = buckets.alias("b")
    return (
        a.join(b_, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = DEFAULT_SHINGLE_K,
    text_col: str = "text",
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold:
    ``(doc_a, doc_b, jaccard)``.

    Self-join on shared shingles (docs sharing none never meet). At corpus
    scale run this only over ``lsh_candidate_pairs`` output.
    """
    sh = shingles(docs, k, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("sza") + F.col("szb") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- SimHash ---------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text") -> DataFrame:
    """``(doc_id, simhash)`` — tf-weighted sign sum over md5 token bits.

    For each token t with frequency tf, its 60-bit hash h(t) contributes
    +tf to bit b if bit b of h(t) is 1 else -tf; simhash bit b = 1 iff the
    sum > 0. ``bits`` kept modest so the SQL twin stays readable.
    """
    toks = docs.select("doc_id", F.explode(tokenize_expr(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long")
    tf = tf.withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return sums.select("doc_id", sim.cast("long").alias("simhash"))


# --- SQL twins (DuckDB oracle generators) ----------------------------------

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9가-힣]+')"


def sql_exact_duplicate_groups(table: str = "documents") -> str:
    return f"""
SELECT fingerprint, count(*) AS dup_count, min(doc_id) AS keep_doc_id,
       list_sort(list(doc_id)) AS doc_ids
FROM (SELECT doc_id, md5(text) AS fingerprint FROM {table})
GROUP BY fingerprint HAVING count(*) > 1
"""


def sql_dedup_exact(table: str = "documents") -> str:
    return f"SELECT min(doc_id) AS doc_id FROM {table} GROUP BY md5(text)"


def _sql_shingles(table: str, k: int) -> str:
    return f"""
SELECT DISTINCT doc_id, array_to_string(toks[i : i + {k - 1}], ' ') AS shingle
FROM (SELECT doc_id, {_TOKS} AS toks FROM {table}),
     LATERAL unnest(range(1, greatest(len(toks) - {k - 1}, 0) + 1)) AS t(i)
"""


def sql_shingles(table: str = "documents", k: int = DEFAULT_SHINGLE_K) -> str:
    return _sql_shingles(table, k)


def sql_minhash_signatures(
    table: str = "documents", perms: int = DEFAULT_MINHASH_PERMS, k: int = DEFAULT_SHINGLE_K
) -> str:
    mins = ", ".join(
        f"min(md5('{p}' || '|' || shingle)) AS mh{p}" for p in range(perms)
    )
    return f"SELECT doc_id, {mins} FROM ({_sql_shingles(table, k)}) GROUP BY doc_id"


def sql_lsh_candidate_pairs(
    table: str = "documents",
    perms: int = DEFAULT_MINHASH_PERMS,
    bands: int = DEFAULT_BANDS,
    k: int = DEFAULT_SHINGLE_K,
) -> str:
    rows = perms // bands
    band_keys = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)) + f") AS bkey{b}"
        for b in range(bands)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, bkey{b} AS bkey FROM sigs" for b in range(bands)
    )
    return f"""
WITH sigs AS (SELECT doc_id, {band_keys} FROM ({sql_minhash_signatures(table, perms, k)})),
buckets AS ({unions})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey
WHERE a.doc_id < b.doc_id
"""


def sql_ngram_jaccard_pairs(
    table: str = "documents", threshold: float = 0.5, k: int = DEFAULT_SHINGLE_K
) -> str:
    return f"""
WITH sh AS ({_sql_shingles(table, k)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(shared / (sa.sz + sb.sz - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(shared / (sa.sz + sb.sz - shared), 6) >= {threshold}
"""


def sql_simhash(table: str = "documents", bits: int = 16) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN tf ELSE -tf END) AS s{b}"
        for b in range(bits)
    )
    sim = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf,
         CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM {table})
  GROUP BY doc_id, term
),
sums AS (SELECT doc_id, {sums} FROM tf GROUP BY doc_id)
SELECT doc_id, CAST({sim} AS BIGINT) AS simhash FROM sums
"""


def benchmark_overlap(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Test-set decontamination: flag corpus docs sharing any k-token
    shingle with a benchmark/eval table —
    ``(doc_id, n_overlapping_shingles, contaminated)``.

    The benchmark side reduces to its DISTINCT shingle set and is
    broadcast (a benchmark is small by definition — at 100 TB the corpus
    side stays a map-side semi-join against a few MB of eval n-grams;
    one shuffle total, the per-doc hit count). Every corpus doc appears
    in the output (n=0, contaminated=false when clean), so the result
    can drive a left-anti or a filter without a second pass.
    """
    doc_sh = shingles(docs, k, text_col=text_col)
    # the bench side needs only its text column — no doc_id precondition
    # (a held-out answer list is a natural texts-only parquet)
    bench_sh = bench.select(
        F.explode(shingle_expr(k, text_col)).alias("shingle")
    ).distinct()
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_overlapping_shingles"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sql_benchmark_overlap(
    table: str = "documents",
    bench_table: str = "documents",
    bench_where: str | None = None,
    k: int = 8,
) -> str:
    """DuckDB twin of :func:`benchmark_overlap`. ``bench_where`` filters
    ``bench_table`` into the benchmark subset (the typical oracle use:
    the benchmark is a deterministic slice of the same corpus)."""
    bench_src = (
        f"(SELECT * FROM {bench_table} WHERE {bench_where}) b"
        if bench_where
        else bench_table
    )
    return f"""
WITH doc_sh AS ({_sql_shingles(table, k)}),
bench_sh AS (SELECT DISTINCT shingle FROM ({_sql_shingles(bench_src, k)})),
hits AS (
  SELECT doc_id, count(*) AS n
  FROM doc_sh JOIN bench_sh USING (shingle)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlapping_shingles,
       coalesce(h.n, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def repeated_span_stats(
    docs: DataFrame,
    k: int = DEFAULT_SHINGLE_K,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate detection (the C4 repeated-line dedup
    generalized to token spans): per doc,
    ``(doc_id, n_spans, n_repeated_spans, repeated_frac)`` where a span
    (distinct k-token shingle) is "repeated" when it occurs in at least
    ``min_docs`` DISTINCT documents corpus-wide.

    Two shuffles at any scale: the corpus-wide span frequency (shingles
    are distinct per doc, so a plain count IS the doc count) and the
    per-doc rollup; docs too short for any span surface with zeros via
    the left join, so the output filters without a second pass.
    """
    sh = shingles(docs, k, text_col=text_col)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    per = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("nd") >= min_docs).cast("long")).alias("n_rep"),
        )
    )
    frac = F.when(
        F.col("n_spans") > 0, F.col("n_rep") / F.col("n_spans").cast("double")
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_rep", F.lit(0)).cast("long").alias("n_repeated_spans"),
            F.round(F.coalesce(frac, F.lit(0.0)), 4).alias("repeated_frac"),
        )
    )


def sql_repeated_span_stats(
    table: str = "documents", k: int = DEFAULT_SHINGLE_K, min_docs: int = 2
) -> str:
    """DuckDB twin of :func:`repeated_span_stats`."""
    return f"""
WITH sh AS ({_sql_shingles(table, k)}),
freq AS (SELECT shingle, count(*) AS nd FROM sh GROUP BY shingle),
per AS (
  SELECT sh.doc_id, count(*) AS n_spans,
         sum(CASE WHEN freq.nd >= {min_docs} THEN 1 ELSE 0 END) AS n_rep
  FROM sh JOIN freq USING (shingle)
  GROUP BY sh.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(per.n_rep, 0) AS BIGINT) AS n_repeated_spans,
       round(coalesce(CAST(per.n_rep AS DOUBLE) / per.n_spans, 0.0), 4)
         AS repeated_frac
FROM {table} d LEFT JOIN per ON d.doc_id = per.doc_id
"""


def stratified_sample(
    docs: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified corpus sampling (training-mixture
    construction): keep each row of stratum ``s`` iff its seeded 60-bit
    md5 draw / 2^60 < ``fractions[s]``; strata absent from the map are
    dropped entirely. Returns ``(doc_id, stratum, kept_frac)``.

    Per-row decision — no shuffle, no sort, independent of partitioning,
    and re-runnable: the same (seed, doc_id) always draws the same
    number, so incremental corpus builds sample consistently across
    runs. The md5 construct is the repo's cross-engine hash
    (operators/nsp.py:40-48), so the DuckDB twin reproduces every draw.
    """
    from .nsp import _hash64

    u = _hash64(F.col(id_col), seed) / F.lit(float(1 << 60))
    frac = None
    for s in sorted(fractions):
        c = F.when(F.col(strata_col) == s, F.lit(float(fractions[s])))
        frac = c.otherwise(frac) if frac is not None else c
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(strata_col).alias("stratum"),
            frac.alias("_f"),
            u.alias("_u"),
        )
        .filter(F.col("_u") < F.col("_f"))
        .select("doc_id", "stratum", F.round("_f", 4).alias("kept_frac"))
    )


def sql_stratified_sample(
    fractions: dict,
    table: str = "documents",
    strata_col: str = "lang",
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    # CAST each branch: bare numeric literals parse as DECIMAL in DuckDB
    # (Decimal('0.2') != 0.2), while Spark emits float64
    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN CAST({float(fractions[s])!r} AS DOUBLE)"
        for s in sorted(fractions)
    )
    u = (
        f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|{seed}'), 1, 15)) "
        f"AS BIGINT) / {float(1 << 60)!r}"
    )
    return f"""
SELECT doc_id, {strata_col} AS stratum,
       round(CASE {cases} END, 4) AS kept_frac
FROM {table}
WHERE {u} < CASE {cases} END
"""


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = 25,
    return_rounds: bool = False,
    algorithm: str = "star",
):
    """Transitive dedup clusters: ``(doc_id, component)`` where
    ``component`` is the MINIMUM doc_id reachable through the pair
    graph — the proper completion of pairwise near-dup output (keeping
    one doc per pairwise edge is not transitively safe; keeping
    ``doc_id == component`` is).

    The 'jump' variant is min-label propagation WITH POINTER JUMPING to
    a fixpoint: each round every node (1) takes the min of its own
    label and its neighbors' labels (hook — one join + one groupBy),
    then (2)
    replaces its label with its label's label (jump — one self-join on
    the label table; ``l(u) := l(l(u))``, valid because every label is
    itself a node id in the same component). The jump halves the label
    tree's depth each round, so rounds scale with ``log(diameter)``
    instead of diameter — an adversarial 1,000-doc near-dup chain
    converges in ~11 rounds, not 1,000 (pinned in
    tests/test_dedup_stats_similarity.py). Same idea as the
    large-star/small-star MapReduce CC algorithm; the hook+jump form
    keeps per-round state to the (doc_id, component) table instead of a
    mutating edge set. Deterministic: min() is order-insensitive.

    If the cap is reached WITHOUT convergence, raises ``RuntimeError``
    (silently returning non-minimal labels would break the documented
    contract undetectably). ``max_iters=25`` covers graphs of diameter
    ~2^24 — unreachable in practice.

    ``nodes`` (optional, a ``doc_id`` column) adds isolated docs as
    singleton components so the output covers the whole corpus.
    ``return_rounds=True`` returns ``(labels, rounds_used)``.

    Two algorithms behind one contract, benchmarked head-to-head on
    the 2.4M-doc / 72.3M-edge LSH-pair soak graph
    (``tools/bench_pipeline.py``):

    * ``algorithm='star'`` (DEFAULT): alternating large-star /
      small-star edge-rewrite (the MapReduce CC formulation). Per-round
      state is the shrinking EDGE set, so on near-dup graphs (many
      small dense clusters) the shuffled volume collapses with the
      edges — measured **75 s / 5 rounds vs 233 s / 9 rounds** for the
      label-table variant on the soak graph, identical components.
    * ``algorithm='jump'``: hook + pointer-jump min-label propagation —
      per-round state is the (doc_id, component) table, rounds are
      O(log diameter). Kept as the fallback shape: its working set is
      one row per NODE regardless of edge count, the safer posture if
      a graph's edge set does not shrink (edges ≪ nodes² but dense).
    """
    from pyspark import StorageLevel

    if algorithm not in ("jump", "star"):
        raise ValueError(f"unknown CC algorithm {algorithm!r}")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    endpoints = edges.select(F.col("src").alias("doc_id")).distinct()
    base = (
        endpoints.union(nodes.select("doc_id")).distinct()
        if nodes is not None
        else endpoints
    )
    if algorithm == "star":
        try:
            labels, rounds = _cc_star(edges, base, max_iters)
        finally:
            edges.unpersist()
        return (labels, rounds) if return_rounds else labels
    labels = base.select("doc_id", F.col("doc_id").alias("component")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels_is_persisted = True  # round-1 labels only; later rounds are
    # localCheckpoints, for which Dataset.unpersist() is a no-op — their
    # checkpoint RDDs free when the old DataFrame reference drops (py4j
    # finalizer -> ContextCleaner), which the reassignment below does
    converged = False
    rounds = 0
    try:
        for rounds in range(1, max_iters + 1):
            nbr = (
                edges.join(
                    labels.select(
                        F.col("doc_id").alias("dst"),
                        F.col("component").alias("nl"),
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("nl").alias("nbr_min"))
                .withColumnRenamed("src", "doc_id")
            )
            hooked = (
                labels.join(nbr, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"), F.coalesce("nbr_min", F.col("component"))
                    ).alias("component"),
                )
                # feeds BOTH sides of the jump join — persist so the
                # hook join+groupBy runs once per round, not twice
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # pointer jump: l(u) := l(l(u)) — component values are node
            # ids, so the hooked table indexes itself. Labels only ever
            # decrease toward the component minimum; the jump is what
            # turns diameter-many rounds into log(diameter)-many.
            lut = hooked.select(
                F.col("doc_id").alias("component"),
                F.col("component").alias("jumped"),
            )
            # localCheckpoint (eager) TRUNCATES LINEAGE: the jump
            # references `hooked` twice, so without truncation the
            # logical plan doubles every round (exponential — a 1,000-
            # doc chain overflows the 2 GB plan-string cap around round
            # 10). On a real cluster prefer sc.setCheckpointDir +
            # .checkpoint() for executor-loss resilience.
            new = (
                hooked.join(lut, "component", "left")
                .select(
                    "doc_id",
                    F.coalesce("jumped", F.col("component")).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new.join(
                    labels.withColumnRenamed("component", "old"), "doc_id"
                )
                .filter(F.col("component") != F.col("old"))
                .limit(1)
                .count()
            )
            hooked.unpersist()
            if labels_is_persisted:
                labels.unpersist()
                labels_is_persisted = False
            labels = new
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} rounds "
                "(pathological graph?); labels would not honor the "
                "minimum-reachable-doc_id contract — raise max_iters"
            )
        return (labels, rounds) if return_rounds else labels
    finally:
        edges.unpersist()


def _cc_star(edges: DataFrame, base: DataFrame, max_iters: int):
    """Alternating large-star/small-star CC (the MapReduce formulation:
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Each round rewrites the EDGE set:

    * large-star, per node u with m = min(N(u) ∪ {u}): every LARGER
      neighbor v > u re-attaches to m — edges hop toward minima without
      ever orienting small→large (connectivity preserved).
    * small-star, per node u over its SMALLER neighbors (edge oriented
      large→small) with m = min(N_<(u) ∪ {u}): u and every v in N_<(u)
      attach to m.

    At the joint fixpoint every component is a star centered on its
    minimum, so the edge set IS the label table. Per-round state is
    MATERIALIZED SERIALIZED and read back (the iterate-via-table
    pattern): the new E is referenced several times next round, so the
    logical plan would multiply without truncation, and a deserialized
    in-memory checkpoint of a 10^8-edge table is a driver-heap OOM
    (live-repro'd at 72M edges / 8g heap). On a cluster, set
    ``sc.setCheckpointDir`` (shared storage) and rounds go through
    reliable ``.checkpoint(eager=True)``; in local mode a temp parquet
    round-trip is used instead (a driver-local path would be invisible
    to real executors, so a cluster WITHOUT a checkpoint dir raises
    rather than silently corrupting — use ``algorithm='jump'`` there if
    no shared dir exists). Raises on non-convergence like the jump
    variant."""
    import shutil as _shutil
    import tempfile as _tempfile

    spark = edges.sparkSession
    sc = spark.sparkContext
    ckpt_dir = None
    try:
        ckpt_dir = sc.getCheckpointDir()
    except Exception:
        pass
    reliable = ckpt_dir is not None
    if not reliable and not str(sc.master or "").startswith("local"):
        raise RuntimeError(
            "connected_components(algorithm='star') on a cluster needs "
            "spark.sparkContext.setCheckpointDir(<shared storage>): "
            "per-round edge state must be visible to every executor, and "
            "a driver-local temp dir is not. Set a checkpoint dir, or use "
            "algorithm='jump'."
        )
    root = _tempfile.mkdtemp(prefix="cc_star_rounds_")
    prev_dir: str | None = None

    def materialize(df: DataFrame, tag: str) -> DataFrame:
        if reliable:
            # serialized to the shared checkpoint dir; lineage truncated.
            # Old checkpoint files free via the context cleaner when the
            # previous round's DataFrame reference drops
            # (spark.cleaner.referenceTracking.cleanCheckpoints).
            return df.checkpoint(eager=True)
        path = f"{root}/{tag}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    rounds = 0
    converged = False
    try:
        # canonical orientation (big, small): halves the working set vs
        # the symmetric table and is exactly small-star's input shape
        E = materialize(
            edges.filter(F.col("src") > F.col("dst"))
            .select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .distinct(),
            "r0",
        )
        cur_dir = f"{root}/r0"
        n_prev = E.count()
        for rounds in range(1, max_iters + 1):
            sym = E.union(
                E.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            mins = sym.groupBy("a").agg(F.min("b").alias("mn")).select(
                "a", F.least("a", "mn").alias("m")
            )
            # large-star: (v, m(u)) for v in N(u), v > u — emitted
            # already canonically oriented (v > u >= m)
            ls = (
                sym.join(mins, "a")
                .filter(F.col("b") > F.col("a"))
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .filter(F.col("a") != F.col("b"))
                .distinct()
            )
            # small-star over the large-star output: per node a with
            # its smaller neighbors b, attach a and every b to the min
            mins2 = ls.groupBy("a").agg(F.min("b").alias("m"))
            ss = (
                ls.join(mins2, "a")
                .select(F.col("b").alias("a"), F.col("m").alias("b"))
                .union(mins2.select(F.col("a"), F.col("m").alias("b")))
                .filter(F.col("a") != F.col("b"))
                .distinct()
            )
            new = materialize(ss, f"r{rounds}")
            n_new = new.count()
            changed = (
                n_new != n_prev
                or new.join(E, ["a", "b"], "left_anti").limit(1).count() > 0
            )
            if prev_dir is not None:
                _shutil.rmtree(prev_dir, ignore_errors=True)
            prev_dir, cur_dir = cur_dir, f"{root}/r{rounds}"
            E, n_prev = new, n_new
            if not changed:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components(star) did not converge in "
                f"{max_iters} rounds (pathological graph?); labels would "
                "not honor the minimum-reachable-doc_id contract — raise "
                "max_iters"
            )
        # stars: every non-root points straight at its component
        # minimum. Materialize eagerly (small: one row per node) so the
        # round dirs can be deleted before returning.
        labels = base.join(
            E.select(F.col("a").alias("doc_id"), F.col("b").alias("component")),
            "doc_id",
            "left",
        ).select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        ).localCheckpoint(eager=True)
        return labels, rounds
    finally:
        _shutil.rmtree(root, ignore_errors=True)


def sql_connected_components(
    pairs_sql: str, table: str = "documents", with_singletons: bool = True
) -> str:
    """DuckDB twin of :func:`connected_components`: a recursive
    transitive closure (UNION dedup guarantees termination), then
    ``min(reachable)`` per node — O(n·m) closure rows, fine at oracle
    scale; the Spark side is the one that scales."""
    singles = (
        f"UNION SELECT doc_id, doc_id FROM {table}" if with_singletons else ""
    )
    return f"""
WITH RECURSIVE prs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION SELECT doc_b, doc_a FROM prs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
self_or_reach AS (
  SELECT src, dst FROM reach
  UNION SELECT src, src FROM edges
  {singles}
)
SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS component
FROM self_or_reach GROUP BY src
"""
