"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-10 query at sf0.001;
``queries()``/``oracle_sql()`` pair every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sifter_mrc_search_engine_spark.constants import BM25_B, BM25_K1
from sifter_mrc_search_engine_spark.functions import text_stats as _ts
from sifter_mrc_search_engine_spark.operators import bm25, index_build
from sifter_mrc_search_engine_spark.operators import dedup as _dd
from sifter_mrc_search_engine_spark.operators import packing as _pk
from sifter_mrc_search_engine_spark.operators import relational as _rel
from sifter_mrc_search_engine_spark.operators import similarity as _sim

FLAGSHIP_QUESTION = "the fast query"
TOKEN_RE = "[a-z0-9가-힣]+"

_DUCK_TOKS = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS term "
    "FROM documents"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over documents at sf0.001 → (doc_id, score)."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    out = bm25.bm25_brute_force(docs, FLAGSHIP_QUESTION, top_k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _q_bm25(question: str, k: int = 10):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = bm25.bm25_brute_force(_docs(spark, sf_dir), question, top_k=k)
        return out.select("doc_id", F.round("score", 4).alias("score"))

    return run


def _q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_build.term_frequencies(_docs(spark, sf_dir))


def _q_doc_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = index_build.term_frequencies(_docs(spark, sf_dir))
    return index_build.doc_frequencies(tf)


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_build.doc_lengths(_docs(spark, sf_dir))


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    dl = index_build.doc_lengths(_docs(spark, sf_dir))
    return index_build.corpus_stats(dl).select(
        "n_docs", F.round("avgdl", 6).alias("avgdl")
    )


def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings as (term, df, doc_ids CSV string sorted) — SQL-expressible.

    The doc-id list is emitted as a comma-joined string (not array<long>):
    the driver's canonicalizer pandas-sorts result columns and cannot hash
    Python lists, so array outputs hard-error the correctness gate.
    """
    p = index_build.build_postings(_docs(spark, sf_dir))
    return p.select(
        "term",
        "df",
        F.concat_ws(
            ",", F.transform("postings", lambda s: s["doc_id"].cast("string"))
        ).alias("doc_ids"),
    )


def _q_wand_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path: compressed index (varbyte+blockmax) -> WAND top-k.

    Oracle = the same BM25 SQL as the brute-force scorer — proves the
    compressed path is rank- and score-identical end to end.
    """
    import numpy as np

    from sifter_mrc_search_engine_spark.functions.analyzer import analyze
    from sifter_mrc_search_engine_spark.operators.compressed_index import (
        build_compressed_index,
    )
    from sifter_mrc_search_engine_spark.operators.index_build import (
        corpus_stats,
        doc_lengths,
    )
    from sifter_mrc_search_engine_spark.operators.wand import wand_topk

    docs = _docs(spark, sf_dir)
    index = build_compressed_index(docs).collect()
    dl_rows = doc_lengths(docs).collect()
    dl = {r["doc_id"]: r["doc_len"] for r in dl_rows}
    st = corpus_stats(doc_lengths(docs)).collect()[0]
    hits = wand_topk(
        index, analyze(FLAGSHIP_QUESTION), dl, int(st["n_docs"]), float(st["avgdl"]), top_k=10
    )
    return spark.createDataFrame(
        [(d, round(s, 4)) for d, s in hits], "doc_id long, score double"
    )


#: derived two-field shape for BM25F: title = first 8 space-tokens, boosted 2x
_BM25F_WEIGHTS = {"title": 2.0, "content": 1.0}
_BM25F_SQL_FIELDS = {
    "title": "array_to_string((string_split(text, ' '))[1:8], ' ')",
    "content": "text",
}


def _q_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F with a 2x title boost over derived (title, content) fields —
    the reference's searchField semantics (search_functions.py:92-95)."""
    from sifter_mrc_search_engine_spark.operators.bm25f import bm25f_brute_force

    two_field = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)).alias("title"),
        F.col("text").alias("content"),
    )
    out = bm25f_brute_force(two_field, FLAGSHIP_QUESTION, _BM25F_WEIGHTS, top_k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _build_once(kind: str, sf_dir: str, build_fn) -> str:
    """Deterministic per-(kind, corpus) build dir under the system temp
    root. Repeated entry invocations — in one process OR across driver/
    verify processes — reuse the same dir instead of accumulating one
    mkdtemp per run. The key fingerprints the source parquet's file
    sizes+mtimes, so regenerated testdata gets a fresh dir instead of a
    stale index. Publication is an atomic rename of a fully-built
    staging dir: a dir that EXISTS is complete (no torn half-builds can
    be cached), and when two processes race, the rename loser discards
    its copy and reuses the winner's."""
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path

    src = Path(sf_dir, "documents.parquet")
    if src.is_file():
        st = src.stat()
        sig = f"{st.st_size}:{st.st_mtime_ns}"
    elif src.is_dir():
        sig = "|".join(
            f"{p.name}:{p.stat().st_size}:{p.stat().st_mtime_ns}"
            for p in sorted(src.rglob("*"))
            if p.is_file()
        )
    else:
        sig = "missing"
    # the key must also fingerprint the CODE: /tmp outlives commits, and
    # an index-format change (codec, sidecars, bucket hashing) must not
    # be served from a dir built by the previous round's encoder. The
    # current git HEAD is the cheapest sound code version (worst case:
    # one rebuild per commit — builds at these sf sizes are seconds).
    import subprocess

    try:
        code_ver = subprocess.run(
            ["git", "-C", str(Path(__file__).resolve().parent), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "dev"
    except Exception:
        code_ver = "dev"
    h = hashlib.md5(f"{sf_dir}|{sig}|{code_ver}".encode()).hexdigest()[:12]
    d = Path(tempfile.gettempdir()) / f"sifter_entry_{kind}_{h}"
    if d.exists():
        return str(d)
    tmp = Path(f"{d}.build.{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    build_fn(str(tmp))
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not d.exists():
            # the rename did NOT lose a publish race (d is absent) —
            # something else went wrong (e.g. a /tmp cleaner removed the
            # staging dir mid-build); caching a nonexistent path would
            # poison every later entry query in this process
            raise
    return str(d)


#: fielded-index memo: build once per sf_dir per process (the harness may
#: invoke a query callable several times; rebuilding each call would bill
#: the build to the query AND leak a temp index dir per invocation)
_FIELDED_IDX_MEMO: dict[str, str] = {}


def _q_bm25f_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F from a PERSISTED fielded index (field-prefixed postings +
    per-field doclens) — same oracle as the query-time plan, proving the
    stored path is score-identical end to end."""
    from sifter_mrc_search_engine_spark.operators.fielded_index import (
        build_fielded_index,
        search_bm25f,
    )

    if sf_dir not in _FIELDED_IDX_MEMO:
        def _build(d: str) -> None:
            two_field = _docs(spark, sf_dir).select(
                "doc_id",
                F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)).alias("title"),
                F.col("text").alias("content"),
            )
            build_fielded_index(two_field, ["title", "content"], d, buckets=16)

        _FIELDED_IDX_MEMO[sf_dir] = _build_once("fielded", sf_dir, _build)
    out = search_bm25f(
        spark, _FIELDED_IDX_MEMO[sf_dir], FLAGSHIP_QUESTION, _BM25F_WEIGHTS,
        top_k=10, buckets=16,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


#: per-(session, sf) memo of the 2-segment searcher (split by doc_id
#: parity) — the searcher's init validation jobs must not rerun per
#: query invocation, but a cached searcher holds DataFrames bound to
#: its SparkContext, so the key includes the application id (a new
#: session after spark.stop() rebuilds instead of failing on the
#: stopped context)
_FIELDED_SEG_MEMO: dict[tuple, object] = {}
_FIELDED_SEG_DIRS: dict[str, str] = {}


def _q_bm25f_multisegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F across TWO streamed-style fielded segments (docs split by
    parity) served by FieldedMultiSegmentSearcher's merged relational
    plan — must be score-identical to brute force over the FULL corpus
    (stats merge additively; df re-derives from the unioned candidates),
    so the single-table oracle doubles as the multi-segment oracle."""
    from pathlib import Path

    from sifter_mrc_search_engine_spark.operators.fielded_index import (
        build_fielded_index,
        search_bm25f,
    )
    from sifter_mrc_search_engine_spark.streaming.incremental import (
        FieldedMultiSegmentSearcher,
    )

    if sf_dir not in _FIELDED_SEG_DIRS:
        def _build(d: str) -> None:
            two_field = _docs(spark, sf_dir).select(
                "doc_id",
                F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)).alias("title"),
                F.col("text").alias("content"),
            )
            for par in (0, 1):
                seg = f"{d}/segments/seg={par}"
                build_fielded_index(
                    two_field.filter(F.col("doc_id") % 2 == par),
                    ["title", "content"], seg, buckets=16,
                )
                (Path(seg) / "_SEGMENT_COMMITTED").write_text("1")

        _FIELDED_SEG_DIRS[sf_dir] = _build_once("fseg", sf_dir, _build)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _FIELDED_SEG_MEMO:
        _FIELDED_SEG_MEMO[key] = FieldedMultiSegmentSearcher(
            spark, _FIELDED_SEG_DIRS[sf_dir], buckets=16
        )
    s = _FIELDED_SEG_MEMO[key]
    out = search_bm25f(
        spark, "", FLAGSHIP_QUESTION, _BM25F_WEIGHTS, top_k=10, buckets=16,
        postings=s.postings, doclens=s.doclens, stats=s.stats,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


#: positional-index memo (build once per sf_dir per process, like the
#: fielded index) — the phrase entry serves from the PERSISTED index so
#: the driver row certifies the whole codec+serving path, not just the
#: relational fallback
_POS_IDX_DIRS: dict[str, str] = {}

#: phrase chosen from the synthetic vocabulary: "part filter" occurs as
#: a bigram in ~45 docs at both sf0.001 and sf0.01, so the top-k is full
PHRASE_QUESTION = "part filter"


def _q_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase top-k served from the persisted positional index
    (bucket-pruned scan -> executor decode -> anchor intersection);
    oracle = the relational twin, proving index == brute force."""
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    if sf_dir not in _POS_IDX_DIRS:
        def _build(d: str) -> None:
            _pos.write_positional_index(_docs(spark, sf_dir), d)

        _POS_IDX_DIRS[sf_dir] = _build_once("posidx", sf_dir, _build)
    out = _pos.phrase_topk_indexed(spark, _POS_IDX_DIRS[sf_dir], PHRASE_QUESTION)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_near_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    out = _pos.near_topk(_docs(spark, sf_dir), "spark query", window=3)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    out = _pos.prefix_topk(_docs(spark, sf_dir), "s")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    out = _pos.bool_topk(
        _docs(spark, sf_dir), must=["spark"], should=["vector"], must_not=["slow"]
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    out = _pos.phrase_slop_topk(_docs(spark, sf_dir), PHRASE_QUESTION, slop=2)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    out = _pos.wildcard_topk(_docs(spark, sf_dir), "quer*")
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import positional as _pos

    out = _pos.fuzzy_topk(_docs(spark, sf_dir), "spark", max_edits=1)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sifter_mrc_search_engine_spark.operators import snippets as _snip

    out = _snip.highlight_topk(_docs(spark, sf_dir), "spark query", window=8)
    return out.select("doc_id", F.round("score", 4).alias("score"), "snippet")


def _q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related-documents query: BM25 over the source doc's top tf-idf
    terms, source excluded (operators/mlt.py; term selection pinned to
    the 9-dp-rounded tf-idf order so engine == twin exactly)."""
    from sifter_mrc_search_engine_spark.operators import mlt as _mlt

    out = _mlt.more_like_this_topk(_docs(spark, sf_dir), 7, n_terms=8)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "bm25_topk_flagship": _q_bm25(FLAGSHIP_QUESTION),
        "pos_phrase_topk": _q_phrase_indexed,
        "pos_near_topk": _q_near_topk,
        "pos_prefix_topk": _q_prefix_topk,
        "pos_bool_topk": _q_bool_topk,
        "pos_phrase_slop_topk": _q_phrase_slop,
        "pos_wildcard_topk": _q_wildcard,
        "pos_fuzzy_topk": _q_fuzzy,
        "bm25_highlight_topk": _q_highlight,
        "fts_more_like_this": _q_more_like_this,
        "bm25f_topk": _q_bm25f,
        "bm25f_topk_indexed": _q_bm25f_indexed,
        "bm25f_multisegment": _q_bm25f_multisegment,
        "bm25_multisegment": _q_bm25_multisegment,
        "bm25_topk_multi": _q_bm25("spark join merge table"),
        "bm25_topk_single": _q_bm25("window", 5),
        "bm25_topk_wand_compressed": _q_wand_compressed,
        "index_term_frequencies": _q_term_frequencies,
        "index_doc_frequencies": _q_doc_frequencies,
        "index_doc_lengths": _q_doc_lengths,
        "index_corpus_stats": _q_corpus_stats,
        "index_postings_lists": _q_postings,
        # training-data pipeline: dedup family
        "dedup_exact": lambda s, d: _dd.dedup_exact(_docs(s, d)),
        "dedup_shingles": lambda s, d: _dd.shingles(_docs(s, d)),
        "dedup_minhash_signatures": lambda s, d: _dd.minhash_signatures(_docs(s, d)),
        "dedup_lsh_candidate_pairs": lambda s, d: _dd.lsh_candidate_pairs(_docs(s, d)),
        "dedup_ngram_jaccard": lambda s, d: _dd.ngram_jaccard_pairs(_docs(s, d), threshold=0.2),
        "dedup_simhash": lambda s, d: _dd.simhash(_docs(s, d)),
        "dedup_benchmark_overlap": lambda s, d: _dd.benchmark_overlap(
            _docs(s, d), _docs(s, d).filter("doc_id % 97 = 0"), k=8
        ),
        "dedup_repeated_spans": lambda s, d: _dd.repeated_span_stats(
            _docs(s, d), k=5, min_docs=2
        ),
        "dedup_connected_components": lambda s, d: _dd.connected_components(
            _dd.lsh_candidate_pairs(_docs(s, d)), nodes=_docs(s, d)
        ),
        "pipeline_stratified_sample": lambda s, d: _dd.stratified_sample(
            _docs(s, d), {"en": 0.5, "de": 1.0, "zh": 0.2}
        ),
        "pipeline_pack_stream": _q_pack_stream,
        "pipeline_chunk_texts": lambda s, d: _pk.materialize_chunks(
            _docs(s, d), budget=512
        ),
        # oracled: the Lloyd loop has a FIXED iteration count, so the
        # DuckDB twin unrolls it as a bounded CTE chain (seed draw +
        # assignment/update layers, 9-dp-rounded means) — plus the
        # numpy twin in test_dedup_stats_similarity
        "sim_ivf_topk": lambda s, d: _sim.ivf_topk(
            s.read.parquet(f"{d}/embeddings.parquet"),
            0, k=10, n_clusters=8, nprobe=3, iters=3,
        ),
        "dedup_embedding_cosine": lambda s, d: _sim.embedding_near_dup_pairs(
            s.read.parquet(f"{d}/embeddings.parquet"), threshold=0.5, n_planes=4
        ),
        "dedup_embedding_cosine_multiprobe": lambda s, d: _sim.embedding_near_dup_pairs(
            s.read.parquet(f"{d}/embeddings.parquet"),
            threshold=0.3, n_planes=6, hamming=1,
        ),
        # text analysis
        "text_token_counts": lambda s, d: _ts.token_counts(_docs(s, d)),
        "text_quality_scores": lambda s, d: _ts.quality_scores(_docs(s, d)),
        "text_lang_id": lambda s, d: _ts.lang_id(_docs(s, d)),
        "text_winnowing_fingerprint": lambda s, d: _ts.winnowing_fingerprint(_docs(s, d)),
        "text_gopher_quality": lambda s, d: _ts.gopher_quality(_docs(s, d)),
        "text_top_ngram_repetition": lambda s, d: _ts.top_ngram_char_frac(_docs(s, d), n=2),
        "text_pii_stats": lambda s, d: _ts.pii_stats(_docs(s, d)),
        "text_unigram_logprob": lambda s, d: _ts.unigram_logprob(_docs(s, d)),
        # similarity search
        "sim_cosine_topk": lambda s, d: _sim.cosine_topk(
            s.read.parquet(f"{d}/embeddings.parquet"), 0, k=10
        ),
        "sim_ann_lsh_topk": lambda s, d: _sim.ann_topk(
            s.read.parquet(f"{d}/embeddings.parquet"), 0, k=10, n_planes=4
        ),
        "sim_ann_multiprobe_topk": lambda s, d: _sim.ann_topk_multi(
            s.read.parquet(f"{d}/embeddings.parquet"), 0, k=10, n_planes=6, n_tables=4
        ),
        # rows-only (non-SQL-expressible) pipeline operators
        "pipeline_prepare_corpus": _q_prepare_corpus,
        "pipeline_nsp_pairs": _q_nsp_pairs,
        "pipeline_mlm_mask": _q_mlm_mask,
        "multimodal_image_features": _q_image_features,
        "multimodal_audio_windows": _q_audio_windows,
    }
    q.update(_rel.QUERIES)
    return _driver_sampling_order(q)


#: The driver samples a PREFIX of this dict (r3 ran the first 50 of 58,
#: silently skipping the tail — including the one query r2 had flagged).
#: Order defensively: (1) previously-skipped / freshly-changed entries
#: first, (2) then at least one entry per operator family, (3) the only
#: entries allowed to fall off the end are variants whose operator is
#: already covered by an earlier entry.
_HEAD = [
    # entries whose oracle/twin changed THIS round — must get a driver row
    "rel_user_sessions",  # r4 red cell: windowed sum now CAST AS BIGINT
    "sim_ivf_topk",  # twin now orders by the rounded cos like the engine
    # NEW r5 operators (structured query family) — must get a driver row
    "pos_phrase_topk",
    "pos_near_topk",
    "pos_prefix_topk",
    "pos_bool_topk",
    "pos_phrase_slop_topk",
    "pos_wildcard_topk",
    "pos_fuzzy_topk",
    "bm25_highlight_topk",
    # r4 driver-skipped tail (rotation per VERDICT r4 item 3): every entry
    # gets a driver row within two rounds
    "bm25_topk_multi",
    "bm25_topk_single",
    "bm25f_topk",
    "index_doc_frequencies",
    "dedup_shingles",
    "dedup_minhash_signatures",
    "text_token_counts",
    "sim_cosine_topk",
]
_TAIL = [
    # ALL driver-verified green in CORRECTNESS_r04; each is a parameter /
    # deployment variant of an entry that stays inside the 50-prefix
    "bm25_multisegment",  # variant of bm25_topk_flagship
    "bm25f_multisegment",  # variant of bm25f_topk_indexed
    "bm25_topk_wand_compressed",  # variant of bm25_topk_flagship
    "dedup_embedding_cosine_multiprobe",  # variant of dedup_embedding_cosine
    "sim_ann_multiprobe_topk",  # variant of sim_ann_lsh_topk
    "rel_top3_per_customer",  # variant of rel_topk_orders_customer
    "rel_orders_page_two",  # paging over the same ordered scan
    "rel_next_event_pairs",  # lead/lag window family, same scan as sessions
    # demoted to make 50-prefix room for the 8 NEW r5 entries (7 pos_*
    # + bm25_highlight_topk): each is a multi-round driver-green
    # serving/parameter variant whose operator family keeps an entry
    # inside the prefix; rotate back next round per the
    # every-entry-within-two-rounds policy (8 demoted in total below)
    "bm25f_topk_indexed",  # persisted-index variant of bm25f_topk (head)
    "index_doc_lengths",  # component signal also inside index_corpus_stats
    "dedup_repeated_spans",  # shingle-family variant of dedup_shingles (head)
    "text_winnowing_fingerprint",  # fingerprint variant of the text family
    "dedup_simhash",  # hash-family variant; exact/lsh/jaccard/CC stay in prefix
    "text_lang_id",  # text family keeps 5 entries in the prefix
    "rel_best_order_per_customer",  # argmax variant of rel_topk_orders_customer
    "multimodal_audio_windows",  # plumbing twin of multimodal_image_features (prefix)
    # NEW r5 (second session), born in the tail because the 50-prefix is
    # full of this round's other new entries — ROTATE INTO THE HEAD next
    # round for its first driver row (locally verified at sf0.001+sf0.01)
    "fts_more_like_this",
]


def _driver_sampling_order(q: dict) -> dict:
    missing = [k for k in _HEAD + _TAIL if k not in q]
    assert not missing, f"ordering names unknown queries: {missing}"
    out = {k: q[k] for k in _HEAD}
    out.update({k: v for k, v in q.items() if k not in out and k not in _TAIL})
    out.update({k: q[k] for k in _TAIL})
    return out


#: per-(session, sf) memo of the single-field 2-segment searcher
_SEG_MEMO: dict[tuple, object] = {}
_SEG_DIRS: dict[str, str] = {}


def _q_bm25_multisegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship BM25 across TWO streamed-style single-field segments
    (docs split by parity) via MultiSegmentSearcher's merged
    zero-driver-norms plan — score-identical to brute force over the
    full corpus (df = sum of per-segment dfs; doc_ids are disjoint), so
    the single-table oracle doubles as the multi-segment oracle."""
    from sifter_mrc_search_engine_spark.streaming.incremental import (
        MultiSegmentSearcher,
        _write_segment,
    )

    if sf_dir not in _SEG_DIRS:
        def _build(d: str) -> None:
            docs = _docs(spark, sf_dir)
            for par in (0, 1):
                _write_segment(
                    docs.filter(F.col("doc_id") % 2 == par),
                    f"{d}/segments/seg={par}",
                    buckets=16,
                )

        _SEG_DIRS[sf_dir] = _build_once("seg", sf_dir, _build)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SEG_MEMO:
        _SEG_MEMO[key] = MultiSegmentSearcher(
            spark, _SEG_DIRS[sf_dir], buckets=16, norms="join"
        )
    out = _SEG_MEMO[key].search_df(FLAGSHIP_QUESTION, top_k=10)
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _q_pack_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk packing positions via the distributed
    two-phase prefix sum (operators/packing.py)."""
    return _pk.pack_token_stream(_docs(spark, sf_dir), budget=512)


def _q_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate -> exact dedup over documents; returns the audit row
    joined to the surviving count (deterministic)."""
    from sifter_mrc_search_engine_spark.plans.prepare import prepare_corpus

    clean, audit = prepare_corpus(_docs(spark, sf_dir))
    return audit


def _q_nsp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NSP pairs over pseudo-articles (documents split into 8-token
    sentences); deterministic label/negative draws."""
    from sifter_mrc_search_engine_spark.operators.nsp import nsp_pairs

    docs = _docs(spark, sf_dir)
    arts = docs.selectExpr(
        "doc_id as article_id",
        "transform(sequence(0, int(size(split(text, ' '))/8) - 1),"
        " i -> concat_ws(' ', slice(split(text, ' '), i*8 + 1, 8))) as sentences",
    ).filter(F.size("sentences") >= 2)
    return nsp_pairs(arts, prob=0.5, seed=42)


def _q_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLM masking over token-id arrays derived from doc term positions;
    deterministic per-row seeds -> stable row count + schema."""
    from sifter_mrc_search_engine_spark.operators.nsp import mask_tokens

    docs = _docs(spark, sf_dir)
    ids = docs.selectExpr(
        "doc_id",
        "transform(regexp_extract_all(lower(text), '[a-z0-9가-힣]+', 0),"
        " t -> int(10 + pmod(xxhash64(t), 20000))) as token_ids",
    ).filter(F.size("token_ids") > 0)
    return mask_tokens(ids).select("doc_id", F.size("masked_ids").alias("n_tokens"))


def _q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over a deterministic synthetic media table."""
    from sifter_mrc_search_engine_spark.operators.multimodal import (
        image_features,
        synthesize_media,
    )

    media = synthesize_media(spark, 48)
    return image_features(media).select("media_id", "width", "height")


def _nsp_oracle_sql() -> str:
    """DuckDB twin of _q_nsp_pairs: same 8-token pseudo-sentence
    derivation over documents, then the md5-seeded pair construction."""
    from sifter_mrc_search_engine_spark.operators.nsp import sql_nsp_pairs

    rows_sql = """
SELECT s.article_id, s.pos, s.sentence FROM (
  SELECT d.doc_id AS article_id, CAST(t.i - 1 AS INT) AS pos,
         array_to_string(
           (string_split(d.text, ' '))[(CAST(t.i AS INT) - 1) * 8 + 1
                                       : (CAST(t.i AS INT) - 1) * 8 + 8], ' '
         ) AS sentence,
         len(string_split(d.text, ' ')) // 8 AS nsent
  FROM documents d,
       LATERAL unnest(range(1, len(string_split(d.text, ' ')) // 8 + 1)) AS t(i)
) s WHERE s.nsent >= 2
"""
    return sql_nsp_pairs(rows_sql, prob=0.5, seed=42)


def _q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-window plumbing over the synthetic media table (rows-only:
    embeddings come from the stubbed decoder)."""
    from sifter_mrc_search_engine_spark.operators.multimodal import (
        audio_windows,
        synthesize_media,
    )

    media = synthesize_media(spark, 48)
    return audio_windows(media).select("media_id", "window_idx", "start_ms", "end_ms")


def oracle_sql() -> dict[str, str]:
    from sifter_mrc_search_engine_spark.operators import mlt as _mlt
    from sifter_mrc_search_engine_spark.operators import positional as _pos
    from sifter_mrc_search_engine_spark.operators import snippets as _snip
    from sifter_mrc_search_engine_spark.operators.bm25f import bm25f_oracle_sql

    o = {
        "bm25_topk_flagship": bm25.bm25_oracle_sql(FLAGSHIP_QUESTION, 10),
        "pos_phrase_topk": _pos.sql_phrase_topk(PHRASE_QUESTION),
        "pos_near_topk": _pos.sql_near_topk("spark query", window=3),
        "pos_prefix_topk": _pos.sql_prefix_topk("s"),
        "pos_bool_topk": _pos.sql_bool_topk(
            must=["spark"], should=["vector"], must_not=["slow"]
        ),
        "pos_phrase_slop_topk": _pos.sql_phrase_slop_topk(PHRASE_QUESTION, slop=2),
        "pos_wildcard_topk": _pos.sql_wildcard_topk("quer*"),
        "pos_fuzzy_topk": _pos.sql_fuzzy_topk("spark", 1),
        "bm25_highlight_topk": _snip.sql_highlight_topk("spark query", window=8),
        "fts_more_like_this": _mlt.sql_more_like_this_topk(7, n_terms=8),
        "bm25f_topk": bm25f_oracle_sql(
            FLAGSHIP_QUESTION, _BM25F_SQL_FIELDS, _BM25F_WEIGHTS, top_k=10
        ),
        "bm25f_topk_indexed": bm25f_oracle_sql(
            FLAGSHIP_QUESTION, _BM25F_SQL_FIELDS, _BM25F_WEIGHTS, top_k=10
        ),
        "bm25f_multisegment": bm25f_oracle_sql(
            FLAGSHIP_QUESTION, _BM25F_SQL_FIELDS, _BM25F_WEIGHTS, top_k=10
        ),
        "bm25_multisegment": bm25.bm25_oracle_sql(FLAGSHIP_QUESTION, 10),
        "bm25_topk_wand_compressed": bm25.bm25_oracle_sql(FLAGSHIP_QUESTION, 10),
        "dedup_exact": _dd.sql_dedup_exact(),
        "dedup_shingles": _dd.sql_shingles(),
        "dedup_minhash_signatures": _dd.sql_minhash_signatures(),
        "dedup_lsh_candidate_pairs": _dd.sql_lsh_candidate_pairs(),
        "dedup_ngram_jaccard": _dd.sql_ngram_jaccard_pairs(threshold=0.2),
        "dedup_simhash": _dd.sql_simhash(),
        "dedup_benchmark_overlap": _dd.sql_benchmark_overlap(
            bench_where="doc_id % 97 = 0", k=8
        ),
        "dedup_repeated_spans": _dd.sql_repeated_span_stats(k=5, min_docs=2),
        "dedup_connected_components": _dd.sql_connected_components(
            _dd.sql_lsh_candidate_pairs()
        ),
        "pipeline_stratified_sample": _dd.sql_stratified_sample(
            {"en": 0.5, "de": 1.0, "zh": 0.2}
        ),
        "pipeline_pack_stream": _pk.sql_pack_token_stream(budget=512),
        "pipeline_chunk_texts": _pk.sql_materialize_chunks(budget=512),
        "dedup_embedding_cosine": _sim.sql_embedding_near_dup_pairs(
            threshold=0.5, n_planes=4
        ),
        "dedup_embedding_cosine_multiprobe": _sim.sql_embedding_near_dup_pairs(
            threshold=0.3, n_planes=6, hamming=1
        ),
        "text_token_counts": _ts.sql_token_counts(),
        "text_quality_scores": _ts.sql_quality_scores(),
        "text_lang_id": _ts.sql_lang_id(),
        "text_winnowing_fingerprint": _ts.sql_winnowing_fingerprint(),
        "text_gopher_quality": _ts.sql_gopher_quality(),
        "text_top_ngram_repetition": _ts.sql_top_ngram_char_frac(n=2),
        "text_pii_stats": _ts.sql_pii_stats(),
        "text_unigram_logprob": _ts.sql_unigram_logprob(),
        "sim_cosine_topk": _sim.sql_cosine_topk(0, k=10),
        # the k-means quantizer's Lloyd loop is unrolled into a bounded
        # CTE chain (iters is a parameter, not data-dependent), so IVF
        # gets a full DuckDB twin after all
        "sim_ivf_topk": _sim.sql_ivf_topk(0, k=10, n_clusters=8, nprobe=3, iters=3),
        # seed-fixed hyperplanes inlined as float64 literals -> the LSH
        # probe is fully SQL-expressible after all
        "sim_ann_lsh_topk": _sim.sql_ann_topk(0, k=10, n_planes=4),
        # multi-table LSH (recall lever): every table's planes inlined the
        # same way; candidate filter = OR over per-table Hamming balls
        "sim_ann_multiprobe_topk": _sim.sql_ann_topk_multi(0, k=10, n_planes=6, n_tables=4),
        # one-pass audit: input / quality-gate survivors / exact-dedup
        # keepers are all plain aggregates over the documents view
        "pipeline_prepare_corpus": """
WITH f AS (
  SELECT doc_id, text,
         (length(text) >= 10
          AND (CASE WHEN length(text) > 0
               THEN length(regexp_replace(text, '[^a-zA-Z0-9가-힣]', '', 'g'))
                    / length(text) ELSE 0 END) > 0.5
          AND len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) >= 3) AS q
  FROM documents
)
SELECT count(*) AS input,
       CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS after_quality,
       CAST(count(DISTINCT CASE WHEN q THEN md5(text) END) AS BIGINT)
         AS after_exact_dedup
FROM f
""",
        # the multimodal DECODERS are stubs (libs absent) and their fake
        # embeddings are excluded from these queries — but the plumbing
        # outputs (kind filter, metadata passthrough, window explode) are
        # deterministic functions of the synthetic media table, so DuckDB
        # can re-derive them from first principles (48 media rows, kind =
        # id % 3: 0=image, 1=audio; image dims 64+i%8 x 48+i%8; audio
        # duration 3000+100*(i%5) ms, 500 ms windows)
        "multimodal_image_features": """
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(64 + i % 8 AS INT) AS width,
       CAST(48 + i % 8 AS INT) AS height
FROM range(0, 48) t(i) WHERE i % 3 = 0
""",
        "multimodal_audio_windows": """
SELECT CAST(r.i AS BIGINT) AS media_id,
       CAST(t.j AS INT) AS window_idx,
       CAST(t.j * 500 AS INT) AS start_ms,
       CAST(least(t.j * 500 + 500, 3000 + 100 * (r.i % 5)) AS INT) AS end_ms
FROM range(0, 48) r(i),
     LATERAL unnest(range(0, (3000 + 100 * (r.i % 5) + 499) // 500)) AS t(j)
WHERE r.i % 3 = 1
""",
        # every NSP draw is an md5-based hash both engines can compute, so
        # the pair construction (coin, bucketed negative draws, collision
        # fallback) is fully SQL-expressible
        "pipeline_nsp_pairs": _nsp_oracle_sql(),
        # masking preserves array length, so n_tokens == the token count
        "pipeline_mlm_mask": """
SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS n_tokens
FROM documents
WHERE len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) > 0
""",
    }
    o.update(_rel.ORACLES)
    o.update({
        "bm25_topk_multi": bm25.bm25_oracle_sql("spark join merge table", 10),
        "bm25_topk_single": bm25.bm25_oracle_sql("window", 5),
        "index_term_frequencies": (
            f"SELECT term, doc_id, count(*) AS tf FROM ({_DUCK_TOKS}) GROUP BY 1, 2"
        ),
        "index_doc_frequencies": (
            "SELECT term, count(*) AS df FROM "
            f"(SELECT term, doc_id, count(*) AS tf FROM ({_DUCK_TOKS}) GROUP BY 1, 2) "
            "GROUP BY 1"
        ),
        "index_doc_lengths": (
            "SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9가-힣]+')) AS doc_len "
            "FROM documents"
        ),
        "index_corpus_stats": (
            "SELECT count(*) AS n_docs, round(avg(doc_len), 6) AS avgdl FROM "
            f"(SELECT doc_id, count(*) AS doc_len FROM ({_DUCK_TOKS}) GROUP BY 1)"
        ),
        "index_postings_lists": (
            "SELECT term, count(*) AS df, "
            "array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids FROM "
            f"(SELECT term, doc_id FROM ({_DUCK_TOKS}) GROUP BY 1, 2) "
            "GROUP BY term"
        ),
    })
    return o
