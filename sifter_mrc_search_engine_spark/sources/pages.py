"""Common-Crawl-style pages corpus: schema + deterministic synthesizer.

Input shape per BASELINE.json ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

The synthesizer is STATELESS per doc_id (splitmix64 hash chains, no RNG
object, no wall clock), so the same corpus materializes identically at any
partitioning / parallelism — the property the resume tests and the
local[8]-vs-local[32] scaling runs depend on. Term draws follow a
Zipf(s=1.1) distribution over a ~2000-word vocabulary so hot-term skew is
present by construction (exercises salted repartition; SURVEY.md §7 step 1).

``html`` wraps the known body text in one of four noise templates (tags,
emails, URLs, jamo/repeat runs) chosen by doc_id, constructed so that the
reference cleaning pipeline (functions/cleaning.py) recovers the body text
byte-for-byte — extraction is verifiable without re-running the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

VOCAB_SIZE = 2000
ZIPF_S = 1.1
_EPOCH = np.datetime64("2024-01-01T00:00:00")

# --- vocabulary: CV-syllable pseudo-words (no digit runs, no 3-repeats, so
# the cleaning pipeline is a no-op on body text) --------------------------


def _build_vocab(n: int = VOCAB_SIZE) -> list:
    syl = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]  # 95
    m = len(syl)
    return [syl[i % m] + syl[(i // m) % m] + syl[(i // (m * m)) % m] for i in range(n)]


VOCAB = _build_vocab()
_VOCAB_ARR = np.array(VOCAB)

# Zipf(s) inverse-CDF table: uniform u -> term rank.
_zipf_w = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_ZIPF_CDF = np.cumsum(_zipf_w / _zipf_w.sum())


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    """uint64 hash -> uniform float64 in [0, 1)."""
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def doc_terms(doc_id: int, seed: int = 42) -> list:
    """Term sequence of one document (used by tests/oracles)."""
    did = np.uint64(doc_id)
    with np.errstate(over="ignore"):
        h0 = _splitmix64(
            np.array([did + np.uint64(seed) * np.uint64(0x51_7C_C1_B7_27_22_0A_95)])
        )
    # log-normal-ish length in [5, 500]
    ln = 5 + int(np.exp(3.0 + 1.0 * (2.0 * _u01(h0)[0] - 1.0)))
    ln = min(ln, 500)
    idx = np.arange(ln, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hs = _splitmix64(did * np.uint64(0x9E3779B97F4A7C15) + idx + np.uint64(seed))
    ranks = np.searchsorted(_ZIPF_CDF, _u01(hs), side="right")
    return _VOCAB_ARR[np.minimum(ranks, VOCAB_SIZE - 1)].tolist()


def _render_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    urls, htmls, texts, langs, tss = [], [], [], [], []
    for d in ids.tolist():
        terms = doc_terms(d, seed)
        body = " ".join(terms)
        variant = d % 4
        if variant == 0:
            html = f"<html><body><p>{body}</p></body></html>"
        elif variant == 1:
            html = f'  <div class="art-{d}">{body}</div> spam{d}@mail-host.example.org '
        elif variant == 2:
            # no path slash: the reference URL regex (C4) stops at '/'
            html = f"<p>{body}</p> https://tracker-{d}.example.com%2Fx"
        else:
            html = f"<article>{body}</article> ㅋㅋㅋ !!! ㅏㅏ"
        urls.append(f"https://site{d % 97}.example/{['sports','it','erica'][d % 3]}/{d}")
        htmls.append(html.encode("utf-8"))
        texts.append(body)
        langs.append("ko" if d % 10 else "en")
        tss.append(_EPOCH + np.timedelta64(d, "s"))
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def synthesize_pages_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side pandas materialization (tests, tiny corpora)."""
    return _render_batch(np.arange(n_docs, dtype=np.int64), seed)


def synthesize_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed synthesis: ``spark.range`` -> ``mapInPandas``.

    Scales linearly with executors; per-row determinism means the output is
    independent of ``partitions``.
    """
    partitions = partitions or max(8, n_docs // 25_000)
    rng = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield _render_batch(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(gen, PAGES_SCHEMA)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
