"""Synthesizer invariants: determinism, extraction byte-identity, skew."""

import numpy as np

from sifter_mrc_search_engine_spark.functions.cleaning import clean_text
from sifter_mrc_search_engine_spark.sources.pages import (
    VOCAB,
    doc_terms,
    synthesize_pages,
    synthesize_pages_pdf,
)


def test_vocab_is_clean():
    assert len(set(VOCAB)) == len(VOCAB) == 2000
    for w in VOCAB[:50] + VOCAB[-50:]:
        assert clean_text(w) == w  # cleaning is a no-op on body tokens


def test_extraction_byte_identity_all_variants():
    pdf = synthesize_pages_pdf(64)
    for _, row in pdf.iterrows():
        html = row["html"].decode("utf-8")
        assert clean_text(html) == row["text"], row["url"]


def test_determinism_across_partitioning(spark):
    a = synthesize_pages(spark, 200, partitions=2).orderBy("url").collect()
    b = synthesize_pages(spark, 200, partitions=13).orderBy("url").collect()
    assert a == b
    local = synthesize_pages_pdf(200).sort_values("url").reset_index(drop=True)
    assert [r["text"] for r in a] == list(local["text"])


def test_zipf_skew_present():
    """The head term must dominate — the salting code path needs real skew."""
    counts = {}
    for d in range(300):
        for t in doc_terms(d):
            counts[t] = counts.get(t, 0) + 1
    top = sorted(counts.values(), reverse=True)
    total = sum(top)
    assert top[0] / total > 0.02  # head term ≫ uniform share (1/2000)
    assert len(counts) > 200
