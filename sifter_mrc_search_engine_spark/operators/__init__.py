from .index_build import (
    tokens,
    term_frequencies,
    doc_lengths,
    doc_frequencies,
    corpus_stats,
    build_postings,
)
from .bm25 import bm25_brute_force, bm25_term_scores
from .bm25f import bm25f_brute_force

__all__ = [
    "bm25f_brute_force",
    "tokens",
    "term_frequencies",
    "doc_lengths",
    "doc_frequencies",
    "corpus_stats",
    "build_postings",
    "bm25_brute_force",
    "bm25_term_scores",
]
