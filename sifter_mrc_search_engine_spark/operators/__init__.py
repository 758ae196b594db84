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
from .fielded_index import build_fielded_index, search_bm25f
from .similarity import (
    ann_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    write_bucketed_embeddings,
)

__all__ = [
    "bm25f_brute_force",
    "build_fielded_index",
    "search_bm25f",
    "ann_topk",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "write_bucketed_embeddings",
    "tokens",
    "term_frequencies",
    "doc_lengths",
    "doc_frequencies",
    "corpus_stats",
    "build_postings",
    "bm25_brute_force",
    "bm25_term_scores",
]
