"""Engine-wide constants, pinned in one place.

The reference requests ``"similarity": "bm25"`` from its external engine
(reference: modules/mrc_service/search_functions.py:91) without overriding
parameters, so the engine defaults apply — the standard Okapi/Lucene
defaults k1=1.2, b=0.75. Top-k and retrieval-depth ceilings come from
modules/mrc_service/server.py:18-19.
"""

# --- BM25 (Okapi) ---------------------------------------------------------
BM25_K1: float = 1.2
BM25_B: float = 0.75

# --- query-time ceilings (reference: server.py:18-19) ---------------------
MAX_TOP_K: int = 10
MAX_DOC_PAGE_SIZE: int = 10
DEFAULT_TOP_K: int = 10

# --- postings codec --------------------------------------------------------
# Block size for skip pointers / block-max metadata: one skip entry and one
# max-impact bound per BLOCK_SIZE postings.
BLOCK_SIZE: int = 128

# --- index partitioning ----------------------------------------------------
# Terms are hash-bucketed into TERM_BUCKETS index partitions (query-time
# partition pruning reads only the buckets of the query's terms).
TERM_BUCKETS: int = 64
# A term whose postings exceed SALT_THRESHOLD entries is split across
# SALT_FANOUT salted sub-groups for encoding (hot-term skew defense).
SALT_THRESHOLD: int = 100_000
SALT_FANOUT: int = 16

# --- ingestion (reference: parser_manager.py:43, ppt_parser.py:20) --------
MIN_PARAGRAPH_LEN: int = 10
MIN_PARAGRAPH_LEN_PPTX: int = 5
