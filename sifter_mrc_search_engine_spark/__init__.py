"""PySpark-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the retrieval core of
sickbirdd/sifter-mrc-search-engine (reference at /root/reference, cited by
file:line throughout), expressed Spark-first: DataFrame/SQL plans optimized
by Catalyst, vectorized pandas/Arrow UDFs where Python is genuinely needed
(text cleaning byte-identity, posting-list codec, block-max WAND), explicit
partitioning / salting for hot-term skew, and per-partition checkpoint
lineage for resumable builds.

Package layout
--------------
functions/   scalar text functions: cleaning (C1-C9), analyzer (C10-C12),
             text statistics (lang-id, quality, fingerprints)
sources/     pages-corpus synthesizer, thin parquet catalog with
             partition manifests, file-format parser dispatch (S6-S11)
operators/   index build (tf/df/doclen/postings), postings codec
             (delta+varbyte+skip+blockmax), BM25 scorers (brute-force
             oracle + block-max WAND), dedup, similarity search,
             relational operator surface
plans/       query lifecycle (analyze -> retrieve -> score -> top-k),
             checkpoint/resume orchestration
streaming/   incremental index maintenance via foreachBatch
"""

__version__ = "0.1.0"
