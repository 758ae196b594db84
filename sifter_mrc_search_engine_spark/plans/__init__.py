from .checkpoint import build_index_resumable, read_manifest
from .query import IndexSearcher

__all__ = ["build_index_resumable", "read_manifest", "IndexSearcher"]
