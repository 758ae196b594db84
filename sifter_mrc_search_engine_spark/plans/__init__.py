from .checkpoint import build_index_resumable, read_manifest
from .http_service import HttpFrontDoor
from .query import IndexSearcher
from .service import InferenceService

__all__ = [
    "build_index_resumable",
    "read_manifest",
    "IndexSearcher",
    "InferenceService",
    "HttpFrontDoor",
]
