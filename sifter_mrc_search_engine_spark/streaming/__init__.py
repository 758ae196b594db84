from .incremental import stream_build_index, MultiSegmentSearcher

__all__ = ["stream_build_index", "MultiSegmentSearcher"]
