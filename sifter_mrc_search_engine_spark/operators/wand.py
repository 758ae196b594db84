"""Block-max WAND top-k over the compressed index.

Query lifecycle (SURVEY.md §3.1 Spark mapping): analyze question ->
partition-pruned index scan (bucket IN query buckets AND term IN terms) ->
WAND kernel -> top-k (score desc, doc_id asc), exactly reproducing the
brute-force oracle's scores (same float64 expression shapes, same
ascending-term summation order — operators/bm25.py pins both).

The kernel is document-at-a-time WAND with block-max refinement:
  * term cursors ordered by current doc_id
  * pivot = first cursor where the prefix sum of GLOBAL max impacts
    reaches the top-k threshold θ; docs below the pivot doc cannot beat θ
  * at the pivot, the tighter per-BLOCK max sum is checked; if it still
    can't beat θ the kernel jumps past the smallest current block boundary
    (skip pointers give direct block access, skipped blocks are never
    decoded) without scoring
  * pruning uses strict < so score ties are never dropped (tie-break is
    doc_id asc, matching the reference's stable sort, server.py:94)

Salted segments (disjoint doc-id ranges per term) are separate cursors of
the same term; a doc appears in exactly one segment so scoring is unchanged.

Distribution: one query's postings are a handful of rows — the kernel runs
driver-side per query (the reference serves queries from one process too,
server.py:198-236). Query BATCHES distribute via plans/query.py: queries ⋈
index rows grouped per query_id, kernel inside applyInPandas.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..constants import BLOCK_SIZE, BM25_B, BM25_K1, DEFAULT_TOP_K
from .postings_codec import (
    decode_blockmax,
    decode_postings,
    decode_skips,
    varbyte_decode,
)


class _Cursor:
    """Lazy block-decoding cursor over one encoded posting segment."""

    __slots__ = (
        "term", "idf", "max_impact", "gaps", "tfs", "skips", "blockmax",
        "blockmaxtf",
        "n", "block", "n_blocks", "block_size", "ids", "tf", "i", "exhausted",
    )

    def __init__(self, row, idf: float):
        self.term = row["term"]
        self.idf = idf
        self.max_impact = float(row["max_impact"])
        self.gaps = bytes(row["gaps"])
        self.tfs = bytes(row["tfs"])
        self.skips = decode_skips(bytes(row["skips"]))
        self.blockmax = decode_blockmax(bytes(row["blockmax"]))
        # weight-free per-block max tf (BM25F block pruning); absent on
        # indexes encoded before the column existed -> None disables it
        try:
            bmtf = row["blockmaxtf"]
        except (KeyError, ValueError, IndexError):
            bmtf = None
        from .postings_codec import decode_blockmaxtf

        self.blockmaxtf = decode_blockmaxtf(bytes(bmtf)) if bmtf is not None else None
        self.n = int(row["n"])
        try:
            self.block_size = int(row["block_size"])
        except (KeyError, IndexError, ValueError):
            self.block_size = BLOCK_SIZE
        self.n_blocks = self.skips.shape[0]
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, b: int) -> None:
        if b >= self.n_blocks:
            self.exhausted = True
            return
        lo = b * self.block_size
        cnt = min(self.block_size, self.n - lo)
        # bound the byte scan with the NEXT block's offset: without it
        # every load is O(remaining list bytes), erasing the skip benefit
        g_end = int(self.skips[b + 1, 1]) if b + 1 < self.n_blocks else None
        t_end = int(self.skips[b + 1, 2]) if b + 1 < self.n_blocks else None
        g = varbyte_decode(self.gaps, offset=int(self.skips[b, 1]), count=cnt, end=g_end).astype(np.int64)
        t = varbyte_decode(self.tfs, offset=int(self.skips[b, 2]), count=cnt, end=t_end).astype(np.int64)
        g[0] -= 1
        self.ids = np.cumsum(g)
        self.tf = t
        self.block = b
        self.i = 0

    @property
    def doc(self) -> int:
        return int(self.ids[self.i])

    @property
    def cur_tf(self) -> int:
        return int(self.tf[self.i])

    def block_max_at(self, target: int) -> Tuple[float, int]:
        """(block-max impact, block last doc) of the block containing the
        first doc >= target — reads only skip/blockmax metadata."""
        b = self.block
        if self.skips[b, 0] < target:
            b = int(np.searchsorted(self.skips[:, 0], target, side="left"))
            if b >= self.n_blocks:
                return 0.0, 2**62
        return float(self.blockmax[b]), int(self.skips[b, 0])

    def block_maxtf_at(self, target: int) -> Tuple[int, int]:
        """(block-max tf, block last doc) of the block containing the
        first doc >= target — the weight-free twin of :meth:`block_max_at`
        for field-weighted scorers. Requires ``blockmaxtf`` metadata."""
        b = self.block
        if self.skips[b, 0] < target:
            b = int(np.searchsorted(self.skips[:, 0], target, side="left"))
            if b >= self.n_blocks:
                return 0, 2**62
        return int(self.blockmaxtf[b]), int(self.skips[b, 0])

    def next_doc(self) -> None:
        self.i += 1
        if self.i >= self.ids.size:
            self._load_block(self.block + 1)

    def seek(self, target: int) -> None:
        """Advance to first doc >= target; skipped blocks are not decoded."""
        while not self.exhausted:
            if self.skips[self.block, 0] < target:
                b = int(np.searchsorted(self.skips[:, 0], target, side="left"))
                if b >= self.n_blocks:
                    self.exhausted = True
                    return
                self._load_block(b)
            j = int(np.searchsorted(self.ids, target, side="left"))
            if j < self.ids.size:
                self.i = j
                return
            self._load_block(self.block + 1)


def _score_doc(cursors: List[_Cursor], doc: int, dl: float, avgdl: float,
               k1: float, b: float) -> float:
    """Sum matching-term contributions in ASCENDING TERM order (float64
    order pinned to the oracle's array_sort fold, bm25.py)."""
    parts: List[Tuple[str, float]] = []
    for c in cursors:
        if not c.exhausted and c.doc == doc:
            tf = float(c.cur_tf)
            contrib = c.idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))
            parts.append((c.term, contrib))
    score = 0.0
    for _, v in sorted(parts, key=lambda p: p[0]):
        score += v
    return score


#: auto-mode ceiling for the dense scorer: total decoded postings
DENSE_POSTINGS_LIMIT = 20_000_000
#: and for the dense accumulator width (max doc_id)
DENSE_DOCSPACE_LIMIT = 64_000_000


def _dense_topk(rows, query_terms, doclen, n_docs: int, avgdl: float,
                top_k: int, k1: float, b: float) -> List[Tuple[int, float]]:
    """Vectorized exact scorer: decode everything, accumulate per-doc in
    ASCENDING TERM order into a dense float64 array (identical summation
    order to the oracle and to WAND), numpy top-k with doc_id tie-break.

    O(total postings) with no per-doc Python — the winner for in-memory
    serving when terms are dense and WAND's pruning cannot bite. WAND
    remains the disk-path kernel (it avoids decoding skipped blocks)."""
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    max_doc = max(int(r["max_doc"]) for r in rows)
    acc = np.zeros(max_doc + 1, dtype=np.float64)
    seen = np.zeros(max_doc + 1, dtype=bool)
    for term in sorted(by_term):
        segs = by_term[term]
        df = int(segs[0]["df"])
        idf = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
        for r in segs:  # salted segments: disjoint doc ranges
            ids, tfs = decode_postings(
                gaps=bytes(r["gaps"]), tfs=bytes(r["tfs"]), n=int(r["n"]),
                skips=bytes(r["skips"]), block_size=int(r["block_size"]),
            )
            tfs = tfs.astype(np.float64)
            if isinstance(doclen, np.ndarray):
                dls = doclen[ids].astype(np.float64)
            else:
                dls = np.fromiter(
                    (doclen[int(i)] for i in ids), dtype=np.float64, count=ids.size
                )
            contrib = idf * tfs * (k1 + 1.0) / (tfs + k1 * ((1.0 - b) + (b * dls) / avgdl))
            acc[ids] += contrib  # ids unique per term -> plain fancy add
            seen[ids] = True
    cand = np.flatnonzero(seen)
    scores = acc[cand]
    k = min(top_k, cand.size)
    if k == 0:
        return []
    # keep every row tied with the k-th-best score so the doc_id
    # tie-break sees all tied candidates, then lexsort the small set
    kth_score = np.partition(scores, cand.size - k)[cand.size - k]
    mask = scores >= kth_score
    cand_ids, cand_scores = cand[mask], scores[mask]
    order = np.lexsort((cand_ids, -cand_scores))[:k]
    return [(int(cand_ids[i]), float(cand_scores[i])) for i in order]


def wand_topk(
    index_rows: Sequence[dict],
    query_terms: Sequence[str],
    doclen,
    n_docs: int,
    avgdl: float,
    top_k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    use_blockmax: bool = True,
    method: str = "auto",
) -> List[Tuple[int, float]]:
    """Top-k (doc_id, score) for one query over encoded index rows.

    ``index_rows``: the (term, segment) rows matching the query's terms
    (dict-like with INDEX_SCHEMA fields). ``doclen``: doc_id -> doc length
    (dict or dense numpy array indexed by doc_id).

    ``method``: 'wand' (pruning kernel, decodes only needed blocks),
    'dense' (vectorized full-decode scorer), or 'auto' — dense when the
    candidate volume fits the dense limits (in-memory serving sweet spot),
    WAND otherwise. Both produce IDENTICAL results (same float64 order).
    """
    qset = set(query_terms)
    rows = [r for r in index_rows if r["term"] in qset]
    if not rows:
        return []

    if method not in ("auto", "wand", "dense"):
        raise ValueError(f"unknown method {method!r}")
    if method != "wand":
        total_n = sum(int(r["n"]) for r in rows)
        max_doc = max(int(r["max_doc"]) for r in rows)
        if method == "dense" or (
            total_n <= DENSE_POSTINGS_LIMIT and max_doc <= DENSE_DOCSPACE_LIMIT
        ):
            return _dense_topk(rows, query_terms, doclen, n_docs, avgdl, top_k, k1, b)

    cursors = []
    for r in rows:
        df = int(r["df"])
        idf = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
        cursors.append(_Cursor(r, idf))

    heap: List[Tuple[float, int]] = []  # (score, -doc_id) min-heap, size k

    def threshold() -> float:
        return heap[0][0] if len(heap) >= top_k else -1.0

    def offer(doc: int, score: float) -> None:
        item = (score, -doc)
        if len(heap) < top_k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    live = [c for c in cursors if not c.exhausted]
    while live:
        live.sort(key=lambda c: c.doc)
        theta = threshold()
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += c.max_impact
            if theta < 0.0 or acc >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # sum of ALL upper bounds can't reach θ — done
        pivot_doc = live[pivot].doc

        if live[0].doc == pivot_doc:
            # prefix = every cursor at or before the pivot doc, INCLUDING
            # cursors tied at pivot_doc beyond the pivot index — their
            # contribution is part of pivot_doc's true score, so the
            # block-max bound must count them or the jump may skip a hit
            end = pivot + 1
            while end < len(live) and live[end].doc == pivot_doc:
                end += 1
            prefix = live[:end]
            if use_blockmax and theta >= 0.0:
                # advance over bounded-out blocks on METADATA ALONE (skip
                # pointers + blockmax lookups); only the final landing
                # block is decoded — consecutive cold blocks cost zero
                # decodes, not one decode per block boundary
                target = pivot_doc
                while True:
                    infos = [c.block_max_at(target) for c in prefix]
                    if sum(bm for bm, _ in infos) >= theta:
                        break
                    nt = min(last for _, last in infos) + 1
                    if end < len(live):
                        # past the next cursor's doc the prefix changes —
                        # stop and let the outer loop re-pivot
                        nt = min(nt, live[end].doc)
                    if nt <= target:
                        break
                    target = nt
                if target > pivot_doc:
                    for c in prefix:
                        c.seek(target)
                    live = [c for c in live if not c.exhausted]
                    continue
            dl = float(doclen[pivot_doc])
            offer(pivot_doc, _score_doc(live, pivot_doc, dl, avgdl, k1, b))
            for c in live:
                if not c.exhausted and c.doc == pivot_doc:
                    c.next_doc()
            live = [c for c in live if not c.exhausted]
        else:
            for c in live[:pivot]:
                c.seek(pivot_doc)
            live = [c for c in live if not c.exhausted]

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-nd, s) for s, nd in out]
