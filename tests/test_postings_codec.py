"""Roundtrip + skip/block-max property tests (FIXTURES.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sifter_mrc_search_engine_spark.constants import BLOCK_SIZE
from sifter_mrc_search_engine_spark.operators.postings_codec import (
    decode_block,
    decode_blockmax,
    decode_postings,
    decode_skips,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == vals


def test_varbyte_five_byte_gap():
    # gaps > 2^28 force 5-byte varbyte codes (FIXTURES.md §5)
    arr = np.array([2**28 + 7, 2**35, 1, 0], dtype=np.uint64)
    enc = varbyte_encode(arr)
    assert len(enc) == 5 + 6 + 1 + 1
    assert list(varbyte_decode(enc)) == list(arr)


def _rng_list(size, gap_kind, seed):
    rng = np.random.RandomState(seed)
    if gap_kind == "one":
        gaps = np.ones(size, dtype=np.int64)
    elif gap_kind == "huge":
        gaps = rng.randint(2**28, 2**30, size=size).astype(np.int64)
    else:
        gaps = rng.randint(1, 10_000, size=size).astype(np.int64)
    doc_ids = np.cumsum(gaps) - 1
    tfs = rng.randint(1, 300, size=size).astype(np.int64)
    return doc_ids, tfs


@pytest.mark.parametrize("size", [1, 2, BLOCK_SIZE - 1, BLOCK_SIZE, BLOCK_SIZE + 1, 10 * BLOCK_SIZE])
@pytest.mark.parametrize("gap_kind", ["one", "random", "huge"])
def test_postings_roundtrip(size, gap_kind):
    doc_ids, tfs = _rng_list(size, gap_kind, seed=size)
    impacts = tfs / (tfs + 1.2)
    enc = encode_postings(doc_ids, tfs, impacts)
    d, t = decode_postings(enc)
    assert (d == doc_ids).all()
    assert (t == tfs).all()

    sk = decode_skips(enc["skips"])
    bm = decode_blockmax(enc["blockmax"])
    n_blocks = (size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert sk.shape[0] == bm.size == n_blocks
    for b in range(n_blocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, size)
        # skip points at block start; last_doc matches
        assert sk[b, 0] == doc_ids[hi - 1]
        bd, bt = decode_block(enc["gaps"], enc["tfs"], enc["skips"], b, size)
        assert (bd == doc_ids[lo:hi]).all()
        assert (bt == tfs[lo:hi]).all()
        # block-max bound dominates every true impact in block
        assert bm[b] >= impacts[lo:hi].max() - 0.0
    assert enc["max_impact"] == bm.max()


def test_compression_beats_raw():
    doc_ids, tfs = _rng_list(5000, "random", seed=7)
    enc = encode_postings(doc_ids, tfs)
    raw = doc_ids.nbytes + tfs.nbytes
    comp = len(enc["gaps"]) + len(enc["tfs"]) + len(enc["skips"]) + len(enc["blockmax"])
    assert comp < raw / 2
