"""Varbyte codec round-trip contract, mirroring the postings round-trip
strategy of lucene/test-framework/.../index/BasePostingsFormatTestCase.java:121-344."""

import numpy as np
import pytest

from lucene_spark.util.varbyte import (
    decode,
    delta_decode,
    delta_encode,
    encode,
    segmented_delta_decode,
    segmented_delta_encode,
)


def _java_vint(i: int) -> bytes:
    out = bytearray()
    while i & ~0x7F:
        out.append((i & 0x7F) | 0x80)
        i >>= 7
    out.append(i)
    return bytes(out)


def test_wire_format_matches_writeVInt():
    # DataOutput.java:198-204
    vals = [0, 1, 127, 128, 255, 256, 16383, 16384, 2**21 - 1, 2**28, 2**35 + 7]
    assert encode(np.array(vals, dtype=np.int64)) == b"".join(
        _java_vint(v) for v in vals
    )


def test_empty():
    assert encode(np.array([], dtype=np.int64)) == b""
    assert decode(b"").size == 0


@pytest.mark.parametrize("seed", range(10))
def test_random_roundtrip(seed):
    rng = np.random.default_rng(seed)
    # df shapes from FIXTURES.md §3: singleton, VInt tail sizes, block
    # boundaries, level-1 skip boundary, large
    for n in [1, 2, 255, 256, 257, 259, 8191, 8192, 8193, 10_000]:
        bits = int(rng.integers(1, 55))
        vals = rng.integers(0, 2**bits, size=n)
        assert (decode(encode(vals)) == vals.astype(np.int64)).all()


def test_docid_gap_roundtrip():
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(2**20, size=5000, replace=False))
    gaps = delta_encode(doc_ids)
    assert (gaps[1:] > 0).all()  # strictly increasing docIDs -> positive gaps
    assert (delta_decode(decode(encode(gaps))) == doc_ids).all()


@pytest.mark.parametrize("seed", range(5))
def test_segmented_positions_roundtrip(seed):
    rng = np.random.default_rng(seed)
    ndocs = int(rng.integers(1, 50))
    lens = rng.integers(1, 30, size=ndocs)
    segs = [np.sort(rng.choice(2**16, size=l, replace=False)) for l in lens]
    flat = np.concatenate(segs)
    gaps = segmented_delta_encode(flat, lens)
    back = segmented_delta_decode(decode(encode(gaps)), lens)
    assert (back == flat).all()


def test_pos_shift_derivation():
    """Doc-key packing shift adapts to pathological position counts:
    floored at 2^21 for normal docs, widened past the batch max so a
    >=2M-token document can't bleed into the next doc's key space."""
    from lucene_spark.search.engine import _pos_shift

    assert _pos_shift(100, 3) == 1 << 21
    assert _pos_shift((1 << 21) - 2, 3) == 1 << 22  # headroom crosses 2^21
    assert _pos_shift(1 << 21, 1) == 1 << 22
    assert _pos_shift((1 << 25) + 5, 2) == 1 << 26
    assert _pos_shift(0, 1, floor_bits=22) == 1 << 22
    # shift always strictly exceeds max_pos + headroom
    for mp in (0, 1, (1 << 21) - 1, 1 << 21, (1 << 23) + 7):
        s = int(_pos_shift(mp, 4))
        assert s > mp + 4 and (s & (s - 1)) == 0
