"""Group varint (C6) contract: wire-format properties, round-trip,
32-bit range guard, and blockcodec dispatch (GroupVIntUtil.java analog;
flags-first Stream VByte layout, see util/groupvint.py docstring)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.util import groupvint
from lucene_spark.util.blockcodec import (
    _GVINT,
    _LEB,
    decode_block,
    encode_block,
)
from lucene_spark.util.varbyte import encode as leb_encode


def test_empty():
    assert groupvint.encode(np.array([], dtype=np.int64)) == b""
    assert groupvint.decode(b"").size == 0
    assert encode_block(np.array([], dtype=np.int64), gvint=True) == b""


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 255, 256, 1000])
def test_tail_lengths_roundtrip(n):
    """Every n % 4 residue, including the empty-pad group boundary."""
    rng = np.random.default_rng(n)
    v = rng.integers(0, 1 << 32, n, dtype=np.int64)
    assert (groupvint.decode(groupvint.encode(v)) == v).all()


def test_byte_width_boundaries():
    """Values at every 1/2/3/4-byte boundary in one group."""
    v = np.array(
        [0, 0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFF, 0x1000000, 0xFFFFFFFF],
        dtype=np.int64,
    )
    assert (groupvint.decode(groupvint.encode(v)) == v).all()


def test_flag_nibble_order_matches_reference():
    """GroupVIntUtil.java:64-67 — value 0's length field occupies the
    HIGH two bits of the flag byte (n1Minus1 = flag >> 6)."""
    v = np.array([0x12345678, 1, 1, 1], dtype=np.int64)  # 4,1,1,1 bytes
    buf = groupvint.encode(v)
    flag = buf[4]  # after u32le count
    assert flag >> 6 == 3 and flag & 0x3F == 0
    v2 = np.array([1, 1, 1, 0x12345678], dtype=np.int64)  # 1,1,1,4 bytes
    assert groupvint.encode(v2)[4] == 3


def test_size_formula():
    """Size = 4 (count) + ceil(n/4) flags + per-value byte widths."""
    v = np.array([1, 0x1FF, 0x1FFFF, 0x1FFFFFF, 5], dtype=np.int64)
    assert len(groupvint.encode(v)) == 4 + 2 + (1 + 2 + 3 + 4 + 1)


def test_over_32bit_rejected():
    with pytest.raises(ValueError, match="32-bit"):
        groupvint.encode(np.array([1 << 32], dtype=np.int64))


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_hypothesis_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert (groupvint.decode(groupvint.encode(v)) == v).all()
    assert (decode_block(encode_block(v, gvint=True)) == v).all()


def test_blockcodec_dispatch_and_leb_fallbacks():
    # multi-byte values: group varint wins, tag 0x03
    rng = np.random.default_rng(7)
    big = rng.integers(1 << 16, 1 << 31, 256, dtype=np.int64)
    out = encode_block(big, gvint=True)
    assert out[0] == _GVINT
    assert len(out) < len(leb_encode(big)) + 1
    assert (decode_block(out) == big).all()
    # >32-bit payload: LEB fallback (GroupVIntUtil is int-ranged)
    wide = np.array([1, 1 << 40, 2], dtype=np.int64)
    out = encode_block(wide, gvint=True)
    assert out[0] == _LEB and (decode_block(out) == wide).all()
    # tiny 1-byte-gap payload: LEB is smaller (count+flag overhead)
    tiny = np.array([3, 1], dtype=np.int64)
    out = encode_block(tiny, gvint=True)
    assert out[0] == _LEB and (decode_block(out) == tiny).all()


def test_cross_codec_readability():
    """Any SPARK_GRAFT_CODEC setting's payloads decode under any other:
    the tag byte, not the manifest, selects the decoder."""
    rng = np.random.default_rng(11)
    v = rng.integers(0, 1 << 24, 300, dtype=np.int64)
    for kwargs in ({"packed": False}, {"packed": True}, {"gvint": True}):
        assert (decode_block(encode_block(v, **kwargs)) == v).all()
