"""Lucene SmallFloat byte4 norm encoding, vectorized in numpy.

Behavioral reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java
  - longToInt4:   :103-123  (4-significant-bit float-like encoding)
  - int4ToLong:   :126-139
  - intToByte4:   :147-156  (exact for 0..NUM_FREE_VALUES-1, lossy above)
  - byte4ToInt:   :159-167

Document lengths (token counts) are quantized to one byte through
intToByte4; BM25 decodes them through byte4ToInt via a 256-entry table
(BM25Similarity.java LENGTH_TABLE). Values 0..39 are exact.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: np.ndarray | int) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    num_bits = _bit_length(i)  # == 64 - Long.numberOfLeadingZeros(i)
    shift = num_bits - 4
    subnormal = num_bits < 4
    shift_safe = np.where(subnormal, 0, shift)
    encoded = (i >> shift_safe) & 0x07
    normal = (encoded | ((shift_safe + 1) << 3))
    return np.where(subnormal, i, normal).astype(np.int64)


def _bit_length(i: np.ndarray) -> np.ndarray:
    """Vectorized 64 - numberOfLeadingZeros(i) for non-negative int64."""
    i = np.asarray(i, dtype=np.uint64)
    out = np.zeros(i.shape, dtype=np.int64)
    v = i.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        out = np.where(mask, out + shift, out)
        v = np.where(mask, v >> np.uint64(shift), v)
    return out + (i > 0).astype(np.int64)


def int4_to_long(i: np.ndarray | int) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    subnormal = shift == -1
    shift_safe = np.where(subnormal, 0, shift)
    return np.where(subnormal, bits, (bits | 0x08) << shift_safe).astype(np.int64)


MAX_INT4 = int(long_to_int4(np.int64(2**31 - 1)))
NUM_FREE_VALUES = 255 - MAX_INT4


def int_to_byte4(i: np.ndarray | int) -> np.ndarray:
    """Encode non-negative int -> unsigned byte value 0..255 (returned as
    int64 for arithmetic friendliness; callers store as they like)."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    small = i < NUM_FREE_VALUES
    enc = NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(small, i, enc).astype(np.int64)


def byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Decode unsigned byte value 0..255 -> int."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    small = b < NUM_FREE_VALUES
    dec = NUM_FREE_VALUES + int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))
    return np.where(small, b, dec).astype(np.int64)


# BM25Similarity's LENGTH_TABLE: decoded doc length per norm byte.
LENGTH_TABLE = byte4_to_int(np.arange(256)).astype(np.float32)
