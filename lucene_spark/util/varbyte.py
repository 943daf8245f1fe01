"""Variable-byte (LEB128) codec + delta helpers, numpy-vectorized.

Behavioral reference:
  - VInt/VLong wire format: lucene/core/src/java/org/apache/lucene/store/DataOutput.java:198-204
    (7 data bits per byte, high bit = continuation, little-endian groups)
  - Postings blocks use docID *deltas* ("d-gaps") within 256-doc blocks:
    lucene/core/src/java/org/apache/lucene/codecs/lucene104/Lucene104PostingsFormat.java:38-81
    (we use varbyte for whole blocks where Lucene uses FOR/PFOR + VInt tail;
    same information content, Parquet+ZSTD supplies the entropy coding)

Both encode and decode are O(total_bytes) numpy array ops — no per-value
Python. Supports non-negative values < 2**63.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = np.arange(10, dtype=np.uint64) * np.uint64(7)


def encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array into bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while np.any(tmp):
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    offsets = ends - nbytes
    max_nb = int(nbytes.max())
    for bpos in range(max_nb):
        mask = nbytes > bpos
        idx = offsets[mask] + bpos
        chunk = (v[mask] >> np.uint64(7 * bpos)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > bpos).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back into an int64 array."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (data & 0x80) == 0
    # group id per byte: 0-based index of the value this byte belongs to
    gid = np.zeros(data.shape, dtype=np.int64)
    np.cumsum(is_end[:-1], out=gid[1:])
    starts = np.flatnonzero(np.concatenate(([True], is_end[:-1])))
    pos_in_group = np.arange(data.size, dtype=np.int64) - starts[gid]
    contrib = (data & 0x7F).astype(np.uint64) << _SHIFTS[pos_in_group]
    values = np.add.reduceat(contrib, starts)
    return values.astype(np.int64)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Strictly/weakly increasing array -> gaps (first value kept raw)."""
    a = np.asarray(sorted_values, dtype=np.int64)
    if a.size == 0:
        return a
    return np.concatenate(([a[0]], np.diff(a)))


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.int64)
    return np.cumsum(g)


def segmented_delta_encode(values: np.ndarray, seg_lengths: np.ndarray) -> np.ndarray:
    """Delta-encode a concatenation of sorted segments (e.g. the position
    lists of many docs laid end to end, segment i of length seg_lengths[i]).
    First element of each segment is kept raw."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    out[1:] = v[1:] - v[:-1]
    starts = np.cumsum(np.asarray(seg_lengths, dtype=np.int64))[:-1]
    out[starts] = v[starts]
    if len(seg_lengths):
        out[0] = v[0]
    return out


def segmented_delta_decode(gaps: np.ndarray, seg_lengths: np.ndarray) -> np.ndarray:
    """Inverse of segmented_delta_encode, fully vectorized: global cumsum
    then subtract the running offset accumulated before each segment."""
    g = np.asarray(gaps, dtype=np.int64)
    if g.size == 0:
        return g
    lens = np.asarray(seg_lengths, dtype=np.int64)
    cs = np.cumsum(g)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # value carried into each segment from the global cumsum = cs[start-1]
    carry = np.concatenate(([0], cs[np.cumsum(lens)[:-1] - 1])) if lens.size > 1 else np.array([0], dtype=np.int64)
    seg_id = np.repeat(np.arange(lens.size), lens)
    return cs - carry[seg_id]
