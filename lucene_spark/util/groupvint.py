"""Group-varint codec (C6), numpy-vectorized.

Behavioral reference (not a port):
  - Group varint packs ints in groups of 4: one flag byte carries four
    2-bit length fields ((numBytes-1) per value, so each value occupies
    1-4 little-endian bytes), and a <4-value tail falls back to plain
    VInt — lucene/core/src/java/org/apache/lucene/util/GroupVIntUtil.java:30-51,62-67
    (MAX_LENGTH_PER_GROUP, readGroupVInts tail loop, flag nibble order
    n1 in the high bits).
  - Values are int-ranged: anything >= 2**32 cannot be represented
    (GroupVIntUtil is int[]-based); callers must fall back to LEB for
    such payloads (blockcodec.encode_block does).

Layout difference, deliberate: Lucene interleaves each flag byte with
its group's data bytes because its reader is stream-oriented. Decoding
that layout in bulk requires a sequential pointer-chase (position of
flag g depends on the sizes in flags 0..g-1). We instead store ALL flag
bytes first, then all data bytes — the "Stream VByte" layout (Lemire &
Kurz, "Stream VByte: Faster Byte-Oriented Integer Compression", Info.
Processing Letters 2018, public) — which is the standard SIMD-friendly
reformulation of group varint: identical information, identical size,
but per-value byte offsets become one cumsum over the flag array, so
both encode and decode are O(total_bytes) numpy with no per-value
Python (the same property util.varbyte has).

Wire format (this module encodes the whole array, tail included):
  [n:u32le][ceil(n/4) flag bytes][data bytes]
The tail group (n % 4 != 0) is padded to 4 values with zeros in the
FLAG byte only (length field 0 => 1 byte), and the pad values store no
data bytes at all — decode slices the first n values. This differs
from Lucene's VInt tail but round-trips identically and keeps the
whole path branch-free; the self-describing blockcodec header records
which codec wrote the payload, so readers never guess.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_VALUE = (1 << 32) - 1  # GroupVIntUtil is int-ranged


def encode(values: np.ndarray) -> bytes:
    """Group-varint-encode a non-negative int array (< 2**32) to bytes."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if v.size and int(v.max()) > MAX_VALUE:
        raise ValueError("group varint holds 32-bit values only")
    v = v.astype(np.uint32)
    # bytes per value: 1 + (v>0xFF) + (v>0xFFFF) + (v>0xFFFFFF)
    nb = (
        np.ones(n, dtype=np.uint8)
        + (v > 0xFF).astype(np.uint8)
        + (v > 0xFFFF).astype(np.uint8)
        + (v > 0xFFFFFF).astype(np.uint8)
    )
    ngroups = (n + 3) // 4
    pad = ngroups * 4 - n
    nb4 = np.concatenate((nb, np.ones(pad, dtype=np.uint8))) if pad else nb
    nb4 = nb4.reshape(ngroups, 4)
    # flag nibble order matches GroupVIntUtil: value 0 in the high bits
    flags = (
        ((nb4[:, 0] - 1) << 6)
        | ((nb4[:, 1] - 1) << 4)
        | ((nb4[:, 2] - 1) << 2)
        | (nb4[:, 3] - 1)
    ).astype(np.uint8)
    # data byte layout: per-value little-endian, values concatenated
    nb64 = nb.astype(np.int64)
    ends = np.cumsum(nb64)
    offsets = ends - nb64
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for bpos in range(4):
        mask = nb > bpos
        if not mask.any():
            break
        out[offsets[mask] + bpos] = (
            (v[mask] >> np.uint32(8 * bpos)) & np.uint32(0xFF)
        ).astype(np.uint8)
    return struct.pack("<I", n) + flags.tobytes() + out.tobytes()


def decode(buf) -> np.ndarray:
    """Decode an encode() payload back into an int64 array."""
    mv = memoryview(buf)
    if len(mv) == 0:
        return np.empty(0, dtype=np.int64)
    n = struct.unpack("<I", mv[:4])[0]
    ngroups = (n + 3) // 4
    flags = np.frombuffer(mv[4 : 4 + ngroups], dtype=np.uint8)
    data = np.frombuffer(mv[4 + ngroups :], dtype=np.uint8)
    # expand 2-bit length fields back to per-value byte counts
    nb = np.empty(ngroups * 4, dtype=np.int64)
    nb[0::4] = (flags >> 6) & 3
    nb[1::4] = (flags >> 4) & 3
    nb[2::4] = (flags >> 2) & 3
    nb[3::4] = flags & 3
    nb = nb[:n] + 1
    ends = np.cumsum(nb)
    offsets = ends - nb
    vals = np.zeros(n, dtype=np.uint32)
    for bpos in range(4):
        mask = nb > bpos
        if not mask.any():
            break
        vals[mask] |= data[offsets[mask] + bpos].astype(np.uint32) << np.uint32(
            8 * bpos
        )
    return vals.astype(np.int64)
