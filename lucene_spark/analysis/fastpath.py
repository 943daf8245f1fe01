"""Byte-level vectorized StandardAnalyzer fast path for ASCII windows.

The per-doc `analyze()` regex is C-speed but allocates one Python string
per token — ~25M objects per flush window. Under concurrent executors
the allocator/page-zeroing traffic for those objects saturates the
shared memory system (measured: tokenize degraded 6.4x from 1 to 8
workers while the numpy kernel degraded 2.5x). This module tokenizes a
whole window of ASCII documents with numpy byte masks and materializes
the tokens directly as ONE Arrow StringArray (offsets + data buffers) —
zero per-token Python objects; only the (tiny) vocabulary ever becomes
Python strings, via Arrow's C++ dictionary_encode.

Everything is a handful of single-pass C kernels over the window blob:
one flag-LUT gather classifies every byte (word/letter/digit/mid-char,
case-insensitively), bitwise ops mark the joined token runs, the values
buffer is ONE boolean-mask gather (token bytes in order, gaps removed),
and lowercasing runs over just the gathered token bytes.

Equivalence contract with `analyze()` (the per-doc reference):
  - input must be pure ASCII (caller checks `str.isascii()`)
  - the grammar is `_ASCII_PATTERN`: word chars [0-9a-z_] after
    lowercasing; ':' '.' '\'' join two letter-adjacent runs; '.' ',' ';'
    '\'' join two digit-adjacent runs
  - windows containing a token run longer than MAX_TOKEN_LENGTH are
    REJECTED (return None) — the caller falls back to `analyze()`, which
    implements the JFlex 255-char re-lex split
Property-tested against `analyze()` in tests/test_analyzer.py.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.analysis.standard import MAX_TOKEN_LENGTH

# one uint8 flag LUT: classification is case-insensitive (the grammar's
# character classes are case-symmetric), lowercasing happens later on
# the gathered token bytes only
_F_WORD, _F_LETTER, _F_DIGIT, _F_MIDL, _F_MIDD = 1, 2, 4, 8, 16
_CLS = np.zeros(256, dtype=np.uint8)
for _c in b"0123456789_abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _CLS[_c] |= _F_WORD
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _CLS[_c] |= _F_LETTER
for _c in b"0123456789":
    _CLS[_c] |= _F_DIGIT
for _c in b":.'":
    _CLS[_c] |= _F_MIDL
for _c in b".,;'":
    _CLS[_c] |= _F_MIDD

_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32


# Cache-block size for the mask pipeline. The classifier makes ~15
# passes over blob-sized temporaries (cls, tok, the mid-char join
# temps, diff); on a whole 50MB Arrow batch every pass streams DRAM,
# and 8 concurrent workers saturate the host memory system (measured
# 1.41x per-worker degradation at 8 procs). Chunking the blob keeps
# the ~5x-blob working set inside per-core cache so DRAM sees only
# the unavoidable passes (read blob, write/read token bytes for the
# final dictionary_encode). 512KB chunk => ~2.5MB working set.
_CHUNK_BYTES = 512 * 1024


def tokenize_window_ascii(texts: list[str], with_offsets: bool = False):
    """Tokenize a window of ASCII documents, cache-blocked.

    Returns ``(codes, uniq, dls)`` — int32 dense term codes in document
    order (first-appearance code assignment), the vocabulary list, and
    per-doc token counts — or ``None`` when the window contains an
    over-long token run (caller must re-lex those docs via `analyze()`).

    ``with_offsets=True`` appends ``(starts, ends)`` int32 arrays: each
    token's [start, end) character offset within ITS OWN document
    (ASCII, so byte == char offsets) — the OffsetAttribute payload. The
    run starts/ends are already computed by the mask pipeline; the only
    extra work is one doc-base subtraction."""
    import pyarrow as pa

    n = len(texts)
    if n == 0:
        empty = (np.empty(0, np.int32), [], np.empty(0, np.int64))
        if with_offsets:
            empty = empty + (np.empty(0, np.int32), np.empty(0, np.int32))
        return empty
    # split on doc boundaries into ~_CHUNK_BYTES chunks; the mask
    # pipeline runs per chunk (cache-resident), dictionary_encode runs
    # ONCE over the concatenated token array so the code space is
    # window-wide first-appearance order, same as the unchunked kernel
    chunks: list[tuple[int, int]] = []
    start = 0
    acc = 0
    for i, t in enumerate(texts):
        acc += len(t) + 1
        if acc >= _CHUNK_BYTES:
            chunks.append((start, i + 1))
            start, acc = i + 1, 0
    if start < n:
        chunks.append((start, n))
    arrs = []
    dls_parts = []
    off_s_parts, off_e_parts = [], []
    for s, e in chunks:
        r = _mask_chunk(texts[s:e])
        if r is None:
            return None
        arr, dls_c, off_s, off_e = r
        arrs.append(arr)
        dls_parts.append(dls_c)
        if with_offsets:
            off_s_parts.append(off_s)
            off_e_parts.append(off_e)
    dls = np.concatenate(dls_parts)
    arr = pa.concat_arrays(arrs) if len(arrs) > 1 else arrs[0]
    if len(arr) == 0:
        out = (np.empty(0, np.int32), [], dls)
    else:
        denc = arr.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int32, copy=False)
        uniq = denc.dictionary.to_pylist()
        out = (codes, uniq, dls)
    if not with_offsets:
        return out
    if len(arr) == 0:
        return out + (np.empty(0, np.int32), np.empty(0, np.int32))
    return out + (np.concatenate(off_s_parts), np.concatenate(off_e_parts))


def _mask_chunk(texts: list[str]):
    """Token-byte extraction for one cache-sized chunk of documents.

    Returns ``(pa.StringArray of tokens in order, per-doc counts,
    doc-relative token start offsets, doc-relative token end offsets)``
    or ``None`` on an over-long token run.
    """
    import pyarrow as pa

    n = len(texts)
    # one C-speed join+encode; '\n' is neither word nor mid char, so it
    # can never join tokens across document boundaries
    blob = "\n".join(texts).encode("ascii")
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0:
        empty = pa.array([], type=pa.utf8())
        e32 = np.empty(0, np.int32)
        return empty, np.zeros(n, np.int64), e32, e32

    cls = _CLS[b]
    tok = (cls & _F_WORD) != 0
    if b.size >= 3:
        inner = cls[1:-1]
        prev = cls[:-2]
        nxt = cls[2:]
        tok[1:-1] |= (
            ((inner & _F_MIDL) != 0)
            & ((prev & _F_LETTER) != 0)
            & ((nxt & _F_LETTER) != 0)
        ) | (
            ((inner & _F_MIDD) != 0)
            & ((prev & _F_DIGIT) != 0)
            & ((nxt & _F_DIGIT) != 0)
        )

    # token runs (diff over the bool's int8 view: no copy)
    d = np.diff(tok.view(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if tok[0]:
        starts = np.concatenate(([0], starts))
    if tok[-1]:
        ends = np.concatenate((ends, [tok.size]))
    lengths = ends - starts
    if lengths.size and int(lengths.max()) > MAX_TOKEN_LENGTH:
        return None  # rare: caller re-lexes via analyze()

    # doc attribution: char offset of each doc start in the blob
    doc_lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    doc_starts = np.concatenate(([0], np.cumsum(doc_lens[:-1] + 1)))
    doc_of = np.searchsorted(doc_starts, starts, side="right") - 1
    dls = np.bincount(doc_of, minlength=n).astype(np.int64)
    # doc-relative [start, end) offsets (OffsetAttribute; ASCII byte==char)
    base = doc_starts[doc_of]
    off_s = (starts - base).astype(np.int32)
    off_e = (ends - base).astype(np.int32)

    total_tok = lengths.size
    if total_tok == 0:
        return pa.array([], type=pa.utf8()), dls, off_s, off_e

    # values buffer: ONE boolean-mask gather keeps token bytes in order
    # (gaps removed); lowercase only the gathered bytes
    data = _LOWER[b[tok]]
    val_off = np.zeros(total_tok + 1, dtype=np.int32)
    np.cumsum(lengths, out=val_off[1:])
    arr = pa.Array.from_buffers(
        pa.utf8(),
        total_tok,
        [None, pa.py_buffer(val_off), pa.py_buffer(data)],
    )
    return arr, dls, off_s, off_e
