"""WhitespaceAnalyzer-equivalent tokenization plus the delimited-payload
filter — built from scratch in Python/numpy.

Behavioral reference (Apache Lucene, /root/reference):
  - WhitespaceTokenizer splits on Character.isWhitespace and applies NO
    other normalization (no lowercasing):
      lucene/analysis/common/src/java/org/apache/lucene/analysis/core/WhitespaceTokenizer.java:28-43
    Over-long tokens split at maxTokenLen (default 255), like the
    StandardTokenizer buffer re-lex:
      lucene/analysis/common/src/java/org/apache/lucene/analysis/util/CharTokenizer.java:136-158
  - DelimitedPayloadTokenFilter: each token of the form
    ``<term><delim><payload-text>`` is rewritten to ``<term>`` and the
    suffix becomes the position's payload; tokens without the delimiter
    keep no payload:
      lucene/analysis/common/src/java/org/apache/lucene/analysis/payloads/DelimitedPayloadTokenFilter.java:38-65
    The payload text is decoded by an encoder; this engine implements the
    IntegerEncoder (payload = non-negative int, stored varbyte — the
    posting-payload analog of
      lucene/analysis/common/src/java/org/apache/lucene/analysis/payloads/IntegerEncoder.java:28-36).
    Missing / unparseable payloads store 0 (Lucene stores null; every
    payload-scoring aggregate here treats 0 as the absent value, which is
    the PayloadFunction behavior for null payloads).

Positions: no token is ever dropped, so position == token index — the
same invariant the standard chain relies on, which is what lets payload
occurrence arrays share the positions' tf-segment layout in the codec.

Scale note: Python str.split() runs at C speed and pandas.factorize
assigns dense codes vectorized; per-token Python strings do exist on
this path (unlike the byte-mask standard fastpath) but the whitespace
tokenizer is only reachable through the opt-in payload/whitespace index
configurations, never the headline build.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd

MAX_TOKEN_LENGTH = 255  # CharTokenizer.DEFAULT_MAX_WORD_LEN

PAYLOAD_DELIMITER = "|"  # DelimitedPayloadTokenFilter.DEFAULT_DELIMITER


def whitespace_tokens(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """Split on runs of whitespace; over-long tokens split into
    max_token_length chunks (CharTokenizer buffer behavior)."""
    toks = text.split()
    if all(len(t) <= max_token_length for t in toks):
        return toks
    out: list[str] = []
    for t in toks:
        if len(t) <= max_token_length:
            out.append(t)
        else:
            out.extend(
                t[i : i + max_token_length]
                for i in range(0, len(t), max_token_length)
            )
    return out


def split_payload(token: str, delimiter: str = PAYLOAD_DELIMITER) -> tuple[str, int]:
    """(term, integer payload) for one surface token. No delimiter, empty
    term part, or a non-integer suffix -> the token passes through
    unchanged with payload 0 (DelimitedPayloadTokenFilter leaves the
    payload unset in those cases)."""
    head, sep, tail = token.rpartition(delimiter)
    if sep and head and tail.isdigit():
        return head, int(tail)
    return token, 0


def whitespace_window_codes(
    texts: list[str],
    parse_payloads: bool = False,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray | None]:
    """(int32 term codes in document order, vocabulary, per-doc token
    counts, per-occurrence int64 payloads or None) for a batch of
    documents — the whitespace-analyzer counterpart of
    builder._window_codes.

    The delimited-payload filter runs on the window VOCABULARY (one
    rpartition per distinct surface form, like the Porter chain), then a
    numpy gather maps payloads onto occurrences and a second factorize
    merges surface forms that collapse to the same term ("foo|3" and
    "foo|5" are distinct vocab entries but the same postings term).
    """
    n = len(texts)
    tok_lists = [whitespace_tokens(t, max_token_length) for t in texts]
    dls = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    total = int(dls.sum())
    flat = np.fromiter(chain.from_iterable(tok_lists), dtype=object, count=total)
    codes, uniq = pd.factorize(flat)
    codes = np.asarray(codes, dtype=np.int32)
    uniq = list(uniq)
    if not parse_payloads:
        return codes, uniq, dls, None
    terms = np.empty(len(uniq), dtype=object)
    pays = np.zeros(len(uniq), dtype=np.int64)
    for i, u in enumerate(uniq):
        terms[i], pays[i] = split_payload(u)
    occ_pays = pays[codes] if total else np.empty(0, dtype=np.int64)
    tcodes, tuniq = pd.factorize(terms)
    remap = np.asarray(tcodes, dtype=np.int32)
    out_codes = remap[codes] if total else codes
    return out_codes, list(tuniq), dls, occ_pays
