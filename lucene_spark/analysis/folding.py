"""ASCIIFoldingFilter — fold Unicode Latin variants to their ASCII base.

Reference semantics (specification only):
  lucene/analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
  ASCIIFoldingFilter.java:61 — "converts alphabetic, numeric, and symbolic
  Unicode characters which are not in the first 127 ASCII characters ...
  into their ASCII equivalents, if one exists".

The reference implements the fold as a giant generated switch. Here the
general case is Unicode NFKD decomposition with combining marks stripped
(which reproduces the accent rows of that table: é -> e, ñ -> n, å -> a),
plus an explicit map for the Latin letters NFKD cannot decompose
(ligatures, crossed/stroked letters, eszett). Characters with no ASCII
equivalent pass through unchanged, like the reference.

Runs at VOCAB level (once per distinct surface form, see
analysis/porter.py filter_vocab) so per-token cost is amortized to a
single int32 gather over the token stream — the filter itself is never
in the hot path.
"""
from __future__ import annotations

import unicodedata

# Latin forms NFKD leaves intact (ASCIIFoldingFilter.java maps all of
# these): ligatures, stroked/crossed letters, eszett, thorn, eth.
_FOLD = {
    "ß": "ss",  # ß
    "æ": "ae",  # æ
    "œ": "oe",  # œ
    "ø": "o",   # ø
    "đ": "d",   # đ
    "ð": "d",   # ð
    "ł": "l",   # ł
    "þ": "th",  # þ
    "ħ": "h",   # ħ
    "ı": "i",   # ı (dotless i)
    "ĸ": "k",   # ĸ
    "ŋ": "n",   # ŋ
    "ŧ": "t",   # ŧ
    "ẞ": "SS",  # ẞ
    "Æ": "AE",
    "Œ": "OE",
    "Ø": "O",
    "Đ": "D",
    "Ð": "D",
    "Ł": "L",
    "Þ": "TH",
    "Ħ": "H",
    "Ŋ": "N",
    "Ŧ": "T",
}


def ascii_fold(word: str) -> str:
    """Fold one token. ASCII input returns the same object (no alloc)."""
    if word.isascii():
        return word
    out: list[str] = []
    for ch in word:
        if ord(ch) < 128:
            out.append(ch)
            continue
        mapped = _FOLD.get(ch)
        if mapped is not None:
            out.append(mapped)
            continue
        d = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in d if not unicodedata.combining(c))
        # only accept a fold that lands entirely in ASCII; otherwise the
        # reference keeps the original character (e.g. Cyrillic, CJK)
        out.append(kept if kept and kept.isascii() else ch)
    return "".join(out)
