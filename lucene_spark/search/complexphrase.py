"""ComplexPhraseQueryParser analog — phrases whose words may be
wildcards, fuzzy terms, ranges, or OR-groups.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java — getFieldQuery(:85) wraps
the quoted content in a ComplexPhraseQuery whose rewrite(:258) re-parses
the content, turns every embedded multi-term query into a SpanOr of its
dictionary expansion, and arranges the clauses in a
SpanNearQuery(slopFactor, inOrder) (:334).

Spark-first shape: the in-phrase grammar parses driver-side into SLOTS
(a plain term, or a tuple of alternatives from a bounded dictionary
expansion); execution delegates to IndexSearcher.search_span_near —
the same SpanNear/SpanOr kernel the span gates duel — so wildcard
phrases inherit its one-decode + batched-searchsorted plan. Dictionary
expansions are one vocab-table stage each (TopTermsRewrite df-cap), the
infix-suggester precedent: the terms table is tiny relative to postings
at any corpus size.

Supported in-phrase syntax (each whitespace-separated word):
  - ``term``            plain analyzed term (may analyze to >1 slot)
  - ``wild*card?``      wildcard: ``*`` = any run, ``?`` = one char
  - ``term~`` ``term~1`` fuzzy (classic Levenshtein, default 2 edits —
    the same convention as fuzzy_terms/spell/suggest_fuzzy)
  - ``[a TO b]`` / ``{a TO b}``  inclusive / exclusive term range
  - ``(alt1 alt2 ...)`` explicit OR-group; members may themselves be
    wildcards or fuzzy terms (expansions union into one SpanOr slot)

Documented deviation: the reference additionally supports in-phrase
negation ("-term", rewritten through SpanNotQuery with a slop bump,
ComplexPhraseQueryParser.java:354-360); we reject it with ValueError —
the composition is expressible over search_span_not but its scoring
interaction is niche enough that an explicit error beats a subtle
mismatch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_RANGE_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$")
_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")


def _split_words(text: str) -> list[str]:
    """Split on whitespace but keep (...) groups and [a TO b] ranges
    together as single words."""
    words: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            j = text.find(")", i)
            if j < 0:
                raise ValueError(f"unclosed group in phrase: {text!r}")
            words.append(text[i : j + 1])
            i = j + 1
        elif c in "[{":
            close = "]" if c == "[" else "}"
            j = text.find(close, i)
            if j < 0:
                raise ValueError(f"unclosed range in phrase: {text!r}")
            words.append(text[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and not text[j].isspace():
                j += 1
            words.append(text[i:j])
            i = j
    return words


def _like_pattern(word: str) -> str:
    """Lucene wildcard syntax -> SQL LIKE (* -> %, ? -> _), escaping
    literal %/_ so terms containing them stay exact."""
    out = []
    for ch in word:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in "%_\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _expand_word(searcher, word: str, max_expansions: int | None):
    """One in-phrase word -> a slot: a plain term string, a tuple of
    alternatives, or a list of consecutive plain slots (multi-token
    analysis). Returns (kind, value) with kind in {'slots', 'alts'}."""
    if word.startswith("-") or word.upper() == "NOT":
        raise ValueError(
            "in-phrase negation is not supported (documented deviation "
            "from ComplexPhraseQueryParser's SpanNot rewrite)"
        )
    m = _RANGE_RE.match(word)
    if m:
        lo, hi = m.group(2).lower(), m.group(3).lower()
        exp = searcher.expand_terms(
            lo=None if lo == "*" else lo,
            hi=None if hi == "*" else hi,
            include_lo=m.group(1) == "[",
            include_hi=m.group(4) == "]",
            top_terms=True,
            max_expansions=max_expansions,
        )
        return "alts", tuple(exp)
    m = _FUZZY_RE.match(word)
    if m and "*" not in word and "?" not in word:
        base = m.group(1)
        edits = int(m.group(2)) if m.group(2) else 2
        parsed = searcher._parse(base)
        if len(parsed) != 1:
            raise ValueError(f"fuzzy word {base!r} must analyze to one term")
        exp = searcher.expand_fuzzy(
            parsed[0], max_edits=edits, max_expansions=max_expansions
        )
        return "alts", tuple(exp)
    if "*" in word or "?" in word:
        exp = searcher.expand_terms(
            like=_like_pattern(word.lower()),
            top_terms=True,
            max_expansions=max_expansions,
        )
        return "alts", tuple(exp)
    return "slots", searcher._parse(word)


def phrase_slots(
    searcher, phrase: str, max_expansions: int | None = None
) -> list:
    """Parse the quoted-phrase content into search_span_near slots.

    An empty expansion for any word means the phrase cannot match
    (a required SpanOr clause with zero terms) — returns None."""
    slots: list = []
    for word in _split_words(phrase):
        if word.startswith("(") and word.endswith(")"):
            members = word[1:-1].split()
            alts: list[str] = []
            for memb in members:
                if memb.upper() == "OR":
                    continue
                kind, val = _expand_word(searcher, memb, max_expansions)
                if kind == "alts":
                    alts.extend(val)
                else:
                    if len(val) != 1:
                        raise ValueError(
                            f"group member {memb!r} must analyze to one term"
                        )
                    alts.extend(val)
            alts = list(dict.fromkeys(alts))
            if not alts:
                return None
            slots.append(tuple(alts))
            continue
        kind, val = _expand_word(searcher, word, max_expansions)
        if kind == "alts":
            if not val:
                return None
            slots.append(tuple(val))
        else:
            slots.extend(val)
    return slots


def search_complex_phrase(
    searcher,
    phrase: str,
    slop: int = 0,
    in_order: bool = True,
    k: int = 10,
    max_expansions: int | None = None,
) -> DataFrame:
    """ComplexPhraseQuery.rewrite + execute: parse the phrase content,
    expand embedded multi-term words against the dictionary, run the
    SpanNear kernel (ordered per ``inOrder``, ComplexPhraseQuery ctor
    default true)."""
    slots = phrase_slots(searcher, phrase, max_expansions)
    if slots is None or not slots:
        return searcher._empty_topk()
    return searcher.search_span_near(
        slots, slop, k=k, ordered=in_order, pre_analyzed=True
    )
