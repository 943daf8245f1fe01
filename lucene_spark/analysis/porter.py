"""Analyzer token-filter chain: EnglishPossessiveFilter + PorterStemFilter.

Spec parity (what, not how):
 - ``porter_stem`` implements Martin Porter's 1980 suffix-stripping
   algorithm in the canonical *revised* form Lucene ships
   (lucene/analysis/common/.../en/PorterStemmer.java:100-556): the
   ``bli -> ble`` and ``logi -> log`` departures from the paper, the
   ``k > k0+1`` minimum-length guard (words of length <= 2 are never
   stemmed), and the two "Bug 1 / Bug 2" guards (step3/step5 bail when
   the word is a single char; ``-ion`` requires a non-empty stem).
   Golden-tested against Porter's official 23k-word voc/output pairs
   (porterTestData.zip) in tests/test_porter.py.
 - ``possessive`` implements EnglishPossessiveFilter.java:33-50 —
   strip a trailing {' ’ ＇}{s|S}.

Both filters are 1:1 per token (never drop, never split), so document
length / positions / offsets computed before the filter remain valid —
that is what lets ``filter_vocab`` run them on the window VOCABULARY
only (one call per distinct surface form, O(|vocab|) not O(tokens))
with a single int32 gather remapping the token stream.
"""
from __future__ import annotations

import numpy as np

_VOWELS = frozenset("aeiou")


class _Stem:
    """One stemming pass over a single lowercase word. Indices mirror
    the algorithm's b/k/j convention: ``b`` is the char buffer, ``k``
    the last live index, ``j`` the end of the stem set by ``ends``."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    # -- predicates --------------------------------------------------

    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Number of V->C transitions in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if "".join(self.b[o : o + l]) != s:
            return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o : o + len(s)] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # -- steps (numbered per the paper: 1a,1b,1c,2,3,4,5a,5b) ---------

    def step1(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowelinstem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step1c(self) -> None:
        if self.ends("y") and self.vowelinstem():
            self.b[self.k] = "i"

    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),
    )

    def step2(self) -> None:
        if self.k == 0:
            return
        # the reference switches on b[k-1] purely to skip tests; every
        # suffix fixes its own penultimate char, so a flat ordered scan
        # is behavior-identical
        for suf, rep in self._STEP2:
            if self.ends(suf):
                self.r(rep)
                return

    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"),
        ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
    )

    def step3(self) -> None:
        for suf, rep in self._STEP3:
            if self.ends(suf):
                self.r(rep)
                return

    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
        "ous", "ive", "ize",
    )

    def step4(self) -> None:
        if self.k == 0:
            return
        for suf in self._STEP4:
            if self.ends(suf):
                if suf == "ion" and not (
                    self.j >= 0 and self.b[self.j] in ("s", "t")
                ):
                    continue  # the 'o' group falls through ion -> ou
                if self.m() > 1:
                    self.k = self.j
                return

    def step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


def porter_stem(word: str) -> str:
    """Stem one (already lowercased) token. Length <= 2 is untouched."""
    if len(word) <= 2:
        return word
    s = _Stem(word)
    s.step1()
    s.step1c()
    s.step2()
    s.step3()
    s.step4()
    s.step5()
    return "".join(s.b[: s.k + 1])


def possessive(word: str) -> str:
    """EnglishPossessiveFilter: strip trailing {'’＇}{sS}."""
    if (
        len(word) >= 2
        and word[-2] in ("'", "’", "＇")
        and word[-1] in ("s", "S")
    ):
        return word[:-2]
    return word


def reverse_token(word: str) -> str:
    """ReverseStringFilter (reference lucene/analysis/common/src/java/
    org/apache/lucene/analysis/reverse/ReverseStringFilter.java:28,
    without the marker-char option): reverses each token, the classic
    recipe for EFFICIENT leading-wildcard queries — ``*suffix`` becomes
    a PREFIX over the reversed dictionary, so the sorted-terms parquet
    min/max stats prune the scan exactly like PrefixQuery
    (IndexSearcher.search_suffix)."""
    return word[::-1]


from lucene_spark.analysis.folding import ascii_fold  # noqa: E402

# EnglishAnalyzer's default stop set (reference lucene/analysis/common/
# src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java:46
# ENGLISH_STOP_WORDS_SET — the classic 33 English stopwords).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)


def stop_en(word: str) -> str | None:
    """StopFilter over EnglishAnalyzer's default set (reference
    analysis/StopFilter.java:25 via FilteringTokenFilter.java:50-56):
    returns None to DROP the token. Position-increment semantics
    (enablePositionIncrements=true, the only mode since 5.0) come from
    the invert: dropped tokens keep their position slot, so surviving
    tokens' positions gap across removed stopwords, and document length
    counts only emitted tokens (FieldInvertState.length)."""
    return None if word in ENGLISH_STOP_WORDS else word


def english_minimal_stem(word: str) -> str:
    """EnglishMinimalStemFilter (reference lucene/analysis/common/src/
    java/org/apache/lucene/analysis/en/EnglishMinimalStemmer.java —
    S-stemmer, Donna Harman 1991): strip plural -s with the reference's
    guards — words under 3 chars and -us/-ss endings unchanged; -ies ->
    -y unless preceded by a/e; -es kept whole after i/a/o/e; otherwise
    the final s drops (the switch's intentional fallthrough)."""
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    c2 = word[-2]
    if c2 in ("u", "s"):
        return word
    if c2 == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("i", "a", "o", "e"):
            return word
    return word[:-1]


# FrenchAnalyzer.DEFAULT_ARTICLES (FrenchAnalyzer.java:56) — the
# standard elision set (l'avion -> avion)
_ELISION_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)


def elision(word: str) -> str:
    """ElisionFilter (reference lucene/analysis/common/src/java/org/
    apache/lucene/analysis/util/ElisionFilter.java:32 with the French
    default article set): if the token contains an apostrophe (ASCII '
    or U+2019) and the prefix before the FIRST one is an article, strip
    prefix + apostrophe; otherwise the token passes unchanged."""
    idxs = [j for j in (word.find("'"), word.find("’")) if j >= 0]
    if not idxs:
        return word
    i = min(idxs)
    if word[:i] in _ELISION_ARTICLES:
        return word[i + 1 :]
    return word


def decimal_digit(word: str) -> str:
    """DecimalDigitFilter (reference lucene/analysis/common/src/java/
    org/apache/lucene/analysis/core/DecimalDigitFilter.java:29): fold
    every non-Latin decimal digit (Arabic-Indic, Devanagari, full-width,
    ...) to its 0-9 equivalent via its numeric value."""
    if word.isascii():
        return word
    import unicodedata

    out = []
    for ch in word:
        # Java Character.isDigit == Unicode DECIMAL_DIGIT_NUMBER (Nd);
        # python str.isdigit is broader (superscripts), so use the
        # decimal property directly
        d = unicodedata.decimal(ch, None) if ch > "\x7f" else None
        out.append(chr(ord("0") + d) if d is not None else ch)
    return "".join(out)


TOKEN_FILTERS = {
    "possessive": possessive,
    "porter": porter_stem,
    "ascii_folding": ascii_fold,
    "reverse": reverse_token,
    "stop_en": stop_en,
    "english_minimal_stem": english_minimal_stem,
    "elision": elision,
    "decimal_digit": decimal_digit,
}


def _length_filter(lo: int, hi: int):
    """LengthFilter (reference analysis/miscellaneous/LengthFilter.java:28,
    also a FilteringTokenFilter): keep tokens with lo <= len <= hi,
    DROP the rest — same position-gap + emitted-dl semantics as
    stop_en. Codepoint length, matching CharTermAttribute.length() for
    our BMP-only tokenizer output."""

    def fn(word: str) -> str | None:
        return word if lo <= len(word) <= hi else None

    return fn


def _truncate_filter(n: int):
    """TruncateTokenFilter (reference analysis/miscellaneous/
    TruncateTokenFilter.java:33): tokens longer than ``n`` characters
    are cut to their first ``n`` — a 1:1 remap (never drops), so chains
    using it stay on the no-drop fast path. The classic use is bounding
    dictionary width for prefix-ish matching without a stemmer."""

    def fn(word: str) -> str:
        return word[:n] if len(word) > n else word

    return fn


def resolve_filter(name: str):
    """TOKEN_FILTERS lookup extended with PARAMETERIZED filter names —
    ``length_<min>_<max>`` builds a LengthFilter, ``truncate_<n>`` a
    TruncateTokenFilter — so manifests can pin an exact configuration
    as a plain string. Raises KeyError on unknown names (build_index
    turns that into its ValueError)."""
    fn = TOKEN_FILTERS.get(name)
    if fn is not None:
        return fn
    parts = name.split("_")
    if (
        len(parts) == 3
        and parts[0] == "length"
        and parts[1].isdigit()
        and parts[2].isdigit()
        and int(parts[1]) <= int(parts[2])
    ):
        return _length_filter(int(parts[1]), int(parts[2]))
    if (
        len(parts) == 2
        and parts[0] == "truncate"
        and parts[1].isdigit()
        and int(parts[1]) >= 1
    ):
        return _truncate_filter(int(parts[1]))
    raise KeyError(name)


# filters that may DROP tokens (map to None) — callers use this to skip
# the drop-handling passes entirely on 1:1 chains
DROPPY_FILTERS = frozenset({"stop_en"})


def chain_can_drop(token_filters) -> bool:
    return any(
        f in DROPPY_FILTERS or f.startswith("length_") for f in token_filters
    )


def shingle_size(name: str) -> int | None:
    """``shingle_<n>`` STREAM-filter grammar (ShingleFilter analog,
    analysis/shingle/ShingleFilter.java:34 with minShingleSize ==
    maxShingleSize == n and outputUnigrams=False — the dedicated
    phrase/grams-field deployment). Returns n (>= 2) or None for
    ordinary token-level filter names."""
    parts = name.split("_")
    if (
        len(parts) == 2
        and parts[0] == "shingle"
        and parts[1].isdigit()
        and int(parts[1]) >= 2
    ):
        return int(parts[1])
    return None


def shingle_tokens(toks: list, n: int) -> list:
    """The query/replica-side gram stream: n-grams of ONE analyzed token
    list, space-joined (ShingleFilter.DEFAULT_TOKEN_SEPARATOR). Shared
    by engine._parse, OracleIndex, and Monitor so the three streams
    cannot drift from the builder's _shingle_stream."""
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def split_chain(token_filters) -> tuple[tuple, int | None]:
    """Split an analyzer chain into (vocab_filters, shingle_n).

    ``shingle_<n>`` is a STREAM filter (1:N over adjacent tokens), not a
    vocabulary remap, so it must be the LAST entry and there can be at
    most one. Combining it with a dropping filter is rejected: the
    reference inserts ``_`` filler tokens at stopword gaps
    (ShingleFilter.fillerToken) — a semantics we deliberately do not
    replicate (documented deviation; run stop_en on the companion
    unigram field instead)."""
    tfs = tuple(token_filters)
    n = None
    for i, f in enumerate(tfs):
        if shingle_size(f) is not None:
            if i != len(tfs) - 1:
                raise ValueError(
                    "shingle_<n> must be the last filter in the chain"
                )
            n = shingle_size(f)
    vocab = tfs[:-1] if n is not None else tfs
    if n is not None and chain_can_drop(vocab):
        raise ValueError(
            "shingle_<n> cannot follow a dropping filter (the "
            "reference's '_' filler-token semantics are not replicated)"
        )
    return vocab, n


def filter_vocab(uniq, token_filters) -> tuple[list, np.ndarray]:
    """Apply the ordered filter chain to each distinct surface form and
    collapse the result: returns (new_vocab, remap) where ``remap`` is
    an int32 array with remap[old_code] = new_code, suitable for a
    single numpy gather over the token-code stream. A filter returning
    None DROPS the form: remap[old_code] = -1 (pandas.factorize assigns
    -1 to missing values and excludes them from the uniques), and later
    filters in the chain pass the None through."""
    fns = [resolve_filter(n) for n in token_filters]
    mapped = list(uniq)
    for fn in fns:
        mapped = [fn(t) if t is not None else None for t in mapped]
    import pandas as pd

    codes, new_uniq = pd.factorize(np.asarray(mapped, dtype=object))
    return list(new_uniq), np.asarray(codes, dtype=np.int32)
