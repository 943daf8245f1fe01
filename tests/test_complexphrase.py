"""ComplexPhraseQueryParser tests — in-phrase wildcard/fuzzy/range/
group parsing + equivalence with the span kernel.

Reference: queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java (rewrite:258 — embedded
multi-term queries become SpanOr expansions inside a SpanNearQuery).
"""

import pytest

from lucene_spark.search.complexphrase import (
    _like_pattern,
    _split_words,
    phrase_slots,
    search_complex_phrase,
)


def _rows(df):
    return [(r["docID"], r["score"]) for r in df.collect()]


def test_split_words():
    assert _split_words("a b c") == ["a", "b", "c"]
    assert _split_words("(a b) c") == ["(a b)", "c"]
    assert _split_words("[a TO b] c") == ["[a TO b]", "c"]
    assert _split_words("{a TO b} w*") == ["{a TO b}", "w*"]
    with pytest.raises(ValueError):
        _split_words("(a b c")
    with pytest.raises(ValueError):
        _split_words("[a TO b c")


def test_like_pattern():
    assert _like_pattern("te*t?") == "te%t_"
    assert _like_pattern("a_b%c") == "a\\_b\\%c"


def test_phrase_slots_shapes(built_index):
    _, _, s = built_index
    # plain terms stay strings; wildcard becomes a tuple expansion
    slots = phrase_slots(s, "static var*")
    assert slots[0] == "static"
    assert isinstance(slots[1], tuple) and len(slots[1]) >= 1
    # group unions its members
    slots = phrase_slots(s, "(static return) var0")
    assert set(slots[0]) == {"static", "return"}
    assert slots[1] == "var0"
    # fuzzy expands within the edit budget
    slots = phrase_slots(s, "statik~1 var0")
    assert isinstance(slots[0], tuple) and "static" in slots[0]
    # range expands the dictionary band
    slots = phrase_slots(s, "[static TO staticz] var0")
    assert "static" in slots[0]
    # an unmatched wildcard kills the phrase
    assert phrase_slots(s, "zzzzqqq* var0") is None


def test_negation_rejected(built_index):
    _, _, s = built_index
    with pytest.raises(ValueError, match="negation"):
        phrase_slots(s, "static -return")
    with pytest.raises(ValueError, match="negation"):
        phrase_slots(s, "static NOT return")


def test_complex_phrase_equals_span_near_on_explicit_slots(built_index):
    """The parser + pre_analyzed delegation must equal calling
    search_span_near with the hand-expanded alternative lists (which
    re-analyzes; on this corpus analysis is identity for index terms)."""
    _, _, s = built_index
    got = search_complex_phrase(s, "(static return) var0", slop=3, k=10)
    want = s.search_span_near(
        [("static", "return"), "var0"], 3, k=10, ordered=True
    )
    assert _rows(got) == _rows(want)


def test_complex_phrase_wildcard_matches_manual_expansion(built_index):
    _, _, s = built_index
    exp = s.expand_terms(like="getval%", top_terms=True)
    assert exp  # corpus has getvalue0/...
    got = search_complex_phrase(s, "static getval*", slop=2, k=10)
    want = s.search_span_near(["static", tuple(exp)], 2, k=10)
    assert _rows(got) == _rows(want)


def test_complex_phrase_unordered(built_index):
    _, _, s = built_index
    got = search_complex_phrase(
        s, "static return", slop=2, in_order=False, k=10
    )
    want = s.search_span_near(["static", "return"], 2, k=10, ordered=False)
    assert _rows(got) == _rows(want)


def test_complex_phrase_no_match_empty(built_index):
    _, _, s = built_index
    out = search_complex_phrase(s, "zzznope* var0", slop=1, k=10)
    assert out.count() == 0


def test_single_slot_degenerates(built_index):
    """One wildcard word = SpanOr alone (ComplexPhraseQuery with a
    single embedded query unwraps, rewrite:238 comment)."""
    _, _, s = built_index
    exp = s.expand_terms(like="getval%", top_terms=True)
    got = search_complex_phrase(s, "getval*", k=10)
    want = s.search_span_or(exp, k=10)
    assert _rows(got) == _rows(want)


def test_pre_analyzed_skips_reanalysis(spark, tmp_path):
    """On a stemmed index the wildcard expansion returns DICTIONARY
    terms (already stemmed); pre_analyzed=True must feed them to the
    span kernel verbatim instead of re-running the analyzer chain —
    stemming is not idempotent in general."""
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    docs = spark.createDataFrame(
        [
            ("r", "d1", "0", "t", "running jumping swimming"),
            ("r", "d2", "0", "t", "runs the jump"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path / "idx_stem")
    build_index(
        spark, docs, out, partitions=2, token_filters=("porter",)
    )
    s = IndexSearcher(spark, out)
    # stemmed dictionary holds 'run'/'jump'/'swim'
    exp = s.expand_terms(like="run%", top_terms=True)
    assert "run" in exp
    got = search_complex_phrase(s, "run* jump*", slop=1, k=10)
    assert got.count() >= 1  # d1: running jumping adjacent


def test_single_clause_not_reanalyzed_on_stemmed_index(spark, tmp_path):
    """Porter is not idempotent: a single-word complex phrase must not
    push its DICTIONARY expansion back through the analyzer (the
    len==1 span_near fallback once did — stem('pony')='poni',
    stem('poni')='pony'... the double-stem produced absent terms)."""
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher
    from lucene_spark.analysis.porter import porter_stem

    # find a corpus word whose stem is NOT a porter fixed point
    word = "universities"
    s1 = porter_stem(word)
    assert porter_stem(s1) != s1  # the premise: univers -> univ
    docs = spark.createDataFrame(
        [
            ("r", "d1", "0", "t", f"{word} research"),
            ("r", "d2", "0", "t", "other text"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path / "idx_fp")
    build_index(spark, docs, out, partitions=2, token_filters=("porter",))
    s = IndexSearcher(spark, out)
    # single plain word -> one clause -> search() fallback
    got = search_complex_phrase(s, word, k=5)
    assert [r["docID"] for r in got.collect()] == [0]
    # single wildcard word -> one SpanOr clause -> span_or fallback
    got2 = search_complex_phrase(s, "univers*", k=5)
    assert [r["docID"] for r in got2.collect()] == [0]
