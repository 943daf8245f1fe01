"""Analyzer goldens lifted from the reference test suite
(lucene/core/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java:394-545,679-694).
"""

import pytest

from lucene_spark.analysis import analyze, lowercase, tokenize

GOLDENS = [
    ("B2B", ["B2B"]),
    ("2B", ["2B"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["O'Reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she's"]),
    ("Jim's", ["Jim's"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["O'Reilly's"]),
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["R2D2", "C3PO"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),
    ("C embedded developers wanted", ["C", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "FOO", "BAR"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "FOO", "BAR"]),
    ('"QUOTED" word', ["QUOTED", "word"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    ("𩬅艱鍟䇹愯瀛", ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]),
    ("훈민정음", ["훈민정음"]),
    ("仮名遣い カタカナ", ["仮", "名", "遣", "い", "カタカナ"]),
    ("moͤchte", ["moͤchte"]),
    # testMid: single mid chars join only with the right char class on both sides
    ("A:B", ["A:B"]),
    ("A::B", ["A", "B"]),
    ("1.2", ["1.2"]),
    ("A.B", ["A.B"]),
    ("1..2", ["1", "2"]),
    ("A..B", ["A", "B"]),
    ("1,2", ["1,2"]),
    ("1,,2", ["1", "2"]),
    ("A.:B", ["A", "B"]),
    ("A:.B", ["A", "B"]),
    ("1,.2", ["1", "2"]),
    ("1.,2", ["1", "2"]),
    ("A:B_A:B", ["A:B_A:B"]),
    ("A:B_A::B", ["A:B_A", "B"]),
    # mixed-side mids never join
    ("a.2", ["a", "2"]),
    ("2.a", ["2", "a"]),
    ("1:2", ["1", "2"]),
    # code-shaped text
    ("foo(bar, baz);", ["foo", "bar", "baz"]),
    ("def foo_bar(x): return x", ["def", "foo_bar", "x", "return", "x"]),
    ("CONSTANT_99", ["CONSTANT_99"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_tokenize_goldens(text, expected):
    assert tokenize(text) == expected


def test_max_token_length_default():
    # TestStandardAnalyzer.java:679-687: 256-char run splits into 255 + 1
    b255 = "b" * 255
    assert tokenize("x " + b255 + " " + b255 + "b") == ["x", b255, b255, "b"]


def test_max_token_length_non_default():
    # TestStandardAnalyzer.java:689-694
    assert tokenize("ab cd toolong xy z", max_token_length=5) == [
        "ab", "cd", "toolo", "ng", "xy", "z",
    ]


def test_lowercase_simple_mapping():
    assert lowercase("FOO") == "foo"
    # final-sigma full mapping must NOT apply (Java simple mapping)
    assert lowercase("ΑΣ") == "ασ"
    # U+0130 simple-lowercases to plain 'i' (not i + combining dot)
    assert lowercase("İ") == "i"
    assert analyze("Վիքիպեդիայի") == ["վիքիպեդիայի"]


def test_analyze_positions_are_indices():
    toks = analyze("foo bar baz foo")
    assert toks == ["foo", "bar", "baz", "foo"]


# ---------------------------------------------------------------------------
# ASCII fast path == reference slow path (added with the findall fast path)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from lucene_spark.analysis.standard import lowercase, tokenize


@given(st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=400))
@settings(max_examples=300, deadline=None)
def test_ascii_fast_path_equivalence(s):
    assert analyze(s) == [lowercase(t) for t in tokenize(s)]


def test_ascii_fast_path_overlong():
    s = "a" * 300 + " b:c 1,2 x" + "y" * 260
    assert analyze(s) == [lowercase(t) for t in tokenize(s)]
