"""Span family completion (SpanNear / SpanOr / SpanContaining /
SpanWithin) + SimpleQueryParser.

Reference behavior:
  - SpanNearQuery ordered (queries/spans/NearSpansOrdered.java:107-116):
    every first-clause occurrence chains each later clause to its first
    position at-or-after the previous clause's end; matchWidth = summed
    gaps; SpanScorer.setFreqCurrentDoc:112 adds 1/(1+width) per span.
  - SpanOrQuery (spans/SpanOrQuery.java): every clause occurrence is a
    width-0 span => freq = total tf, one weight = summed idf.
  - SpanContaining/SpanWithin (spans/ContainSpans.java): big spans
    holding a little span / little spans covered by a big span.
  - SimpleQueryParser (queryparser/simple/SimpleQueryParser.java):
    fault-tolerant grammar, + | - " * ~ ( ), default operator SHOULD,
    right-to-left precedence via buildQueryTree's left fold.

Expectations come from the numpy OracleIndex replicas over the shared
400-doc corpus (docID == pdf row)."""

import numpy as np
import pytest

from lucene_spark.oracle import assert_rank_identical
from lucene_spark.search.queryparser import MUST, MUST_NOT, SHOULD
from lucene_spark.search.queryparser import execute as classic_execute
from lucene_spark.search.simplequery import (
    AND_OPERATOR,
    WHITESPACE_OPERATOR,
    execute_simple,
    parse_simple,
)

PAIR = ["getvalue0", "var0"]
TRIPLE = ["getvalue0", "var0", "static"]


def _collect(df):
    return [(int(r["docID"]), float(r["score"])) for r in df.collect()]


# -- SpanNear ---------------------------------------------------------------

@pytest.mark.parametrize("slop", [0, 2, 5, 20])
def test_span_near_pair(built_index, slop):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_near(PAIR, slop=slop, k=10))
    exp = oracle.search_span_near(PAIR, slop=slop, k=10)
    assert_rank_identical(exp, got, msg=f"span_near slop={slop}")


def test_span_near_triple(built_index):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_near(TRIPLE, slop=8, k=10))
    exp = oracle.search_span_near(TRIPLE, slop=8, k=10)
    assert_rank_identical(exp, got, msg="span_near 3-clause")


def test_span_near_reversed_differs(built_index):
    """Ordered semantics: reversing the clause order changes the spans."""
    _, oracle, searcher = built_index
    fwd = _collect(searcher.search_span_near(PAIR, slop=4, k=10))
    rev = _collect(searcher.search_span_near(list(reversed(PAIR)), slop=4, k=10))
    exp_rev = oracle.search_span_near(list(reversed(PAIR)), slop=4, k=10)
    assert_rank_identical(exp_rev, rev, msg="span_near reversed")
    assert fwd != rev


def test_span_near_missing_term_empty(built_index):
    _, _, searcher = built_index
    assert searcher.search_span_near(["getvalue0", "zzznope"], slop=3).count() == 0


@pytest.mark.parametrize("slop", [0, 2, 5, 20])
def test_span_near_unordered(built_index, slop):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_near(PAIR, slop=slop, k=10, ordered=False)
    )
    exp = oracle.search_span_near_unordered(PAIR, slop=slop, k=10)
    assert_rank_identical(exp, got, msg=f"span_near unordered slop={slop}")


def test_span_near_unordered_order_insensitive(built_index):
    _, _, searcher = built_index
    a = _collect(searcher.search_span_near(PAIR, slop=6, k=10, ordered=False))
    b = _collect(
        searcher.search_span_near(list(reversed(PAIR)), slop=6, k=10, ordered=False)
    )
    assert a == b


def test_span_near_unordered_triple(built_index):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_near(TRIPLE, slop=10, k=10, ordered=False)
    )
    exp = oracle.search_span_near_unordered(TRIPLE, slop=10, k=10)
    assert_rank_identical(exp, got, msg="span_near unordered 3-clause")


# -- SpanOr -----------------------------------------------------------------

def test_span_or(built_index):
    _, oracle, searcher = built_index
    terms = ["getvalue0", "var0", "baz"]
    got = _collect(searcher.search_span_or(terms, k=10))
    exp = oracle.search_span_or(terms, k=10)
    assert_rank_identical(exp, got, msg="span_or")


def test_span_or_absent_terms_drop(built_index):
    """A missing clause contributes neither freq nor idf weight."""
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_or(["var0", "zzznope"], k=10))
    exp = oracle.search_span_or(["var0"], k=10)
    assert_rank_identical(exp, got, msg="span_or absent clause")


def test_span_or_differs_from_boolean_or(built_index):
    """tf sums BEFORE saturation => different scores than boolean OR."""
    _, oracle, searcher = built_index
    terms = ["getvalue0", "var0"]
    span = dict(_collect(searcher.search_span_or(terms, k=10)))
    boolean = dict(oracle.search(terms, k=10, mode="or"))
    common = set(span) & set(boolean)
    assert common and any(
        abs(span[d] - boolean[d]) > 1e-4 for d in common
    )


# -- SpanContaining / SpanWithin ---------------------------------------------

@pytest.mark.parametrize("little", ["static", "var", "except"])
def test_span_containing(built_index, little):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_containing(PAIR, slop=8, little=little, k=10)
    )
    exp = oracle.search_span_near(
        PAIR, slop=8, k=10, contain=little, contain_mode="containing"
    )
    assert_rank_identical(exp, got, msg=f"span_containing {little}")


@pytest.mark.parametrize("little", ["static", "var"])
def test_span_within(built_index, little):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_within(little, PAIR, slop=8, k=10)
    )
    exp = oracle.search_span_near(
        PAIR, slop=8, k=10, contain=little, contain_mode="within"
    )
    assert_rank_identical(exp, got, msg=f"span_within {little}")


def test_span_containing_subset_of_near(built_index):
    """Containing spans are a subset of the unconstrained near spans."""
    _, oracle, _ = built_index
    near = oracle.span_near_freqs(PAIR, 8)
    cont = oracle.span_near_freqs(PAIR, 8, contain="static")
    assert set(cont) <= set(near)
    assert all(cont[r] <= near[r] + 1e-9 for r in cont)


# -- SimpleQueryParser: grammar shapes ---------------------------------------

def shapes(node):
    return [(c.occur, c.node.kind, tuple(c.node.terms)) for c in node.clauses]


def test_simple_default_or():
    n = parse_simple("alpha beta")
    assert n.kind == "bool"
    assert shapes(n) == [
        (SHOULD, "term", ("alpha",)),
        (SHOULD, "term", ("beta",)),
    ]


def test_simple_plus_and():
    n = parse_simple("alpha+beta")
    assert shapes(n) == [(MUST, "term", ("alpha",)), (MUST, "term", ("beta",))]


def test_simple_not_wrapper():
    n = parse_simple("-alpha")
    assert n.kind == "bool"
    assert n.clauses[0].occur == MUST_NOT
    assert n.clauses[1].occur == SHOULD and n.clauses[1].node.kind == "all"


def test_simple_double_negation_cancels():
    n = parse_simple("--alpha")
    assert n.kind == "term" and n.terms == ["alpha"]


def test_simple_right_to_left_precedence():
    # token1 | token2 + token3 => (token1 OR token2) AND token3
    # (SimpleQueryParser.java class javadoc example)
    n = parse_simple("a | b + c")
    assert n.kind == "bool"
    assert [c.occur for c in n.clauses] == [MUST, MUST]
    inner = n.clauses[0].node
    assert shapes(inner) == [(SHOULD, "term", ("a",)), (SHOULD, "term", ("b",))]
    assert n.clauses[1].node.terms == ["c"]


def test_simple_phrase_and_slop():
    n = parse_simple('"alpha beta"~3')
    assert n.kind == "sloppy" and n.slop == 3
    n = parse_simple('"alpha beta"')
    assert n.kind == "phrase"


def test_simple_prefix_and_fuzzy():
    n = parse_simple("alph*")
    assert n.kind == "wild" and n.terms == ["alph"]
    n = parse_simple("alpha~1")
    assert n.kind == "fuzzy" and n.slop == 1
    n = parse_simple("alpha~")  # default fuzziness 2
    assert n.kind == "fuzzy" and n.slop == 2
    n = parse_simple("alpha~0")  # zero edits => plain term
    assert n.kind == "term"


def test_simple_match_all_and_empty():
    assert parse_simple("*").kind == "all"
    assert parse_simple("   ") is None


def test_simple_fault_tolerance():
    # unmatched '(' and '"' re-read as text; stray ')' ignored
    assert parse_simple("(alpha").kind == "term"
    assert parse_simple('"alpha').kind == "term"
    assert parse_simple(")alpha").kind == "term"
    # dangling operators are dropped
    assert parse_simple("alpha +").kind == "term"
    assert parse_simple("+ alpha").kind == "term"


def test_simple_escape():
    # the escape keeps '+' inside ONE parser token (no MUST operator);
    # the ANALYZER then splits 'alpha+beta' into two default-op terms
    n = parse_simple(r"alpha\+beta")
    assert n.kind == "bool"
    assert shapes(n) == [
        (SHOULD, "term", ("alpha",)),
        (SHOULD, "term", ("beta",)),
    ]


def test_simple_flags_disable():
    # with AND disabled, '+' is ordinary text (analyzer then splits it)
    n = parse_simple("alpha+beta", flags=WHITESPACE_OPERATOR)
    assert n.kind == "bool"
    assert shapes(n) == [
        (SHOULD, "term", ("alpha",)),
        (SHOULD, "term", ("beta",)),
    ]
    n = parse_simple("alpha beta", flags=AND_OPERATOR)
    # whitespace disabled: the whole string is one token, analyzer splits
    assert n.kind == "bool"


# -- SimpleQueryParser: execution --------------------------------------------

def test_simple_exec_or_and(built_index):
    _, oracle, searcher = built_index
    got = _collect(execute_simple(searcher, "getvalue0 | var0", k=10))
    assert_rank_identical(oracle.search(PAIR, k=10, mode="or"), got, msg="or")
    got = _collect(execute_simple(searcher, "getvalue0 + var0", k=10))
    assert_rank_identical(oracle.search(PAIR, k=10, mode="and"), got, msg="and")


def test_simple_exec_phrase_sloppy(built_index):
    _, oracle, searcher = built_index
    got = _collect(execute_simple(searcher, '"getvalue0 var0"', k=10))
    assert_rank_identical(oracle.search_phrase(PAIR, k=10), got, msg="phrase")
    got = _collect(execute_simple(searcher, '"getvalue0 var0"~4', k=10))
    assert_rank_identical(oracle.search_sloppy(PAIR, 4, k=10), got, msg="sloppy")


def test_simple_exec_matches_classic_for_multiterm(built_index):
    """Prefix/fuzzy leaves share the classic parser's expansions."""
    _, _, searcher = built_index
    for sq, cq in [("getval*", "getval*"), ("vr0~1", "vr0~1")]:
        simple = _collect(execute_simple(searcher, sq, k=10))
        classic = _collect(classic_execute(searcher, cq, k=10))
        assert simple == classic


def test_simple_exec_negation(built_index):
    """-term => every doc without the term, scored 1.0 (match-all leg)."""
    _, oracle, searcher = built_index
    out = execute_simple(searcher, "-getvalue0", k=500)
    rows = out.collect()
    with_term = set(oracle.postings["getvalue0"][0].tolist())
    assert len(rows) == oracle.doc_count - len(with_term)
    assert all(abs(float(r["score"]) - 1.0) < 1e-9 for r in rows)
    assert not any(int(r["docID"]) in with_term for r in rows)


def test_simple_exec_match_all(built_index):
    _, oracle, searcher = built_index
    assert execute_simple(searcher, "*", k=500).count() == oracle.doc_count
    assert execute_simple(searcher, "", k=10).count() == 0


def test_simple_exec_group(built_index):
    """a + (b | c): MUST over the group's summed SHOULD scores."""
    _, oracle, searcher = built_index
    got = _collect(
        execute_simple(searcher, "getvalue0 + (var0 | baz)", k=10)
    )
    # numpy replica: docs with getvalue0 AND (var0 or baz); score =
    # s(getvalue0) + s(var0) + s(baz) over matches, double-summed
    acc = np.zeros(oracle.doc_count, dtype=np.float64)
    has_a = np.zeros(oracle.doc_count, dtype=bool)
    has_bc = np.zeros(oracle.doc_count, dtype=bool)
    rows, sc = oracle._term_scores("getvalue0")
    acc[rows] += sc.astype(np.float64)
    has_a[rows] = True
    for t in ("var0", "baz"):
        rows, sc = oracle._term_scores(t)
        acc[rows] += sc.astype(np.float64)
        has_bc[rows] = True
    mask = has_a & has_bc
    rows = np.flatnonzero(mask)
    final = acc[rows].astype(np.float32)
    order = np.lexsort((rows, -final))[:10]
    exp = [(int(rows[i]), float(final[i])) for i in order]
    assert_rank_identical(exp, got, msg="simple group")


# -- SpanMultiTermQueryWrapper (multi-term span clauses) ----------------------
# Reference: spans/SpanMultiTermQueryWrapper.java:47 — a multi-term query
# used as a span clause rewrites to a SpanOrQuery over its expansions
# (top-df capped, TopTermsSpanBooleanQueryRewrite :134); the clause's
# spans are the merged member occurrences, each width 0.

MULTI = [("getvalue0", "getvalue1"), "static"]


def test_span_near_multi_clause_ordered(built_index):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_near(
            [["getvalue0", "getvalue1"], "static"], slop=6, k=10
        )
    )
    exp = oracle.search_span_near(MULTI, slop=6, k=10)
    assert_rank_identical(exp, got, msg="span_near multi-term clause")


def test_span_near_multi_clause_unordered(built_index):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_near(
            [["getvalue0", "getvalue1"], "static"], slop=6, k=10, ordered=False
        )
    )
    exp = oracle.search_span_near_unordered(MULTI, slop=6, k=10)
    assert_rank_identical(exp, got, msg="span_near_un multi-term clause")


def test_span_near_multi_docset_superset_of_single(built_index):
    """Adding alternatives to a clause only adds positions, so chain
    widths can only shrink — the matching doc set is a superset."""
    _, oracle, searcher = built_index
    single = set(oracle.span_near_freqs(["getvalue0", "static"], 6))
    multi = set(oracle.span_near_freqs(MULTI, 6))
    assert single <= multi
    assert len(multi) > len(single)  # getvalue1 chains genuinely add docs


def test_span_near_wildcard_slot_equals_explicit(built_index):
    """A '*' slot expands via the dictionary exactly like passing the
    expansion explicitly (TopTermsSpanBooleanQueryRewrite)."""
    _, _, searcher = built_index
    exp_terms = searcher.expand_terms(prefix="getvalue", top_terms=True)
    assert len(exp_terms) > 1
    got_wild = _collect(searcher.search_span_near("getvalue* static", slop=6))
    got_explicit = _collect(
        searcher.search_span_near([list(exp_terms), "static"], slop=6)
    )
    assert got_wild == got_explicit


def test_span_near_multi_absent_members_drop(built_index):
    """An absent alternative contributes no spans and no idf — identical
    to omitting it (a zero-docFreq sub-span emits nothing)."""
    _, _, searcher = built_index
    got1 = _collect(
        searcher.search_span_near(
            [["getvalue0", "zzqq_nothere"], "static"], slop=6
        )
    )
    got2 = _collect(
        searcher.search_span_near([["getvalue0"], "static"], slop=6)
    )
    assert got1 == got2


def test_span_near_fully_absent_clause_empty(built_index):
    _, _, searcher = built_index
    assert (
        searcher.search_span_near(
            [["zzqq1", "zzqq2"], "static"], slop=6
        ).count()
        == 0
    )
