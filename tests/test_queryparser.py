"""Classic query parser: grammar unit tests + end-to-end equivalence of
parsed execution vs direct engine/oracle calls, including the reference
benchmark query SHAPES (lucene/benchmark/conf/query-{terms,phrases,
wildcards}.txt: a AND b, (a OR b) AND c, "phrase" OR term, wild* AND x)."""

import numpy as np
import pytest

from lucene_spark.oracle import assert_rank_identical
from lucene_spark.search.queryparser import MUST, MUST_NOT, SHOULD, execute, parse


def occurs(node):
    return [(c.occur, c.node.kind, tuple(c.node.terms)) for c in node.clauses]


def test_bare_terms_implicit_or():
    n = parse("license apache software")
    assert n.kind == "bool"
    assert occurs(n) == [
        (SHOULD, "term", ("license",)),
        (SHOULD, "term", ("apache",)),
        (SHOULD, "term", ("software",)),
    ]


def test_and_promotes_both():
    n = parse("license AND apache")
    assert occurs(n) == [(MUST, "term", ("license",)), (MUST, "term", ("apache",))]


def test_mixed_and_or():
    n = parse("a AND b c")
    assert occurs(n) == [
        (MUST, "term", ("a",)),
        (MUST, "term", ("b",)),
        (SHOULD, "term", ("c",)),
    ]


def test_not_and_minus():
    n = parse("license NOT apache -software")
    assert occurs(n) == [
        (SHOULD, "term", ("license",)),
        (MUST_NOT, "term", ("apache",)),
        (MUST_NOT, "term", ("software",)),
    ]


def test_parens_reference_shape():
    n = parse("(field OR set) AND theory")
    assert len(n.clauses) == 2
    grp, theory = n.clauses
    assert grp.occur == MUST and grp.node.kind == "bool"
    assert occurs(grp.node) == [(SHOULD, "term", ("field",)), (SHOULD, "term", ("set",))]
    assert theory.occur == MUST and theory.node.terms == ["theory"]


def test_nested_and_in_parens():
    n = parse("(planes AND trains AND automobiles) OR ships")
    grp, ships = n.clauses
    assert grp.occur == SHOULD
    assert [c.occur for c in grp.node.clauses] == [MUST, MUST, MUST]
    assert ships.occur == SHOULD


def test_phrase_or_term():
    n = parse('"field theory" OR sets')
    ph, t = n.clauses
    assert ph.node.kind == "phrase" and ph.node.terms == ["field", "theory"]
    assert t.occur == SHOULD


def test_wildcard():
    n = parse("abrah* AND linc*")
    assert [c.node.kind for c in n.clauses] == ["wild", "wild"]
    assert [c.occur for c in n.clauses] == [MUST, MUST]


def test_field_prefix_and_analyzer():
    n = parse("content:LiCeNsE")
    assert n.kind == "term" and n.terms == ["license"]


# ---------------------------------------------------------------------------
# execution equivalence on the built index
# ---------------------------------------------------------------------------


def test_parsed_execution_matches_engine(built_index):
    _, oracle, searcher = built_index
    got = [(r["docID"], r["score"]) for r in execute(searcher, "license apache", k=10).collect()]
    exp = oracle.search(["license", "apache"], k=10, mode="or")
    assert_rank_identical(exp, got, msg="[parser or]")

    got = [(r["docID"], r["score"]) for r in execute(searcher, "license AND apache", k=10).collect()]
    exp = oracle.search(["license", "apache"], k=10, mode="and")
    assert_rank_identical(exp, got, msg="[parser and]")

    got = [(r["docID"], r["score"]) for r in execute(searcher, "license NOT var0", k=10).collect()]
    exp = oracle.search_boolean(should=["license"], must_not=["var0"], k=10)
    assert_rank_identical(exp, got, msg="[parser not]")

    got = [(r["docID"], r["score"]) for r in execute(searcher, '"apache software foundation"', k=10).collect()]
    exp = oracle.search_phrase(["apache", "software", "foundation"], k=10)
    assert_rank_identical(exp, got, msg="[parser phrase]")


def _oracle_group_and_term(oracle, group_terms, term, k=10):
    """(g1 OR g2) AND t reference: doc matches iff (any gi) and t; score =
    sum of matching gi scores + t score."""
    acc = np.zeros(oracle.doc_count, dtype=np.float64)
    gmatch = np.zeros(oracle.doc_count, dtype=bool)
    for g in group_terms:
        rows, scores = oracle._term_scores(g)
        acc[rows] += scores.astype(np.float64)
        gmatch[rows] = True
    trows, tscores = oracle._term_scores(term)
    tmask = np.zeros(oracle.doc_count, dtype=bool)
    tmask[trows] = True
    acc[trows] += tscores.astype(np.float64)
    mask = gmatch & tmask
    rows = np.flatnonzero(mask)
    final = acc[rows].astype(np.float32)
    order = np.lexsort((oracle.doc_ids[rows], -final))[:k]
    return [(int(oracle.doc_ids[rows[i]]), float(final[i])) for i in order]


def test_parens_execution(built_index):
    _, oracle, searcher = built_index
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, "(def OR return) AND license", k=10).collect()
    ]
    exp = _oracle_group_and_term(oracle, ["def", "return"], "license", k=10)
    assert_rank_identical(exp, got, msg="[parser parens]")


def test_wildcard_execution(built_index):
    """wild* = scoring-boolean rewrite over dictionary expansion."""
    _, oracle, searcher = built_index
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, "getvalue1* AND license", k=10).collect()
    ]
    expanded = sorted(t for t in oracle.postings if t.startswith("getvalue1"))
    assert expanded, "fixture vocabulary changed"
    acc = np.zeros(oracle.doc_count, dtype=np.float64)
    wmatch = np.zeros(oracle.doc_count, dtype=bool)
    for t in expanded:
        rows, scores = oracle._term_scores(t)
        acc[rows] += scores.astype(np.float64)
        wmatch[rows] = True
    lrows, lscores = oracle._term_scores("license")
    lmask = np.zeros(oracle.doc_count, dtype=bool)
    lmask[lrows] = True
    acc[lrows] += lscores.astype(np.float64)
    rows = np.flatnonzero(wmatch & lmask)
    final = acc[rows].astype(np.float32)
    order = np.lexsort((oracle.doc_ids[rows], -final))[:10]
    exp = [(int(oracle.doc_ids[rows[i]]), float(final[i])) for i in order]
    assert_rank_identical(exp, got, msg="[parser wildcard]")


# ---------------------------------------------------------------------------
# r3 grammar: ~slop, term~fuzzy, ^boost, [a TO b], /regex/
# ---------------------------------------------------------------------------


def test_sloppy_phrase_parse():
    n = parse('"field theory"~3')
    assert n.kind == "sloppy" and n.terms == ["field", "theory"] and n.slop == 3


def test_sloppy_zero_is_exact_phrase():
    assert parse('"field theory"~0').kind == "phrase"


def test_fuzzy_parse_default_and_explicit():
    n = parse("license~")
    assert n.kind == "fuzzy" and n.terms == ["license"] and n.slop == 2
    assert parse("license~1").slop == 1


def test_boost_parse():
    n = parse("license^2.5 OR apache")
    lic, ap = n.clauses
    assert lic.node.boost == 2.5 and ap.node.boost == 1.0


def test_phrase_slop_and_boost_combined():
    n = parse('"field theory"~2^1.5')
    assert n.kind == "sloppy" and n.slop == 2 and n.boost == 1.5


def test_range_parse():
    n = parse("[Apache TO License]")
    assert n.kind == "range" and (n.lo, n.hi) == ("apache", "license")
    assert n.include_lo and n.include_hi
    n = parse("{apache TO license}^2")
    assert n.kind == "range" and not n.include_lo and not n.include_hi
    assert n.boost == 2.0


def test_regexp_parse():
    n = parse("/get[a-z]+1/")
    assert n.kind == "regexp" and n.terms == ["get[a-z]+1"]


def test_group_boost():
    n = parse("(license apache)^2 AND software")
    grp = n.clauses[0].node
    assert grp.kind == "bool" and grp.boost == 2.0
    assert n.clauses[1].node.boost == 1.0


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _topk_from_acc(acc: dict, k: int = 10):
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _assert_close(got, exp):
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) <= 1e-5 * max(1.0, abs(es))


def test_sloppy_execution(built_index):
    _, oracle, searcher = built_index
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, '"apache software"~2', k=10).collect()
    ]
    exp = oracle.search_sloppy(["apache", "software"], 2, k=10)
    assert_rank_identical(exp, got, msg="[parser sloppy]")


def test_boost_execution(built_index):
    """Per-leaf boosts multiply float32 leaf scores in the double sum."""
    _, oracle, searcher = built_index
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, "license^2 apache^0.5", k=10).collect()
    ]
    acc = {}
    for t, b in (("license", 2.0), ("apache", 0.5)):
        rows, scores = oracle._term_scores(t)
        for r, s in zip(rows, scores):
            d = int(oracle.doc_ids[r])
            acc[d] = acc.get(d, 0.0) + b * float(s)
    _assert_close(got, _topk_from_acc(acc))


def test_fuzzy_pruned_expansion_equals_bruteforce(built_index):
    """The length-window + pigeonhole pre-filters drop nothing: the pruned
    dictionary expansion equals an unpruned Levenshtein scan over the full
    vocabulary (FuzzyQuery.java:272 automaton-intersection analog)."""
    _, oracle, searcher = built_index
    for target, edits in (("licence", 2), ("apaxhe", 1), ("getvalue1", 2)):
        brute = {t for t in oracle.postings if _lev(t, target) <= edits}
        assert set(searcher.expand_fuzzy(target, max_edits=edits)) == brute


def test_fuzzy_execution(built_index):
    _, oracle, searcher = built_index
    target = "licence"
    brute = {t for t in oracle.postings if _lev(t, target) <= 2}
    assert brute, "fixture vocabulary changed"
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, f"{target}~2", k=10).collect()
    ]
    acc = {}
    for t in brute:
        rows, scores = oracle._term_scores(t)
        for r, s in zip(rows, scores):
            d = int(oracle.doc_ids[r])
            acc[d] = acc.get(d, 0.0) + float(s)
    _assert_close(got, _topk_from_acc(acc))


def test_range_execution(built_index):
    _, oracle, searcher = built_index
    lo, hi = "apache", "def"
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, f"[{lo} TO {hi}]", k=10).collect()
    ]
    terms = [t for t in oracle.postings if lo <= t <= hi]
    assert terms, "fixture vocabulary changed"
    acc = {}
    for t in terms:
        rows, scores = oracle._term_scores(t)
        for r, s in zip(rows, scores):
            d = int(oracle.doc_ids[r])
            acc[d] = acc.get(d, 0.0) + float(s)
    _assert_close(got, _topk_from_acc(acc))


def test_phrase_or_execution(built_index):
    _, oracle, searcher = built_index
    got = [
        (r["docID"], r["score"])
        for r in execute(searcher, '"apache software" OR var0', k=10).collect()
    ]
    ph = dict(oracle.search_phrase(["apache", "software"], k=10**9))
    acc = {}
    for d, s in ph.items():
        acc[d] = acc.get(d, 0.0) + s
    rows, scores = oracle._term_scores("var0")
    for r, s in zip(rows, scores):
        d = int(oracle.doc_ids[r])
        acc[d] = acc.get(d, 0.0) + float(s)
    exp = sorted(acc.items(), key=lambda t: (-np.float32(t[1]), t[0]))[:10]
    exp = [(d, float(np.float32(s))) for d, s in exp]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (d, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) <= 1e-5 * max(1.0, abs(es))
