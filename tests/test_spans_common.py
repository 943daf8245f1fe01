"""Span queries (SpanFirstQuery / SpanNotQuery) and CommonTermsQuery.

Reference behavior:
  - SpanFirstQuery (lucene/queries/src/java/org/apache/lucene/queries/
    spans/SpanFirstQuery.java:35): spans ending at position <= n.
  - SpanNotQuery (spans/SpanNotQuery.java:67,198-214): include spans
    with no exclude occurrence within pre tokens before / post tokens
    after; negative pre/post allow overlap.
  - CommonTermsQuery (queries/CommonTermsQuery.java:130-205): df split
    into required low-freq and optional high-freq clauses; all-high
    rewrites to a conjunction; fractional msm uses Math.round.

Expectations come from the numpy OracleIndex replicas over the shared
400-doc corpus (docID == pdf row)."""

import numpy as np
import pytest

from lucene_spark.oracle import assert_rank_identical

# body-text bigram: adjacency in 233/400 docs with VARIED positions and
# frequencies (the license-header phrases are identical across docs and
# would make every span constraint all-or-nothing)
PHRASE = ["getvalue0", "var0"]
TERM = "license"


def _collect(df):
    return [(int(r["docID"]), float(r["score"])) for r in df.collect()]


# -- spans ----------------------------------------------------------------

@pytest.mark.parametrize("end", [60, 120, 200, 10**6])
def test_span_first_phrase(built_index, end):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_first(PHRASE, end=end, k=10))
    exp = oracle.search_spans(PHRASE, k=10, first_end=end)
    assert_rank_identical(exp, got, msg=f"span_first end={end}")


def test_span_first_single_term(built_index):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_first(TERM, end=10, k=10))
    exp = oracle.search_spans([TERM], k=10, first_end=10)
    assert_rank_identical(exp, got, msg="span_first single term")


def test_span_first_huge_end_equals_phrase(built_index):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_first(PHRASE, end=10**9, k=10))
    exp = oracle.search_phrase(PHRASE, k=10)
    assert_rank_identical(exp, got, msg="span_first no-op limit")


@pytest.mark.parametrize("pre,post", [(0, 0), (2, 1), (0, 3), (5, 5)])
def test_span_not_phrase(built_index, pre, post):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_not(PHRASE, exclude="baz", pre=pre, post=post, k=10)
    )
    exp = oracle.search_spans(PHRASE, k=10, exclude="baz", pre=pre, post=post)
    assert_rank_identical(exp, got, msg=f"span_not pre={pre} post={post}")


def test_span_not_negative_overlap_allowance(built_index):
    # negative post shrinks the forbidden window (SpanNotQuery.java:64-65)
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_not(PHRASE, exclude=PHRASE[1], pre=0, post=-1, k=10)
    )
    exp = oracle.search_spans(PHRASE, k=10, exclude=PHRASE[1], pre=0, post=-1)
    assert_rank_identical(exp, got, msg="span_not negative post")
    # with post=0 the window covers the span itself, which CONTAINS the
    # second phrase term -> every span dies
    assert (
        searcher.search_span_not(PHRASE, exclude=PHRASE[1], pre=0, post=0, k=10).count()
        == 0
    )


def test_span_not_absent_exclude_is_noop(built_index):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_span_not(PHRASE, exclude="zzzznotaterm", k=10))
    exp = oracle.search_phrase(PHRASE, k=10)
    assert_rank_identical(exp, got, msg="span_not absent exclude")


def test_span_absent_include_is_empty(built_index):
    _, _, searcher = built_index
    assert searcher.search_span_first(["zzzznotaterm"], end=10).count() == 0


# -- common terms -----------------------------------------------------------

def _dfs(oracle, terms):
    return {t: len(oracle.postings[t][0]) if t in oracle.postings else 0 for t in terms}


CT_TERMS = ["the", "license", "return", "function"]


def test_common_terms_splits(built_index):
    """Pick maxTermFrequency so the corpus dfs actually split low/high."""
    _, oracle, _ = built_index
    dfs = _dfs(oracle, CT_TERMS)
    mtf = 0.5
    cut = int(np.ceil(mtf * oracle.doc_count))
    assert any(d > cut for d in dfs.values()) and any(
        0 < d <= cut for d in dfs.values()
    ), f"corpus dfs {dfs} don't split at {cut} — pick a different mtf"


@pytest.mark.parametrize(
    "low_occ,high_occ,low_msm,high_msm",
    [
        ("should", "should", 0.0, 0.0),
        ("must", "should", 0.0, 0.0),
        ("should", "must", 0.0, 0.0),
        ("should", "should", 2.0, 0.0),
        ("should", "should", 0.6, 0.5),
    ],
)
def test_common_terms_occur_grid(built_index, low_occ, high_occ, low_msm, high_msm):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_common_terms(
            CT_TERMS,
            max_term_frequency=0.5,
            low_freq_occur=low_occ,
            high_freq_occur=high_occ,
            low_msm=low_msm,
            high_msm=high_msm,
            k=10,
        )
    )
    exp = oracle.search_common_terms(
        CT_TERMS, 0.5, low_occ, high_occ, low_msm, high_msm, k=10
    )
    assert_rank_identical(
        exp, got, msg=f"common_terms {low_occ}/{high_occ}/{low_msm}/{high_msm}"
    )


def test_common_terms_all_high_conjunction(built_index):
    """mtf tiny -> every present term is high-frequency -> conjunction."""
    _, oracle, searcher = built_index
    got = _collect(searcher.search_common_terms(CT_TERMS, max_term_frequency=1.0 / 10**6))
    exp = oracle.search_common_terms(CT_TERMS, 1.0 / 10**6)
    assert_rank_identical(exp, got, msg="common_terms all-high")
    # equals the plain AND query over the same terms
    and_exp = oracle.search(list(dict.fromkeys(CT_TERMS)), k=10, mode="and")
    assert [d for d, _ in exp] == [d for d, _ in and_exp]


def test_common_terms_absolute_threshold(built_index):
    """maxTermFrequency >= 1 is an absolute df cutoff."""
    _, oracle, searcher = built_index
    dfs = _dfs(oracle, CT_TERMS)
    mtf = float(sorted(d for d in dfs.values() if d)[len(dfs) // 2])
    got = _collect(searcher.search_common_terms(CT_TERMS, max_term_frequency=mtf))
    exp = oracle.search_common_terms(CT_TERMS, mtf)
    assert_rank_identical(exp, got, msg="common_terms absolute mtf")


def test_common_terms_missing_low_must_is_empty(built_index):
    _, _, searcher = built_index
    q = CT_TERMS + ["zzzznotaterm"]
    assert (
        searcher.search_common_terms(
            q, max_term_frequency=0.5, low_freq_occur="must"
        ).count()
        == 0
    )


def test_common_terms_missing_low_should_still_matches(built_index):
    _, oracle, searcher = built_index
    q = CT_TERMS + ["zzzznotaterm"]
    got = _collect(searcher.search_common_terms(q, max_term_frequency=0.5))
    exp = oracle.search_common_terms(q, 0.5)
    assert got and [d for d, _ in got] == [d for d, _ in exp]


def test_common_terms_single_term_rewrites(built_index):
    _, oracle, searcher = built_index
    got = _collect(searcher.search_common_terms([TERM], max_term_frequency=0.5))
    exp = oracle.search([TERM], k=10)
    assert_rank_identical(exp, got, msg="common_terms single-term rewrite")


def test_common_terms_must_not_rejected(built_index):
    _, _, searcher = built_index
    with pytest.raises(ValueError):
        searcher.search_common_terms(CT_TERMS, low_freq_occur="must_not")


# -- covering query ----------------------------------------------------------

COV_SUBS = [["license"], ["return"], ["the", "apache"], ["var0"]]


def _covering_expected(oracle, min_of_doc, k=10, has_value=None):
    """CoveringQuery replica: nmatch >= max(1, value); docs without a
    value never match; score = sum of matching sub (OR) scores."""
    n = oracle.doc_count
    nmatch = np.zeros(n, dtype=np.int64)
    total = np.zeros(n, dtype=np.float64)
    for sub in COV_SUBS:
        acc = np.zeros(n, dtype=np.float64)
        seen = np.zeros(n, dtype=bool)
        for t in dict.fromkeys(sub):
            rows, scores = oracle._term_scores(t)
            acc[rows] += scores.astype(np.float64)
            seen[rows] = True
        nmatch[seen] += 1
        total[seen] += acc[seen]
    out = []
    for d in range(n):
        if has_value is not None and not has_value(d):
            continue
        if nmatch[d] >= max(1, min_of_doc(d)):
            out.append((d, np.float32(total[d])))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(d, float(s)) for d, s in out[:k]]


def _values_df(spark, n, fn, keep=lambda d: True):
    import pandas as pd

    rows = [(d, int(fn(d))) for d in range(n) if keep(d)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["docID", "value"])
    )


def test_covering_per_doc_minimum(built_index, spark):
    _, oracle, searcher = built_index
    fn = lambda d: 1 + d % 4
    vals = _values_df(spark, oracle.doc_count, fn)
    got = _collect(searcher.search_covering(COV_SUBS, vals, k=10))
    exp = _covering_expected(oracle, fn)
    assert_rank_identical(exp, got, tol=1e-5, msg="covering 1+d%4")


def test_covering_clamps_below_one(built_index, spark):
    _, oracle, searcher = built_index
    vals = _values_df(spark, oracle.doc_count, lambda d: -5)
    got = _collect(searcher.search_covering(COV_SUBS, vals, k=10))
    exp = _covering_expected(oracle, lambda d: 1)
    assert_rank_identical(exp, got, tol=1e-5, msg="covering clamp")


def test_covering_missing_value_never_matches(built_index, spark):
    _, oracle, searcher = built_index
    keep = lambda d: d % 2 == 0
    vals = _values_df(spark, oracle.doc_count, lambda d: 1, keep)
    got = searcher.search_covering(COV_SUBS, vals, k=400).collect()
    assert got and all(int(r["docID"]) % 2 == 0 for r in got)
    exp = _covering_expected(oracle, lambda d: 1, k=400, has_value=keep)
    assert {int(r["docID"]) for r in got} == {d for d, _ in exp}


def test_covering_impossible_minimum_is_empty(built_index, spark):
    _, oracle, searcher = built_index
    vals = _values_df(spark, oracle.doc_count, lambda d: len(COV_SUBS) + 1)
    assert searcher.search_covering(COV_SUBS, vals, k=10).count() == 0
