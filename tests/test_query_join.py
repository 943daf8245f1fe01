"""Query-time join (search_query_join) + DrillSideways (drill_sideways).

Reference behavior:
  - JoinUtil.createJoinQuery (lucene/join/src/java/org/apache/lucene/
    search/join/JoinUtil.java:81): run the from-query, aggregate scores
    per from-field value under ScoreMode (None/Avg/Max/Total/Min), match
    every doc whose to-field holds a collected value with that value's
    aggregate (None -> ConstantScore 1.0).
  - DrillSideways (lucene/facet/src/java/org/apache/lucene/facet/
    DrillSideways.java:62, DrillSidewaysScorer.java:49): per dimension,
    facet counts over base + every OTHER dimension's drill-down; the
    near-miss formulation says a doc counts for dim d iff it misses no
    drill-down other than possibly d.

Expected values come from the numpy OracleIndex per-doc BM25 sums
aggregated in float64 per from-field value over the shared 400-doc
corpus (pdf row order == docID).
"""

import shutil

import numpy as np
import pytest

from lucene_spark.corpus import generate_corpus

Q = ["license", "return"]


@pytest.fixture(scope="module")
def corpus_pdf():
    n = 400
    return (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )


def _doc_scores(oracle, mode="or"):
    """float64 per-doc OR/AND sums of per-term float32 BM25 scores."""
    terms = list(dict.fromkeys(Q))
    acc = np.zeros(oracle.doc_count, dtype=np.float64)
    nmatch = np.zeros(oracle.doc_count, dtype=np.int64)
    for t in terms:
        rows, scores = oracle._term_scores(t)
        acc[rows] += scores.astype(np.float64)
        nmatch[rows] += 1
    mask = nmatch == len(terms) if mode == "and" else nmatch > 0
    return np.flatnonzero(mask), acc


def _expected_join(oracle, pdf, field, score_mode, k=10, dead=()):
    rows, acc = _doc_scores(oracle)
    rows = [r for r in rows if r not in dead]
    per_val: dict[str, list[float]] = {}
    for r in rows:
        per_val.setdefault(pdf.iloc[r][field], []).append(acc[r])
    red = {
        "avg": lambda v: sum(v) / len(v),
        "max": max,
        "total": sum,
        "min": min,
        "none": lambda v: 1.0,
    }[score_mode]
    vals = {p: red(v) for p, v in per_val.items()}
    ranked = sorted(
        (
            (-vals[pdf.iloc[d][field]], d)
            for d in range(len(pdf))
            if pdf.iloc[d][field] in vals and d not in dead
        ),
    )
    return [(d, pdf.iloc[d][field], -s) for s, d in ranked[:k]]


@pytest.mark.parametrize("score_mode", ["avg", "max", "total", "min"])
def test_query_join_score_modes(built_index, corpus_pdf, score_mode):
    _, oracle, searcher = built_index
    got = [
        (int(r["docID"]), r["value"], float(r["score"]))
        for r in searcher.search_query_join(
            Q, from_field="lang", score_mode=score_mode, k=10
        ).collect()
    ]
    exp = _expected_join(oracle, corpus_pdf, "lang", score_mode)
    assert [(d, v) for d, v, _ in got] == [(d, v) for d, v, _ in exp]
    for (_, _, gs), (_, _, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-5)


def test_query_join_score_mode_none_is_constant(built_index, corpus_pdf):
    _, oracle, searcher = built_index
    got = searcher.search_query_join(
        Q, from_field="lang", score_mode="none", k=400
    ).collect()
    assert got and all(float(r["score"]) == 1.0 for r in got)
    rows, _ = _doc_scores(oracle)
    langs = {corpus_pdf.iloc[r]["lang"] for r in rows}
    exp_ids = {d for d in range(len(corpus_pdf)) if corpus_pdf.iloc[d]["lang"] in langs}
    assert {int(r["docID"]) for r in got} == exp_ids


def test_query_join_respects_deletes(built_index, corpus_pdf, spark):
    from lucene_spark.index.deletes import delete_by_keys

    _, oracle, searcher = built_index
    base = _expected_join(oracle, corpus_pdf, "lang", "max")
    victim = base[0][0]  # top doc; its lang's MAX may drop with it
    row = corpus_pdf.iloc[victim]
    assert delete_by_keys(spark, searcher.index_dir, [(row["repo"], row["path"])]) >= 1
    searcher.reload_deletes()
    try:
        got = [
            (int(r["docID"]), r["value"], float(r["score"]))
            for r in searcher.search_query_join(
                Q, from_field="lang", score_mode="max", k=10
            ).collect()
        ]
        dead = {
            d
            for d in range(len(corpus_pdf))
            if corpus_pdf.iloc[d]["repo"] == row["repo"]
            and corpus_pdf.iloc[d]["path"] == row["path"]
        }
        exp = _expected_join(oracle, corpus_pdf, "lang", "max", dead=dead)
        assert [(d, v) for d, v, _ in got] == [(d, v) for d, v, _ in exp]
        for (_, _, gs), (_, _, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-5)
    finally:
        shutil.rmtree(f"{searcher.index_dir}/deletes", ignore_errors=True)
        searcher.reload_deletes()


def test_drill_sideways_near_miss_counts(built_index, corpus_pdf):
    _, oracle, searcher = built_index
    drills = {
        "lang": corpus_pdf["lang"].mode()[0],
        "repo": corpus_pdf["repo"].mode()[0],
    }
    got = {
        (r["dim"], r["value"]): int(r["count"])
        for r in searcher.drill_sideways(Q, drills).collect()
    }
    rows, _ = _doc_scores(oracle)
    exp: dict[tuple, int] = {}
    for r in rows:
        doc = corpus_pdf.iloc[r]
        misses = {d for d, v in drills.items() if doc[d] != v}
        for d in drills:
            if misses <= {d}:  # passes all OTHER dims
                key = (d, str(doc[d]))
                exp[key] = exp.get(key, 0) + 1
    assert got == exp
