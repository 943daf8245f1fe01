"""ToParentBlockJoinQuery analog (search_block_join).

Reference behavior:
  - ToParentBlockJoinQuery (lucene/join/src/java/org/apache/lucene/
    search/join/ToParentBlockJoinQuery.java:63): children scored by the
    wrapped query, aggregated up to the enclosing parent block.
  - ScoreMode (lucene/join/src/java/org/apache/lucene/search/join/
    ScoreMode.java): None / Avg / Max / Total / Min. ScoreMode.None
    matches without scoring (parents score 0).

Here the parent/child block invariant is structural: docID is the global
(repo, path, commit) rank, so any docmap expression constant on
contiguous key ranges (repo, or a repo/path prefix) defines valid
blocks. Expected values come from the numpy OracleIndex per-child BM25
scores aggregated in float64 per parent.
"""

import numpy as np
import pytest

from lucene_spark.corpus import generate_corpus

Q = ["license", "return"]  # hot + medium-df terms, both present


def _expected(oracle, pdf, parent_key, mode="or", score_mode="avg", k=10):
    """float64 per-parent aggregate of per-child OR/AND BM25 sums."""
    terms = list(dict.fromkeys(Q))
    acc = np.zeros(oracle.doc_count, dtype=np.float64)
    nmatch = np.zeros(oracle.doc_count, dtype=np.int64)
    for t in terms:
        rows, scores = oracle._term_scores(t)
        acc[rows] += scores.astype(np.float64)
        nmatch[rows] += 1
    mask = nmatch == len(terms) if mode == "and" else nmatch > 0
    rows = np.flatnonzero(mask)
    per_parent: dict[str, list[float]] = {}
    for r in rows:
        per_parent.setdefault(parent_key(pdf.iloc[r]), []).append(acc[r])
    red = {
        "avg": lambda v: sum(v) / len(v),
        "max": max,
        "total": sum,
        "min": min,
        "none": lambda v: 0.0,
    }[score_mode]
    ranked = sorted(
        ((red(v), len(v), p) for p, v in per_parent.items()),
        key=lambda x: (-x[0], x[2]),
    )
    return [(p, s, n) for s, n, p in ranked[:k]]


@pytest.fixture(scope="module")
def corpus_pdf():
    n = 400
    return (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("score_mode", ["avg", "max", "total", "min"])
def test_block_join_score_modes(built_index, corpus_pdf, score_mode):
    _, oracle, searcher = built_index
    got = [
        (r["parent"], float(r["score"]), int(r["n_children"]))
        for r in searcher.search_block_join(
            Q, parent_of="repo", score_mode=score_mode, k=10
        ).collect()
    ]
    exp = _expected(oracle, corpus_pdf, lambda row: row["repo"], score_mode=score_mode)
    assert [(p, n) for p, _, n in got] == [(p, n) for p, _, n in exp]
    for (_, gs, _), (_, es, _) in zip(got, exp):
        # engine sums per-term float32 scores in double; oracle likewise
        assert gs == pytest.approx(es, rel=1e-5)


def test_block_join_coarse_parent_expr(built_index, corpus_pdf):
    """Arbitrary SQL parent expression (org prefix → 7 contiguous blocks)."""
    _, oracle, searcher = built_index
    got = [
        (r["parent"], float(r["score"]), int(r["n_children"]))
        for r in searcher.search_block_join(
            Q, parent_of="substring(repo, 1, 4)", score_mode="total", k=7
        ).collect()
    ]
    exp = _expected(
        oracle, corpus_pdf, lambda row: row["repo"][:4], score_mode="total", k=7
    )
    assert [(p, n) for p, _, n in got] == [(p, n) for p, _, n in exp]
    for (_, gs, _), (_, es, _) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-5)


def test_block_join_and_mode(built_index, corpus_pdf):
    _, oracle, searcher = built_index
    got = [
        (r["parent"], float(r["score"]), int(r["n_children"]))
        for r in searcher.search_block_join(
            Q, parent_of="repo", score_mode="max", k=10, mode="and"
        ).collect()
    ]
    exp = _expected(
        oracle, corpus_pdf, lambda row: row["repo"], mode="and", score_mode="max"
    )
    assert [(p, n) for p, _, n in got] == [(p, n) for p, _, n in exp]


def test_block_join_score_mode_none(built_index, corpus_pdf):
    """ScoreMode.None: same matching parents, all scores exactly 0."""
    _, oracle, searcher = built_index
    got = searcher.search_block_join(
        Q, parent_of="repo", score_mode="none", k=1000
    ).collect()
    exp = _expected(
        oracle, corpus_pdf, lambda row: row["repo"], score_mode="none", k=10**9
    )
    assert all(float(r["score"]) == 0.0 for r in got)
    assert sorted((r["parent"], int(r["n_children"])) for r in got) == sorted(
        (p, n) for p, _, n in exp
    )


def test_block_join_edge_cases(built_index):
    _, _, searcher = built_index
    with pytest.raises(ValueError, match="ScoreMode"):
        searcher.search_block_join(Q, score_mode="sum")
    # absent MUST term matches nothing; all-absent OR matches nothing
    assert (
        searcher.search_block_join(
            ["license", "zzqqxx_notaterm"], mode="and"
        ).count()
        == 0
    )
    assert searcher.search_block_join(["zzqqxx_notaterm"]).count() == 0


# --------------------------------------------------------------------------
# ToChildBlockJoinQuery (search_block_join_children)
# --------------------------------------------------------------------------


def _expected_children(oracle, pdf, parent_key, mode="or", score_mode="avg", k=10):
    """Every child of a matching parent scores its parent's aggregate
    (ToChildBlockJoinQuery.java:188-197 parentScore), ranked (score DESC,
    docID ASC)."""
    parents = _expected(
        oracle, pdf, parent_key, mode=mode, score_mode=score_mode, k=10**9
    )
    pscore = {p: s for p, s, _ in parents}
    kids = []
    for r in range(oracle.doc_count):
        p = parent_key(pdf.iloc[r])
        if p in pscore:
            kids.append((r, p, pscore[p]))
    kids.sort(key=lambda x: (-x[2], x[0]))
    return kids[:k]


@pytest.mark.parametrize("score_mode", ["avg", "total"])
def test_block_join_children(built_index, corpus_pdf, score_mode):
    _, oracle, searcher = built_index
    got = [
        (int(r["docID"]), r["parent"], float(r["score"]))
        for r in searcher.search_block_join_children(
            Q, parent_of="repo", score_mode=score_mode, k=10
        ).collect()
    ]
    exp = _expected_children(
        oracle, corpus_pdf, lambda row: row["repo"], score_mode=score_mode
    )
    assert [(d, p) for d, p, _ in got] == [(d, p) for d, p, _ in exp]
    for (_, _, gs), (_, _, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-5)


def test_block_join_children_within_block_docid_ties(built_index, corpus_pdf):
    """All children of one block tie at the parent score → docID ASC order,
    and a k larger than the best block spills into the runner-up block."""
    _, oracle, searcher = built_index
    exp = _expected_children(
        oracle, corpus_pdf, lambda row: row["repo"], k=10**9
    )
    k = 25
    got = [
        int(r["docID"])
        for r in searcher.search_block_join_children(
            Q, parent_of="repo", k=k
        ).collect()
    ]
    assert got == [d for d, _, _ in exp[:k]]


def test_block_join_children_empty(built_index):
    _, _, searcher = built_index
    df = searcher.search_block_join_children(["zzqqxx_notaterm"])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["docID", "parent", "score"]
