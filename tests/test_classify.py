"""Classification (kNN + naive Bayes) vs driver-side closed forms."""
import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.classify import (
    knn_classify,
    knn_vote,
    nb_classify,
    nb_classify_batch,
)


def _labels(spark, searcher):
    """docID % 3 as a 3-class synthetic label map."""
    return searcher.docmap.select(
        "docID", F.concat(F.lit("c"), F.col("docID") % 3).alias("cls")
    )


@pytest.fixture(scope="module")
def corpus_docs():
    """content strings in docID order (same sort as the conftest index)."""
    import os

    from lucene_spark.corpus import generate_corpus

    n = int(os.environ.get("SPARK_GRAFT_TEST_DOCS", "400"))
    pdf = (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    return pdf["content"].tolist()


def test_knn_vote_closed_form(spark):
    # 5 hits, 2 classes, one unlabeled: maxScore=8.0, sumdoc=4
    hits = spark.createDataFrame(
        [("a", 8.0), ("b", 6.0), ("a", 4.0), (None, 3.0), ("b", 2.0)],
        "cls string, score double",
    )
    got = {r.cls: r.vote for r in knn_vote(hits, k=10).collect()}
    # correction branch (sumdoc=4 < k=10): vote = boost_sum / sumdoc
    assert math.isclose(got["a"], (8 / 8 + 4 / 8) / 4, rel_tol=1e-12)
    assert math.isclose(got["b"], (6 / 8 + 2 / 8) / 4, rel_tol=1e-12)


def test_knn_vote_full_k_branch(spark):
    # sumdoc == k: the un-corrected branch divides by k — same value
    hits = spark.createDataFrame(
        [("a", 4.0), ("b", 2.0)], "cls string, score double"
    )
    got = {r.cls: r.vote for r in knn_vote(hits, k=2).collect()}
    assert math.isclose(got["a"], (4 / 4) / 2, rel_tol=1e-12)
    assert math.isclose(got["b"], (2 / 4) / 2, rel_tol=1e-12)


def test_knn_classify_matches_driver_replica(spark, built_index, corpus_docs):
    _, _, searcher = built_index
    labels = _labels(spark, searcher)
    seed = corpus_docs[7]
    got = {r.cls: r.vote for r in knn_classify(searcher, seed, labels, k=10).collect()}

    hits = searcher.more_like_this(seed, k=10).collect()
    lab = {r.docID: r.cls for r in labels.collect()}
    mx = max(h.score for h in hits)
    boost: dict = {}
    for h in hits:
        boost[lab[h.docID]] = boost.get(lab[h.docID], 0.0) + h.score / mx
    want = {c: b / len(hits) for c, b in boost.items()}
    assert set(got) == set(want)
    for c in want:
        assert math.isclose(got[c], want[c], rel_tol=1e-6), c
    # the winning class dominates
    assert max(got, key=got.get) == max(want, key=want.get)


def _nb_expected(searcher, tokens, labels_map, contents):
    """Pure-python SimpleNaiveBayesClassifier replica from analyze()d
    corpus tokens + a docID->cls map."""
    from lucene_spark.analysis.standard import analyze

    n = searcher.doc_count
    avg_unique = searcher.manifest["sum_doc_freq"] / n
    by_cls: dict = {}
    for d, c in labels_map.items():
        by_cls.setdefault(c, []).append(d)
    # docID -> set of terms
    doc_terms = {d: set(analyze(t)) for d, t in enumerate(contents)}
    scores = {}
    for c, docs_c in by_cls.items():
        dfc = len(docs_c)
        den = avg_unique * dfc + n
        s = math.log(dfc) - math.log(n)
        for w in tokens:
            hits = sum(1 for d in docs_c if w in doc_terms[d])
            s += math.log((hits + 1) / den)
        scores[c] = s
    smax = max(scores.values())
    loga = smax + math.log(sum(math.exp(v - smax) for v in scores.values()))
    return scores, {c: math.exp(v - loga) for c, v in scores.items()}


def test_nb_classify_matches_replica(spark, built_index, corpus_docs):
    from lucene_spark.analysis.standard import analyze

    _, _, searcher = built_index
    labels = _labels(spark, searcher)
    text = corpus_docs[11]
    got = {r.cls: (r.score, r.prob) for r in nb_classify(searcher, text, labels).collect()}

    labels_map = {r.docID: r.cls for r in labels.collect()}
    want_s, want_p = _nb_expected(searcher, analyze(text), labels_map, corpus_docs)
    assert set(got) == set(want_s)
    for c in want_s:
        assert math.isclose(got[c][0], want_s[c], rel_tol=1e-9), c
        assert math.isclose(got[c][1], want_p[c], rel_tol=1e-6, abs_tol=1e-12), c
    # probabilities form a distribution
    assert math.isclose(sum(p for _, p in got.values()), 1.0, rel_tol=1e-9)


def test_nb_batch_equals_single(spark, built_index, corpus_docs):
    _, _, searcher = built_index
    labels = _labels(spark, searcher)
    qids = [3, 11, 42]
    docs = spark.createDataFrame(
        [(q, corpus_docs[q]) for q in qids], "qid long, text string"
    )
    batch = nb_classify_batch(searcher, docs, labels).collect()
    by_qid: dict = {}
    for r in batch:
        by_qid.setdefault(r.qid, {})[r.cls] = (r.score, r.prob)
    for q in qids:
        single = {
            r.cls: (r.score, r.prob)
            for r in nb_classify(searcher, corpus_docs[q], labels).collect()
        }
        assert set(single) == set(by_qid[q])
        for c in single:
            assert math.isclose(single[c][0], by_qid[q][c][0], rel_tol=1e-12), (q, c)


def test_nb_single_uses_analyzer_chain(spark, built_index, corpus_docs):
    """_parse must feed the classifier (so stemmed indexes classify
    stemmed tokens) — verified by token multiplicity handling: a doubled
    token doubles its log-likelihood contribution."""
    _, _, searcher = built_index
    labels = _labels(spark, searcher)
    once = {r.cls: r.score for r in nb_classify(searcher, "value", labels).collect()}
    twice = {r.cls: r.score for r in nb_classify(searcher, "value value", labels).collect()}
    labels_map = {r.docID: r.cls for r in labels.collect()}
    want_once, _ = _nb_expected(searcher, ["value"], labels_map, corpus_docs)
    want_twice, _ = _nb_expected(searcher, ["value", "value"], labels_map, corpus_docs)
    for c in once:
        assert math.isclose(once[c], want_once[c], rel_tol=1e-9)
        assert math.isclose(twice[c], want_twice[c], rel_tol=1e-9)


def test_nb_empty_text(spark, built_index):
    _, _, searcher = built_index
    labels = _labels(spark, searcher)
    assert nb_classify(searcher, "", labels).count() == 0
