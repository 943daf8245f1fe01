"""StopFilter end-to-end: a DROPPING token filter in the analyzer chain.

Reference behavior:
  - StopFilter (lucene/analysis/common/src/java/org/apache/lucene/
    analysis/StopFilter.java:25 via FilteringTokenFilter.java:50-56):
    stopwords are removed from the token stream; the removed tokens'
    position increments accumulate, so surviving tokens keep GAPPED
    positions (enablePositionIncrements — the only mode since 5.0).
  - The stop set is EnglishAnalyzer's default
    (analysis/en/EnglishAnalyzer.java:46 ENGLISH_STOP_WORDS_SET).
  - FieldInvertState.length counts EMITTED tokens only, so dl / norms
    shrink (IndexingChain.invert — length += posIncr handling), and
    collection stats (sumTotalTermFreq) follow.
  - Query side: QueryBuilder.createFieldQuery drops stopword clauses.

Expectations come from OracleIndex(contents, token_filters=("stop_en",)),
whose per-token python loop implements the same spec independently of the
vectorized vocab-remap invert path.
"""
import shutil

import numpy as np
import pytest

from lucene_spark.analysis.porter import ENGLISH_STOP_WORDS
from lucene_spark.analysis.standard import analyze
from lucene_spark.corpus import corpus_spark_df, generate_corpus
from lucene_spark.oracle import OracleIndex, assert_rank_identical

N_DOCS = 300


@pytest.fixture(scope="module")
def stop_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    out = str(tmp_path_factory.mktemp("stop") / "idx")
    docs = corpus_spark_df(spark, N_DOCS, partitions=4)
    manifest = build_index(
        spark, docs, out, partitions=4, token_filters=("stop_en",)
    )
    pdf = (
        generate_corpus(N_DOCS)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(pdf["content"].tolist(), token_filters=("stop_en",))
    searcher = IndexSearcher(spark, out)
    yield manifest, oracle, searcher, pdf
    shutil.rmtree(out, ignore_errors=True)


def test_stopwords_absent_from_vocabulary(stop_index):
    _, _, searcher, _ = stop_index
    rows = searcher.postings_tf(["the", "to", "and", "license"]).collect()
    terms = {r["term"] for r in rows}
    assert terms == {"license"}  # every stopword dropped index-wide


def test_positions_gap_across_stopwords(stop_index):
    """The license header is 'Licensed to the Apache ...': after the
    stop filter, apache sits at position 3 (gaps preserved), not 1."""
    _, oracle, searcher, _ = stop_index
    got = {}
    for r in searcher.postings_positions(["apache", "licensed"]).collect():
        ps = list(r["pos"]) if isinstance(r["pos"], list) else [r["pos"]]
        got.setdefault(r["term"], {}).setdefault(r["docID"], []).extend(ps)
    for t in ("apache", "licensed"):
        rows, _, posmap = oracle.postings[t]
        exp = {int(oracle.doc_ids[r]): posmap[r].tolist() for r in rows.tolist()}
        # engine emits one row per (docID, pos) or per docID depending on
        # reader; normalize by comparing sorted flat pairs
        got_pairs = sorted(
            (d, p) for d, ps in got.get(t, {}).items() for p in ps
        )
        exp_pairs = sorted((d, p) for d, ps in exp.items() for p in ps)
        assert got_pairs == exp_pairs, t
    # explicit gap: wherever the header's 'licensed' sits at p, the
    # following 'apache' sits at p+3 ('to the' dropped, slots kept)
    lic_docs = sorted((got.get("licensed") or {}).keys())
    assert lic_docs, "expected license-header docs"
    some = lic_docs[0]
    apos = set(got["apache"][some])
    assert any(p + 3 in apos for p in got["licensed"][some])


def test_dl_counts_emitted_tokens(stop_index):
    _, oracle, searcher, pdf = stop_index
    dls = {r["docID"]: r["dl"] for r in searcher.docmap.collect()}
    for row in range(N_DOCS):
        assert dls[row] == int(oracle.dl[row]), row
    # and strictly less than the raw token count for stopword-bearing docs
    raw = [len(analyze(t)) for t in pdf["content"].tolist()]
    shrunk = sum(1 for r in range(N_DOCS) if int(oracle.dl[r]) < raw[r])
    assert shrunk > 0


@pytest.mark.parametrize("mode", ["or", "and"])
def test_bm25_rank_identity(stop_index, mode):
    _, oracle, searcher, _ = stop_index
    q = ["license", "apache"]
    got = [
        (r["docID"], r["score"])
        for r in searcher.search(q, k=10, mode=mode).collect()
    ]
    exp = oracle.search(q, k=10, mode=mode)
    assert_rank_identical(exp, got, msg=f"stop bm25 {mode}")


def test_exact_phrase_does_not_cross_gap(stop_index):
    """'licensed to the apache': exact phrase licensed->apache does NOT
    match (positions 0 and 3), the slop=2 sloppy phrase does — the
    classic StopFilter position-increment behavior."""
    _, oracle, searcher, _ = stop_index
    exact = {r["docID"] for r in searcher.search_phrase("licensed apache", k=1000).collect()}
    exp_exact = set(
        int(oracle.doc_ids[r]) for r in oracle.phrase_freqs(["licensed", "apache"])
    )
    assert exact == exp_exact
    sloppy = {
        r["docID"]
        for r in searcher.search_sloppy_phrase("licensed apache", slop=2, k=1000).collect()
    }
    assert sloppy - exact, "slop=2 must add the gapped header docs"


def test_query_side_stopwords_drop(stop_index):
    _, _, searcher, _ = stop_index
    a = [(r["docID"], r["score"]) for r in searcher.search("the license", k=10).collect()]
    b = [(r["docID"], r["score"]) for r in searcher.search("license", k=10).collect()]
    assert a == b
    # an all-stopword query analyzes to no terms
    assert searcher._parse("the to and") == []


def test_manifest_and_stats(stop_index):
    manifest, oracle, _, _ = stop_index
    assert manifest["token_filters"] == ["stop_en"]
    # sumTotalTermFreq = emitted tokens only
    assert manifest["sum_total_term_freq"] == int(oracle.dl.sum())


def test_stop_set_is_lucene_default():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "license" not in ENGLISH_STOP_WORDS
