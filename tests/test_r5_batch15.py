"""r5 batch 15 tests: TermInSetQuery + RandomSamplingFacetsCollector.

References: lucene/core/src/java/org/apache/lucene/search/
TermInSetQuery.java (constant-score set membership) and lucene/facet/
src/java/org/apache/lucene/facet/RandomSamplingFacetsCollector.java
(:118-137 rate derivation, amortizeFacetCounts correctedCount =
min(docFreq, count/rate)).
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.facets import sampled_facet_counts


# --------------------------------------------------------------------------
# TermInSetQuery
# --------------------------------------------------------------------------


def _term_docs(oracle, term):
    if term not in oracle.postings:
        return set()
    rows, _, _ = oracle.postings[term]
    return {int(oracle.doc_ids[r]) for r in rows}


def test_term_set_matches_oracle_union(built_index):
    _, oracle, s = built_index
    terms = ["static", "return", "nosuchtermzzz"]
    want = sorted(_term_docs(oracle, "static") | _term_docs(oracle, "return"))
    got = s.search_term_set(terms, k=len(want) + 10).collect()
    assert [r["docID"] for r in got] == want
    assert all(r["score"] == 1.0 for r in got)


def test_term_set_k_cut_and_count(built_index):
    _, oracle, s = built_index
    terms = ["static", "return"]
    want = sorted(_term_docs(oracle, "static") | _term_docs(oracle, "return"))
    got = s.search_term_set(terms, k=5).collect()
    assert [r["docID"] for r in got] == want[:5]
    assert s.count_term_set(terms) == len(want)
    assert s.count_term_set(["nosuchtermzzz"]) == 0
    assert s.count_term_set([]) == 0


def test_term_set_dedups_terms(built_index):
    _, _, s = built_index
    a = s.count_term_set(["static", "static", "return"])
    b = s.count_term_set(["static", "return"])
    assert a == b


# --------------------------------------------------------------------------
# RandomSamplingFacetsCollector
# --------------------------------------------------------------------------


@pytest.fixture()
def lang_frame(spark):
    rows = [
        (i, ["py", "go", "rs", "java"][i % 4], f"text body {i}")
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "id long, lang string, body string")


def test_sampled_facets_exact_below_threshold(lang_frame):
    # totalHits <= sampleSize -> exact counts (the reference's early-out)
    out = sampled_facet_counts(lang_frame, "lang", 1000, "body")
    got = {r["dim"]: r["cnt"] for r in out.collect()}
    assert got == {"py": 100, "go": 100, "rs": 100, "java": 100}


def test_sampled_facets_amortized(lang_frame):
    from lucene_spark.pipeline.sample import hash_sample

    size = 80
    rate = size / 400.0
    out = sampled_facet_counts(lang_frame, "lang", size, "body")
    got = {r["dim"]: r["cnt"] for r in out.collect()}
    # replicate: the identical md5 device then floor(count/rate)
    samp = hash_sample(lang_frame, rate, "body").collect()
    import collections

    c = collections.Counter(r["lang"] for r in samp)
    want = {k: int(v / rate) for k, v in c.items()}
    assert got == want
    # the sample is a real subsample, not the full set
    assert sum(c.values()) < 400


def test_sampled_facets_docfreq_cap(lang_frame, spark):
    # a dim_totals cap below the amortized estimate must clamp it
    size = 80
    caps = spark.createDataFrame(
        [("py", 3), ("go", 3), ("rs", 3), ("java", 3)],
        "dim string, max long",
    )
    out = sampled_facet_counts(
        lang_frame, "lang", size, "body", dim_totals=caps
    )
    for r in out.collect():
        assert r["cnt"] <= 3


def test_sampled_facets_total_hits_shortcut(lang_frame):
    # passing total_hits must not change the result (it only avoids the
    # count job — the searcher already knows df)
    a = sampled_facet_counts(lang_frame, "lang", 80, "body")
    b = sampled_facet_counts(
        lang_frame, "lang", 80, "body", total_hits=400
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_sampled_facets_rejects_bad_size(lang_frame):
    with pytest.raises(ValueError):
        sampled_facet_counts(lang_frame, "lang", 0, "body")
