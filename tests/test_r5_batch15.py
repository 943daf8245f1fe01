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


# --------------------------------------------------------------------------
# batch-15 1:1 token filters: EnglishMinimalStem / Elision / DecimalDigit
# (pytest-only like ascii_folding — the gate corpus has no plurals,
# apostrophes, or non-Latin digits, so a duel there would be vacuous)
# --------------------------------------------------------------------------


def test_english_minimal_stem_goldens():
    from lucene_spark.analysis.porter import english_minimal_stem as f

    # EnglishMinimalStemmer.java switch table, branch by branch
    assert f("dogs") == "dog"
    assert f("tables") == "table"
    assert f("cities") == "city"      # -ies -> -y
    assert f("movies") == "movy"      # the reference's crude -ies too
    assert f("bus") == "bus"          # -us unchanged
    assert f("class") == "class"      # -ss unchanged
    assert f("goes") == "goes"        # -es after o unchanged
    assert f("heroes") == "heroes"
    assert f("as") == "as"            # len < 3
    assert f("gas") == "ga"           # len 3 default branch (faithful)
    assert f("run") == "run"          # no trailing s


def test_elision_goldens():
    from lucene_spark.analysis.porter import elision as f

    assert f("l'avion") == "avion"
    assert f("d'or") == "or"
    assert f("qu'elle") == "elle"
    assert f("jusqu'ici") == "ici"
    assert f("x'y") == "x'y"          # non-article prefix unchanged
    assert f("avion") == "avion"
    assert f("l’avion") == "avion"  # curly apostrophe


def test_decimal_digit_goldens():
    from lucene_spark.analysis.porter import decimal_digit as f

    assert f("١٢٣abc") == "123abc"  # Arabic-Indic
    assert f("４２") == "42"               # full-width
    assert f("x²") == "x²"  # superscript is NOT Nd (Java parity)
    assert f("abc") == "abc"


def test_minstem_chain_e2e(spark, tmp_path):
    """End-to-end: an english_minimal_stem index matches singular and
    plural forms to the same dictionary entry, query-side too."""
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    docs = spark.createDataFrame(
        [
            ("r", "d1", "0", "t", "three dogs and tables"),
            ("r", "d2", "0", "t", "one dog one table"),
            ("r", "d3", "0", "t", "nothing here"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    out = str(tmp_path / "idx_min")
    build_index(
        spark, docs, out, partitions=2,
        token_filters=("english_minimal_stem",),
    )
    s = IndexSearcher(spark, out)
    assert s._parse("dogs") == ["dog"]
    hits = {int(r["docID"]) for r in s.filter_docs("dog").collect()}
    assert hits == {0, 1}
    # chain composes with shingles: plural-folded bigrams
    out2 = str(tmp_path / "idx_min_sh")
    build_index(
        spark, docs, out2, partitions=2,
        token_filters=("english_minimal_stem", "shingle_2"),
    )
    s2 = IndexSearcher(spark, out2)
    assert s2._parse("dogs and") == ["dog and"]
    assert s2.count_term_set(["dog and"]) == 1


# --------------------------------------------------------------------------
# Intervals.maxwidth (queries/intervals/Intervals.java maxwidth wrapper)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("width", [2, 3, 5])
def test_interval_maxwidth_duel(built_index, ordered, width):
    _, oracle, s = built_index
    terms = ["getvalue0", "var0"]
    got = {
        int(r["docID"]): r["n_intervals"]
        for r in s.search_intervals(
            terms, max_gaps=10, ordered=ordered, k=1000,
            max_width=width,
        ).collect()
    }
    exp = oracle.interval_counts(
        terms, max_gaps=10, ordered=ordered, max_width=width
    )
    assert got == {int(k): v for k, v in exp.items()}


def test_interval_maxwidth_monotone_and_floor(built_index):
    _, _, s = built_index
    terms = ["getvalue0", "var0"]
    wide = s.search_intervals(terms, max_gaps=10, k=1000, max_width=50)
    tight = s.search_intervals(terms, max_gaps=10, k=1000, max_width=2)
    w = {r["docID"]: r["n_intervals"] for r in wide.collect()}
    t = {r["docID"]: r["n_intervals"] for r in tight.collect()}
    assert set(t) <= set(w)
    assert all(t[d] <= w[d] for d in t)
    # an interval spans all terms: extent < n_terms can match nothing
    assert s.search_intervals(terms, max_gaps=10, k=10, max_width=1).count() == 0
