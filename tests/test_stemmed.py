"""End-to-end stemmed index: EnglishAnalyzer-style chain
(StandardTokenizer + lowercase + possessive + porter) threaded through
build_index and the query-side parser — "running" finds "run"."""
import shutil

import pytest
from pyspark.sql import Row


@pytest.fixture(scope="module")
def stemmed_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    rows = [
        Row(repo="r", path="a", commit="0", lang="en",
            content="the process runs and the run completes"),
        Row(repo="r", path="b", commit="0", lang="en",
            content="processing running processes continuously running"),
        Row(repo="r", path="c", commit="0", lang="en",
            content="the dog's bone and the pony's saddle"),
        Row(repo="r", path="d", commit="0", lang="en",
            content="unrelated words appear here entirely"),
    ]
    docs = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("stem") / "idx")
    manifest = build_index(
        spark, docs, out, partitions=2,
        token_filters=("possessive", "porter"),
    )
    s = IndexSearcher(spark, out)
    yield manifest, s
    shutil.rmtree(out, ignore_errors=True)


def test_manifest_records_chain(stemmed_index):
    manifest, _ = stemmed_index
    assert manifest["token_filters"] == ["possessive", "porter"]


def test_index_holds_stems(stemmed_index):
    _, s = stemmed_index
    # surface forms are gone; stems are the vocabulary
    tf = {
        (r["term"], r["docID"]): r["tf"]
        for r in s.postings_tf(["run", "running", "process", "dog"]).collect()
    }
    terms = {t for t, _ in tf}
    assert "running" not in terms
    assert "run" in terms and "process" in terms and "dog" in terms
    # doc a: runs+run -> tf(run)=2 ; doc b: running x2 -> tf(run)=2
    run_tfs = sorted(v for (t, _), v in tf.items() if t == "run")
    assert run_tfs == [2, 2]


def test_query_side_stemming(stemmed_index):
    _, s = stemmed_index
    # "running" stems to "run": hits docs a (docID 0) and b (docID 1)
    hits = {r["docID"] for r in s.search("running", k=10).collect()}
    assert hits == {0, 1}
    # possessive + stem on the query: "dog's" -> "dog" hits doc c
    hits = {r["docID"] for r in s.search("dog's", k=10).collect()}
    assert hits == {2}
    # stemming collapses morphology both ways: "processes" ~ "processing"
    hits = {r["docID"] for r in s.search("processes", k=10).collect()}
    assert hits == {0, 1}


def test_dl_and_norms_unchanged_by_stemming(stemmed_index):
    """Filters are 1:1 per token — document length must equal the raw
    token count, not the distinct-stem count."""
    _, s = stemmed_index
    dls = {r["path"]: r["dl"] for r in s.docmap.collect()}
    assert dls["a"] == 7
    assert dls["b"] == 5
    assert dls["c"] == 7
