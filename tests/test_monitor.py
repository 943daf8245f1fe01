"""Monitor / percolator: registered queries match streaming batches via
one tokenize pass + a broadcast query-term join."""
import pytest
from pyspark.sql import Row


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(repo="r", path="0", commit="0", lang="en",
            content="alpha beta gamma"),
        Row(repo="r", path="1", commit="0", lang="en",
            content="alpha alpha delta"),
        Row(repo="r", path="2", commit="0", lang="en",
            content="beta delta epsilon"),
        Row(repo="r", path="3", commit="0", lang="en",
            content="nothing here"),
    ]
    return spark.createDataFrame(rows)


def _matches(m, docs):
    return {
        (r["query_id"], r["path"]) for r in m.match_batch(docs).collect()
    }


def test_or_and_msm(spark, docs):
    from lucene_spark.streaming.monitor import Monitor

    m = Monitor(spark, [
        ("or_ab", ["alpha", "beta"], "or"),
        ("and_ab", ["alpha", "beta"], "and"),
        ("msm2", ["alpha", "beta", "delta"], "msm2"),
    ])
    got = _matches(m, docs)
    assert {p for q, p in got if q == "or_ab"} == {"0", "1", "2"}
    assert {p for q, p in got if q == "and_ab"} == {"0"}
    # msm2: doc0 has alpha+beta, doc1 alpha+delta, doc2 beta+delta
    assert {p for q, p in got if q == "msm2"} == {"0", "1", "2"}


def test_distinct_terms_not_tf(spark, docs):
    """doc1 has 'alpha' twice — AND of [alpha, delta] must count
    DISTINCT matched terms (2), repeated tf must not satisfy a
    3-term AND."""
    from lucene_spark.streaming.monitor import Monitor

    m = Monitor(spark, [
        ("and_ad", ["alpha", "delta"], "and"),
        ("and_aad", ["alpha", "delta", "gamma"], "and"),
    ])
    got = _matches(m, docs)
    assert {p for q, p in got if q == "and_ad"} == {"1"}
    assert {p for q, p in got if q == "and_aad"} == set()


def test_analyzer_parity_with_filters(spark, docs):
    """Registered query text passes the same analyzer chain as the
    documents (tokenize+lowercase+filters): 'ALPHAS' with the porter
    chain stems to 'alpha' and matches."""
    from lucene_spark.streaming.monitor import Monitor

    m = Monitor(
        spark, [("stemq", ["ALPHAS"], "or")],
        token_filters=("possessive", "porter"),
    )
    got = _matches(m, docs)
    assert {p for q, p in got if q == "stemq"} == {"0", "1"}


def test_foreachbatch_wiring(spark, docs, tmp_path):
    """run_stream drives match_batch through foreachBatch: replay the
    batch from a file stream and collect alerts via the sink_fn."""
    from lucene_spark.streaming.monitor import Monitor

    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    m = Monitor(spark, [("or_ab", ["alpha", "beta"], "or")])
    out: set = set()

    def sink(matches, batch_id):
        out.update((r["query_id"], r["path"]) for r in matches.collect())

    q = m.run_stream(
        stream, sink, checkpointLocation=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    assert out == {("or_ab", "0"), ("or_ab", "1"), ("or_ab", "2")}
