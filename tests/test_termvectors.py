"""Term vectors: doc-major side table vs the numpy oracle's postings."""
import os
import shutil

import numpy as np
import pytest

from lucene_spark.corpus import corpus_spark_df, generate_corpus
from lucene_spark.index.builder import build_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def tv_index(spark, tmp_path_factory):
    n = 200
    out = str(tmp_path_factory.mktemp("tvidx") / "index")
    docs = corpus_spark_df(spark, n, partitions=4)
    build_index(spark, docs, out, partitions=4, store_term_vectors=True)
    pdf = (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(pdf["content"].tolist())
    searcher = IndexSearcher(spark, out)
    yield searcher, oracle, pdf["content"].tolist()
    shutil.rmtree(out, ignore_errors=True)


def _oracle_vector(oracle, doc):
    """docID -> {term: (tf, positions)} from the term-major oracle."""
    out = {}
    for t, (rows, tfs, posmap) in oracle.postings.items():
        i = np.searchsorted(rows, doc)
        if i < len(rows) and rows[i] == doc:
            out[t] = (int(tfs[i]), posmap[doc].tolist())
    return out


def test_term_vector_matches_oracle(spark, tv_index):
    searcher, oracle, _ = tv_index
    for doc in (0, 7, 123, 199):
        got = {
            r.term: (int(r.tf), list(r.positions))
            for r in searcher.term_vector(doc).collect()
        }
        assert got == _oracle_vector(oracle, doc), doc


def test_term_vectors_batch(spark, tv_index):
    searcher, oracle, _ = tv_index
    rows = searcher.term_vectors([3, 42]).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.docID, {})[r.term] = (int(r.tf), list(r.positions))
    assert set(by_doc) == {3, 42}
    for d in (3, 42):
        assert by_doc[d] == _oracle_vector(oracle, d)


def test_term_vector_drops_deleted(spark, tv_index):
    searcher, _, _ = tv_index
    # simulate the broadcast tombstone mode driver-side
    old = searcher._deleted
    try:
        searcher._deleted = np.array([42], dtype=np.int64)
        assert searcher.term_vectors([42]).count() == 0
        assert searcher.term_vectors([3, 42]).select("docID").distinct().count() == 1
    finally:
        searcher._deleted = old


def test_mlt_vector_path_equals_text_path(spark, tv_index):
    searcher, _, contents = tv_index
    for doc in (7, 55):
        assert searcher.mlt_terms_for_doc(doc) == searcher.mlt_terms(contents[doc])
    a = searcher.more_like_this_doc(7, k=10).collect()
    b = searcher.more_like_this(contents[7], k=10).collect()
    assert [(r.docID, r.score) for r in a] == [(r.docID, r.score) for r in b]


def test_term_vector_requires_flag(spark, built_index):
    _, _, searcher = built_index
    with pytest.raises(ValueError, match="store_term_vectors"):
        searcher.term_vector(0)


def test_termvectors_layout_is_docid_ascending(spark, tv_index):
    searcher, _, _ = tv_index
    import pyarrow.parquet as pq

    d = os.path.join(searcher.index_dir, "termvectors")
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert files
    for f in files:
        col = pq.read_table(os.path.join(d, f), columns=["docID"])["docID"]
        arr = col.to_numpy()
        assert (np.diff(arr) >= 0).all(), f
