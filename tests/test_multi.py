"""Multi-index (sharded) search — MultiReader + TopDocs.merge
(index/MultiReader.java:33, search/TopDocs.java:203-231).

The corpus is split into contiguous docID-order shards, each built as a
complete standalone index; MultiIndexSearcher must be RANK-IDENTICAL
(scores and docIDs) to the single index / numpy oracle because it
scores with global statistics and offsets shard docIDs by docBase."""

import os

import pytest

from lucene_spark.oracle import assert_rank_identical

TERMS = ["getvalue0", "var0", "baz"]


def _collect(df):
    return [(int(r["docID"]), float(r["score"])) for r in df.collect()]


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    from lucene_spark.corpus import generate_corpus
    from lucene_spark.index.builder import build_index

    n, n_shards = 300, 3
    pdf = (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    base = tmp_path_factory.mktemp("shards")
    dirs = []
    per = n // n_shards
    for i in range(n_shards):
        part = pdf.iloc[i * per : (i + 1) * per]
        d = str(base / f"idx{i}")
        build_index(spark, spark.createDataFrame(part), d, partitions=4)
        dirs.append(d)
    from lucene_spark.oracle import OracleIndex

    oracle = OracleIndex(pdf["content"].tolist())
    yield dirs, oracle


def test_multi_rank_identical_to_oracle(spark, shards):
    from lucene_spark.search.multi import MultiIndexSearcher

    dirs, oracle = shards
    ms = MultiIndexSearcher(spark, dirs)
    assert ms.doc_count == oracle.doc_count
    assert ms.sum_total_term_freq == oracle.sum_total_term_freq
    for mode in ("or", "and"):
        got = _collect(ms.search(TERMS, k=10, mode=mode))
        exp = oracle.search(TERMS, k=10, mode=mode)
        assert_rank_identical(exp, got, msg=f"multi {mode}")


def test_multi_global_df(spark, shards):
    from lucene_spark.search.multi import MultiIndexSearcher

    dirs, oracle = shards
    ms = MultiIndexSearcher(spark, dirs)
    dfs = ms.term_stats(TERMS)
    for t in TERMS:
        assert dfs[t] == len(oracle.postings[t][0])


def test_multi_missing_and_empty(spark, shards):
    from lucene_spark.search.multi import MultiIndexSearcher

    dirs, _ = shards
    ms = MultiIndexSearcher(spark, dirs)
    assert ms.search(["zzznope"], k=5).count() == 0
    # AND with a globally-absent term matches nothing
    assert ms.search(["getvalue0", "zzznope"], k=5, mode="and").count() == 0


def test_multi_refuses_mixed_analysis(spark, shards, tmp_path):
    """A stemmed shard and a raw shard cannot be searched together —
    the same guard class as add_indexes' store_offsets refusal."""
    from lucene_spark.corpus import generate_corpus
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.multi import MultiIndexSearcher

    dirs, _ = shards
    stem = str(tmp_path / "stem_idx")
    pdf = generate_corpus(40)
    build_index(
        spark, spark.createDataFrame(pdf), stem, partitions=2,
        token_filters=("porter",),
    )
    with pytest.raises(ValueError, match="disagree"):
        MultiIndexSearcher(spark, [dirs[0], stem])


def test_multi_count(spark, shards):
    from lucene_spark.search.multi import MultiIndexSearcher

    dirs, oracle = shards
    ms = MultiIndexSearcher(spark, dirs)
    assert ms.count("getvalue0") == len(oracle.postings["getvalue0"][0])


def test_multi_respects_shard_tombstones(spark, shards, tmp_path):
    """Deleting a doc in ONE shard removes it from the merged result;
    global stats still come from the manifests (Lucene's deleted docs
    also stay in collection stats until merge)."""
    import shutil

    from lucene_spark.index.deletes import delete_by_keys
    from lucene_spark.search.engine import IndexSearcher
    from lucene_spark.search.multi import MultiIndexSearcher

    dirs, oracle = shards
    # copy shard 0 so the module fixture stays pristine
    d0 = str(tmp_path / "idx0_del")
    shutil.copytree(dirs[0], d0)
    # victim: shard 0's own best hit (shard 0 has docBase 0, so its
    # local docID IS the merged docID)
    s0 = IndexSearcher(spark, d0)
    victim_docid = int(s0.search(["getvalue0"], k=1).head()["docID"])
    ms_before = MultiIndexSearcher(spark, dirs)
    before = _collect(ms_before.search(["getvalue0"], k=10**3))
    assert victim_docid in [d for d, _ in before]
    row = s0.docmap.where(f"docID = {victim_docid}").select("repo", "path").head()
    assert row is not None
    assert delete_by_keys(spark, d0, [(row["repo"], row["path"])]) == 1
    ms = MultiIndexSearcher(spark, [d0] + list(dirs[1:]))
    got = _collect(ms.search(["getvalue0"], k=5))
    assert victim_docid not in [d for d, _ in got]
