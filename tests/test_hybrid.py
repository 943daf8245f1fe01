"""Vector search as a searcher citizen: knn_search / search_ivf respect
tombstones (KnnFloatVectorQuery + liveDocs), and search_hybrid fuses the
BM25 and vector legs with exact reciprocal-rank-fusion arithmetic."""
import shutil

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _vec(i: int, dim: int = 8) -> list[float]:
    """Deterministic embedding for docID i: unit-ish vector rotating
    through the dims so cosine-to-query ordering is closed-form."""
    rng = np.random.RandomState(1000 + i)
    v = rng.rand(dim) - 0.5
    v[i % dim] += 2.0  # dominant axis -> distinct, stable ordering
    return [float(x) for x in v]


@pytest.fixture(scope="module")
def hybrid_setup(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(12):
        body = f"{words[i % 6]} common shared {words[(i + 1) % 6]}"
        rows.append(
            Row(repo="r", path=f"{i:04d}", commit="0", lang="en", content=body)
        )
    docs = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("hyb") / "idx")
    build_index(spark, docs, out, partitions=2)
    s = IndexSearcher(spark, out)
    vecs = spark.createDataFrame(
        [Row(docID=i, embedding=_vec(i)) for i in range(12)]
    )
    yield s, vecs, out
    shutil.rmtree(out, ignore_errors=True)


def _brute_topk(q, ids, k=5, exclude=()):
    scores = []
    for i in ids:
        if i in exclude:
            continue
        v = np.asarray(_vec(i), dtype=np.float64)
        qd = np.asarray(q, dtype=np.float64)
        scores.append((float(v @ qd / (np.linalg.norm(v) * np.linalg.norm(qd))), i))
    scores.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in scores[:k]]


def test_knn_search_matches_numpy(hybrid_setup):
    s, vecs, _ = hybrid_setup
    q = _vec(3)
    got = [r["docID"] for r in s.knn_search(vecs, q, k=5).collect()]
    assert got == _brute_topk(q, range(12), k=5)


def test_knn_search_drops_tombstones(hybrid_setup, spark):
    from lucene_spark.index.deletes import delete_by_keys

    s, vecs, out = hybrid_setup
    q = _vec(3)
    top1 = _brute_topk(q, range(12), k=1)[0]  # = docID 3 (self-match)
    assert delete_by_keys(spark, out, [("r", f"{top1:04d}")]) == 1
    s.reload_deletes()
    try:
        got = [r["docID"] for r in s.knn_search(vecs, q, k=5).collect()]
        assert top1 not in got
        assert got == _brute_topk(q, range(12), k=5, exclude={top1})
    finally:
        shutil.rmtree(f"{out}/deletes", ignore_errors=True)
        s.reload_deletes()


def test_search_ivf_tombstone_aware(hybrid_setup, spark, tmp_path):
    from lucene_spark.index.deletes import delete_by_keys
    from lucene_spark.pipeline.ann import build_ivf_index

    s, vecs, out = hybrid_setup
    ivf_dir = str(tmp_path / "ivf")
    build_ivf_index(spark, vecs, ivf_dir, n_cells=2, id_col="docID")
    q = _vec(3)
    got = [r["docID"] for r in s.search_ivf(ivf_dir, q, k=3, nprobe=2).collect()]
    # nprobe == n_cells -> exhaustive: must equal brute force
    assert got == _brute_topk(q, range(12), k=3)
    top1 = got[0]
    assert delete_by_keys(spark, out, [("r", f"{top1:04d}")]) == 1
    s.reload_deletes()
    try:
        got2 = [r["docID"] for r in s.search_ivf(ivf_dir, q, k=3, nprobe=2).collect()]
        assert top1 not in got2
        assert got2 == _brute_topk(q, range(12), k=3, exclude={top1})
    finally:
        shutil.rmtree(f"{out}/deletes", ignore_errors=True)
        s.reload_deletes()


def test_search_hybrid_rrf_exact(hybrid_setup):
    """Fused score must equal the closed form sum(1/(60+rank)) computed
    from the two legs' own deterministic rankings."""
    s, vecs, _ = hybrid_setup
    q = _vec(0)
    n_cand = 8
    bm = s.search("alpha common", k=n_cand, mode="or").collect()
    bm_rank = {r["docID"]: i + 1 for i, r in enumerate(bm)}
    kn = s.knn_search(vecs, q, k=n_cand).collect()
    kn_rank = {r["docID"]: i + 1 for i, r in enumerate(kn)}
    want = {}
    for d, r in bm_rank.items():
        want[d] = want.get(d, 0.0) + 1.0 / (60 + r)
    for d, r in kn_rank.items():
        want[d] = want.get(d, 0.0) + 1.0 / (60 + r)
    top = sorted(want.items(), key=lambda t: (-t[1], t[0]))[:5]
    got = s.search_hybrid(
        "alpha common", q, vectors=vecs, k=5, n_candidates=n_cand
    ).collect()
    assert [r["docID"] for r in got] == [d for d, _ in top]
    for r, (_, sc) in zip(got, top):
        assert abs(r["score"] - sc) < 1e-12


def test_search_hybrid_respects_deletes(hybrid_setup, spark):
    from lucene_spark.index.deletes import delete_by_keys

    s, vecs, out = hybrid_setup
    q = _vec(0)
    base = [r["docID"] for r in s.search_hybrid(
        "alpha common", q, vectors=vecs, k=5, n_candidates=8
    ).collect()]
    victim = base[0]
    assert delete_by_keys(spark, out, [("r", f"{victim:04d}")]) == 1
    s.reload_deletes()
    try:
        got = [r["docID"] for r in s.search_hybrid(
            "alpha common", q, vectors=vecs, k=5, n_candidates=8
        ).collect()]
        assert victim not in got
    finally:
        shutil.rmtree(f"{out}/deletes", ignore_errors=True)
        s.reload_deletes()
