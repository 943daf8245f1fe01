"""BM25 property tests per the reference's randomized similarity contract
(lucene/test-framework/.../similarities/BaseSimilarityTestCase.java:256-477
 and TestBM25Similarity.java:24-130)."""

import math

import numpy as np
import pytest

from lucene_spark.search.bm25 import (
    BM25Scorer,
    K1,
    B,
    avgdl,
    idf,
    norm_inverse_cache,
    score_term,
)
from lucene_spark.util.smallfloat import int_to_byte4


def test_idf_formula():
    # BM25Similarity.java:102-104 computed in double, cast to float32
    for df, n in [(1, 1), (1, 100), (50, 100), (100, 100), (3, 7)]:
        expected = np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5)))
        assert idf(df, n) == expected
    # df == docCount still gives positive idf (the +1 inside the log)
    assert idf(100, 100) > 0


def test_avgdl_formula():
    assert avgdl(1000, 100) == np.float32(10.0)
    assert avgdl(7, 3) == np.float32(7 / 3)


@pytest.mark.parametrize("k1", [0.0, 1.2, 8.0])
@pytest.mark.parametrize("b", [0.0, 0.75, 1.0])
def test_score_properties(k1, b):
    rng = np.random.default_rng(42)
    doc_count, sttf = 10_000, 1_234_567
    cache = norm_inverse_cache(
        avgdl(sttf, doc_count), np.float32(k1), np.float32(b)
    )
    w = np.float32(idf(37, doc_count))
    freqs = rng.integers(1, 2**15, size=500).astype(np.float32)
    norms = rng.integers(0, 256, size=500)
    scores = score_term(freqs, norms, w, cache)
    assert np.isfinite(scores).all()
    assert (scores >= 0).all()
    # bounded by the weight (score -> weight as freq -> inf)
    assert (scores <= w).all()
    # monotone non-decreasing in freq at fixed norm
    f = np.arange(1, 1000, dtype=np.float32)
    s = score_term(f, np.full(f.shape, 17), w, cache)
    assert (np.diff(s) >= 0).all()
    # monotone non-increasing in encoded length at fixed freq
    s2 = score_term(np.full(256, 5, dtype=np.float32), np.arange(256), w, cache)
    assert (np.diff(s2) <= 0).all()


def test_score_float32_shape():
    # the kernel must produce float32 with Lucene's exact expression shape:
    # w - w / (1 + freq * cache[norm])  (BM25Similarity.java:221-238)
    scorer = BM25Scorer.build(doc_count=1000, sum_total_term_freq=25_000)
    freq = np.array([3.0], dtype=np.float32)
    norm = int_to_byte4(np.array([25]))
    got = scorer.score(freq, norm, doc_freq=10)
    w = np.float32(idf(10, 1000))
    inv = scorer.cache[int(norm[0])]
    exp = np.float32(w - w / (np.float32(1.0) + np.float32(3.0) * inv))
    assert got.dtype == np.float32
    assert got[0] == exp


def test_norm_cache_against_double_reference():
    # cache entries within float32 rounding of the double-precision formula
    scorer = BM25Scorer.build(doc_count=500, sum_total_term_freq=60_000)
    from lucene_spark.util.smallfloat import LENGTH_TABLE

    a = float(np.float32(60_000 / 500))
    for i in [0, 1, 39, 40, 128, 255]:
        ref = 1.0 / (float(K1) * ((1 - float(B)) + float(B) * float(LENGTH_TABLE[i]) / a))
        assert scorer.cache[i] == pytest.approx(ref, rel=1e-6)


def test_max_term_score_is_upper_bound():
    scorer = BM25Scorer.build(doc_count=10_000, sum_total_term_freq=900_000)
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 100, size=300)
    norms = int_to_byte4(rng.integers(1, 5000, size=300))
    scores = scorer.score(tfs.astype(np.float32), norms, doc_freq=123)
    bound = scorer.max_term_score(
        doc_freq=123, max_tf=int(tfs.max()), min_norm_byte=int(norms.min())
    )
    assert scores.max() <= bound + 1e-9


def test_multi_term_sum_is_double_then_float():
    # ConjunctionScorer.java:57-63: sum in double, cast to float
    s1 = np.array([0.1234567], dtype=np.float32)
    s2 = np.array([7.654321], dtype=np.float32)
    total = (s1.astype(np.float64) + s2.astype(np.float64)).astype(np.float32)
    # order-insensitive
    total_rev = (s2.astype(np.float64) + s1.astype(np.float64)).astype(np.float32)
    assert total == total_rev
