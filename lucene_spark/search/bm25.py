"""BM25 scoring kernel, float32-exact vs Lucene's BM25Similarity.

Behavioral reference: lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java
  - idf:        :102-104   log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))
  - avgdl:      :107-109   sumTotalTermFreq / (double) docCount, cast to float
  - norm cache: :181-186   cache[i] = 1f/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))
  - score:      :221-238   weight - weight/(1 + freq*normInverse), all float32
  - weight:     boost * idf (float32)

Multi-term combination (BooleanQuery SHOULD/MUST sum):
  per-term float32 scores are accumulated in DOUBLE then cast to float
  (ConjunctionScorer.java:57-63, DisjunctionSumScorer.java:40-46) — a sum
  of a few float32 values in float64 is exact, so term order is irrelevant.

All functions are numpy-vectorized; they run inside Arrow-batched pandas
UDFs on executors and on the driver for planning.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(doc_freq: np.ndarray | int, doc_count: int) -> np.ndarray:
    """Float32 idf per BM25Similarity.java:102-104 (computed in double,
    cast to float — exactly as Java's (float) Math.log(...))."""
    df = np.asarray(doc_freq, dtype=np.float64)
    return np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)).astype(np.float32)


def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_inverse_cache(
    avg_dl: np.float32, k1: np.float32 = K1, b: np.float32 = B
) -> np.ndarray:
    """The 256-float cache from BM25Similarity.java:181-186, float32 ops."""
    one = np.float32(1.0)
    # k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl) evaluated in float32;
    # k1 == 0 yields +inf entries, matching Java float semantics (score
    # then saturates to the term weight).
    with np.errstate(divide="ignore"):
        inner = (one - b) + (b * LENGTH_TABLE) / np.float32(avg_dl)
        return (one / (k1 * inner)).astype(np.float32)


def score_term(
    freq: np.ndarray,
    norm_bytes: np.ndarray,
    weight: np.float32,
    cache: np.ndarray,
) -> np.ndarray:
    """score = weight - weight/(1 + freq * cache[norm]) in float32
    (BM25Similarity.java:221-238)."""
    freq = np.asarray(freq, dtype=np.float32)
    norm_inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    w = np.float32(weight)
    with np.errstate(invalid="ignore"):
        return (w - w / (np.float32(1.0) + freq * norm_inv)).astype(np.float32)


def compute_norm(length: np.ndarray | int) -> np.ndarray:
    """Index-time norm byte: SmallFloat.intToByte4(length - numOverlap);
    our analyzer emits no overlaps so norm = intToByte4(#tokens)
    (Similarity.java:153-163)."""
    return int_to_byte4(length)


@dataclass(frozen=True)
class BM25Scorer:
    """Per-query scorer state: weights + shared norm-inverse cache."""

    doc_count: int
    avg_dl: float
    cache: np.ndarray  # float32[256]
    # stored as the NOMINAL double-precision parameters (1.2 / 0.75, not
    # float(np.float32(1.2)) == 1.2000000476...): every float32 consumer
    # casts through np.float32 first (identical value), while the
    # double-precision paths (explain, gate duels) need the exact
    # doubles the SQL oracles use
    k1: float = 1.2
    b: float = 0.75

    @classmethod
    def build(
        cls, doc_count: int, sum_total_term_freq: int,
        k1: float = 1.2, b: float = 0.75,
    ) -> "BM25Scorer":
        a = avgdl(sum_total_term_freq, doc_count)
        return cls(
            doc_count=doc_count,
            avg_dl=float(a),
            cache=norm_inverse_cache(a, np.float32(k1), np.float32(b)),
            k1=k1,
            b=b,
        )

    def term_weight(self, doc_freq: int, boost: float = 1.0) -> np.float32:
        return np.float32(boost) * idf(doc_freq, self.doc_count)

    def score(
        self, freq: np.ndarray, norm_bytes: np.ndarray, doc_freq: int,
        boost: float = 1.0,
    ) -> np.ndarray:
        return score_term(
            freq, norm_bytes, self.term_weight(doc_freq, boost), self.cache
        )

    def max_term_score(self, doc_freq: int, max_tf: int, min_norm_byte: int) -> float:
        """Safe upper bound for block-max pruning: score at the block's max
        tf with its smallest norm byte (norm cache is non-increasing in the
        decoded length, so the smallest length byte gives the largest
        normInverse). Mirrors the impact upper bounds of
        Lucene104PostingsWriter.java:389-540 / MaxScoreCache.java:59-102."""
        w = self.term_weight(doc_freq)
        inv = self.cache[int(min_norm_byte) & 0xFF]
        return float(w - w / (np.float32(1.0) + np.float32(max_tf) * inv))
