"""Hybrid retrieval: reciprocal-rank fusion of scored legs.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009 — the fusion Elasticsearch
and OpenSearch ship for BM25+kNN hybrid queries): a document's fused
score is sum over legs of 1 / (rrf_k + rank), rank starting at 1 within
each leg. Fusion consumes RANKS only, and every leg ranks with the
engine-wide deterministic tie-break (score DESC, docID ASC), so the
fused score is an exact double-precision closed form regardless of each
leg's internal score precision — which is what makes the hybrid gate
oracle-duelable while the BM25 leg itself scores in float32.

Pairs with IndexSearcher.knn_search / search_ivf (the vector leg;
KnnFloatVectorQuery.java:48 analog) via IndexSearcher.search_hybrid.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    legs: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "docID",
    score_col: str = "score",
) -> DataFrame:
    """Fuse pre-truncated scored legs (each: id_col + score_col, at most
    a few hundred rows — callers bound them with their own top-n) into
    RRF top-k. The rank window is intentionally unpartitioned: each leg
    is already a bounded candidate list, so the single-partition sort is
    O(n_candidates), not a scale risk."""
    ranked = []
    for leg in legs:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(
            leg.select(id_col, F.col(score_col))
            .withColumn("r", F.row_number().over(w))
            .select(
                id_col,
                (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("r"))).alias("c"),
            )
        )
    allc = reduce(lambda a, b: a.unionByName(b), ranked)
    return (
        allc.groupBy(id_col)
        .agg(F.sum("c").alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )
