"""Benchmark decontamination — n-gram overlap against an eval set.

Before training, corpora are checked for contamination: documents
sharing long token n-grams with evaluation benchmarks are flagged or
dropped (the GPT-3/PaLM 13-gram protocol). No reference analog; part of
the training-data surface.

Scale shape: the eval set is tiny relative to the corpus (benchmarks are
MBs against 100 TB), so its distinct shingle-hash set BROADCASTS; the
corpus side is a map-only shingle pass + a broadcast semi-join + one
groupBy per doc — the corpus never shuffles by shingle. Shingles compare
as xxhash64 of the space-joined token window (64-bit collisions are
negligible at benchmark scale and keep the broadcast compact).

Reuses pipeline.dedup's shingle machinery (same tokenizer as the DuckDB
oracles, guarded against the descending-sequence n<k trap).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import shingles_df


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, sh) distinct n-gram xxhash64 per row — JVM-side throughout."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    sh = shingles_df(base, k=n, id_col="id")
    return sh.select("id", F.xxhash64("shingle").alias("sh"))


def contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Per-corpus-doc contamination report: (id_col, n_shingles,
    n_overlap, overlap_frac) for every doc sharing at least one token
    n-gram with the eval set. n_shingles counts the doc's DISTINCT
    shingles; overlap_frac = n_overlap / n_shingles."""
    ev = (
        _shingle_hashes(eval_set, id_col, eval_text_col or text_col, n)
        .select("sh")
        .distinct()
    )
    doc_sh = _shingle_hashes(corpus, id_col, text_col, n)
    totals = doc_sh.groupBy("id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    hits = (
        doc_sh.join(F.broadcast(ev), "sh")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return hits.join(totals, "id").select(
        F.col("id").alias(id_col),
        "n_shingles",
        "n_overlap",
        (F.col("n_overlap") / F.col("n_shingles")).alias("overlap_frac"),
    )
