"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship BM25 top-k over /root/testdata/sf0.001 documents
queries()     -> operator coverage per SURVEY.md §2 (engine-backed where
                 SQL-expressible, see lucene_spark/gate.py)
oracle_sql()  -> DuckDB equivalents hash-compared by the driver
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001 documents and run a
    multi-term BM25 top-10 with block-max pruning (Lucene float32 path)."""
    from lucene_spark import gate

    return gate.q_lucene_bm25_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucene_spark import gate

    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    from lucene_spark import gate

    return gate.oracle_sql()
