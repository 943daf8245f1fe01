"""lucene_spark — a PySpark-native full-text inverted-index + BM25 engine.

Built from scratch against the behavior of Apache Lucene (reference at
/root/reference): StandardAnalyzer-style tokenization, SmallFloat byte4
norms, delta+varbyte-compressed posting blocks with block-max impact
metadata, and BM25 (k1=1.2, b=0.75) top-k scoring rank-identical to
Lucene's BM25Similarity.

Architecture is Spark-first: DataFrame ops + Arrow-vectorized pandas UDFs;
no per-row Python in hot paths, no port of Lucene's Java execution engine.
"""

__version__ = "0.1.0"
