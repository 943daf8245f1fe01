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


def _tune_allocator() -> None:
    """Keep large malloc blocks on the reusable heap.

    glibc returns every freed >=128KB block straight to the OS
    (mmap/munmap), so each large numpy/Arrow temporary repays its page
    faults on EVERY kernel invocation. On this host that measured
    0.1 GB/s for a fresh-allocation 500MB memcpy vs 7.9 GB/s once the
    pages are reused — page-fault service, not memory bandwidth, was the
    dominant cost of every Arrow-batched kernel (invert, decode,
    matchers). Raising the malloc mmap and trim thresholds makes the
    heap retain and reuse those pages. Runs in every process that
    imports the package: the driver AND each pyspark worker (kernels
    import lucene_spark modules).
    """
    import ctypes
    import os
    import sys

    if not sys.platform.startswith("linux"):
        return
    # A/B escape hatch (inherited by pyspark workers, which fork from the
    # driver-side daemon): lets benchmarks attribute regressions to the
    # allocator tuning without a code checkout switch
    if os.environ.get("SPARK_GRAFT_NO_MALLOC_TUNE"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: 1 GB
        libc.mallopt(-1, 1 << 29)  # M_TRIM_THRESHOLD: 512 MB
    except Exception:
        pass


_tune_allocator()
