"""Hierarchical (taxonomy) facets — FastTaxonomyFacetCounts analog.

The reference's taxonomy facets (lucene/facet/src/java/org/apache/lucene/
facet/taxonomy/FastTaxonomyFacetCounts.java:40) count, over the docs
matching a query, every ordinal in a category TREE ("Publish Date/2010/
October"), then answer drill-down questions (children counts under a
path prefix) from the per-ordinal counts.

Spark-first translation: the category tree is a `/`-separated path
column; counting every ordinal = exploding each doc's path into all of
its prefixes (one JVM-side array expression, no UDF) and one groupBy —
a single shuffle of (depth x matching docs) tiny rows. Drill-down =
a pushed-down startswith filter plus a groupBy on the next component.
Both are plain aggregations Catalyst handles at any scale; there is no
taxonomy-ordinal side index to maintain because parquet column stats +
the startswith pushdown play that role.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _parts(path_col: str | Column) -> Column:
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.split(c, "/")


def taxonomy_counts(
    docs: DataFrame, path_col: str | Column = "path", max_depth: int = 2
) -> DataFrame:
    """Counts for EVERY taxonomy ordinal up to max_depth — the
    FacetsCollector + FastTaxonomyFacetCounts aggregation: each doc
    contributes one count to each of its path prefixes ("a/b/c" counts
    toward "a", "a/b", "a/b/c"). Returns (path, cnt). Paths shallower
    than max_depth contribute only their existing prefixes."""
    parts = _parts(path_col)
    prefixes = F.filter(
        F.array(
            *[
                F.when(
                    F.size(parts) > depth,
                    F.concat_ws(
                        "/",
                        *[
                            F.element_at(parts, j + 1)
                            for j in range(depth + 1)
                        ],
                    ),
                )
                for depth in range(max_depth)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        docs.select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def taxonomy_top_children(
    docs: DataFrame,
    path_col: str | Column = "path",
    drill: tuple[str, ...] | list[str] = (),
    k: int | None = None,
) -> DataFrame:
    """getTopChildren(dim, path...) analog: among docs whose path starts
    with the ``drill`` components, counts of the NEXT path component,
    ordered cnt DESC then child ASC (Lucene orders children by count).
    The drill filter is a startswith-style conjunction of component
    equalities — each one a pushable predicate. Returns (child, cnt)."""
    parts = _parts(path_col)
    df = docs
    for i, comp in enumerate(drill):
        df = df.filter(F.element_at(parts, i + 1) == comp)
    child = F.element_at(parts, len(drill) + 1)
    out = (
        df.select(child.alias("child"))
        .where(F.col("child").isNotNull())
        .groupBy("child")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("child"))
    )
    return out.limit(k) if k is not None else out


def association_sum(
    docs: DataFrame,
    dim_col: str | Column,
    value_col: str | Column,
) -> DataFrame:
    """Facet associations — TaxonomyFacetIntAssociations /
    TaxonomyFacetFloatAssociations analog (reference lucene/facet/src/
    java/org/apache/lucene/facet/taxonomy/TaxonomyFacetIntAssociations.java:34):
    instead of counting matching docs per category, SUM a per-doc
    association value (the IntAssociationFacetField payload) per
    category. One partial-aggregated groupBy — the association payload
    Lucene packs into a BinaryDocValues field is just a column here.
    Returns (dim, assoc_sum)."""
    d = F.col(dim_col) if isinstance(dim_col, str) else dim_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        docs.select(d.alias("dim"), v.alias("v"))
        .groupBy("dim")
        .agg(F.sum("v").alias("assoc_sum"))
    )


def numeric_docvalues_stats(
    docs: DataFrame, value_col: str | Column
) -> DataFrame:
    """Numeric DocValues statistics over a match set —
    DocValuesStats/DocValuesStatsCollector analog (reference lucene/misc/
    src/java/org/apache/lucene/misc/search/DocValuesStats.java:82-137):
    count, min, max, sum, mean, variance (POPULATION — the reference
    divides its Welford accumulator by count), stdev. One partial-
    aggregated job; the reference's per-segment collector loop is a
    groupBy-less global aggregate here. Returns a single row."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return docs.select(v.alias("v")).agg(
        F.count("v").cast("long").alias("cnt"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("v").alias("vsum"),
        F.avg("v").alias("mean"),
        F.var_pop("v").alias("variance"),
        F.stddev_pop("v").alias("stdev"),
    )


def sampled_facet_counts(
    matches: DataFrame,
    dim_col: str | Column,
    sample_size: int,
    key_col: str | Column,
    dim_totals: DataFrame | None = None,
    total_hits: int | None = None,
) -> DataFrame:
    """Sampled facet counts — RandomSamplingFacetsCollector +
    amortizeFacetCounts analog (reference lucene/facet/src/java/org/
    apache/lucene/facet/RandomSamplingFacetsCollector.java:118-137
    sampling-rate derivation, :164-200 one-doc-per-bin sample, :amortize
    correctedCount = min(docFreq, count / samplingRate)).

    When the match set has no more than ``sample_size`` hits, counts
    are exact (the reference's totalHits <= sampleSize branch).
    Otherwise a samplingRate = sample_size/totalHits subset is drawn
    and per-dim counts are amortized by 1/rate, capped by ``dim_totals``
    (a (dim, max) frame — the reader.docFreq cap; per-dim corpus totals).

    Documented deviation: the reference draws ONE doc per size-1/rate
    bin with an XORShift64 RNG (stratified, seed-dependent); we draw a
    deterministic Bernoulli(rate) subset with the md5 device shared
    with pipeline.sample.hash_sample — same expectation, and the subset
    is reproducible across runs, engines, and partitionings, which is
    what makes the result oracle-duelable at all. Scale shape: one
    count (or the df statistic) + one map-only filter + one partial-
    aggregated groupBy; nothing keyed by the sample.
    """
    if sample_size <= 0:
        raise ValueError("sample_size must be positive")
    dim = (F.col(dim_col) if isinstance(dim_col, str) else dim_col).alias(
        "dim"
    )
    total = matches.count() if total_hits is None else int(total_hits)
    if total <= sample_size:
        out = matches.groupBy(dim).agg(
            F.count("*").cast("long").alias("cnt")
        )
        if dim_totals is not None:
            out = (
                out.join(F.broadcast(dim_totals), "dim", "left")
                .withColumn(
                    "cnt",
                    F.least(
                        F.col("cnt"),
                        F.coalesce(F.col("max"), F.col("cnt")),
                    ),
                )
            )
        return out.select("dim", "cnt")
    rate = float(sample_size) / float(total)
    from lucene_spark.pipeline.sample import hash_sample

    sampled = hash_sample(matches, rate, key_col)
    out = sampled.groupBy(dim).agg(F.count("*").alias("c")).withColumn(
        "cnt",
        F.floor(F.col("c").cast("double") / F.lit(rate)).cast("long"),
    )
    if dim_totals is not None:
        out = out.join(F.broadcast(dim_totals), "dim", "left").withColumn(
            "cnt",
            F.least(F.col("cnt"), F.coalesce(F.col("max"), F.col("cnt"))),
        )
    return out.select("dim", "cnt")
