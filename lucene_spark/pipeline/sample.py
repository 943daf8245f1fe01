"""Deterministic corpus sampling — per-domain caps and hash sampling.

Large-scale training-data pipelines (C4, RefinedWeb, Gopher) bound the
contribution of any single domain/source ("domain capping") and draw
reproducible subsamples by content hash rather than RNG, so a re-run —
or a different cluster size — selects the SAME rows. Both operators
here are pure Catalyst (no UDFs) and fully deterministic, which also
makes them oracle-duelable in SQL.

No reference-engine counterpart (the reference is a search library);
these belong to the data-pipeline surface this engine adds on top.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    order_cols: list[str | Column],
    salt: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per key, the first ``cap`` in
    ``order_cols`` order (pass a deterministic order — e.g. a content
    hash plus a unique id — so the sample is stable across runs and
    cluster sizes).

    Scale shape: ONE window shuffle keyed by ``key_col``. A web-scale
    corpus has pathological domains (one host = 10^8 pages) that land on
    a single reducer; for those pass ``salt=S`` to run two stages —
    stage 1 ranks within (key, salt) partitions and keeps ``cap`` per
    salt (the overall first ``cap`` per key is necessarily a subset of
    the union, since each row's global rank >= its salt-local rank), so
    stage 2's window sees at most cap*S rows per key instead of the full
    domain. Result is identical with or without salting."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if salt is not None and salt > 1:
        skey = F.abs(F.hash(*order)) % salt
        w1 = Window.partitionBy(F.col(key_col), skey).orderBy(*order)
        df = (
            df.withColumn("_srn", F.row_number().over(w1))
            .filter(F.col("_srn") <= cap)
            .drop("_srn")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str | Column
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5(key) 32-bit
    hex prefix falls below ``fraction`` of the hash space. Reproducible
    across runs, engines, and partitionings (unlike DataFrame.sample,
    whose selection depends on the split layout); the same row is kept
    or dropped in every re-run, which is what makes ablation subsets and
    incremental re-processing consistent. Map-only — no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    thresh = format(min(int(fraction * 16**8), 16**8 - 1), "08x")
    pref = F.substring(F.md5(c.cast("binary")), 1, 8)
    return df.where(pref <= F.lit(thresh)) if fraction >= 1.0 else df.where(
        pref < F.lit(thresh)
    )


def weighted_mix(
    df: DataFrame,
    factors: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    default: float = 1.0,
) -> DataFrame:
    """Deterministic mixture resampling — the training-data "mixture
    weights" operator (the GPT-3/Pile/Dolma recipe: each source is up- or
    down-sampled by a per-source factor before concatenation).

    ``factors[source] = f`` means every row of that source appears
    floor(f) times for sure, plus once more with probability frac(f),
    decided by the SAME md5 device as hash_sample, salted by the copy
    ordinal — so f=0.25 keeps a deterministic quarter of the source,
    f=2.5 emits 2 copies of every row and a third copy for a
    deterministic half... reproducible across runs, engines, and
    partitionings. Output adds an ``epoch`` column (0-based copy
    ordinal: downstream shuffles/training loops can tell repeats apart,
    and (key, epoch) stays unique).

    Scale shape: map-only — a per-row factor lookup (one small literal
    map), an explode over sequence(0, ceil(f)-1) (bounded by max factor),
    and the hash filter; no shuffle, no driver collection. SQL-portable
    end-to-end, hence oracle-duelable."""
    if any(f < 0 for f in factors.values()):
        raise ValueError("factors must be >= 0")
    if default < 0:
        raise ValueError("default must be >= 0")
    fmap = F.create_map(
        *[F.lit(x) for k, f in factors.items() for x in (k, float(f))]
    )
    fac = F.coalesce(fmap[F.col(group_col)], F.lit(float(default)))
    n_full = F.floor(fac).cast("long")
    frac = fac - F.floor(fac)
    # copies 0..floor(f)-1 are unconditional; copy floor(f) keeps when
    # md5(key || ':' || epoch) < frac of the 32-bit hex space
    epochs = F.sequence(F.lit(0).cast("long"), n_full)  # inclusive
    out = df.withColumn("_fac", fac).withColumn(
        "epoch", F.explode(epochs)
    )
    key = F.concat(
        F.col(key_col).cast("string"), F.lit(":"), F.col("epoch").cast("string")
    )
    pref = F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast(
        "double"
    )
    keep_frac = pref < (F.col("_fac") - F.floor(F.col("_fac"))) * float(16**8)
    return out.where(
        (F.col("epoch") < F.floor(F.col("_fac"))) | keep_frac
    ).drop("_fac")
