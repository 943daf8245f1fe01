"""Similarity search over embedding columns.

Three strategies, scale-ordered:
  - brute-force cosine top-k (gate.q_cosine_top10): the correctness
    baseline — one pass, TakeOrderedAndProject
  - blocked exact all-pairs (emb_near_dup_pairs): Arrow-packed tile
    cross-join + numpy matmul per tile pair — the distributed
    block-nested-loop that stays exact at any scale (tiles stream through
    executors; nothing ever collects to the driver)
  - IVF approximate top-k (ann_ivf_topk): deterministic k-means-style
    coarse quantizer, probe the nearest `nprobe` cells, exact re-rank
    within probed cells — the 10^9-vector path
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_TILE_SCHEMA = StructType(
    [
        StructField("tile", IntegerType()),
        StructField("ids", BinaryType()),
        StructField("mat", BinaryType()),
        StructField("n", IntegerType()),
    ]
)


def _pack_tiles(emb: DataFrame, num_tiles: int, id_col: str, vec_col: str) -> DataFrame:
    """Pack embeddings into per-tile (ids, row-major float32 matrix) blobs
    — one Arrow row per tile, matmul-ready."""

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
        # normalize rows once so every later dot product IS cosine
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        return pd.DataFrame(
            {
                "tile": [int(key[0])],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
                "n": [len(ids)],
            }
        )

    return (
        emb.withColumn("tile", (F.col(id_col) % num_tiles).cast("int"))
        .groupBy("tile")
        .applyInPandas(pack, schema=_TILE_SCHEMA)
    )


def emb_near_dup_pairs(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.95,
    num_tiles: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, (a, b, cos) with a < b.

    Tile x tile cross join (upper triangle) -> numpy matmul per pair of
    tiles. Work is O(n^2 d / tiles^2) per task, shuffle is O(n d) — at a
    billion vectors you shard tiles by IVF cell first; the tile kernel is
    unchanged."""
    tiles = _pack_tiles(emb, num_tiles, id_col, vec_col)
    l = tiles.alias("l")
    r = tiles.alias("r")
    pairs = l.join(r, F.col("l.tile") <= F.col("r.tile")).select(
        F.col("l.tile").alias("ta"), F.col("l.ids").alias("ids_a"),
        F.col("l.mat").alias("mat_a"), F.col("l.n").alias("na"),
        F.col("r.tile").alias("tb"), F.col("r.ids").alias("ids_b"),
        F.col("r.mat").alias("mat_b"), F.col("r.n").alias("nb"),
    )

    out_schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )
    thr = float(threshold)

    def match(batches):
        for pdf in batches:
            rows_a, rows_b, rows_c = [], [], []
            for t in pdf.itertuples():
                ia = np.frombuffer(t.ids_a, dtype=np.int64)
                ib = np.frombuffer(t.ids_b, dtype=np.int64)
                ma = np.frombuffer(t.mat_a, dtype=np.float32).reshape(t.na, -1)
                mb = np.frombuffer(t.mat_b, dtype=np.float32).reshape(t.nb, -1)
                sims = (ma @ mb.T).astype(np.float64)
                ai, bi = np.nonzero(sims >= thr)
                a_ids, b_ids = ia[ai], ib[bi]
                if t.ta == t.tb:
                    # diagonal tile: each unordered pair appears twice
                    # (and self-pairs on the diagonal) — keep a < b once
                    keep = a_ids < b_ids
                    rows_a.append(a_ids[keep])
                    rows_b.append(b_ids[keep])
                    rows_c.append(sims[ai, bi][keep])
                else:
                    # off-diagonal tile pair appears exactly once under the
                    # l.tile < r.tile join: orient (min, max), never filter
                    rows_a.append(np.minimum(a_ids, b_ids))
                    rows_b.append(np.maximum(a_ids, b_ids))
                    rows_c.append(sims[ai, bi])
            if rows_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(rows_a),
                        "b": np.concatenate(rows_b),
                        "cos": np.concatenate(rows_c),
                    }
                )

    return (
        pairs.mapInPandas(match, schema=out_schema)
        .select("a", "b", F.round("cos", round_to).alias("cos"))
    )


def ann_ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k by cosine: IVF coarse quantizer (deterministic
    Lloyd iterations seeded from evenly-strided vectors), probe the
    `nprobe` nearest cells, exact cosine re-rank inside them.

    The cell assignment is a narrow map (broadcast centroids), so the
    only shuffle is the final top-k — at 10^9 vectors the probed cells
    are partition-pruned by writing the index partitioned by cell."""
    d = int(len(query_vec))
    # deterministic init: evenly strided by id rank
    n_total = emb.count()
    stride = max(1, n_total // n_cells)
    seed_rows = (
        emb.withColumn("rk", F.col(id_col) % stride)
        .where(F.col("rk") == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in seed_rows])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)

    def assign_udf(cents_arr):
        @F.pandas_udf(IntegerType())
        def assign(v: pd.Series) -> pd.Series:
            mat = np.stack([np.asarray(x, dtype=np.float32) for x in v])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            return pd.Series(np.argmax(mat @ cents_arr.T, axis=1).astype(np.int32))

        return assign

    # Lloyd iterations (spherical k-means): assignment UDF + groupBy mean
    for _ in range(kmeans_iters):
        assigned = emb.withColumn("cell", assign_udf(cents)(F.col(vec_col)))
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        new = np.zeros_like(cents)
        for r in means:
            new[r["cell"], r["dim"]] = r["s"]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        nonzero = norms[:, 0] > 1e-30
        cents[nonzero] = (new / np.maximum(norms, 1e-30))[nonzero]

    q = np.asarray(query_vec, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-30)
    probe = np.argsort(-(cents @ q))[:nprobe].tolist()

    assigned = emb.withColumn("cell", assign_udf(cents)(F.col(vec_col)))
    cand = assigned.where(F.col("cell").isin(probe))
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != exclude_id)

    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a.cast("double") * a),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return (
        cand.select(
            F.col(id_col),
            (dot / F.greatest(nrm, F.lit(1e-30))).alias("raw"),
        )
        .orderBy(F.desc("raw"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("raw", round_to).alias("cos"))
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: train once, write vectors partitioned by cell,
# answer queries by reading only the probed cells (partition pruning).
# ---------------------------------------------------------------------------

def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    n_cells: int = 16,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train a spherical-k-means coarse quantizer (deterministic strided
    init) and write the vector table partitioned by cell; centroids go to
    centroids.json. At 10^9+ vectors this is the standard IVF layout —
    a query touches nprobe/n_cells of the data via partition pruning."""
    import json as _json
    import os as _os

    n_total = emb.count()
    stride = max(1, n_total // n_cells)
    seed_rows = (
        emb.withColumn("rk", F.col(id_col) % stride)
        .where(F.col("rk") == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in seed_rows])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)

    def assign_udf(cents_arr):
        @F.pandas_udf(IntegerType())
        def assign(v: pd.Series) -> pd.Series:
            mat = np.stack([np.asarray(x, dtype=np.float32) for x in v])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            return pd.Series(np.argmax(mat @ cents_arr.T, axis=1).astype(np.int32))

        return assign

    for _ in range(kmeans_iters):
        assigned = emb.withColumn("cell", assign_udf(cents)(F.col(vec_col)))
        sums = (
            assigned.select("cell", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        new = np.zeros_like(cents)
        for r in sums:
            new[r["cell"], r["dim"]] = r["s"]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        nonzero = norms[:, 0] > 1e-30
        cents[nonzero] = (new / np.maximum(norms, 1e-30))[nonzero]

    assigned = emb.withColumn("cell", assign_udf(cents)(F.col(vec_col)))
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        _os.path.join(out_dir, "vectors")
    )
    meta = {"n_cells": int(n_cells), "dim": int(cents.shape[1]), "count": int(n_total)}
    with open(_os.path.join(out_dir, "centroids.json"), "w") as f:
        _json.dump({"meta": meta, "centroids": cents.tolist()}, f)
    return meta


def ivf_search(
    spark: SparkSession,
    out_dir: str,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Query a persisted IVF index: pick the nprobe nearest centroids and
    scan ONLY those cell partitions (`cell IN (...)` prunes at the file
    listing level), exact cosine re-rank inside."""
    import json as _json
    import os as _os

    with open(_os.path.join(out_dir, "centroids.json")) as f:
        data = _json.load(f)
    cents = np.asarray(data["centroids"], dtype=np.float32)
    q = np.asarray(query_vec, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-30)
    probe = [int(x) for x in np.argsort(-(cents @ q))[:nprobe]]

    vecs = spark.read.parquet(_os.path.join(out_dir, "vectors"))
    cand = vecs.where(F.col("cell").isin(probe))
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != exclude_id)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a.cast("double") * a),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return (
        cand.select(F.col(id_col), (dot / F.greatest(nrm, F.lit(1e-30))).alias("raw"))
        .orderBy(F.desc("raw"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("raw", round_to).alias("cos"))
    )
