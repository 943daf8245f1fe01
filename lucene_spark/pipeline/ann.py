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
    return _tile_pairs_matched(tiles, threshold, round_to)


_PAIR_SCHEMA = StructType(
    [
        StructField("a", LongType()),
        StructField("b", LongType()),
        StructField("cos", DoubleType()),
    ]
)


def _tile_pairs_matched(
    tiles: DataFrame,
    threshold: float,
    round_to: int,
    same_group=None,
) -> DataFrame:
    """Upper-triangle tile join + the matmul match kernel, shared by the
    exact all-pairs path and the SemDeDup within-cluster path.
    ``same_group(l_tile, r_tile)`` optionally restricts pairing (e.g. to
    tiles of the same IVF cell)."""
    l = tiles.alias("l")
    r = tiles.alias("r")
    cond = F.col("l.tile") <= F.col("r.tile")
    if same_group is not None:
        cond = cond & same_group(F.col("l.tile"), F.col("r.tile"))
    pairs = l.join(r, cond).select(
        F.col("l.tile").alias("ta"), F.col("l.ids").alias("ids_a"),
        F.col("l.mat").alias("mat_a"), F.col("l.n").alias("na"),
        F.col("r.tile").alias("tb"), F.col("r.ids").alias("ids_b"),
        F.col("r.mat").alias("mat_b"), F.col("r.n").alias("nb"),
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
        pairs.mapInPandas(match, schema=_PAIR_SCHEMA)
        .select("a", "b", F.round("cos", round_to).alias("cos"))
    )


def _assign_multi_udf(cents_arr: np.ndarray, p: int):
    """Arrow-batched TOP-p cell assignment (multi-probe): each vector
    lands in its p nearest cells, so near-dup pairs that straddle one
    cell boundary still meet — the standard recall lever for
    cluster-bucketed comparison."""
    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(x, dtype=np.float32) for x in v])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ cents_arr.T
        top = np.argsort(-sims, axis=1)[:, :p].astype(np.int32)
        return pd.Series(list(top))

    return assign


def semantic_dedup_pairs(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    kmeans_iters: int = 5,
    tiles_per_cell: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    nprobe: int = 2,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings with the IVF coarse quantizer, then compare pairs
    only WITHIN a cluster — compute drops from O(n^2) to
    O(nprobe^2 x sum of cell^2), the paper's entire point, at the cost
    of missing pairs whose members share NO probed cell (the accepted
    approximation; recall vs the exact path is pytest-measured).
    ``nprobe`` assigns each vector to its top-p cells (multi-probe), the
    standard recall lever. Columns (a, b, cos) with a < b; a pair found
    in several shared cells is emitted once.

    Plan shape: bounded-sample centroid training (one scan), map-only
    multi-cell assignment + explode, per-(cell, subtile) Arrow packing,
    tile join restricted to same-cell — the same matmul kernel as the
    exact path, sharded exactly the way emb_near_dup_pairs' docstring
    prescribes for 10^9 vectors."""
    _, cents = _train_centroids(emb, n_cells, kmeans_iters, id_col, vec_col)
    assign = _assign_multi_udf(cents, int(nprobe))
    tpc = int(tiles_per_cell)
    cells = emb.withColumn(
        "cell", F.explode(assign(F.col(vec_col)))
    )
    keyed = cells.withColumn(
        "gtile",
        (F.col("cell").cast("long") * tpc + F.col(id_col) % tpc).cast("int"),
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        return pd.DataFrame(
            {
                "tile": [int(key[0])],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
                "n": [len(ids)],
            }
        )

    tiles = keyed.groupBy("gtile").applyInPandas(pack, schema=_TILE_SCHEMA)
    matched = _tile_pairs_matched(
        tiles,
        threshold,
        round_to,
        same_group=lambda lt, rt: (lt / tpc).cast("long")
        == (rt / tpc).cast("long"),
    )
    # multi-probe duplicates the same pair in every shared cell; the
    # cosine is deterministic, so distinct() collapses them exactly
    return matched.distinct() if nprobe > 1 else matched


def semantic_dedup(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    kmeans_iters: int = 5,
    tiles_per_cell: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
) -> DataFrame:
    """Full SemDeDup resolution: (id_col, cluster, keep) for every
    vector — near-dup pairs from semantic_dedup_pairs resolved to
    connected components (pipeline.dedup.dedup_components'
    pointer-doubling), keep = the minimum id of each component (the
    paper keeps one representative per cluster; min-id is the
    deterministic choice, matching exact_dedup's convention). Vectors in
    no near-dup pair form singleton clusters and are kept."""
    from lucene_spark.pipeline.dedup import dedup_components

    pairs = semantic_dedup_pairs(
        spark, emb, threshold, n_cells, kmeans_iters, tiles_per_cell,
        id_col, vec_col, nprobe=nprobe,
    )
    comp = dedup_components(spark, pairs.select("a", "b"))  # (doc_id, rep)
    ids = emb.select(F.col(id_col).alias("doc_id"))
    out = ids.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("rep"), F.col("doc_id")).alias("cluster")
    )
    return out.select(
        F.col("doc_id").alias(id_col),
        "cluster",
        (F.col("doc_id") == F.col("cluster")).alias("keep"),
    )


def _assign_udf(cents_arr: np.ndarray):
    """Arrow-batched cell assignment against broadcast centroids —
    vectorized argmax of the cosine, narrow map (no shuffle)."""

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(x, dtype=np.float32) for x in v])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        return pd.Series(np.argmax(mat @ cents_arr.T, axis=1).astype(np.int32))

    return assign


def _train_centroids(
    emb: DataFrame,
    n_cells: int,
    kmeans_iters: int,
    id_col: str,
    vec_col: str,
    sample_cap: int = 65536,
) -> tuple[int, np.ndarray]:
    """Spherical k-means trained on a BOUNDED deterministic sample,
    iterated in driver-side numpy (the faiss-style trainer): at 10^9
    vectors the old shape — one full-corpus assignment scan plus a
    (cell, dim) collect per Lloyd iteration — pays kmeans_iters corpus
    scans; this reads a fixed-size strided sample once and iterates in
    memory. Only the single final assignment pass touches every row.
    Update rule matches the previous implementation exactly (sum of RAW
    member vectors, normalized; empty cells keep their centroid), so on
    corpora at or below sample_cap the trained centroids are unchanged."""
    n_total = emb.count()
    stride = max(1, n_total // sample_cap)
    rows = (
        emb.withColumn("rk", F.col(id_col) % stride)
        .where(F.col("rk") == 0)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_cap)
        .collect()
    )
    raw = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in rows])
    normd = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-30)
    seed_step = max(1, len(raw) // n_cells)
    cents = normd[::seed_step][:n_cells].copy()
    for _ in range(kmeans_iters):
        cell = np.argmax(normd @ cents.T, axis=1)
        for c in range(len(cents)):
            m = cell == c
            if m.any():
                v = raw[m].sum(axis=0, dtype=np.float64)
                nrm = float(np.linalg.norm(v))
                if nrm > 1e-30:
                    cents[c] = (v / nrm).astype(np.float32)
    return n_total, cents


def _cosine_rerank(
    cand: DataFrame,
    q: np.ndarray,
    k: int,
    id_col: str,
    vec_col: str,
    round_to: int,
) -> DataFrame:
    """Exact cosine-to-query re-rank as ONE Arrow-batched numpy matvec —
    replaces an interpreted zip_with/aggregate/transform chain (~150 ns
    per element) with a C-speed pass, the same measured tradeoff as the
    tile matmul kernel."""
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("raw", DoubleType())]
    )
    qd = np.asarray(q, dtype=np.float64)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {id_col: pd.array([], dtype="int64"),
                     "raw": pd.array([], dtype="float64")}
                )
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            dots = mat @ qd
            nrms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(np.int64), "raw": dots / nrms}
            )

    scored = cand.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    return (
        scored.orderBy(F.desc("raw"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("raw", round_to).alias("cos"))
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
    """Approximate top-k by cosine: IVF coarse quantizer (sample-trained
    spherical k-means), probe the `nprobe` nearest cells, exact numpy
    cosine re-rank inside them.

    The cell assignment is a narrow map (broadcast centroids), so the
    only shuffle is the final top-k — at 10^9 vectors the probed cells
    are partition-pruned by writing the index partitioned by cell."""
    _, cents = _train_centroids(emb, n_cells, kmeans_iters, id_col, vec_col)

    q = np.asarray(query_vec, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-30)
    probe = np.argsort(-(cents @ q))[:nprobe].tolist()

    assigned = emb.withColumn("cell", _assign_udf(cents)(F.col(vec_col)))
    cand = assigned.where(F.col("cell").isin(probe))
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != exclude_id)
    return _cosine_rerank(cand, q, k, id_col, vec_col, round_to)


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

    n_total, cents = _train_centroids(
        emb, n_cells, kmeans_iters, id_col, vec_col
    )
    assigned = emb.withColumn("cell", _assign_udf(cents)(F.col(vec_col)))
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        _os.path.join(out_dir, "vectors")
    )
    meta = {"n_cells": int(n_cells), "dim": int(cents.shape[1]), "count": int(n_total)}
    with open(_os.path.join(out_dir, "centroids.json"), "w") as f:
        _json.dump({"meta": meta, "centroids": cents.tolist()}, f)
    return meta


def ivf_candidates(
    spark: SparkSession,
    out_dir: str,
    query_vec: np.ndarray,
    nprobe: int = 4,
) -> tuple[DataFrame, np.ndarray]:
    """Probe a persisted IVF index: pick the nprobe nearest centroids and
    return the DataFrame of ONLY those cell partitions (`cell IN (...)`
    prunes at the file listing level) plus the normalized query vector.
    Shared by the standalone ivf_search and the tombstone-aware
    IndexSearcher.search_ivf."""
    import json as _json
    import os as _os

    with open(_os.path.join(out_dir, "centroids.json")) as f:
        data = _json.load(f)
    cents = np.asarray(data["centroids"], dtype=np.float32)
    q = np.asarray(query_vec, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-30)
    probe = [int(x) for x in np.argsort(-(cents @ q))[:nprobe]]

    vecs = spark.read.parquet(_os.path.join(out_dir, "vectors"))
    return vecs.where(F.col("cell").isin(probe)), q


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
    """Query a persisted IVF index: cell-pruned probe scan, exact cosine
    re-rank inside the probed cells."""
    cand, q = ivf_candidates(spark, out_dir, query_vec, nprobe)
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != exclude_id)
    return _cosine_rerank(cand, q, k, id_col, vec_col, round_to)
