"""Deduplication operators for training-data curation.

Four families, each a standard large-corpus technique:
  - exact:     hash-groupBy on full content (gate.q_exact_dedup)
  - n-gram Jaccard: exact all-pairs similarity via shingle inverted join —
                pure DataFrame ops, the ground truth the approximate
                methods are judged against
  - MinHash+LSH: signature -> banded buckets -> candidate pairs ->
                exact verification; the 100 TB path (shuffle volume is
                O(docs x num_perm), candidate verification touches only
                bucket-colliding pairs, never the n^2 pair space)
  - SimHash:   64-bit weighted bit-vote fingerprint; hamming-distance
                buckets for near-dup blocking

Tokenization here is the simple ``lower + split [^a-z0-9]+`` pipeline
(NOT the UAX#29 StandardAnalyzer) so every operator is exactly
reproducible by the DuckDB oracle SQL in lucene_spark.gate.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# MinHash modulus: 2^31-1 keeps (a*h+b) inside uint64 for fully
# vectorized numpy modmul (31-bit coeffs x 28-bit shingle hashes)
MERSENNE31 = (1 << 31) - 1


def tokens_col(text_col: str = "text"):
    """lower + split on [^a-z0-9]+, empties removed — matches the oracle's
    regexp_split_to_array pipeline exactly."""
    return F.array_remove(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), ""
    )


def shingles_df(docs: DataFrame, k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) rows: distinct word k-grams per doc — pure
    DataFrame ops (transform over a sequence of slice joins)."""
    toks = docs.select(F.col(id_col), tokens_col().alias("t"))
    n = F.size("t")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at("t", (i + j).cast("int")) for j in range(k)]
        ),
    )
    return (
        toks.select(id_col, F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.col("shingle") != "")
    )


def ngram_jaccard_pairs(
    spark: SparkSession, docs: DataFrame, k: int = 3, threshold: float = 0.8,
    round_to: int = 4,
) -> DataFrame:
    """Exact all-pairs word-k-gram Jaccard >= threshold via the shingle
    inverted join (pairs sharing no shingle never meet — the join IS the
    candidate pruning). Columns (a, b, jaccard)."""
    sh = shingles_df(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("l")
    b = sh.alias("r")
    inter = (
        a.join(b, (F.col("l.shingle") == F.col("r.shingle"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "a").join(F.broadcast(sb), "b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", round_to).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _perm_coeffs(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_perm).astype(np.uint64)
    b = rng.randint(0, MERSENNE31, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame, k: int = 3, num_perm: int = 64, seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig: array<long>) — MinHash signature over md5-derived
    28-bit word-k-shingle hashes, (a*h+b) mod (2^31-1) permutations; one
    (num_perm x n_shingles) uint64 matrix op per doc, no per-value
    Python."""
    import re

    A, B = _perm_coeffs(num_perm, seed)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("sig", ArrayType(LongType()))]
    )

    def fn(batches):
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
                grams = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
                if not grams:
                    continue
                h = np.fromiter(
                    (int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams),
                    dtype=np.uint64,
                )
                sig = ((A[:, None] * h[None, :] + B[:, None]) % np.uint64(MERSENNE31)).min(axis=1)
                ids.append(int(did))
                sigs.append(sig.astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return docs.select(id_col, "text").mapInPandas(fn, schema=schema)


def minhash_candidates(
    sigs: DataFrame, bands: int = 16, rows: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on all `rows` values of any band become a
    candidate pair. Returns distinct (a, b) with a < b."""
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bnd).alias("band"),
                    F.hash(*[F.element_at("sig", bnd * rows + r + 1)
                             for r in range(rows)]).alias("bh"),
                )
                for bnd in range(bands)
            ])
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    l, r = band_rows.alias("l"), band_rows.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.bh") == F.col("r.bh"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def minhash_near_dup(
    spark: SparkSession, docs: DataFrame, k: int = 3, num_perm: int = 64,
    bands: int = 16, rows: int = 4, threshold: float = 0.8, round_to: int = 4,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded candidate
    pairs -> EXACT Jaccard verification of candidates only. Output
    (a, b, jaccard) — identical to ngram_jaccard_pairs whenever LSH recall
    is 1 (P[miss] <= (1-t^rows)^bands ~ 2e-4 at t=0.8 with 16x4)."""
    cands = minhash_candidates(minhash_signatures(docs, k, num_perm), bands, rows)
    sh = shingles_df(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # exact intersection via shingle join restricted to candidate pairs
    a_sh = sh.select(F.col("doc_id").alias("a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cands.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "a").join(F.broadcast(sb), "b")
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", round_to).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(spark: SparkSession, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash_hex): 64-bit SimHash — per token, md5-derived 64
    bits vote +tf/-tf per bit position; sign of the vote is the bit.
    Emitted as a 16-hex-char string (value exceeds signed int64)."""
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("simhash_hex", StringType())]
    )

    def fn(batches):
        import re

        hcache: dict[str, int] = {}
        for pdf in batches:
            ids, hexes = [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
                if not toks:
                    ids.append(int(did))
                    hexes.append("0" * 16)
                    continue
                tf: dict[str, int] = {}
                for t in toks:
                    tf[t] = tf.get(t, 0) + 1
                terms = list(tf)
                hs = np.empty(len(terms), dtype=np.uint64)
                for j, t in enumerate(terms):
                    v = hcache.get(t)
                    if v is None:
                        v = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
                        hcache[t] = v
                    hs[j] = v
                w = np.fromiter((tf[t] for t in terms), dtype=np.int64)
                bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                votes = ((2 * bits - 1) * w[:, None]).sum(axis=0)
                out = np.uint64(0)
                for bit, v in enumerate(votes):
                    if v >= 0:
                        out |= np.uint64(1) << shifts[bit]
                ids.append(int(did))
                hexes.append(format(int(out), "016x"))
            yield pd.DataFrame({"doc_id": ids, "simhash_hex": hexes})

    return docs.select(id_col, "text").mapInPandas(fn, schema=schema)


def simhash_near_dup(
    spark: SparkSession, docs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, blocked
    on 16-bit quarters (pigeonhole: distance <=3 over 4 blocks implies at
    least one identical block, so the block join loses no pairs)."""
    sig = simhash64(spark, docs).select(
        "doc_id",
        F.conv(F.substring("simhash_hex", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("simhash_hex", 9, 8), 16, 10).cast("long").alias("lo"),
    )
    quarters = sig.select(
        "doc_id", "hi", "lo",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(q).alias("q"),
                    (F.shiftrightunsigned(F.col("hi" if q < 2 else "lo"),
                                          16 * (1 - q % 2)) % (1 << 16)).alias("qv"),
                )
                for q in range(4)
            ])
        ).alias("e"),
    ).select("doc_id", "hi", "lo", "e.q", "e.qv")
    l, r = quarters.alias("l"), quarters.alias("r")
    pairs = (
        l.join(r, (F.col("l.q") == F.col("r.q")) & (F.col("l.qv") == F.col("r.qv"))
               & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
            F.col("l.hi").alias("ha"), F.col("l.lo").alias("la"),
            F.col("r.hi").alias("hb"), F.col("r.lo").alias("lb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return pairs.withColumn("hamming", ham).where(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")
