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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# MinHash modulus: 2^31-1 keeps (a*h+b) inside uint64 for fully
# vectorized numpy modmul (31-bit coeffs x 28-bit shingle hashes)
MERSENNE31 = (1 << 31) - 1


def tokens_col(text_col: str = "text"):
    """lower + split on [^a-z0-9]+, empties removed — matches the oracle's
    regexp_split_to_array pipeline exactly."""
    return F.array_remove(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), ""
    )


def _shingle_array(tok_col: str, k: int):
    """Distinct word-k-gram array from a token-array column — per-row
    Catalyst expression. Guards n < k: sequence(1, 0) would DESCEND
    ([1, 0]) and touch array index 0."""
    n = F.size(tok_col)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(tok_col, (i + j).cast("int")) for j in range(k)],
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_df(docs: DataFrame, k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) rows: distinct word k-grams per doc — pure
    DataFrame ops (transform over a sequence of slice joins)."""
    toks = docs.select(F.col(id_col), tokens_col().alias("t"))
    return (
        toks.select(id_col, F.explode(_shingle_array("t", k)).alias("shingle"))
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
    """(doc_id, sig: array<long>) — MinHash signature, MAP-ONLY (no
    shuffle): the shingle construction + 28-bit xxhash64 hashing run
    JVM-side (one per-row transform), then ONE Arrow-batched pandas UDF
    computes all num_perm permutation minima vectorized across the
    whole batch (flatten -> one (a*h+b) mod p pass + minimum.reduceat
    per permutation — no per-doc or per-gram Python). Docs with no
    k-gram produce no row (same as the previous kernel). The LSH recall
    contract vs exact Jaccard is asserted in tests/test_pipeline.py
    regardless of the hash choice."""
    from pyspark.sql.types import ArrayType, LongType

    A, B = _perm_coeffs(num_perm, seed)
    m31 = np.uint64(MERSENNE31)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(hs: pd.Series) -> pd.Series:
        arrs = [np.asarray(a, dtype=np.uint64) for a in hs]
        if not arrs:
            return pd.Series([], dtype=object)
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
        flat = np.concatenate(arrs) if lens.sum() else np.empty(0, np.uint64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out = np.empty((len(arrs), num_perm), dtype=np.int64)
        for i in range(num_perm):
            v = (A[i] * flat + B[i]) % m31
            out[:, i] = np.minimum.reduceat(v, starts).astype(np.int64)
        return pd.Series(list(out))

    # filter on the cheap token count, NOT on size(<gram expr>): a filter
    # over the gram array would force a SECOND full evaluation of the
    # shingle construction (filter and project do not share
    # subexpressions — measured 0.5s -> 9.5s at sf0.1). n >= k implies
    # at least one shingle, so the semantics are identical.
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens_col().alias("t"))
    hs = F.transform(
        _shingle_array("t", k), lambda g: F.pmod(F.xxhash64(g), F.lit(1 << 28))
    )
    return toks.where(F.size("t") >= k).select(
        "doc_id", sig_udf(hs).alias("sig")
    )


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
    # bucket-group instead of self-join: ONE shuffle of the band rows
    # (a self-join shuffles them twice), pairs expanded per bucket.
    # Buckets are collision groups — tiny by construction; a degenerate
    # all-docs-identical corpus makes one giant bucket, which is the
    # same O(n^2) CPU the self-join would produce. Pair EXPANSION is
    # chunked so a degenerate bucket never materializes its quadratic
    # pair set inside a single row (2 GB array limit / executor OOM):
    # the bucket explodes into chunk-pair rows carrying <= 2*CHUNK ids
    # each, and each row expands at most CHUNK^2 pairs, streamed through
    # whole-stage codegen into distinct()'s partial aggregate. Buckets
    # with <= CHUNK ids take exactly the old single-row triangular path.
    CHUNK = 1024
    buckets = (
        band_rows.groupBy("band", "bh")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    nchunks = F.floor((F.size("ids") - 1) / CHUNK).cast("int") + F.lit(1)
    chunk_idx = F.flatten(
        F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda j: F.transform(
                F.sequence(F.lit(0), j),
                lambda i: F.struct(i.alias("i"), j.alias("j")),
            ),
        )
    )
    chunked = buckets.select(
        "ids", F.explode(chunk_idx).alias("cp")
    ).select(
        F.slice("ids", F.col("cp.i") * CHUNK + 1, F.lit(CHUNK)).alias("left"),
        F.slice("ids", F.col("cp.j") * CHUNK + 1, F.lit(CHUNK)).alias("right"),
        (F.col("cp.i") == F.col("cp.j")).alias("same"),
    )

    def _pair(a, b):
        return F.struct(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))

    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("left") - 1),
            lambda i: F.transform(
                F.slice("left", 1, i),
                lambda x: _pair(x, F.element_at("left", (i + 1).cast("int"))),
            ),
        )
    )
    cross = F.flatten(
        F.transform(
            "left", lambda a: F.transform("right", lambda b: _pair(a, b))
        )
    )
    pair_arr = F.when(F.col("same"), tri).otherwise(cross)
    return (
        chunked.select(F.explode(pair_arr).alias("p"))
        .select("p.a", "p.b")
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
    # NOTE: a "cheaper" map-only size(_shingle_array) projection here is
    # 8x SLOWER in practice: CollapseProject inlines the tokenizer into
    # every element_at site of the interpreted gram lambda, re-splitting
    # the document per shingle position. The explode+groupBy form keeps
    # the tokenizer evaluated once per row.
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
    """(doc_id, simhash_hex): 64-bit SimHash — per term, the first 8 md5
    bytes vote +tf/-tf per bit position; sign of the vote is the bit.
    Emitted as a 16-hex-char string (value exceeds signed int64).

    Map-only (NO shuffle — the scalable shape: output is one tiny row
    per doc) and vectorized across the whole Arrow batch: one np.unique
    builds the batch vocabulary, md5 runs once per never-seen vocab
    entry (cached across batches), votes accumulate via 64 C-side
    bincounts — no per-doc Python loop. Docs with zero tokens produce no
    row (matching the SQL oracle)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("simhash_hex", StringType())]
    )

    def fn(batches):
        import hashlib
        import re

        split = re.compile(r"[^a-z0-9]+")
        hcache: dict[str, int] = {}
        for pdf in batches:
            tok_lists = [
                [t for t in split.split(s.lower()) if t] for s in pdf["text"]
            ]
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            kept = np.flatnonzero(lens > 0)
            if kept.size == 0:
                yield pd.DataFrame(
                    {"doc_id": pd.array([], dtype="int64"), "simhash_hex": []}
                )
                continue
            n = kept.size
            all_terms = np.array(
                [t for i in kept for t in tok_lists[i]], dtype=object
            )
            row_idx = np.repeat(np.arange(n), lens[kept])
            vocab, term_idx = np.unique(all_terms, return_inverse=True)
            for t in vocab:
                if t not in hcache:
                    hcache[t] = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            hs = np.fromiter(
                (hcache[t] for t in vocab), dtype=np.uint64, count=vocab.size
            )
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                np.float64
            )  # (V, 64)
            # vote_j = sum tf*(2*bit-1) = 2*S_j - total_tokens, with
            # S_j = per-doc sum of bit_j over token OCCURRENCES (per-token
            # summing IS the tf weighting)
            total = lens[kept].astype(np.float64)
            votes = np.empty((n, 64), dtype=np.float64)
            for j in range(64):
                s_j = np.bincount(
                    row_idx, weights=bits[:, j][term_idx], minlength=n
                )
                votes[:, j] = 2.0 * s_j - total
            vals = (
                (votes >= 0).astype(np.uint64) << shifts[None, :]
            ).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(np.int64)[kept],
                    "simhash_hex": [format(int(v), "016x") for v in vals],
                }
            )

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


def dedup_components(
    spark: SparkSession, pairs: DataFrame, max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup pairs into clusters: (doc_id, rep) where rep is
    the MINIMUM doc_id in the doc's connected component of the pair
    graph — the canonical survivor a dedup pipeline keeps (every other
    member is dropped or weighted down). Only docs that appear in at
    least one pair are returned; singletons are trivially their own rep.

    Iterative min-label propagation — the standard large-scale
    connected-components shape (cf. the MapReduce large/small-star
    family): each round is one join of the edge list against the current
    labels plus a min-aggregate, so per-round shuffle volume is O(|E|)
    and the round count is bounded by the component diameter (near-dup
    clusters are dense, so a handful in practice; max_iter is a safety
    rail). Labels only ever DECREASE, so convergence is detected by one
    cheap sum(label) action per round (strictly decreasing until fixed
    point) — no extra join. Each round's labels are persisted (narrow
    2-column frame — the CLAUDE.md persist rule allows these) and the
    previous round unpersisted, cutting the iterative lineage."""
    # narrow (u, v) projection persisted BEFORE symmetrization: the
    # union's two branches would otherwise re-run the whole upstream
    # pair pipeline (e.g. MinHash-LSH) twice inside the first job
    p2 = pairs.select(
        F.col("a").cast("long").alias("u"),
        F.col("b").cast("long").alias("v"),
    ).persist()
    edges = (
        p2.union(p2.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    try:
        for _ in range(max_iter):
            nbr = edges.join(
                labels, edges["v"] == labels["node"]
            ).select(F.col("u").alias("node"), F.col("lbl"))
            new_labels = (
                labels.select("node", "lbl")
                .union(nbr)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
                .persist()
            )
            new_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        return labels.select(
            F.col("node").alias("doc_id"), F.col("lbl").alias("rep")
        )
    finally:
        edges.unpersist()
        p2.unpersist()
