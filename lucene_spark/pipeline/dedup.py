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
    buckets = (
        band_rows.groupBy("band", "bh")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    return _expand_pairs_chunked(buckets)


def _expand_pairs_chunked(buckets: DataFrame, chunk: int = 1024) -> DataFrame:
    """Distinct unordered candidate pairs (a, b), a < b, from a bucketed
    DataFrame with an ``ids`` array column (each bucket a collision
    group, size > 1). Elements may be longs or structs whose FIRST field
    is a unique id (struct least/greatest orders lexicographically).

    Buckets are tiny by construction; a degenerate all-docs-identical
    corpus makes one giant bucket, which is the same O(n^2) CPU a
    self-join would produce. Pair EXPANSION is chunked so a degenerate
    bucket never materializes its quadratic pair set inside a single row
    (2 GB array limit / executor OOM): the bucket explodes into
    chunk-pair rows carrying <= 2*chunk ids each, and each row expands at
    most chunk^2 pairs, streamed through whole-stage codegen into
    distinct()'s partial aggregate. Buckets with <= chunk ids take
    exactly the single-row triangular path."""
    nchunks = F.floor((F.size("ids") - 1) / chunk).cast("int") + F.lit(1)
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
        F.slice("ids", F.col("cp.i") * chunk + 1, F.lit(chunk)).alias("left"),
        F.slice("ids", F.col("cp.j") * chunk + 1, F.lit(chunk)).alias("right"),
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
    spark: SparkSession, docs: DataFrame, max_hamming: int = 3,
    n_blocks: int | None = None, n_keep: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocking is Manku-style multi-table (the Google near-dup paper's
    permuted-table scheme): the 64-bit fingerprint splits into n_blocks
    contiguous blocks and every C(n_blocks, n_keep) combination of
    n_keep blocks forms one blocking key. Pigeonhole: <= max_hamming
    flipped bits touch at most max_hamming blocks, so whenever
    n_blocks - n_keep >= max_hamming some kept-combination is clean on
    both docs and the pair collides — the blocking is EXACT (no recall
    loss). With the defaults, keys are ~32 bits wide (vs the old 4x16-bit
    quarters whose 65k buckets held ~15k docs each at 10^9 scale and
    exploded quadratically): ~4e9 distinct buckets per table keeps the
    expected bucket size ~1 even at 10^9 docs. Residual degenerate
    buckets (true mass duplicates) expand through the same chunked
    machinery as MinHash-LSH, so no single row ever materializes a
    quadratic pair set. Candidate pairs then verify exact hamming via a
    narrow join back to the fingerprints."""
    if n_blocks is None:
        # smallest exact table family for the requested radius (6/3 =
        # C(6,3)=20 tables of ~32-bit keys at the default radius 3)
        n_blocks = max(6, max_hamming + n_keep)
    if n_blocks - n_keep < max_hamming:
        raise ValueError(
            f"blocking cannot be exact: n_blocks-n_keep="
            f"{n_blocks - n_keep} < max_hamming={max_hamming}"
        )
    from itertools import combinations

    sig = simhash64(spark, docs).select(
        "doc_id",
        F.conv(F.substring("simhash_hex", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("simhash_hex", 9, 8), 16, 10).cast("long").alias("lo"),
    )
    # reassemble the 64-bit pattern (signed long, bitwise-safe) and cut
    # contiguous blocks; F.hash of (table, block values...) is the key —
    # 32-bit hash collisions only ADD candidates, the exact hamming
    # verification removes them
    full = F.shiftleft(F.col("hi"), 32).bitwiseOR(F.col("lo"))
    bounds = np.linspace(0, 64, n_blocks + 1).astype(int)

    def _block(i: int):
        lo_bit, hi_bit = int(bounds[i]), int(bounds[i + 1])
        width = hi_bit - lo_bit
        x = F.shiftrightunsigned(full, lo_bit)
        if lo_bit + width < 64:
            x = x.bitwiseAND(F.lit((1 << width) - 1))
        return x

    blocks = [_block(i) for i in range(n_blocks)]
    keys = F.array(*[
        F.hash(F.lit(t), *[blocks[i] for i in combo])
        for t, combo in enumerate(combinations(range(n_blocks), n_keep))
    ])
    # the bucket rows carry (doc_id, hi, lo) structs so the fingerprint
    # pipeline evaluates exactly ONCE (no join-back, no recompute);
    # struct least/greatest orders by doc_id (first field, unique).
    # _expand_pairs_chunked's distinct() collapses the same pair found
    # by multiple tables before the hamming verification.
    buckets = (
        sig.select(
            F.struct("doc_id", "hi", "lo").alias("s"),
            F.explode(keys).alias("bkey"),
        )
        .groupBy("bkey")
        .agg(F.collect_list("s").alias("ids"))
        .where(F.size("ids") > 1)
    )
    cands = _expand_pairs_chunked(buckets)
    ham = F.bit_count(
        F.col("a.hi").bitwiseXOR(F.col("b.hi"))
    ) + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    return (
        cands.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            "hamming",
        )
    )


def dedup_components(
    spark: SparkSession, pairs: DataFrame, max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve near-dup pairs into clusters: (doc_id, rep) where rep is
    the MINIMUM doc_id in the doc's connected component of the pair
    graph — the canonical survivor a dedup pipeline keeps (every other
    member is dropped or weighted down). Only docs that appear in at
    least one pair are returned; singletons are trivially their own rep.

    Iterative min-label propagation WITH pointer doubling — the
    large-scale connected-components shape (cf. the MapReduce
    large/small-star family): each round takes the min over (a) the
    node's own label, (b) every neighbor's label (one O(|E|) join), and
    (c) the label's label (one O(|V|) self-join — the pointer jump).
    Neighbor propagation alone needs O(component diameter) rounds — a
    pathological chain component makes the driver-synchronized round
    loop the bottleneck; the pointer jump roughly halves every label
    chain per round, bounding rounds at O(log n) regardless of shape.
    Labels only ever DECREASE and every label value is a node id in the
    SAME component, so the fixed point is unchanged (constant = min id
    per component) and convergence is still detected by one cheap
    sum(label) action per round (strictly decreasing until fixed point).
    Each round's labels are localCheckpoint'ed (eager, narrow 2-column
    frame): persist() alone caches DATA but leaves the LOGICAL plan
    growing — with labels referenced three times per round (self, nbr,
    jump) the analyzer's plan tree is ~3^rounds nodes and Catalyst
    analysis, not execution, becomes the bottleneck (observed: a 64-node
    chain spun the driver for 15+ min). localCheckpoint truncates the
    lineage to the materialized partitions, keeping every round's plan
    O(1). If ``stats`` is given, stats['rounds'] records the executed
    round count."""
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
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    rounds = 0
    try:
        for _ in range(max_iter):
            rounds += 1
            nbr = edges.join(
                labels, edges["v"] == labels["node"]
            ).select(F.col("u").alias("node"), F.col("lbl"))
            # pointer doubling: lbl <- lbl(lbl). Every label value is a
            # node id present in the labels table, so the inner join
            # loses nothing.
            lut = labels.select(
                F.col("node").alias("pnode"), F.col("lbl").alias("plbl")
            )
            jump = labels.join(lut, labels["lbl"] == F.col("pnode")).select(
                "node", F.col("plbl").alias("lbl")
            )
            new_labels = (
                labels.select("node", "lbl")
                .union(nbr)
                .union(jump)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint(eager=True)
            )
            new_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        if stats is not None:
            stats["rounds"] = rounds
        return labels.select(
            F.col("node").alias("doc_id"), F.col("lbl").alias("rep")
        )
    finally:
        edges.unpersist()
        p2.unpersist()


def resolve_duplicates(
    spark: SparkSession,
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col=None,
) -> DataFrame:
    """The dedup pipeline's final step: pick ONE survivor per near-dup
    cluster by QUALITY and mark every other member dropped. Returns
    (id_col, rep, kept) covering EVERY input doc — singletons (docs in
    no pair) are their own rep and always kept.

    ``quality_col`` is any deterministic Column scoring a doc (default:
    token count via tokens_col — "keep the longest version", the common
    web-dedup heuristic); the survivor is the cluster's
    (quality DESC, id ASC) argmax, so ties are stable and the choice is
    reproducible across cluster sizes.

    Plan shape at 10^12 docs: components come from dedup_components'
    O(log n)-round pointer-doubling (cluster table is O(docs-in-pairs),
    usually << corpus); the resolution itself is one LEFT join
    (corpus x cluster table — broadcast while the cluster side fits,
    AQE degrades to shuffle) plus one window partitioned by rep. The
    window's per-rep groups are cluster-sized (bounded, no skew blowup:
    a mega-cluster is itself the signal to drop wholesale)."""
    from pyspark.sql import Window

    if quality_col is None:
        quality_col = F.size(tokens_col("text"))
    comps = dedup_components(spark, pairs)
    base = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        quality_col.cast("double").alias("_q"),
    )
    joined = base.join(
        comps.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn("rep", F.coalesce(F.col("rep"), F.col(id_col)))
    w = Window.partitionBy("rep").orderBy(
        F.desc("_q"), F.asc(id_col)
    )
    return (
        joined.withColumn("kept", F.row_number().over(w) == 1)
        .select(id_col, F.col("rep").cast("long").alias("rep"), "kept")
    )
