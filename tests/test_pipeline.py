"""Pipeline operator contracts beyond the SQL duels: ANN recall, media
stub behavior/batch shape, LSH-vs-exact dedup equivalence, simhash
blocking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_ann_ivf_recall(spark, emb):
    """IVF top-10 must reach >=80% recall vs brute force on this data."""
    from lucene_spark.pipeline.ann import ann_ivf_topk

    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0],
        dtype=np.float32,
    )
    approx = {r["vec_id"] for r in ann_ivf_topk(spark, emb, q, k=10, exclude_id=0).collect()}

    rows = emb.filter(F.col("vec_id") != 0).collect()
    qn = q / np.linalg.norm(q)
    sims = sorted(
        (
            (
                float(np.dot(qn, np.asarray(r["embedding"], dtype=np.float32)
                             / np.linalg.norm(np.asarray(r["embedding"], dtype=np.float32)))),
                r["vec_id"],
            )
            for r in rows
        ),
        key=lambda t: (-t[0], t[1]),
    )
    exact = {v for _, v in sims[:10]}
    recall = len(approx & exact) / 10
    assert recall >= 0.8, f"IVF recall {recall} (approx={approx}, exact={exact})"


def test_minhash_equals_exact_pairs(spark, docs):
    """LSH candidate pruning must not lose any >=0.8 pair on this corpus
    (CheckHits pruned-vs-complete equivalence, dedup flavor)."""
    from lucene_spark.pipeline.dedup import minhash_near_dup, ngram_jaccard_pairs

    lsh = {(r["a"], r["b"], r["jaccard"]) for r in minhash_near_dup(spark, docs).collect()}
    exact = {(r["a"], r["b"], r["jaccard"]) for r in ngram_jaccard_pairs(spark, docs).collect()}
    assert lsh == exact


def test_minhash_degenerate_bucket_chunked(spark):
    """A single LSH bucket larger than the 1024-id expansion chunk must
    still yield the complete pair set (pair generation is chunked into
    bounded rows so a duplicate-heavy corpus can't OOM one task)."""
    from lucene_spark.pipeline.dedup import minhash_candidates, minhash_signatures

    n = 1500  # > CHUNK=1024 -> triangular + cross chunk-pair rows
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again").alias("text"),
    )
    cands = minhash_candidates(minhash_signatures(docs, k=3, num_perm=64))
    assert cands.count() == n * (n - 1) // 2
    assert cands.where(F.col("a") >= F.col("b")).count() == 0


def test_simhash_near_dups_have_small_hamming(spark, docs):
    """Docs that are >=0.9-Jaccard near-dups should collide in simhash
    blocking with small hamming distance."""
    from lucene_spark.pipeline.dedup import ngram_jaccard_pairs, simhash_near_dup

    near = simhash_near_dup(spark, docs, max_hamming=6)
    pairs = {(r["a"], r["b"]) for r in near.collect()}
    strong = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(spark, docs, threshold=0.95).collect()
    }
    missed = strong - pairs
    assert len(missed) <= max(1, len(strong) // 5), f"simhash missed {missed}"


def test_media_stub_contract(spark, docs):
    from lucene_spark.pipeline.media import (
        FEATURE_DIM,
        decode_image,
        media_features,
        resize_image,
        synth_media_df,
    )

    media = synth_media_df(spark, docs.limit(50))
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = media_features(spark, media, fake_decode=True).collect()
    assert len(feats) == 50
    for r in feats[:5]:
        assert len(r["feature"]) == FEATURE_DIM
        assert 0.0 <= r["mean_luma"] <= 255.0
    # real decode is an explicit stub
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8fakejpeg")
    with pytest.raises(NotImplementedError):
        resize_image(b"x", 10, 10)
    # deterministic across calls
    img1 = decode_image(b"payload", fake=True)
    img2 = decode_image(b"payload", fake=True)
    assert img1.shape == (8, 8, 3) and (img1 == img2).all()


def test_winnow_fingerprint_overlap_detects_near_dups(spark, docs):
    """Near-dup docs share winnowing fingerprints (MOSS property)."""
    from lucene_spark.pipeline.dedup import ngram_jaccard_pairs
    from lucene_spark.pipeline.text import winnow_fingerprints

    pair = ngram_jaccard_pairs(spark, docs, threshold=0.95).limit(1).collect()
    if not pair:
        pytest.skip("no strong near-dups at this sf")
    a, b = pair[0]["a"], pair[0]["b"]
    fps = winnow_fingerprints(spark, docs.filter(F.col("doc_id").isin([a, b])))
    fa = {r["fp"] for r in fps.filter(F.col("doc_id") == a).collect()}
    fb = {r["fp"] for r in fps.filter(F.col("doc_id") == b).collect()}
    overlap = len(fa & fb) / max(1, min(len(fa), len(fb)))
    assert overlap >= 0.5


def test_emb_near_dup_cross_tile_orientation(spark):
    """Regression: off-diagonal tile pairs appear once under the
    l.tile <= r.tile join; pairs whose SMALLER vec_id lives in the
    HIGHER tile must still be emitted (oriented, not filtered).
    Planted pairs {1,8} and {7,17} with num_tiles=8: 1%8=1 < 8%8=0 is
    false (1 > 0), 7%8=7 > 17%8=1 — both have the smaller id in the
    higher-or-equal-numbered side depending on join order."""
    from lucene_spark.pipeline.ann import emb_near_dup_pairs

    rng = np.random.default_rng(42)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    # plant near-identical pairs across tiles: (1, 8) and (7, 17)
    base[8] = base[1] + 1e-4
    base[17] = base[7] + 1e-4
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")

    got = {
        (r["a"], r["b"])
        for r in emb_near_dup_pairs(spark, df, threshold=0.95, num_tiles=8).collect()
    }
    # brute-force oracle
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = m @ m.T
    want = {
        (a, b)
        for a in range(20)
        for b in range(a + 1, 20)
        if sims[a, b] >= 0.95
    }
    assert {(1, 8), (7, 17)} <= want
    assert got == want


def test_persisted_ivf_index(spark, emb, tmp_path):
    """Build-once IVF layout: partition-pruned query reads only probed
    cells; recall vs brute force >= 0.8; results stable across reloads."""
    from lucene_spark.pipeline.ann import build_ivf_index, ivf_search

    out = str(tmp_path / "ivf")
    meta = build_ivf_index(spark, emb, out, n_cells=8, kmeans_iters=4)
    assert meta["count"] == emb.count()

    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0],
        dtype=np.float32,
    )
    res1 = [(r["vec_id"], r["cos"]) for r in ivf_search(spark, out, q, k=10, nprobe=3, exclude_id=0).collect()]
    res2 = [(r["vec_id"], r["cos"]) for r in ivf_search(spark, out, q, k=10, nprobe=3, exclude_id=0).collect()]
    assert res1 == res2 and len(res1) == 10

    rows = emb.filter(F.col("vec_id") != 0).collect()
    qn = q / np.linalg.norm(q)
    sims = sorted(
        ((float(np.dot(qn, np.asarray(r["embedding"], np.float32) / np.linalg.norm(np.asarray(r["embedding"], np.float32)))), r["vec_id"]) for r in rows),
        key=lambda t: (-t[0], t[1]),
    )
    exact = {v for _, v in sims[:10]}
    assert len({v for v, _ in res1} & exact) / 10 >= 0.8

    # partition pruning shows in the scan: only probed cells listed
    plan = ivf_search(spark, out, q, k=10, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_dedup_components_matches_bruteforce(spark):
    """Iterative min-label propagation == brute-force union-find over a
    handcrafted pair graph: a 4-doc chain (diameter > 1 round forces
    real propagation), a 2-doc island, and an untouched singleton that
    must NOT appear."""
    from lucene_spark.pipeline.dedup import dedup_components

    # chain 10-20-30-40, island 50-60; 99 never appears in a pair
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (50, 60)], "a long, b long"
    )
    got = {
        (r["doc_id"], r["rep"])
        for r in dedup_components(spark, pairs).collect()
    }
    assert got == {
        (10, 10), (20, 10), (30, 10), (40, 10), (50, 50), (60, 50),
    }


def test_dedup_components_on_minhash_pairs(spark, docs):
    """Components over real minhash pairs: every rep is the min of its
    cluster, rep is a member, and membership matches a Python BFS."""
    from lucene_spark.pipeline.dedup import dedup_components, minhash_near_dup

    pairs = [
        (r["a"], r["b"])
        for r in minhash_near_dup(spark, docs).collect()
    ]
    got = {
        (r["doc_id"], r["rep"])
        for r in dedup_components(
            spark, spark.createDataFrame(pairs or [(0, 0)], "a long, b long")
        ).collect()
    }
    # Python reference: union-find
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in (pairs or [(0, 0)]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {(x, find(x)) for x in parent}
    # canonicalize: find() roots are already component minima because
    # unions always point the larger root at the smaller
    assert got == exp


def test_real_media_codecs_round_trip():
    """BMP and WAV are REAL codecs (pure numpy): encode->decode is
    identity, resize measures right, and decode_image auto-routes BMP."""
    import numpy as np

    from lucene_spark.pipeline.media import (
        decode_bmp,
        decode_image,
        decode_wav,
        encode_bmp,
        encode_wav_pcm16,
        resize_image,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (13, 17), (8, 8)]:  # odd widths hit row padding
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        blob = encode_bmp(img)
        assert (decode_bmp(blob) == img).all()
        assert (decode_image(blob) == img).all()  # auto-detect, no fake
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    small = decode_bmp(resize_image(encode_bmp(img), 4, 6))
    assert small.shape == (6, 4, 3)
    yi = (np.arange(6) * 16) // 6
    xi = (np.arange(4) * 16) // 4
    assert (small == img[yi][:, xi]).all()  # exact nearest-neighbor grid

    sq = (rng.integers(-3000, 3000, 777)).astype(np.int16)
    rate, out = decode_wav(encode_wav_pcm16(sq, 16000))
    assert rate == 16000 and (out == sq).all()

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG1234")  # non-BMP still needs PIL


def test_media_decode_features_spark(spark, docs):
    """The Arrow kernel measures the DECODED arrays: width/height/luma
    from real BMP bytes, duration/RMS from real WAV bytes, matching the
    generator's closed forms."""
    from lucene_spark.pipeline.media import (
        media_decode_features,
        synth_real_media_df,
    )

    media = synth_real_media_df(spark, docs)
    rows = media_decode_features(spark, media).collect()
    assert rows
    for r in rows:
        i = r["media_id"] // 2
        if r["kind"] == "image":
            assert r["width"] == 8 + i % 16 and r["height"] == 8 + i % 8
            exp = (
                0.299 * (37 * i % 256)
                + 0.587 * (59 * i % 256)
                + 0.114 * (83 * i % 256)
            )
            assert abs(r["mean_luma"] - exp) < 1e-9 and r["rms"] is None
        else:
            n, amp = 160 + 80 * (i % 5), 1000 + 500 * (i % 7)
            assert r["duration_ms"] == n * 1000 // 8000
            assert abs(r["rms"] - amp) < 1e-9 and r["mean_luma"] is None


def test_repetition_stats_planted(spark):
    """Planted docs with known gram structure: a fully-repetitive doc
    saturates both signals; an all-distinct doc zeroes them; <3-token
    docs are excluded."""
    import pandas as pd

    from lucene_spark.pipeline.text import repetition_stats

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "ab ab ab ab ab",          # 1 bigram repeated 4x
                    "a b c d e",               # all distinct
                    "x y",                     # too short: excluded
                ],
            }
        )
    )
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["top_bigram_frac"], r["dup_trigram_frac"]
        )
        for r in repetition_stats(spark, docs).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (4, 1.0, 1.0)
    assert got[2] == (4, 0.25, 0.0)


def test_dedup_components_random_graphs_property(spark):
    """Property: on random pair graphs, min-label propagation equals
    union-find (deterministic seeds; covers multi-chain merges, cycles,
    and label collisions a handcrafted case misses)."""
    import numpy as np

    from lucene_spark.pipeline.dedup import dedup_components

    rng = np.random.default_rng(123)
    for trial in range(3):
        n_nodes = int(rng.integers(10, 60))
        n_edges = int(rng.integers(5, 80))
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        pairs = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
        if not pairs:
            continue
        got = {
            (r["doc_id"], r["rep"])
            for r in dedup_components(
                spark, spark.createDataFrame(pairs, "a long, b long")
            ).collect()
        }

        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in pairs:
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        exp = {(x, find(x)) for x in parent}
        assert got == exp, f"trial {trial}"


def test_simhash_skewed_bucket_chunked(spark):
    """Scale-safe SimHash blocking (r4 verdict #5): a mass-duplicate
    corpus puts >chunk docs in ONE bucket of every blocking table; the
    chunked expansion must produce the complete exact pair set without
    materializing a quadratic single row, and the multi-table Manku
    blocking must stay EXACT (all hamming<=3 pairs found)."""
    from lucene_spark.pipeline.dedup import simhash_near_dup

    n = 1200  # > CHUNK=1024 identical docs -> one degenerate bucket
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical prefix content shared by every single row").alias("text"),
    )
    near = simhash_near_dup(spark, docs, max_hamming=3)
    assert near.where(F.col("hamming") != 0).count() == 0
    assert near.count() == n * (n - 1) // 2


def test_simhash_blocking_exactness_radius(spark):
    """Pigeonhole validation: explicit n_blocks too small for the radius
    must be rejected, and the auto-derived family accepts any radius."""
    import pytest as _pytest

    from lucene_spark.pipeline.dedup import simhash_near_dup

    docs = spark.range(4).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text")
    )
    with _pytest.raises(ValueError, match="cannot be exact"):
        simhash_near_dup(spark, docs, max_hamming=4, n_blocks=6, n_keep=3)
    # auto n_blocks: radius 4 -> 7 blocks keep 3
    simhash_near_dup(spark, docs, max_hamming=4).collect()


def test_dedup_components_chain_pointer_doubling(spark):
    """Pointer doubling (r4 verdict #6): a pure chain component — the
    diameter-pathological case — must converge in O(log n) rounds, not
    O(n), and still label every node with the component minimum."""
    import math

    from lucene_spark.pipeline.dedup import dedup_components

    n = 64
    pairs = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    stats: dict = {}
    got = {
        (r["doc_id"], r["rep"])
        for r in dedup_components(spark, pairs, stats=stats).collect()
    }
    assert got == {(i, 0) for i in range(n)}
    assert stats["rounds"] <= int(math.log2(n)) + 2, stats
