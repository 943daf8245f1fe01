"""r5 batch 3: ASCII folding, infix suggester, diversified top-k,
QueryRescorer, polygon geo, and deterministic sampling.

Reference semantics:
  - ASCIIFoldingFilter (analysis/common/.../miscellaneous/
    ASCIIFoldingFilter.java:61)
  - AnalyzingInfixSuggester (suggest/.../analyzing/AnalyzingInfixSuggester.java:82)
  - DiversifiedTopDocsCollector (misc/.../search/DiversifiedTopDocsCollector.java:47)
  - QueryRescorer (core/.../search/QueryRescorer.java:42)
  - LatLonPoint.newPolygonQuery (core/.../document/LatLonPoint.java,
    geo/Polygon2D.java crossing-number containment)
"""
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lucene_spark.analysis.folding import ascii_fold

# -- ASCII folding ----------------------------------------------------------

GOLDENS = [
    ("café", "cafe"),
    ("naïve", "naive"),
    ("müller", "muller"),
    ("straße", "strasse"),
    ("œuvre", "oeuvre"),
    ("møller", "moller"),
    ("łódź", "lodz"),
    ("ﬁle", "file"),       # NFKD ligature
    ("þing", "thing"),     # thorn
    ("señor", "senor"),
    ("東京", "東京"),       # no ASCII equivalent -> unchanged
    ("abc123", "abc123"),  # ASCII passthrough
]


@pytest.mark.parametrize("src,want", GOLDENS)
def test_ascii_fold_goldens(src, want):
    assert ascii_fold(src) == want


def test_ascii_fold_ascii_identity_object():
    w = "plain"
    assert ascii_fold(w) is w  # no allocation on the ASCII fast path


def test_fold_registered_in_chain():
    from lucene_spark.analysis.porter import TOKEN_FILTERS, filter_vocab

    assert TOKEN_FILTERS["ascii_folding"] is ascii_fold
    vocab, remap = filter_vocab(["café", "cafe", "naïve"], ["ascii_folding"])
    assert vocab == ["cafe", "naive"]
    assert list(remap) == [0, 0, 1]


@pytest.fixture(scope="module")
def folded_index(spark, tmp_path_factory):
    import shutil

    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    rows = [
        Row(repo="r", path="a", commit="0", lang="fr",
            content="le café du quartier"),
        Row(repo="r", path="b", commit="0", lang="en",
            content="the cafe on the corner"),
        Row(repo="r", path="c", commit="0", lang="de",
            content="die straße nach münchen"),
        Row(repo="r", path="d", commit="0", lang="en",
            content="unrelated words entirely"),
    ]
    docs = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("fold") / "idx")
    manifest = build_index(
        spark, docs, out, partitions=2, token_filters=("ascii_folding",)
    )
    s = IndexSearcher(spark, out)
    yield manifest, s
    shutil.rmtree(out, ignore_errors=True)


def test_folded_index_merges_variants(folded_index):
    _, s = folded_index
    # café (doc a) and cafe (doc b) share one postings list
    hits = {r["docID"] for r in s.search("café", k=10).collect()}
    assert hits == {0, 1}
    hits2 = {r["docID"] for r in s.search("cafe", k=10).collect()}
    assert hits2 == {0, 1}
    # strasse query-side folds to match straße in the index
    hits3 = {r["docID"] for r in s.search("straße", k=10).collect()}
    assert hits3 == {2}


# -- infix suggester ---------------------------------------------------------

def test_suggest_infix_matches_naive(built_index):
    _, _, searcher = built_index
    got = [
        (r["term"], r["df"])
        for r in searcher.suggest_infix("en", k=10).collect()
    ]
    allterms = [
        (r["term"], r["df"]) for r in searcher.terms_table.collect()
    ]
    want = sorted(
        [(t, d) for t, d in allterms if "en" in t],
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert got == want
    assert any("en" in t and not t.startswith("en") for t, _ in got)


# -- diversified top-k -------------------------------------------------------

def test_search_diversified_one_per_repo(built_index):
    _, _, searcher = built_index
    q = ["license", "getvalue0"]
    out = searcher.search_diversified(q, k=10, max_per_key=1).collect()
    repos = [r["repo"] for r in out]
    assert len(repos) == len(set(repos)), "one hit per key violated"

    # expected: rank the FULL scored set, keep first per repo, top-10
    n = searcher.manifest["doc_count"]
    full = searcher.search(q, k=n).collect()
    key = {
        r["docID"]: r["repo"]
        for r in searcher.docmap.select("docID", "repo").collect()
    }
    seen, want = set(), []
    for r in sorted(full, key=lambda r: (-r["score"], r["docID"])):
        k = key[int(r["docID"])]
        if k in seen:
            continue
        seen.add(k)
        want.append((int(r["docID"]), float(r["score"])))
    want = want[:10]
    got = [(int(r["docID"]), float(r["score"])) for r in out]
    assert got == want


def test_search_diversified_cap2(built_index):
    _, _, searcher = built_index
    out = searcher.search_diversified(
        ["license"], k=20, max_per_key=2
    ).collect()
    from collections import Counter

    per = Counter(r["repo"] for r in out)
    assert all(v <= 2 for v in per.values())


# -- rescorer ----------------------------------------------------------------

def test_rescore_combines_scores(built_index):
    _, _, searcher = built_index
    n = searcher.manifest["doc_count"]
    first = searcher.search(["getvalue0", "var0"], k=30)
    got = [
        (int(r["docID"]), float(r["score"]))
        for r in searcher.rescore(first, "license", weight=2.0, k=10).collect()
    ]
    f = {int(r["docID"]): float(r["score"]) for r in first.collect()}
    s2 = {
        int(r["docID"]): float(r["score"])
        for r in searcher.search("license", k=n).collect()
    }
    comb = {
        d: np.float32(np.float64(sf) + 2.0 * np.float64(s2.get(d, 0.0)))
        for d, sf in f.items()
    }
    want = sorted(comb.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [(d, pytest.approx(v, rel=1e-6)) for d, v in want] == got


def test_rescore_missing_second_query(built_index):
    _, _, searcher = built_index
    first = searcher.search(["license"], k=10)
    out = searcher.rescore(first, "zzzznotaterm", weight=5.0, k=10).collect()
    base = first.collect()
    assert [(r["docID"], r["score"]) for r in out] == [
        (r["docID"], r["score"]) for r in base
    ]


# -- polygon ----------------------------------------------------------------

POLY = [
    (50.005, -120.005),
    (60.005, 10.005),
    (20.005, 140.005),
    (-55.005, 60.005),
    (0.005, 0.005),
    (-40.005, -90.005),
]


def _pnpoly(lat, lon, verts):
    """Classic division-form PNPOLY as the independent reference."""
    inside = np.zeros_like(lat, dtype=bool)
    n = len(verts)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        if y1 == y2:
            continue
        straddle = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= straddle & (lon < xint)
    return inside


def test_polygon_filter_matches_pnpoly(spark):
    from lucene_spark.search.geo import polygon_search

    ids = np.arange(4000)
    lat = ((ids * 7919) % 18000) / 100.0 - 90.0
    lon = ((ids * 12347) % 36000) / 100.0 - 180.0
    want = set(ids[_pnpoly(lat, lon, POLY)].tolist())
    assert want, "polygon selects nothing — test vacuous"
    df = spark.createDataFrame(
        [(int(i), float(a), float(o)) for i, a, o in zip(ids, lat, lon)],
        "id long, lat double, lon double",
    )
    got = {r["id"] for r in polygon_search(df, POLY).collect()}
    assert got == want


def test_polygon_sql_twin_matches(spark):
    import duckdb

    from lucene_spark.search.geo import polygon_search, polygon_sql

    ids = np.arange(3000)
    lat = ((ids * 7919) % 18000) / 100.0 - 90.0
    lon = ((ids * 12347) % 36000) / 100.0 - 180.0
    df = spark.createDataFrame(
        [(int(i), float(a), float(o)) for i, a, o in zip(ids, lat, lon)],
        "id long, lat double, lon double",
    )
    got = {r["id"] for r in polygon_search(df, POLY).collect()}
    pred = polygon_sql(POLY, "lat", "lon")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT unnest(range(3000)) AS id"
    )
    con.execute(
        "CREATE TABLE p AS SELECT id, ((id * 7919) % 18000) / 100.0 - 90.0 AS lat,"
        " ((id * 12347) % 36000) / 100.0 - 180.0 AS lon FROM pts"
    )
    want = {r[0] for r in con.execute(f"SELECT id FROM p WHERE {pred}").fetchall()}
    assert got == want


def test_polygon_rejects_degenerate():
    from lucene_spark.search.geo import _polygon_edges

    with pytest.raises(ValueError):
        _polygon_edges([(0.0, 0.0), (1.0, 1.0)])


# -- sampling ----------------------------------------------------------------

def test_cap_per_key_salted_equals_unsalted(spark):
    from lucene_spark.pipeline.sample import cap_per_key

    rows = [(f"k{i % 3}", i, f"txt{i * 17 % 101}") for i in range(300)]
    df = spark.createDataFrame(rows, "key string, id long, text string")
    order = [F.md5(F.col("text").cast("binary")), F.col("id")]
    plain = {(r["key"], r["id"]) for r in cap_per_key(df, "key", 7, order).collect()}
    salted = {
        (r["key"], r["id"])
        for r in cap_per_key(df, "key", 7, order, salt=8).collect()
    }
    assert plain == salted
    from collections import Counter

    per = Counter(k for k, _ in plain)
    assert all(v == 7 for v in per.values())


def test_cap_per_key_matches_pandas(spark):
    from lucene_spark.pipeline.sample import cap_per_key

    import hashlib

    rows = [(f"k{i % 5}", i, f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "key string, id long, text string")
    got = {
        (r["key"], r["id"])
        for r in cap_per_key(
            df, "key", 3, [F.md5(F.col("text").cast("binary")), F.col("id")]
        ).collect()
    }
    want = set()
    by_key = {}
    for k, i, t in rows:
        by_key.setdefault(k, []).append(
            (hashlib.md5(t.encode()).hexdigest(), i, k)
        )
    for k, lst in by_key.items():
        for h, i, kk in sorted(lst)[:3]:
            want.add((kk, i))
    assert got == want


def test_hash_sample_deterministic_and_nested(spark):
    from lucene_spark.pipeline.sample import hash_sample

    rows = [(i, f"content {i} {i * i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, text string")
    a1 = {r["id"] for r in hash_sample(df, 0.3, "text").collect()}
    a2 = {r["id"] for r in hash_sample(df, 0.3, "text").collect()}
    assert a1 == a2
    small = {r["id"] for r in hash_sample(df, 0.1, "text").collect()}
    assert small <= a1  # prefix thresholds nest
    assert 0.2 < len(a1) / 1000 < 0.4  # loose Bernoulli bound
    assert len(small) < len(a1)


def test_hash_sample_bounds(spark):
    from lucene_spark.pipeline.sample import hash_sample

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    assert hash_sample(df, 0.0, "text").count() == 0
    assert hash_sample(df, 1.0, "text").count() == 1
    with pytest.raises(ValueError):
        hash_sample(df, 1.5, "text")
