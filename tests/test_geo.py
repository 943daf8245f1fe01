"""Geo queries (LatLonPoint family) vs a numpy haversine oracle."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.geo import (
    EARTH_MEAN_RADIUS_METERS,
    _bounding_box,
    box_search,
    distance_feature,
    distance_search,
    haversine_meters,
    nearest,
)


def _np_haversine(lat1, lon1, lat2, lon2):
    rl1, ro1 = np.radians(lat1), np.radians(lon1)
    rl2, ro2 = np.radians(lat2), np.radians(lon2)
    h = (
        np.sin((rl2 - rl1) / 2) ** 2
        + np.cos(rl1) * np.cos(rl2) * np.sin((ro2 - ro1) / 2) ** 2
    )
    return 2 * EARTH_MEAN_RADIUS_METERS * np.arcsin(np.sqrt(h))


@pytest.fixture(scope="module")
def points(spark):
    """Deterministic lattice of 2000 points keyed by docID."""
    ids = np.arange(2000)
    lat = ((ids * 7919) % 18000) / 100.0 - 90.0
    lon = ((ids * 12347) % 36000) / 100.0 - 180.0
    pdf = list(zip(ids.tolist(), lat.tolist(), lon.tolist()))
    df = spark.createDataFrame(pdf, "docID long, lat double, lon double")
    return df, ids, lat, lon


def test_haversine_matches_numpy(spark, points):
    df, ids, lat, lon = points
    got = (
        df.withColumn("d", haversine_meters(48.85, 2.35, F.col("lat"), F.col("lon")))
        .orderBy("docID")
        .select("d")
        .toPandas()["d"]
        .to_numpy()
    )
    want = _np_haversine(48.85, 2.35, lat, lon)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-6)


def test_box_search(spark, points):
    df, ids, lat, lon = points
    got = sorted(
        r.docID for r in box_search(df, 10.0, 50.0, -20.0, 40.0).collect()
    )
    want = sorted(
        ids[(lat >= 10) & (lat <= 50) & (lon >= -20) & (lon <= 40)].tolist()
    )
    assert got == want and len(want) > 0


def test_box_dateline_crossing(spark, points):
    df, ids, lat, lon = points
    got = sorted(
        r.docID for r in box_search(df, -30.0, 30.0, 170.0, -170.0).collect()
    )
    want = sorted(
        ids[(lat >= -30) & (lat <= 30) & ((lon >= 170) | (lon <= -170))].tolist()
    )
    assert got == want and len(want) > 0


def test_distance_search_matches_exact(spark, points):
    df, ids, lat, lon = points
    radius = 2_000_000.0
    got = sorted(r.docID for r in distance_search(df, 48.85, 2.35, radius).collect())
    want = sorted(ids[_np_haversine(48.85, 2.35, lat, lon) <= radius].tolist())
    assert got == want and len(want) > 0


def test_bounding_box_is_conservative_at_high_lat(spark, points):
    # near-pole query: the lon prefilter must not drop true hits
    df, ids, lat, lon = points
    radius = 1_500_000.0
    got = sorted(r.docID for r in distance_search(df, 85.0, 10.0, radius).collect())
    want = sorted(ids[_np_haversine(85.0, 10.0, lat, lon) <= radius].tolist())
    assert got == want and len(want) > 0
    # and the helper really over-approximates: every in-radius point
    # falls inside the box
    min_lat, max_lat, dlo, dhi = _bounding_box(85.0, radius)
    m = _np_haversine(85.0, 10.0, lat, lon) <= radius
    assert (lat[m] >= min_lat - 1e-9).all() and (lat[m] <= max_lat + 1e-9).all()


def test_nearest_order_and_ties(spark, points):
    df, ids, lat, lon = points
    rows = nearest(df, 0.0, 0.0, 15).collect()
    d = _np_haversine(0.0, 0.0, lat, lon)
    order = sorted(zip(d.tolist(), ids.tolist()))[:15]
    assert [(r.docID) for r in rows] == [i for _, i in order]
    assert all(
        abs(r.dist_m - dd) < 1e-6 for r, (dd, _) in zip(rows, order)
    )


def test_distance_feature_closed_form(spark, points):
    df, ids, lat, lon = points
    pivot = 1_000_000.0
    got = (
        df.withColumn(
            "f",
            distance_feature(10.0, 20.0, F.col("lat"), F.col("lon"), pivot, weight=2.0),
        )
        .orderBy("docID")
        .select("f")
        .toPandas()["f"]
        .to_numpy()
    )
    d = _np_haversine(10.0, 20.0, lat, lon)
    want = 2.0 * pivot / (pivot + d)
    assert np.allclose(got, want, rtol=1e-12)
    # score is 1*weight at origin, weight/2 at the pivot distance
    assert math.isclose(2.0 * pivot / (pivot + 0.0), 2.0)


def test_box_filter_pushdown(spark, tmp_path):
    """The box predicate must reach the parquet scan (BKD analog)."""
    ids = np.arange(500)
    lat = ((ids * 7919) % 18000) / 100.0 - 90.0
    lon = ((ids * 12347) % 36000) / 100.0 - 180.0
    p = str(tmp_path / "pts.parquet")
    spark.createDataFrame(
        list(zip(ids.tolist(), lat.tolist(), lon.tolist())),
        "docID long, lat double, lon double",
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    plan = (
        box_search(df, 10.0, 50.0, -20.0, 40.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lat,10.0)" in plan
