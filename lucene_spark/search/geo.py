"""Geo / spatial queries — the LatLonPoint family re-expressed on Catalyst.

Reference semantics (specification only, no code reuse):
  - lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java
    (newBoxQuery / newDistanceQuery / newDistanceFeatureQuery)
  - lucene/core/src/java/org/apache/lucene/document/LatLonPointDistanceQuery.java
  - lucene/core/src/java/org/apache/lucene/document/LatLonPointSortField.java
  - lucene/core/src/java/org/apache/lucene/search/comparators (distance sort
    ties break by docID ASC)
  - lucene/core/src/java/org/apache/lucene/util/SloppyMath.java:44
    haversinMeters (we use the exact haversine closed form in double —
    Lucene's "sloppy" table-driven trig is a CPU optimization for a
    single-node comparator loop, not a semantic)

Spark-first mapping: Lucene encodes (lat, lon) into a BKD tree so box
queries become range scans over the two packed dimensions. Parquet
already maintains per-rowgroup min/max statistics on plain DOUBLE
columns, and Catalyst pushes `lat BETWEEN a AND b AND lon BETWEEN c AND
d` straight into the scan — so the BKD role (skip rowgroups wholly
outside the box) falls out of declaring the filter, with zero custom
index structure. A distance query is the bounding-box prefilter (the
same rowgroup pruning Lucene gets from the BKD crossing visitor) plus
the exact haversine predicate on the survivors; distance sort is a
TakeOrderedAndProject over the haversine expression (per-partition
heaps + k-row merge, never a global sort). At 100 TB, sorting the table
by a space-filling-curve key at write time (Z-order / Hilbert) makes the
rowgroup pruning sharp — the query shapes below are unchanged.

All math is double precision end-to-end so the DuckDB oracle can
replicate it bit-for-bit-close (gate rounds to 4 decimals of a meter).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GeoUtils.EARTH_MEAN_RADIUS_METERS (reference
# lucene/core/src/java/org/apache/lucene/geo/GeoUtils.java:51)
EARTH_MEAN_RADIUS_METERS = 6371008.7714


def haversine_meters(
    lat1: Column | float, lon1: Column | float, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters, exact haversine in double
    (SloppyMath.haversinMeters semantics without the sloppy trig).

    h = sin^2(dLat/2) + cos(lat1) * cos(lat2) * sin^2(dLon/2)
    d = 2 * R * asin(sqrt(h))
    """
    rlat1, rlon1 = F.radians(F.lit(lat1)), F.radians(F.lit(lon1))
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    sdlat = F.sin((rlat2 - rlat1) / 2)
    sdlon = F.sin((rlon2 - rlon1) / 2)
    h = sdlat * sdlat + F.cos(rlat1) * F.cos(rlat2) * sdlon * sdlon
    return F.lit(2.0 * EARTH_MEAN_RADIUS_METERS) * F.asin(F.sqrt(h))


def box_filter(
    lat: Column,
    lon: Column,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> Column:
    """LatLonPoint.newBoxQuery predicate. When ``min_lon > max_lon`` the
    box crosses the dateline and splits into two longitude ranges
    (LatLonPoint.java newBoxQuery's two-query rewrite)."""
    lat_ok = (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
    if min_lon > max_lon:  # dateline crossing
        lon_ok = (lon >= F.lit(min_lon)) | (lon <= F.lit(max_lon))
    else:
        lon_ok = (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
    return lat_ok & lon_ok


def box_search(
    points: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Docs inside the box — a pure pushed-down range scan."""
    return points.where(
        box_filter(F.col(lat_col), F.col(lon_col), min_lat, max_lat, min_lon, max_lon)
    )


def _bounding_box(lat: float, radius_m: float) -> tuple[float, float, float, float]:
    """Conservative lat/lon bounding box for a distance query — the
    pushed-down prefilter (the BKD-pruning analog). Over-approximates
    (clamps at the poles / full longitude span near them); the exact
    haversine predicate runs only on rowgroups that survive it."""
    import math

    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    min_lat, max_lat = max(-90.0, lat - dlat), min(90.0, lat + dlat)
    # meridians converge poleward: the needed longitude half-width is
    # dlat / cos(lat), maximized at the largest |lat| the box reaches —
    # use that (smallest cos) so the box is conservative everywhere
    coslat = math.cos(math.radians(max(abs(min_lat), abs(max_lat))))
    if coslat <= 1e-9 or max_lat >= 89.9 or min_lat <= -89.9:
        return min_lat, max_lat, -180.0, 180.0
    dlon = dlat / coslat
    return min_lat, max_lat, max(-180.0, -dlon), min(180.0, dlon)


def distance_search(
    points: DataFrame,
    lat: float,
    lon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPoint.newDistanceQuery: docs within ``radius_m`` meters of
    (lat, lon), with a pushed-down bounding-box prefilter so parquet
    rowgroup stats prune before any trig runs, plus a ``dist_m``
    column."""
    min_lat, max_lat, dlon_lo, dlon_hi = _bounding_box(lat, radius_m)
    lon_lo, lon_hi = lon + dlon_lo, lon + dlon_hi
    if lon_lo < -180.0 or lon_hi > 180.0:
        lon_lo, lon_hi = -180.0, 180.0  # wrap: disable the lon prefilter
    pre = points.where(
        box_filter(F.col(lat_col), F.col(lon_col), min_lat, max_lat, lon_lo, lon_hi)
    )
    d = haversine_meters(lat, lon, F.col(lat_col), F.col(lon_col))
    return pre.withColumn("dist_m", d).where(F.col("dist_m") <= F.lit(radius_m))


def nearest(
    points: DataFrame,
    lat: float,
    lon: float,
    k: int,
    id_col: str = "docID",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPointSortField: top-k nearest docs, distance ASC, id ASC
    tie-break — TakeOrderedAndProject, never a global sort."""
    d = haversine_meters(lat, lon, F.col(lat_col), F.col(lon_col))
    return (
        points.withColumn("dist_m", d)
        .orderBy(F.asc("dist_m"), F.asc(id_col))
        .limit(k)
    )


def distance_feature(
    lat: float,
    lon: float,
    lat_col: Column,
    lon_col: Column,
    pivot_m: float,
    weight: float = 1.0,
) -> Column:
    """LatLonPoint.newDistanceFeatureQuery score contribution:
    ``weight * pivot / (pivot + distance)`` — 1.0 at the origin, 0.5 at
    the pivot distance, decaying toward 0 (reference
    document/LatLonPointDistanceFeatureQuery.java:60). Add it to a BM25
    score column as a SHOULD-clause boost."""
    d = haversine_meters(lat, lon, lat_col, lon_col)
    return F.lit(weight) * F.lit(pivot_m) / (F.lit(pivot_m) + d)


def _polygon_edges(
    vertices: list[tuple[float, float]],
) -> list[tuple[float, float, float, float]]:
    """Non-horizontal edges (y1, x1, y2, x2) of the closed polygon.
    Horizontal edges (y1 == y2) never straddle a test latitude, so the
    crossing-number test skips them entirely (and skipping them keeps
    the predicate division-free, see polygon_filter)."""
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    edges = []
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        if y1 != y2:
            edges.append((float(y1), float(x1), float(y2), float(x2)))
    return edges


def polygon_filter(
    lat: Column, lon: Column, vertices: list[tuple[float, float]]
) -> Column:
    """LatLonPoint.newPolygonQuery predicate (reference
    document/LatLonPoint.java newPolygonQuery + geo/Polygon2D.java
    crossing-number containment): a point is inside when a ray to the
    east crosses an odd number of edges.

    The classic PNPOLY test divides by (y2 - y1); because the vertices
    are plan-time literals we instead multiply through and pick the
    comparison direction per edge, so the whole predicate is add/mul/
    compare on doubles — bit-identical between Spark and any ANSI-SQL
    oracle (polygon_sql generates the same arithmetic). Points exactly
    on an edge follow the same half-open convention as PNPOLY.
    """
    crossings = None
    for y1, x1, y2, x2 in _polygon_edges(vertices):
        straddle = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        # lon < (x2-x1) * (lat-y1) / (y2-y1) + x1, multiplied through
        # by (y2-y1) whose sign is known at plan time
        lhs = (lon - F.lit(x1)) * F.lit(y2 - y1)
        rhs = F.lit(x2 - x1) * (lat - F.lit(y1))
        cross = straddle & (lhs < rhs if y2 > y1 else lhs > rhs)
        c = F.when(cross, F.lit(1)).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    return crossings % 2 == 1


def polygon_search(
    points: DataFrame,
    vertices: list[tuple[float, float]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Docs inside the polygon. A bounding-box prefilter (implied by
    containment, so semantics-free) goes first — that is the pushable
    range predicate parquet rowgroup stats can prune on, exactly the
    role of the BKD tree's bounding-box visit in the reference; the
    exact crossing-number test runs only on box survivors."""
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    pre = points.where(
        box_filter(
            F.col(lat_col), F.col(lon_col),
            min(lats), max(lats), min(lons), max(lons),
        )
    )
    return pre.where(polygon_filter(F.col(lat_col), F.col(lon_col), vertices))


def polygon_sql(
    vertices: list[tuple[float, float]], lat_expr: str, lon_expr: str
) -> str:
    """ANSI-SQL twin of polygon_filter — the SAME edge arithmetic, for
    oracle duels. Returns a boolean SQL expression over lat/lon exprs."""
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    terms = []
    for y1, x1, y2, x2 in _polygon_edges(vertices):
        op = "<" if y2 > y1 else ">"
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr}))"
            f" AND (({lon_expr} - {x1!r}) * {y2 - y1!r}"
            f" {op} {x2 - x1!r} * ({lat_expr} - {y1!r}))"
            " THEN 1 ELSE 0 END)"
        )
    box = (
        f"{lat_expr} >= {min(lats)!r} AND {lat_expr} <= {max(lats)!r}"
        f" AND {lon_expr} >= {min(lons)!r} AND {lon_expr} <= {max(lons)!r}"
    )
    return f"(({box}) AND ((" + " + ".join(terms) + ") % 2 = 1))"
