"""st_* SQL-surface tests, transcribing the shape of GeoMesa's
SparkSQLSpatialRelationshipsTest / GeometricDistanceTest /
GeometricConstructorsTest (SURVEY.md §5.1): a WKT box grid + probe
points with exact expected id sets, via BOTH the DataFrame API and
SQL-registered functions."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from geomesa_spark.functions import geometry as geo
from geomesa_spark.functions import st_functions as ST


@pytest.fixture(scope="module")
def registered(spark):
    ST.register_all(spark)
    return spark


# 3x3 box grid, 10-degree boxes at (10i, 10j)..(10i+10, 10j+10)
BOXES = [
    (i * 3 + j, f"POLYGON (({10*i} {10*j}, {10*i+10} {10*j}, {10*i+10} {10*j+10}, {10*i} {10*j+10}, {10*i} {10*j}))")
    for i in range(3)
    for j in range(3)
]
# probe points: centers of each box + corners + far outside
PROBES = [(b[0], f"POINT ({10*(b[0]//3)+5} {10*(b[0]%3)+5})") for b in BOXES] + [
    (100, "POINT (-50 -50)"),
    (101, "POINT (35 35)"),
]


def test_contains_box_grid_matrix(registered):
    spark = registered
    rows = [(pid, pw, bid, bw) for pid, pw in PROBES for bid, bw in BOXES]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["pid", "pw", "bid", "bw"]))
    got = (
        df.where(ST.st_contains(F.col("bw"), F.col("pw")))
        .select("pid", "bid")
        .toPandas()
    )
    # each center probe is inside exactly its own box; outliers in none
    expect = {(i, i) for i in range(9)}
    assert set(map(tuple, got.to_numpy())) == expect


def test_sql_registration_parity(registered):
    spark = registered
    out = spark.sql(
        "select st_contains('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', st_point(5.0d, 5.0d)) a, "
        "st_contains('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))', st_point(15.0d, 5.0d)) b, "
        "st_x(st_point(3.5d, -7.25d)) x, st_y(st_point(3.5d, -7.25d)) y"
    ).collect()[0]
    assert out["a"] is True and out["b"] is False
    assert out["x"] == 3.5 and out["y"] == -7.25


def test_constructors_accessors(registered):
    spark = registered
    df = spark.range(1).select(
        ST.st_makeBBOX(F.lit(-10.0), F.lit(-5.0), F.lit(10.0), F.lit(5.0)).alias("box")
    )
    row = df.select(
        ST.st_area(F.col("box")).alias("area"),
        ST.st_numPoints(F.col("box")).alias("np"),
        ST.st_centroid(F.col("box")).alias("cen"),
        ST.st_envelope(F.col("box")).alias("env"),
    ).collect()[0]
    assert row["area"] == pytest.approx(200.0)
    assert row["np"] == 5
    assert "POINT" in row["cen"]
    kind, c, o = geo.parse_wkt(row["cen"])
    assert c[0, 0] == pytest.approx(0.0) and c[0, 1] == pytest.approx(0.0)
    assert geo.parse_wkt(row["env"])[0] == "POLYGON"


def test_distance_functions(registered):
    spark = registered
    row = spark.range(1).select(
        ST.st_distance(
            ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(F.lit(3.0), F.lit(4.0))
        ).alias("planar"),
        ST.st_distanceSphere(
            ST.st_point(F.lit(0.0), F.lit(0.0)), ST.st_point(F.lit(0.0), F.lit(1.0))
        ).alias("sphere"),
    ).collect()[0]
    assert row["planar"] == pytest.approx(5.0)
    # one degree of latitude ≈ 111.2 km on the mean-radius sphere
    assert row["sphere"] == pytest.approx(111_194.93, rel=1e-3)


def test_processing_and_output(registered):
    spark = registered
    row = spark.range(1).select(
        ST.st_bufferPoint(F.lit(10.0), F.lit(50.0), F.lit(10000.0)).alias("buf"),
        ST.st_asGeoJSON(F.lit("POINT (1.5 2.5)")).alias("gj"),
        ST.st_convexHull(F.lit("LINESTRING (0 0, 4 0, 4 4, 2 1)")).alias("hull"),
        ST.st_idlSafeGeom(F.lit("POLYGON ((170 0, -170 0, -170 10, 170 10, 170 0))")).alias("idl"),
    ).collect()[0]
    kind, c, o = geo.parse_wkt(row["buf"])
    assert kind == "POLYGON"
    # buffer contains the center
    assert bool(geo.points_in_polygon(np.array([10.0]), np.array([50.0]), c, o)[0])
    gj = json.loads(row["gj"])
    assert gj == {"type": "Point", "coordinates": [1.5, 2.5]}
    hk, hc, ho = geo.parse_wkt(row["hull"])
    assert hk == "POLYGON" and len(hc) == 4  # triangle ring closed (interior point dropped)
    assert row["idl"].startswith("MULTIPOLYGON")


def test_cell_functions(registered):
    spark = registered
    row = spark.range(1).select(
        ST.st_geoHash(F.lit(2.351), F.lit(48.857), F.lit(9)).alias("gh"),
        ST.st_z2(F.lit(0.0), F.lit(0.0)).alias("z2"),
        ST.st_s2(F.lit(2.351), F.lit(48.857), F.lit(12)).alias("s2"),
    ).collect()[0]
    assert row["gh"].startswith("u09")  # Paris geohash prefix (public fact)
    assert row["z2"] >= 0
    assert row["s2"] != 0


def test_intersects_pairs(registered):
    spark = registered
    pairs = [
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))", True),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))", False),
        ("POINT (5 5)", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", True),
        ("POINT (50 50)", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", False),
    ]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["a", "b", "expect"]))
    got = df.select(ST.st_intersects(F.col("a"), F.col("b")).alias("got"), "expect").collect()
    for r in got:
        assert r["got"] == r["expect"]
