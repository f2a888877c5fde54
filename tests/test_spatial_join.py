"""Spatial-join tests: row-for-row vs the exhaustive numpy oracle,
salting invariance, semi/anti flavors, loose-bbox superset, dwithin."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators import spatial_join as sj
from geomesa_spark.sources import synth
from tests.oracle import brute_dwithin, brute_pip_join

N = 20_000


@pytest.fixture(scope="module")
def points_pdf():
    ids = np.arange(N, dtype=np.uint64)
    lon = -180.0 + (synth.hash64(ids).astype(np.float64) / 2.0**64) * 360.0
    lat = -90.0 + (synth.hash64(ids + np.uint64(99)).astype(np.float64) / 2.0**64) * 180.0
    # drop 30% of points near a hot city to force a hot cell
    hot = synth.HOT_CITIES[0]
    m = ids % np.uint64(10) < np.uint64(3)
    lon[m] = hot[1] + (synth.hash64(ids[m] + np.uint64(5)).astype(np.float64) / 2.0**64 - 0.5) * 0.5
    lat[m] = hot[2] + (synth.hash64(ids[m] + np.uint64(6)).astype(np.float64) / 2.0**64 - 0.5) * 0.5
    return pd.DataFrame({"pid": ids.astype(np.int64), "lon": lon, "lat": lat})


@pytest.fixture(scope="module")
def points_df(spark, points_pdf):
    df = spark.createDataFrame(points_pdf).repartition(8).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def polys():
    return synth.polygons()


@pytest.fixture(scope="module")
def oracle_pairs(points_pdf, polys):
    return brute_pip_join(points_pdf.set_index("pid"), polys)


def _pairs(df):
    return set((r["pid"], r["polygon_id"]) for r in df.select("pid", "polygon_id").collect())


def test_broadcast_pip_join_matches_oracle(points_df, polys, oracle_pairs):
    got = _pairs(sj.broadcast_pip_join(points_df, polys))
    assert got == oracle_pairs


def test_cover_full_cells_short_circuit(polys):
    cover = sj.polygon_cover_pdf(polys, level=8)
    # big grid boxes must contain some fully-inside cells (refine skipped)
    assert cover["full"].sum() > 100
    assert not cover.duplicated(["cell", "polygon_id"]).any()


def test_grid_pip_join_salted_matches_broadcast(points_df, polys, oracle_pairs):
    got = _pairs(sj.grid_pip_join(points_df, polys, salt=4, point_key_col="pid"))
    assert got == oracle_pairs
    # and with salting forced off
    got_nosalt = _pairs(sj.grid_pip_join(points_df, polys, skew_cells=[], point_key_col="pid"))
    assert got_nosalt == oracle_pairs


def test_hot_cells_detected(points_df, polys):
    pts = sj.with_grid_cell(points_df)
    hot = sj.hot_cells(pts, threshold_fraction=0.05)
    assert len(hot) >= 1  # the alphaville cell concentration


def test_semi_anti(points_df, polys, points_pdf, oracle_pairs):
    covered_pids = {p for p, _ in oracle_pairs}
    semi = sj.broadcast_pip_join(points_df, polys, how="left_semi", point_key=["pid"])
    anti = sj.broadcast_pip_join(points_df, polys, how="left_anti", point_key=["pid"])
    semi_ids = {r["pid"] for r in semi.select("pid").collect()}
    anti_ids = {r["pid"] for r in anti.select("pid").collect()}
    assert semi_ids == covered_pids
    assert anti_ids == set(points_pdf["pid"]) - covered_pids
    assert len(semi_ids) + len(anti_ids) == N


def test_loose_bbox_superset(points_df, polys, oracle_pairs):
    loose = _pairs(sj.broadcast_pip_join(points_df, polys, refine=False))
    assert loose >= oracle_pairs


def test_distance_join_matches_oracle(points_df, points_pdf):
    queries = pd.DataFrame(
        {"qid": [0, 1, 2], "lon": [2.351, -74.006, 100.0], "lat": [48.857, 40.713, -20.0]}
    )
    got = set(
        (r["qid"], r["pid"])
        for r in sj.distance_join(points_df, queries, radius_m=200_000.0).select("qid", "pid").collect()
    )
    want = brute_dwithin(points_pdf, queries, 200_000.0)
    assert got == want


def test_broadcast_join_plan_is_broadcast_and_pushes_filters(points_df, polys):
    plan = sj.broadcast_pip_join(points_df, polys)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_spatial_join_auto_strategy_flips_on_cover_size(points_df, polys, oracle_pairs):
    # small cover → broadcast plan
    auto = sj.spatial_join(points_df, polys, strategy="auto")
    plan_b = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b
    # force the salted SMJ path by shrinking the broadcast budget
    salted = sj.spatial_join(
        points_df, polys, strategy="auto", broadcast_max_cover=1, point_key_col="pid"
    )
    plan_s = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_s and "BroadcastHashJoin" not in plan_s.split("SortMergeJoin")[0]
    # both strategies produce identical pairs
    assert _pairs(auto) == oracle_pairs
    assert _pairs(salted) == oracle_pairs


def test_hot_cells_sampled_matches_full(points_df):
    pts = sj.with_grid_cell(points_df)
    full = set(sj.hot_cells(pts, threshold_fraction=0.05, sample_fraction=1.0))
    sampled = set(sj.hot_cells(pts, threshold_fraction=0.05, sample_fraction=0.05))
    # the 30%-concentration hot cell must be found by the 5% sample
    assert full and full <= sampled
