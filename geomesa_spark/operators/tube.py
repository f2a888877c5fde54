"""Spatio-temporal corridor ("tube select") and as-of joins
(SURVEY.md §2.4; reference semantics: ``proc/tube/TubeSelectProcess.scala``
+ ``TubeBuilder`` — join a track's space×time tube against features).

Spark-first rewrite: the track is a small ordered set of fixes
(broadcastable); candidates come from a cell equi-join (the same grid the
other spatial operators key on), then an exact refine on distance and
time tolerance — two-phase like every join here. The as-of variant tags
each matched point with the LAST track fix at-or-before it (ranking
window), the streaming/temporal-join analog.

Both operators are DuckDB-oracle-expressible with the planar metric and
integer epoch arithmetic (contract.py wires them in).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.operators.knn import planar_dist2_expr
from geomesa_spark.operators.spatial_join import with_grid_cell


def _track_cells(track_pdf: pd.DataFrame, radius_deg: float, level: int) -> pd.DataFrame:
    """(cell, fix_id, t_lon, t_lat, t_sec) candidate-cell rows for each
    track fix: the cell disk covering the fix's radius (driver-side,
    tiny — the tube is the dim side)."""
    nx, ny = C.grid_shape(level)
    rx = int(radius_deg / (360.0 / nx)) + 1
    ry = int(radius_deg / (180.0 / ny)) + 1
    rows = []
    for fix in track_pdf.itertuples(index=False):
        center = int(C.grid_encode(np.array([fix.lon]), np.array([fix.lat]), level)[0])
        for cell in C.grid_disk(center, max(rx, ry), level):
            rows.append((int(cell), int(fix.fix_id), float(fix.lon), float(fix.lat), int(fix.ts_sec)))
    return pd.DataFrame(rows, columns=["cell", "fix_id", "t_lon", "t_lat", "t_sec"])


def tube_select(
    points: DataFrame,
    track_pdf: pd.DataFrame,
    radius_deg: float,
    time_tol_sec: int,
    level: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_sec_col: str = "ts_sec",
) -> DataFrame:
    """Points inside the track's space×time tube: within ``radius_deg``
    (planar degrees) of some fix AND within ``time_tol_sec`` of that
    fix's time. track_pdf: (fix_id, lon, lat, ts_sec)."""
    spark = points.sparkSession
    cand = spark.createDataFrame(_track_cells(track_pdf, radius_deg, level))
    pts = with_grid_cell(points, lon_col, lat_col, level)
    j = pts.join(F.broadcast(cand), "cell", "inner")
    dist2 = planar_dist2_expr("t_lon", "t_lat", lon_col, lat_col)
    return (
        j.withColumn("dist2", dist2)
        .where(
            (F.col("dist2") <= radius_deg * radius_deg)
            & (F.abs(F.col(ts_sec_col) - F.col("t_sec")) <= time_tol_sec)
        )
        .drop("cell")
    )


def asof_join(
    points: DataFrame,
    track_pdf: pd.DataFrame,
    point_id_col: str = "pid",
    ts_sec_col: str = "ts_sec",
) -> DataFrame:
    """As-of join: for each point, the LAST track fix with
    ``t_sec <= point.ts_sec`` (ties broken by highest fix_id). Points
    before the first fix drop out.

    Scale-safe implementation: the track is sorted once on the driver and
    closed over by an Arrow-batched ``searchsorted`` UDF — each point
    emits exactly ONE row (its matched fix_id), so there is no
    |points| × |prior fixes| intermediate and no ranking-window shuffle
    (the round-1 broadcast-NLJ + window formulation materialized both).
    Fix attributes re-attach via a broadcast equi-join on fix_id."""
    spark = points.sparkSession
    tp = track_pdf.sort_values(["ts_sec", "fix_id"]).reset_index(drop=True)
    t_sec_sorted = tp["ts_sec"].to_numpy(np.int64)
    fix_sorted = tp["fix_id"].to_numpy(np.int64)

    @F.pandas_udf("long")
    def last_fix(ts: pd.Series) -> pd.Series:
        # rightmost fix with t_sec <= ts; (t_sec, fix_id) sort order makes
        # the rightmost tie the highest fix_id
        idx = np.searchsorted(t_sec_sorted, ts.to_numpy(np.int64), side="right") - 1
        return pd.Series(np.where(idx >= 0, fix_sorted[np.maximum(idx, 0)], np.int64(-1)))

    fixes = F.broadcast(
        spark.createDataFrame(
            track_pdf.rename(columns={"lon": "t_lon", "lat": "t_lat", "ts_sec": "t_sec"})[
                ["fix_id", "t_lon", "t_lat", "t_sec"]
            ]
        )
    )
    return (
        points.withColumn("fix_id", last_fix(F.col(ts_sec_col)))
        .where(F.col("fix_id") >= 0)
        .join(fixes, "fix_id")
    )
