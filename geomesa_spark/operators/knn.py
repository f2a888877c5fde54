"""Grid-partitioned expand-ring kNN join (SURVEY.md §2.4 / §3.3).

Set-oriented rewrite of GeoMesa's KNN process
(``proc/knn/KNearestNeighborSearchProcess.scala`` — per-query client loop
over ``GeoHashSpiral`` cell rings with a ``NearestNeighbors`` bounded
priority queue). Here ALL query points advance their rings together:

  ring 0..R: build (qid, cell) candidate-ring table (driver-side numpy,
  tiny) → broadcast equi-join against the cached, cell-keyed point table
  → per-qid top-k via a ranking window → termination check.

A query terminates when its kth-nearest distance ≤ the minimum possible
distance to the NEXT ring (per-cell lower bound: haversine/planar distance
from the query point to the candidate cell's coordinate-clamped nearest
point — valid because geodesic distance is monotone in |Δlat| and |Δlon|).
The driver loop runs O(log) iterations of one distributed join each; the
point side is scanned from cache, never re-shuffled (it is pre-keyed by
cell). The same loop at cluster scale reads a cell-bucketed table, so each
ring join prunes to the touched buckets.

Distance metrics: 'haversine' (meters, geodetic — the GeoMesa semantics)
or 'planar' (squared degrees — exact float64 arithmetic reproducible
bit-for-bit in the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.functions import geometry as geo
from geomesa_spark.operators.spatial_join import haversine_expr, with_grid_cell

M_PER_DEG = 111_194.93  # pi * R_mean / 180


def _cell_min_dist(qlon: float, qlat: float, cell_ids: np.ndarray, level: int, metric: str) -> np.ndarray:
    """Lower bound of distance from (qlon, qlat) to each cell's box."""
    lo, la, hi, ha = C.grid_cell_bounds(cell_ids, level)
    clat = np.clip(qlat, la, ha)
    # lon separation with antimeridian wrap: direct distance to the nearer
    # edge, or wrapped distance around the back to the farther edge
    direct = np.abs(qlon - np.clip(qlon, lo, hi))
    wrapped = 360.0 - np.maximum(np.abs(qlon - lo), np.abs(qlon - hi))
    dlon = np.minimum(direct, np.maximum(wrapped, 0.0))
    if metric == "planar":
        dy = qlat - clat
        return dlon * dlon + dy * dy
    return geo.haversine_m(np.zeros_like(dlon), qlat, dlon, clat)


def planar_dist2_expr(lon1, lat1, lon2, lat2):
    dx = F.col(lon2) - F.col(lon1)
    dy = F.col(lat2) - F.col(lat1)
    return dx * dx + dy * dy


def knn_join(
    points: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int,
    level: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "pid",
    metric: str = "haversine",
    max_rings: int | None = None,
    initial_radius: int = 1,
) -> DataFrame:
    """→ DataFrame(qid, pid, dist, rnk) — exact k nearest points per query
    (ties broken by ascending point id, matching the oracle contract)."""
    spark = points.sparkSession
    nx, ny = C.grid_shape(level)
    if max_rings is None:
        max_rings = max(nx, ny)

    pts = with_grid_cell(points, lon_col, lat_col, level).select(
        F.col(id_col).alias("pid"), F.col(lon_col).alias("p_lon"), F.col(lat_col).alias("p_lat"), "cell"
    ).cache()

    queries = queries_pdf.reset_index(drop=True)
    q_center = C.grid_encode(queries["lon"].to_numpy(), queries["lat"].to_numpy(), level)

    active = np.ones(len(queries), dtype=bool)
    best: DataFrame | None = None  # accumulated per-qid top-k, stays DISTRIBUTED
    radius = np.full(len(queries), -1, dtype=np.int64)  # last completed ring
    target = initial_radius
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("pid").asc())

    while active.any():
        # 1. candidate cells: for each active query, rings (radius+1 .. target]
        rows_cell, rows_qid, rows_qlon, rows_qlat = [], [], [], []
        for qi in np.nonzero(active)[0]:
            for r in range(int(radius[qi]) + 1, target + 1):
                ring = C.grid_ring(int(q_center[qi]), r, level)
                rows_cell.extend(int(c) for c in ring)
                rows_qid.extend([int(queries["qid"][qi])] * len(ring))
                rows_qlon.extend([float(queries["lon"][qi])] * len(ring))
                rows_qlat.extend([float(queries["lat"][qi])] * len(ring))
        kth_dist: dict[int, float] = {}
        have_n: dict[int, int] = {}
        if rows_cell:
            cand_cells = spark.createDataFrame(
                pd.DataFrame({"cell": rows_cell, "qid": rows_qid, "q_lon": rows_qlon, "q_lat": rows_qlat})
            )
            joined = pts.join(F.broadcast(cand_cells), "cell", "inner")
            dist = (
                haversine_expr("p_lon", "p_lat", "q_lon", "q_lat")
                if metric == "haversine"
                else planar_dist2_expr("p_lon", "p_lat", "q_lon", "q_lat")
            )
            batch = (
                joined.withColumn("dist", dist)
                .withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= k)
                .select("qid", "pid", "dist")
            )
            # union into the running top-k WITHOUT collecting candidate rows:
            # dedupe (rings wrap at high radius and can re-enumerate a cell),
            # re-rank, keep k — all distributed; only the tiny per-qid
            # (count, kth distance) summary reaches the driver.
            merged = best.union(batch) if best is not None else batch
            new_best = (
                merged.dropDuplicates(["qid", "pid"])
                .withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= k)
                .select("qid", "pid", "dist")
                .persist()
            )
            summary = (
                new_best.groupBy("qid")
                .agg(F.count(F.lit(1)).alias("n"), F.max("dist").alias("kth"))
                .collect()
            )
            for row in summary:
                have_n[int(row["qid"])] = int(row["n"])
                kth_dist[int(row["qid"])] = float(row["kth"])
            if best is not None:
                best.unpersist()
            best = new_best
        elif best is not None:
            summary = (
                best.groupBy("qid").agg(F.count(F.lit(1)).alias("n"), F.max("dist").alias("kth")).collect()
            )
            for row in summary:
                have_n[int(row["qid"])] = int(row["n"])
                kth_dist[int(row["qid"])] = float(row["kth"])

        radius[active] = target
        # 2. termination: kth distance ≤ min distance of next ring
        for qi in np.nonzero(active)[0]:
            qid = int(queries["qid"][qi])
            next_ring = C.grid_ring(int(q_center[qi]), int(radius[qi]) + 1, level)
            if len(next_ring) == 0:  # globe exhausted
                active[qi] = False
                continue
            if have_n.get(qid, 0) >= k:
                lb = _cell_min_dist(
                    float(queries["lon"][qi]), float(queries["lat"][qi]), next_ring, level, metric
                ).min()
                if kth_dist[qid] <= lb:
                    active[qi] = False
        if radius.max() >= max_rings:
            break
        target = max(target + 1, target * 2)  # geometric ring expansion

    pts.unpersist()
    if best is None:
        return spark.createDataFrame(pd.DataFrame(columns=["qid", "pid", "dist", "rnk"]))
    # materialize the small final top-k via localCheckpoint (truncates the
    # multi-round iterative lineage; blocks are reclaimed by the context
    # cleaner when the result is garbage-collected), then release the
    # iteration cache immediately — no cross-invocation bookkeeping and no
    # stale-unpersist recompute of a previously returned result
    out = (
        best.withColumn("rnk", F.row_number().over(w))
        .select("qid", "pid", "dist", "rnk")
        .localCheckpoint(eager=True)
    )
    best.unpersist()
    return out


def knn_join_crossjoin(
    points: DataFrame,
    queries_df: DataFrame,
    k: int,
    metric: str = "planar",
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "pid",
) -> DataFrame:
    """Single-pass kNN as broadcast-NL-join + ranking window — the plan used
    when the query set is small and the data side is already filtered
    (also the shape of the DuckDB oracle). Fully declarative: Catalyst
    broadcasts the query side; partial top-k runs map-side via the window
    after AQE. Kept as the oracle-twin of ``knn_join``."""
    pts = points.select(F.col(id_col).alias("pid"), F.col(lon_col).alias("p_lon"), F.col(lat_col).alias("p_lat"))
    joined = pts.crossJoin(F.broadcast(queries_df.select("qid", F.col("lon").alias("q_lon"), F.col("lat").alias("q_lat"))))
    dist = (
        haversine_expr("p_lon", "p_lat", "q_lon", "q_lat")
        if metric == "haversine"
        else planar_dist2_expr("p_lon", "p_lat", "q_lon", "q_lat")
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("pid").asc())
    return (
        joined.withColumn("dist", dist)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "pid", "dist", "rnk")
    )
