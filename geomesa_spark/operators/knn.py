"""Grid-partitioned expand-ring kNN join (SURVEY.md §2.4 / §3.3).

Set-oriented rewrite of GeoMesa's KNN process
(``proc/knn/KNearestNeighborSearchProcess.scala`` — per-query client loop
over ``GeoHashSpiral`` cell rings with a ``NearestNeighbors`` bounded
priority queue). Here ALL query points advance their rings together, and
every per-query structure is a DataFrame:

  per round: the ACTIVE-QUERY DataFrame explodes its next ring annulus to
  (qid, cell) candidate rows ON EXECUTORS (mapInPandas, chunked) →
  broadcast equi-join against the cached, cell-keyed point table →
  per-qid top-k via a ranking window → termination filter, also executor-
  side (mapInPandas over active ⋈ per-qid summary).

A query terminates when its kth-nearest distance ≤ the minimum possible
distance to the NEXT ring (per-cell lower bound: haversine/planar distance
from the query point to the candidate cell's coordinate-clamped nearest
point — valid because geodesic distance is monotone in |Δlat| and |Δlon|;
the bound is evaluated as one 2-D numpy broadcast per Arrow batch, never a
per-query Python loop). The driver loop runs O(log) iterations of one
distributed join each and holds only scalars (round number, active count);
candidate-cell frames and the accumulated top-k never touch the driver.
The point side is scanned from cache, never re-shuffled (it is pre-keyed
by cell). The same loop at cluster scale reads a cell-bucketed table, so
each ring join prunes to the touched buckets.

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

# Candidate-cell frames are (long, long, double, double) ≈ 32 B/row plus
# broadcast-table overhead; ~1.5M rows ≈ 50 MB keeps the per-round
# broadcast comfortably inside executor/driver memory. Above this the
# ring join flips to a plain shuffle join (AQE still free to pick a
# runtime broadcast if the deduped frame turns out small) — an
# unconditional hint at 1e5 queries x geometric annuli is millions of
# rows and an OOM at exactly the scale the executor-side rewrite
# targets. Mirrors spatial_join(strategy='auto')'s cover-size flip.
BROADCAST_MAX_CAND_ROWS = 1_500_000


def _cand_join(pts: DataFrame, cand_cells: DataFrame, est_rows: int) -> DataFrame:
    """Join the cached cell-keyed point table against one round's
    candidate-cell frame: broadcast only while the ESTIMATED candidate
    count (n_active x annulus offsets — an upper bound; wrap-dedup only
    shrinks it) fits BROADCAST_MAX_CAND_ROWS."""
    if est_rows > BROADCAST_MAX_CAND_ROWS:
        return pts.join(cand_cells, "cell", "inner")
    return pts.join(F.broadcast(cand_cells), "cell", "inner")


def _cell_min_dist(qlon, qlat, cell_ids: np.ndarray, level: int, metric: str) -> np.ndarray:
    """Lower bound of distance from (qlon, qlat) to each cell's box.

    Broadcasts: qlon/qlat may be scalars against a 1-D cell array, or
    (n, 1) column vectors against an (n, m) cell matrix (the vectorized
    per-batch termination check)."""
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
    return geo.haversine_m(np.zeros_like(dlon), np.broadcast_to(np.asarray(qlat, dtype=np.float64), dlon.shape), dlon, clat)


def _annulus_offsets(r_lo: int, r_hi: int) -> tuple[np.ndarray, np.ndarray]:
    """(dx, dy) index offsets with Chebyshev norm in [r_lo, r_hi] — the
    square annulus covering rings r_lo..r_hi. Shared across all queries in
    a batch (one numpy mask, no per-query enumeration)."""
    side = np.arange(-r_hi, r_hi + 1, dtype=np.int64)
    dx, dy = np.meshgrid(side, side)
    keep = np.maximum(np.abs(dx), np.abs(dy)) >= r_lo
    return dx[keep], dy[keep]


def _ring_cells(centers: np.ndarray, dx: np.ndarray, dy: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """(cells, valid) matrices of shape (n_queries, n_offsets): each query
    center's annulus cells, longitude wrapped mod nx, latitude rows outside
    [0, ny) marked invalid. Pure broadcasting — no Python loop."""
    nx, ny = C.grid_shape(level)
    ix = (centers % nx)[:, None]
    iy = (centers // nx)[:, None]
    yy = iy + dy[None, :]
    valid = (yy >= 0) & (yy < ny)
    xx = (ix + dx[None, :]) % nx
    return np.where(valid, yy * nx + xx, 0), valid


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
    (ties broken by ascending point id, matching the oracle contract).

    ``queries_pdf`` may be a pandas frame (process-style call) or a Spark
    DataFrame (large query sets) with columns (qid, lon, lat)."""
    spark = points.sparkSession
    nx, ny = C.grid_shape(level)
    if max_rings is None:
        max_rings = max(nx, ny)

    pts = with_grid_cell(points, lon_col, lat_col, level).select(
        F.col(id_col).alias("pid"), F.col(lon_col).alias("p_lon"), F.col(lat_col).alias("p_lat"), "cell"
    ).cache()

    if isinstance(queries_pdf, DataFrame):
        qdf = queries_pdf.select("qid", "lon", "lat")
    else:
        qdf = spark.createDataFrame(queries_pdf.reset_index(drop=True)[["qid", "lon", "lat"]])
    # the active set is itself a DataFrame; localCheckpoint bounds lineage
    # per round (≤ one row per still-active query)
    active_df = qdf.localCheckpoint(eager=True)
    n_active = active_df.count()

    def explode_annulus(r_lo: int, r_hi: int):
        """mapInPandas: each active query's rings r_lo..r_hi as (cell, qid,
        q_lon, q_lat) rows. Chunked so a wide annulus never builds one
        giant frame; per-qid wrap duplicates drop vectorized."""

        def gen(batches):
            dx, dy = _annulus_offsets(r_lo, r_hi)
            chunk = max(1, 2_000_000 // max(1, len(dx)))
            for pdf in batches:
                for s in range(0, len(pdf), chunk):
                    part = pdf.iloc[s : s + chunk]
                    centers = C.grid_encode(part["lon"].to_numpy(np.float64), part["lat"].to_numpy(np.float64), level)
                    cells, valid = _ring_cells(centers, dx, dy, level)
                    nq, noff = cells.shape
                    out = pd.DataFrame(
                        {
                            "cell": cells.ravel(),
                            "qid": np.repeat(part["qid"].to_numpy(np.int64), noff),
                            "q_lon": np.repeat(part["lon"].to_numpy(np.float64), noff),
                            "q_lat": np.repeat(part["lat"].to_numpy(np.float64), noff),
                        }
                    )[valid.ravel()]
                    yield out.drop_duplicates(["qid", "cell"])

        return gen

    def advance_filter(next_r: int):
        """mapInPandas over active ⋈ summary: drop queries whose kth-nearest
        distance is ≤ the lower bound of ring ``next_r`` (or whose next ring
        is empty — globe exhausted). One 2-D numpy broadcast per batch."""

        def gen(batches):
            dx, dy = _annulus_offsets(next_r, next_r)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                centers = C.grid_encode(pdf["lon"].to_numpy(np.float64), pdf["lat"].to_numpy(np.float64), level)
                cells, valid = _ring_cells(centers, dx, dy, level)
                lb = _cell_min_dist(
                    pdf["lon"].to_numpy(np.float64)[:, None], pdf["lat"].to_numpy(np.float64)[:, None], cells, level, metric
                )
                lb = np.where(valid, lb, np.inf).min(axis=1)
                ring_exists = valid.any(axis=1)
                n = pdf["n"].fillna(0).to_numpy(np.int64)
                kth = pdf["kth"].fillna(np.inf).to_numpy(np.float64)
                keep = ring_exists & ((n < k) | (kth > lb))
                yield pdf.loc[keep, ["qid", "lon", "lat"]]

        return gen

    best: DataFrame | None = None  # accumulated per-qid top-k, stays DISTRIBUTED
    r_done = -1  # last completed ring (uniform across active queries)
    target = initial_radius
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("pid").asc())

    while n_active > 0:
        cand_cells = active_df.mapInPandas(
            explode_annulus(r_done + 1, target), "cell long, qid long, q_lon double, q_lat double"
        )
        r_lo = r_done + 1
        n_off = (2 * target + 1) ** 2 - (max(0, 2 * r_lo - 1)) ** 2
        joined = _cand_join(pts, cand_cells, n_active * max(n_off, 0))
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
        # dedupe (annuli wrap at high radius and adjacent rounds can
        # re-enumerate a cell), re-rank, keep k — all distributed
        merged = best.union(batch) if best is not None else batch
        new_best = (
            merged.dropDuplicates(["qid", "pid"])
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", "pid", "dist")
            .persist()
        )
        r_done = target
        # termination, executor-side: active ⋈ per-qid (count, kth) summary
        # → vectorized next-ring lower-bound filter. The eager localCheckpoint
        # materializes new_best (so the old cache can be released) and bounds
        # the active set's lineage; the driver sees only a row count.
        summary = new_best.groupBy("qid").agg(F.count(F.lit(1)).alias("n"), F.max("dist").alias("kth"))
        next_active = (
            active_df.join(summary, "qid", "left")
            .mapInPandas(advance_filter(r_done + 1), "qid long, lon double, lat double")
            .localCheckpoint(eager=True)
        )
        if best is not None:
            best.unpersist()
        best = new_best
        active_df = next_active
        n_active = active_df.count()
        if r_done >= max_rings:
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
