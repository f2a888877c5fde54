"""Exact brute-force oracles (O(n*m) numpy) — the in-repo "reference"
for row-for-row assertions (SURVEY.md §5.2.1). Deliberately naive."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geomesa_spark.functions import geometry as geo
from geomesa_spark.sources.synth import Polygon


def brute_pip_join(points: pd.DataFrame, polys: list[Polygon], lon="lon", lat="lat") -> set[tuple]:
    """All (point_index_key, polygon_id) pairs; exhaustive PIP."""
    out = set()
    lon_v = points[lon].to_numpy(dtype=np.float64)
    lat_v = points[lat].to_numpy(dtype=np.float64)
    keys = points.index.to_numpy()
    for p in polys:
        inside = geo.points_in_polygon(lon_v, lat_v, p.coords, p.ring_offsets)
        for k in keys[inside]:
            out.add((k, p.polygon_id))
    return out


def brute_knn(points: pd.DataFrame, queries: pd.DataFrame, k: int, metric="haversine") -> pd.DataFrame:
    """Exhaustive kNN: for each query row (qid, lon, lat) the k nearest
    point rows (by metric, ties broken on point id ascending)."""
    rows = []
    pid = points["pid"].to_numpy()
    plon = points["lon"].to_numpy(dtype=np.float64)
    plat = points["lat"].to_numpy(dtype=np.float64)
    for q in queries.itertuples(index=False):
        if metric == "haversine":
            d = geo.haversine_m(q.lon, q.lat, plon, plat)
        else:
            d = geo.planar_dist2(q.lon, q.lat, plon, plat)
        order = np.lexsort((pid, d))[:k]
        for rank, idx in enumerate(order, start=1):
            rows.append((q.qid, int(pid[idx]), float(d[idx]), rank))
    return pd.DataFrame(rows, columns=["qid", "pid", "dist", "rnk"])


def brute_dwithin(points: pd.DataFrame, queries: pd.DataFrame, radius_m: float) -> set[tuple]:
    out = set()
    plon = points["lon"].to_numpy(dtype=np.float64)
    plat = points["lat"].to_numpy(dtype=np.float64)
    pid = points["pid"].to_numpy()
    for q in queries.itertuples(index=False):
        d = geo.haversine_m(q.lon, q.lat, plon, plat)
        for i in np.nonzero(d <= radius_m)[0]:
            out.add((q.qid, int(pid[i])))
    return out
