"""The ``st_*`` scalar-function surface (SURVEY.md §2.3).

From-scratch, Arrow-vectorized re-expression of GeoMesa's Spark SQL
function registry (upstream layout:
``geomesa-spark-sql/.../SQLGeometricConstructorFunctions.scala``,
``SQLSpatialAccessorFunctions.scala``, ``SQLSpatialRelationFunctions.scala``,
``SQLGeometryProcessingFunctions.scala``, ``SQLGeometricOutputFunctions.scala``,
wired by ``SQLTypes.scala#init`` — see SURVEY.md §0 citation policy).

Geometry interchange format is WKT strings (the reference accepts WKT at
the edges too); the engine's *hot path* stays on columnar lon/lat +
cell ids (operators/*), so these functions are the API-parity surface
for ad-hoc SQL, not the join path. Implementation notes:

- Point functions are fully vectorized (pandas C-string kernels / numpy).
- Polygon functions cache parsed geometries **per unique WKT within the
  Arrow batch** — the realistic workload has few distinct polygons
  repeated across many rows, so the per-row cost is one dict lookup, and
  the math is vectorized numpy per group (no per-row geometry math).
- ``register_all(spark)`` registers everything for SQL
  (~ ``SQLTypes.init``); the same callables work as DataFrame columns.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import BooleanType, DoubleType, IntegerType, LongType, StringType

from geomesa_spark.functions import cells as C
from geomesa_spark.functions import geometry as geo

_POINT_NUM = r"POINT\s*\(\s*(-?[\d.eE+-]+)\s+(-?[\d.eE+-]+)\s*\)"


def _parse_cache(wkts: pd.Series) -> dict[str, tuple]:
    """Parse each unique WKT once per batch → {wkt: (kind, coords, offsets)}."""
    out = {}
    for w in wkts.dropna().unique():
        try:
            out[w] = geo.parse_wkt(w)
        except Exception:
            out[w] = None
    return out


# --- constructors -----------------------------------------------------------


@F.pandas_udf(StringType())
def st_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return "POINT (" + lon.map(repr) + " " + lat.map(repr) + ")"


@F.pandas_udf(StringType())
def st_makeBBOX(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
    a, b, c, d = (s.map(repr) for s in (minx, miny, maxx, maxy))
    return (
        "POLYGON ((" + a + " " + b + ", " + c + " " + b + ", " + c + " " + d
        + ", " + a + " " + d + ", " + a + " " + b + "))"
    )


@F.pandas_udf(StringType())
def st_geomFromWKT(wkt: pd.Series) -> pd.Series:
    cache = _parse_cache(wkt)
    return wkt.map(lambda w: w if (w is not None and cache.get(w) is not None) else None)


# --- accessors --------------------------------------------------------------


@F.pandas_udf(DoubleType())
def st_x(wkt: pd.Series) -> pd.Series:
    return wkt.str.extract(_POINT_NUM, expand=True)[0].astype(np.float64)


@F.pandas_udf(DoubleType())
def st_y(wkt: pd.Series) -> pd.Series:
    return wkt.str.extract(_POINT_NUM, expand=True)[1].astype(np.float64)


def _per_unique(wkt: pd.Series, fn, dtype):
    cache = _parse_cache(wkt)
    vals = {w: (fn(*g) if g is not None else None) for w, g in cache.items()}
    return wkt.map(vals).astype(dtype)


@F.pandas_udf(StringType())
def st_envelope(wkt: pd.Series) -> pd.Series:
    def env(kind, coords, offs):
        x0, y0, x1, y1 = geo.polygon_bbox(coords)
        return (
            f"POLYGON (({x0!r} {y0!r}, {x1!r} {y0!r}, {x1!r} {y1!r}, "
            f"{x0!r} {y1!r}, {x0!r} {y0!r}))"
        )

    return _per_unique(wkt, env, object)


@F.pandas_udf(IntegerType())
def st_numPoints(wkt: pd.Series) -> pd.Series:
    return _per_unique(wkt, lambda k, c, o: len(c), "Int32")


@F.pandas_udf(DoubleType())
def st_area(wkt: pd.Series) -> pd.Series:
    return _per_unique(
        wkt,
        lambda k, c, o: abs(geo.polygon_area_deg2(c, o)) if k == "POLYGON" else 0.0,
        np.float64,
    )


@F.pandas_udf(DoubleType())
def st_length(wkt: pd.Series) -> pd.Series:
    def ln(kind, coords, offs):
        if kind != "LINESTRING":
            return 0.0
        return float(
            geo.haversine_m(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1]).sum()
        )

    return _per_unique(wkt, ln, np.float64)


@F.pandas_udf(StringType())
def st_centroid(wkt: pd.Series) -> pd.Series:
    def cen(kind, coords, offs):
        if kind == "POLYGON":
            x, y = geo.polygon_centroid(coords, offs)
        else:
            x, y = float(coords[:, 0].mean()), float(coords[:, 1].mean())
        return f"POINT ({x!r} {y!r})"

    return _per_unique(wkt, cen, object)


# --- relations --------------------------------------------------------------


def _pip_against(poly_wkt: pd.Series, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    cache = _parse_cache(poly_wkt)
    out = np.zeros(len(lon), dtype=bool)
    codes, uniques = pd.factorize(poly_wkt)
    for i, w in enumerate(uniques):
        g = cache.get(w)
        if g is None:
            continue
        m = codes == i
        out[m] = geo.points_in_polygon(lon[m], lat[m], g[1], g[2])
    return out


@F.pandas_udf(BooleanType())
def st_contains(poly_wkt: pd.Series, point_wkt: pd.Series) -> pd.Series:
    pts = point_wkt.str.extract(_POINT_NUM, expand=True).astype(np.float64)
    return pd.Series(_pip_against(poly_wkt, pts[0].to_numpy(), pts[1].to_numpy()))


@F.pandas_udf(BooleanType())
def st_containsPoint(poly_wkt: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(
        _pip_against(poly_wkt, lon.to_numpy(np.float64), lat.to_numpy(np.float64))
    )


@F.pandas_udf(BooleanType())
def st_within(point_wkt: pd.Series, poly_wkt: pd.Series) -> pd.Series:
    pts = point_wkt.str.extract(_POINT_NUM, expand=True).astype(np.float64)
    return pd.Series(_pip_against(poly_wkt, pts[0].to_numpy(), pts[1].to_numpy()))


@F.pandas_udf(BooleanType())
def st_intersects(a_wkt: pd.Series, b_wkt: pd.Series) -> pd.Series:
    """Bbox-level intersects for polygon/line pairs; exact for point vs
    polygon (PIP). (Reference: SQLSpatialRelationFunctions#st_intersects.)"""
    ca, cb = _parse_cache(a_wkt), _parse_cache(b_wkt)
    n = len(a_wkt)
    out = np.zeros(n, dtype=bool)
    av, bv = a_wkt.to_numpy(object), b_wkt.to_numpy(object)
    for i in range(n):
        ga, gb = ca.get(av[i]), cb.get(bv[i])
        if ga is None or gb is None:
            continue
        if ga[0] == "POINT" and gb[0] == "POLYGON":
            out[i] = bool(geo.points_in_polygon(ga[1][:, 0], ga[1][:, 1], gb[1], gb[2])[0])
        elif gb[0] == "POINT" and ga[0] == "POLYGON":
            out[i] = bool(geo.points_in_polygon(gb[1][:, 0], gb[1][:, 1], ga[1], ga[2])[0])
        else:
            ax0, ay0, ax1, ay1 = geo.polygon_bbox(ga[1])
            bx0, by0, bx1, by1 = geo.polygon_bbox(gb[1])
            out[i] = not (ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0)
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def st_distance(a_wkt: pd.Series, b_wkt: pd.Series) -> pd.Series:
    """Planar degree distance between two POINTs (JTS st_distance semantics)."""
    pa = a_wkt.str.extract(_POINT_NUM, expand=True).astype(np.float64)
    pb = b_wkt.str.extract(_POINT_NUM, expand=True).astype(np.float64)
    return pd.Series(
        np.sqrt(geo.planar_dist2(pa[0].to_numpy(), pa[1].to_numpy(), pb[0].to_numpy(), pb[1].to_numpy()))
    )


@F.pandas_udf(DoubleType())
def st_distanceSphere(a_wkt: pd.Series, b_wkt: pd.Series) -> pd.Series:
    """Great-circle meters (st_distanceSpheroid analog, mean-radius sphere)."""
    pa = a_wkt.str.extract(_POINT_NUM, expand=True).astype(np.float64)
    pb = b_wkt.str.extract(_POINT_NUM, expand=True).astype(np.float64)
    return pd.Series(
        geo.haversine_m(pa[0].to_numpy(), pa[1].to_numpy(), pb[0].to_numpy(), pb[1].to_numpy())
    )


# --- processing -------------------------------------------------------------


@F.pandas_udf(StringType())
def st_bufferPoint(lon: pd.Series, lat: pd.Series, radius_m: pd.Series) -> pd.Series:
    lon_v, lat_v, r_v = (s.to_numpy(np.float64) for s in (lon, lat, radius_m))
    out = []
    for i in range(len(lon_v)):
        ring = geo.buffer_point(lon_v[i], lat_v[i], r_v[i])
        out.append(geo.wkt_polygon(ring, np.asarray([0, len(ring)])))
    return pd.Series(out)


@F.pandas_udf(StringType())
def st_convexHull(wkt: pd.Series) -> pd.Series:
    def hull(kind, coords, offs):
        ring = geo.convex_hull(coords[:, 0], coords[:, 1])
        return geo.wkt_polygon(ring, np.asarray([0, len(ring)]))

    return _per_unique(wkt, hull, object)


@F.pandas_udf(StringType())
def st_idlSafeGeom(wkt: pd.Series) -> pd.Series:
    """Antimeridian-split bboxes (st_idlSafeGeom analog): a POLYGON whose
    bbox spans more than 180° of longitude is read as crossing ±180 and
    becomes a MULTIPOLYGON of the two halves ([x1,180] ∪ [-180,x0])."""
    def split(kind, coords, offs):
        x0, y0, x1, y1 = geo.polygon_bbox(coords)
        w = geo.wkt_polygon(coords, offs)
        if kind != "POLYGON" or (x1 - x0) <= 180.0:
            return w
        parts = geo.split_antimeridian(x1, y0, x0, y1)
        rings = [geo.make_bbox_ring(*p) for p in parts]
        inner = ", ".join(
            "((" + ", ".join(f"{x!r} {y!r}" for x, y in r) + "))" for r in rings
        )
        return f"MULTIPOLYGON ({inner})"

    return _per_unique(wkt, split, object)


# --- output / cells ---------------------------------------------------------


@F.pandas_udf(StringType())
def st_asGeoJSON(wkt: pd.Series) -> pd.Series:
    def gj(kind, coords, offs):
        if kind == "POINT":
            return json.dumps({"type": "Point", "coordinates": [coords[0, 0], coords[0, 1]]})
        if kind == "LINESTRING":
            return json.dumps({"type": "LineString", "coordinates": coords.tolist()})
        rings = [coords[offs[r]:offs[r + 1]].tolist() for r in range(len(offs) - 1)]
        return json.dumps({"type": "Polygon", "coordinates": rings})

    return _per_unique(wkt, gj, object)


def _group_by_param(param: pd.Series, fn):
    """Run ``fn(mask, int_value)`` once per unique parameter value in the
    batch — supports non-constant precision/level/resolution columns
    (each group is still a vectorized numpy call)."""
    vals = param.to_numpy()
    out = None
    for v in pd.unique(vals):
        m = vals == v
        res = fn(m, int(v))
        if out is None:
            out = np.empty(len(vals), dtype=np.asarray(res).dtype if not isinstance(res, list) else object)
        out[m] = res
    return out if out is not None else np.empty(0)


@F.pandas_udf(StringType())
def st_geoHash(lon: pd.Series, lat: pd.Series, precision: pd.Series) -> pd.Series:
    lon_v, lat_v = lon.to_numpy(np.float64), lat.to_numpy(np.float64)

    def enc(m, p):
        return [g.decode() for g in C.geohash_encode(lon_v[m], lat_v[m], p)]

    return pd.Series(_group_by_param(precision, enc))


@F.pandas_udf(LongType())
def st_z2(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(C.z2_encode(lon.to_numpy(np.float64), lat.to_numpy(np.float64)))


@F.pandas_udf(LongType())
def st_z3(lon: pd.Series, lat: pd.Series, ts_seconds: pd.Series) -> pd.Series:
    return pd.Series(
        C.z3_encode(lon.to_numpy(np.float64), lat.to_numpy(np.float64), ts_seconds.to_numpy(np.int64))
    )


@F.pandas_udf(LongType())
def st_s2(lon: pd.Series, lat: pd.Series, level: pd.Series) -> pd.Series:
    lon_v, lat_v = lon.to_numpy(np.float64), lat.to_numpy(np.float64)
    return pd.Series(_group_by_param(level, lambda m, lv: C.s2_encode(lon_v[m], lat_v[m], lv)))


@F.pandas_udf(LongType())
def st_hexCell(lon: pd.Series, lat: pd.Series, res: pd.Series) -> pd.Series:
    """Icosahedral aperture-7 hex cell (H3-semantics; see functions/hexgrid.py
    for why ids are not numerically Uber-H3)."""
    from geomesa_spark.functions import hexgrid as H

    lon_v, lat_v = lon.to_numpy(np.float64), lat.to_numpy(np.float64)
    return pd.Series(_group_by_param(res, lambda m, r: H.hex_encode(lon_v[m], lat_v[m], r)))


ALL_FUNCTIONS = {
    "st_point": st_point,
    "st_makeBBOX": st_makeBBOX,
    "st_geomFromWKT": st_geomFromWKT,
    "st_x": st_x,
    "st_y": st_y,
    "st_envelope": st_envelope,
    "st_numPoints": st_numPoints,
    "st_area": st_area,
    "st_length": st_length,
    "st_centroid": st_centroid,
    "st_contains": st_contains,
    "st_containsPoint": st_containsPoint,
    "st_within": st_within,
    "st_intersects": st_intersects,
    "st_distance": st_distance,
    "st_distanceSphere": st_distanceSphere,
    "st_bufferPoint": st_bufferPoint,
    "st_convexHull": st_convexHull,
    "st_idlSafeGeom": st_idlSafeGeom,
    "st_asGeoJSON": st_asGeoJSON,
    "st_geoHash": st_geoHash,
    "st_z2": st_z2,
    "st_z3": st_z3,
    "st_s2": st_s2,
    "st_hexCell": st_hexCell,
}


def register_all(spark: SparkSession) -> None:
    """SQL-register the whole surface (~ SQLTypes.init)."""
    from geomesa_spark.contract import ensure_py_files

    ensure_py_files(spark)
    for name, fn in ALL_FUNCTIONS.items():
        spark.udf.register(name, fn)
