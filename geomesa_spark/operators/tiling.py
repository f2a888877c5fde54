"""Raster ↔ vector tiling (SURVEY.md §2.8).

From-scratch Spark-first analog of GeoMesa's raster store
(``geomesa-raster/.../AccumuloRasterStore.scala`` chips keyed by
resolution band + GeoHash — SURVEY.md §1.1) re-expressed columnar:

- tile assignment    — pure Catalyst floor arithmetic (slippy-map /
  Web-Mercator XYZ or equirectangular), reproducible in ANSI SQL for the
  DuckDB oracle (FIXTURES.md §5 "Tiling").
- tile pyramid       — z → z-1 rollups are integer shifts + re-agg
  (map-side partial aggregation; one shuffle per level, or grouping-sets
  in one pass).
- raster chips table — (tile_id, zoom, bounds, width, height, band:binary)
  rows; synthesized analytic-ripple fixture chips so mosaics are
  verifiable pointwise (FIXTURES.md §7).
- mosaic             — ``groupBy(request).applyInPandas`` numpy stitch
  (~ ``RasterUtils#mosaicChunks``).
- zonal stats        — PIP spatial join + groupBy(polygon) agg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

WEBMERC_MAX_LAT = 85.05112878


# ---------------------------------------------------------------------------
# tile assignment (native expressions; SQL twins for the oracle)
# ---------------------------------------------------------------------------


def tile_x_expr(lon_col: str, zoom: int):
    n = 1 << zoom
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(n)))).cast("long")


def tile_y_expr(lat_col: str, zoom: int, scheme: str = "webmercator"):
    n = 1 << zoom
    if scheme == "equirect":
        raw = (F.lit(90.0) - F.col(lat_col)) / F.lit(180.0) * F.lit(n)
    else:
        lat = F.least(F.lit(WEBMERC_MAX_LAT), F.greatest(F.lit(-WEBMERC_MAX_LAT), F.col(lat_col)))
        phi = F.radians(lat)
        raw = (F.lit(1.0) - F.log(F.tan(F.lit(float(np.pi) / 4.0) + phi / F.lit(2.0))) / F.lit(float(np.pi))) / F.lit(2.0) * F.lit(n)
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(raw))).cast("long")


def tile_x_sql(lon_expr: str, zoom: int) -> str:
    n = 1 << zoom
    return f"least({n - 1}, greatest(0, cast(floor(({lon_expr} + 180.0) / 360.0 * {n}) as bigint)))"


def tile_y_sql(lat_expr: str, zoom: int, scheme: str = "webmercator") -> str:
    n = 1 << zoom
    if scheme == "equirect":
        raw = f"(90.0 - {lat_expr}) / 180.0 * {n}"
    else:
        lat = f"least({WEBMERC_MAX_LAT}, greatest(-{WEBMERC_MAX_LAT}, {lat_expr}))"
        raw = f"(1.0 - ln(tan(pi() / 4.0 + radians({lat}) / 2.0)) / pi()) / 2.0 * {n}"
    return f"least({n - 1}, greatest(0, cast(floor({raw}) as bigint)))"


def with_tile(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat", zoom: int = 7, scheme: str = "webmercator") -> DataFrame:
    return (
        df.withColumn("tile_x", tile_x_expr(lon_col, zoom))
        .withColumn("tile_y", tile_y_expr(lat_col, zoom, scheme))
        .withColumn("zoom", F.lit(zoom))
    )


def tile_counts(df: DataFrame, lon_col="lon", lat_col="lat", zoom: int = 7, weight_col: str | None = None, scheme: str = "webmercator") -> DataFrame:
    """Vector→raster density: per-tile weighted counts (the DensityScan /
    heatmap analog, SURVEY.md §2.5). One hash-agg shuffle; partial
    aggregation is map-side automatically."""
    t = with_tile(df, lon_col, lat_col, zoom, scheme)
    agg = F.sum(weight_col).alias("weight") if weight_col else F.count(F.lit(1)).alias("weight")
    return t.groupBy("zoom", "tile_x", "tile_y").agg(agg)


def rollup_tiles(tiles: DataFrame, levels: int = 1) -> DataFrame:
    """Aggregate a tile-count table one or more zoom levels up
    (tile pyramid: parent = (x >> 1, y >> 1), weights summed)."""
    out = tiles
    for _ in range(levels):
        out = (
            out.withColumn("tile_x", F.shiftright("tile_x", 1))
            .withColumn("tile_y", F.shiftright("tile_y", 1))
            .withColumn("zoom", F.col("zoom") - 1)
            .groupBy("zoom", "tile_x", "tile_y")
            .agg(F.sum("weight").alias("weight"))
        )
    return out


# ---------------------------------------------------------------------------
# raster chips + mosaic
# ---------------------------------------------------------------------------

CHIP_W = CHIP_H = 64


def _ripple(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Analytic band value — pointwise verifiable (FIXTURES.md §7)."""
    return np.sin(np.radians(lon) * 3.0) * np.cos(np.radians(lat) * 2.0)


def tile_bounds(tx: int, ty: int, zoom: int) -> tuple[float, float, float, float]:
    """Equirectangular slippy bounds (chips use the equirect scheme so the
    band grid is an affine function of lon/lat — exact mosaics)."""
    n = 1 << zoom
    w = 360.0 / n
    h = 180.0 / n
    min_lon = tx * w - 180.0
    max_lat = 90.0 - ty * h
    return min_lon, max_lat - h, min_lon + w, max_lat


def make_chip(tx: int, ty: int, zoom: int) -> bytes:
    lo, la, hi, ha = tile_bounds(tx, ty, zoom)
    xs = lo + (np.arange(CHIP_W) + 0.5) / CHIP_W * (hi - lo)
    ys = ha - (np.arange(CHIP_H) + 0.5) / CHIP_H * (ha - la)  # row 0 = top
    grid = _ripple(xs[None, :], ys[:, None]).astype("<f4")
    return grid.tobytes()


_TILE_META_COLS = ["tile_id", "zoom", "tile_x", "tile_y", "min_lon", "min_lat", "max_lon", "max_lat", "width", "height"]


def _enumerate_tiles(zooms, lon_range, lat_range) -> pd.DataFrame:
    """Tile coordinate/bounds rows for a window at each zoom (the single
    source of truth for tile_id packing and bounds — shared by the
    driver-side and distributed chip builders)."""
    rows = []
    for z in zooms:
        n = 1 << z
        tx0 = int((lon_range[0] + 180.0) / 360.0 * n)
        tx1 = int((lon_range[1] + 180.0) / 360.0 * n)
        ty0 = int((90.0 - lat_range[1]) / 180.0 * n)
        ty1 = int((90.0 - lat_range[0]) / 180.0 * n)
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                lo, la, hi, ha = tile_bounds(tx, ty, z)
                rows.append((int((ty << 32) | tx), z, tx, ty, lo, la, hi, ha, CHIP_W, CHIP_H))
    return pd.DataFrame(rows, columns=_TILE_META_COLS)


def chips_pdf(zooms=(5, 7, 9), lon_range=(-30.0, 30.0), lat_range=(-20.0, 20.0)) -> pd.DataFrame:
    """Fixture chips covering a lon/lat window at each pyramid zoom
    (driver-side band synthesis — small fixtures only; ``chips_df`` is
    the distributed builder)."""
    meta = _enumerate_tiles(zooms, lon_range, lat_range)
    meta["band"] = [
        make_chip(int(tx), int(ty), int(z))
        for tx, ty, z in zip(meta["tile_x"], meta["tile_y"], meta["zoom"])
    ]
    return meta


def chips_df(spark, zooms=(5, 7, 9), lon_range=(-30.0, 30.0), lat_range=(-20.0, 20.0)) -> "DataFrame":
    """Distributed chips table: tile COORDINATES enumerate on the driver
    (cheap — ints + bounds), band BYTES synthesize executor-side via
    mapInPandas. ``chips_pdf`` materializes every 16 KB band in driver
    memory (~150 MB at zoom 9 over the default window) — this variant is
    the ingest shape that scales to real chip archives."""
    meta_pdf = _enumerate_tiles(zooms, lon_range, lat_range)
    meta = spark.createDataFrame(meta_pdf).repartition(max(2, len(meta_pdf) // 2000))

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["band"] = [
                make_chip(int(tx), int(ty), int(z))
                for tx, ty, z in zip(pdf["tile_x"], pdf["tile_y"], pdf["zoom"])
            ]
            yield pdf

    schema = (
        "tile_id long, zoom long, tile_x long, tile_y long, min_lon double, min_lat double, "
        "max_lon double, max_lat double, width long, height long, band binary"
    )
    return meta.mapInPandas(gen, schema)


def pick_zoom(available: list[int], requested_deg_per_px: float) -> int:
    """Choose the stored zoom whose resolution is closest ≥ the request
    (~ AccumuloRasterStore#getLexicodedResolution selection)."""
    best = None
    for z in sorted(available, reverse=True):  # finest first
        res = 180.0 / (1 << z) / CHIP_H
        if res <= requested_deg_per_px or best is None:
            best = z
        else:
            break
    return best


def raster_query(chips: DataFrame, min_lon, min_lat, max_lon, max_lat, zoom: int) -> DataFrame:
    """Chips of one zoom intersecting a bbox (RasterQuery analog) — a pure
    filter; at scale the chips table is partitioned by zoom and sorted by
    tile_id so this prunes to a handful of files."""
    return chips.where(
        (F.col("zoom") == zoom)
        & (F.col("max_lon") > min_lon)
        & (F.col("min_lon") < max_lon)
        & (F.col("max_lat") > min_lat)
        & (F.col("min_lat") < max_lat)
    )


MOSAIC_SCHEMA = (
    "request_id long, tile_x0 long, tile_y0 long, width int, height int, grid binary"
)


def _stitch_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One mosaic request's chips → one stitched grid row (executor-side)."""
    tx0, ty0 = int(pdf["tile_x"].min()), int(pdf["tile_y"].min())
    w = (int(pdf["tile_x"].max()) - tx0 + 1) * CHIP_W
    h = (int(pdf["tile_y"].max()) - ty0 + 1) * CHIP_H
    out = np.full((h, w), np.nan, dtype=np.float32)
    for tx, ty, band in zip(pdf["tile_x"], pdf["tile_y"], pdf["band"]):
        grid = np.frombuffer(band, dtype="<f4").reshape(CHIP_H, CHIP_W)
        y = (int(ty) - ty0) * CHIP_H
        x = (int(tx) - tx0) * CHIP_W
        out[y : y + CHIP_H, x : x + CHIP_W] = grid
    return pd.DataFrame(
        {
            "request_id": [int(pdf["request_id"].iloc[0])],
            "tile_x0": [tx0],
            "tile_y0": [ty0],
            "width": [w],
            "height": [h],
            "grid": [out.tobytes()],
        }
    )


def mosaic_requests(chips: DataFrame, requests_df: DataFrame) -> DataFrame:
    """Distributed mosaic service (~ RasterUtils#mosaicChunks):
    ``requests_df`` rows (request_id, min_lon, min_lat, max_lon, max_lat,
    zoom) each produce one stitched grid row.

    Plan: broadcast the (small) request set against the chips table with
    the same zoom + bbox-overlap predicate as ``raster_query`` — the scan
    prunes by zoom/tile range — then ``groupBy(request_id).applyInPandas``
    stitches each request on an executor. Arbitrarily many concurrent
    requests parallelize; nothing is collected to the driver."""
    req = F.broadcast(
        requests_df.select(
            "request_id",
            F.col("min_lon").alias("q_min_lon"),
            F.col("min_lat").alias("q_min_lat"),
            F.col("max_lon").alias("q_max_lon"),
            F.col("max_lat").alias("q_max_lat"),
            F.col("zoom").alias("q_zoom"),
        )
    )
    j = chips.join(
        req,
        (F.col("zoom") == F.col("q_zoom"))
        & (F.col("max_lon") > F.col("q_min_lon"))
        & (F.col("min_lon") < F.col("q_max_lon"))
        & (F.col("max_lat") > F.col("q_min_lat"))
        & (F.col("min_lat") < F.col("q_max_lat")),
    )
    return (
        j.select("request_id", "tile_x", "tile_y", "band")
        .groupBy("request_id")
        .applyInPandas(_stitch_group, MOSAIC_SCHEMA)
    )


def mosaic(chips: DataFrame, min_lon, min_lat, max_lon, max_lat, zoom: int) -> np.ndarray:
    """Single-request convenience wrapper over ``mosaic_requests`` (the
    distributed path); returns the stitched numpy grid. The stitch itself
    runs executor-side — the driver receives only the finished grid."""
    spark = chips.sparkSession
    req = spark.createDataFrame(
        pd.DataFrame(
            {
                "request_id": [0],
                "min_lon": [float(min_lon)],
                "min_lat": [float(min_lat)],
                "max_lon": [float(max_lon)],
                "max_lat": [float(max_lat)],
                "zoom": [int(zoom)],
            }
        )
    )
    rows = mosaic_requests(chips, req).collect()
    if not rows:
        return np.zeros((0, 0), dtype=np.float32)
    r = rows[0]
    return np.frombuffer(r["grid"], dtype="<f4").reshape(r["height"], r["width"])


def zonal_stats(points_joined: DataFrame, value_col: str | None = None) -> DataFrame:
    """Per-polygon stats over a PIP-join result (zonal statistics)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs += [
            F.avg(value_col).alias("mean"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
        ]
    return points_joined.groupBy("polygon_id").agg(*aggs)
