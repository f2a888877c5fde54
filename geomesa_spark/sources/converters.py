"""Config-driven ingest converters (SURVEY.md §2.1 — the analog of
GeoMesa's converter framework, upstream layout
``geomesa-convert/…/convert/{DelimitedText,Json,…}Converter.scala``).

A converter SPEC is a plain dict (the declarative replacement for the
reference's HOCON configs); everything it produces is Catalyst
expressions — no per-row Python anywhere:

    spec = {
        "format": "csv",                       # csv | json | xml | parquet
        "options": {"header": "true"},         # passed to the reader
                                               # (xml: {"rowTag": "site"} —
                                               # Spark 4's native XML source)
        "fields": [                            # SQL exprs over raw columns
            {"name": "name", "expr": "upper(site)"},
            {"name": "lon",  "expr": "cast(x as double)"},
            {"name": "lat",  "expr": "cast(y as double)"},
            {"name": "ts",   "expr": "to_timestamp(seen)"},
        ],
        "id_expr": "md5(concat_ws('|', name, cast(ts as string)))",
        "validate": "lon between -180 and 180 and lat between -90 and 90",
        "geometry": {"lon": "lon", "lat": "lat", "cell_level": 8},
    }

``convert`` → typed DataFrame with ``fid`` + declared fields + derived
index columns (``cell`` at the spec's grid level, ``z2``); invalid rows
are dropped (mode="skip") or routed to a quarantine flag (mode="flag"),
mirroring the reference's validators. ``ingest`` commits the result into
the Iceberg-style manifest table (lineage + cell histogram + resume).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from geomesa_spark.operators.spatial_join import grid_cell_expr


def convert(
    spark: SparkSession,
    path: str,
    spec: dict,
    mode: str = "skip",
) -> DataFrame:
    """Raw files → typed, validated, geo-indexed DataFrame (pure Catalyst)."""
    fmt = spec.get("format", "csv")
    reader = spark.read.options(**spec.get("options", {}))
    raw = getattr(reader, fmt)(path)
    cols = [F.expr(f["expr"]).alias(f["name"]) for f in spec["fields"]]
    df = raw.select(*cols)
    if "id_expr" in spec:
        df = df.withColumn("fid", F.expr(spec["id_expr"]))
    valid = spec.get("validate")
    if valid:
        if mode == "skip":
            df = df.where(F.expr(valid))
        elif mode == "flag":
            df = df.withColumn("_valid", F.expr(valid))
        else:
            raise ValueError(f"unknown validation mode: {mode}")
    geom = spec.get("geometry")
    if geom:
        level = int(geom.get("cell_level", 8))
        df = df.withColumn("cell", grid_cell_expr(geom["lon"], geom["lat"], level))
        from geomesa_spark.functions.st_functions import st_z2

        df = df.withColumn("z2", st_z2(F.col(geom["lon"]), F.col(geom["lat"])))
    front = ["fid"] if "id_expr" in spec else []
    return df.select(*front, *[c for c in df.columns if c not in front])


def ingest(
    spark: SparkSession,
    path: str,
    spec: dict,
    root: str,
    op: str,
    partition: str = "0",
) -> DataFrame:
    """convert + manifest-commit: the converted rows land as a committed
    partition of the Iceberg-style table (lineage, cell histogram, resume
    semantics all inherited from sources/manifest)."""
    import glob as _glob

    from geomesa_spark.sources import manifest as M

    if partition in M.completed_partitions(root, op):
        return M.read_table(spark, root, op)
    df = convert(spark, path, spec)
    out_dir = os.path.join(root, "data", op, f"part={partition}")
    df.write.mode("overwrite").parquet(out_dir)
    written = spark.read.parquet(out_dir)
    stats = M.cell_stats(written) if "cell" in written.columns else {"rows": written.count()}
    files = sorted(
        os.path.relpath(p, root) for p in _glob.glob(os.path.join(out_dir, "*.parquet"))
    )
    M.commit_partition(root, op, partition, {"files": files, "input": path, **stats})
    return M.read_table(spark, root, op)
