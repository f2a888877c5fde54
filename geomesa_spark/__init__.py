"""geomesa_spark — a from-scratch, PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of GeoMesa
(reference: Afterglow375/geomesa, a fork of locationtech/geomesa — see
SURVEY.md for the operator inventory and upstream-layout citations) as
idiomatic Spark DataFrame operators:

- ``functions.cells``    — pure-numpy space-filling-curve cell math
  (Z2/Z3 Morton, GeoHash base-32, S2 level-12, equirectangular grid)
  replacing GeoMesa's ``geomesa-z3`` curve package and
  ``geomesa-utils`` GeoHash (SURVEY.md §2.3).
- ``functions.geometry`` — vectorized numpy WKT/PIP/haversine replacing
  JTS (no shapely in this environment; SURVEY.md §0).
- ``operators``          — spatial_join (broadcast + sort-merge + salted),
  kNN expand-ring join, tiling/mosaic, stats sketches, dedup,
  similarity search (SURVEY.md §2.4–2.8).
- ``sources``            — deterministic pages/gazetteer/polygon
  synthesis, spec-pinned text extraction, Iceberg-style manifest
  (partitioned parquet + JSON snapshots with per-partition lineage,
  stats, and resume).
- ``streaming``          — Structured Streaming live-view / replay
  semantics of geomesa-kafka (SURVEY.md §2.9).

All heavy math is JVM-side Catalyst expressions where possible and
Arrow-vectorized pandas UDFs otherwise; no per-row Python anywhere
(BASELINE.json input_hint mandate).
"""

__version__ = "0.1.0"
