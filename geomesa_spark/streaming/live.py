"""Structured-Streaming surface (SURVEY.md §2.9).

GeoMesa's streaming layer (``geomesa-kafka/.../KafkaDataStore.scala``,
upstream layout per SURVEY.md §0) exposes *snapshot* semantics: a live
view holding the latest SimpleFeature per feature id with TTL expiry,
plus a replay store reading a time window. Re-expressed on Structured
Streaming we keep those semantics and gain event-time windows/watermarks:

- ``live_view``            — latest-state-per-url with TTL (watermark +
                             dedupe; the KafkaDataStore "live consumer")
- ``windowed_cell_counts`` — tumbling/sliding per-cell counts (the
                             streaming analog of DensityScan)
- ``replay``               — batch read of the log between two timestamps
                             (~ geomesa-kafka replay/*)
- ``stream_to_table``      — ``foreachBatch`` sink committing each
                             micro-batch into the Iceberg-style manifest
                             (streaming ingest → indexed table, with the
                             same lineage/resume guarantees as batch)

Every transformation here is also valid on batch DataFrames — the same
operator registry serves both (the reference's CQL-filter-on-stream
equivalence).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from geomesa_spark.operators.spatial_join import grid_cell_expr
from geomesa_spark.sources import manifest as M

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of pages micro-batch directories (the sandbox
    stand-in for the Kafka topic; same schema, same event-time column)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


SOCKET_WIRE_COLS = ("url", "warc_ts", "lon", "lat")


def read_events_socket(spark: SparkSession, host: str = "127.0.0.1", port: int = 9999) -> DataFrame:
    """NETWORK streaming source (TCP socket) — the offline analog of the
    Kafka consumer: an unbounded feed of records over a connection, one
    TSV record per line (``url\\tepoch_sec\\tlon\\tlat``). Everything
    downstream (live_view / windowed_cell_counts / stream_to_table) is
    source-agnostic, so swapping in ``format("kafka")`` on a real cluster
    changes ONLY this reader."""
    raw = (
        spark.readStream.format("socket").option("host", host).option("port", port).load()
    )
    parts = F.split(F.col("value"), "\t")
    # F.get (not getItem): malformed lines yield NULLs instead of an ANSI
    # INVALID_ARRAY_INDEX error that would kill the stream
    return raw.select(
        F.get(parts, 0).alias("url"),
        F.to_timestamp(F.get(parts, 1).try_cast("double")).alias("warc_ts"),
        F.get(parts, 2).try_cast("double").alias("lon"),
        F.get(parts, 3).try_cast("double").alias("lat"),
    ).where(F.col("warc_ts").isNotNull())


def live_view(stream: DataFrame, ttl: str = "1 hour", id_col: str = "url", ts_col: str = "warc_ts") -> DataFrame:
    """Latest-state-per-id live view with TTL expiry (KafkaDataStore
    semantics): watermark bounds state, duplicates within the watermark
    are dropped, rows older than the watermark age out of state.

    Note the expiry side-effect: a row whose event time is already older
    than ``max(event_time seen) - ttl`` when it ARRIVES is treated as
    expired and never emitted (the watermark drops it as late). That is
    the live view's contract — the reference's expiry-configured Kafka
    consumer behaves the same way for stale messages; use ``replay`` for
    a complete time-window read."""
    return stream.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark([id_col])


def windowed_cell_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    level: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "warc_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) per-cell counts with
    late-data handling: rows later than ``watermark`` are dropped and the
    window finalizes — the streaming DensityScan."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .withColumn("cell", grid_cell_expr(lon_col, lat_col, level))
        .groupBy(win.alias("win"), "cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "cell", "n")
    )


def replay(spark: SparkSession, path: str, t1, t2, ts_col: str = "warc_ts") -> DataFrame:
    """Batch read of the stream log between two timestamps
    (geomesa-kafka replay semantics — time-window scan, no state)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path).where(F.col(ts_col).between(t1, t2))


def stream_to_table(
    stream: DataFrame,
    root: str,
    op: str,
    checkpoint_dir: str | None = None,
    cell_col: str | None = None,
):
    """Streaming ingest into the Iceberg-style table: every micro-batch
    commits one manifest partition (op/batch=<id>) with lineage + metrics,
    so a restarted query resumes from the Spark checkpoint AND the table
    remains consistent (uncommitted data is invisible — manifest.py).
    Returns the StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(root, "_stream_checkpoint", op)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = f"batch={batch_id}"
        done = M.completed_partitions(root, op)
        if part in done:  # foreachBatch replays after restart: idempotent skip
            return
        out_dir = os.path.join(root, "data", op, f"part={part}")
        batch_df.write.mode("overwrite").parquet(out_dir)
        spark = batch_df.sparkSession
        written = spark.read.parquet(out_dir)
        stats = (
            M.cell_stats(written, cell_col)
            if cell_col and cell_col in written.columns
            else {"rows": written.count()}
        )
        import glob as _glob

        files = sorted(
            os.path.relpath(p, root) for p in _glob.glob(os.path.join(out_dir, "*.parquet"))
        )
        M.commit_partition(root, op, part, {"files": files, "input": f"stream-batch-{batch_id}", **stats})

    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
