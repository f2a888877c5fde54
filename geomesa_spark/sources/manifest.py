"""Iceberg-style table layout: partitioned parquet + JSON manifests.

No Iceberg runtime jar exists in this sandbox (SURVEY.md §0.4), so the
north rule's "Iceberg table ... resumable from checkpoint with
per-partition lineage + metrics" is implemented as an Iceberg-*style*
layout that a real Iceberg catalog can replace 1:1 where jars exist:

    table_root/
      data/<op>/part=<k>/*.parquet      # partition-chunked data files
      _manifest/snap-00000.json         # snapshot log (append-only)
      _manifest/CURRENT                 # name of the latest snapshot

Each snapshot records, per committed partition: the operator name, input
description, row count, file list, and a cell histogram (top-N cells) —
the lineage + metrics the north rule requires, and the stats the planner
uses for file pruning (cell min/max) and skew detection (hot cells).

Resume semantics (~ Iceberg snapshot isolation): a partition is visible
iff its commit record exists in a snapshot. ``completed_partitions`` tells
a re-run which chunks to skip; a crash between data write and commit
leaves an orphan file that is ignored (and overwritten) on resume —
exactly-once output without distributed transactions.

All driver-side JSON I/O is tiny (KBs); data I/O is Spark parquet.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_DIR = "_manifest"
HIST_TOP_N = 32


# ---------------------------------------------------------------------------
# snapshot log
# ---------------------------------------------------------------------------


def _mdir(root: str) -> str:
    return os.path.join(root, MANIFEST_DIR)


def current_snapshot(root: str) -> dict | None:
    cur = os.path.join(_mdir(root), "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = f.read().strip()
    with open(os.path.join(_mdir(root), name)) as f:
        return json.load(f)


def _write_snapshot(root: str, snap: dict) -> None:
    os.makedirs(_mdir(root), exist_ok=True)
    name = f"snap-{snap['snapshot_id']:05d}.json"
    path = os.path.join(_mdir(root), name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic: CURRENT only ever names a complete file
    cur_tmp = os.path.join(_mdir(root), "CURRENT.tmp")
    with open(cur_tmp, "w") as f:
        f.write(name)
    os.replace(cur_tmp, os.path.join(_mdir(root), "CURRENT"))


def commit_partition(root: str, op: str, partition: str, entry: dict) -> dict:
    """Append one partition's lineage record as a new snapshot (Iceberg-style
    append commit). ``entry``: {files, rows, cell_hist, input, ...}."""
    prev = current_snapshot(root)
    snap = {
        "snapshot_id": (prev["snapshot_id"] + 1) if prev else 0,
        "parent": prev["snapshot_id"] if prev else None,
        "partitions": dict(prev["partitions"]) if prev else {},
    }
    if prev and prev.get("tables"):
        snap["tables"] = prev["tables"]  # catalog entries survive commits
    snap["partitions"][f"{op}/{partition}"] = entry
    _write_snapshot(root, snap)
    return snap


def completed_partitions(root: str, op: str) -> set[str]:
    snap = current_snapshot(root)
    if snap is None:
        return set()
    prefix = f"{op}/"
    out = set()
    for k, entry in snap["partitions"].items():
        if not k.startswith(prefix):
            continue
        out.add(k[len(prefix):])
        out.update(entry.get("replaces", []))  # compaction subsumed these
    return out


def snapshots(root: str) -> list[dict]:
    """All snapshots in the log, oldest first (the time-travel axis)."""
    out = []
    for p in sorted(glob.glob(os.path.join(_mdir(root), "snap-*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return sorted(out, key=lambda s: s["snapshot_id"])


def snapshot_by_id(root: str, snapshot_id: int) -> dict:
    path = os.path.join(_mdir(root), f"snap-{snapshot_id:05d}.json")
    if not os.path.exists(path):
        raise ValueError(f"snapshot {snapshot_id} not found (expired or never committed)")
    with open(path) as f:
        return json.load(f)


def lineage(root: str, snapshot: dict | None = None) -> list[dict]:
    """Flattened lineage rows: one per committed (op, partition) — of the
    CURRENT snapshot, or of an explicit (time-travel) snapshot."""
    snap = snapshot if snapshot is not None else current_snapshot(root)
    if snap is None:
        return []
    out = []
    for key, entry in sorted(snap["partitions"].items()):
        op, part = key.split("/", 1)
        out.append({"op": op, "partition": part, **entry})
    return out


# ---------------------------------------------------------------------------
# stats helpers (feed pruning + the skew planner)
# ---------------------------------------------------------------------------


def cell_stats(df: DataFrame, cell_col: str = "cell") -> dict:
    """Row count, cell min/max, and top-N cell histogram in ONE pass
    (single partial-agg shuffle; the histogram is the skew planner's
    input — SURVEY.md §4.3)."""
    counts = (
        df.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), cell_col)
        .limit(HIST_TOP_N)
        .collect()
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.min(cell_col).alias("cell_min"),
        F.max(cell_col).alias("cell_max"),
    ).collect()[0]
    return {
        "rows": agg["rows"],
        "cell_min": agg["cell_min"],
        "cell_max": agg["cell_max"],
        "cell_hist": {str(r[cell_col]): r["n"] for r in counts},
    }


def hot_cells_from_manifest(root: str, op: str, threshold_fraction: float = 0.01) -> list[int]:
    """Skew list straight from committed cell histograms — no extra scan
    (the manifest-driven variant of spatial_join.hot_cells)."""
    rows = 0
    merged: dict[int, int] = {}
    for entry in lineage(root):
        if entry["op"] != op:
            continue
        rows += entry.get("rows", 0)
        for cell, n in entry.get("cell_hist", {}).items():
            merged[int(cell)] = merged.get(int(cell), 0) + n
    if rows == 0:
        return []
    return sorted(c for c, n in merged.items() if n > rows * threshold_fraction)


# ---------------------------------------------------------------------------
# checkpointed pipeline runner (resume-from-snapshot)
# ---------------------------------------------------------------------------


def run_checkpointed(
    spark: SparkSession,
    root: str,
    op: str,
    partitions: list[str],
    make_df,
    cell_col: str | None = "cell",
    input_desc: str = "",
) -> DataFrame:
    """Run ``make_df(spark, partition) -> DataFrame`` once per partition,
    committing each to the snapshot log; already-committed partitions are
    skipped (resume). Returns the table as a DataFrame (all partitions).

    At cluster scale each partition is one id-range / week-bucket chunk of
    the input; a killed run resumes at the first uncommitted chunk with
    committed output untouched (snapshot isolation)."""
    done = completed_partitions(root, op)
    for part in partitions:
        if part in done:
            continue
        out_dir = os.path.join(root, "data", op, f"part={part}")
        df = make_df(spark, part)
        df.write.mode("overwrite").parquet(out_dir)  # overwrite orphans from crashes
        written = spark.read.parquet(out_dir)
        stats = (
            cell_stats(written, cell_col)
            if cell_col and cell_col in written.columns
            else {"rows": written.count()}
        )
        files = sorted(
            os.path.relpath(p, root) for p in glob.glob(os.path.join(out_dir, "*.parquet"))
        )
        commit_partition(
            root, op, part, {"files": files, "input": input_desc or part, **stats}
        )
    return read_table(spark, root, op)


def read_table(
    spark: SparkSession,
    root: str,
    op: str,
    cell_range: tuple[int, int] | None = None,
    as_of_snapshot: int | None = None,
) -> DataFrame:
    """Read committed partitions only (manifest-driven file pruning):
    uncommitted/orphan files are invisible, ``cell_range`` prunes whole
    partitions via manifest cell min/max before parquet row-group
    pushdown, and ``as_of_snapshot`` time-travels to an earlier snapshot
    (Iceberg ``VERSION AS OF`` semantics — old data files stay on disk
    until ``expire_snapshots`` + ``remove_orphan_files``)."""
    snap = snapshot_by_id(root, as_of_snapshot) if as_of_snapshot is not None else None
    paths = []
    for entry in lineage(root, snap):
        if entry["op"] != op:
            continue
        if cell_range is not None and "cell_min" in entry:
            lo, hi = cell_range
            if entry["cell_max"] < lo or entry["cell_min"] > hi:
                continue
        paths.extend(os.path.join(root, f) for f in entry["files"])
    if not paths:
        raise ValueError(f"no committed partitions for op={op} under {root}")
    df = spark.read.parquet(*paths)
    if cell_range is not None and "cell" in df.columns:
        df = df.where(F.col("cell").between(*cell_range))
    return df


# ---------------------------------------------------------------------------
# table maintenance (Iceberg-style lifecycle)
# ---------------------------------------------------------------------------


def expire_snapshots(root: str, keep_last: int = 5) -> list[int]:
    """Delete snapshot json files older than the newest ``keep_last``
    (CURRENT is always retained). Returns expired snapshot ids. Data
    files are NOT touched — run ``remove_orphan_files`` afterwards to
    reclaim files no retained snapshot references."""
    snaps = snapshots(root)
    if len(snaps) <= keep_last:
        return []
    expired = []
    for snap in snaps[:-keep_last]:
        sid = snap["snapshot_id"]
        os.remove(os.path.join(_mdir(root), f"snap-{sid:05d}.json"))
        expired.append(sid)
    return expired


def remove_orphan_files(root: str, dry_run: bool = False) -> list[str]:
    """Delete data files referenced by NO retained snapshot: crash
    orphans (written but never committed) and files only reachable from
    expired snapshots (e.g. pre-compaction originals). Returns the
    removed (or would-remove) paths, repo-relative."""
    referenced: set[str] = set()
    for snap in snapshots(root):
        for entry in snap["partitions"].values():
            referenced.update(entry.get("files", []))
    removed = []
    for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(p, root)
        if rel not in referenced:
            removed.append(rel)
            if not dry_run:
                os.remove(p)
    return sorted(removed)


def compact_partitions(
    spark: SparkSession,
    root: str,
    op: str,
    target_files: int = 1,
) -> dict:
    """Rewrite all of ``op``'s committed partitions into ``target_files``
    files and commit the result as ONE replacement snapshot (Iceberg
    rewrite_data_files): readers of the new snapshot see identical rows
    from fewer files; time travel to pre-compaction snapshots keeps
    working until they are expired and orphans removed."""
    prev = current_snapshot(root)
    df = read_table(spark, root, op)
    # versioned output dir: re-compaction must NEVER overwrite files the
    # current snapshot (and the lazy read above) still reference
    tag = f"compacted-{prev['snapshot_id'] + 1}"
    out_dir = os.path.join(root, "data", op, f"part={tag}")
    df.repartition(target_files).write.mode("overwrite").parquet(out_dir)
    written = spark.read.parquet(out_dir)
    rows = written.count()
    files = sorted(
        os.path.relpath(p, root) for p in glob.glob(os.path.join(out_dir, "*.parquet"))
    )
    # resume safety: the replacement entry remembers the partition keys it
    # subsumes so completed_partitions still reports them after compaction
    prefix = f"{op}/"
    replaced = sorted(
        {k[len(prefix):] for k in prev["partitions"] if k.startswith(prefix)}
        | set().union(*(set(v.get("replaces", [])) for k, v in prev["partitions"].items()
                        if k.startswith(prefix)), set())
    )
    snap = {
        "snapshot_id": prev["snapshot_id"] + 1,
        "parent": prev["snapshot_id"],
        "partitions": {
            k: v for k, v in prev["partitions"].items() if not k.startswith(prefix)
        },
    }
    if prev.get("tables"):
        snap["tables"] = prev["tables"]
    stats = {
        "files": files,
        "rows": rows,
        "input": f"compaction of {op}",
        "replaces": replaced,
    }
    if "cell" in written.columns:
        stats.update({k: v for k, v in cell_stats(written).items() if k != "rows"})
    snap["partitions"][f"{op}/{tag}"] = stats
    _write_snapshot(root, snap)
    return snap


def create_table(root: str, name: str, schema: str, partition_spec: str = "") -> dict:
    """Explicit catalog entry (~ DataStore.createSchema): records the
    table's schema + partition spec in snapshot 0 so readers/ingesters
    can validate against it. Partitions commit under op=``name``."""
    meta = {"schema": schema, "partition_spec": partition_spec}
    prev = current_snapshot(root)
    snap = {
        "snapshot_id": (prev["snapshot_id"] + 1) if prev else 0,
        "parent": prev["snapshot_id"] if prev else None,
        "partitions": dict(prev["partitions"]) if prev else {},
        "tables": {**(prev.get("tables") or {}), name: meta} if prev else {name: meta},
    }
    _write_snapshot(root, snap)
    return snap


def table_schema(root: str, name: str) -> dict | None:
    snap = current_snapshot(root)
    if snap is None:
        return None
    return (snap.get("tables") or {}).get(name)
