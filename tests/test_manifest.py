"""Resume / lineage / manifest-pruning tests (SURVEY.md §5.2.6)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.functions import cells as C
from geomesa_spark.operators.spatial_join import with_grid_cell
from geomesa_spark.sources import manifest as M
from geomesa_spark.sources import synth

LEVEL = 8
PARTS = ["p0", "p1", "p2", "p3"]


def _make_df(spark, part):
    """One deterministic chunk of spatialized pages-entity-like points."""
    k = int(part[1])
    ids = np.arange(k * 500, (k + 1) * 500, dtype=np.uint64)
    lon = synth._uniform(ids, -179.9, 179.9)
    lat = synth._uniform(ids + np.uint64(999), -84.9, 84.9)
    # skew: 30% of rows in chunk land on the first hot city
    hot = synth.hash64(ids) % np.uint64(10) < np.uint64(3)
    lon[hot], lat[hot] = synth.HOT_CITIES[0][1], synth.HOT_CITIES[0][2]
    pdf = pd.DataFrame({"pid": ids.astype(np.int64), "lon": lon, "lat": lat})
    return with_grid_cell(spark.createDataFrame(pdf), level=LEVEL)


def test_resume_after_partial_run(spark, tmp_path):
    root_a = str(tmp_path / "tbl_a")
    root_b = str(tmp_path / "tbl_b")

    # one-shot run
    full = M.run_checkpointed(spark, root_a, "points", PARTS, _make_df).toPandas()

    # partial run (simulated crash after 2 chunks) ...
    M.run_checkpointed(spark, root_b, "points", PARTS[:2], _make_df)
    assert M.completed_partitions(root_b, "points") == set(PARTS[:2])
    # ... then resume; only p2/p3 may recompute
    calls = []

    def tracking_make(spark_, part):
        calls.append(part)
        return _make_df(spark_, part)

    resumed = M.run_checkpointed(spark, root_b, "points", PARTS, tracking_make).toPandas()
    assert calls == ["p2", "p3"]

    key = ["pid"]
    a = full.sort_values(key).reset_index(drop=True)
    b = resumed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lineage_records_metrics(spark, tmp_path):
    root = str(tmp_path / "tbl")
    M.run_checkpointed(spark, root, "points", PARTS[:2], _make_df, input_desc="synth-chunk")
    rows = M.lineage(root)
    assert len(rows) == 2
    for r in rows:
        assert r["op"] == "points"
        assert r["rows"] == 500
        assert r["files"]
        assert r["cell_min"] <= r["cell_max"]
        assert len(r["cell_hist"]) > 0
        assert r["input"] == "synth-chunk"


def test_hot_cells_from_manifest(spark, tmp_path):
    root = str(tmp_path / "tbl")
    M.run_checkpointed(spark, root, "points", PARTS, _make_df)
    hot = M.hot_cells_from_manifest(root, "points", threshold_fraction=0.05)
    hot_city_cell = int(
        C.grid_encode(np.array([synth.HOT_CITIES[0][1]]), np.array([synth.HOT_CITIES[0][2]]), LEVEL)[0]
    )
    assert hot_city_cell in hot


def test_manifest_cell_range_pruning(spark, tmp_path):
    root = str(tmp_path / "tbl")
    M.run_checkpointed(spark, root, "points", PARTS, _make_df)
    full = M.read_table(spark, root, "points").toPandas()
    lo, hi = 5000, 12000
    pruned = M.read_table(spark, root, "points", cell_range=(lo, hi)).toPandas()
    expect = full[(full["cell"] >= lo) & (full["cell"] <= hi)]
    assert sorted(pruned["pid"]) == sorted(expect["pid"])


def test_uncommitted_invisible(spark, tmp_path):
    root = str(tmp_path / "tbl")
    M.run_checkpointed(spark, root, "points", PARTS[:1], _make_df)
    # orphan write without commit (simulates crash between write and commit)
    _make_df(spark, "p3").write.mode("overwrite").parquet(f"{root}/data/points/part=p3")
    visible = M.read_table(spark, root, "points").toPandas()
    assert set(visible["pid"] // 500) == {0}
    with pytest.raises(ValueError):
        M.read_table(spark, root, "nope")


def test_time_travel_expiry_compaction_orphans(spark, tmp_path):
    """Iceberg-style lifecycle: VERSION-AS-OF reads, snapshot expiry,
    compaction (row-identical, fewer files), orphan-file reclamation."""
    import glob as _glob

    root = str(tmp_path / "lifecycle_tbl")

    def write_part(k, n):
        out = os.path.join(root, "data", "ev", f"part={k}")
        spark.range(k * 100, k * 100 + n).withColumnRenamed("id", "v").write.mode(
            "overwrite"
        ).parquet(out)
        files = sorted(
            os.path.relpath(p, root) for p in _glob.glob(os.path.join(out, "*.parquet"))
        )
        return M.commit_partition(root, "ev", str(k), {"files": files, "rows": n, "input": f"gen{k}"})

    s0 = write_part(0, 10)
    s1 = write_part(1, 20)
    assert s1["snapshot_id"] == s0["snapshot_id"] + 1

    # time travel: snapshot 0 sees only partition 0
    now_rows = M.read_table(spark, root, "ev").count()
    old_rows = M.read_table(spark, root, "ev", as_of_snapshot=s0["snapshot_id"]).count()
    assert (now_rows, old_rows) == (30, 10)

    # orphan: written but never committed -> invisible, then reclaimed
    orphan_dir = os.path.join(root, "data", "ev", "part=orphan")
    spark.range(5).write.parquet(orphan_dir)
    assert M.read_table(spark, root, "ev").count() == 30
    removed = M.remove_orphan_files(root, dry_run=True)
    assert removed and all("part=orphan" in p for p in removed)

    # compaction: same rows, one file, one replacement snapshot
    snap_c = M.compact_partitions(spark, root, "ev", target_files=1)
    after = M.read_table(spark, root, "ev")
    assert after.count() == 30
    assert len(after.inputFiles()) == 1
    # pre-compaction time travel still works while snapshots retained
    assert M.read_table(spark, root, "ev", as_of_snapshot=s1["snapshot_id"]).count() == 30

    # expire everything but the compacted snapshot, then reclaim orphans:
    # the pre-compaction originals + the uncommitted orphan disappear
    expired = M.expire_snapshots(root, keep_last=1)
    assert s0["snapshot_id"] in expired and s1["snapshot_id"] in expired
    removed = M.remove_orphan_files(root)
    assert any("part=0" in p for p in removed) and any("part=orphan" in p for p in removed)
    assert M.read_table(spark, root, "ev").count() == 30  # current snapshot intact
    with pytest.raises(ValueError):
        M.read_table(spark, root, "ev", as_of_snapshot=s0["snapshot_id"])


def test_create_table_records_schema(tmp_path):
    root = str(tmp_path / "cat_tbl")
    M.create_table(root, "events", "pid long, lon double, lat double", "cell bucket(32)")
    meta = M.table_schema(root, "events")
    assert meta["schema"].startswith("pid long")
    assert meta["partition_spec"] == "cell bucket(32)"
    # creating another table preserves the first
    M.create_table(root, "docs", "doc_id long, text string")
    assert M.table_schema(root, "events") is not None
    assert M.table_schema(root, "docs")["partition_spec"] == ""


def test_compaction_is_safe_to_repeat_and_preserves_resume_and_catalog(spark, tmp_path):
    """Round-2 review regressions: (a) re-compaction must not overwrite
    files the current snapshot references; (b) the catalog survives
    commits; (c) completed_partitions still reports partitions subsumed
    by compaction (exactly-once resume)."""
    import glob as _glob

    root = str(tmp_path / "compact2_tbl")
    M.create_table(root, "ev", "v long")

    def write_part(k, n):
        out = os.path.join(root, "data", "ev", f"part={k}")
        spark.range(k * 100, k * 100 + n).withColumnRenamed("id", "v").write.mode("overwrite").parquet(out)
        files = sorted(os.path.relpath(p, root) for p in _glob.glob(os.path.join(out, "*.parquet")))
        M.commit_partition(root, "ev", str(k), {"files": files, "rows": n, "input": f"g{k}"})

    write_part(0, 10)
    write_part(1, 5)
    # catalog survived the commits
    assert M.table_schema(root, "ev")["schema"] == "v long"

    M.compact_partitions(spark, root, "ev", target_files=1)
    assert M.read_table(spark, root, "ev").count() == 15
    # resume still sees the original partition keys
    assert {"0", "1"} <= M.completed_partitions(root, "ev")
    # second compaction: distinct output dir, table still readable
    M.compact_partitions(spark, root, "ev", target_files=1)
    assert M.read_table(spark, root, "ev").count() == 15
    assert {"0", "1"} <= M.completed_partitions(root, "ev")
    assert M.table_schema(root, "ev") is not None
