"""Resume / lineage / manifest-pruning tests (SURVEY.md §5.2.6)."""

from __future__ import annotations

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
