"""Regenerate the pinned hex_rollup golden (goldens/hex_rollup_golden.parquet).

hex_rollup's aperture-7 icosahedral hex ids are not SQL-expressible, so
its DuckDB oracle joins a PINNED golden produced by this script: for
each test scale factor, the expected (hex5, n) rollup over the events
table, keyed by that sf's events row count (the oracle SQL selects the
matching sf via `WHERE sf_rows = (SELECT count(*) FROM events)`).

The lon/lat derivation matches contract.events_points bit-for-bit (the
same integer-modular formula in float64), and the hex encode/parent is
the SAME pinned hexgrid build the query uses — the golden freezes
today's ids so any future hexgrid regression becomes a driver hash
mismatch, and the oracle's independently-computed conservation row
(DuckDB count(*)) checks total mass without trusting the golden.

Run: python jobs/make_hex_golden.py   (pure pandas/numpy, no Spark)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from geomesa_spark.functions import hexgrid as H  # noqa: E402

SFS = ("sf0.001", "sf0.01")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def rollup_for(sf_dir: str) -> pd.DataFrame:
    e = pd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])
    eid = e["event_id"].to_numpy(np.int64)
    lon = ((eid * 9973) % 360000) / 1000.0 - 180.0
    lat = ((eid * 7919 + 12345) % 170000) / 1000.0 - 85.0
    h7 = H.hex_encode(lon, lat, 7)
    h5 = H.hex_parent(h7, 5)
    out = (
        pd.DataFrame({"hex5": h5})
        .groupby("hex5", as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    out["sf_rows"] = np.int64(len(eid))
    return out[["sf_rows", "hex5", "n"]].astype({"hex5": "int64", "n": "int64"})


def main() -> None:
    frames = [rollup_for(os.path.join(TESTDATA, sf)) for sf in SFS]
    golden = pd.concat(frames, ignore_index=True)
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, "..", "goldens", "hex_rollup_golden.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    golden.to_parquet(out, index=False)
    print(f"wrote {os.path.normpath(out)}: {len(golden)} rows "
          f"({[len(f) for f in frames]} per sf)")


if __name__ == "__main__":
    main()
