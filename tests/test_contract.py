"""Mirror of the driver's correctness gate: run every queries() entry and
its oracle_sql() twin side-by-side at sf0.001 and require EXACT equality
(row count, column names, and values after sorting columns by name and
rows lexicographically) — stricter than any hash compare the driver does.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"create view {t} as select * from read_parquet('{path}')")
    yield con
    con.close()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(ORACLES[name]).df()
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            mism = ~(np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0) | (pd.isna(av) & pd.isna(bv)))
        else:
            mism = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        assert not mism.any(), f"{name}.{c}: {int(mism.sum())} mismatches, e.g. {av[mism][:3]} vs {bv[mism][:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"polygon_id", "n_mentions", "n_pages"} <= set(df.columns)


def test_line_poly_oracle_no_corner_degeneracy():
    """Guard for line_poly_relations: no filtered segment may be exactly
    collinear with a corner of polygon 0 at any test SF — the single
    geometric degeneracy (graze-without-entry) where the engine's exact
    kernel and the SQL segment-box oracle could disagree. Data is
    deterministic, so green here certifies the pairing forever."""
    import duckdb

    from geomesa_spark.functions import geometry as geo
    from geomesa_spark.sources import synth

    p0 = synth.polygons()[0]
    x0, y0, x1, y1 = geo.polygon_bbox(p0.coords)
    mx, my = 0.3 * (x1 - x0), 0.3 * (y1 - y0)
    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.connect()
        con.sql(f"create view events as select * from read_parquet('/root/testdata/sf{sf}/events.parquet')")
        pts = con.sql(
            "select user_id, event_id pid,"
            " ((event_id * 9973) % 360000) / 1000.0 - 180.0 lon,"
            " (((event_id * 7919) + 12345) % 170000) / 1000.0 - 85.0 lat from events"
        ).df()
        m = (
            (pts.lon >= x0 - mx) & (pts.lon <= x1 + mx)
            & (pts.lat >= y0 - my) & (pts.lat <= y1 + my)
            & ((pts.pid * 9973) % 1000 != 0)
            & (((pts.pid * 7919) + 12345) % 1000 != 0)
        )
        sub = pts[m].sort_values(["user_id", "pid"])
        # no integer lon/lat survives the modular filter (boundary-safe)
        assert not (sub.lon == sub.lon.round()).any()
        assert not (sub.lat == sub.lat.round()).any()
        for _uid, g in sub.groupby("user_id"):
            if len(g) < 2:
                continue
            a = g[["lon", "lat"]].to_numpy()
            s1, s2 = a[:-1], a[1:]
            for cx, cy in [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]:
                d = (s2[:, 0] - s1[:, 0]) * (cy - s1[:, 1]) - (s2[:, 1] - s1[:, 1]) * (cx - s1[:, 0])
                assert (d != 0.0).all(), (sf, cx, cy)


def test_stratified_hash_engine_parity_at_large_ids(spark):
    """The sample hash must agree between Spark and DuckDB for ANY int64
    doc_id: the unreduced (doc_id * 2654435761) % p overflows at
    doc_id ≈ 3.47e9 (DuckDB errors, non-ANSI Spark wraps negative); the
    shipped mod-before-multiply form stays in range in both engines."""
    import duckdb

    ids = [0, 1, 999_999, 3_474_699_430, 3_475_000_000, 2**62, 2**63 - 1]
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["k"]
        for r in sdf.selectExpr(
            "doc_id", "((doc_id % 1000000007) * 2654435761) % 1000000007 as k"
        ).collect()
    }
    con = duckdb.connect()
    want = {
        int(a): int(b)
        for a, b in con.sql(
            "select doc_id, ((doc_id % 1000000007) * 2654435761) % 1000000007"
            f" from (values {','.join(f'({i})' for i in ids)}) v(doc_id)"
        ).fetchall()
    }
    assert got == want
    assert all(0 <= v < 1_000_000_007 for v in got.values())
