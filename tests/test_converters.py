"""Converter-framework tests (SURVEY.md §2.1 ingest): CSV + JSON specs →
typed/validated/indexed rows, deterministic feature ids, quarantine
mode, manifest-committed ingest with resume."""

from __future__ import annotations

import os

import pytest

from geomesa_spark.sources import converters as CV
from geomesa_spark.sources import manifest as M

CSV_SPEC = {
    "format": "csv",
    "options": {"header": "true"},
    "fields": [
        {"name": "name", "expr": "upper(site)"},
        {"name": "lon", "expr": "cast(x as double)"},
        {"name": "lat", "expr": "cast(y as double)"},
        {"name": "ts", "expr": "to_timestamp(seen)"},
    ],
    "id_expr": "md5(concat_ws('|', name, cast(ts as string)))",
    "validate": "lon between -180 and 180 and lat between -90 and 90",
    "geometry": {"lon": "lon", "lat": "lat", "cell_level": 8},
}


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("conv")
    p = os.path.join(str(d), "sites.csv")
    with open(p, "w") as f:
        f.write("site,x,y,seen\n")
        f.write("paris,2.351,48.857,2024-01-01 10:00:00\n")
        f.write("nyc,-74.006,40.713,2024-01-02 11:00:00\n")
        f.write("badrow,999.0,91.0,2024-01-03 12:00:00\n")  # invalid coords
    return p


def test_csv_convert_validates_and_indexes(spark, csv_path):
    out = CV.convert(spark, csv_path, CSV_SPEC).toPandas().sort_values("name")
    assert list(out["name"]) == ["NYC", "PARIS"]  # bad row skipped
    assert {"fid", "cell", "z2"} <= set(out.columns)
    assert out["fid"].str.len().eq(32).all()
    # deterministic ids: re-convert gives identical fids
    again = CV.convert(spark, csv_path, CSV_SPEC).toPandas().sort_values("name")
    assert list(out["fid"]) == list(again["fid"])


def test_flag_mode_quarantines(spark, csv_path):
    out = CV.convert(spark, csv_path, CSV_SPEC, mode="flag").toPandas()
    assert len(out) == 3
    assert sorted(out["_valid"]) == [False, True, True]


def test_json_convert(spark, tmp_path):
    p = str(tmp_path / "events.json")
    with open(p, "w") as f:
        f.write('{"who": "a", "px": 10.5, "py": -3.25}\n{"who": "b", "px": 11.0, "py": -3.5}\n')
    spec = {
        "format": "json",
        "fields": [
            {"name": "who", "expr": "who"},
            {"name": "lon", "expr": "px"},
            {"name": "lat", "expr": "py"},
        ],
        "geometry": {"lon": "lon", "lat": "lat", "cell_level": 8},
    }
    out = CV.convert(spark, p, spec).toPandas()
    assert len(out) == 2 and "cell" in out.columns


def test_ingest_commits_and_resumes(spark, csv_path, tmp_path):
    root = str(tmp_path / "conv_tbl")
    t1 = CV.ingest(spark, csv_path, CSV_SPEC, root, "sites")
    assert t1.count() == 2
    assert M.completed_partitions(root, "sites") == {"0"}
    lin = [e for e in M.lineage(root) if e["op"] == "sites"]
    assert lin[0]["rows"] == 2 and lin[0]["cell_hist"]
    # resume: second ingest call skips the committed partition
    t2 = CV.ingest(spark, csv_path, CSV_SPEC, root, "sites")
    assert t2.count() == 2
    assert len(M.snapshots(root)) == 1  # no duplicate commit


def test_xml_convert(spark, tmp_path):
    """XML spec mode (SURVEY §2.1 converter-format parity): Spark 4's
    native XML source behind the same declarative spec — same validate/
    id/geometry machinery as CSV/JSON, no per-row Python."""
    p = os.path.join(str(tmp_path), "sites.xml")
    with open(p, "w") as f:
        f.write(
            "<sites>"
            "<site><name>paris</name><x>2.351</x><y>48.857</y>"
            "<seen>2024-01-01 10:00:00</seen></site>"
            "<site><name>nyc</name><x>-74.006</x><y>40.713</y>"
            "<seen>2024-01-02 11:00:00</seen></site>"
            "<site><name>badrow</name><x>999.0</x><y>91.0</y>"
            "<seen>2024-01-03 12:00:00</seen></site>"
            "</sites>"
        )
    spec = {
        "format": "xml",
        "options": {"rowTag": "site"},
        "fields": [
            {"name": "name", "expr": "upper(name)"},
            {"name": "lon", "expr": "cast(x as double)"},
            {"name": "lat", "expr": "cast(y as double)"},
            {"name": "ts", "expr": "to_timestamp(seen)"},
        ],
        "id_expr": "md5(concat_ws('|', name, cast(ts as string)))",
        "validate": "lon between -180 and 180 and lat between -90 and 90",
        "geometry": {"lon": "lon", "lat": "lat", "cell_level": 8},
    }
    out = CV.convert(spark, p, spec).toPandas().sort_values("name")
    assert list(out["name"]) == ["NYC", "PARIS"]  # bad row skipped
    assert {"fid", "cell", "z2"} <= set(out.columns)
    # format parity: the same logical rows through the CSV spec give
    # identical fids (id derivation is format-independent)
    csv_p = os.path.join(str(tmp_path), "sites.csv")
    with open(csv_p, "w") as f:
        f.write("site,x,y,seen\n")
        f.write("paris,2.351,48.857,2024-01-01 10:00:00\n")
        f.write("nyc,-74.006,40.713,2024-01-02 11:00:00\n")
    via_csv = CV.convert(spark, csv_p, CSV_SPEC).toPandas().sort_values("name")
    assert list(out["fid"]) == list(via_csv["fid"])
