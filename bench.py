#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline operator suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The headline number for BASELINE.json's north rule is ``pages_per_sec``:
throughput of the full pages pipeline (synthesize Common-Crawl-shaped
pages → Arrow-UDF geo-entity extraction → gazetteer geocode → broadcast
PIP join → tile counts). Scaling-efficiency evidence (same job at two
parallelism levels) is produced by ``bench_scaling.py`` → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2400000"))
# 6 timed passes (~2 s each): hypervisor drift on this VM can inflate
# individual passes 1.5-2x (probed: [1.88, 1.72, 1.81, 2.06, 3.13, 1.78]
# in one sitting), so min-of-3 occasionally misses steady state by ~25%
# — the extra passes cost ~6 s and make the headline round-comparable.
PAGES_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "6"))

BENCH_QUERIES = [
    "pip_count_broadcast",
    "pip_count_salted",
    "knn_expand_ring",
    "dwithin_planar",
    "tile_counts_webmercator",
    "tile_rollup",
    "density_grid",
    "z3_week_histogram",
    "latest_per_user",
    "pricing_summary",
    "revenue_by_nation",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "quality_scores",
    # round 2 additions
    "pip_count_bigpoly",
    "asof_track_join",
    "simhash_neardup_pairs",
    "ann_lsh_topk",
    "mosaic_multi",
    "regional_supplier_revenue",
    "ngram_minhash_dedup",
    "token_counts_regex",
    "media_features",
    "poly_pair_relations",
    # round 3 additions
    "pip_count_auto",
    "ann_ivf_topk",
    "dedup_incremental",
    "embed_neardup_lsh",
    "repetition_stats",
    "decontamination",
    "dedup_clusters",
    "exact_substring_pairs",
    # late round 3 additions
    "track_clip_length",
    "stratified_sample",
    "source_quality_rollup",
]


def bench_diff(current: dict) -> dict | None:
    """Per-query delta vs the latest BENCH_r{N}.json in the repo (the
    driver records one per round) — makes regressions visible round-over-
    round without digging through artifacts."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return None
    n, path = max(rounds)
    try:
        prev = json.load(open(path)).get("parsed") or {}
    except Exception:
        return None
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        same_sf = float(prev.get("sf")) == float(sf)
    except (TypeError, ValueError):
        same_sf = str(prev.get("sf")) == sf
    if not same_sf or prev.get("cpus") != CPUS:
        return None  # only diff apples-to-apples configs
    prev_q = prev.get("queries") or {}
    delta = {}
    for name, sec in current.items():
        if name in prev_q and isinstance(prev_q[name], (int, float)) and prev_q[name] > 0 and isinstance(sec, (int, float)):
            delta[name] = round((sec - prev_q[name]) / prev_q[name] * 100.0, 1)
    return {"prev_round": n, "delta_pct": delta}


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("geomesa-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # GC-log forensics (see BENCH/BASELINE.md): Spark codegen grows
        # Metaspace past its default threshold, and each "Metadata GC
        # Threshold" full GC on this VM pauses 13-15 s. Pre-sizing
        # Metaspace + G1 (concurrent class unloading, no full GCs) takes
        # total GC pause from ~38 s/run to ~1 s/run. A 12g heap beats 24g:
        # lazily-grown heap pages fault slowly on this hypervisor.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseG1GC -XX:MetaspaceSize=512m -XX:MaxMetaspaceSize=2g",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def materialize_pages(spark, n_pages: int, reuse: bool = False) -> str:
    """Synthesize the pages table to parquet (not timed): the engine
    metric is pages *processed* per second, reading a stored table — the
    north-rule shape (Iceberg-style table of web pages).

    By default REWRITTEN, never reused from a previous bench invocation:
    this VM's page cache is ~1 GB and its virtual disk reads ~70 MB/s
    cold, so a stale table turns the timed passes into a disk benchmark
    (measured 15-28 s vs 2.3 s for the identical pipeline — round-3
    forensics in BENCH/BASELINE.md). A fresh write leaves the 0.9 GB
    headline table cache-hot, which is the state every prior round's
    numbers were recorded under. ``reuse=True`` (bench_scaling.py's 8.9
    GB table, cache-ineligible at ANY freshness, shared across its
    per-parallelism workers) keeps an existing table."""
    from geomesa_spark.sources import synth

    out = f"/tmp/geomesa_bench_pages_{n_pages}"
    marker = os.path.join(out, "_SUCCESS")
    if reuse and os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    parts = max(32, min(512, n_pages // 10000))
    synth.pages(spark, n_pages, partitions=parts).write.mode("overwrite").parquet(out)
    return out


def run(spark, sf_dir: str) -> dict:
    from geomesa_spark import contract

    qs = contract.queries()
    timings: dict[str, float] = {}
    total = 0.0

    # headline: pages-pipeline throughput (extract → geocode → PIP join).
    # One untimed full-width warmup (python-worker fork+import and JIT are
    # one-time costs, not throughput), then min of PAGES_REPEATS timed
    # passes (steady-state capability; see BENCH/BASELINE.md forensics).
    pages_path = materialize_pages(spark, N_PAGES)
    pages_df = spark.read.parquet(pages_path).coalesce(CPUS * 3)
    dfo = contract.pages_pipeline(spark, pages_df=pages_df)
    n_polygon_rows = dfo.count()  # warmup
    runs = []
    for _ in range(PAGES_REPEATS):
        t0 = time.perf_counter()
        dfo.count()
        runs.append(time.perf_counter() - t0)
    pages_sec = min(runs)
    timings["pages_pipeline"] = round(pages_sec, 3)
    timings["pages_pipeline_runs"] = [round(r, 3) for r in runs]
    total += pages_sec

    # min of QUERY_REPEATS per query: hypervisor contention on this VM
    # drifts wall time up to ~2x at different times of day (probed with a
    # Spark-free numpy control); min = steady-state capability, matching
    # the BENCH/BASELINE.md protocol for the pages pipeline. Per-query
    # clearCache isolates queries from each other's cached blocks, and the
    # full per-run list + spread is persisted so a one-off hypervisor stall
    # is visible as spread, not misread as a code regression.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPEATS", "3"))
    run_detail: dict[str, dict] = {}
    order = list(BENCH_QUERIES)
    if os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE"):  # order-shuffled control run
        import random

        random.Random(int(os.environ["SPARK_GRAFT_BENCH_SHUFFLE"])).shuffle(order)
    for name in order:
        spark.catalog.clearCache()
        runs_q = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            runs_q.append(time.perf_counter() - t0)
        timings[name] = round(min(runs_q), 3)
        run_detail[name] = {
            "runs": [round(r, 3) for r in runs_q],
            "spread_pct": round((max(runs_q) - min(runs_q)) / min(runs_q) * 100.0, 1),
        }
        # headline accumulates min (not sum of repeats) so the suite wall
        # number stays comparable to single-repeat prior rounds
        total += min(runs_q)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    diff = bench_diff(timings)
    flagged = sorted(
        name
        for name, pct in ((diff or {}).get("delta_pct") or {}).items()
        if isinstance(pct, (int, float)) and pct > 50.0
    )
    if flagged and diff is not None:
        diff["regression_flags"] = flagged  # >1.5x round-over-round: investigate before trusting
    return {
        **({"diff_vs_prev": diff} if diff else {}),
        "metric": "headline suite wall time (pages pipeline + operator queries)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "query_runs": run_detail,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pages_per_sec": round(N_PAGES / pages_sec, 1),
        "n_pages": N_PAGES,
        "cpus": CPUS,
        "n_polygon_rows": int(n_polygon_rows),
    }


def main():
    spark = build_spark(CPUS)
    try:
        result = run(spark, SF_DIR)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
