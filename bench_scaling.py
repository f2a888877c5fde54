#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json):
"≥0.8 throughput scaling efficiency between N and 4N executors".

No real cluster exists in this sandbox, so (per the driver instruction)
the same job runs at two parallelism levels — ``local[8]`` vs
``local[32]`` — on the SAME input, and efficiency is reported as
``(thr_4N / thr_N) / 4``. Each level runs in its own subprocess (one JVM
per master config). Results land in BENCH/BASELINE.md.

Usage:  python bench_scaling.py             # full run, writes BENCH/BASELINE.md
        python bench_scaling.py --worker 8  # internal: one level, prints JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "120000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (8, 32)


def worker(cpus: int) -> None:
    """Run the pages pipeline once at local[cpus]; print one JSON line."""
    from bench import build_spark, materialize_pages
    from geomesa_spark import contract

    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    spark = build_spark(cpus)
    try:
        pages_path = materialize_pages(spark, N_PAGES)
        pages_df = spark.read.parquet(pages_path)
        # warm up: JIT, python worker pool, parquet footers (excluded from timing)
        contract.pages_pipeline(spark, pages_df=pages_df.limit(2000)).count()
        runs = []
        n = 0
        for _ in range(repeats):  # median beats single-shot on a noisy VM
            t0 = time.perf_counter()
            n = contract.pages_pipeline(spark, pages_df=pages_df).count()
            runs.append(time.perf_counter() - t0)
        dt = sorted(runs)[len(runs) // 2]

        ops_runs = []
        for _ in range(repeats):
            t1 = time.perf_counter()
            contract.queries()["pip_count_broadcast"](spark, SF_DIR).count()
            contract.queries()["tile_counts_webmercator"](spark, SF_DIR).count()
            ops_runs.append(time.perf_counter() - t1)
        dt_ops = sorted(ops_runs)[len(ops_runs) // 2]
    finally:
        spark.stop()
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "pages": N_PAGES,
                "pipeline_sec": round(dt, 3),
                "pipeline_runs": [round(r, 3) for r in runs],
                "pages_per_sec": round(N_PAGES / dt, 1),
                "ops_sec": round(dt_ops, 3),
                "ops_runs": [round(r, 3) for r in ops_runs],
                "rows": int(n),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    results = {}
    for cpus in LEVELS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("WORKER_RESULT ")), None
        )
        if line is None:
            sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
            raise RuntimeError(f"worker local[{cpus}] produced no result")
        results[cpus] = json.loads(line[len("WORKER_RESULT ") :])

    n, n4 = LEVELS
    thr_n = results[n]["pages_per_sec"]
    thr_4n = results[n4]["pages_per_sec"]
    eff = (thr_4n / thr_n) / (n4 / n)
    ops_speedup = results[n]["ops_sec"] / results[n4]["ops_sec"]

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured scaling evidence

North-rule criterion: >=0.8 throughput scaling efficiency between N and 4N
executors. Sandbox proxy (driver-sanctioned): same job, same input, two
parallelism levels `local[{n}]` vs `local[{n4}]` on one machine.

## Workload

Pages pipeline (the BASELINE.json headline): synthesize {N_PAGES}
Common-Crawl-shaped pages (mapInArrow) -> Arrow-UDF geo-entity extraction ->
broadcast gazetteer geocode -> broadcast PIP join vs {194} polygons ->
per-polygon counts. Plus the sf0.1 operator pair
(pip_count_broadcast + tile_counts_webmercator) as a secondary signal.
Per-level JVMs are fresh subprocesses; a 2000-page warmup run per level is
excluded from timing.

## Results

| level | pages | pipeline sec | pages/sec | ops sec |
|---|---|---|---|---|
| local[{n}] (N)  | {N_PAGES} | {results[n]["pipeline_sec"]} | {thr_n} | {results[n]["ops_sec"]} |
| local[{n4}] (4N) | {N_PAGES} | {results[n4]["pipeline_sec"]} | {thr_4n} | {results[n4]["ops_sec"]} |

- **Scaling efficiency (pages/sec, N -> 4N): {eff:.3f}** (criterion >= 0.8: {"PASS" if eff >= 0.8 else "MISS"})
- Operator-pair speedup N -> 4N: {ops_speedup:.2f}x

Raw JSON: `{json.dumps(results)}`
"""
        )
    print(json.dumps({"efficiency": round(eff, 3), "results": results}))


if __name__ == "__main__":
    main()
