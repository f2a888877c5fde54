#!/usr/bin/env python
"""Dense-vs-strided crossover measurement for exact_substring_pairs
(round-4 verdict ask #2): the strided config's fixed barriers (df-cap
aggregation + two broadcast-semi prunes + dense re-verify) cost 4.1×
dense at sf0.1, so ``stride="auto"`` needs a MEASURED corpus-size floor,
mirroring dedupe_and_append's measured prune floor.

Protocol: scale the documents corpus by replication with remapped doc
ids and a per-replica Caesar shift of the text (shifted replicas share
no k-grams with each other, so pair volume stays linear in corpus size
while ANCHOR volume — the thing the stride knob attacks — grows with
every replica; no external data). At each scale run dense (stride=1)
then strided (k/2 + df-cap 64), min-of-2 each, interleaved. The
crossover is where strided first beats dense; ESUB_AUTO_FLOOR_CHARS in
operators/dedup.py pins the floor with margin below it.

    python bench_esub_crossover.py       # writes BENCH/esub_crossover.json

One JSON line on stdout; detail in the BENCH file.
"""

from __future__ import annotations

import json
import os
import time

import bench  # repo-root bench.py: build_spark + G1/Arrow settings

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALES = [int(s) for s in os.environ.get("SPARK_GRAFT_ESUB_SCALES", "1,2,4,8").split(",")]
REPEATS = int(os.environ.get("SPARK_GRAFT_ESUB_REPEATS", "2"))
K, DUP = 20, 40


def replicated(spark, base, n: int):
    """n corpus copies: replica r shifts letters by r (k-grams disjoint
    across replicas) and offsets doc ids by r * 10^9."""
    from pyspark.sql import functions as F

    parts = []
    for r in range(n):
        shifted = F.translate(
            F.col("text"),
            "abcdefghijklmnopqrstuvwxyz",
            "abcdefghijklmnopqrstuvwxyz"[r % 26:] + "abcdefghijklmnopqrstuvwxyz"[: r % 26],
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * 10**9)).alias("doc_id"),
                shifted.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    spark = bench.build_spark(CPUS)
    from pyspark.sql import functions as F

    from geomesa_spark.operators import dedup

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    results = []
    for scale in SCALES:
        docs_path = f"/tmp/geomesa_bench/esub_scale_{scale}"
        replicated(spark, base, scale).write.mode("overwrite").parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        chars = docs.agg(F.sum(F.length("text")).alias("c")).first()["c"]
        times = {"dense": [], "strided": []}
        for _ in range(REPEATS):  # interleaved: same-window contrast
            for mode in ("dense", "strided"):
                t0 = time.perf_counter()
                df = (
                    dedup.exact_substring_pairs(docs, k=K, dup_span=DUP)
                    if mode == "dense"
                    else dedup.exact_substring_pairs(
                        docs, k=K, dup_span=DUP, stride=K // 2, anchor_df_cap=64
                    )
                )
                n = df.count()
                times[mode].append(round(time.perf_counter() - t0, 3))
        results.append(
            {
                "scale": scale,
                "chars": int(chars),
                "dense_sec": min(times["dense"]),
                "strided_sec": min(times["strided"]),
                "dense_runs": times["dense"],
                "strided_runs": times["strided"],
                "rows": n,
            }
        )
        print(f"# scale {scale}: {results[-1]}", flush=True)
    spark.stop()
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
    with open(os.path.join(here, "BENCH", "esub_crossover.json"), "w") as f:
        json.dump(results, f, indent=1)
    compact = {
        "metric": "exact_substring dense-vs-strided crossover",
        "floor_chars": dedup.ESUB_AUTO_FLOOR_CHARS,
        "points": [
            {"chars": r["chars"], "dense": r["dense_sec"], "strided": r["strided_sec"]}
            for r in results
        ],
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
