#!/usr/bin/env python
"""Multi-batch scaling evidence for the incremental dedup index
(round-3 verdict ask #6): the claim "work per batch = O(|batch| +
|stored buckets touched|)" deserves a measured curve, not just plan
inspection.

Protocol: B sequential batches of equal size run through
``dedup.dedupe_and_append`` against one growing index (compaction
interleaved halfway, as jobs/dedup_job.py would). Per batch we record
wall time, the stored-index size it faced, how many of the stored band
rows its bucket keys actually touch, and the pairs emitted. If the
pruned plan works, per-batch wall stays near-flat while the stored
index grows B-fold; the final batch is additionally re-run with
``prune=False`` (the full-shuffle plan) for the direct contrast.

Batches are synthesized deterministically from the driver-generated
documents table: each (batch, replica) carries a distinct Caesar-shift
of the sf docs (every letter trigram changes, so cross-batch docs are
NOT near-dups — mostly NEW material, the realistic crawl shape; word
permutations were tried first and rejected: char-3-gram sets overlap
~90% across permutations, which collides nearly every band bucket),
plus a 5% slice repeating the previous batch's shift verbatim so
new×stored matching is exercised every batch. BATCHES×REPLICAS must
stay ≤ 25 distinct shifts. No external data.

    python bench_dedup_curve.py          # ~4-8 min, writes
                                         # BENCH/dedup_incremental_curve.json

One JSON line on stdout; detail in the BENCH file.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import bench  # repo-root bench.py: build_spark + G1/Arrow settings

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BATCHES = int(os.environ.get("SPARK_GRAFT_DEDUP_BATCHES", "8"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_DEDUP_REPLICAS", "3"))
COMPACT_AT = BATCHES // 2


def main() -> None:
    spark = bench.build_spark(CPUS)
    from pyspark.sql import functions as F

    from geomesa_spark.operators import dedup

    root = "/tmp/geomesa_bench/dedup_curve_index"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    ALPHA = "abcdefghijklmnopqrstuvwxyz"

    def make_batch(i: int):
        # Each (batch, replica) Caesar-shifts the source text by a
        # distinct offset: every letter trigram changes, so cross-batch
        # docs are NOT near-dups — batches are mostly NEW material
        # against the stored index, the realistic crawl shape. A 5%
        # slice repeats the PREVIOUS batch's shift verbatim so every
        # batch also exercises new×stored matching.
        reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
        base = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.lit(i * REPLICAS * n_docs * 10) + F.col("rep") * n_docs).alias("new_id"),
            F.col("doc_id").alias("src_id"),
            "rep",
            "text",
        )

        def shifted(batch_idx):
            # shift id must be distinct per (batch, rep) and nonzero
            branches = None
            for rep in range(REPLICAS):
                k = (batch_idx * REPLICAS + rep) % 25 + 1
                tgt = ALPHA[k:] + ALPHA[:k]
                expr = F.translate(F.col("text"), ALPHA, tgt)
                branches = (
                    F.when(F.col("rep") == rep, expr)
                    if branches is None
                    else branches.when(F.col("rep") == rep, expr)
                )
            return branches

        dup_prev = (F.col("src_id") % 20 == 3) & F.lit(i > 0)
        return base.select(
            F.col("new_id").alias("doc_id"),
            F.when(dup_prev, shifted(max(i - 1, 0))).otherwise(shifted(i)).alias("text"),
        )

    # warm the Python workers + JIT with one full-width pass (memory
    # protocol: limit() collapses to one task and warms nothing)
    make_batch(999).count()

    rows = []
    for i in range(BATCHES):
        batch = make_batch(i).persist()
        n_batch = batch.count()
        # stored-index size this batch faces, and how much of it the
        # batch's bucket keys actually touch (the prune denominator)
        bands_path = os.path.join(root, "bands")
        try:
            stored = spark.read.option("recursiveFileLookup", "true").parquet(bands_path)
            stored_rows = stored.count()
            keys = (
                dedup.band_table(dedup.gram_table(batch))
                .select("band", "bsig")
                .distinct()
            )
            touched_rows = stored.join(
                F.broadcast(keys), ["band", "bsig"], "left_semi"
            ).count()
        except Exception:
            stored_rows, touched_rows = 0, 0
        t0 = time.time()
        pairs = dedup.dedupe_and_append(batch, root, partition=f"b{i}")
        n_pairs = pairs.count()
        wall = round(time.time() - t0, 3)
        batch.unpersist()
        rec = {
            "batch": i,
            "batch_docs": n_batch,
            "stored_band_rows": stored_rows,
            "touched_band_rows": touched_rows,
            "pairs": n_pairs,
            "wall_sec": wall,
        }
        if i == COMPACT_AT:
            tc = time.time()
            stats = dedup.compact_index(spark, root)
            rec["compaction"] = {"wall_sec": round(time.time() - tc, 3), **stats}
        rows.append(rec)
        print(f"# batch {i}: {wall}s stored={stored_rows} touched={touched_rows} pairs={n_pairs}", file=sys.stderr)

    # contrast: the final batch again (replayed idempotently) with the
    # full-shuffle plan — what every batch would cost without pruning
    last = make_batch(BATCHES - 1).persist()
    last.count()
    t0 = time.time()
    dedup.dedupe_and_append(last, root, partition=f"b{BATCHES - 1}", prune=False).count()
    wall_noprune = round(time.time() - t0, 3)
    t0 = time.time()
    dedup.dedupe_and_append(last, root, partition=f"b{BATCHES - 1}", prune=True).count()
    wall_prune_replay = round(time.time() - t0, 3)
    last.unpersist()

    first_half = [r["wall_sec"] for r in rows[1:COMPACT_AT]]
    second_half = [r["wall_sec"] for r in rows[COMPACT_AT + 1:]]
    out = {
        "metric": "incremental dedup per-batch wall vs index growth",
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "batches": rows,
        "growth_ratio_last_over_first": round(rows[-1]["wall_sec"] / rows[1]["wall_sec"], 3)
        if len(rows) > 1 and rows[1]["wall_sec"] > 0
        else None,
        "index_growth_ratio": round(
            rows[-1]["stored_band_rows"] / max(rows[1]["stored_band_rows"], 1), 2
        ),
        "mean_wall_batches_1_to_compact": round(sum(first_half) / len(first_half), 3)
        if first_half
        else None,
        "mean_wall_after_compact": round(sum(second_half) / len(second_half), 3)
        if second_half
        else None,
        "last_batch_noprune_wall_sec": wall_noprune,
        "last_batch_prune_wall_sec": wall_prune_replay,
        "prune_speedup_on_last_batch": round(wall_noprune / wall_prune_replay, 2)
        if wall_prune_replay > 0
        else None,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/dedup_incremental_curve.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
    spark.stop()


if __name__ == "__main__":
    main()
