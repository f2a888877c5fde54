#!/usr/bin/env python
"""Production-shaped entrypoint: incremental corpus dedup as a
spark-submit job (the 100 TB shape: each crawl batch dedupes against
the accumulated MinHash-LSH index and appends itself).

    python geomesa_spark/package_zip.py               # builds dist/geomesa_spark.zip
    spark-submit --master local[32] \
        --py-files dist/geomesa_spark.zip \
        jobs/dedup_job.py --docs /data/batch_042.parquet \
        --index-root /data/dedup_index --pairs-out /data/neardup_pairs \
        --batch batch-042 [--compact-every 100]

Re-submitting a killed run with the same --batch is safe: the
partitioned index write is replay-idempotent (operators/dedup.py), and
a batch whose pairs partition is already committed to the manifest is
skipped entirely. ``--compact-every`` consolidates the per-batch index
layout once that many batches accumulate (small-files control)."""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet path of the new batch (doc_id, text)")
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--pairs-out", required=True, help="manifest-committed near-dup pairs table root")
    ap.add_argument("--batch", required=True, help="stable batch name, e.g. batch-042")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--bucket-cap", type=int, default=None)
    ap.add_argument("--compact-every", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("geomesa-spark-dedup").getOrCreate()

    from geomesa_spark import contract
    from geomesa_spark.operators import dedup
    from geomesa_spark.sources import manifest as M

    contract.ensure_py_files(spark)

    if args.batch in M.completed_partitions(args.pairs_out, "neardup_pairs"):
        print(f"batch {args.batch} already committed — nothing to do")
        spark.stop()
        return

    docs = spark.read.parquet(args.docs)

    def make_pairs(spark_, part: str):
        return dedup.dedupe_and_append(
            docs,
            args.index_root,
            threshold=args.threshold,
            bucket_cap=args.bucket_cap,
            partition=part,
        )

    pairs = M.run_checkpointed(
        spark, args.pairs_out, "neardup_pairs", [args.batch], make_pairs, input_desc=args.docs
    )
    print(f"batch {args.batch}: {pairs.count()} near-dup pairs committed to {args.pairs_out}")

    if args.compact_every:
        done = len(M.completed_partitions(args.pairs_out, "neardup_pairs"))
        if done and done % args.compact_every == 0:
            stats = dedup.compact_index(spark, args.index_root)
            print(f"compacted index after {done} batches: {stats}")
    print(f"max index bucket: {dedup.max_bucket_size(spark, args.index_root)}")
    spark.stop()


if __name__ == "__main__":
    main()
