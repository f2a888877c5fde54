"""Incremental MinHash-LSH dedup index (operators/dedup.py): the
corpus-growth shape. Twin equality: ingesting the documents table in two
batches and unioning the per-batch pair outputs must reproduce EXACTLY
the one-shot ngram_minhash_dedup output over the full table (valid
whenever no LSH bucket exceeds the cap — asserted)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from geomesa_spark import contract
from geomesa_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _pairs_pdf(df) -> pd.DataFrame:
    return df.toPandas().sort_values(["da", "db"]).reset_index(drop=True)


def test_single_call_matches_oracle_checked_query(spark, tmp_path):
    """One dedupe_and_append over the whole table reproduces the
    oracle-checked ngram_minhash_dedup output exactly (identical cap,
    bucket counts over the same full population)."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = _pairs_pdf(dedup.dedupe_and_append(docs, str(tmp_path / "idx_all")))
    want = _pairs_pdf(entry_mod.queries()["ngram_minhash_dedup"](spark, SF_DIR))
    assert len(want) > 0, "fixture produced no near-dup pairs — twin test is vacuous"
    assert got[["da", "db"]].values.tolist() == want[["da", "db"]].values.tolist()
    assert (got["jac"].to_numpy() == want["jac"].to_numpy()).all()


def test_incremental_two_batches_equals_one_shot(spark, tmp_path):
    """With a cap that never binds (the fixture has a 160-doc bucket, so
    the default cap's per-evaluation semantics would differ), the union
    of per-batch outputs equals the one-shot output exactly."""
    cap = 1_000_000
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    root = str(tmp_path / "dedup_index")

    p1 = _pairs_pdf(dedup.dedupe_and_append(b1, root, bucket_cap=cap))
    p2 = _pairs_pdf(dedup.dedupe_and_append(b2, root, bucket_cap=cap))
    assert dedup.max_bucket_size(spark, root) < cap

    got = (
        pd.concat([p1, p2], ignore_index=True)
        .drop_duplicates(["da", "db"])
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    want = _pairs_pdf(dedup.dedupe_and_append(docs, str(tmp_path / "idx_oneshot"), bucket_cap=cap))
    assert len(want) > 0
    assert got[["da", "db"]].values.tolist() == want[["da", "db"]].values.tolist()
    assert (got["jac"].to_numpy() == want["jac"].to_numpy()).all()
    # batch-2 pairs never re-report batch-1-internal pairs
    b1_ids = set(b1.select("doc_id").toPandas()["doc_id"])
    assert not ((p2["da"].isin(b1_ids)) & (p2["db"].isin(b1_ids))).any()


def test_incremental_redelivery_of_duplicate_content(spark, tmp_path):
    """A near-duplicate document arriving in a later batch is caught
    against the STORED index (old x new pair), not just within-batch."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    base = docs.orderBy("doc_id").limit(1).toPandas()
    clone = base.copy()
    clone["doc_id"] = int(base["doc_id"][0]) + 1_000_000  # same text, new id
    root = str(tmp_path / "dedup_index2")
    p1 = dedup.dedupe_and_append(docs, root).toPandas()
    p2 = dedup.dedupe_and_append(spark.createDataFrame(clone), root).toPandas()
    hit = p2[(p2["da"] == int(base["doc_id"][0])) & (p2["db"] == int(clone["doc_id"][0]))]
    assert len(hit) == 1 and float(hit["jac"].iloc[0]) == 1.0
