"""ANN tests: LSH-bucketed top-k recall vs the brute-force baseline."""

from __future__ import annotations

import os

import numpy as np

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_ann_lsh_recall_vs_brute(spark):
    qs = entry_mod.queries()
    brute = qs["ann_cosine_topk"](spark, SF_DIR).toPandas()
    lsh = qs["ann_lsh_topk"](spark, SF_DIR).toPandas()
    assert set(lsh.columns) == {"qid", "vec_id", "score", "rnk"}
    recalls = []
    for qid in brute["qid"].unique():
        b = set(brute[brute["qid"] == qid]["vec_id"])
        l = set(lsh[lsh["qid"] == qid]["vec_id"])
        recalls.append(len(b & l) / len(b))
    # random-hyperplane LSH with 4x4-bit bands: recall well above chance
    assert np.mean(recalls) >= 0.4, recalls
    # every LSH result's score must equal the brute score for that pair
    m = lsh.merge(brute, on=["qid", "vec_id"], suffixes=("_l", "_b"))
    assert (m["score_l"] == m["score_b"]).all()


def test_simhash_hamming_separates(spark):
    """SimHash sanity: identical docs → identical fingerprints (trivially
    true) and fingerprints spread across the corpus (not constant)."""
    qs = entry_mod.queries()
    fp = qs["simhash_fingerprints"](spark, SF_DIR).toPandas()
    assert fp["simhash"].nunique() > 1
    assert (fp["simhash"] >= 0).all() and (fp["simhash"] < (1 << 16)).all()


def test_ann_lsh_empty_input(spark):
    from geomesa_spark.operators.ann import ann_lsh_topk, with_lsh_bands

    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    banded = with_lsh_bands(e.select("vec_id", F.col("embedding").cast("array<double>").alias("de")), "de")
    assert banded.count() == 0
    out = ann_lsh_topk(e)
    assert out.count() == 0


def test_ann_ivf_recall_vs_brute(spark):
    """IVF probe join: recall vs brute at nprobe=4/16 cells well above
    chance; scores of returned pairs bit-match the brute scores."""
    qs = entry_mod.queries()
    brute = qs["ann_cosine_topk"](spark, SF_DIR).toPandas()
    ivf = qs["ann_ivf_topk"](spark, SF_DIR).toPandas()
    assert set(ivf.columns) == {"qid", "vec_id", "score", "rnk"}
    recalls = []
    for qid in brute["qid"].unique():
        b = set(brute[brute["qid"] == qid]["vec_id"])
        i = set(ivf[ivf["qid"] == qid]["vec_id"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.4, recalls
    m = ivf.merge(brute, on=["qid", "vec_id"], suffixes=("_i", "_b"))
    assert (m["score_i"] == m["score_b"]).all()


def test_ann_ivf_deterministic(spark):
    """Same input → identical centroids and identical result rows
    (hash-based sampling + deterministic init, no RNG state)."""
    qs = entry_mod.queries()
    a = qs["ann_ivf_topk"](spark, SF_DIR).toPandas()
    b = qs["ann_ivf_topk"](spark, SF_DIR).toPandas()
    assert a.equals(b)


def test_ann_ivf_cluster_partition_pruning(spark, tmp_path):
    """The 100-TB claim behind IVF: writing the vector table partitioned
    by cluster id turns each probe into a partition-pruned scan. Write
    sf0.001 embeddings partitionBy(cluster), read back with a cluster
    filter, and assert Spark only touches the probed partitions' files."""
    from geomesa_spark.operators.ann import train_ivf_centroids, with_ivf_cluster

    e = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("de"))
    )
    cent = train_ivf_centroids(e, n_centroids=8, id_col="vec_id", emb_col="de")
    out = str(tmp_path / "ivf_table")
    with_ivf_cluster(e, cent, "de").write.partitionBy("cluster").parquet(out)

    table = spark.read.parquet(out)
    probed = table.where(F.col("cluster").isin([0, 3]))
    # the cluster predicate must reach the scan as a PARTITION filter
    # (directory pruning), not a post-scan row filter
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:200], plan[:2000]
    # and semantics hold: probe rows == the two clusters' rows
    per_cluster = {r["cluster"]: r["n"] for r in table.groupBy("cluster").count().withColumnRenamed("count", "n").collect()}
    assert probed.count() == per_cluster.get(0, 0) + per_cluster.get(3, 0) > 0


def test_embed_neardup_lsh_exact_twin_and_tradeoff(spark):
    """embed_neardup_lsh at the fixture band parameters (8×2-bit) equals
    the brute all-pairs output EXACTLY (recall 1.0 — the oracle contract);
    at wider bands (4×4-bit) every emitted pair is still bit-identical to
    a brute pair (precision 1.0 by construction) with partial recall —
    the documented bucket-size/recall tradeoff."""
    from geomesa_spark.operators.ann import embed_neardup_pairs_lsh

    qs = entry_mod.queries()
    brute = qs["embed_neardup_pairs"](spark, SF_DIR).toPandas()
    assert len(brute) > 0
    twin = qs["embed_neardup_lsh"](spark, SF_DIR).toPandas()
    assert twin[["va", "vb"]].values.tolist() == brute[["va", "vb"]].values.tolist()
    assert (twin["cos"].to_numpy() == brute["cos"].to_numpy()).all()

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    wide = embed_neardup_pairs_lsh(e, band_bits=4).toPandas()
    bset = set(zip(brute.va, brute.vb))
    wset = set(zip(wide.va, wide.vb))
    assert wset <= bset and len(wset) > 0
    m = wide.merge(brute, on=["va", "vb"])
    assert (m["cos_x"] == m["cos_y"]).all()


def test_embed_neardup_lsh_bucket_cap_bounds_work(spark):
    """A binding bucket cap suppresses candidates from oversized buckets
    (bounded work) and never invents pairs."""
    from geomesa_spark.operators.ann import embed_neardup_pairs_lsh, with_lsh_bands

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # prove the cap BINDS on this fixture (else the test is vacuous)
    banded = with_lsh_bands(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("de")), "de", 16, 2
    )
    maxb = banded.groupBy("band", "band_key").count().agg(F.max("count")).first()[0]
    assert maxb > 8, "fixture has no bucket over the test cap"
    full = embed_neardup_pairs_lsh(e, band_bits=2).toPandas()
    capped = embed_neardup_pairs_lsh(e, band_bits=2, bucket_cap=8).toPandas()
    fset = set(zip(full.va, full.vb))
    cset = set(zip(capped.va, capped.vb))
    assert cset <= fset
    # ...and that capping genuinely suppressed something
    assert len(cset) < len(fset)
