"""Approximate nearest neighbors over embedding columns (driver mandate:
similarity search with a brute-force baseline and an LSH-bucketed scale
path).

``ann_lsh_topk``: random-hyperplane LSH (SimHash for cosine) — each
vector gets an ``nbits``-bit signature from deterministic hyperplanes;
signatures split into bands; vectors sharing any band bucket with a
query become candidates; exact cosine re-ranks the top-k. At 100 TB the
band join is an equi-join on (band, key) — shuffle-partitioned, no
pairwise blowup — while brute force is O(n·q).

Hyperplanes are counter-based-deterministic (synth.hash64 → Box-Muller),
so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from geomesa_spark.sources import synth


def _hyperplanes(dim: int, nbits: int) -> np.ndarray:
    """(nbits, dim) deterministic standard-normal hyperplanes."""
    n = dim * nbits
    i = np.arange(n, dtype=np.uint64)
    u1 = (synth.hash64(i + np.uint64(31)).astype(np.float64) + 1.0) / 2.0**64
    u2 = (synth.hash64(i + np.uint64(77)).astype(np.float64) + 1.0) / 2.0**64
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return z.reshape(nbits, dim)


def with_lsh_bands(
    df: DataFrame,
    emb_col: str = "embedding",
    nbits: int = 16,
    band_bits: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Add exploded (band, band_key) rows per vector (the LSH index)."""
    if dim is None:
        first = df.select(F.size(emb_col)).first()
        if first is None or first[0] is None:  # empty input: no bands to build
            return df.withColumn("band", F.lit(0)).withColumn("band_key", F.lit(0)).limit(0)
        dim = int(first[0])
    planes = _hyperplanes(dim, nbits)
    n_bands = nbits // band_bits

    @F.pandas_udf("array<long>")
    def band_keys(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(emb.to_numpy())  # (batch, dim) float32
        bits = (m.astype(np.float64) @ planes.T) > 0.0  # (batch, nbits)
        keys = np.zeros((len(m), n_bands), dtype=np.int64)
        for b in range(n_bands):
            chunk = bits[:, b * band_bits : (b + 1) * band_bits]
            keys[:, b] = (chunk * (1 << np.arange(band_bits))).sum(axis=1)
        return pd.Series(list(keys))

    out = df.withColumn("bkeys", band_keys(F.col(emb_col)))
    return (
        out.select("*", F.posexplode("bkeys").alias("band", "band_key"))
        .drop("bkeys")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    nbits: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query (query set = lowest n_queries
    ids), candidates restricted to LSH band-bucket collisions.

    Shuffle discipline: the band join and the candidate ``distinct`` run
    on bare (qid, id) pairs — embedding arrays are attached AFTER dedupe
    (data side by one id equi-join, query side broadcast), so no stage
    shuffles full vectors for rows that dedupe away."""
    e = embeddings.select(id_col, F.col(emb_col).cast("array<double>").alias("de"))
    banded = with_lsh_bands(e, "de", nbits, band_bits)
    q_bands = banded.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), "band", "band_key"
    )
    cand_ids = (
        banded.select(id_col, "band", "band_key")
        .join(F.broadcast(q_bands), ["band", "band_key"])
        .where(F.col(id_col) != F.col("qid"))
        .select("qid", id_col)
        .distinct()
    )
    q_emb = e.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("de").alias("qe")
    )
    cand = cand_ids.join(e, id_col).join(F.broadcast(q_emb), "qid")
    dot = lambda x, y: F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)
    scored = cand.withColumn(
        "score",
        F.round(dot(F.col("de"), F.col("qe")) / (F.sqrt(dot(F.col("de"), F.col("de"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))), 6),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), id_col)
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", id_col, "score", "rnk")
        .orderBy("qid", "rnk")
    )
