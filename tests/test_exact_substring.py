"""exact_substring_pairs scale knobs (stride + anchor-df cap): recall
preservation and anchor-volume reduction.

The dense (stride=1) path is oracle-checked in test_contract /
CORRECTNESS; these tests prove the strided+capped configuration returns
EXACTLY the dense output's dup subset — on planted fixtures engineered
to exercise span lengths around the guarantee boundary, and on the real
documents fixture — plus the claimed probe-anchor reduction."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from geomesa_spark.operators import dedup

K, DUP = 20, 40


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _pairs(df) -> dict:
    return {
        (r.da, r.db): (r.max_span, r.n_spans, r.is_dup)
        for r in df.collect()
    }


def _rand_text(rng, n):
    # 36-char alphabet: accidental 20-char repeats across independently
    # drawn text are impossible in practice (36^-20 per position pair)
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(n))


def test_planted_spans_strided_equals_dense_dup_subset(spark):
    """Plant shared runs with lengths sweeping the guarantee boundary
    (k-1 .. well past dup_span, including dup_span-1, dup_span,
    dup_span+1 and the detected-span worst cases around k+stride-1):
    stride+cap output == dense output filtered to max_span >= dup_span,
    with EXACT spans."""
    rng = random.Random(42)
    texts = []
    for span in [19, 20, 28, 29, 30, 39, 40, 41, 48, 52, 58, 59, 60, 75, 120]:
        shared = _rand_text(rng, span)
        texts.append(_rand_text(rng, 60) + shared + _rand_text(rng, 60))
        texts.append(_rand_text(rng, 35) + shared + _rand_text(rng, 90))
    docs = _mkdocs(spark, texts)
    dense = _pairs(dedup.exact_substring_pairs(docs, k=K, dup_span=DUP))
    strided = _pairs(
        dedup.exact_substring_pairs(docs, k=K, dup_span=DUP, stride=K // 2, anchor_df_cap=64)
    )
    dense_dups = {p: v for p, v in dense.items() if v[2] == 1}
    assert strided == dense_dups
    # sanity: the planted >= 40 spans are all present with exact length
    for i, span in enumerate([19, 20, 28, 29, 30, 39, 40, 41, 48, 52, 58, 59, 60, 75, 120]):
        pair = (2 * i, 2 * i + 1)
        if span >= DUP:
            assert dense_dups[pair][0] == span
        else:
            assert pair not in dense_dups


def test_multiple_runs_per_pair_exact_n_spans(spark):
    rng = random.Random(7)
    a, b = _rand_text(rng, 45), _rand_text(rng, 50)
    texts = [
        _rand_text(rng, 30) + a + _rand_text(rng, 30) + b + _rand_text(rng, 30),
        _rand_text(rng, 50) + b + _rand_text(rng, 70) + a + _rand_text(rng, 10),
    ]
    docs = _mkdocs(spark, texts)
    strided = _pairs(
        dedup.exact_substring_pairs(docs, k=K, dup_span=DUP, stride=K // 2)
    )
    assert strided == {(0, 1): (50, 2, 1)}


def test_strided_on_documents_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dense = _pairs(dedup.exact_substring_pairs(docs, k=K, dup_span=DUP))
    strided = _pairs(
        dedup.exact_substring_pairs(docs, k=K, dup_span=DUP, stride=K // 2, anchor_df_cap=64)
    )
    assert strided == {p: v for p, v in dense.items() if v[2] == 1}
    assert len(strided) > 0  # fixture has exact-substring dups


def test_probe_anchor_reduction(spark):
    """The knob's point: the strided probe side carries ~1/stride of the
    dense anchors, so the self-join's left input shrinks ~stride x."""
    rng = random.Random(3)
    docs = _mkdocs(spark, [_rand_text(rng, 400) for _ in range(20)])
    pg = dedup._esub_anchors(docs, K, "doc_id", "text")
    dense_n = pg.count()
    strided_n = pg.where((pg.i - 1) % (K // 2) == 0).count()
    assert strided_n <= dense_n / (K // 2) + 20  # one partial stride per doc
    assert strided_n >= dense_n / (K // 2) - 20


def test_stride_guard(spark):
    docs = _mkdocs(spark, ["x" * 50])
    with pytest.raises(ValueError):
        dedup.exact_substring_pairs(docs, k=20, dup_span=30, stride=15)


def test_hot_anchor_inside_dup_run_exact_span(spark):
    """Advisor regression (r5): a qualifying run containing an anchor
    with df > anchor_df_cap must still verify with EXACT span — the
    dense re-verify uses the UNCAPPED anchor table (the cap is a
    candidate-generation filter only). With the bug, removing the hot
    anchor split the 60-char run into two 39-char islands (< dup_span)
    and the dup pair vanished."""
    rng = random.Random(11)
    hot = _rand_text(rng, K)  # exactly k chars -> ONE shared hot anchor
    run = _rand_text(rng, 20) + hot + _rand_text(rng, 20)  # 60-char run
    texts = [
        _rand_text(rng, 50) + run + _rand_text(rng, 50),
        _rand_text(rng, 80) + run + _rand_text(rng, 20),
    ]
    # 70 more docs carrying the hot k-gram -> df = 72 > cap 64
    texts += [_rand_text(rng, 40) + hot + _rand_text(rng, 40) for _ in range(70)]
    docs = _mkdocs(spark, texts)
    strided = _pairs(
        dedup.exact_substring_pairs(docs, k=K, dup_span=DUP, stride=K // 2, anchor_df_cap=64)
    )
    assert strided == {(0, 1): (60, 1, 1)}


def test_auto_mode_crossover_flip(spark):
    """stride='auto' mirrors dedupe_and_append's measured-floor guard:
    dense below ESUB_AUTO_FLOOR_CHARS, strided k/2 + df-cap 64 above.
    Asserts the decision helper flips at the floor, and that BOTH
    branches of the end-to-end auto path return the dense dup subset."""
    assert dedup._esub_choose_stride(10**9, K, 15 * 10**8) == 1
    assert dedup._esub_choose_stride(15 * 10**8, K, 15 * 10**8) == K // 2
    assert dedup.ESUB_AUTO_FLOOR_CHARS == 1_500_000_000

    rng = random.Random(5)
    shared = _rand_text(rng, 60)
    texts = [
        _rand_text(rng, 40) + shared + _rand_text(rng, 40),
        _rand_text(rng, 70) + shared + _rand_text(rng, 10),
        _rand_text(rng, 120),
    ]
    docs = _mkdocs(spark, texts)
    dense_dups = {
        p: v
        for p, v in _pairs(dedup.exact_substring_pairs(docs, k=K, dup_span=DUP)).items()
        if v[2] == 1
    }
    # floor above the corpus (~400 chars): auto -> dense
    low = dedup.exact_substring_pairs(
        docs, k=K, dup_span=DUP, stride="auto", auto_floor_chars=10**9
    )
    # floor below the corpus: auto -> strided + cap
    high = dedup.exact_substring_pairs(
        docs, k=K, dup_span=DUP, stride="auto", auto_floor_chars=100
    )
    assert {p: v for p, v in _pairs(low).items() if v[2] == 1} == dense_dups
    assert _pairs(high) == dense_dups
