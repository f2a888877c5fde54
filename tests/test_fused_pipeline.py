"""Fused vs declarative pages pipeline equality (operator-fusion safety)."""

from __future__ import annotations

import pandas as pd

from geomesa_spark import contract


def test_fused_equals_declarative(spark):
    a = contract.pages_pipeline(spark, 800, fused=True).toPandas()
    b = contract.pages_pipeline(spark, 800, fused=False).toPandas()
    a = a.sort_values("polygon_id").reset_index(drop=True)
    b = b.sort_values("polygon_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
