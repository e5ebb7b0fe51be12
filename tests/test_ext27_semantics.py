"""Semantic laws for the covariance matrix (ext27):

- agreement with numpy's sample covariance/correlation on the same
  integer measures (independent implementation, relative tolerance);
- diagonal corr exactly 1 after rounding, and |corr| <= 1 everywhere
  (Cauchy-Schwarz — a broken moment decode violates it instantly);
- exactly the upper triangle of a 4x4 matrix: 10 cells, every pair
  once, n identical on every row.
"""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_covariance_matrix_matches_numpy(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext27 import (
        _MEASURES, agg_covariance_matrix)

    rows = agg_covariance_matrix(spark, SF).collect()
    assert len(rows) == 10
    ns = {r["n"] for r in rows}
    assert len(ns) == 1

    raw = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        *[f"{expr} AS {n}" for n, expr in _MEASURES]).collect()
    names = [n for n, _ in _MEASURES]
    mat = np.array([[r[n] for n in names] for r in raw], dtype=np.float64)
    cov_np = np.cov(mat, rowvar=False, ddof=1)
    corr_np = np.corrcoef(mat, rowvar=False)
    idx = {n: i for i, n in enumerate(names)}

    seen = set()
    for r in rows:
        i, j = idx[r["measure_a"]], idx[r["measure_b"]]
        seen.add((i, j))
        assert abs(r["corr"]) <= 1.0 + 1e-9
        if i == j:
            assert r["corr"] == 1.0
        # relative tolerance: the engine rounds to 6 decimals and numpy
        # sums in float64, so compare to 1e-6 relative (cov spans 1e13)
        denom = max(abs(cov_np[i, j]), 1e-9)
        assert abs(r["cov"] - cov_np[i, j]) / denom < 1e-6, r
        assert abs(r["corr"] - corr_np[i, j]) < 1e-5, r
    assert seen == {(i, j) for i in range(4) for j in range(4) if i <= j}
