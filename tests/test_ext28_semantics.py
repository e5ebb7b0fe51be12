"""Semantic laws for difference-in-differences (ext28):

- cell means and the interaction match an independent Python
  reimplementation (hashlib assignment, per-user-period sums);
- the DiD identity holds over the reported (unrounded-to-4) means;
- md5 assignment is roughly balanced (a broken hash collapses a cell).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import datetime

SF = "/root/testdata/sf0.001"

CUTOVER = datetime(2024, 1, 16)


def test_did_matches_python_reimplementation(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext28 import \
        stat_diff_in_diff
    from event_streaming_bnpl_demo_spark.sources import load_table

    rows = (load_table(spark, SF, "events")
            .selectExpr("user_id", "ts",
                        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc")
            .collect())
    cents: dict = defaultdict(int)
    for r in rows:
        grp = int(hashlib.md5(str(r["user_id"]).encode())
                  .hexdigest()[:8], 16) % 2
        period = 0 if r["ts"] < CUTOVER else 1
        cents[(r["user_id"], grp, period)] += r["vc"]
    cell_sum: dict = defaultdict(int)
    cell_n: dict = defaultdict(int)
    for (_, grp, period), v in cents.items():
        cell_sum[(grp, period)] += v
        cell_n[(grp, period)] += 1
    mean = {k: cell_sum[k] / cell_n[k] for k in cell_sum}

    got = stat_diff_in_diff(spark, SF).collect()[0]
    assert got["n_pre_t"] == cell_n[(1, 0)]
    assert got["n_post_t"] == cell_n[(1, 1)]
    assert got["n_pre_c"] == cell_n[(0, 0)]
    assert got["n_post_c"] == cell_n[(0, 1)]
    assert abs(got["pre_treat_mean_cents"] - mean[(1, 0)]) < 1e-3
    assert abs(got["post_treat_mean_cents"] - mean[(1, 1)]) < 1e-3
    assert abs(got["pre_ctrl_mean_cents"] - mean[(0, 0)]) < 1e-3
    assert abs(got["post_ctrl_mean_cents"] - mean[(0, 1)]) < 1e-3
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    assert abs(got["did_cents"] - did) < 1e-3
    # assignment balance: md5 split within a loose 30/70 band
    n_t, n_c = cell_n[(1, 0)] + cell_n[(1, 1)], cell_n[(0, 0)] + cell_n[(0, 1)]
    assert 0.3 < n_t / (n_t + n_c) < 0.7
