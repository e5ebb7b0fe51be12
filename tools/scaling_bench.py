#!/usr/bin/env python
"""Cross-scale-factor scaling measurement (DESIGN.md "Measured scaling").

Runs a set of catalog queries at two (or more) sf directories on the
same session and reports per-query best-of-N wall-clock plus the fitted
scaling exponent between consecutive dirs:

    exponent = log(t_big / t_small) / log(rows_big / rows_small)

~1.0 = linear in data volume, <1 = sublinear (fixed overhead still
amortizing at this scale), >1 = superlinear (a shape to investigate).

Usage:
    python tools/scaling_bench.py --dirs /root/testdata/sf0.1 \
        /tmp/sfscale/sf1 --queries llm_dedup_minhash q5_region_revenue
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # the 6 most expensive headline queries in BENCH_r03.json
    "llm_dedup_minhash", "q5_region_revenue", "q8_market_share",
    "llm_cluster_quality_pick", "llm_tfidf_top_terms", "q2_min_cost_supply",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+",
                    default=["/root/testdata/sf0.1", "/tmp/sfscale/sf1"])
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from bench import build_session
    from event_streaming_bnpl_demo_spark.plans import all_queries
    from event_streaming_bnpl_demo_spark.sources import load_table

    spark = build_session(args.cpus)
    catalog = all_queries()
    rows = {d: load_table(spark, d, "lineitem").count() for d in args.dirs}
    # warmup once per dir so codegen/scan-init stays out of the numbers
    for d in args.dirs:
        catalog["q1_pricing_summary"].fn(spark, d).count()

    out: dict[str, dict] = {}
    for name in args.queries:
        q = catalog[name]
        per_dir: dict[str, float] = {}
        for d in args.dirs:
            runs = []
            for _ in range(args.n):
                t0 = time.perf_counter()
                q.fn(spark, d).count()
                runs.append(time.perf_counter() - t0)
            per_dir[d] = round(min(runs), 3)
        exps = []
        for a, b in zip(args.dirs, args.dirs[1:]):
            ratio_t = per_dir[b] / per_dir[a]
            ratio_n = rows[b] / rows[a]
            exps.append(round(math.log(ratio_t) / math.log(ratio_n), 2))
        out[name] = {"sec": per_dir, "exponent": exps}

    print(json.dumps({"lineitem_rows": rows, "n": args.n,
                      "queries": out}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
