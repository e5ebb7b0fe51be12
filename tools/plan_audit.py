#!/usr/bin/env python
"""Catalog-wide physical-plan audit: for every registered query, count
how many times each base parquet table appears as a scan in the final
plan and flag queries that re-scan the same table >= a threshold (the
re-planned-shared-subtree smell: a DataFrame subtree referenced by N
consumers is re-planned — and re-scanned — N times unless the reuse is
made explicit with a window-marginalization, a localCheckpoint, or a
literal injection; see DESIGN.md round 6-7 findings).

Scans of checkpointed RDDs (`Scan ExistingRDD`) and staged scratch
dirs are reported separately — a staged re-read is the FIX, not the
smell.

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.001]
           [--threshold 3] [--names a b c]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

#: Triaged multi-scan queries: the re-scan is the operator's point, an
#: artifact of demo construction, or bounded-side derivation — NOT the
#: shared-subtree smell. Reviewed per entry; a new flag means a new
#: regression (or a new entry with a reason).
ALLOWLIST: dict[str, str] = {
    "set_symmetric_diff": "exceptAll exhibit: A\\B and B\\A each consume "
    "both filtered branches — 4 pruned scans IS the operator",
    "cdc_merge_upsert": "base+delta both derived from one table by demo "
    "construction; a real deployment has two inputs",
    "mv_cdc_maintain": "base + CDC delta + recompute check derived from "
    "one table by demo construction",
    "cdc_emit_changes": "two snapshots diffed are both derived from the "
    "same table by demo construction",
    "mv_incremental_distinct": "base state + delta derived from one "
    "table by demo construction",
    "llm_simsearch_ivf": "corpus + centroid-train + bounded query-vector "
    "sides are logical roles of one physical table",
    "llm_simsearch_quantized": "corpus + maxabs-scalar + bounded query "
    "side; extra scans are projection-pruned single-column passes",
    "llm_simsearch_rerank": "composes the quantized shortlist with the "
    "exact re-rank — two registered operators over one table",
    "llm_ann_recall_eval": "eval-only: composes brute-force and IVF "
    "searches, each with its own scan posture",
    "agg_theta_set_algebra": "theta sketches for A, B, and both set ops "
    "each build from a filtered branch — sketch exhibit",
    "join_fuzzy_blocked": "blocked self-join: probe + build + block "
    "census over one table is the entity-resolution shape",
    "graph_khop_reach": "iterative lineage: duplicate subtrees are "
    "identical exchanges deduped by ReuseExchange at runtime — lazy "
    "hops measured ~3x faster than eager per-hop checkpoints at sf1",
    "graph_sssp_weighted": "same ReuseExchange finding as khop: lazy "
    "relaxation rounds beat eager per-round checkpoints",
    "graph_triangle_count": "edge-set consumers are identical exchanges "
    "deduped by ReuseExchange at runtime — eager checkpoints measured a "
    "wash at sf1 and slower at small SF",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--threshold", type=int, default=3)
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    from bench import build_session
    from event_streaming_bnpl_demo_spark.plans import all_queries

    spark = build_session(args.cpus)
    catalog = all_queries()
    names = args.names or [n for n, q in catalog.items()
                           if "stream" not in q.tags]
    flagged, errors = [], []
    for name in names:
        q = catalog.get(name)
        if q is None:
            continue
        try:
            df = q.fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - audit, keep going
            errors.append((name, str(e)[:120]))
            continue
        counts = {t: len(re.findall(rf"{t}\.parquet", plan))
                  for t in TABLES}
        hot = {t: c for t, c in counts.items() if c >= args.threshold}
        if hot:
            rdd = plan.count("Scan ExistingRDD")
            flagged.append((name, hot, rdd))
    justified = [(n, h, r) for n, h, r in flagged if n in ALLOWLIST]
    unexplained = [(n, h, r) for n, h, r in flagged if n not in ALLOWLIST]
    for name, hot, rdd in unexplained:
        print(f"FLAG {name}: {hot}"
              + (f"  (+{rdd} checkpoint scans)" if rdd else ""))
    for name, hot, _ in justified:
        print(f"ok   {name}: {hot} — {ALLOWLIST[name]}")
    for name, err in errors:
        print(f"ERR  {name}: {err}")
    print(f"\n{len(unexplained)} unexplained / {len(justified)} justified "
          f"of {len(names)} audited "
          f"(threshold >= {args.threshold} scans of one table)")


if __name__ == "__main__":
    main()
