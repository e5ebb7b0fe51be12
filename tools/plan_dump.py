#!/usr/bin/env python
"""Dump ``explain("formatted")`` for catalog queries plus a one-line
plan-shape summary per query (Exchange count, join strategies, Python
eval nodes, scan count) — the before/after evidence files for the
optimization rounds (``plans/r12/<query>_{before,after}.txt``).

Usage:
    python tools/plan_dump.py --out plans/r12 --suffix _before \
        [--sf /root/testdata/sf0.1] [--names a b c | --headline | --all]

A ``--summary`` run prints only the shape table (no files), sorted so
the smelliest plans (most exchanges / Python nodes) come first.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE_PATTERNS = {
    "exchanges": re.compile(r"^\s*\(?\d*\)?\s*\+?-?\s*Exchange\b|\bExchange (hash|range|Single)", re.M),
    "bhj": re.compile(r"BroadcastHashJoin"),
    "smj": re.compile(r"SortMergeJoin"),
    "shj": re.compile(r"ShuffledHashJoin"),
    "bnlj": re.compile(r"BroadcastNestedLoopJoin"),
    "cartesian": re.compile(r"CartesianProduct"),
    "py_batch": re.compile(r"BatchEvalPython"),
    "py_arrow": re.compile(r"ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas|AggregateInPandas"),
    "scans": re.compile(r"Scan parquet|FileScan parquet"),
    "rdd_scans": re.compile(r"Scan ExistingRDD"),
    "sorts": re.compile(r"^\s*\(?\d*\)?\s*\+?-?\s*\*?\(?\d*\)?\s*Sort\b", re.M),
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shape(plan: str) -> dict:
    return {k: len(p.findall(plan)) for k, p in SHAPE_PATTERNS.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default=None,
                    help="directory to write <name><suffix>.txt files")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--summary", action="store_true",
                    help="print the shape table only")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from bench import HEADLINE, build_session
    from event_streaming_bnpl_demo_spark.plans import all_queries

    catalog = all_queries()
    if args.names:
        names = args.names
    elif args.all:
        names = sorted(catalog)
    else:
        names = list(HEADLINE)

    spark = build_session(args.cpus)
    rows = []
    for name in names:
        try:
            df = catalog[name].fn(spark, args.sf)
            plan = formatted_plan(df)
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        s = shape(plan)
        rows.append((name, s))
        if args.out and not args.summary:
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(args.out, f"{name}{args.suffix}.txt"),
                      "w") as fh:
                fh.write(plan)
    rows.sort(key=lambda r: (-(r[1]["exchanges"] + 3 * r[1]["py_batch"]),
                             r[0]))
    hdr = ["name", "exch", "bhj", "smj", "shj", "bnlj", "cart",
           "pyB", "pyA", "scan", "rdd", "sort"]
    print("\t".join(hdr))
    for name, s in rows:
        print("\t".join([name] + [str(s[k]) for k in SHAPE_PATTERNS]))
    spark.stop()


if __name__ == "__main__":
    main()
