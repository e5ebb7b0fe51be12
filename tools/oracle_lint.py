#!/usr/bin/env python
"""Oracle lint: catch DuckDB-infeasible oracle shapes BEFORE a sweep
hangs on them.

Motivation (round 12): the first llm_dedup_embedding oracle folded
``substr(bucket16, 1, (scalar nbits subquery))`` into its join
condition. DuckDB cannot use a subquery-bearing expression as a
hash-join key, so it planned a BLOCKWISE_NL_JOIN over label-equal
pairs — 77 s at the 20k-vector sf1 replica and >25 min (killed) at the
200k-vector sf10 replica, for a result the materialized-bucket form
produces in seconds. The pathology is invisible at the driver's
sf0.01 (10 s) and only bites when a larger-tier gate runs — exactly
the class of latent cost this lint surfaces statically.

Checks, per oracled catalog query (EXPLAIN only — nothing executes):

1. ERROR ``blockwise_nl_join``: the DuckDB physical plan contains a
   BLOCKWISE_NL_JOIN. DuckDB emits that operator precisely when a join
   condition exists but cannot key a hash/merge/IE join (e.g. a
   subquery-bearing or otherwise unkeyable equality). Every such join
   is O(build_blocks x probe) and will dominate a replica-tier sweep.
   Benign scalar-subquery comparisons plan as NESTED_LOOP_JOIN or
   CROSS_PRODUCT against an EC:1 side and are NOT flagged.

2. INFO ``cte_reused_inline`` (``--show-cte``): a plain ``WITH x AS
   (...)`` CTE referenced more than once after its definition without
   the MATERIALIZED keyword. DuckDB 1.0 inlines plain CTEs per
   reference, re-executing the subtree each time — the r9 lesson that
   made llm_dedup_recall_eval feasible and the r11
   graph_jaccard_links fix. This tier is an INVENTORY, not a gate:
   the full catalog carries ~119 such references (2026-08-17 run) and
   every one of those queries holds green sub-minute walls at the sf1
   replica sweep, so reuse alone is not pathology — it becomes one
   only when the re-inlined subtree is itself expensive, which the
   replica-tier walls, not statics, adjudicate. Consult this
   inventory FIRST when a replica-tier oracle wall looks quadratic.

Exit 0 unless an ERROR finding is not allowlisted. Run it after
editing any oracle, and in the close alongside
tools/session_close_gate.py.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

#: name -> {check: reason} triaged acceptances. Keep reasons measured,
#: not hopeful — this is the same discipline as plan_audit's lists.
#: Full-catalog triage 2026-08-17: 4 blockwise hits, each inspected in
#: the EXPLAIN tree. A blockwise join against a PROVABLY 1-row side
#: (scalar aggregate / single-key lookup) is O(probe) — the filter
#: just rides the join — and is not the subquery-key pathology.
ALLOWLIST: dict[str, dict[str, str]] = {
    "geo_grid_blocked_join": {
        "blockwise_nl_join":
            "intentional brute-force distance reference (customer x "
            "supplier, sum-of-squares radius filter) — quadratic BY "
            "DESIGN as the oracle for the engine's grid-blocked plan; "
            "feasible through sf1, excluded from sf10 gates"},
    "llm_hellinger_sources": {
        "blockwise_nl_join":
            "counts x tot where tot is the 1-row na/nb aggregate; "
            "sq>0 filter rides the join — O(vocab), inspected in plan"},
    "agg_survival_km": {
        "blockwise_nl_join":
            "risk x tot where tot is the 1-row n_total aggregate; "
            "inequality filter rides the join — O(distinct durations)"},
    "llm_simsearch_ann_native": {
        "blockwise_nl_join":
            "embeddings x q where q is the single query vector "
            "(vec_id=0); sign-prefix CASE conditions ride the join — "
            "O(n), and the engine side is the native Catalyst rewrite "
            "this oracle references"},
}


def _cte_reuse_findings(sql: str) -> list[str]:
    """Plain (non-MATERIALIZED) CTEs referenced >1 time after their
    definition. Textual by design: DuckDB EXPLAIN gives no stable
    marker for inlined-CTE duplication."""
    out = []
    for m in re.finditer(r"\b(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", sql):
        name, mat = m.group(1), m.group(2)
        if mat or name.upper() in ("AS",):
            continue
        rest = sql[m.end():]
        refs = len(re.findall(rf"\b(?:FROM|JOIN)\s+{re.escape(name)}\b",
                              rest, flags=re.IGNORECASE))
        if refs > 1:
            out.append(f"cte_reused_inline: {name} referenced {refs}x "
                       "without MATERIALIZED")
    return out


def lint_one(con, name: str, sql: str) -> list[tuple[str, str, str]]:
    """-> [(severity, check, detail)]"""
    findings: list[tuple[str, str, str]] = []
    try:
        plan = con.execute("EXPLAIN " + sql).fetchall()[0][1]
    except Exception as exc:  # noqa: BLE001 - report, don't crash the sweep
        return [("ERROR", "explain_failed", str(exc).splitlines()[0][:200])]
    n_blockwise = plan.count("BLOCKWISE_NL_JOIN")
    if n_blockwise:
        findings.append(
            ("ERROR", "blockwise_nl_join",
             f"{n_blockwise} BLOCKWISE_NL_JOIN in physical plan — "
             "join condition not hash/merge/IE-keyable"))
    for f in _cte_reuse_findings(sql):
        check, detail = f.split(": ", 1)
        findings.append(("INFO", check, detail))
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="parquet dir whose views EXPLAIN plans against")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--show-cte", action="store_true",
                    help="print the INFO-tier CTE-reuse inventory")
    args = ap.parse_args()

    from oracle_harness import duck_connection
    from event_streaming_bnpl_demo_spark.plans.catalog import all_queries

    con = duck_connection(args.sf)
    qs = all_queries()
    names = args.names or [n for n, q in qs.items() if q.oracle]
    unexplained = 0
    allowed = 0
    n_info = 0
    for name in names:
        q = qs[name]
        if not q.oracle:
            print(f"--  {name}: rows-only, no oracle")
            continue
        for sev, check, detail in lint_one(con, name, q.oracle):
            reason = ALLOWLIST.get(name, {}).get(check)
            if sev == "INFO":
                n_info += 1
                if args.show_cte:
                    print(f"INFO {name} [{check}]: {detail}")
            elif reason is not None:
                allowed += 1
                print(f"ALLOW {name} [{check}]: {reason}")
            else:
                unexplained += 1
                print(f"{sev} {name} [{check}]: {detail}")
    print(f"\n{unexplained} unexplained ERROR / {allowed} allowlisted "
          f"/ {n_info} INFO cte-reuse (--show-cte to list) "
          f"of {len(names)} oracles linted")
    return 1 if unexplained else 0


if __name__ == "__main__":
    sys.exit(main())
