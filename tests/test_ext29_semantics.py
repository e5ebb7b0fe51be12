"""Semantic law for HITS (ext29): the three fixed-point iterations are
integer arithmetic, so an independent Python reimplementation over the
same edge list must reproduce the top hub/authority lists EXACTLY —
no tolerance, same tie-break.
"""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_hits_matches_integer_python_reimplementation(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext29 import (
        _ITERS, _TOPK, graph_hits_bipartite)

    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey")
    edges = sorted({(r["o_custkey"], r["l_suppkey"])
                    for r in o.join(li, o.o_orderkey == li.l_orderkey)
                    .collect()})

    hub = {u: 1_000_000 for u, _ in edges}
    auth: dict = {}
    for _ in range(_ITERS):
        acc: dict = defaultdict(int)
        for u, v in edges:
            acc[v] += hub[u]
        mx = max(acc.values())
        auth = {v: s * 1_000_000 // mx for v, s in acc.items()}
        acc = defaultdict(int)
        for u, v in edges:
            acc[u] += auth[v]
        mx = max(acc.values())
        hub = {u: s * 1_000_000 // mx for u, s in acc.items()}

    expect = ([("authority", n, s) for n, s in sorted(
        auth.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]]
        + [("hub", n, s) for n, s in sorted(
            hub.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]])
    got = [(r["side"], r["node"], r["score_micro"])
           for r in graph_hits_bipartite(spark, SF).collect()]
    assert got == expect
