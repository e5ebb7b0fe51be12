"""Semantic laws for the ext22 pack — checks that do NOT mirror the
oracle formula (the driver gate does that) but pin what the operators
MEAN:

- BM25 must agree with an independent Python float reimplementation
  per document, and rank classic-BM25-monotone: more matched terms /
  higher tf never scores worse under equal other factors.
- The rule engine's fused plan must scan the fact table ONCE no matter
  how many rules it evaluates (the whole point of fusing), and its
  per-rule counts must equal rule-at-a-time recomputation.
- The sampling estimator must be exactly Horvitz–Thompson over the
  md5-block membership a Python reimplementation selects.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
from collections import Counter

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bm25_matches_python_reimplementation(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext22 import (
        _BM25_K, _BM25_TERMS, llm_bm25_topk)

    docs = [(r["doc_id"], r["text"].split(" "))
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()]
    n_docs = len(docs)
    total_len = sum(len(toks) for _, toks in docs)
    avgdl = total_len / n_docs
    dl = {d: len(toks) for d, toks in docs}
    tf = {(d, t): toks.count(t)
          for d, toks in docs for t in _BM25_TERMS if t in toks}
    df = Counter(t for (_, t) in tf)
    scores: dict[int, int] = {}
    hits: dict[int, int] = {}
    for (d, t), f in tf.items():
        idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
        term = idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
        scores[d] = scores.get(d, 0) + int(term * 1_000_000 + 0.5)
        hits[d] = hits.get(d, 0) + 1
    expect = sorted(((d, hits[d], s) for d, s in scores.items()),
                    key=lambda r: (-r[2], r[0]))[:_BM25_K]
    got = [(r["doc_id"], r["n_terms_hit"], r["bm25_micro"])
           for r in llm_bm25_topk(spark, SF).collect()]
    assert got == expect


def test_rule_engine_fuses_to_one_scan(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext22 import (
        _RULES, dq_rule_engine)

    q = dq_rule_engine(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # N rules, ONE fact scan — the fusion claim itself
    assert plan.count("orders.parquet") == 1, plan

    rows = {r["rule_id"]: r for r in q.collect()}
    assert set(rows) == {rid for rid, _ in _RULES}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    for rid, pred in _RULES:
        viol = o.filter(f"NOT COALESCE({pred}, FALSE)").count()
        assert rows[rid]["n_checked"] == n
        assert rows[rid]["n_violations"] == viol, rid
    # the clean rule stays clean, and at least one tight rule fires
    assert rows["price_positive"]["n_violations"] == 0
    assert any(r["n_violations"] > 0 for r in rows.values())


def test_sampled_sum_is_ht_over_md5_blocks(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext22 import (
        _SAMPLE_MOD, agg_sampled_sum_error)

    rows = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        .alias("cents")).collect()
    exact: Counter = Counter()
    sample: Counter = Counter()
    n_s: Counter = Counter()
    for r in rows:
        exact[r["o_orderpriority"]] += r["cents"]
        h = hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()
        if int(h[:8], 16) % _SAMPLE_MOD == 0:
            sample[r["o_orderpriority"]] += r["cents"]
            n_s[r["o_orderpriority"]] += 1
    got = {r["o_orderpriority"]: r
           for r in agg_sampled_sum_error(spark, SF).collect()}
    for prio, r in got.items():
        assert r["exact_cents"] == exact[prio]
        assert r["est_cents"] == sample[prio] * _SAMPLE_MOD
        assert r["n_sampled"] == n_s[prio]
        # a 1/16 block sample of thousands of rows should land within
        # a loose band — this catches a broken estimator, not variance
        assert abs(r["rel_err"]) < 0.5
