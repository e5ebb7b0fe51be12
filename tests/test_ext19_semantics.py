"""Semantic laws for the ext19 pack — checks that do NOT mirror the
oracle formula (the driver gate already does that) but pin what the
statistics MEAN:

- Kaplan-Meier with no censoring must equal the plain empirical
  survival function survivors/total; adding censored spells must never
  *lower* survival at any event time (censoring removes at-risk mass,
  it never adds deaths).
- Growth accounting must satisfy the two accounting identities on the
  real corpus: active(m) = new + retained + resurrected, and
  retained(m) = active(m-1) - churned(m) for every interior month.
- The streamed view equals the batch query row-for-row (incremental ==
  batch), which together with the shared classifier pins the state
  merge itself.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_km_no_censoring_is_empirical_survival(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext19 import \
        _km_from_durs

    durs = [3, 3, 5, 7, 7, 7, 11, 13, 13, 20]
    df = spark.createDataFrame([(d, 1) for d in durs], "dur int, observed int")
    rows = {r["dur_days"]: r for r in _km_from_durs(df).collect()}
    n = len(durs)
    for t, r in rows.items():
        survivors = sum(1 for d in durs if d > t)
        assert r["n_event"] == durs.count(t)
        assert r["n_risk"] == sum(1 for d in durs if d >= t)
        assert abs(r["survival"] - survivors / n) < 1e-6, (t, r)
    # the largest duration dies with everyone at risk dead -> excluded
    assert 20 not in rows


def test_km_censoring_never_lowers_survival(spark):
    from event_streaming_bnpl_demo_spark.plans.queries_ext19 import \
        _km_from_durs

    events = [(3, 1), (5, 1), (5, 1), (9, 1), (12, 1), (15, 1)]
    censored = [(4, 0), (6, 0), (10, 0)]
    base = {r["dur_days"]: r["survival"]
            for r in _km_from_durs(
                spark.createDataFrame(events, "dur int, observed int")
            ).collect()}
    mixed = {r["dur_days"]: r["survival"]
             for r in _km_from_durs(
                 spark.createDataFrame(events + censored,
                                       "dur int, observed int")
             ).collect()}
    # the event times present in both runs are the observed deaths with
    # survivors; censoring adds at-risk mass so it can only RAISE the
    # curve at those times, never lower it
    assert {3, 5, 9, 12} <= set(mixed)
    for t, s in mixed.items():
        assert s >= base[t] - 1e-9, (t, s, base[t])


def test_growth_accounting_identities(spark):
    from event_streaming_bnpl_demo_spark.plans import all_queries
    from event_streaming_bnpl_demo_spark.sources import load_table

    out = {r["month"]: r for r in
           all_queries()["events_growth_accounting"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    active = {r["month"]: r["n"] for r in
              (ev.select(F.date_format(F.date_trunc("month", "ts"), "yyyy-MM")
                         .alias("month"), "user_id").distinct()
               .groupBy("month").agg(F.count(F.lit(1)).alias("n"))
               ).collect()}
    months = sorted(active)
    for m in months:
        r = out[m]
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == active[m], m
    for prev, cur in zip(months, months[1:]):
        r = out[cur]
        assert r["n_retained"] == active[prev] - r["n_churned"], (prev, cur)


def test_stream_growth_equals_batch(spark):
    from event_streaming_bnpl_demo_spark.plans import all_queries

    qs = all_queries()
    batch = sorted(map(tuple,
                       qs["events_growth_accounting"].fn(spark, SF).collect()))
    streamed = sorted(map(tuple,
                          qs["mv_stream_growth_accounting"].fn(spark, SF)
                          .collect()))
    assert batch == streamed


def test_perplexity_score_matches_hand_computation(spark):
    """Spot-check one document's score against a pure-Python bigram-LM
    computation over the same corpus — independent of both engines'
    SQL."""
    from event_streaming_bnpl_demo_spark.plans import all_queries
    from event_streaming_bnpl_demo_spark.sources import load_table

    docs = {r["doc_id"]: r["text"].split(" ")
            for r in load_table(spark, SF, "documents").collect()}
    c2: dict = {}
    c1: dict = {}
    vocab = set()
    for toks in docs.values():
        for x, y in zip(toks, toks[1:]):
            c2[(x, y)] = c2.get((x, y), 0) + 1
            c1[x] = c1.get(x, 0) + 1
            vocab.add(x)
            vocab.add(y)
    v = len(vocab)
    target = min(d for d, t in docs.items() if len(t) >= 2)
    toks = docs[target]
    scores = [-math.log((c2[(x, y)] + 1.0) / (c1[x] + v))
              for x, y in zip(toks, toks[1:])]
    expected = round(sum(scores) / len(scores), 4)
    got = (all_queries()["llm_perplexity_filter"].fn(spark, SF)
           .filter(F.col("doc_id") == target).first())
    assert got["n_bigrams"] == len(toks) - 1
    assert abs(got["score"] - expected) <= 1e-4, (got["score"], expected)
