"""Laws for the two-phase bucketed rank (operators/rank.py): the
size-gated scale path of llm_global_shuffle / llm_temperature_mix must
be BIT-IDENTICAL to the plain rank window it replaces — the gate may
change the physical plan, never a value."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_bnpl_demo_spark.operators.rank import bucketed_rank
from event_streaming_bnpl_demo_spark.operators.robust import \
    temperature_quotas
from event_streaming_bnpl_demo_spark.plans import all_queries
from event_streaming_bnpl_demo_spark.plans.queries_ext5 import _MIX_BUDGET
from event_streaming_bnpl_demo_spark.sources import load_table
from event_streaming_bnpl_demo_spark.sources.tables import spread

from .conftest import SF_SMOKE

QUERIES = all_queries()

#: The law runs at the parity sf by default; point it at a bigger dir
#: (e.g. the sf1 replica) to re-prove at scale:
#: GRAFT_RANK_LAW_SF=/tmp/sfscale/sf1 pytest tests/test_rank_twophase.py
LAW_SF = os.environ.get("GRAFT_RANK_LAW_SF", SF_SMOKE)


def _plain_shuffle(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    h = F.expr("md5(CAST(doc_id AS STRING))")
    shard = (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1)
    w = Window.partitionBy(shard).orderBy(h, F.col("doc_id"))
    return d.select("doc_id", shard.cast("bigint").alias("shard"),
                    F.row_number().over(w).cast("bigint").alias("pos"))


def _twophase_shuffle(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    base = (d.select("doc_id",
                     F.expr("md5(CAST(doc_id AS STRING))").alias("h"))
            .select("doc_id", "h",
                    (F.instr(F.lit("0123456789abcdef"),
                             F.substring("h", 1, 1)) - 1)
                    .cast("bigint").alias("shard"),
                    F.substring("h", 2, 2).alias("b")))
    return (bucketed_rank(base, ["shard"], "b",
                          [F.col("h"), F.col("doc_id")], out="pos")
            .select("doc_id", "shard", "pos"))


def test_global_shuffle_two_phase_is_bit_identical(spark):
    a = {tuple(r) for r in _twophase_shuffle(spark, LAW_SF).collect()}
    b = {tuple(r) for r in _plain_shuffle(spark, LAW_SF).collect()}
    assert a == b and a, f"two-phase rank diverged ({len(a ^ b)} rows)"


def test_global_shuffle_positions_are_a_permutation(spark):
    rows = _twophase_shuffle(spark, LAW_SF).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_temperature_mix_two_phase_is_bit_identical(spark):
    d = spread(load_table(spark, LAW_SF, "documents"))
    base = (d.select("source", "n_chars", "doc_id")
            .withColumn("h", F.md5(F.col("doc_id").cast("string")))
            .withColumn("b", F.substring("h", 1, 2)))
    bc = base.groupBy("source", "b").agg(F.count(F.lit(1)).alias("_bn"))
    s = bc.groupBy("source").agg(F.sum("_bn").alias("n_total"))
    caps = temperature_quotas(s, _MIX_BUDGET)
    ranked = bucketed_rank(base, ["source"], "b",
                           [F.col("h"), F.col("doc_id")], counts=bc)
    new = (ranked.join(F.broadcast(caps), "source")
           .groupBy("source", "n_total", "n_keep")
           .agg(F.sum(F.when(F.col("rn") <= F.col("n_keep"),
                             F.col("n_chars")).otherwise(0))
                .cast("bigint").alias("chars_kept")))
    old = QUERIES["llm_temperature_mix"].fn(spark, LAW_SF)
    assert ({tuple(r) for r in new.collect()}
            == {tuple(r) for r in old.collect()})


def test_two_phase_plan_has_no_single_shard_sort(spark):
    """The scale path's rank sort must be partitioned by
    (partition key, bucket) — 16·256 sort groups, never 16 — and the
    offsets must attach by broadcast, not another wide exchange."""
    plan = (_twophase_shuffle(spark, LAW_SF)._jdf
            .queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    import re
    wins = re.findall(r"Window \[[^\]]*row_number\(\)[^\]]*"
                      r"windowspecdefinition\(([^,]*, [^,]*),", plan)
    assert wins and all("b" in w for w in wins), wins


def test_gate_constant_is_scale_sane():
    from event_streaming_bnpl_demo_spark.operators.rank import \
        TWO_PHASE_MIN_BYTES
    # must be far above every local tier (so the bench rides the plain
    # window) and far below any "at scale" corpus
    assert 64 * 1024**2 <= TWO_PHASE_MIN_BYTES <= 16 * 1024**3
