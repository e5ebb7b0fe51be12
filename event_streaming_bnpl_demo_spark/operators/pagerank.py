"""Fixed-point PageRank: iterative rank propagation in 64-bit integer
micro-rank units, so every iteration is bit-exact across engines and
across Spark partition summation orders (float PageRank accumulates in
data-dependent order and drifts in the last bits — un-hashable).

Arithmetic per iteration, all integer:

    contrib(j)   = rank(j) DIV out_degree(j)          (truncating)
    rank'(i)     = base + damp_num * Σ contrib  DIV damp_den
    base         = scale * 15 // 100                  (1 - 0.85 damping)

Used by plans/queries_graph.py over the customer↔supplier co-purchase
graph; the DuckDB oracle unrolls the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 1.0 of rank == 1_000_000 micro-units.
SCALE = 1_000_000

#: Damping factor 0.85 as integer per-mille arithmetic.
DAMP_NUM, DAMP_DEN = 850, 1000


def pagerank_fixedpoint(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """Rank every node of a directed edge list ``(src, dst)``.

    Nodes are the distinct ``src`` values (pass a symmetrized edge
    list for undirected graphs — then every node has out-degree ≥ 1
    and no rank mass is lost to dangling sinks). Returns
    ``(node, rank)`` with rank in integer micro-units; initial rank is
    1.0 (= SCALE) per node.

    Scale: each iteration is one join of the edge list against the
    current ranks plus one aggregate on dst — O(edges) shuffle per
    round, same as label propagation (components.py); ranks are
    localCheckpoint-ed per round so lineage stays flat.
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    ranks = nodes.select("node", F.lit(SCALE).cast("bigint").alias("rank"))
    base = SCALE * 15 // 100
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.join(outdeg, "node"),
                       edges.src == F.col("node"))
            .select(F.col("dst").alias("node"),
                    F.expr("rank DIV deg").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("s")))
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base)
                 + F.expr(f"{DAMP_NUM} * COALESCE(s, 0) DIV {DAMP_DEN}"))
                .cast("bigint").alias("rank"))
            .localCheckpoint(eager=True))
    return ranks
