"""ext22 pack: retrieval ranking, declarative data-quality rules, and
error-quantified sampling — three shapes a 100 TB platform runs daily:

- ``llm_bm25_topk`` — BM25 ranked keyword retrieval over the corpus
  (the lexical complement of the embedding ANN tier; what
  decontamination and eval-set mining actually use for recall).
- ``dq_rule_engine`` — N declarative validation rules evaluated in ONE
  fact scan, producing the per-rule violation profile a quality gate
  consumes (the generalization of the single-purpose dq_* monitors).
- ``agg_sampled_sum_error`` — the online-aggregation exhibit: a
  deterministic 1/16 hash-block sample's SUM estimate next to the
  exact answer with its realized relative error, per group — the
  measured basis for "is a 6 % sample good enough for this dashboard".

Reference parity: none of this exists in the reference (615-LoC Go
CQRS demo); SURVEY.md §2.2 capability-superset tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .catalog import register

_CENTS = "CAST(FLOOR({col} * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# llm_bm25_topk


_BM25_TERMS = ("join", "filter", "data")
_BM25_K = 15

#: The per-term BM25 score with k1=1.2, b=0.75 (k1+1 and 1-b folded to
#: literals by hand so neither engine's constant folder chooses a
#: different value). EVERY operand is explicitly DOUBLE and every float
#: literal is e0-notated: a bare ``0.5`` types as DECIMAL in both
#: engines, whose division rules differ — the divergence the first
#: version of this query measured (1-ulp micro mismatches).
_BM25_TERM = (
    "(((CAST({n} AS DOUBLE) - CAST({df} AS DOUBLE) + 0.5e0)"
    "   / (CAST({df} AS DOUBLE) + 0.5e0))"
    " * (CAST({tf} AS DOUBLE) * 2.2e0)"
    " / (CAST({tf} AS DOUBLE)"
    "    + 1.2e0 * (0.25e0 + 0.75e0 * CAST({dl} AS DOUBLE)"
    "               / (CAST({ln} AS DOUBLE) / CAST({n} AS DOUBLE)))))")

_BM25_MICRO = ("SUM(CAST(FLOOR(" + _BM25_TERM
               + " * 1000000.0e0 + 0.5e0) AS BIGINT))")

_BM25_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS dl
  FROM documents
), corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM docs
), tf AS (
  SELECT doc_id, dl, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM docs)
  WHERE tok IN {_BM25_TERMS!r}
  GROUP BY doc_id, dl, tok
), tfdf AS (
  SELECT doc_id, dl, tok, tf,
         COUNT(*) OVER (PARTITION BY tok) AS df
  FROM tf
), scored AS (
  SELECT t.doc_id,
         {_BM25_MICRO.format(n='c.n_docs', df='t.df', tf='t.tf',
                             dl='t.dl', ln='c.total_len')} AS micro,
         COUNT(*) AS n_terms_hit
  FROM tfdf t CROSS JOIN corpus c
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
       CAST(micro AS BIGINT) AS bm25_micro
FROM scored
ORDER BY micro DESC, doc_id
LIMIT {_BM25_K}
"""


@register("llm_bm25_topk", oracle=_BM25_ORACLE,
          tags=("llm", "text", "retrieval"))
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-15 (_BM25_K) documents for the query
    terms ('join', 'filter', 'data'), scored with the classic
    ``idf · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`` saturation form
    (k1=1.2, b=0.75) — the lexical retrieval tier that
    complements the embedding ANN stack (``llm_simsearch_*``): eval-set
    decontamination and hard-negative mining both start from exactly
    this query. The idf is the BM25 RATIONAL form
    ``(N-df+0.5)/(df+0.5)`` with no log — monotone in df, so ranking
    semantics hold while every boundary value stays hash-exact
    (the repo's transcendental-avoidance doctrine). Each PER-TERM score
    is bit-identical across engines (identical formula text over agreed
    integers) but their SUM is order-dependent in the last ulp, so the
    per-term score is fixed to integer micro-units first and the micros
    sum exactly — the dsum doctrine for values that are rational, not
    decimal.

    Scale: the token explode is pre-filtered to the query terms (a
    literal IN pushed below the aggregate), so the shuffled relation is
    |matching postings|, not |corpus tokens|; document frequency is a
    WINDOW marginalization over the postings (a second aggregate
    subtree would re-scan the corpus — plan_audit caught exactly that
    in the join-with-broadcast form); the corpus length spine is a tiny
    broadcast side, and the final top-k is a TakeOrdered with a total
    tie-break (score desc, doc_id). The corpus
    DOES scan twice (once for the length spine, once for postings) —
    deliberately: checkpointing the full corpus to skip one scan would
    write 100 TB to local disk, and a production deployment precomputes
    (n_docs, total_len) at ingest anyway.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks"))
    docs = d.select("doc_id", "toks", F.size("toks").alias("dl"))
    corpus = docs.agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("dl").alias("total_len"))
    from pyspark.sql.window import Window

    tf = (docs.select("doc_id", "dl", F.explode("toks").alias("tok"))
          .filter(F.col("tok").isin(*_BM25_TERMS))
          .groupBy("doc_id", "dl", "tok")
          .agg(F.count(F.lit(1)).alias("tf")))
    # df via window marginalization over the postings — no second
    # aggregate subtree, so the corpus is not re-scanned a third time
    # (flagged by tools/plan_audit.py in the join-with-broadcast form)
    tfdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
    scored = (tfdf
              .crossJoin(F.broadcast(corpus))
              .groupBy("doc_id")
              .agg(F.expr(_BM25_MICRO.format(
                  n="n_docs", df="df", tf="tf", dl="dl", ln="total_len"))
                  .alias("micro"),
                  F.count(F.lit(1)).alias("n_terms_hit")))
    return (scored.select("doc_id",
                          F.col("n_terms_hit").cast("bigint")
                          .alias("n_terms_hit"),
                          F.col("micro").cast("bigint").alias("bm25_micro"))
            .orderBy(F.desc("micro"), "doc_id").limit(_BM25_K))


# ---------------------------------------------------------------------------
# dq_rule_engine


#: (rule_id, SQL predicate that must HOLD). Shared verbatim by both
#: engines — the rule text IS the contract.
_RULES: tuple[tuple[str, str], ...] = (
    ("price_positive", "o_totalprice > 0"),
    ("price_cap_400k", "o_totalprice <= 400000"),
    ("status_domain", "o_orderstatus IN ('O', 'F', 'P')"),
    ("priority_specified", "o_orderpriority NOT LIKE '4-%'"),
    ("open_orders_fresh",
     "NOT (o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1998-01-01')"),
)

_RULE_UNION = "\nUNION ALL\n".join(
    f"SELECT '{rid}' AS rule_id, COUNT(*) AS n_checked,\n"
    f"       SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS n_violations\n"
    f"FROM orders" for rid, pred in _RULES)

_RULE_ORACLE = f"""
WITH per_rule AS (
{_RULE_UNION}
)
SELECT rule_id, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       ROUND(CAST(n_violations AS DOUBLE) / n_checked, 6) AS violation_rate
FROM per_rule
"""


@register("dq_rule_engine", oracle=_RULE_ORACLE,
          tags=("dq", "rules", "governance"))
def dq_rule_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rule engine: five validation rules — domain, range,
    format, and a cross-column staleness implication — evaluated in ONE
    fact scan (each row emits an array of (rule, pass) structs, exploded
    and folded into the per-rule violation profile). This is the
    generalized form of the single-purpose dq_* monitors: adding a rule
    is one tuple, not one query, and the scan cost stays constant —
    the property that matters when the fact table is 100 TB and the
    rule book is 300 entries long.

    The oracle intentionally takes the naive N-scans-for-N-rules UNION
    shape, so the gate also proves the fused single-scan plan equals
    the rule-at-a-time semantics. A NULL predicate counts as a
    violation on both sides (CASE/otherwise semantics), the only safe
    default for a quality gate.
    """
    o = load_table(spark, sf_dir, "orders")
    checks = F.array(*[
        F.struct(F.lit(rid).alias("rule_id"),
                 F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
                 .alias("viol"))
        for rid, pred in _RULES])
    per = (o.select(F.explode(checks).alias("c"))
           .select("c.rule_id", "c.viol"))
    return (per.groupBy("rule_id")
            .agg(F.count(F.lit(1)).alias("n_checked"),
                 F.sum("viol").alias("n_violations"))
            .select("rule_id",
                    F.col("n_checked").cast("bigint").alias("n_checked"),
                    F.col("n_violations").cast("bigint")
                    .alias("n_violations"),
                    F.round(F.col("n_violations").cast("double")
                            / F.col("n_checked"), 6)
                    .alias("violation_rate")))


# ---------------------------------------------------------------------------
# agg_sampled_sum_error


_SAMPLE_MOD = 16

#: Portable "random" block assignment: first 8 md5 hex chars of the key
#: as an integer, mod {_SAMPLE_MOD}. Spark hash() is murmur3 and DuckDB
#: hash() is different — md5 text is the one hash both engines share.
_BLOCK_SPARK = ("PMOD(CAST(CONV(SUBSTRING(MD5(CAST(o_orderkey AS STRING)),"
                f" 1, 8), 16, 10) AS BIGINT), {_SAMPLE_MOD})")
_BLOCK_DUCK = ("CAST(CAST('0x' || SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)),"
               f" 1, 8) AS UBIGINT) AS BIGINT) % {_SAMPLE_MOD}")

_SAMPLED_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority,
         {_CENTS.format(col='o_totalprice')} AS cents,
         {_BLOCK_DUCK} AS blk
  FROM orders
), agg AS (
  SELECT o_orderpriority,
         SUM(cents) AS exact_cents,
         SUM(CASE WHEN blk = 0 THEN cents ELSE 0 END) AS sample_cents,
         SUM(CASE WHEN blk = 0 THEN 1 ELSE 0 END) AS n_sampled,
         COUNT(*) AS n_rows
  FROM base GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_sampled AS BIGINT) AS n_sampled,
       CAST(exact_cents AS BIGINT) AS exact_cents,
       CAST(sample_cents * {_SAMPLE_MOD} AS BIGINT) AS est_cents,
       ROUND((CAST(sample_cents AS DOUBLE) * {_SAMPLE_MOD} - exact_cents)
             / exact_cents, 6) AS rel_err
FROM agg
"""


@register("agg_sampled_sum_error", oracle=_SAMPLED_ORACLE,
          tags=("agg", "sampling", "approx"))
def agg_sampled_sum_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online-aggregation exhibit: a deterministic 1/16 hash-block
    sample's Horvitz–Thompson SUM estimate (sample x 16) next to the
    exact group total, with the realized relative error — the measured
    basis for "can this dashboard run on the sample". The block
    assignment is md5-derived (the hash both engines share bit-exactly),
    so sample membership is reproducible, unlike rand() or engine-local
    hashes. Estimate and exact are integers; the error ratio is the
    only double, under ROUND(6).

    Scale: at 100 TB the sample would be a persisted 1/16 block
    PARTITION read in isolation (this query's blk = 0 predicate is
    exactly a partition-pruning key); here both sides ride one scan so
    the realized error itself is part of the checked contract.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
        F.expr(_BLOCK_SPARK).alias("blk"))
    agg = (o.groupBy("o_orderpriority")
           .agg(F.sum("cents").alias("exact_cents"),
                F.sum(F.when(F.col("blk") == 0, F.col("cents"))
                      .otherwise(F.lit(0))).alias("sample_cents"),
                F.sum(F.when(F.col("blk") == 0, 1).otherwise(0))
                .alias("n_sampled"),
                F.count(F.lit(1)).alias("n_rows")))
    return agg.select(
        "o_orderpriority",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_sampled").cast("bigint").alias("n_sampled"),
        F.col("exact_cents").cast("bigint").alias("exact_cents"),
        (F.col("sample_cents") * _SAMPLE_MOD).cast("bigint")
        .alias("est_cents"),
        F.round((F.col("sample_cents").cast("double") * _SAMPLE_MOD
                 - F.col("exact_cents")) / F.col("exact_cents"), 6)
        .alias("rel_err"))
