"""Round-5 extension pack: tokenizer-induction pair counting (one BPE
merge step), unigram-commonness document scoring, int8-quantized
similarity search, snapshot time travel over versioned parquet deltas,
and temperature-based (alpha=0.5) source mixing.

These extend the training-data-pipeline tier (SURVEY.md "beyond the
reference" scope): BPE pair statistics and temperature mixing are the
two corpus-preparation steps a pre-training pipeline runs between
curation (queries_llm/llm2/llm3) and packing (llm_pack_sequences);
int8 quantization is the standard memory-bandwidth lever for
100 TB-scale ANN; snapshot time travel is the lakehouse read pattern
the reference's append-only projections gesture at.

Catalog invariants hold throughout: every output column is
integer/string or a single exact division of two integers (bit-equal
in both engines), and every plan stays broadcast- or
one-exchange-shaped at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table, spread
from .catalog import register

#: Embedding dimensionality (FIXTURES.md §B).
DIM = 64

#: Global kept-document budget for the temperature mixture.
_MIX_BUDGET = 200

#: Fixed-point scale for per-source mixture weights (sqrt(n) * 1e6 as
#: an integer, so weight sums are exact and order-independent).
_WGT_SCALE = 1_000_000


@register(
    "llm_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                   i -> substring(w, i, 2))) AS pair
      FROM words WHERE length(w) >= 2
    )
    SELECT pair, COUNT(*) AS n_pairs
    FROM pairs GROUP BY pair
    ORDER BY n_pairs DESC, pair LIMIT 20
    """,
    tags=("llm", "tokenizer"),
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step: count adjacent symbol pairs inside every
    word across the corpus and rank the top candidates — the inner
    loop of byte-pair-encoding tokenizer training (the highest-count
    pair becomes the next merge rule).

    Scale: tokenize + pair expansion are per-row generators (no
    shuffle until the count), the pair domain is tiny (≤ alphabet²),
    so partial aggregation collapses each partition to at most a few
    hundred rows before the single exchange, and ORDER BY + LIMIT
    plans as TakeOrdered — no global sort. Iterating merges = re-run
    with the learned merges applied; each step is this same plan.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    words = (d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
             .filter(F.length("w") >= 2))
    pairs = words.select(F.explode(F.expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
    )).alias("pair"))
    return (pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy(F.desc("n_pairs"), F.asc("pair")).limit(20))


@register(
    "llm_unigram_commonness",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(tf) AS BIGINT) AS tf_sum
      FROM toks JOIN freq USING (tok) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, tf_sum,
           CAST(tf_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS mean_tf
    FROM per_doc ORDER BY mean_tf ASC, doc_id LIMIT 20
    """,
    tags=("llm", "quality"),
)
def llm_unigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring in frequency space: each document's
    mean corpus token frequency — the integer-exact proxy for unigram
    log-likelihood (CCNet-style LM filtering scores docs the same way,
    with a trained LM in place of corpus counts). The bottom-k docs
    are the distribution outliers a quality pass routes to review.

    Determinism: tf_sum and n_tokens are exact bigints; the score is
    ONE double division of identical integers — bit-equal in both
    engines, no accumulated float sum anywhere.

    Scale: token frequencies aggregate to the vocabulary (partial agg
    collapses per-partition), the frequency table broadcasts back onto
    the token stream, and the per-doc rollup reuses the doc_id
    clustering — tf-idf's shape minus the idf join.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id",
                    F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    per_doc = (toks.join(F.broadcast(freq), "tok")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.sum("tf").alias("tf_sum")))
    return (per_doc
            .select("doc_id", "n_tokens", "tf_sum",
                    (F.col("tf_sum").cast("double")
                     / F.col("n_tokens").cast("double")).alias("mean_tf"))
            .orderBy(F.asc("mean_tf"), F.asc("doc_id")).limit(20))


def _quant_spark(col: str) -> str:
    """Int8 symmetric quantization of one array column given a
    ``maxabs`` column in scope. FLOOR(x + 0.5) instead of ROUND so
    both engines apply the identical half-up rule to the identical
    double — ROUND's half-even/half-up choice differs by type corner
    across engines; floor is exact everywhere."""
    return (f"transform({col}, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
            f" * 127.0 / maxabs + 0.5) AS BIGINT))")


@register(
    "llm_simsearch_quantized",
    oracle=f"""
    WITH m AS (
      SELECT MAX(list_max(list_transform(embedding,
                                         x -> abs(CAST(x AS DOUBLE)))))
        AS maxabs
      FROM embeddings
    ), q AS (
      SELECT list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / m.maxabs
                               + 0.5) AS BIGINT)) AS qq
      FROM embeddings, m WHERE vec_id = 0
    )
    SELECT e.vec_id AS vec_id, e.label AS label,
           CAST(list_sum(list_transform(generate_series(1, {DIM}),
             i -> CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 127.0
                             / m.maxabs + 0.5) AS BIGINT) * q.qq[i]))
             AS BIGINT) AS qdot
    FROM embeddings e, m, q WHERE e.vec_id <> 0
    ORDER BY qdot DESC, e.vec_id LIMIT 10
    """,
    tags=("llm", "similarity", "quantization"),
)
def llm_simsearch_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized top-k similarity: symmetric scalar quantization
    (qx = round(127·x/maxabs)) then integer dot-product ranking
    against the query vector (vec_id 0) — the 4×-smaller,
    SIMD-friendly index every production ANN system runs before exact
    float re-ranking.

    Determinism: maxabs is an exact MAX over doubles; each quantized
    component is floor(x·127/maxabs + 0.5) on identical input bits;
    the score is a pure int64 dot product — no float accumulation.

    Scale: maxabs is one tiny aggregate (broadcast back as a scalar
    row); the query vector broadcasts; the scan stays embarrassingly
    parallel and ORDER BY+LIMIT plans as TakeOrdered. At 100 TB the
    quantized column is materialized once (4× less I/O than float32)
    and this query reads only it.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    m = e.select(F.max(F.expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
    )).alias("maxabs"))
    q = (e.filter(F.col("vec_id") == 0).crossJoin(F.broadcast(m))
         .select(F.expr(_quant_spark("embedding")).alias("qq")))
    cand = (e.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(m)).crossJoin(F.broadcast(q))
            .withColumn("qv", F.expr(_quant_spark("embedding"))))
    qdot = F.expr(
        f"aggregate(sequence(1, {DIM}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + element_at(qv, i) * element_at(qq, i))")
    return (cand.withColumn("qdot", qdot)
            .orderBy(F.desc("qdot"), F.asc("vec_id"))
            .limit(10).select("vec_id", "label", "qdot"))


@register(
    "snapshot_time_travel",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, 0 AS version
      FROM orders
      UNION ALL
      SELECT o_orderkey, 'R1', 1 FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 'R2', 2 FROM orders WHERE o_orderkey % 11 = 0
    ), reconstructed AS (
      SELECT a.v AS as_of, k, s,
             row_number() OVER (PARTITION BY a.v, k
                                ORDER BY version DESC) AS rn
      FROM v JOIN (VALUES (0), (1), (2)) a(v) ON v.version <= a.v
    )
    SELECT CAST(as_of AS BIGINT) AS as_of, s AS status,
           COUNT(*) AS n_orders
    FROM reconstructed WHERE rn = 1 GROUP BY as_of, s
    """,
    tags=("source", "snapshot", "timetravel"),
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel over versioned parquet deltas: the orders
    table is materialized as a base snapshot (version=0) plus two
    update deltas (version=1, 2) in a hive-partitioned layout; reading
    "AS OF version v" = scan partitions version<=v, keep the
    latest-version row per key (one window), aggregate. The
    delta-log read pattern of every lakehouse table format, built
    from primitives — no format dependency.

    Scale: partition pruning drops every delta newer than the
    requested version at planning time — each as-of branch's scan
    carries a ``version <= v`` PartitionFilter (pinned), so an AS OF
    read touches only its own snapshot's files; reconstruction is one
    window over a key-clustered exchange, and deltas are small
    relative to base, so an AS OF read costs ~one base scan.
    """
    import os
    import tempfile
    import uuid as _uuid

    o = load_table(spark, sf_dir, "orders")
    base = os.path.join(tempfile.gettempdir(),
                        f"spark_graft_tt_{_uuid.uuid4().hex[:8]}")
    (o.select(F.col("o_orderkey").alias("k"),
              F.col("o_orderstatus").alias("s"))
     .write.mode("overwrite").parquet(os.path.join(base, "version=0")))
    (o.filter(F.col("o_orderkey") % 7 == 0)
     .select(F.col("o_orderkey").alias("k"), F.lit("R1").alias("s"))
     .write.mode("overwrite").parquet(os.path.join(base, "version=1")))
    (o.filter(F.col("o_orderkey") % 11 == 0)
     .select(F.col("o_orderkey").alias("k"), F.lit("R2").alias("s"))
     .write.mode("overwrite").parquet(os.path.join(base, "version=2")))
    versioned = (spark.read.option("basePath", base)
                 .parquet(os.path.join(base, "version=*")))
    frames = []
    for as_of in (0, 1, 2):
        w = Window.partitionBy("k").orderBy(F.desc("version"))
        frames.append(
            versioned.filter(F.col("version") <= as_of)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy(F.lit(as_of).cast("bigint").alias("as_of"),
                     F.col("s").alias("status"))
            .agg(F.count(F.lit(1)).alias("n_orders")))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@register(
    "llm_temperature_mix",
    oracle=f"""
    WITH s AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_total,
             CAST(FLOOR(SQRT(CAST(n_total AS DOUBLE)) * {_WGT_SCALE})
                  AS BIGINT) AS wgt
      FROM s
    ), caps AS (
      SELECT source, n_total,
             LEAST(n_total, ({_MIX_BUDGET} * wgt)
                            // (SELECT SUM(wgt) FROM w)) AS n_keep
      FROM w
    ), ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT c.source AS source, c.n_total AS n_total,
           CAST(c.n_keep AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN r.rn <= c.n_keep THEN r.n_chars
                         ELSE 0 END) AS BIGINT) AS chars_kept
    FROM ranked r JOIN caps c USING (source)
    GROUP BY c.source, c.n_total, c.n_keep
    """,
    tags=("llm", "assembly", "mixing"),
)
def llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): each source's
    kept-document quota is budget · sqrt(n_s)/Σ sqrt(n_s) — the
    mixture-flattening rule pre-training corpora use so giant crawl
    sources don't drown curated ones (equal sources keep equal
    shares; a 100× larger source keeps only 10× the docs). Selection
    within a source is by md5-of-id rank, so the sample is uniform
    and reproducible.

    Determinism: weights are floor(sqrt(n)·1e6) bigints — the sums
    and the integer division are exact in both engines; no float
    accumulates anywhere.

    Scale: quotas come from a per-source count (tiny, broadcast
    back); selection is one rank window over a source-clustered
    exchange — identical shape to llm_source_caps with data-derived
    caps instead of a constant.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    w = s.withColumn("wgt", F.expr(
        f"CAST(FLOOR(SQRT(CAST(n_total AS DOUBLE)) * {_WGT_SCALE})"
        f" AS BIGINT)"))
    caps = (w.withColumn("total_w", F.sum("wgt").over(
                Window.partitionBy()))
            .select("source", "n_total",
                    F.least(F.col("n_total"),
                            F.expr(f"({_MIX_BUDGET} * wgt) div total_w"))
                    .cast("bigint").alias("n_keep")))
    ranked = d.select(
        "source", "n_chars",
        F.row_number().over(
            Window.partitionBy("source")
            .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        ).alias("rn"))
    return (ranked.join(F.broadcast(caps), "source")
            .groupBy("source", "n_total", "n_keep")
            .agg(F.sum(F.when(F.col("rn") <= F.col("n_keep"),
                              F.col("n_chars")).otherwise(0))
                 .cast("bigint").alias("chars_kept")))
