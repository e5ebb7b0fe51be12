"""Training-data assembly extensions (round 3): per-source caps,
token-budget sampling, deterministic global shuffle sharding, cluster
canonicalization by quality, and corpus length histograms — the
curation knobs a 100 TB pre-training pipeline turns after dedup and
quality filtering (queries_llm / queries_llm2) have produced a corpus.

Everything here is integer/string-deterministic by construction: doc
selection orders by md5-of-id (a uniform, engine-identical shuffle key)
with doc_id tie-breaks, and every output column is a bigint or string —
no float channel exists for a hash compare to diverge on.

Scale stance: each query is one window pass or one aggregate over a
single exchange; the md5 ordering key is uniform by construction, so
no partition is hot regardless of how skewed sources or languages are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens_col
from ..operators.rank import TWO_PHASE_MIN_BYTES, bucketed_rank
from ..sources import load_table
from ..sources.tables import table_disk_bytes
from .catalog import register
from .queries_llm import _simhash_oracle

#: Per-source document cap (llm_source_caps).
_SOURCE_CAP = 40

#: Per-language token budget (llm_token_budget_sample).
_TOKEN_BUDGET = 4000

#: Shard fan-out for the deterministic global shuffle.
_N_SHARDS = 16


def _doc_hash(dialect: str) -> str:
    """Uniform deterministic per-doc ordering key: md5 of the decimal
    doc_id string. Identical byte-for-byte in Spark and DuckDB."""
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    return f"md5(CAST(doc_id AS {cast}))"


@register(
    "llm_source_caps",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_doc_hash('duckdb')}, doc_id)
               AS rn
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN rn <= {_SOURCE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= {_SOURCE_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_kept
    FROM ranked
    GROUP BY source
    """,
    tags=("llm", "assembly"),
)
def llm_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps: each source (the domain analog in a
    web corpus) contributes at most N documents, selected by
    hash-of-id order so the sample is uniform and reproducible — the
    standard guard against one crawl domain dominating the mixture.

    Scale: one window pass over a source-clustered exchange; the md5
    ordering key makes the per-source selection deterministic without
    any global sort. A hot source only makes its *partition's sort*
    bigger, never a cross-partition shuffle — and the output is one
    row per source.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr(_doc_hash("spark")), "doc_id")
    kept = F.col("rn") <= _SOURCE_CAP
    return (
        d.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
             F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
             .alias("chars_kept"))
    )


@register(
    "llm_token_budget_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             {_doc_hash('duckdb')} AS h
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens)
                    OVER (PARTITION BY lang ORDER BY h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c
    WHERE cum_tokens - n_tokens < {_TOKEN_BUDGET}
    """,
    tags=("llm", "assembly"),
)
def llm_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling: per language, documents are taken in
    hash-of-id order until the running token count reaches the budget
    (a document *starting* under budget is kept whole) — how a fixed
    token allocation per language is filled reproducibly from an
    arbitrarily large corpus.

    Determinism: pure-integer running sum over a md5-keyed order with
    doc_id tie-break. Scale: one language-clustered window pass; the
    greedy prefix means downstream reads touch only budget-sized data
    per language.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang",
        F.size(F.expr(tokens_col("text"))).cast("bigint").alias("n_tokens"),
        F.expr(_doc_hash("spark")).alias("h"))
    w = (Window.partitionBy("lang").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        c.filter(F.col("cum_tokens") - F.col("n_tokens") < _TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


@register(
    "llm_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(instr('0123456789abcdef',
                      substring({_doc_hash('duckdb')}, 1, 1)) - 1
                AS BIGINT) AS shard,
           row_number() OVER (
             PARTITION BY instr('0123456789abcdef',
                                substring({_doc_hash('duckdb')}, 1, 1))
             ORDER BY {_doc_hash('duckdb')}, doc_id) AS pos
    FROM documents
    """,
    tags=("llm", "assembly"),
)
def llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: each document gets
    a shard (first md5 hex nibble → 16 shards) and a position within
    its shard (md5 order) — a reproducible random permutation of the
    corpus that never materializes a single global sort. Reading
    shards round-robin replays the exact shuffled order on any
    cluster size.

    Scale: the md5 key is uniform, so all 16 shards are balanced by
    construction. Position assignment is size-gated (r13): a rank
    window hash-partitions by its PARTITION BY key, so the plain form
    sorts each of the 16 shards in ONE task no matter the cluster
    size — the right plan while the corpus is small (measured
    interleaved: the two-phase form costs a flat ~+0.4 s at both
    bench tiers, sub-6 MB corpora), and a scaling wall past
    operators/rank.TWO_PHASE_MIN_BYTES. Above the gate the two-phase
    bucketed rank (operators/rank.bucketed_rank) buckets by the md5's
    next two hex chars — a prefix of the order key — fanning every
    shard's sort out 256x with bit-identical positions: local rank +
    the broadcast bucket offset (equality law-tested at sf0.01 and
    the sf1 replica in tests/test_rank_twophase.py).
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.expr(_doc_hash("spark"))
    size = table_disk_bytes(sf_dir, "documents")
    if size is not None and size < TWO_PHASE_MIN_BYTES:
        shard = (F.instr(F.lit("0123456789abcdef"),
                         F.substring(h, 1, 1)) - 1)
        w = Window.partitionBy(shard).orderBy(h, F.col("doc_id"))
        return d.select("doc_id", shard.cast("bigint").alias("shard"),
                        F.row_number().over(w).cast("bigint").alias("pos"))
    base = (d.select("doc_id", h.alias("h"))
            .select("doc_id", "h",
                    (F.instr(F.lit("0123456789abcdef"),
                             F.substring("h", 1, 1)) - 1)
                    .cast("bigint").alias("shard"),
                    F.substring("h", 2, 2).alias("b")))
    return (bucketed_rank(base, ["shard"], "b",
                          [F.col("h"), F.col("doc_id")], out="pos")
            .select("doc_id", "shard", "pos"))


@register(
    "llm_cluster_quality_pick",
    oracle=f"""
    WITH sig AS ({_simhash_oracle()})
    SELECT d.doc_id, sig.simhash, d.n_chars, sig.bucket_size
    FROM documents d JOIN sig ON d.doc_id = sig.doc_id
    QUALIFY row_number() OVER (PARTITION BY sig.simhash
                               ORDER BY d.n_chars DESC, d.doc_id) = 1
    """,
    tags=("llm", "dedup", "assembly"),
)
def llm_cluster_quality_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster canonicalization: within each simhash
    near-dup bucket, keep the *longest* document (tie-break doc_id)
    instead of the arbitrary minimum id — the curation-grade variant
    of llm_dedup_apply, where the survivor is chosen by a quality
    signal rather than by key order.

    Scale: the signature relation is one explode+aggregate (the
    simhash signature, no pairwise work); the pick AND the bucket
    size are marginals of one partial-aggregated groupBy(simhash) —
    min_by on the (-n_chars, doc_id) struct is exactly the rn=1
    survivor under (n_chars DESC, doc_id), with no sort. Swapping
    n_chars for a model-scored quality column changes nothing
    structurally.
    """
    # one simhash-keyed exchange total (r12): the windowed-signature
    # form paid exchange + sort + window TWICE (bucket_size inside
    # llm_dedup_simhash, then the rn=1 pick after the join re-keyed by
    # simhash). The signature join is 1:1 on doc_id, so the survivor
    # (min_by on the (-n_chars, doc_id) struct == rn=1 under
    # (n_chars DESC, doc_id)) and bucket_size are both marginals of
    # ONE partial-aggregated groupBy(simhash) — no sort anywhere.
    from .queries_llm import _simhash_sig

    sig = _simhash_sig(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    j = d.select("doc_id", "n_chars").join(sig, "doc_id")
    return (
        j.groupBy("simhash")
        .agg(F.min_by(F.struct("doc_id", "n_chars"),
                      F.struct((-F.col("n_chars")).alias("neg_chars"),
                               F.col("doc_id"))).alias("pick"),
             F.count(F.lit(1)).alias("bucket_size"))
        .select(F.col("pick.doc_id").alias("doc_id"), "simhash",
                F.col("pick.n_chars").alias("n_chars"), "bucket_size")
    )


@register(
    "llm_length_histogram",
    oracle="""
    SELECT lang,
           n_chars // 50 AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, bucket
    """,
    tags=("llm", "stats"),
)
def llm_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram: document counts per (language,
    50-char-wide length bucket) — the distribution check run before
    choosing truncation/packing lengths, and the fastest way to spot
    a scraped-boilerplate spike (a single overfull bucket).

    Scale: pure integer bucketing folded into one partial-aggregated
    shuffle; output is languages × occupied buckets.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", F.expr("n_chars DIV 50").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"))
    )


def _recall_oracle() -> str:
    """Compose the registered brute-force and LSH oracles into one
    recall measurement — both SQL texts are reused verbatim, so this
    stays consistent with the queries it evaluates."""
    from .catalog import _REGISTRY

    brute = _REGISTRY["llm_simsearch_topk"].oracle
    lsh = _REGISTRY["llm_simsearch_lsh"].oracle
    return f"""
    WITH brute AS ({brute}),
    approx AS ({lsh})
    SELECT CAST((SELECT COUNT(*) FROM brute) AS BIGINT) AS k_brute,
           CAST((SELECT COUNT(*) FROM approx) AS BIGINT) AS k_approx,
           CAST((SELECT COUNT(*) FROM brute b
                 JOIN approx a ON b.vec_id = a.vec_id) AS BIGINT)
             AS n_overlap,
           CAST((SELECT COUNT(*) FROM brute b
                 JOIN approx a ON b.vec_id = a.vec_id) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM brute) AS DOUBLE) AS recall_at_k
    """


@register("llm_ann_recall_eval", oracle=_recall_oracle(),
          tags=("llm", "simsearch", "eval"))
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@k of the LSH-bucketed similarity
    search against the brute-force ground truth — the measurement a
    production vector pipeline runs before trusting an approximate
    index, AS a catalog query (the eval harness is itself relational:
    two top-k relations and a key-overlap join).

    Determinism: counts are integers; recall is one double division.
    Scale: both inputs are top-k relations (k rows each), so the
    overlap join and the three single-row aggregates are trivially
    broadcast — the whole eval stays declarative (no driver-side
    counts); the expensive parts are the searches themselves, already
    analyzed at their own entries.
    """
    from .queries_llm import llm_simsearch_lsh, llm_simsearch_topk

    brute = llm_simsearch_topk(spark, sf_dir).select("vec_id")
    approx = llm_simsearch_lsh(spark, sf_dir).select("vec_id")
    nb = brute.agg(F.count(F.lit(1)).alias("k_brute"))
    na = approx.agg(F.count(F.lit(1)).alias("k_approx"))
    ov = (brute.join(approx, "vec_id")
          .agg(F.count(F.lit(1)).alias("n_overlap")))
    return (
        nb.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(ov))
        .select("k_brute", "k_approx", "n_overlap",
                (F.col("n_overlap").cast("double")
                 / F.col("k_brute").cast("double")).alias("recall_at_k"))
    )


@register(
    "llm_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                      i -> concat_ws(' ', t[i], t[i + 1], t[i + 2])) END))
               AS s
      FROM toks
    ), firsts AS (
      SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN firsts.first_doc = sh.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN firsts.first_doc = sh.doc_id
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM sh JOIN firsts ON sh.s = firsts.s
    GROUP BY sh.doc_id
    """,
    tags=("llm", "text", "dedup"),
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty: the fraction of a document's distinct word
    3-gram shingles that no earlier document (by id — ingestion order)
    already contained. The incremental-curation signal: near-zero
    novelty means the document only restates the corpus so far, and —
    unlike pairwise dedup — it composes over arbitrarily many partial
    overlaps.

    Determinism: pure integer counts over a MIN-per-shingle relation,
    one double division. Scale: the shingle inverted index is the
    same one-shuffle relation the jaccard pipeline builds; novelty
    reuses it with a MIN aggregate instead of pair expansion — no
    quadratic anything, hot shingles cost one combine each.
    """
    from ..functions.text import shingles_col, tokens_col
    from ..sources import spread

    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.expr(tokens_col("text")).alias("t"))
    sh = toks.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.expr(shingles_col("t", "spark")))).alias("s"))
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.sum(novel).alias("n_novel"),
             (F.sum(novel).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("novelty"))
    )
