"""LLM-data pack, second batch: context-window preparation and corpus
curation — the operations between "raw scraped corpus" and "token
stream a trainer can consume": overlapping-window chunking, corpus
n-gram statistics, boilerplate-prefix detection, and the composed
curation pipeline (scrub → quality-filter → dedup → split → summarize)
as ONE declarative query.

All token math derives from whitespace tokenization (documents are
single-space separated, `functions/text.py`); chunk geometry uses pure
integer arithmetic so Spark and DuckDB agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import duckdb_tokens, normalize_text, tokens_col
from ..sources import load_table
from .catalog import register

#: chunk geometry: 64-token windows advancing 48 tokens (16 overlap).
CHUNK, STRIDE = 64, 48


@register(
    "llm_chunk_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {duckdb_tokens('text')} AS toks,
             len({duckdb_tokens('text')}) AS n
      FROM documents
    ), s AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {CHUNK} THEN 0
                  ELSE (n - {CHUNK} + {STRIDE} - 1) // {STRIDE} END AS kmax
      FROM t
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_idx,
           CAST(k * {STRIDE} AS BIGINT) AS chunk_start,
           CAST(least({CHUNK}, n - k * {STRIDE}) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(
               toks[k * {STRIDE} + 1 : k * {STRIDE} + {CHUNK}], ' '))
             AS chunk_md5
    FROM s, UNNEST(generate_series(0, kmax)) AS u(k)
    """,
    tags=("llm", "chunk"),
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into 64-token
    windows advancing 48 tokens, so consecutive chunks share a 16-token
    overlap — the standard prep for fixed-context training and for
    retrieval indexing. The content digest per chunk makes the check
    end-to-end: a one-token boundary error changes the md5.

    Scale: geometry is computed per row with integer expressions and
    the expansion is an in-row ``posexplode`` — zero shuffles, and the
    fan-out per document is bounded by its own length (a 1M-token doc
    yields ~21k chunks on its own partition, never a cross-row blowup).
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr(tokens_col("text")).alias("toks"),
        F.size(F.expr(tokens_col("text"))).alias("n"),
    )
    s = t.withColumn(
        "kmax",
        F.when(F.col("n") <= CHUNK, F.lit(0)).otherwise(
            F.expr(f"(n - {CHUNK} + {STRIDE} - 1) DIV {STRIDE}")),
    )
    e = s.select(
        "doc_id", "toks", "n",
        F.posexplode(F.sequence(F.lit(0), F.col("kmax"))).alias("chunk_idx",
                                                                "k"),
    )
    return e.select(
        "doc_id",
        F.col("chunk_idx").cast("int"),
        (F.col("k") * STRIDE).cast("bigint").alias("chunk_start"),
        F.least(F.lit(CHUNK), F.col("n") - F.col("k") * STRIDE)
         .cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.slice("toks",
                                       F.col("k") * STRIDE + 1, CHUNK)))
         .alias("chunk_md5"),
    )


@register(
    "llm_ngram_stats",
    oracle=f"""
    WITH t AS (
      SELECT {duckdb_tokens('text')} AS toks FROM documents
    ), b AS (
      SELECT unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
    tags=("llm", "text", "ngram"),
)
def llm_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics: the 50 most frequent adjacent token
    pairs — the building block for contamination screens, boilerplate
    lists, and tokenizer-merge audits.

    Scale: bigrams are built in-row with ``zip_with`` over two array
    slices (no window, no self-join), so the only shuffle is the final
    count aggregation — map-side partial counts shrink it to one row
    per distinct bigram per partition — and the cut is TakeOrdered
    (per-partition heaps), never a global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr(tokens_col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        d.filter(n >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


@register(
    "llm_prefix_boilerplate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             md5(array_to_string({duckdb_tokens('text')}[1:16], ' '))
               AS prefix_fp
      FROM documents
    )
    SELECT doc_id, source, prefix_fp,
           COUNT(*) OVER (PARTITION BY prefix_fp) AS n_sharing,
           (COUNT(*) OVER (PARTITION BY prefix_fp)) > 1 AS is_boilerplate
    FROM t
    """,
    tags=("llm", "dedup", "text"),
)
def llm_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix detection: documents opening with an
    identical 16-token prefix (site headers, license banners, template
    intros) are flagged by fingerprinting the prefix and counting
    sharers — prefix-level near-dup screening that exact whole-text
    hashing misses.

    Scale: the fingerprint is an in-row md5 of a bounded slice (16
    tokens regardless of document size), so the single shuffle keys on
    a 128-bit digest with corpus-wide ~uniform distribution.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(F.expr(tokens_col("text")), 1, 16)))
    n_sharing = F.count(F.lit(1)).over(Window.partitionBy("prefix_fp"))
    return (
        d.select("doc_id", "source", fp.alias("prefix_fp"))
        .select("doc_id", "source", "prefix_fp",
                n_sharing.alias("n_sharing"),
                (n_sharing > 1).alias("is_boilerplate"))
    )


@register(
    "llm_curation_pipeline",
    oracle=f"""
    WITH scrubbed AS (
      SELECT doc_id, lang, source,
             regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+[.][a-z]+',
                            '<EMAIL>', 'g') AS text
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, source, text,
             len({duckdb_tokens('text')}) AS n_tokens,
             len(list_distinct({duckdb_tokens('text')}))
               / CAST(len({duckdb_tokens('text')}) AS DOUBLE) AS unique_ratio
      FROM scrubbed
    ), kept AS (
      SELECT * FROM scored WHERE n_tokens >= 20 AND unique_ratio >= 0.3
    ), deduped AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY md5({normalize_text('text', 'duckdb')})
               ORDER BY doc_id) AS rn
      FROM kept
    )
    SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                     AS INT) % 10 < 9
                THEN 'train' ELSE 'eval' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM deduped WHERE rn = 1
    GROUP BY split, lang
    """,
    tags=("llm", "pipeline"),
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-curation pipeline as one declarative query:
    PII-scrub → token/uniqueness quality gate → exact dedup (canonical
    = lowest doc_id per normalized fingerprint) → deterministic
    hash-split → per (split, lang) corpus summary. This is the query a
    dataset builder actually runs; each stage is individually oracled
    elsewhere in the catalog, and this entry proves the stages compose
    without materialization barriers.

    Scale: one scan of documents; scrub/score/gate are codegen
    expressions fused into the scan, dedup is one PARTIAL-aggregated
    shuffle on the fingerprint digest carrying only (fp, doc_id, lang,
    source, n_tokens) — duplicates collapse map-side and no text byte
    ever crosses the wire — and the final summary is a partial-agg
    shuffle on (split, lang). Nothing re-scans, nothing collects: the
    100 TB plan is scan → exchange(md5, slim) → exchange(split,lang).
    Measured sf1: 5.6 -> 5.0 s replacing the earlier ROW_NUMBER
    window (which shipped full text through its exchange and could
    not combine map-side) — modest at this corpus size because the
    per-row scrub/tokenize codegen dominates; that codegen term then
    dropped 5.0 -> ~3.8 s warm (r10) when normalize_text fused its
    two regex passes into one (see functions/text.py) — the scrub
    stage is ONE collapsed projection (email scrub + token stats +
    fingerprint share the scan; CollapseProject + codegen
    subexpression elimination keep the split() and the scrubbed text
    computed once, verified via the formatted plan).
    """
    d = load_table(spark, sf_dir, "documents")
    scrubbed = d.select(
        "doc_id", "lang", "source",
        F.regexp_replace("text", "[a-z0-9.]+@[a-z0-9.]+[.][a-z]+",
                         "<EMAIL>").alias("text"),
    )
    toks = F.expr(tokens_col("text"))
    scored = scrubbed.select(
        "doc_id", "lang", "source", "text",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks).cast("double")).alias("unique_ratio"),
    )
    kept = scored.filter((F.col("n_tokens") >= 20)
                         & (F.col("unique_ratio") >= 0.3))
    # canonical row per fingerprint via a partial-aggregatable
    # min(struct(doc_id, ...)) — doc_id leads the struct, so the
    # lexicographic MIN is exactly the oracle's ROW_NUMBER ... ORDER
    # BY doc_id pick. Two wins over the window formulation: map-side
    # combine collapses duplicates before the exchange, and the text
    # column is dropped BEFORE the shuffle (the window shape shipped
    # every document's full text across the wire just to discard it).
    fp = F.md5(F.expr(normalize_text("text", "spark")))
    deduped = (
        kept.select(fp.alias("fp"), "doc_id", "lang", "source", "n_tokens")
        .groupBy("fp")
        .agg(F.min(F.struct("doc_id", "lang", "source", "n_tokens"))
             .alias("r"))
        .select("r.doc_id", "r.lang", "r.source", "r.n_tokens")
    )
    split = F.when(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
               16, 10).cast("int") % 10 < 9, "train").otherwise("eval")
    return (
        deduped.groupBy(split.alias("split"), "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.countDistinct("source").alias("n_sources"))
    )
