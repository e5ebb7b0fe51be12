"""ext26: LSH banding-parameter sweep —

``llm_lsh_band_sweep`` evaluates every banding layout of the engine's
6-subhash MinHash signature (1x6, 2x3, 3x2, 6x1) in ONE signature pass
and reports, per layout, the bucket census that decides the tuning:
bucket count, hottest bucket, and the candidate-pair mass Σ C(n,2) —
the exact shuffle+compare cost the dedup stage would pay under that
layout. Stats are CLOSED FORM over bucket sizes: the sweep never
generates a candidate pair, so it is safe to run on the full corpus at
any scale before committing to a layout (more bands / shorter rows ⇒
higher recall AND higher pair mass; this query prices that trade).

``llm_dedup_minhash`` runs the (3 bands x 2 rows) point of this grid;
``llm_dedup_recall_eval`` prices its recall. This completes the tuning
triangle with the cost axis.

Reference parity: none of this exists in the reference (615-LoC Go
CQRS demo); SURVEY.md §2.2 capability-superset tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import duckdb_tokens, shingles_col, tokens_col
from ..sources import load_table, spread
from .catalog import register

#: Banding layouts over the same 6 independent 20-bit sub-hashes
#: (_MINHASH_SLICES in queries_llm): name -> tuple of bands, each band
#: a tuple of sub-hash indices (r = len(band), b = len(bands)).
_LAYOUTS: tuple[tuple[str, tuple[tuple[int, ...], ...]], ...] = (
    ("b1_r6", ((0, 1, 2, 3, 4, 5),)),
    ("b2_r3", ((0, 1, 2), (3, 4, 5))),
    ("b3_r2", ((0, 1), (2, 3), (4, 5))),
    ("b6_r1", ((0,), (1,), (2,), (3,), (4,), (5,))),
)

_SLICES = [(1 + 5 * i, 5) for i in range(6)]   # = queries_llm._MINHASH_SLICES


def _sweep_oracle() -> str:
    toks = duckdb_tokens("text")
    shingles = shingles_col(toks, "duckdb")
    mins = ", ".join(f"MIN(substr(hs, {p}, {w})) AS h{i}"
                     for i, (p, w) in enumerate(_SLICES))
    per_layout = " UNION ALL ".join(
        f"SELECT '{name}' AS layout, {len(bands)} AS n_bands, "
        f"{len(bands[0])} AS rows_per_band, {bi} AS band_idx, "
        f"CONCAT({', '.join(f'h{i}' for i in band)}) AS band_val "
        f"FROM sig"
        for name, bands in _LAYOUTS for bi, band in enumerate(bands))
    return f"""
    WITH sh AS (
      SELECT doc_id, md5(UNNEST(list_distinct({shingles}))) AS hs
      FROM documents
    ), sig AS (
      SELECT doc_id, {mins} FROM sh GROUP BY doc_id
    ), bands AS ({per_layout}
    ), buckets AS (
      SELECT layout, n_bands, rows_per_band, band_idx, band_val,
             COUNT(*) AS n
      FROM bands GROUP BY ALL
    )
    SELECT layout,
           CAST(MAX(n_bands) AS BIGINT) AS n_bands,
           CAST(MAX(rows_per_band) AS BIGINT) AS rows_per_band,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hot_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS pair_mass
    FROM buckets
    GROUP BY layout
    """


@register("llm_lsh_band_sweep", oracle=_sweep_oracle(),
          tags=("llm", "dedup", "lsh", "tuning"))
def llm_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding sweep: per layout of the 6-subhash signature,
    the hot-bucket count, the hottest bucket, and the candidate-pair
    mass Σ C(n,2) the dedup stage would shuffle-and-compare under that
    layout — computed from bucket SIZES alone (no pair is ever
    generated), so the sweep costs one signature pass + one bucket
    aggregate per layout regardless of how degenerate a layout is.
    Reading the table: b6_r1 maximizes recall and pair mass (every
    single-hash collision is a candidate), b1_r6 the reverse; the
    production (3x2) point is priced between them.

    Scale: the shingle+signature pass dominates (it is the dedup
    stage's own first pass, shared verbatim — same slices, same md5);
    the layout fan-out multiplies the tiny |docs| x 6 signature table,
    not the corpus; the bucket aggregates are map-side combinable on
    hashed keys. The signature table is localCheckpointed once for the
    four layout consumers.
    """
    # materialize the token array BEFORE shingling (the shingle lambda
    # references its input multiple times — inlining split() there
    # re-tokenizes once per shingle, measured 30x at sf1) and spread
    # the scan so the hash stage parallelizes; both mirrors of
    # llm_dedup_minhash's hot-loop discipline
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks_df = d.select("doc_id", F.expr(tokens_col("text")).alias("toks"))
    sh = toks_df.select("doc_id", F.explode(
        F.array_distinct(F.expr(shingles_col("toks", "spark")))).alias("s")
    ).select("doc_id", F.md5("s").alias("hs"))
    sig = (sh.groupBy("doc_id")
           .agg(*[F.min(F.substring("hs", p, w)).alias(f"h{i}")
                  for i, (p, w) in enumerate(_SLICES)])
           .localCheckpoint(eager=True))
    frames = []
    for name, bands in _LAYOUTS:
        band_structs = F.array(*[
            F.struct(F.lit(bi).alias("band_idx"),
                     F.concat(*[F.col(f"h{i}") for i in band])
                     .alias("band_val"))
            for bi, band in enumerate(bands)])
        buckets = (sig.select(F.explode(band_structs).alias("bd"))
                   .groupBy("bd.band_idx", "bd.band_val")
                   .agg(F.count(F.lit(1)).alias("n")))
        frames.append(
            buckets.agg(
                F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                .cast("bigint").alias("n_hot_buckets"),
                F.max("n").cast("bigint").alias("max_bucket"),
                F.sum(F.expr("n * (n - 1) DIV 2")).cast("bigint")
                .alias("pair_mass"))
            .select(F.lit(name).alias("layout"),
                    F.lit(len(bands)).cast("bigint").alias("n_bands"),
                    F.lit(len(bands[0])).cast("bigint")
                    .alias("rows_per_band"),
                    "n_hot_buckets", "max_bucket", "pair_mass"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
