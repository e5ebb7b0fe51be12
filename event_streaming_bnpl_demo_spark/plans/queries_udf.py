"""UDF surface (SURVEY §2.2 'UDF surface'): the Python extension
points Spark exposes — scalar, vectorized, grouped-map, and (Spark 4)
table-valued — each demonstrated on a real operator with a SQL
oracle. The reference has no UDF stack at all — every custom behavior
is a hard-coded Go branch (consumer/consumer.go:122-181); here custom
logic plugs into the engine without touching it.

Determinism discipline: UDF bodies stick to integer/string results or
single floating-point ops on exact inputs (subtraction, min) — never
float accumulation — so DuckDB reproduces them bit-for-bit and the
driver's value-hash compare holds.

Performance ladder (the docstrings of each query give the 100 TB
posture):

1. builtins (whole-stage codegen)        — everything else in plans/
2. ``pandas_udf`` (Arrow-vectorized)     — udf_pandas_tokens
3. ``applyInPandas`` (grouped map)       — udf_grouped_demean
4. row-at-a-time ``udf()``               — udf_python_scalar, kept ONLY
   as the anti-pattern exhibit; ~10-100x slower than (2), never in a
   hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..functions.vectors import duckdb_cosine
from ..sources import load_table, spread
from .catalog import register

DIM = 64  # embedding dimensionality (FIXTURES.md §B)


@register(
    "udf_pandas_tokens",
    oracle="""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE length(string_split_regex(trim(text), '\\s+'))
           END AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    tags=("llm", "text", "udf"),
)
def udf_pandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count as an Arrow-vectorized ``pandas_udf``.

    One Arrow batch crosses the JVM↔Python boundary per ~10k rows (vs
    one pickled row per call for a classic UDF); the pandas str engine
    vectorizes the split. At 100 TB this runs embarrassingly parallel —
    no shuffle, scales with executor count; the Python workers are the
    only cost over the pure-builtin twin (llm_text_tokens).
    """

    @pandas_udf("bigint")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.split().str.len().fillna(0).astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@register(
    "udf_grouped_demean",
    oracle="""
    SELECT event_id, event_type,
           value - MIN(value) OVER (PARTITION BY event_type) AS delta
    FROM events
    """,
    tags=("udf", "agg"),
)
def udf_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-event-type offset from the
    group minimum (min and subtraction are exact on doubles, so the
    oracle matches bit-for-bit — no float accumulation in the UDF).

    Scale: one shuffle on the group key; each group becomes ONE pandas
    frame on ONE executor, so this pattern requires bounded group
    cardinality×size (here ≤5 types — better expressed as a window
    function, which is why the builtin twin exists). applyInPandas
    earns its cost only when the per-group logic genuinely needs a
    dataframe library (model scoring, curve fitting); the docstring
    twin demonstrates the plumbing with a provable result.
    """

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "event_type"]].copy()
        out["delta"] = pdf["value"] - pdf["value"].min()
        return out

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", "value").groupBy(
        "event_type").applyInPandas(
        demean, schema="event_id bigint, event_type string, delta double")


@register(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_code,
           CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2
                THEN 'expedite' ELSE 'routine' END AS lane
    FROM orders
    """,
    tags=("udf", "scalar"),
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python ``udf()`` — the slow path, registered to
    prove the surface exists. Every row is pickled across the JVM↔
    Python boundary individually; on 100 TB this is the difference
    between hours and minutes vs the ``pandas_udf`` tier, and the same
    logic is expressible as a builtin CASE (which Catalyst would also
    push through codegen). Kept out of every benchmark path.
    """

    @udf("int")
    def priority_code(p: str) -> int:
        return int(p[0])

    @udf("string")
    def lane(p: str) -> str:
        return "expedite" if int(p[0]) <= 2 else "routine"

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        priority_code("o_orderpriority").alias("priority_code"),
        lane("o_orderpriority").alias("lane"),
    )


@register(
    "udf_cogrouped_asof",
    oracle="""
    WITH cand AS (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS p_ts,
             v.event_id AS view_id, v.ts AS v_ts,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p
      JOIN events v ON v.user_id = p.user_id
                   AND v.event_type = 'view' AND v.ts <= p.ts
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, view_id,
           CAST(date_diff('second', v_ts, p_ts) AS BIGINT) AS seconds_since_view
    FROM cand WHERE rn = 1
    """,
    tags=("udf", "asof"),
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map UDF surface (``groupBy().cogroup().applyInPandas``):
    both event branches grouped by user land in one pandas function as
    two aligned frames, merged per user with ``pd.merge_asof`` — the
    canonical use of cogroup, and the vectorized-Python twin of the
    pure-SQL join_asof (same oracle, so both formulations are proven
    equal).

    Scale: one shuffle of each side on user_id, then Arrow-batched
    per-group pandas — the right tier when per-group logic is genuinely
    imperative; join_asof / operators.asof stay the JVM-side defaults.
    Ties at equal v_ts break to the max view_id because merge_asof
    takes the LAST right row in (v_ts, view_id) sort order; seconds are
    floor-epoch diffs, matching unix_timestamp()/date_diff('second').
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"))
    out_cols = ["purchase_id", "user_id", "view_id", "seconds_since_view"]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(columns=out_cols)
        m = pd.merge_asof(
            left.sort_values("p_ts"),
            right[["view_id", "v_ts"]].sort_values(["v_ts", "view_id"]),
            left_on="p_ts", right_on="v_ts", direction="backward")
        m = m.dropna(subset=["view_id"])
        secs = (m["p_ts"].astype("int64") // 10**9
                - m["v_ts"].astype("int64") // 10**9)
        return pd.DataFrame({
            "purchase_id": m["purchase_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "view_id": m["view_id"].astype("int64"),
            "seconds_since_view": secs.astype("int64"),
        })

    return (p.groupBy("user_id").cogroup(v.groupBy("user_id"))
            .applyInPandas(merge, ("purchase_id bigint, user_id bigint, "
                                   "view_id bigint, seconds_since_view bigint")))


@register(
    "udf_pandas_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS vec_id, e.label AS label,
           ROUND({duckdb_cosine('e.embedding', 'q.qe', DIM)}, 4) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY {duckdb_cosine('e.embedding', 'q.qe', DIM)} DESC, e.vec_id
    LIMIT 10
    """,
    tags=("udf", "similarity"),
)
def udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized-Pandas-UDF tier of similarity search, sharing
    llm_simsearch_topk's oracle — numpy-batched cosine proven
    bit-equal to the JVM higher-order-function fold. The trick: numpy's
    own sum/dot use pairwise/SIMD summation (different rounding), so
    the UDF accumulates dimension-by-dimension across the whole Arrow
    batch (``acc += M[:, k] * q[k]``) — the exact left-to-right IEEE
    fold of functions/vectors.dot_expr, vectorized over rows instead
    of elements.

    Scale: Arrow ships the embedding column zero-copy; one Python
    worker call per batch, O(dim) vector ops each. Use this tier when
    the per-element math outgrows SQL expressions (learned metrics,
    quantized dots); the builtin fold remains the default.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    e = spread(load_table(spark, sf_dir, "embeddings"))
    qvec = np.asarray(
        e.filter(F.col("vec_id") == 0).select("embedding").head()[0],
        dtype=np.float64)
    qn = 0.0
    for x in qvec:                      # sequential fold, matches SQL
        qn += x * x
    qn = float(np.sqrt(qn))

    @pandas_udf("double")
    def cos(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        dot = np.zeros(len(m))
        nrm = np.zeros(len(m))
        for k in range(m.shape[1]):     # dim-sequential, row-vectorized
            dot += m[:, k] * qvec[k]
            nrm += m[:, k] * m[:, k]
        return pd.Series(dot / (np.sqrt(nrm) * qn))

    return (
        e.filter(F.col("vec_id") != 0)
        .withColumn("cos_raw", cos(F.col("embedding")))
        .orderBy(F.desc("cos_raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("cos_raw", 4).alias("cos_sim"))
    )


@register(
    "udf_python_udtf",
    oracle="""
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           substring(text, CAST(i AS INT) * 200 + 1, 200) AS chunk_text,
           CAST(length(substring(text, CAST(i AS INT) * 200 + 1, 200))
                AS BIGINT) AS chunk_len
    FROM documents,
         UNNEST(generate_series(0, (length(text) - 1) // 200)) AS t(i)
    """,
    tags=("udf", "udtf", "llm"),
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4): one input row expands to
    many output rows inside the engine — here, fixed-width 200-char
    document chunking via ``LATERAL chunk_doc(doc_id, text)``. The
    fourth Python extension point after scalar/pandas/grouped-map:
    custom *table-valued* logic plugs into the FROM clause and
    composes with ordinary SQL around it.

    Determinism: pure string slicing and integer arithmetic. Scale:
    UDTFs run partition-parallel with no shuffle of their own (the
    lateral join is row-local); the Python-side cost profile matches a
    pandas_udf's per-batch dispatch, and the builtin-expression twin
    (llm_chunk_overlap's posexplode) remains the hot-path choice —
    this entry exists because user-defined table semantics can't
    always be expressed as builtins.
    """
    from pyspark.sql.functions import udtf

    from ..sources import register_views

    @udtf(returnType=("doc_id bigint, chunk_idx bigint, "
                      "chunk_text string, chunk_len bigint"))
    class ChunkDoc:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            width = 200
            for i in range(0, len(text), width):
                piece = text[i:i + width]
                yield doc_id, i // width, piece, len(piece)

    spark.udtf.register("chunk_doc", ChunkDoc)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.chunk_len "
        "FROM documents d, LATERAL chunk_doc(d.doc_id, d.text) AS c")
