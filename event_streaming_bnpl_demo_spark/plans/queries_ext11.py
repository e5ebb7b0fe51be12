"""Round-7 ext11 pack: the modern Spark 4 SQL surface.

Late-round-7 pack, two themes. First, the modern Spark 4 SQL
surface — five queries pinning features a user migrating onto this
engine would reach for, each oracled so the surface's SEMANTICS (not
just its parseability) are continuously checked — plus the
URL-canonicalization dedup pass composing that surface into a real
curation operator. Second, closing analytics staples: sort-free
interpolated percentiles, a CUSUM changepoint scan, Kendall
concordance, and the count-product join rewrite:

- ``sql_pipe_syntax`` — SQL pipe syntax (``FROM t |> WHERE ... |>
  AGGREGATE ...``): the same logical plan as the classic form, so the
  oracle is the classic ANSI rendition — equivalence of the two
  syntaxes is the checked fact.
- ``sql_udf_scalar`` — a SQL-language scalar UDF (``CREATE FUNCTION
  ... RETURNS ... RETURN expr``). Catalyst INLINES the body, so the
  abstraction is free: no serialization boundary, stays inside
  whole-stage codegen — the opposite cost profile of a Python UDF,
  completing the UDF cost ladder (queries_udf.py) at its zero-cost
  end.
- ``sql_session_variables`` — ``DECLARE VARIABLE`` + ``SET VAR ... =
  (scalar subquery)``: a DATA-DERIVED session parameter driving a
  filter, the two-step workflow (compute a threshold, reuse it across
  statements) that otherwise needs driver-side collect-and-format.
- ``sql_exec_immediate`` — ``EXECUTE IMMEDIATE ... USING`` with bind
  parameters: parameterized SQL without string interpolation.
- ``scalar_collation`` — Spark 4 collations: grouping a deliberately
  case-mangled column under ``COLLATE UTF8_LCASE`` must agree with
  the oracle's explicit ``lower()`` normalization — collation
  semantics checked against an independent formulation, same doctrine
  as ``scalar_url_parse``.

- ``llm_url_dedup_canonical`` — crawl-style URL canonicalization
  (case, default port, trailing slash, tracking params, fragments)
  collapsing per-page URL variants into canonical dedup clusters,
  with cluster sizes derivable by the oracle from id arithmetic — so
  any canonicalization miss on any row fragments a cluster and fails
  the gate.

All are sub-second aggregates; determinism follows the repo doctrine
(integer cents, exact counts).

Reference parity note: the reference's query surface is two SQL
strings over its MySQL projection (main.go:214,:241); this pack is
part of the SURVEY.md §2.2 capability superset for the 100 TB tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from .catalog import register
from .queries_ext7 import _CENTS

_L_CENTS = _CENTS.format(col="l_extendedprice")


@register(
    "sql_pipe_syntax",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM({_L_CENTS}) AS BIGINT) AS rev_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag
    """,
    tags=("sql", "pipe-syntax", "surface"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipe-syntax rendition of a scan-filter-aggregate. Pipe
    operators desugar to the identical logical plan as the classic
    form, so Catalyst's pushdown/pruning/codegen all apply unchanged —
    the oracle (classic ANSI) checks that claim continuously rather
    than trusting the parser."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ext11_lineitem")
    return spark.sql(f"""
        FROM ext11_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                     CAST(SUM({_L_CENTS}) AS BIGINT) AS rev_cents
           GROUP BY l_returnflag
    """)


@register(
    "sql_udf_scalar",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                    // 100) AS BIGINT) AS whole_dollars
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("sql", "udf", "surface"),
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-language scalar UDF (exact double→cents conversion)
    declared once and reused. Catalyst inlines the body into the plan
    — the function never leaves the JVM or breaks whole-stage codegen,
    which is the entire point versus a Python UDF: SQL UDFs are the
    zero-cost end of the measured UDF ladder. DuckDB has no
    ``CREATE FUNCTION``-compatible surface here, so the oracle inlines
    the identical expression — same-answer-by-construction is exactly
    the inlining semantics being pinned."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION ext11_cents(x DOUBLE)
        RETURNS BIGINT
        RETURN CAST(FLOOR(x * 100 + 0.5) AS BIGINT)
    """)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ext11_orders")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(SUM(ext11_cents(o_totalprice) DIV 100) AS BIGINT)
                 AS whole_dollars
        FROM ext11_orders
        GROUP BY o_orderpriority
    """)


@register(
    "sql_session_variables",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_above
    FROM customer
    WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
          >= (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5)
                                   AS BIGINT)) // COUNT(*) AS BIGINT)
              FROM customer)
    GROUP BY c_mktsegment
    """,
    tags=("sql", "session-variable", "surface"),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A DATA-DERIVED session variable: the mean balance (exact
    integer cents, floor-divided) is computed once with ``SET VAR ...
    = (scalar subquery)`` and then drives a filter in a later
    statement — the compute-then-reuse workflow that otherwise forces
    a driver-side collect and string-format. The oracle inlines the
    subquery; agreement pins that variable binding captures the value,
    not the expression."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "ext11_customer")
    spark.sql("DECLARE OR REPLACE VARIABLE ext11_thr BIGINT")
    spark.sql("""
        SET VAR ext11_thr =
          (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                       DIV COUNT(*) AS BIGINT)
           FROM ext11_customer)
    """)
    return spark.sql("""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_above
        FROM ext11_customer
        WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) >= ext11_thr
        GROUP BY c_mktsegment
    """)


@register(
    "sql_exec_immediate",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
    tags=("sql", "parameterized", "surface"),
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL via ``EXECUTE IMMEDIATE ... USING``: the
    bind parameters arrive as typed values, never via string
    interpolation — the injection-safe path for templated analytics.
    The oracle runs the same statement with the constants in place."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ext11_orders_ei")
    return spark.sql("""
        EXECUTE IMMEDIATE
          'SELECT o_orderstatus,
                  CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM ext11_orders_ei
           WHERE o_orderdate >= ? AND o_orderpriority = ?
           GROUP BY o_orderstatus'
        USING TIMESTAMP '1996-01-01', '1-URGENT'
    """)


@register(
    "scalar_collation",
    oracle="""
    WITH mangled AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_type)
                  ELSE p_type END AS t
      FROM part
    )
    SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_binary,
           CAST(COUNT(DISTINCT lower(t)) AS BIGINT) AS n_ci
    FROM mangled
    """,
    tags=("scalar", "collation", "surface"),
)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: a deliberately case-mangled type column
    counted distinct under binary collation versus ``COLLATE
    UTF8_LCASE``. The oracle normalizes with an explicit ``lower()``
    instead of a collation, so the collation's equality semantics are
    checked against an independent formulation (the construction
    guarantees pure-ASCII case mangling, where UTF8_LCASE and lower()
    provably agree)."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView(
        "ext11_part")
    return spark.sql("""
        WITH mangled AS (
          SELECT p_partkey,
                 CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_type)
                      ELSE p_type END AS t
          FROM ext11_part
        )
        SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_binary,
               CAST(COUNT(DISTINCT CAST(t AS STRING COLLATE UTF8_LCASE))
                    AS BIGINT) AS n_ci
        FROM mangled
    """)


@register(
    "llm_url_dedup_canonical",
    oracle="""
    WITH clusters AS (
      SELECT doc_id // 2 AS canon_key, COUNT(*) AS csize
      FROM documents
      GROUP BY doc_id // 2
    )
    SELECT csize,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(csize) AS BIGINT) AS n_docs
    FROM clusters
    GROUP BY csize
    """,
    tags=("llm", "dedup", "url", "canonical"),
)
def llm_url_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL canonicalization → dedup: every document gets a
    crawl-style URL for the SAME logical page as its doc_id-div-2
    sibling, but mangled per doc_id%4 with the noise real crawls
    carry — uppercase host, explicit default port, trailing slash,
    utm_* tracking params, reordered query keys, a #fragment. The
    canonicalizer (lowercase host via ``parse_url HOST``, strip the
    :443 port, trim the trailing slash, keep ONLY the ``page`` query
    key via ``parse_url QUERY page``, fragment implicitly dropped)
    must collapse all four mangles to one canonical string or clusters
    FRAGMENT and the histogram shifts — the oracle derives cluster
    sizes straight from doc_id arithmetic, so any canonicalization
    miss on any row is visible. Output: cluster-size histogram of the
    canonical-URL groups. Pure narrow map + one groupBy pair — the
    pre-dedup normalization pass of a web-crawl pipeline at 100 TB.
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    page = F.expr("doc_id DIV 2")
    variant = F.col("doc_id") % 4
    url = (
        F.when(variant == 0,
               F.concat(F.lit("https://DOCS.Example.org/item?page="),
                        page.cast("string")))
        .when(variant == 1,
              F.concat(F.lit("https://docs.example.org/item/?page="),
                       page.cast("string"),
                       F.lit("&utm_source=feed&utm_campaign=x")))
        .when(variant == 2,
              F.concat(F.lit("https://docs.example.org/item"
                             "?utm_medium=social&page="),
                       page.cast("string"), F.lit("#frag")))
        .otherwise(
            F.concat(F.lit("https://docs.example.org:443/item?page="),
                     page.cast("string"))))
    canon = F.concat(
        F.regexp_replace(
            F.lower(F.parse_url(url, F.lit("HOST"))), ":?443$", ""),
        F.regexp_replace(F.parse_url(url, F.lit("PATH")), "/$", ""),
        F.lit("?page="),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")))
    clusters = (docs.select(canon.alias("canon"))
                .groupBy("canon").agg(F.count(F.lit(1)).alias("csize")))
    return (clusters.groupBy("csize")
            .agg(F.count(F.lit(1)).alias("n_clusters"),
                 F.sum("csize").alias("n_docs")))


@register(
    "join_count_product_rewrite",
    oracle="""
    WITH j AS (
      SELECT p.p_brand, COUNT(*) AS ordered_pairs
      FROM lineitem a
      JOIN lineitem b ON a.l_partkey = b.l_partkey
      JOIN part p ON p.p_partkey = a.l_partkey
      GROUP BY p.p_brand
    ), n AS (
      SELECT p.p_brand, COUNT(*) AS nrows
      FROM lineitem JOIN part p ON p.p_partkey = l_partkey
      GROUP BY p.p_brand
    )
    SELECT j.p_brand,
           CAST((j.ordered_pairs - n.nrows) // 2 AS BIGINT) AS n_pairs
    FROM j JOIN n ON j.p_brand = n.p_brand
    """,
    tags=("join", "optimizer-pattern", "rewrite", "cardinality"),
)
def join_count_product_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality-by-algebra, the ext7 optimizer-pattern genre:
    counting co-purchase line pairs per part brand NEVER materializes
    the self-join. The unordered pair count decomposes per part as
    C(c_part, 2), so the plan is one map-side-combinable groupBy
    (per-part multiplicities), a ``c*(c-1) DIV 2`` projection, a
    co-keyed join to the part dim for the brand, and a ~|parts|-row
    rollup — the shuffle carries one row per PART where the naive plan
    shuffles one row per PAIR (quadratic in per-key multiplicity; the
    exact shape that detonates on skewed keys at 100 TB). The oracle
    IS the naive self-join — it materializes every ordered pair and
    subtracts the self-pairs — so the rewrite's equivalence, including
    the choose-2 bookkeeping, is a continuously checked fact. (The
    oracle deliberately counts pairs of ROWS, not pairs of key tuples:
    this table carries duplicate (orderkey, linenumber) rows, and a
    first formulation keyed on them was caught off-by-one per brand by
    the value-multiset gate — row identity is not expressible in the
    join, but ordered-pairs-minus-selfs is.)"""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = (li.groupBy("l_partkey")
                .agg(F.count(F.lit(1)).alias("c"))
                .withColumn("pairs", F.expr("c * (c - 1) DIV 2")))
    return (per_part.join(part,
                          per_part.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum("pairs").alias("n_pairs")))



def _pcont_sql(table: str, intdiv: str) -> str:
    """ANSI PERCENTILE_CONT(p) at p = 1/4, 2/4, 3/4 over l_quantity per
    return flag, restated as the two-order-statistic formula over a
    VALUE HISTOGRAM — textually identical for both engines except the
    integer-division token (Spark ``DIV``, DuckDB ``//``). With
    0-based rank pos = (n-1)·p: k = floor(pos), g = pos − k, result =
    v[k] + g·(v[k+1] − v[k]). Here num = (n-1)·p4 (p = p4/4), so
    k = num div 4 and g = (num mod 4)/4 — exact quarter fractions, and
    l_quantity is integer-valued, so every interpolation is exact in
    binary: the twin formulas agree to the last bit."""
    ranks = []
    for lbl, p4 in (("p25", 1), ("p50", 2), ("p75", 3)):
        k = f"(((n - 1) * {p4}) {intdiv} 4)"
        g = f"((((n - 1) * {p4}) % 4) / 4.0)"
        ranks.append(
            f"MIN(CASE WHEN cum >= {k} + 1 THEN v END)"
            f" + {g} * (MIN(CASE WHEN cum >= "
            f"(CASE WHEN {k} + 2 > n THEN n ELSE {k} + 2 END)"
            f" THEN v END)"
            f" - MIN(CASE WHEN cum >= {k} + 1 THEN v END)) AS {lbl}")
    sel = ",\n           ".join(ranks)
    return f"""
    WITH hist AS (
      SELECT l_returnflag AS flag, l_quantity AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {table}
      GROUP BY l_returnflag, l_quantity
    ), cum AS (
      SELECT flag, v,
             CAST(SUM(c) OVER (PARTITION BY flag ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n
      FROM hist
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           {sel}
    FROM cum
    GROUP BY flag, n
    """


@register(
    "agg_percentile_cont",
    oracle=_pcont_sql("lineitem", "//"),
    tags=("agg", "percentile", "exact", "histogram"),
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``PERCENTILE_CONT`` (linear interpolation between the two
    bracketing order statistics) at the quartiles, computed WITHOUT a
    global sort: l_quantity takes ~50 distinct values, so the plan is
    a map-side-combinable (flag, value) histogram, a window over the
    ~150-row histogram for cumulative counts, and a conditional-MIN
    selection of the bracketing values — O(distinct values) after the
    first combine, which is THE way to take percentiles of bounded-
    domain columns at 100 TB (a global per-group sort would shuffle
    every row to one task per group). The quartile positions make
    every interpolation fraction an exact quarter and the data is
    integer-valued, so Spark and DuckDB (running the textually
    identical formula, ``DIV`` vs ``//``) agree to the last bit — no
    tolerance anywhere, per the repo's determinism doctrine."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ext11_li_pcont")
    return spark.sql(_pcont_sql("ext11_li_pcont", "DIV"))



def _cusum_sql(table: str, strtype: str) -> str:
    """CUSUM changepoint scan over daily revenue, division-free and
    exact: with n days and total T, the cumulative deviation from the
    mean, S_k = sum_{d<=k}(x_d - T/n), is scaled by n into the integer
    S'_k = n*cum_k - k*T (same argmax). Computed in DECIMAL(38,0) /
    HUGEINT so the identity survives any scale factor; the ranking
    value crosses the engine boundary as a digit string.
    ``strtype`` is the string type token (Spark ``STRING``, DuckDB
    ``VARCHAR``)."""
    dec = "DECIMAL(38,0)"
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM {table}
      GROUP BY CAST(o_orderdate AS DATE)
    ), cum AS (
      SELECT d,
             CAST(SUM(x) OVER (ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS {dec}) AS cx,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS {dec}) AS k,
             CAST(COUNT(*) OVER () AS {dec}) AS n,
             CAST(SUM(x) OVER () AS {dec}) AS t
      FROM daily
    )
    SELECT * FROM (
      SELECT CAST(d AS {strtype}) AS d,
             CAST(n * cx - k * t AS {strtype}) AS s_scaled
      FROM cum
      ORDER BY CASE WHEN n * cx - k * t < 0
                    THEN -(n * cx - k * t)
                    ELSE n * cx - k * t END DESC,
               d
      LIMIT 5
    ) z
    """


@register(
    "ts_changepoint_cusum",
    oracle=_cusum_sql("orders", "VARCHAR").replace(
        "CAST(d AS VARCHAR)", "strftime(d, '%Y-%m-%d')"),
    tags=("ts", "changepoint", "cusum", "exact"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily revenue: the day k
    maximizing |sum_{d<=k}(x_d − mean)| is where the series' level
    most plausibly shifted (the classic offline CUSUM statistic).
    Division-free per the repo doctrine: the deviation sum is scaled
    by n into the exact integer ``n·cum_k − k·T`` (same argmax), and
    because n·cum can exceed BIGINT at extreme scale the arithmetic
    runs in DECIMAL(38,0) vs DuckDB HUGEINT with the statistic
    crossing the engine boundary as a DIGIT STRING — the
    agg_linear_trend treatment applied to a windowed scan. One daily
    rollup (map-side combinable), one ordered window over ~|calendar|
    rows: the heavy stage touches each fact row once.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ext11_orders_cusum")
    return spark.sql(_cusum_sql("ext11_orders_cusum", "STRING").replace(
        "CAST(d AS STRING)", "date_format(d, 'yyyy-MM-dd')"))



def _kendall_sql(orders: str, customer: str) -> str:
    """Kendall concordance of (order date, order value) per nation —
    one shared SQL text for both engines: integer cents, exact
    classification, no division anywhere."""
    cents_a = "CAST(FLOOR(a.o_totalprice * 100 + 0.5) AS BIGINT)"
    cents_b = "CAST(FLOOR(b.o_totalprice * 100 + 0.5) AS BIGINT)"
    return f"""
    WITH pairs AS (
      SELECT c.c_nationkey AS nation,
             CASE
               WHEN (a.o_orderdate < b.o_orderdate
                     AND {cents_a} < {cents_b})
                 OR (a.o_orderdate > b.o_orderdate
                     AND {cents_a} > {cents_b}) THEN 1
               WHEN (a.o_orderdate < b.o_orderdate
                     AND {cents_a} > {cents_b})
                 OR (a.o_orderdate > b.o_orderdate
                     AND {cents_a} < {cents_b}) THEN -1
               ELSE 0
             END AS sgn
      FROM {orders} a
      JOIN {orders} b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      JOIN {customer} c ON c.c_custkey = a.o_custkey
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS concordant,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS discordant,
           CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS ties,
           CAST(SUM(sgn) AS BIGINT) AS tau_num
    FROM pairs
    GROUP BY nation
    """


@register(
    "agg_kendall_concordance",
    oracle=_kendall_sql("orders", "customer"),
    tags=("agg", "rank-statistics", "kendall", "exact"),
)
def agg_kendall_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall concordance (the tau numerator C − D, plus the C/D/tie
    census) of order DATE vs order VALUE within each customer's
    purchase history, aggregated per nation — the rank-correlation
    complement to the catalog's Pearson tier (``agg_stats_corr``),
    exact by construction: pair classification is integer-cents
    comparison, the statistic is a signed count, and no division or
    sqrt appears (tau's denominator is derivable downstream if
    wanted). The pair expansion is BOUNDED: pairs join on the customer
    key (co-partitioned equi-join, never all-pairs) and each customer
    contributes C(orders, 2) with per-customer order counts bounded by
    the calendar — the same bounded-block family as
    ``join_fuzzy_blocked`` and ``graph_triangle_count``. Spark and the
    oracle run the IDENTICAL SQL text (engine-neutral by
    construction), so the check pins the engine's join/aggregate
    semantics on a non-trivial three-way shape.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ext11_orders_kt")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "ext11_customer_kt")
    return spark.sql(_kendall_sql("ext11_orders_kt", "ext11_customer_kt"))



@register(
    "llm_multimodal_dedup",
    oracle="""
    WITH s AS (
      SELECT doc_id FROM documents WHERE doc_id % 10 = 0
    ), c AS (
      SELECT doc_id // 20 AS g,
             COUNT(*) AS csize,
             COUNT(DISTINCT doc_id) AS npayload
      FROM s GROUP BY doc_id // 20
    )
    SELECT CAST(csize AS BIGINT) AS csize,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(csize) AS BIGINT) AS n_docs,
           CAST(SUM(npayload) AS BIGINT) AS n_distinct_payloads
    FROM c GROUP BY csize
    """,
    tags=("llm", "multimodal", "dedup", "content-hash"),
)
def llm_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-content image dedup — the multimodal member of the
    dedup family: sampled documents get REAL PPM(P6) images whose
    PIXELS are identical within a sibling pair (parameterized by
    ``doc_id DIV 20``) while their container BYTES all differ (a
    per-document PPM comment line in the header). Byte-exact dedup
    (``llm_dedup_exact``'s move) therefore finds NOTHING — the
    operator must decode through the container and hash the pixel
    content to collapse the pairs, which is the actual shape of
    image dedup in a crawl pipeline (same JPEG re-encoded with
    different metadata). Decode + content hash run entirely in an
    Arrow-batched ``mapInPandas`` stage with a comment-tolerant P6
    header parse. The oracle derives the cluster-size histogram AND
    the per-cluster distinct-payload count from id arithmetic — an
    operator that over-merges, under-merges (decode bug), or a
    synthesis that accidentally equalizes bytes each breaks a
    different output column.

    Cross-group content collisions are impossible in domain: two
    groups share pixels only if g coincides mod 377 (dims), mod 256
    (green level), and mod w (stripe column) — CRT floor ~96512
    groups, i.e. ~1.9M sampled documents, documented the same way as
    the prefix filter's asymptote.

    Scale: payload bytes never leave the executors; the driver sees
    only (content-hash, byte-hash) pairs; the dedup itself is one
    groupBy on the content hash — the image-corpus shape of
    llm_dedup_exact.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql import functions as F

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0).select("doc_id"))

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = {"asset_id": [], "ahash": [], "sha": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d // 20
                w = 8 + (g % 29) * 2
                h = 6 + (g % 13) * 2
                y, x = np.mgrid[0:h, 0:w]
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[..., 0] = np.where((x + y) % 2 == 0, 200, 100)
                arr[..., 1] = (g * 7) % 256
                arr[..., 2] = (2 * x).astype(np.uint8)
                arr[:, g % w, 2] = 255          # position-coded stripe
                payload = (b"P6\n# v%d\n%d %d\n255\n"
                           % (d, w, h)) + arr.tobytes()
                # decode: comment-tolerant P6 parse, from the BYTES
                parts, idx = [], 3
                while len(parts) < 3:
                    nl = payload.index(b"\n", idx)
                    line = payload[idx:nl]
                    idx = nl + 1
                    if not line.startswith(b"#"):
                        parts.extend(line.split())
                dw, dh = int(parts[0]), int(parts[1])
                px = payload[idx:]
                content = hashlib.sha256(
                    b"%dx%d:" % (dw, dh) + px).hexdigest()
                rows["asset_id"].append(d)
                rows["ahash"].append(content)
                rows["sha"].append(
                    hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(rows)

    hashed = docs.mapInPandas(
        run, schema="asset_id long, ahash string, sha string")
    clusters = (hashed.groupBy("ahash")
                .agg(F.count(F.lit(1)).alias("csize"),
                     F.countDistinct("sha").alias("npayload")))
    return (clusters.groupBy("csize")
            .agg(F.count(F.lit(1)).alias("n_clusters"),
                 F.sum("csize").alias("n_docs"),
                 F.sum("npayload").alias("n_distinct_payloads")))



@register(
    "sql_table_function",
    oracle="""
    SELECT o_orderpriority,
           CAST(4 * COUNT(*) AS BIGINT) AS n_installments,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 4
                    + CASE WHEN CAST(FLOOR(o_totalprice * 100 + 0.5)
                                     AS BIGINT) % 4 > 0
                           THEN 1 ELSE 0 END)
                AS BIGINT) AS first_installment_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("sql", "table-function", "surface", "bnpl"),
)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-language TABLE function (``CREATE FUNCTION ... RETURNS
    TABLE``) applied via correlated LATERAL — the declarative sibling
    of the Python UDTF (``udf_python_udtf``), completing the
    user-defined-function matrix: scalar/table x Python/SQL. The
    function is the reference domain's core arithmetic — split a
    purchase into n installments with the remainder distributed one
    cent at a time to the earliest installments, so every order's
    installments sum EXACTLY to its total (the invariant the oracle's
    ``SUM(total_cents)`` column checks corpus-wide) and the first
    installment carries ``total DIV n + (1 if total mod n > 0)`` (the
    column that breaks if the remainder logic is wrong). Like the SQL
    scalar UDF, the body inlines into the plan: the LATERAL explode
    stays JVM-side, whole-stage-codegen, no serialization boundary.
    """
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION ext11_installments(
            total BIGINT, n INT)
        RETURNS TABLE (i INT, amount BIGINT)
        RETURN SELECT pos + 1 AS i,
               total DIV n
                 + CASE WHEN pos < total % n THEN 1 ELSE 0 END AS amount
        FROM (SELECT explode(sequence(0, n - 1)) AS pos)
    """)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ext11_orders_tvf")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_installments,
               CAST(SUM(t.amount) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN t.i = 1 THEN t.amount ELSE 0 END)
                    AS BIGINT) AS first_installment_cents
        FROM ext11_orders_tvf,
             LATERAL ext11_installments(
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT), 4) t
        GROUP BY o_orderpriority
    """)



def _acf_sql(table: str, dateadd: str, strtype: str) -> str:
    """Lag-k autocovariance numerators of daily revenue, k = 1..7,
    division-free: with n days and total T, the mean-centered product
    (x_a − T/n)(x_b − T/n) is scaled by n² into the exact integer
    (n·x_a − T)(n·x_b − T), accumulated in DECIMAL(38,0)/HUGEINT and
    emitted as a digit string. The lag is CALENDAR days (join on
    d + k), not row offset — gap-safe, the ``ts_yoy_growth`` rule.
    ``dateadd`` is the d-plus-k expression (Spark ``date_add(a.d, k)``,
    DuckDB ``a.d + k``); ``strtype`` the string type token."""
    dec = "DECIMAL(38,0)"
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM {table}
      GROUP BY CAST(o_orderdate AS DATE)
    ), stats AS (
      SELECT d, CAST(x AS {dec}) AS x,
             CAST(COUNT(*) OVER () AS {dec}) AS n,
             CAST(SUM(x) OVER () AS {dec}) AS t
      FROM daily
    ), lags AS (
      SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3
      UNION ALL SELECT 4 UNION ALL SELECT 5
      UNION ALL SELECT 6 UNION ALL SELECT 7
    )
    SELECT CAST(lags.k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM((a.n * a.x - a.t) * (b.n * b.x - b.t))
                AS {strtype}) AS num_str
    FROM stats a
    JOIN lags ON 1 = 1
    JOIN stats b ON b.d = {dateadd}
    GROUP BY lags.k
    """


@register(
    "ts_autocorr_lags",
    oracle=_acf_sql("orders", "a.d + lags.k", "VARCHAR"),
    tags=("ts", "autocorrelation", "exact"),
)
def ts_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation structure of daily revenue at calendar lags
    1..7 — the ACF diagnostic behind every seasonality decision (its
    lag-7 spike is what justifies ``ts_dow_seasonal``'s weekly
    profile). Exact per the repo doctrine: the mean-centered product
    is scaled by n² into the integer ``(n·x_a − T)(n·x_b − T)``,
    accumulated in DECIMAL(38,0) vs DuckDB HUGEINT, and the numerator
    crosses the engine boundary as a DIGIT STRING (normalizing to the
    actual autocorrelation is one double division downstream). Lags
    join on CALENDAR day d+k — a missing day drops the pair rather
    than sliding the comparison (the gap-safe rule of
    ``ts_yoy_growth``). Plan shape: one map-side-combinable daily
    rollup, window-marginalized n/T over the tiny daily relation, a
    7-row lag spine, and one co-keyed self-join on date arithmetic.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ext11_orders_acf")
    return spark.sql(_acf_sql("ext11_orders_acf",
                              "date_add(a.d, lags.k)", "STRING"))



@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT event_id AS view_id, user_id, ts AS v_ts
      FROM events WHERE event_type = 'view'
    ), cand AS (
      SELECT p.purchase_id, p.user_id, v.view_id, p.p_ts, v.v_ts,
             ROW_NUMBER() OVER (
               PARTITION BY p.purchase_id
               ORDER BY ABS(date_diff('microsecond', v.v_ts, p.p_ts)),
                        CASE WHEN v.v_ts <= p.p_ts THEN 0 ELSE 1 END,
                        CASE WHEN v.v_ts <= p.p_ts THEN -v.view_id
                             ELSE v.view_id END
             ) AS rn
      FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT purchase_id, user_id, view_id,
           CAST(date_diff('second', v_ts, p_ts) AS BIGINT)
             AS seconds_offset
    FROM cand WHERE rn = 1
    """,
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction="nearest"`` — each purchase matched to
    the temporally CLOSEST view by the same user, before or after,
    equal distances breaking to the prior view. Completes the as-of
    direction set (backward ``join_asof``, forward
    ``join_asof_forward``, tolerance ``join_asof_tolerance``) to full
    pandas ``merge_asof`` parity. The operator computes both
    directional candidates from ONE exchange (two Windows over the
    same user partitioning — the second direction costs a
    per-partition sort, not a shuffle) and picks per row; the oracle
    is the quadratic candidate rank over every (purchase, view) pair
    with the side-specific tie structs spelled out — backward keeps
    the field-wise MAX struct, forward the MIN, so the ROW_NUMBER
    tiebreak encodes sign-flipped view ids per side.
    """
    from pyspark.sql import functions as F

    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"))
    merged = asof_join(p, v, on="user_id", left_ts="p_ts",
                       right_ts="v_ts", right_cols=["view_id", "v_ts"],
                       direction="nearest")
    return (merged.filter(F.col("view_id").isNotNull())
            .select("purchase_id", "user_id", "view_id",
                    (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"))
                    .cast("bigint").alias("seconds_offset")))


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER (
             PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
    FROM customer
    """,
    tags=("window", "ntile"),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) — equal-height bucketing of customers by balance
    within segment, the one distribution window function the window
    tier had not yet pinned (percent_rank/cume_dist/nth_value live in
    ``window_distribution``). Both engines implement the ANSI rule —
    earlier buckets absorb the remainder rows — and the (balance DESC,
    custkey) total order makes every assignment deterministic, so the
    check is exact with no rounding anywhere."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select("c_custkey", "c_mktsegment",
                    F.ntile(4).over(w).cast("int").alias("quartile"))
