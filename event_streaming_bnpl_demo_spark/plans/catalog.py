"""Query catalog — the engine's declared operator surface.

Every operator from SURVEY.md §2.2 is registered here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
a DuckDB oracle SQL string over the same parquet tables. The driver's
correctness harness consumes exactly this mapping through
``__spark_entry__.py``.

Contract invariants enforced by construction:

- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- double-valued aggregates use the deterministic ``dsum``/``davg``
  idioms from :mod:`.sqlcompat` so Spark and DuckDB produce bit-equal
  float64, independent of partition-level summation order;
- timestamps cross the comparison boundary as dates or formatted
  strings, never raw engine-local timestamp objects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None          # DuckDB SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Catalog iteration order. The driver's correctness harness budgets ~50
# queries per round, taken in dict order — so the first tier is pinned
# to cover every SURVEY.md §2 operator family at least once (ref pack,
# sources, every join shape incl. TPC-H topologies, agg/grouping/stats,
# windows, set ops, scalars, streaming, the full LLM pack, UDF surface).
# Queries beyond the tier run only if budget remains, ordered so that
# names without a previous driver-side CORRECTNESS row come first and
# coverage widens round over round.
_PRIORITY: tuple[str, ...] = (
    # flagship + reference operators (SURVEY §2.1 R1–R15)
    "q1_pricing_summary",
    "ref_filter_project", "ref_type_router", "ref_purchase_to_promise",
    "ref_lastwin_state", "ref_event_log",
    # sources (file formats, streaming replay, custom Python DataSource)
    "source_json_scan", "source_stream_replay", "source_python_datasource",
    # joins: every shape. Where a COVERAGE row has an r01-green sibling,
    # the never-driver-checked sibling holds the slot (cross for
    # semi/anti/cross, right-outer for the outer row) so cumulative
    # driver-green coverage grows while every row stays green this round.
    "join_right_outer", "join_cross_small", "join_salted_skew",
    "q5_region_revenue", "join_range_theta", "join_asof",
    "join_interval_op", "join_interval_outer",
    # TPC-H join topologies (correlated scalar subquery, double-
    # correlated EXISTS self-joins — the two hardest shapes)
    "q17_small_qty_revenue", "q21_waiting_suppliers",
    # aggregation / grouping sets / stats
    "agg_distinct", "agg_grouping_sets", "agg_stats_moments",
    # analytic windows: ranking, lag/lead, frames; top-k
    "window_rank", "window_lag_lead", "window_range_interval",
    "topk_per_group",
    # set ops
    "set_except_all",
    # scalar packs (string + date also witness ref R14/R15), maps,
    # subqueries, recursive CTE
    "scalar_string", "scalar_date", "map_ops",
    "scalar_subquery", "sql_recursive_cte",
    # streaming
    "stream_session_window", "stream_dedup_keys", "stream_static_join",
    # LLM-data pack: dedup tiers, similarity tiers, text, assembly
    "llm_dedup_exact", "llm_dedup_minhash", "llm_dedup_components",
    "llm_dedup_apply", "llm_dedup_simhash", "llm_dedup_ngram_jaccard_capped",
    "llm_dedup_embedding_banded", "llm_simsearch_ivf",
    "llm_text_quality", "llm_tfidf_top_terms",
    "llm_pack_sequences", "llm_multimodal_meta", "llm_multimodal_audio",
    # UDF surface (pandas UDF + cogrouped applyInPandas)
    "udf_pandas_tokens", "udf_cogrouped_asof",
)

# Second tier: the most valuable never-driver-checked queries, in the
# order extra budget should reach them (TPC-H topologies first — the
# hardest join shapes — then the assembly/stats/text tails).
_PRIORITY2: tuple[str, ...] = (
    "q2_min_cost_supply", "q4_priority_late_ship", "q9_product_type_profit",
    "q11_important_parts", "q12_ship_lateness", "q16_supplier_diversity",
    "q20_heavy_promo_suppliers",
    "q7_nation_volume", "q8_market_share", "q13_order_distribution",
    "q15_top_supplier", "q18_large_volume", "q19_disjunctive_join",
    "q22_idle_balances",
    "q3_shipping_priority", "q6_forecast_revenue", "q10_returned_items",
    "q14_promo_share", "join_snowflake_dims",
    "agg_median_exact", "agg_minmax_by", "agg_stats_corr",
    "subquery_exists", "join_lateral", "json_variant",
    "llm_decontaminate", "llm_sample_stratified", "llm_split_train_eval",
    "llm_simsearch_batch", "udf_pandas_cosine", "udf_grouped_demean",
    "llm_curation_pipeline", "llm_chunk_overlap", "llm_ngram_stats",
    "llm_prefix_boilerplate",
    "events_funnel", "events_retention_cohorts", "events_attribution",
)

# Names with a driver-side green row in CORRECTNESS_r01.json — these
# yield the tail of the iteration order to queries the driver has never
# checked, so leftover budget extends coverage instead of repeating it.
_DRIVER_CHECKED: frozenset[str] = frozenset({
    "q1_pricing_summary", "agg_group_basic", "agg_distinct", "agg_rollup",
    "agg_cube", "join_inner", "join_left_outer", "join_full_outer",
    "join_semi", "join_anti", "q5_region_revenue", "join_range_theta",
    "join_asof", "topk_global", "topk_per_group", "set_union_distinct",
    "set_intersect", "set_except", "set_dropdup", "scalar_string",
    "scalar_date", "scalar_math", "scalar_conditional", "json_extract",
    "array_ops", "ref_filter_project", "ref_type_router",
    "ref_purchase_to_promise", "ref_lastwin_state", "ref_event_log",
    "window_rank", "window_lag_lead", "window_running_total",
    "window_sliding_frame", "stream_tumbling_window",
    "stream_sliding_window", "stream_session_window", "stream_dedup_keys",
    "agg_approx_distinct", "stream_static_join", "llm_dedup_exact",
    "llm_dedup_minhash", "llm_dedup_components", "llm_dedup_apply",
    "llm_dedup_simhash", "llm_dedup_ngram_jaccard", "llm_dedup_embedding",
    "llm_simsearch_topk", "llm_simsearch_lsh", "llm_text_winnow",
})


def _ordered_names() -> list[str]:
    prio = [n for n in _PRIORITY if n in _REGISTRY]
    seen = set(prio)
    prio2 = [n for n in _PRIORITY2 if n in _REGISTRY and n not in seen]
    seen.update(prio2)
    fresh = [n for n in _REGISTRY if n not in seen and n not in _DRIVER_CHECKED]
    rerun = [n for n in _REGISTRY if n not in seen and n in _DRIVER_CHECKED]
    return prio + prio2 + fresh + rerun


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the catalog."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags,
                                doc=(fn.__doc__ or "").strip())
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    _load()
    return {name: _REGISTRY[name] for name in _ordered_names()}


def queries() -> dict[str, QueryFn]:
    """name -> callable, in the driver's expected shape (wraps each call
    with session tuning so runtime confs hold on driver-owned sessions)."""
    from ..session import tune

    def wrap(q: Query) -> QueryFn:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return q.fn(spark, sf_dir)
        run.__name__ = q.name
        run.__doc__ = q.doc
        return run

    return {name: wrap(q) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """name -> DuckDB SQL, omitting rows-only queries."""
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}


_LOADED = False


def _load() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries_core      # noqa: F401
    from . import queries_ref       # noqa: F401
    from . import queries_window    # noqa: F401
    from . import queries_stream    # noqa: F401
    from . import queries_llm       # noqa: F401
    from . import queries_llm2      # noqa: F401
    from . import queries_events    # noqa: F401
    from . import queries_ext       # noqa: F401
    from . import queries_ext2      # noqa: F401
    from . import queries_tpch      # noqa: F401
    from . import queries_ext3      # noqa: F401
    from . import queries_stats     # noqa: F401
    from . import queries_udf       # noqa: F401
    _LOADED = True
