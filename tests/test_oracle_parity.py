"""The correctness gate, locally: every ``queries()`` entry with an
``oracle_sql()`` entry must match DuckDB exactly (row count + columns +
values) — the same comparison the verification driver runs at sf0.01.

Queries without oracles get a rows-runnable smoke check here instead.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_frames_match

import importlib.util
import sys
from pathlib import Path

_entry_path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
_spec = importlib.util.spec_from_file_location("__spark_entry__", _entry_path)
_entry = importlib.util.module_from_spec(_spec)
# setdefault (not assignment): if a driver process already imported
# __spark_entry__ under its canonical name, reuse that module object
# rather than shadowing it — otherwise the file would execute under two
# module identities in one process (harmless today since the module holds
# no mutable state, but worth not relying on).
sys.modules.setdefault("__spark_entry__", _entry)
_spec.loader.exec_module(_entry)

QUERIES = _entry.queries()
ORACLES = _entry.oracle_sql()

WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))
DANGLING = sorted(set(ORACLES) - set(QUERIES))


def test_registry_integrity():
    assert not DANGLING, f"oracles without queries: {DANGLING}"
    assert len(QUERIES) >= 60, f"operator inventory shrank: {len(QUERIES)}"


def test_survey_documents_every_key():
    """SURVEY.md §2 is the judge's checklist — every registered query key
    must appear there (and the totals line must match the registry)."""
    survey = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    missing = [k for k in QUERIES if f"`{k}`" not in survey]
    assert not missing, f"keys not documented in SURVEY.md: {missing}"
    assert f"{len(QUERIES)} registered `queries()` keys" in survey
    assert f"{len(ORACLES)} \nwith full DuckDB" in survey or (
        f"{len(ORACLES)}\nwith full DuckDB" in survey
        or f"{len(ORACLES)} with full DuckDB" in survey
    )


def test_sweep_window_pins_stalest_stamps():
    """The driver stamps the FIRST ~50 registry keys each round, so the
    front of ``_SWEEP_ORDER`` is load-bearing: it must hold exactly the
    keys with the oldest (or missing) driver CORRECTNESS stamps. This
    pins the round-11 window contents (VERDICT r10 asks #1/#3: the full
    42-key r6-stamped block — the registry's stalest — then the six
    round-11 additions, then the 2 oldest r7-stamped keys completing
    the 50) — regenerate the expectation alongside any ``_SWEEP_ORDER``
    rotation."""
    from hive3_replication_spark.registry import _SWEEP_ORDER

    window = list(_SWEEP_ORDER[:50])
    # all 42 keys whose latest driver stamp is r6 (the registry's stalest)
    r6 = {
        "win_distinct_running", "agg_dq_checks", "agg_regression",
        "llm_text_unigram_nll", "stream_event_replay", "ts_sessionize",
        "agg_count_min", "llm_knn_join", "join_bloom_prefilter",
        "ts_fill_forward", "merge_scd2", "llm_eval_confusion", "ts_ewma",
        "filter_dpp", "llm_text_keywords", "llm_dedup_graph_stats",
        "llm_dedup_spans", "llm_contamination", "llm_ann_rescore",
        "ts_funnel", "ts_anomaly_zscore", "ts_interpolate",
        "llm_dedup_embed", "stream_watermark_advance", "scan_pysource",
        "llm_eval_ranking", "llm_dedup_incremental", "fn_param_sql",
        "fn_collate", "llm_dedup_clusters", "llm_cluster_kmeans",
        "stream_stateful_progress", "llm_pipeline_e2e",
        "llm_perplexity_filter", "llm_curriculum_order",
        "join_asof_nearest", "ts_downsample_lttb",
        "sink_partition_overwrite", "llm_multimodal",
        "llm_multimodal_resize", "llm_multimodal_frames",
        "ts_seasonal_profile",
    }
    assert r6 <= set(window), sorted(r6 - set(window))
    # the six round-11 additions have no driver stamp yet — all must
    # ride this window
    new_r11 = {
        "llm_url_canonicalize", "llm_dedup_url", "llm_domain_authority",
        "ts_forecast_backtest", "llm_pack_quality", "ts_anomaly_mad",
    }
    assert new_r11 <= set(window), sorted(new_r11 - set(window))
    # the remaining 2 slots are exactly the OLDEST r7-stamped keys
    # (profiled cheapest-first order within the r7 block)
    r7_oldest = {
        "ts_downsample_lttb_hier", "scan_jdbc_partitioned",
    }
    rest = set(window) - r6 - new_r11
    assert rest == r7_oldest, sorted(rest ^ r7_oldest)
    assert len(window) == len(set(window)) == 50


def test_entry_smoke(spark):
    df = _entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"db_name", "src_wm", "tgt_wm", "status"}


@pytest.mark.parametrize("key", WITH_ORACLE)
def test_oracle_parity(spark, oracle_con, key):
    spark_pdf = QUERIES[key](spark, SF_DIR).toPandas()
    oracle_pdf = oracle_con.sql(ORACLES[key]).df()
    assert_frames_match(spark_pdf, oracle_pdf, key)


def test_no_rows_only_keys():
    """Every key carries a full DuckDB oracle as of round 3; a regression
    to a weaker rows-only check must be a failure, not a silent skip."""
    assert not ROWS_ONLY, f"keys lost their oracle: {ROWS_ONLY}"
