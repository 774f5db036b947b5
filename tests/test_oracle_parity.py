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
    pins the round-10 window contents (VERDICT r9 ask #2: the 36
    remaining r4-stamped keys, then the five round-10 additions, then
    llm_rank_fusion — r9-stamped but changed by the NULL-sentinel fix —
    then the 8 oldest r6-stamped keys) — regenerate the expectation
    alongside any ``_SWEEP_ORDER`` rotation."""
    from hive3_replication_spark.registry import _SWEEP_ORDER

    window = list(_SWEEP_ORDER[:50])
    # all 36 keys whose latest driver stamp is r4 (the registry's stalest)
    r4 = {
        "sql_shipmode_priority", "sql_small_quantity_revenue",
        "sql_top_supplier", "sql_returned_items", "sql_order_priority",
        "sql_inactive_customer_balance", "sql_waiting_supplier",
        "sql_shipping_priority", "sql_parts_supplier_count",
        "sql_product_profit", "sql_customer_distribution",
        "sql_nation_volume", "sql_large_volume_customer",
        "sql_market_share", "sql_local_supplier_volume",
        "sql_recursive_hierarchy", "win_first_value", "win_ntile",
        "llm_text_repetition", "llm_shard_assign", "udf_arrow", "ts_ohlc",
        "llm_text_bigrams", "ts_resample", "set_intersect",
        "ts_rollup_hypertable", "scan_xml", "join_range",
        "join_skew_salted", "agg_corr", "scan_binaryfile",
        "llm_embed_quantize", "fn_crypto_roundtrip",
        "llm_sample_temperature", "udf_grouped_agg", "llm_mix_sources",
    }
    assert r4 <= set(window), sorted(r4 - set(window))
    # the five round-10 additions have no driver stamp yet, and
    # llm_rank_fusion's engine+oracle changed (0 → NULL absent-arm rank
    # sentinel) — all six must ride this window
    new_r10 = {
        "ts_holt_winters", "llm_line_boilerplate", "llm_eval_ndcg",
        "llm_mmr_rerank", "llm_eval_calibration", "llm_rank_fusion",
    }
    assert new_r10 <= set(window), sorted(new_r10 - set(window))
    # the remaining 8 slots are exactly the OLDEST r6-stamped keys
    # (profiled cheapest-first order within the r6 block)
    r6_oldest = {
        "llm_similarity_topk", "llm_text_entropy", "udf_table_udtf",
        "ts_retention_cohort", "udf_table", "llm_doc_embed_hash",
        "scan_schema_evolution", "llm_vocab_coverage",
    }
    rest = set(window) - r4 - new_r10
    assert rest == r6_oldest, sorted(rest ^ r6_oldest)
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
