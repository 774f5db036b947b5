"""Shared fixtures: one SparkSession per test run, DuckDB oracle connections,
and the result-comparison helper that mirrors the verification driver
(row-count + schema-width + order-insensitive value compare).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from hive3_replication_spark.catalog import TABLES
from hive3_replication_spark.session import get_spark

SF_DIR = os.environ.get("H3R_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    if os.environ.get("H3R_PLAIN_SESSION"):
        # driver-simulation mode: a bare session exactly like the external
        # verification driver's — engine confs must be injected at runtime
        # by catalog.load_table, or these tests fail
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("h3r-tests-plain")
            .master(f"local[{os.environ.get('H3R_TEST_CPUS', '4')}]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(
            app_name="h3r-tests",
            master=f"local[{os.environ.get('H3R_TEST_CPUS', '4')}]",
            shuffle_partitions=8,
        )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, dtype-normalized, row-sorted frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            # decimals (from DuckDB HUGEINT etc.) → float64 fallback
            if len(s) and all(
                isinstance(v, (int, float)) or v is None for v in s.dropna()
            ):
                try:
                    df[c] = pd.to_numeric(s)
                except (ValueError, TypeError):
                    pass
    sort_cols = list(df.columns)
    if sort_cols:
        df = df.sort_values(sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str):
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert len(a) == len(b), (
        f"{key}: row count mismatch spark={len(a)} oracle={len(b)}"
    )
    assert list(a.columns) == list(b.columns), (
        f"{key}: columns mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = (
                (av.isna() & bv.isna())
                | (av == bv)
                | (np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            )
        else:
            ok = (av.isna() & bv.isna()) | (av == bv)
        bad = ~ok
        assert not bad.any(), (
            f"{key}: column {c!r} differs in {int(bad.sum())}/{len(a)} rows; "
            f"first diffs:\n"
            f"spark : {av[bad].head(5).tolist()}\n"
            f"oracle: {bv[bad].head(5).tolist()}"
        )
