"""Salting must change the distribution, never the answer: salted plans are
compared for exact equality against their unsalted forms on a deliberately
skewed dataset (90% of rows on one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive3_replication_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # 90% of events on user 0 — the hot-key shape that stalls one reducer
    base = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    return base


def test_salted_agg_exact(spark):
    df = _skewed_df(spark)
    salted = salted_agg(df, "k", "v", n_salts=16).toPandas()
    plain = (
        df.groupBy("k")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            F.max("v").alias("max_value"),
        )
        .toPandas()
    )
    s = salted.sort_values("k").reset_index(drop=True)
    p = plain.sort_values("k").reset_index(drop=True)
    assert s.equals(p)


def test_salted_join_exact(spark):
    fact = _skewed_df(spark)
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    salted = (
        salted_join(fact, dim, "k", n_salts=8)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.max("dim_val").alias("dv"))
        .toPandas()
    )
    plain = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.max("dim_val").alias("dv"))
        .toPandas()
    )
    assert salted.sort_values("k").reset_index(drop=True).equals(
        plain.sort_values("k").reset_index(drop=True)
    )


def test_stateful_stream_progress(spark, tmp_path):
    """applyInPandasWithState per-user progress equals the batch argmax."""
    from hive3_replication_spark.streaming.stateful import (
        run_stateful_progress_stream,
    )
    from tests.conftest import SF_DIR

    got = (
        run_stateful_progress_stream(spark, SF_DIR, str(tmp_path / "ck"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("event_id").alias("max_event_id"),
            F.max_by("value", "event_id").alias("last_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got[["user_id", "n_events", "max_event_id", "last_value"]].equals(
        expected[["user_id", "n_events", "max_event_id", "last_value"]]
    )
