"""Time-series operators (SURVEY.md §2.14): grid resampling with gap fill
and forward-fill interpolation.

The reference's event stream is consumed by replay (§2.9); an analytics
engine over the same stream also needs the classic time-series reshapes —
regularize an irregular event stream onto a fixed grid (dashboards, rate
computation, ML feature windows) and carry the last observation forward
across empty slots.

Scale design: the dense grid is generated per group with ``sequence`` +
``explode`` from that group's own [min, max] span — a narrow Generate, no
driver-side date loop, no cross join against a global calendar relation.
The grid's row count is bounded by groups × slots (time span / step), which
is independent of event count: at 100 TB of events the grid side stays
small and broadcasts; only the per-slot aggregate scans the big table, in
one key-partitioned shuffle. Forward-fill is one window pass ordered by the
grid slot (unique within a group → deterministic), using ``last(...,
ignorenulls=True)`` — no self-join, no as-of re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def _hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, hour-slot) count + decimal-exact value sum over the
    dense per-type hour grid; empty slots present with n_events = 0."""
    events = load_table(spark, sf_dir, "events")
    hours = events.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour"), "value"
    )
    counts = hours.groupBy("event_type", "hour").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )
    grid = (
        hours.groupBy("event_type")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    return grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.col("sum_value"),
    )


def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — resample to a fixed hourly grid with gap fill: every hour slot
    between each event type's first and last event exists in the output,
    zero-filled where the stream was silent."""
    return _hourly_counts(spark, sf_dir).select(
        "event_type",
        "hour",
        "n_events",
        F.round(F.coalesce(F.col("sum_value"), F.lit(0.0)), 4).alias("sum_value"),
    )


def ts_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — forward fill (LOCF) over the gap-filled grid: empty slots carry
    the most recent observed hourly value sum forward. One window pass;
    the order key (the grid hour) is unique per group, so the carry is
    deterministic on any partitioning."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _hourly_counts(spark, sf_dir).select(
        "event_type",
        "hour",
        "n_events",
        F.round(
            F.coalesce(F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)),
            4,
        ).alias("filled_value"),
    )


_GRID_CTES = """
        e AS (
            SELECT event_type,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   value
            FROM events
        ),
        c AS (
            SELECT event_type, hour, COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM e GROUP BY 1, 2
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM (SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi
                  FROM e GROUP BY 1)
        ),
        filled AS (
            SELECT g.event_type, g.hour,
                   COALESCE(c.n_events, 0) AS n_events,
                   c.sum_value
            FROM grid g
            LEFT JOIN c ON c.event_type = g.event_type AND c.hour = g.hour
        )
"""

ORACLES: dict[str, str] = {
    "ts_resample": f"""
        WITH {_GRID_CTES}
        SELECT event_type, hour, n_events,
               ROUND(COALESCE(sum_value, 0.0), 4) AS sum_value
        FROM filled
    """,
    "ts_fill_forward": f"""
        WITH {_GRID_CTES}
        SELECT event_type, hour, n_events,
               ROUND(COALESCE(
                   last_value(sum_value IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 0.0), 4) AS filled_value
        FROM filled
    """,
}

QUERY_FNS = {
    "ts_resample": ts_resample,
    "ts_fill_forward": ts_fill_forward,
}
