"""Sink operators (SURVEY.md §2.1, S3/S4/S7/S8): snapshot dump/load as
queries, the append log sink, and the distributed parallel copy.

Side-effecting queries write under a per-process temp dir and return the
verifiable summary DataFrame; the real pipeline entry points live in
``repl/snapshot.py``.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..repl.model import ReplConfig
from ..repl.snapshot import bootstrap_dump, bootstrap_load
from ..session import ensure_engine_confs
from ..util import rows_df, scratch_dir

#: Managed tables included in a default dump (external excluded, env.sh:8)
#: plus the events stream (the replication transport).
_SNAPSHOT_TABLES = (
    "customer",
    "events",
    "lineitem",
    "nation",
    "orders",
    "part",
    "region",
    "supplier",
)


def _tmp_cfg(sf_dir: str, tag: str) -> tuple[ReplConfig, str, str]:
    root = scratch_dir(prefix=f"h3r_{tag}_")
    cfg = ReplConfig(
        db_name="repltest",
        source_root=sf_dir,
        target_root=f"{root}/target",
        repl_root=f"{root}/repl",
    )
    return cfg, f"{root}/run", f"{root}/watermarks"


def snapshot_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — full-db bootstrap dump (``HQL/replbootstrap.hql:3``): actually
    writes the snapshot + manifest to a temp dump root, then returns the
    per-table manifest (row counts at the consistent cut + DUMP_TXID) for
    oracle verification."""
    ensure_engine_confs(spark)
    cfg, run_dir, _ = _tmp_cfg(sf_dir, "dump")
    result = bootstrap_dump(spark, cfg, run_dir)

    from ..repl.snapshot import parquet_row_count

    rows = [
        (t, parquet_row_count(f"{result['dump_path']}/{t}"), result["dump_txid"])
        for t in result["tables"]
    ]
    return rows_df(
        spark, "table_name string, row_count bigint, dump_txid bigint", rows
    )


def snapshot_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — bootstrap load (``HQL/replload.hql:5``): dump + load to a temp
    target, then report loaded row counts and the advanced watermark."""
    ensure_engine_confs(spark)
    cfg, run_dir, wm_dir = _tmp_cfg(sf_dir, "load")
    dump = bootstrap_dump(spark, cfg, run_dir)
    loaded = bootstrap_load(spark, cfg, dump["dump_path"], wm_dir)
    rows = [
        (t, n, loaded["dump_txid"]) for t, n in sorted(loaded["tables_loaded"].items())
    ]
    return rows_df(
        spark, "table_name string, row_count bigint, post_load_id bigint", rows
    )


def log_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — append-mode run log (``misc_functions.sh:16-18``: timestamped
    lines tee'd to console+file): two appends, then read back the level
    counts. Rows-only check (timestamps are wall-clock)."""
    ensure_engine_confs(spark)
    log_dir = scratch_dir(prefix="h3r_log_") + "/runlog"
    for batch, level in ((1, "INFO"), (2, "ERROR")):
        rows = rows_df(
            spark,
            "batch int, level string, message string",
            [(batch, level, f"message {i}") for i in range(5)],
        ).withColumn("log_ts", F.current_timestamp())
        rows.coalesce(1).write.mode("append").parquet(log_dir)
    return (
        spark.read.parquet(log_dir)
        .groupBy("level")
        .agg(F.count("*").alias("n_lines"))
    )


def parallel_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — distributed parallel copy: the reference shells out to distcp
    with 500 copy tasks (``HQL/replextload.hql:5-11``); in Spark the copy IS
    a distributed job — parallelism = input splits on read, repartition
    controls writer fan-out. Rows-only check (file layout is env-specific).
    """
    ensure_engine_confs(spark)
    out = scratch_dir(prefix="h3r_copy_") + "/lineitem_copy"
    src = load_table(spark, sf_dir, "lineitem")
    # 8-way writer fan-out stands in for hive.repl.parallel.copy.tasks=500
    src.repartition(8).write.mode("overwrite").parquet(out)
    copied = spark.read.parquet(out)
    return rows_df(
        spark,
        "src_rows bigint, copied_rows bigint",
        [(src.count(), copied.count())],
    )


def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 — DYNAMIC partition overwrite, the partition-level restatement
    write every warehouse pipeline needs (the Spark analogue of Hive's
    ``INSERT OVERWRITE`` with dynamic partitions — the reference's
    replication operates on exactly these Hive partition semantics): land
    the event stream partitioned by day, then re-publish a CORRECTED feed
    for the latest day only (the error rows dropped — a typical
    restatement). With ``partitionOverwriteMode=dynamic`` the overwrite
    replaces ONLY the partitions present in the incoming frame; every
    other day's directory must survive byte-for-byte. The read-back
    per-day profile is the verification: untouched days keep their error
    counts, the restated day has zero — under STATIC overwrite semantics
    (the default) the write would wipe the whole table and the oracle
    comparison would fail on every prior day.

    Scale: this is the idiomatic incremental-publish pattern at 100 TB —
    the write touches O(restated partitions), never the table, and
    readers see partition-atomic swaps."""
    ensure_engine_confs(spark)
    events = load_table(spark, sf_dir, "events")
    staged = events.select(
        F.col("ts").cast("timestamp").cast("date").alias("event_date"),
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("vdec"),
    )
    out = scratch_dir(prefix="h3r_dynover_") + "/events_by_day"
    staged.write.partitionBy("event_date").parquet(out)
    last_day = staged.agg(F.max("event_date")).collect()[0][0]
    if last_day is None:
        # Source table is empty: nothing was landed (partitionBy on an
        # empty frame writes no partition dirs), so a read-back of `out`
        # would fail schema inference. The restated feed is trivially
        # empty — return the summary shape directly.
        return rows_df(
            spark,
            "event_date string, n_rows bigint, "
            "n_errors bigint, sum_value double",
            [],
        )
    restated = staged.filter(
        (F.col("event_date") == F.lit(last_day))
        & (F.col("event_type") != "error")
    )
    if restated.isEmpty():
        # Every last-day event was an error: the restatement is EMPTY, and
        # dynamic overwrite replaces only partitions PRESENT in the incoming
        # frame — an empty frame matches none, so the stale partition (error
        # rows included) would silently survive. Hive's INSERT OVERWRITE
        # with a static partition spec truncates the partition in this case;
        # mirror that with a static, path-targeted overwrite of the ONE
        # partition directory (the classic overwrite-by-partition-path
        # pattern — supported API, works under Spark Connect, no raw FS
        # access). The empty write still leaves a metadata-only parquet
        # footer in the dir (SPARK-23271), so even when this was the
        # table's only partition the read-back below can infer the schema
        # instead of throwing UNABLE_TO_INFER_SCHEMA.
        restated.drop("event_date").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/event_date={last_day}")
    else:
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "STATIC"
        )
        try:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            restated.write.mode("overwrite").partitionBy(
                "event_date"
            ).parquet(out)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(out)
        .groupBy("event_date")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("event_type") == "error").cast("int")).alias(
                "n_errors"
            ),
            F.sum("vdec").cast("double").alias("sum_value"),
        )
        .select(
            F.col("event_date").cast("string").alias("event_date"),
            "n_rows",
            F.col("n_errors").cast("long").alias("n_errors"),
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


ORACLES: dict[str, str] = {
    "sink_partition_overwrite": """
        WITH base AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
                   event_type, CAST(value AS DECIMAL(18,4)) AS vdec
            FROM events
        ),
        mx AS (SELECT MAX(event_date) AS last_d FROM base),
        final AS (
            SELECT b.* FROM base b, mx WHERE b.event_date < mx.last_d
            UNION ALL
            SELECT b.* FROM base b, mx
            WHERE b.event_date = mx.last_d AND b.event_type <> 'error'
        )
        SELECT CAST(event_date AS VARCHAR) AS event_date,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors,
               ROUND(CAST(SUM(vdec) AS DOUBLE), 4) AS sum_value
        FROM final GROUP BY event_date
    """,
    "snapshot_dump": """
        SELECT * FROM (
            SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
            UNION ALL SELECT 'events', COUNT(*) FROM events
            UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
            UNION ALL SELECT 'nation', COUNT(*) FROM nation
            UNION ALL SELECT 'orders', COUNT(*) FROM orders
            UNION ALL SELECT 'part', COUNT(*) FROM part
            UNION ALL SELECT 'region', COUNT(*) FROM region
            UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        ) t CROSS JOIN (SELECT MAX(event_id) AS dump_txid FROM events) w
    """,
    "snapshot_load": """
        SELECT * FROM (
            SELECT 'customer' AS table_name, COUNT(*) AS row_count FROM customer
            UNION ALL SELECT 'events', COUNT(*) FROM events
            UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
            UNION ALL SELECT 'nation', COUNT(*) FROM nation
            UNION ALL SELECT 'orders', COUNT(*) FROM orders
            UNION ALL SELECT 'part', COUNT(*) FROM part
            UNION ALL SELECT 'region', COUNT(*) FROM region
            UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        ) t CROSS JOIN (SELECT MAX(event_id) AS post_load_id FROM events) w
    """,
    # the read-back level counts and copy row counts are deterministic, so
    # both sinks verify against golden/derived oracles (the wall-clock
    # timestamp column is excluded from the returned relation)
    "log_append": """
        SELECT level, CAST(n_lines AS BIGINT) AS n_lines
        FROM (VALUES ('INFO', 5), ('ERROR', 5)) AS t(level, n_lines)
    """,
    "parallel_copy": """
        SELECT COUNT(*) AS src_rows, COUNT(*) AS copied_rows FROM lineitem
    """,
}

QUERY_FNS = {
    "snapshot_dump": snapshot_dump,
    "snapshot_load": snapshot_load,
    "log_append": log_append,
    "parallel_copy": parallel_copy,
    "sink_partition_overwrite": sink_partition_overwrite,
}
