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


ORACLES: dict[str, str] = {
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
}
