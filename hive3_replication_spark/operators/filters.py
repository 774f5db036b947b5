"""Projections, filters, and predicates (SURVEY.md §2.2, P1-P11).

The reference implements these row-at-a-time with awk/sed/grep on beeline
resultsets (e.g. ``beeline_functions.sh:24``: ``awk -F| '(NR==4){gsub(/ /,"",$2);
print $2}'``). Here each one is a declarative DataFrame expression, so Catalyst
pushes the predicate into the parquet scan (visible as PushedFilters in
``.explain``) and the whole pipeline stays inside whole-stage codegen.

At 100 TB: every filter here is a scan-level predicate — no shuffle, no UDF,
no driver round-trip. The watermark predicate (P11) additionally prunes
partitions when the events table is written partitioned by an event_id range
or event date, which is the layout the repl pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..util import rows_df


def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — positional column projection.

    Reference: ``beeline_functions.sh:117-118`` extracts $2 (dump path) and $3
    (txid) from a resultset row. Engine analog: column pruning via select —
    Catalyst reduces the parquet ReadSchema to exactly these columns.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice", "o_orderstatus")


def row_offset_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — keep only row N of an ordered resultset (awk ``NR==4``,
    ``beeline_functions.sh:24``).

    Spark has no row numbers without an ordering; the engine makes the
    ordering explicit (event_id) and uses row_number. Scale note: the window
    is unpartitioned, which would serialize at 100 TB — acceptable here only
    because the semantic is "row 4 of a tiny resultset"; for large data the
    engine's latest-per-group (W2) partitioned form applies instead.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 4)
        .select("event_id", "event_type", "user_id")
    )


def string_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — whitespace scrub, ``gsub(/ /,"")`` (``beeline_functions.sh:24``)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), " ", "").alias("scrubbed_name"),
    )


def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — allowlist membership (``misc_functions.sh:198-206``; DBLIST
    ``env.sh:14``). For a huge allowlist use a broadcast left-semi join (J5);
    for a config-sized list ``isin`` compiles to an In predicate pushed to the
    scan."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select("c_custkey", "c_mktsegment")


def filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — txid regex validation ``'^[0-9]+$'`` (``init_variables.sh:15``,
    applied at ``hive3repl.sh:140``). Recreates the reference's exact
    scenario: a replication id column that is either an integer string or the
    literal ``NULL`` sentinel (``hive3repl.sh:85``), keeping only valid ids."""
    events = load_table(spark, sf_dir, "events")
    candidate = F.when(
        F.col("event_id") % 3 == 0, F.lit("NULL")
    ).otherwise(F.col("event_id").cast("string"))
    return (
        events.withColumn("repl_id_str", candidate)
        .filter(F.col("repl_id_str").rlike(r"^[0-9]+$"))
        .select("event_id", "repl_id_str")
    )


def filter_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — path-prefix sanity check: dump path must start with REPL_ROOT
    (``beeline_functions.sh:123``, root ``env.sh:11``). StartsWith compiles
    to a pushed StringStartsWith filter on the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_type").startswith("P")).select(
        "p_partkey", "p_type"
    )


def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — NULL-sentinel predicate (``hive3repl.sh:85``): the string "NULL"
    means "never replicated". Engine policy (SURVEY.md §7 risk 3): normalize
    the sentinel to SQL NULL at ingest (nullif) then branch on isNull."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "sentinel", F.nullif(F.col("event_type"), F.lit("click"))
        )
        .filter(F.col("sentinel").isNull())
        .select("event_id", "user_id")
    )


def filter_multi_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — multi-pattern error grep ``'^Error|^ERROR|FAILED'``
    (``hive3repl.sh:132,178``) as a single alternation regex predicate."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").rlike(r"^(error|signup)")).select(
        "event_id", "event_type"
    )


def filter_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — negative filters: drop ``^SLF4J:`` lines and blank lines
    (``misc_functions.sh:73-75``, sed delete)."""
    documents = load_table(spark, sf_dir, "documents")
    return (
        documents.filter(~F.col("text").rlike(r"^the "))
        .filter(F.col("text") != "")
        .select("doc_id", "lang")
    )


def filter_table_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — exclude external tables unless INCLUDE_EXTERNAL_TABLES
    (``beeline_functions.sh:70-76``, ``env.sh:8``). The engine models table
    class as catalog metadata and prunes the table set before any fan-out
    (SURVEY.md §4 row 2) — a driver-side plan decision, Catalyst never sees
    excluded tables."""
    meta = table_class_catalog(spark)
    include_external = False  # env.sh:8 default
    if not include_external:
        meta = meta.filter(F.col("table_type") == "MANAGED")
    return meta.select("table_name", "table_type")


def table_class_catalog(spark: SparkSession) -> DataFrame:
    """Catalog-metadata fixture: fixture tables classified as the reference
    classifies Hive tables (managed/ACID vs external, ``README.md:4``)."""
    rows = [
        ("region", "MANAGED"),
        ("nation", "MANAGED"),
        ("customer", "MANAGED"),
        ("supplier", "MANAGED"),
        ("part", "MANAGED"),
        ("orders", "MANAGED"),
        ("lineitem", "MANAGED"),
        ("events", "EXTERNAL"),
        ("documents", "EXTERNAL"),
        ("embeddings", "EXTERNAL"),
    ]
    return rows_df(spark, "table_name string, table_type string", rows)


def scalar_watermark(events: DataFrame, lag: int) -> int:
    """Two-phase watermark planning (the reference's own shape: read
    ``repl status`` first, then dump from that id, SURVEY.md §4 row 1): a
    tiny aggregate job yields the scalar, and downstream filters use it as a
    *literal* — which Catalyst pushes into the parquet scan and uses for
    partition pruning. A dynamically-joined watermark cannot prune."""
    return events.agg((F.max("event_id") - F.lit(lag)).alias("wm")).collect()[0][
        "wm"
    ]


def filter_gt_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — watermark range predicate: only events with id > last_repl_id
    enter the incremental dump (``HQL/repldump.hql:3`` ``from
    ${last_repl_id}``). Literal predicate → PushedFilters: [GreaterThan
    (event_id, …)] in the scan (asserted in tests/test_plans.py)."""
    events = load_table(spark, sf_dir, "events")
    wm = scalar_watermark(events, 100)
    return events.filter(F.col("event_id") > F.lit(wm)).select(
        "event_id", "event_type", "user_id"
    )


def filter_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — dynamic partition pruning: the partition predicate is only
    known at RUNTIME (it comes out of a filtered dimension), yet the fact
    scan must still skip non-matching partition directories — Catalyst
    injects the dim's build-side keys as a dynamicpruning subquery into
    the fact's PartitionFilters (plan-gated). This is the 100 TB
    difference between "join then discard 27 of 30 days" and "read 3
    days": static pruning (scan_partitioned) covers literal predicates,
    DPP covers the join-driven ones every star query has."""
    from ..sources.readers import partitioned_events_path

    path = partitioned_events_path(spark, sf_dir)
    facts = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("2024-01-02", "keep"), ("2024-01-05", "keep"),
         ("2024-01-09", "drop")],
        "d string, action string",
    ).select(F.col("d").cast("date").alias("event_date"), "action")
    keep = dim.filter(F.col("action") == "keep").select("event_date")
    return (
        facts.join(keep, "event_date")
        .groupBy("event_date")
        .agg(F.count("*").alias("n_events"))
    )


ORACLES: dict[str, str] = {
    "filter_dpp": """
        -- date derived in a subquery: DuckDB mis-prunes the direct
        -- WHERE CAST(ts AS DATE) IN (...) form against this parquet scan
        SELECT event_date, COUNT(*) AS n_events FROM (
            SELECT CAST(ts AS DATE) AS event_date FROM events
        ) t
        WHERE event_date IN (DATE '2024-01-02', DATE '2024-01-05')
        GROUP BY event_date
    """,
    "project_columns": "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders",
    "row_offset_filter": """
        SELECT event_id, event_type, user_id FROM (
            SELECT event_id, event_type, user_id,
                   ROW_NUMBER() OVER (ORDER BY event_id) AS rn
            FROM events
        ) WHERE rn = 4
    """,
    "string_scrub": """
        SELECT p_partkey, REPLACE(p_name, ' ', '') AS scrubbed_name FROM part
    """,
    "filter_isin": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    "filter_rlike": """
        SELECT event_id, repl_id_str FROM (
            SELECT event_id,
                   CASE WHEN event_id % 3 = 0 THEN 'NULL'
                        ELSE CAST(event_id AS VARCHAR) END AS repl_id_str
            FROM events
        ) WHERE regexp_matches(repl_id_str, '^[0-9]+$')
    """,
    "filter_prefix": """
        SELECT p_partkey, p_type FROM part WHERE p_type LIKE 'P%'
    """,
    "filter_null": """
        SELECT event_id, user_id FROM events
        WHERE NULLIF(event_type, 'click') IS NULL
    """,
    "filter_multi_rlike": """
        SELECT event_id, event_type FROM events
        WHERE regexp_matches(event_type, '^(error|signup)')
    """,
    "filter_negative": """
        SELECT doc_id, lang FROM documents
        WHERE NOT regexp_matches(text, '^the ') AND text <> ''
    """,
    "filter_table_class": """
        SELECT table_name, table_type FROM (
            VALUES ('region','MANAGED'),('nation','MANAGED'),
                   ('customer','MANAGED'),('supplier','MANAGED'),
                   ('part','MANAGED'),('orders','MANAGED'),
                   ('lineitem','MANAGED'),('events','EXTERNAL'),
                   ('documents','EXTERNAL'),('embeddings','EXTERNAL')
        ) AS t(table_name, table_type)
        WHERE table_type = 'MANAGED'
    """,
    "filter_gt_watermark": """
        SELECT event_id, event_type, user_id FROM events
        WHERE event_id > (SELECT MAX(event_id) - 100 FROM events)
    """,
}

QUERY_FNS = {
    "project_columns": project_columns,
    "row_offset_filter": row_offset_filter,
    "string_scrub": string_scrub,
    "filter_isin": filter_isin,
    "filter_rlike": filter_rlike,
    "filter_prefix": filter_prefix,
    "filter_null": filter_null,
    "filter_multi_rlike": filter_multi_rlike,
    "filter_negative": filter_negative,
    "filter_table_class": filter_table_class,
    "filter_gt_watermark": filter_gt_watermark,
    "filter_dpp": filter_dpp,
}
