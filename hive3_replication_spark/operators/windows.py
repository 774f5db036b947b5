"""Window functions (SURVEY.md §2.5, W1-W6).

W1-W3 are the reference's patterns made distributed: ordinal row selection
(awk ``NR==4``), latest-status-per-database, and previous-run comparison
(``LAST_REPL_ID`` vs ``POST_LOAD_REPL_ID``, ``hive3repl.sh:157``).

Scale: every window here except W1/W4's global form is partitioned
(``partitionBy``), so state stays per-key and distributes. Unpartitioned
ordered windows are reserved for resultset-sized data (their reference
semantics) — flagged in docstrings where they appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — ordinal selection over an ordered resultset
    (``beeline_functions.sh:24``): first 10 rows with their ordinals."""
    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("rn", "event_id", "event_type")
    )


def win_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — most recent status per database (status lookup repeated pre/post
    load, ``beeline_functions.sh:3-49``): latest event per user. Partitioned
    window → fully distributed; ties broken by event_id for determinism."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — compare a run's watermark to the previous run's
    (``hive3repl.sh:157``): per-user delta of consecutive event values."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — cumulative events applied over replay order (``README.md:38``).
    Exact decimal accumulation (see aggregates module policy), partitioned
    per user so the frame distributes."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — rank / dense_rank within group: customers by balance per
    nation."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — distributional analytics: quartile + percent_rank of order value.
    The ordering key includes o_orderkey so tile assignment is total-order
    deterministic across engines and partition counts."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("price_pct_rank"),
    )


def win_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — frame-navigation values: per customer's order history (ordered
    by date with the unique orderkey as tie-break), the first, second, and
    latest order. nth/last use an explicit unbounded-both-sides frame: the
    default running frame would make them row-position-dependent, which is
    both semantically wrong for "the latest order" and nondeterministic
    under distributed ordering."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_order"),
        F.last("o_orderkey").over(wf).alias("last_order"),
    )


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 — top-k per group: each customer's 3 most expensive orders.
    row_number (not rank) over a unique composite order key so exactly k
    rows survive per group deterministically. At scale this is one hash
    shuffle on the group key followed by a partition-local sort — Spark
    applies the rn <= k predicate inside the window stage (limit pushdown
    into WindowGroupLimit), so the full ranked set is never materialized."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 — time-range frame: per event, the count and exact-decimal value
    sum of the same user's events in the trailing hour (RANGE, not ROWS —
    the frame is defined by the *order value*, so ties and gaps are handled
    by time distance, not row position; the result is deterministic even
    with duplicate timestamps, no tie-break needed).

    The order key is integer microseconds (``unix_micros``) so the frame
    bound is an exact integer offset — identical in both engines, no
    interval/calendar arithmetic in the hot path. One hash shuffle on
    user_id + one partition-local sort; Spark evaluates the sliding frame
    with two pointers over the sorted run, O(n) per partition, state
    bounded by the widest in-frame run — no self-join, which is the
    O(n·k) formulation this operator exists to avoid at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "t_us",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


def win_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 — running DISTINCT count over a window (how many distinct users
    has this event type seen up to each event): no engine supports
    COUNT(DISTINCT) OVER directly at scale, so the standard two-window
    rewrite — a first-occurrence flag (row_number over (type, user) == 1)
    summed cumulatively over (type) — computes it exactly with bounded
    state. Both windows order by the unique (ts, event_id), so the
    running values are total-order deterministic; the rewrite is also the
    100 TB form (the naive per-row distinct set is O(users) state per
    row)."""
    events = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn(
            "is_first", (F.row_number().over(w_first) == 1).cast("bigint")
        )
        .withColumn("running_users", F.sum("is_first").over(w_cum))
        .select("event_type", "event_id", "running_users")
    )


def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 — event-sequence pattern detection (MATCH_RECOGNIZE-lite):
    each user's event types collapse into ONE ordered sequence string and
    a regex detects the CONSECUTIVE funnel view>click>purchase (no
    intervening events — the strict form; loosen the regex for the
    any-gap form) —
    row-pattern matching expressed with the primitives Spark has (ordered
    aggregation + regex) instead of the SQL-standard clause it lacks.

    Determinism: the sequence is built by sorting (ts, event_id, type)
    structs — a total order — then projecting types; the groupBy is one
    hash agg (collect_list partials merge, sort once per group at
    finalize). Differs from ts_funnel: that counts stage conversions,
    this classifies each user's full journey against an arbitrary
    regex — the general pattern engine."""
    events = load_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"), F.col("event_id"), F.col("event_type")
                    )
                )
            ),
            lambda s: s.getField("event_type"),
        ),
        ">",
    )
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        seq.rlike("view>click>purchase").alias("has_funnel"),
    )


def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — distribution functions: percent_rank + cume_dist of each
    event's value within its event type (the "what percentile is this
    run's duration" question from run-log triage, generalized).

    Both are rank arithmetic over one partitioned sort — (event_type) x
    (value, event_id) — so the two Window nodes share a single exchange
    and sort. The ORDER BY includes event_id to make ranks total and
    therefore cross-engine deterministic; both functions are exact
    rational values (rank-1)/(n-1) and rank/n computed identically by
    Spark and DuckDB. NULL placement is pinned EXPLICITLY on both sides
    (hostile-row fuzz, round 12): Spark's ascending default is NULLS
    FIRST while DuckDB's is NULLS LAST, and because cume_dist counts
    every row at-or-before the current one, a differing NULL position
    shifts the distribution of EVERY row in the partition, not just the
    NULL ones."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id").asc()
    )
    return events.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


ORACLES: dict[str, str] = {
    "win_pattern_match": """
        SELECT user_id, COUNT(*) AS n_events,
               regexp_matches(
                   string_agg(event_type, '>'
                              ORDER BY CAST(ts AS TIMESTAMP), event_id),
                   'view>click>purchase') AS has_funnel
        FROM events GROUP BY user_id
    """,
    "win_distinct_running": """
        WITH flagged AS (
            SELECT event_type, event_id, ts,
                   CASE WHEN row_number() OVER (
                       PARTITION BY event_type, user_id
                       ORDER BY ts, event_id) = 1
                   THEN 1 ELSE 0 END AS is_first
            FROM events
        )
        SELECT event_type, event_id,
               CAST(SUM(is_first) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS running_users
        FROM flagged
    """,
    "win_distribution": """
        SELECT event_id, event_type,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY value NULLS FIRST, event_id)
    """,
    "win_range_frame": """
        SELECT event_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
               COUNT(*) OVER w AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    "win_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, price_rank FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                       AS price_rank
            FROM orders
        ) WHERE price_rank <= 3
    """,
    "win_row_number": """
        SELECT rn, event_id, event_type FROM (
            SELECT event_id, event_type,
                   ROW_NUMBER() OVER (ORDER BY event_id) AS rn
            FROM events
        ) WHERE rn <= 10
    """,
    "win_latest_per_group": """
        SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "win_lag": """
        SELECT user_id, event_id,
               value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id)
                   AS value_delta
        FROM events
    """,
    "win_running_sum": """
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        FROM events
    """,
    "win_rank": """
        SELECT c_custkey, c_nationkey,
               RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
                   AS bal_rank,
               DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
                   AS bal_dense_rank
        FROM customer
    """,
    "win_ntile": """
        SELECT o_orderkey,
               NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile,
               PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS price_pct_rank
        FROM orders
    """,
    "win_first_value": """
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               NTH_VALUE(o_orderkey, 2) OVER wf AS second_order,
               LAST_VALUE(o_orderkey) OVER wf AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
}

QUERY_FNS = {
    "win_row_number": win_row_number,
    "win_latest_per_group": win_latest_per_group,
    "win_lag": win_lag,
    "win_running_sum": win_running_sum,
    "win_rank": win_rank,
    "win_ntile": win_ntile,
    "win_first_value": win_first_value,
    "win_topk_per_group": win_topk_per_group,
    "win_range_frame": win_range_frame,
    "win_distribution": win_distribution,
    "win_distinct_running": win_distinct_running,
    "win_pattern_match": win_pattern_match,
}
