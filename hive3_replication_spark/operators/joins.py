"""Joins (SURVEY.md §2.3, J1-J17).

The reference's only "join" is a row-at-a-time comparison of two scalar
watermarks in bash (``hive3repl.sh:106-120,155-169``); the engine generalizes
to full join-type coverage because verification, event replay, and the LLM
ops all join.

Scale strategy per join:
- dim × fact → explicit ``broadcast()`` of the dim (no shuffle of the fact);
- fact × fact → shuffle hash/sort-merge on the key, with AQE switching
  strategy and splitting skewed partitions at runtime;
- as-of → union + partitioned window carry-forward (one shuffle on the key,
  no non-equi blowup — the standard scalable as-of pattern);
- theta → pre-aggregate both sides to interval summaries first, so the
  quadratic non-equi join runs on ~|keys×classes| rows, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def _dbized_events(events: DataFrame) -> DataFrame:
    """Model a multi-database deployment (DBLIST, ``env.sh:14``) by hashing
    events into 4 logical databases."""
    return events.withColumn(
        "db_name", F.concat(F.lit("db"), (F.col("user_id") % 4).cast("string"))
    )


def join_watermark_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the reference's core verification: per-db source watermark vs
    target watermark, classified equal/behind/ahead (``hive3repl.sh:106-120``).

    Source = max event id per db; target = max event id at a stale cut
    (simulating a target that has applied only part of the stream). Both are
    partial-aggregated map-side then joined — at scale this is a tiny
    aggregate × tiny aggregate join regardless of event volume.
    """
    events = _dbized_events(load_table(spark, sf_dir, "events"))
    cut = events.agg((F.max("event_id") - F.lit(200)).alias("cut"))
    src = events.groupBy("db_name").agg(F.max("event_id").alias("src_wm"))
    tgt = (
        events.join(F.broadcast(cut))
        .filter(F.col("event_id") <= F.col("cut"))
        .groupBy("db_name")
        .agg(F.max("event_id").alias("tgt_wm"))
    )
    status = (
        F.when(F.col("tgt_wm").isNull(), F.lit("bootstrap_required"))
        .when(F.col("tgt_wm") == F.col("src_wm"), F.lit("in_sync"))
        .when(F.col("tgt_wm") < F.col("src_wm"), F.lit("behind"))
        .otherwise(F.lit("ahead"))
    )
    return (
        src.join(tgt, "db_name", "left")
        .select("db_name", "src_wm", "tgt_wm", status.alias("status"))
    )


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — broadcast hash join: small dims (supplier, nation) against the
    lineitem fact. ``broadcast()`` pins BroadcastHashJoin so the fact table
    is never shuffled — the pattern for every dim join at 100 TB."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — large × large equi join (orders × lineitem) on the shuffle key.

    No broadcast hint: both sides shuffle on orderkey and AQE picks
    sort-merge (or shuffled-hash) and splits skewed key ranges. At 100 TB
    this is the join to co-locate via bucketing on orderkey so the exchange
    disappears entirely.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — left outer join: keep all sources, null-extend missing target
    state (db never replicated → NULL, ``hive3repl.sh:85``)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — left semi join: allowlist membership at scale
    (``misc_functions.sh:200-205`` generalized)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_mktsegment")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — left anti join: divergence audit — rows present at source but
    missing at target ("requires a cleanup of the partially loaded
    database", ``hive3repl.sh:110-112``)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — as-of join: for each 'purchase' event, the latest 'click' by the
    same user at-or-before it (the event-replay "latest state version ≤
    watermark" pattern, ``HQL/repldump.hql:3`` / ``README.md:38``).

    Implementation is the scalable union + window carry-forward: tag both
    streams, sort within user by (ts, side) with the quote side first so an
    equal-timestamp quote is visible to the trade, and carry the last
    non-null quote timestamp forward. One shuffle on user_id; no range-join
    blowup; works identically at 100 TB with events bucketed by user.
    """
    events = load_table(spark, sf_dir, "events")
    trades = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("trade_id")
    )
    quotes = (
        events.filter(F.col("event_type") == "click")
        # collapse duplicate (user, ts) quotes so the carry is deterministic
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("q_id"))
        .select("user_id", F.col("ts").alias("q_ts"))
    )
    tagged = trades.select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("is_trade"),
        "trade_id",
        F.lit(None).cast("timestamp").alias("q_ts"),
    ).unionByName(
        quotes.select(
            "user_id",
            F.col("q_ts").alias("ts"),
            F.lit(0).alias("is_trade"),
            F.lit(None).cast("long").alias("trade_id"),
            "q_ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_trade", "trade_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof_ts", F.last("q_ts", ignorenulls=True).over(w))
        .filter(F.col("is_trade") == 1)
        .select("trade_id", "user_id", "asof_ts")
    )


def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — theta (non-equi) join: activity-interval overlap between event
    types of the same user. Both sides are pre-aggregated to (user, type,
    min_ts, max_ts) summaries first, so the non-equi join (broadcast
    nested-loop under the hood) runs on |users × types| rows — the engine's
    rule for keeping theta joins feasible at scale."""
    events = load_table(spark, sf_dir, "events")
    iv = events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    a = iv.select(
        F.col("user_id"),
        F.col("event_type").alias("type_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
    )
    b = iv.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_type").alias("type_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("type_a") < F.col("type_b"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a")),
        )
        .select("user_id", "type_a", "type_b")
    )


def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — full outer reconciliation: customers active in the early period
    vs the late period — matched / source-only / target-only, the two-sided
    generalization of the verification ladder incl. the "ahead" branch
    (``hive3repl.sh:113-115``)."""
    orders = load_table(spark, sf_dir, "orders")
    early = (
        orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("src_key"))
        .distinct()
    )
    late = (
        orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("tgt_key"))
        .distinct()
    )
    status = (
        F.when(F.col("src_key").isNull(), F.lit("target_only"))
        .when(F.col("tgt_key").isNull(), F.lit("source_only"))
        .otherwise(F.lit("matched"))
    )
    return early.join(late, F.col("src_key") == F.col("tgt_key"), "full").select(
        F.coalesce(F.col("src_key"), F.col("tgt_key")).alias("c_custkey"),
        status.alias("status"),
    )


def join_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 — content-level snapshot divergence audit: the reference's
    manual "verify the rows replicated" step (``ManualSteps.md:25``)
    generalized from row counts to row CONTENT. Source and target
    snapshots are reduced to (key, md5-of-payload) fingerprints, full-
    outer-joined on the key, and classified source_only / target_only /
    changed; identical rows are dropped pre-output.

    Scale design: the fingerprint is computed in the scan projection, so
    the shuffle carries (key, 32-byte hash) — independent of row width;
    a 100-column 100 TB fact diffs with the same exchange as a 2-column
    one. md5 over a '|'-joined string of the compared columns keeps the
    fingerprint engine-portable (string-typed columns only here; doubles
    would need a canonical rendering first). The target side simulates
    drift deterministically: every 97th key missing, every 101st key's
    priority changed, every 499th key present only at the target."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_orderpriority")
    fp = F.md5(F.concat_ws("|", "o_orderstatus", "o_orderpriority"))
    src = base.select(F.col("o_orderkey").alias("src_key"), fp.alias("src_fp"))
    k = F.col("o_orderkey")
    tgt_rows = base.filter(k % 97 != 0).withColumn(
        "o_orderpriority",
        F.when(k % 101 == 1, F.lit("9-DRIFTED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    extra = base.filter(k % 499 == 0).withColumn("o_orderkey", -k)
    tgt = tgt_rows.unionByName(extra).select(
        F.col("o_orderkey").alias("tgt_key"), fp.alias("tgt_fp")
    )
    diff_type = (
        F.when(F.col("tgt_key").isNull(), F.lit("source_only"))
        .when(F.col("src_key").isNull(), F.lit("target_only"))
        .when(F.col("src_fp") != F.col("tgt_fp"), F.lit("changed"))
        .otherwise(F.lit("equal"))
    )
    return (
        src.join(tgt, F.col("src_key") == F.col("tgt_key"), "full")
        .select(
            F.coalesce(F.col("src_key"), F.col("tgt_key")).alias("o_orderkey"),
            diff_type.alias("diff_type"),
        )
        .filter(F.col("diff_type") != "equal")
    )


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — range (point-in-interval) join via bucket blocking: every
    event whose timestamp falls inside an "incident window", aggregated to
    per-window containment stats. The non-equi pattern Spark lacks a
    native physical operator for (generalizes the reference's watermark
    range predicate ``hive3repl.sh:155-169`` from ids to time intervals).

    Intervals are derived deterministically: every 50th event per type
    (ordered by ts, event_id) opens a 45-minute window. A naive plan is a
    pure-theta join (BroadcastNestedLoop — O(|events| x |windows|) at any
    scale). Instead both sides key on a coarse time bucket (30 min): each
    interval EXPLODES into the <=3 buckets it covers, each event maps to
    exactly ONE bucket, and the equi-join on bucket runs as a normal
    shuffle/broadcast hash join with the exact containment predicate as a
    post-join filter. Because an event matches an interval only through
    the event's own bucket, each (event, interval) pair joins exactly once
    — no distinct needed. Shuffle volume: events x 1 + intervals x
    ceil(len/bucket + 1) rows, linear at 100 TB; AQE picks broadcast when
    the exploded interval side is small (the common case)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select("event_id", "ts", "user_id", "event_type")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    bucket_us = 1_800_000_000  # 30 min in microseconds
    iv = (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % 50 == 0)
        .select(
            F.col("event_id").alias("iv_id"),
            F.col("event_type").alias("iv_type"),
            F.col("ts").alias("iv_start"),
            (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("iv_end"),
        )
    )
    # integer DIV, not `/`: micros-since-epoch (~1.7e18) exceeds double's
    # 2^53 exact range, so float division could misassign boundary buckets
    iv_b = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(CAST(iv_start AS TIMESTAMP)) DIV {bucket_us}"),
                F.expr(
                    f"(unix_micros(CAST(iv_end AS TIMESTAMP)) - 1) DIV {bucket_us}"
                ),
            )
        ),
    )
    e_b = e.withColumn(
        "bucket", F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {bucket_us}")
    )
    return (
        e_b.join(iv_b, "bucket")
        .filter((F.col("ts") >= F.col("iv_start")) & (F.col("ts") < F.col("iv_end")))
        .groupBy("iv_id", "iv_type", "iv_start")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select("iv_id", "iv_type", "iv_start", "n_events", "n_users")
    )


def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 — SCD type-2 merge: apply an incoming dimension batch to a
    versioned (valid_from / valid_to / is_current) dimension — the
    warehouse-side "replicate changes without losing history" form of the
    reference's incremental load (``README.md:38`` event replay keeps only
    last state; SCD2 keeps the lineage).

    One full-outer join on the business key classifies every key as
    unchanged / changed / inserted, then the output is built set-wise (no
    per-row MERGE loop): closed prior versions for changed keys, opened
    v2 rows for changed keys, opened v1 rows for inserts, untouched open
    rows for the rest. The tracked payload here is one decimal column,
    compared directly; a wide payload would compare md5 fingerprints
    computed in the scan projection so the join shuffles (key, 32-byte
    hash) — join_snapshot_diff's width-independence argument. The
    incoming batch is simulated deterministically: every 10th customer's
    balance shifts, every 97th key is brand-new.

    Scale: one key-partitioned exchange; at 100 TB the same plan runs
    MERGE-shaped against a key-bucketed dimension layout so the join is
    exchange-free (scan_bucketed's argument)."""
    customer = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dim = customer.select(
        k.alias("key"),
        F.col("c_acctbal").cast("decimal(18,4)").alias("bal"),
        F.lit(1).cast("bigint").alias("version"),
    )
    incoming = (
        customer.filter((k % 10 == 0) | (k % 97 == 0))
        .select(
            F.when(k % 97 == 0, k + 1_000_000).otherwise(k).alias("key"),
            F.when(
                k % 10 == 0, F.col("c_acctbal").cast("decimal(18,4)") + 100
            )
            .otherwise(F.col("c_acctbal").cast("decimal(18,4)"))
            .alias("new_bal"),
        )
    )
    j = dim.join(incoming, "key", "full")
    changed = F.col("new_bal").isNotNull() & F.col("bal").isNotNull() & (
        F.col("new_bal") != F.col("bal")
    )
    inserted = F.col("bal").isNull()
    # Output built in ONE pass over the joined relation (optimization
    # round 15, guide §2.4): the previous three filter+union branches each
    # embedded the full-outer join subtree — Catalyst does not CSE across
    # union arms, so the join (and both scans) executed three times
    # (plans/r15/merge_scd2_before.txt: 3 joins, 6 scans). Each joined row
    # now emits its applicable output rows as an array of structs (closed
    # version for changed keys, opened v2/v1 for changed/inserted, the
    # untouched open row otherwise), exploded and null-filtered — exactly
    # the rows the union produced, one join, two scans.
    closed_s = F.when(
        changed,
        F.struct(
            F.col("bal").cast("double").alias("bal"),
            F.col("version").alias("version"),
            F.lit("closed").alias("row_status"),
        ),
    )
    new_s = F.when(
        changed | inserted,
        F.struct(
            F.col("new_bal").cast("double").alias("bal"),
            F.when(inserted, F.lit(1)).otherwise(F.lit(2)).cast("bigint")
            .alias("version"),
            F.lit("open").alias("row_status"),
        ),
    )
    untouched_s = F.when(
        ~changed & ~inserted,
        F.struct(
            F.col("bal").cast("double").alias("bal"),
            F.col("version").alias("version"),
            F.lit("open").alias("row_status"),
        ),
    )
    return (
        j.select(
            "key", F.explode(F.array(closed_s, new_s, untouched_s)).alias("r")
        )
        .filter(F.col("r").isNotNull())
        .select("key", "r.bal", "r.version", "r.row_status")
    )


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 — FORWARD as-of: for every event, the same user's next 'error'
    event at-or-after it, and the microsecond gap — the time-to-failure /
    time-to-conversion labeling join ML training sets are built with
    (J7's backward as-of answers "latest state before"; this answers
    "first outcome after").

    Same scalable shape as J7: no non-equi join at all — one partitioned
    window ordered DESC carries the most-recently-seen error timestamp
    backwards through each user's history (running min of future error
    times), so the plan is one exchange + one sort at any event volume.
    Events with no later error yield NULLs (right-censored)."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t_us"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    next_err = F.min(
        F.when(F.col("event_type") == "error", F.col("t_us"))
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        next_err.alias("next_error_us"),
        (next_err - F.col("t_us")).alias("us_to_error"),
    )


#: Nearest-as-of match tolerance (µs): clicks further than this from the
#: purchase in BOTH directions yield a NULL match.
_NEAREST_TOL_US = 3_600_000_000  # 1 hour


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16 — NEAREST as-of, completing the family (J7 backward, J15
    forward): for each 'purchase', the same user's click closest in time
    in EITHER direction, within a 1-hour tolerance, ties preferring the
    backward match (pandas ``merge_asof(direction='nearest')``
    semantics, plus the tolerance both QuestDB and kdb+ expose).

    Same scalable shape as J7/J15 — no non-equi join: tag and union the
    two sides, then BOTH direction carries run as window passes over the
    SAME user_id partitioning (one exchange, two sorts; at 100 TB with
    events bucketed by user even the exchange disappears). The backward
    pass carries the latest click at-or-before each row; the forward
    pass (descending scan, clicks first within a timestamp) carries the
    earliest click at-or-after. Duplicate (user, ts) clicks need no
    pre-dedup (unlike J7, which carries a click attribute): the carried
    value IS the timestamp, so ties carry identical values and the
    result is deterministic without spending a dedup exchange."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t_us"),
    )
    trades = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "t_us", F.col("event_id").alias("trade_id")
    )
    quotes = e.filter(F.col("event_type") == "click").select(
        "user_id", "t_us"
    )
    tagged = trades.select(
        "user_id",
        "t_us",
        F.lit(1).alias("is_trade"),
        "trade_id",
        F.lit(None).cast("long").alias("q_us"),
    ).unionByName(
        quotes.select(
            "user_id",
            "t_us",
            F.lit(0).alias("is_trade"),
            F.lit(None).cast("long").alias("trade_id"),
            F.col("t_us").alias("q_us"),
        )
    )
    # backward: ascending, quotes (0) before trades at equal ts
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_trade", "trade_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: descending ts, but still quotes first within a timestamp
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("t_us"), F.asc("is_trade"), F.desc("trade_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        tagged.withColumn("b_us", F.last("q_us", ignorenulls=True).over(wb))
        .withColumn("f_us", F.last("q_us", ignorenulls=True).over(wf))
        .filter(F.col("is_trade") == 1)
    )
    d_b = F.col("t_us") - F.col("b_us")
    d_f = F.col("f_us") - F.col("t_us")
    b_ok = F.coalesce(d_b <= _NEAREST_TOL_US, F.lit(False))
    f_ok = F.coalesce(d_f <= _NEAREST_TOL_US, F.lit(False))
    take_b = b_ok & (~f_ok | (d_b <= d_f))
    return scored.select(
        "trade_id",
        "user_id",
        F.when(take_b, F.col("b_us"))
        .when(f_ok, F.col("f_us"))
        .alias("nearest_us"),
        F.when(take_b, d_b).when(f_ok, d_f).alias("gap_us"),
        F.when(take_b, F.lit("backward"))
        .when(f_ok, F.lit("forward"))
        .alias("direction"),
    )


_BLOOM_BITS = 63  # single-word filter; production sizes an array of words


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 — bloom-prefiltered semi join: the big side is filtered by a
    broadcast BIT MASK of the small side's keys BEFORE any shuffle, so
    only probable members move — the hand-rolled form of Spark's runtime
    bloom-filter join (which needs size-threshold tuning to trigger; this
    form is explicit and engine-portable). False positives pass the
    prefilter and are removed by the real semi join; false negatives are
    impossible (BIT_OR of exactly the inserted bits).

    One-word (63-bit) filter here; at scale the mask is an array of
    words (bit i of word h(k) DIV 63), still a few KB broadcast. The
    prefilter is literal integer arithmetic → full SQL oracle equal to
    the plain semi join."""
    events = load_table(spark, sf_dir, "events")
    hot = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select((F.col("c_custkey") % 150).alias("key"))
        .distinct()
    )
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(key % {_BLOOM_BITS} AS INT))")
    mask = hot.agg(F.bit_or(bit).alias("mask"))
    probe_bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BLOOM_BITS} AS INT))"
    )
    prefiltered = (
        events.join(F.broadcast(mask))
        .filter((probe_bit.bitwiseAND(F.col("mask"))) != 0)
    )
    return (
        prefiltered.join(
            F.broadcast(hot), prefiltered.user_id == hot.key, "left_semi"
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_hot_users"),
        )
    )


#: J17 interval-overlap blocking bucket (1 hour) and the two
#: sessionization gaps: user sessions reuse T5's 30-minute contract;
#: error bursts cut at 5-minute silences (a burst is a tight cluster).
_IVO_BUCKET_US = 3_600_000_000
_IVO_SESSION_GAP_US = 1_800_000_000
_IVO_BURST_GAP_US = 300_000_000


def _intervals(
    df: DataFrame, key_cols: list[str], gap_us: int
) -> DataFrame:
    """Gaps-and-islands intervals per key (the T5 two-window idiom —
    one exchange, both windows + the final groupBy share the key
    partitioning): rows more than ``gap_us`` apart start a new interval;
    output one (key, iv_start, iv_end) row per island."""
    w = Window.partitionBy(*key_cols).orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    flagged = df.withColumn(
        "new_iv",
        F.when(prev_us.isNull() | (t_us - prev_us > gap_us), 1).otherwise(0),
    ).withColumn(
        "iv_idx",
        F.sum("new_iv").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(*key_cols, "iv_idx").agg(
        F.min("ts").alias("iv_start"), F.max("ts").alias("iv_end")
    )


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J17 — interval × interval overlap join via bucket blocking: which
    user activity sessions overlap an error burst — the incident-impact
    question ("who was active while the system was erroring") that
    point-in-interval J12 cannot ask, because BOTH sides are intervals.

    Both relations are gaps-and-islands intervals over the same event
    stream (user sessions at T5's 30-min gap; error bursts at a 5-min
    gap). A naive overlap join is a pure theta join —
    O(|sessions| × |bursts|) nested-loop at any scale. Instead both
    sides EXPLODE into the hour buckets they cover and equi-join on the
    bucket (the distributed interval-join pattern used by genomics
    joins and stream-window joins alike), with the exact closed-interval
    overlap predicate (s_start ≤ b_end AND b_start ≤ s_end) as a
    post-join filter. An overlapping pair co-occurs in EVERY shared
    bucket, so the join keeps only the bucket of the overlap's start —
    ``bucket == greatest(bucket(s_start), bucket(b_start))``, exact
    because bucketing is monotone so max commutes with it — and each
    pair emerges exactly once with NO distinct/dedup pass. Shuffle
    volume is O(Σ interval-hours), linear in the data; bucket width
    bounds the skew any single reducer can see."""
    events = load_table(spark, sf_dir, "events")
    sessions = _intervals(
        events.select("user_id", "event_id", "ts"),
        ["user_id"],
        _IVO_SESSION_GAP_US,
    ).select(
        "user_id",
        F.col("iv_start").alias("s_start"),
        F.col("iv_end").alias("s_end"),
    )
    bursts = _intervals(
        events.filter(F.col("event_type") == "error").select(
            "event_type", "event_id", "ts"
        ),
        ["event_type"],
        _IVO_BURST_GAP_US,
    ).select(
        F.col("iv_start").alias("b_start"), F.col("iv_end").alias("b_end")
    )
    bucket_of = lambda col: F.expr(  # noqa: E731 — readability helper
        f"unix_micros(CAST({col} AS TIMESTAMP)) DIV {_IVO_BUCKET_US}"
    )
    s_b = sessions.withColumn(
        "bucket",
        F.explode(F.sequence(bucket_of("s_start"), bucket_of("s_end"))),
    )
    b_b = bursts.withColumn(
        "bucket",
        F.explode(F.sequence(bucket_of("b_start"), bucket_of("b_end"))),
    )
    return (
        s_b.join(b_b, "bucket")
        .filter(
            (F.col("s_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("s_end"))
            & (
                F.col("bucket")
                == F.greatest(bucket_of("s_start"), bucket_of("b_start"))
            )
        )
        .select("user_id", "s_start", "s_end", "b_start", "b_end")
    )


ORACLES: dict[str, str] = {
    "join_interval_overlap": f"""
        WITH e AS (
            SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ),
        s_flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                > {_IVO_SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_iv
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s_numbered AS (
            SELECT user_id, ts,
                   SUM(new_iv) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS iv_idx
            FROM s_flagged
        ),
        sessions AS (
            SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM s_numbered GROUP BY user_id, iv_idx
        ),
        b_flagged AS (
            SELECT event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                > {_IVO_BURST_GAP_US}
                        THEN 1 ELSE 0 END AS new_iv
            FROM e WHERE event_type = 'error'
            WINDOW w AS (ORDER BY ts, event_id)
        ),
        b_numbered AS (
            SELECT ts,
                   SUM(new_iv) OVER (
                       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
                   ) AS iv_idx
            FROM b_flagged
        ),
        bursts AS (
            SELECT MIN(ts) AS b_start, MAX(ts) AS b_end
            FROM b_numbered GROUP BY iv_idx
        )
        SELECT user_id, s_start, s_end, b_start, b_end
        FROM sessions, bursts
        WHERE s_start <= b_end AND b_start <= s_end
    """,
    "join_asof_forward": """
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
            FROM events
        )
        SELECT event_id, user_id,
               MIN(CASE WHEN event_type = 'error' THEN t_us END) OVER (
                   PARTITION BY user_id
                   ORDER BY t_us DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS next_error_us,
               MIN(CASE WHEN event_type = 'error' THEN t_us END) OVER (
                   PARTITION BY user_id
                   ORDER BY t_us DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - t_us AS us_to_error
        FROM e
    """,
    "join_asof_nearest": f"""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
            FROM events
        ),
        q AS (SELECT user_id, t_us FROM e WHERE event_type = 'click'),
        t AS (SELECT user_id, t_us, event_id AS trade_id FROM e
              WHERE event_type = 'purchase'),
        c AS (
            SELECT t.trade_id, t.user_id, t.t_us,
                   (SELECT MAX(q.t_us) FROM q
                     WHERE q.user_id = t.user_id AND q.t_us <= t.t_us)
                       AS b_us,
                   (SELECT MIN(q.t_us) FROM q
                     WHERE q.user_id = t.user_id AND q.t_us >= t.t_us)
                       AS f_us
            FROM t
        ),
        d AS (
            SELECT trade_id, user_id, b_us, f_us,
                   t_us - b_us AS d_b, f_us - t_us AS d_f,
                   COALESCE(t_us - b_us <= {_NEAREST_TOL_US}, FALSE) AS b_ok,
                   COALESCE(f_us - t_us <= {_NEAREST_TOL_US}, FALSE) AS f_ok
            FROM c
        )
        SELECT trade_id, user_id,
               CASE WHEN b_ok AND (NOT f_ok OR d_b <= d_f) THEN b_us
                    WHEN f_ok THEN f_us END AS nearest_us,
               CASE WHEN b_ok AND (NOT f_ok OR d_b <= d_f) THEN d_b
                    WHEN f_ok THEN d_f END AS gap_us,
               CASE WHEN b_ok AND (NOT f_ok OR d_b <= d_f) THEN 'backward'
                    WHEN f_ok THEN 'forward' END AS direction
        FROM d
    """,
    "join_bloom_prefilter": f"""
        WITH hot AS (
            SELECT DISTINCT c_custkey % 150 AS key FROM customer
            WHERE c_acctbal > 9000
        )
        SELECT event_type, COUNT(*) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_hot_users
        FROM events
        WHERE user_id IN (SELECT key FROM hot)
        GROUP BY event_type
    """,
    "merge_scd2": """
        WITH dim AS (
            SELECT c_custkey AS key,
                   CAST(c_acctbal AS DECIMAL(18,4)) AS bal,
                   CAST(1 AS BIGINT) AS version
            FROM customer
        ),
        incoming AS (
            SELECT CASE WHEN c_custkey % 97 = 0 THEN c_custkey + 1000000
                        ELSE c_custkey END AS key,
                   CASE WHEN c_custkey % 10 = 0
                        THEN CAST(c_acctbal AS DECIMAL(18,4)) + 100
                        ELSE CAST(c_acctbal AS DECIMAL(18,4)) END AS new_bal
            FROM customer
            WHERE c_custkey % 10 = 0 OR c_custkey % 97 = 0
        ),
        j AS (
            SELECT dim.key AS dkey, incoming.key AS ikey, bal, version,
                   new_bal
            FROM dim FULL OUTER JOIN incoming ON dim.key = incoming.key
        )
        SELECT dkey AS key, CAST(bal AS DOUBLE) AS bal, version,
               'closed' AS row_status
        FROM j WHERE new_bal IS NOT NULL AND bal IS NOT NULL
                 AND new_bal <> bal
        UNION ALL
        SELECT COALESCE(dkey, ikey), CAST(new_bal AS DOUBLE),
               CAST(CASE WHEN bal IS NULL THEN 1 ELSE 2 END AS BIGINT),
               'open'
        FROM j WHERE bal IS NULL
                 OR (new_bal IS NOT NULL AND new_bal <> bal)
        UNION ALL
        SELECT dkey, CAST(bal AS DOUBLE), version, 'open'
        FROM j WHERE bal IS NOT NULL
                 AND (new_bal IS NULL OR new_bal = bal)
    """,
    "join_range": """
        WITH e AS (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
            FROM events
        ),
        marks AS (
            SELECT event_id, ts, event_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS rn
            FROM e
        ),
        iv AS (
            SELECT event_id AS iv_id, event_type AS iv_type, ts AS iv_start,
                   ts + INTERVAL 45 MINUTE AS iv_end
            FROM marks WHERE (rn - 1) % 50 = 0
        )
        SELECT iv_id, iv_type, iv_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM iv JOIN e ON e.ts >= iv_start AND e.ts < iv_end
        GROUP BY iv_id, iv_type, iv_start
    """,
    "join_snapshot_diff": """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        ),
        src AS (
            SELECT o_orderkey AS src_key,
                   md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS src_fp
            FROM base
        ),
        tgt_rows AS (
            SELECT o_orderkey,
                   o_orderstatus,
                   CASE WHEN o_orderkey % 101 = 1 THEN '9-DRIFTED'
                        ELSE o_orderpriority END AS o_orderpriority
            FROM base WHERE o_orderkey % 97 <> 0
            UNION ALL
            SELECT -o_orderkey, o_orderstatus, o_orderpriority
            FROM base WHERE o_orderkey % 499 = 0
        ),
        tgt AS (
            SELECT o_orderkey AS tgt_key,
                   md5(concat_ws('|', o_orderstatus, o_orderpriority)) AS tgt_fp
            FROM tgt_rows
        ),
        joined AS (
            SELECT COALESCE(src_key, tgt_key) AS o_orderkey,
                   CASE WHEN tgt_key IS NULL THEN 'source_only'
                        WHEN src_key IS NULL THEN 'target_only'
                        WHEN src_fp <> tgt_fp THEN 'changed'
                        ELSE 'equal' END AS diff_type
            FROM src FULL OUTER JOIN tgt ON src_key = tgt_key
        )
        SELECT o_orderkey, diff_type FROM joined WHERE diff_type <> 'equal'
    """,
    "join_watermark_compare": """
        WITH ev AS (
            SELECT *, 'db' || CAST(user_id % 4 AS VARCHAR) AS db_name FROM events
        ),
        src AS (SELECT db_name, MAX(event_id) AS src_wm FROM ev GROUP BY db_name),
        tgt AS (
            SELECT db_name, MAX(event_id) AS tgt_wm FROM ev
            WHERE event_id <= (SELECT MAX(event_id) - 200 FROM events)
            GROUP BY db_name
        )
        SELECT src.db_name, src_wm, tgt_wm,
               CASE WHEN tgt_wm IS NULL THEN 'bootstrap_required'
                    WHEN tgt_wm = src_wm THEN 'in_sync'
                    WHEN tgt_wm < src_wm THEN 'behind'
                    ELSE 'ahead' END AS status
        FROM src LEFT JOIN tgt ON src.db_name = tgt.db_name
    """,
    "join_broadcast": """
        SELECT n_name, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_sortmerge": """
        SELECT o_orderstatus, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus
    """,
    "join_left": """
        SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
          ON c_custkey = o_custkey
    """,
    "join_semi": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "join_anti": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "join_asof": """
        SELECT t.event_id AS trade_id, t.user_id,
               (SELECT MAX(CAST(q.ts AS TIMESTAMP)) FROM events q
                 WHERE q.event_type = 'click'
                   AND q.user_id = t.user_id
                   AND q.ts <= t.ts) AS asof_ts
        FROM events t
        WHERE t.event_type = 'purchase'
    """,
    "join_theta": """
        WITH iv AS (
            SELECT user_id, event_type, MIN(ts) AS s, MAX(ts) AS e
            FROM events GROUP BY user_id, event_type
        )
        SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id
         AND a.event_type < b.event_type
         AND a.s <= b.e AND b.s <= a.e
    """,
    "join_full": """
        WITH early AS (
            SELECT DISTINCT o_custkey AS src_key FROM orders
            WHERE o_orderdate < TIMESTAMP '1998-01-01'
        ),
        late AS (
            SELECT DISTINCT o_custkey AS tgt_key FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        )
        SELECT COALESCE(src_key, tgt_key) AS c_custkey,
               CASE WHEN src_key IS NULL THEN 'target_only'
                    WHEN tgt_key IS NULL THEN 'source_only'
                    ELSE 'matched' END AS status
        FROM early FULL OUTER JOIN late ON src_key = tgt_key
    """,
}

QUERY_FNS = {
    "join_interval_overlap": join_interval_overlap,
    "join_watermark_compare": join_watermark_compare,
    "join_broadcast": join_broadcast,
    "join_sortmerge": join_sortmerge,
    "join_left": join_left,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_asof": join_asof,
    "join_theta": join_theta,
    "join_full": join_full,
    "join_snapshot_diff": join_snapshot_diff,
    "join_range": join_range,
    "merge_scd2": merge_scd2,
    "join_bloom_prefilter": join_bloom_prefilter,
    "join_asof_forward": join_asof_forward,
    "join_asof_nearest": join_asof_nearest,
}
