"""Skew-handling utilities (SURVEY.md scale design; task brief: "skewed keys
→ salting or AQE skew-join").

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these helpers
cover the two shapes AQE does not: a skewed *aggregation* key, and a skewed
join against a *broadcast-ineligible* dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _salt(n_salts: int) -> F.Column:
    """Deterministic-per-row salt without requiring a natural subkey."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame, key: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-stage salted aggregation: stage 1 groups on (key, salt) so a hot
    key spreads over ``n_salts`` reducers; stage 2 merges the partials with
    their merge-compatible forms (count→sum, sum→sum, max→max). Decimal
    accumulation keeps the merged sum exact, so the result is bit-identical
    to the unsalted plan (asserted in tests/test_skew.py).

    Returns (key, n_rows, sum_value, max_value).
    """
    stage1 = df.withColumn("_salt", _salt(n_salts)).groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_sum"),
        F.max(value_col).alias("_max"),
    )
    return stage1.groupBy(key).agg(
        F.sum("_cnt").alias("n_rows"),
        F.sum("_sum").cast("double").alias("sum_value"),
        F.max("_max").alias("max_value"),
    )


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skewed fact × replicated dim: the fact side gets a per-row salt, the
    dim side is exploded ``n_salts`` ways, and the join key becomes
    (key, salt) — a hot key's rows land on ``n_salts`` different reducers.
    Use when the dim is too big to broadcast but far smaller than the fact.
    """
    salted_fact = fact.withColumn("_salt", _salt(n_salts))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")


def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation as a registered operator: per-event-type stats
    through the two-stage (key, salt) plan. The salt is internal — the
    oracle is the plain one-stage GROUP BY, proving the hot-key spreading
    changes the shuffle layout but not one bit of the answer."""
    events = load_table(spark, sf_dir, "events")
    return salted_agg(events, "event_type", "value")


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact×dim join as a registered operator: lineitem joined to
    supplier through the (key, salt) scheme (the broadcast-ineligible-dim
    shape), then rolled up per nation. Oracle = the plain equi join +
    GROUP BY: salting must be invisible in the result."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        salted_join(lineitem, supplier, "s_suppkey")
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


#: Measured exact-vs-histogram crossover: per-group |distinct values|
#: above which the two-pass histogram form wins (docs/SCALE.md round-8:
#: crossover ~1M distinct values; 5.5x faster at 20M). The auto strategy
#: probes a cheap per-group approx distinct estimate against this.
_WM_AUTO_CROSSOVER = 1_000_000


def weighted_median_exact(
    df: DataFrame, key: str, value_col: str, weight_col: str
) -> DataFrame:
    """The A26 one-window exact weighted median (lower), generalized over
    any (key, value, weight) relation — the form
    ``aggregates.agg_weighted_median`` registers over lineitem. Per-value
    weights are pre-aggregated (the window input is |distinct values|,
    never the fact), the running and total weights come from two frames
    over ONE partitioned sort, and the crossing test is the division-free
    ``2·cum >= total``. NULL values/weights are excluded (the shared
    precondition that keeps this form and the histogram form
    bit-identical — see ``weighted_median_histogram``).

    Returns (key, weighted_median_price, total_weight) — the shared A26
    column contract."""
    from pyspark.sql import Window

    per_value = (
        df.select(
            F.col(key),
            F.col(value_col).cast("decimal(18,4)").alias("_v"),
            F.col(weight_col).cast("decimal(18,4)").alias("_w"),
        )
        .filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
        .groupBy(key, "_v")
        .agg(F.sum("_w").alias("_pw"))
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    cum = per_value.withColumn("_cw", F.sum("_pw").over(w_run)).withColumn(
        "_tw", F.sum("_pw").over(w_all)
    )
    return (
        cum.filter(F.col("_cw") * 2 >= F.col("_tw"))
        .groupBy(key)
        .agg(
            F.round(F.min("_v").cast("double"), 4).alias(
                "weighted_median_price"
            ),
            F.round(F.max("_tw").cast("double"), 4).alias("total_weight"),
        )
    )


def weighted_median_strategy(df: DataFrame, key: str, value_col: str) -> str:
    """The A26 auto decision probe as a reusable step: one cheap 2-column
    scan (HLL-sketched max per-group distinct count, collected as a
    single scalar) against the measured crossover. Exposed separately so
    a caller whose input is stable (the registered fixture key, a daily
    production table) can run it ONCE and pin the result — the probe is
    an eager Spark job, and re-running it on every plan construction
    (EXPLAIN, bench passes) would charge the real query for repeated
    probe scans (round-9 review)."""
    est = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key)
        .agg(F.approx_count_distinct(value_col).alias("_d"))
        .agg(F.max("_d").alias("_m"))
        .collect()[0]["_m"]
    )
    return "histogram" if (est or 0) > _WM_AUTO_CROSSOVER else "exact"


def weighted_median(
    df: DataFrame,
    key: str,
    value_col: str,
    weight_col: str,
    strategy: str = "auto",
    n_buckets: int = 1024,
) -> DataFrame:
    """A26 entry point with the measured decision rule wired in (round-9
    VERDICT ask #4): ``strategy='exact'`` runs the one-window form,
    ``'histogram'`` the two-pass bucketed form, and ``'auto'`` probes the
    MAX per-group approx-distinct count of ``value_col`` (one cheap
    2-column scan, HLL-sketched, collected as a single scalar) and routes
    above ``_WM_AUTO_CROSSOVER`` (~1M distinct values, the measured
    crossover in docs/SCALE.md) to the histogram form. Both forms are
    bit-identical on NULL-free input (tests/test_skew.py), and both
    exclude NULL values/weights, so strategy only changes the PLAN,
    never the answer."""
    if strategy == "auto":
        strategy = weighted_median_strategy(df, key, value_col)
    if strategy == "histogram":
        return weighted_median_histogram(
            df, key, value_col, weight_col, n_buckets=n_buckets
        )
    if strategy != "exact":
        raise ValueError(f"unknown weighted_median strategy: {strategy!r}")
    return weighted_median_exact(df, key, value_col, weight_col)


def weighted_median_histogram(
    df: DataFrame,
    key: str,
    value_col: str,
    weight_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-pass histogram weighted median (lower) — the skew fallback the
    A26 docstring promises (``aggregates.agg_weighted_median``) for the
    shape its one-window exact form handles worst: ONE dominant group
    whose |distinct values| is itself huge, so even the per-value
    pre-aggregate funnels millions of rows through a single window sort
    task.

    Pass structure (all JVM-side, no UDFs):

    1. per-group bounds + total weight (one hash agg, K rows, broadcast);
    2. monotone decimal bucketing of values into ``n_buckets`` per group
       (map-side), then per-(group, bucket) weight sums — a hash agg of
       at most K*B rows — and a window over <=B rows per group to find
       the first bucket where ``2*cum >= total`` plus the cumulative
       weight BEFORE it;
    3. rows of the target bucket only (broadcast K-row join, filter in
       the scan stage) go through the exact per-value form, seeded with
       the carried ``cum_before``.

    The single-task window input shrinks from |distinct values in group|
    to |distinct values in ONE bucket| (~1/B of it); every other exchange
    is a partial-aggregated hash agg or a K-row broadcast. Bucketing is
    decimal arithmetic, and decimal rounding is monotone, so buckets are
    contiguous value ranges and the crossing value found in the target
    bucket is EXACTLY the global crossing value — the result is
    bit-identical to the one-window form (asserted in tests/test_skew.py
    across bucket counts and a planted 90%-one-group fixture).

    Returns (key, weighted_median_price, total_weight) with the same
    column contract as ``agg_weighted_median``.

    NULL values/weights are excluded up front: an unfiltered NULL value
    would land in bucket n_buckets-1 (``least`` skips NULLs) while the
    exact form's sort placed it first — the round-8 bit-identical
    contract therefore holds over the NULL-free relation, which both
    forms now enforce themselves (ADVICE r8).
    """
    from pyspark.sql import Window

    fact = df.select(
        F.col(key),
        F.col(value_col).cast("decimal(18,4)").alias("_v"),
        F.col(weight_col).cast("decimal(18,4)").alias("_w"),
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    bounds = fact.groupBy(key).agg(
        F.min("_v").alias("_vmin"),
        F.max("_v").alias("_vmax"),
        F.sum("_w").alias("_tw"),
    )
    # Monotone bucket id: decimal subtraction/multiply/divide round
    # half-up at fixed scale — monotone non-decreasing in _v — so each
    # bucket is a contiguous value range; vmax maps to B and is clipped.
    with_b = fact.join(F.broadcast(bounds), key).withColumn(
        "_b",
        F.when(F.col("_vmax") == F.col("_vmin"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col("_v") - F.col("_vmin"))
                    * n_buckets
                    / (F.col("_vmax") - F.col("_vmin"))
                ).cast("int"),
            )
        ),
    )
    per_bucket = with_b.groupBy(key, "_b").agg(F.sum("_w").alias("_bw"))
    w_run = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    crossing = (
        per_bucket.withColumn("_cum", F.sum("_bw").over(w_run))
        .join(F.broadcast(bounds.select(key, "_tw")), key)
        .filter(F.col("_cum") * 2 >= F.col("_tw"))
    )
    target = (
        crossing.groupBy(key)
        .agg(
            F.min_by(
                F.struct(
                    F.col("_b").alias("_tb"),
                    (F.col("_cum") - F.col("_bw")).alias("_cb"),
                ),
                F.col("_b"),
            ).alias("_t")
        )
        .select(
            key,
            F.col("_t._tb").alias("_tb"),
            F.col("_t._cb").alias("_cum_before"),
        )
    )
    in_bucket = with_b.join(F.broadcast(target), key).filter(
        F.col("_b") == F.col("_tb")
    )
    per_price = in_bucket.groupBy(key, "_v", "_tw", "_cum_before").agg(
        F.sum("_w").alias("_pw")
    )
    w_price = (
        Window.partitionBy(key)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_price.withColumn(
            "_cw", F.sum("_pw").over(w_price) + F.col("_cum_before")
        )
        .filter(F.col("_cw") * 2 >= F.col("_tw"))
        .groupBy(key)
        .agg(
            F.round(F.min("_v").cast("double"), 4).alias(
                "weighted_median_price"
            ),
            F.round(F.max("_tw").cast("double"), 4).alias("total_weight"),
        )
    )


ORACLES: dict[str, str] = {
    "agg_skew_salted": """
        SELECT event_type, COUNT(*) AS n_rows,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type
    """,
    "join_skew_salted": """
        SELECT s_nationkey, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS sum_price
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    """,
}

QUERY_FNS = {
    "agg_skew_salted": agg_skew_salted,
    "join_skew_salted": join_skew_salted,
}
