"""Skew-handling utilities (SURVEY.md scale design; task brief: "skewed keys
→ salting or AQE skew-join").

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these helpers
cover the two shapes AQE does not: a skewed *aggregation* key, and a skewed
join against a *broadcast-ineligible* dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
