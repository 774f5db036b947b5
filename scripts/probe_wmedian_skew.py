"""Measured justification for skew.weighted_median_histogram (round 8).

The exact one-window weighted median funnels |distinct values| of the
skewed group through ONE window sort task; the histogram fallback caps
that task at |distinct values in one bucket| (~1/B). This probe plants
the worst shape — a single group holding ~all rows with ~every value
distinct — at two sizes and measures both forms (min-of-2), asserting
bit-identical results while recording the walls for docs/SCALE.md.

Usage: python scripts/probe_wmedian_skew.py [rows ...]   (default 2e5 2e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hive3_replication_spark.operators.skew import weighted_median_histogram
from hive3_replication_spark.session import get_spark


def exact_form(df):
    """The agg_weighted_median window plan, inlined over an arbitrary df
    (the registered key reads lineitem from a sf_dir; same columns here)."""
    from pyspark.sql import Window

    per_price = (
        df.select(
            "l_returnflag",
            F.col("l_extendedprice").cast("decimal(18,4)").alias("price"),
            F.col("l_quantity").cast("decimal(18,4)").alias("w"),
        )
        .groupBy("l_returnflag", "price")
        .agg(F.sum("w").alias("pw"))
    )
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = per_price.withColumn("cw", F.sum("pw").over(w_run)).withColumn(
        "tw", F.sum("pw").over(w_all)
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("price").cast("double"), 4).alias(
                "weighted_median_price"
            ),
            F.round(F.max("tw").cast("double"), 4).alias("total_weight"),
        )
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [200_000, 2_000_000]
    spark = get_spark(app_name="h3r-probe-wmedian")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        # one dominant group, every price distinct (worst case: the
        # per-price pre-aggregate does not shrink the window input at all)
        df = spark.range(0, n).select(
            F.lit("A").alias("l_returnflag"),
            (F.col("id") * 0.25 + 100).cast("double").alias("l_extendedprice"),
            ((F.col("id") % 7) + 1).cast("double").alias("l_quantity"),
        )
        path = os.path.join(".scaleprobe", f"wmedian_{n}")
        if not os.path.exists(path):
            df.write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)

        def timed(fn):
            walls = []
            rows = None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(src).collect()
                walls.append(time.perf_counter() - t0)
            return min(walls), sorted(map(tuple, rows))

        exact_wall, exact_rows = timed(exact_form)
        hist_wall, hist_rows = timed(
            lambda d: weighted_median_histogram(
                d, "l_returnflag", "l_extendedprice", "l_quantity"
            )
        )
        assert exact_rows == hist_rows, (exact_rows, hist_rows)
        print(
            json.dumps(
                {
                    "metric": "wmedian_skew_probe",
                    "rows": n,
                    "distinct_values": n,
                    "exact_window_sec": round(exact_wall, 3),
                    "histogram_sec": round(hist_wall, 3),
                    "identical": True,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
