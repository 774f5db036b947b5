"""Single-series LTTB scale probe (VERDICT r6 ask #3).

The flat LTTB chain is sequential PER SERIES, so its worst case is one
pathologically long series: the whole table flows through a single Arrow
group in one worker (measured exponent 0.50 on the 5-stream fixture at
100x — docs/SCALE.md). Hierarchical LTTB (`ts_downsample_lttb_hier`)
chunks the series into bounded 500-point level-1 groups that downsample
in parallel, then re-runs the chain over only the picks — so its
wall-clock on ONE series should grow far slower than the flat chain's.

This probe builds a SINGLE-SERIES events fixture at n and 100n rows and
times both operators cold (min over 2 runs), printing one JSON line with
the measured 100x exponents (log100 of the time ratio). Run from the
repo root:

    python scripts/probe_lttb_hier.py [n_base]   # default n_base=20000
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd


def _fixture(spark, root: str, n: int) -> str:
    """One event_type, n rows, unique strictly-increasing (ts, event_id)."""
    out = os.path.join(root, f"series_{n}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n, dtype="int64") * 250, unit="ms"),
            "user_id": rng.randint(0, 1000, n).astype("int64"),
            "event_type": ["metric"] * n,
            "value": np.round(rng.randn(n) * 50, 3),
            "props": ['{"k": 1}'] * n,
        }
    )
    spark.createDataFrame(pdf).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")
    open(marker, "w").close()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from hive3_replication_spark.operators.timeseries import (
        ts_downsample_lttb,
        ts_downsample_lttb_hier,
    )

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lttb-hier-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaleprobe",
        "lttb_series",
    )
    os.makedirs(root, exist_ok=True)
    sizes = (n_base, n_base * 100)
    dirs = {n: _fixture(spark, root, n) for n in sizes}

    result: dict = {"metric": "lttb_single_series_probe", "n_base": n_base}
    for name, fn in (
        ("flat", ts_downsample_lttb),
        ("hier", ts_downsample_lttb_hier),
    ):
        times = {}
        for n in sizes:
            best = float("inf")
            for _p in range(2):
                t0 = time.perf_counter()
                # the count() is the timed action — keep it a statement so
                # `python -O` (which strips asserts) can't hollow the probe
                n_out = fn(spark, dirs[n]).count()
                best = min(best, time.perf_counter() - t0)
                if n_out <= 0:
                    raise RuntimeError(f"{name}@{n}: empty result")
            times[n] = round(best, 3)
        ratio = times[sizes[1]] / times[sizes[0]]
        result[name] = {
            "base_sec": times[sizes[0]],
            "x100_sec": times[sizes[1]],
            "ratio": round(ratio, 2),
            "exponent": round(float(np.log(ratio) / np.log(100)), 3),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
