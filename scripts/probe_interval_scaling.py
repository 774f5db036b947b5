"""Two-decade counter probe for the J17 interval-overlap join (round 9).

The bucket-blocked interval join's scale claim is that its join cost is
O(Σ interval-hours) — NEVER |sessions| × |bursts| — because the burst
side of any one bucket is bounded by interval merging (denser data makes
bursts LONGER, not more numerous, so per-bucket burst multiplicity stays
~1). This probe measures the claim across two decades (sf0.1 base → 10x
→ 100x, the probe_ngram_100x practice): session counts must scale
exactly with the copies (users are strided, so per-user streams are
bit-identical), burst counts must SHRINK (merging), and the pre-filter
candidate volume (the bucket-join output — the true cost driver) must
grow ~linearly with the corpus, not quadratically.

Usage: python scripts/probe_interval_scaling.py  (uses $SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive3_replication_spark.catalog import load_table  # noqa: E402
from hive3_replication_spark.operators.joins import (  # noqa: E402
    _intervals,
    _IVO_BUCKET_US,
    _IVO_BURST_GAP_US,
    _IVO_SESSION_GAP_US,
    join_interval_overlap,
)
from hive3_replication_spark.session import get_spark  # noqa: E402
from scripts.gen_scale_probe import generate  # noqa: E402


def _counters(spark, d: str) -> dict:
    events = load_table(spark, d, "events")
    sessions = _intervals(
        events.select("user_id", "event_id", "ts"),
        ["user_id"],
        _IVO_SESSION_GAP_US,
    ).select(
        F.col("iv_start").alias("s_start"), F.col("iv_end").alias("s_end")
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
    bucket_of = lambda col: F.expr(  # noqa: E731
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
    out = {
        "n_sessions": sessions.count(),
        "n_bursts": bursts.count(),
        "session_bucket_rows": s_b.count(),
        "burst_bucket_rows": b_b.count(),
        # the bucket-join output BEFORE the overlap filter — the volume a
        # reducer actually processes (the quadratic-blowup risk surface)
        "candidates": s_b.join(b_b, "bucket").count(),
    }
    t0 = time.perf_counter()
    out["output_rows"] = join_interval_overlap(spark, d).count()
    out["operator_sec"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    x10_dir = os.path.join(repo_root, ".scaleprobe", "sf1")
    x100_dir = os.path.join(repo_root, ".scaleprobe", "sf10")
    spark = get_spark(app_name="h3r-probe-interval")
    spark.sparkContext.setLogLevel("ERROR")
    generate(sf_dir, x10_dir, factor=10)
    generate(sf_dir, x100_dir, factor=100)

    out: dict = {"metric": "interval_overlap_scaling_probe"}
    for tag, d in (("base", sf_dir), ("x10", x10_dir), ("x100", x100_dir)):
        for k, v in _counters(spark, d).items():
            out[f"{k}_{tag}"] = v
    for k in ("n_sessions", "candidates", "output_rows"):
        out[f"{k}_ratio_x10"] = round(out[f"{k}_x10"] / max(out[f"{k}_base"], 1), 3)
        out[f"{k}_ratio_x100"] = round(
            out[f"{k}_x100"] / max(out[f"{k}_base"], 1), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
