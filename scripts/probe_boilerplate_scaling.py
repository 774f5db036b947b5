"""Two-decade counter probe for the L33 line-boilerplate filter (round 10).

The skew-safe design's scale claims: (1) line tiling and frequency are
corpus-LINEAR (the groupBy partially aggregates hot lines map-side — no
per-line quadratic or skew surface exists); (2) the ≥T frequent set —
the relation the drop join must hold on one side — grows linearly with
DISTINCT boilerplate lines, not with corpus volume per line. The scale
fixture's per-copy token suffixes make each copy's line vocabulary
disjoint, so every counter must read EXACTLY ×10 / ×100 — any
super-linear drift would expose a hidden pair surface.

(At some corpus size the frequent set outgrows the broadcast threshold;
the join degrades gracefully to a shuffled join on the line key — both
sides already aggregated/narrow. The probe records the frequent-set
size so that crossover is a number, not a guess.)

Usage: python scripts/probe_boilerplate_scaling.py (uses $SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive3_replication_spark.catalog import load_table  # noqa: E402
from hive3_replication_spark.llm.text import (  # noqa: E402
    _BP_T,
    _BP_W,
    llm_line_boilerplate,
)
from hive3_replication_spark.session import get_spark  # noqa: E402
from scripts.gen_scale_probe import generate  # noqa: E402


def _counters(spark, d: str) -> dict:
    documents = load_table(spark, d, "documents")
    toked = documents.select(
        "doc_id",
        F.explode(F.array(F.split(F.col("text"), " "))).alias("toks"),
    )
    tiles = F.expr(
        f"transform(sequence(0, (size(toks) + {_BP_W - 1}) DIV {_BP_W} - 1),"
        f" i -> array_join(slice(toks, i * {_BP_W} + 1, {_BP_W}), ' '))"
    )
    lines = toked.select("doc_id", F.explode(tiles).alias("line"))
    freq = lines.groupBy("line").agg(F.count("*").alias("occ"))
    out = {
        "n_line_instances": lines.count(),
        "n_distinct_lines": freq.count(),
        # the drop join's small side — the broadcast-crossover number
        "n_frequent_lines": freq.filter(F.col("occ") >= _BP_T).count(),
    }
    t0 = time.perf_counter()
    res = llm_line_boilerplate(spark, d).agg(
        F.sum("n_lines").alias("nl"), F.sum("n_dropped").alias("nd")
    ).collect()[0]
    out["operator_sec"] = round(time.perf_counter() - t0, 3)
    out["n_lines_total"] = int(res["nl"])
    out["n_dropped_total"] = int(res["nd"])
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    x10_dir = os.path.join(repo_root, ".scaleprobe", "sf1")
    x100_dir = os.path.join(repo_root, ".scaleprobe", "sf10")
    spark = get_spark(app_name="h3r-probe-boilerplate")
    spark.sparkContext.setLogLevel("ERROR")
    generate(sf_dir, x10_dir, factor=10)
    generate(sf_dir, x100_dir, factor=100)

    out: dict = {"metric": "line_boilerplate_scaling_probe"}
    for tag, d in (("base", sf_dir), ("x10", x10_dir), ("x100", x100_dir)):
        for k, v in _counters(spark, d).items():
            out[f"{k}_{tag}"] = v
    for k in (
        "n_line_instances",
        "n_distinct_lines",
        "n_frequent_lines",
        "n_dropped_total",
    ):
        out[f"{k}_ratio_x10"] = round(
            out[f"{k}_x10"] / max(out[f"{k}_base"], 1), 3
        )
        out[f"{k}_ratio_x100"] = round(
            out[f"{k}_x100"] / max(out[f"{k}_base"], 1), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
