"""100x pair-counter probe for the exact-ngram dedup blocking (round 8).

The round-4 ANN lesson (docs/SCALE.md): a frequency cap is a
SIZE-DEPENDENT tuning parameter — at some scale it can saturate and the
operator silently degrades to empty output. bench.py proves ngram pair
volume is exactly linear at 10x; this probe extends the check a further
decade: at 100x the generator's zero-cross-copy-overlap construction
should keep per-shingle posting lists constant, so the pre-threshold
candidate volume must be exactly 100x the base count and the
post-threshold survivor count exactly 100x as well — any shortfall means
MAX_BUCKET started dropping real blocks.

Usage: python scripts/probe_ngram_100x.py   (uses $SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive3_replication_spark.catalog import load_table
from hive3_replication_spark.llm.dedup import clear_caches, ngram_pair_jaccard
from hive3_replication_spark.session import get_spark
from scripts.gen_scale_probe import generate


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probe_dir = os.path.join(repo_root, ".scaleprobe", "sf10")
    spark = get_spark(app_name="h3r-probe-ngram100x")
    spark.sparkContext.setLogLevel("ERROR")
    generate(sf_dir, probe_dir, factor=100)

    out: dict = {"metric": "ngram_100x_probe"}
    for tag, d in (("base", sf_dir), ("x100", probe_dir)):
        clear_caches()
        docs = load_table(spark, d, "documents")
        t0 = time.perf_counter()
        # pre-threshold candidates (min_jaccard=0, memo bypassed) — the
        # true cost driver; then the production-threshold survivors
        out[f"candidates_{tag}"] = ngram_pair_jaccard(
            docs, f"probe100_{tag}", memo_token=None, min_jaccard=0.0
        ).count()
        out[f"candidates_{tag}_sec"] = round(time.perf_counter() - t0, 3)
        clear_caches()
        t0 = time.perf_counter()
        out[f"survivors_{tag}"] = ngram_pair_jaccard(
            docs, f"probe100s_{tag}", memo_token=None
        ).count()
        out[f"survivors_{tag}_sec"] = round(time.perf_counter() - t0, 3)

    out["candidates_ratio"] = round(
        out["candidates_x100"] / max(out["candidates_base"], 1), 3
    )
    out["survivors_ratio"] = round(
        out["survivors_x100"] / max(out["survivors_base"], 1), 3
    )
    out["linear"] = (
        abs(out["candidates_ratio"] - 100.0) < 0.5
        and abs(out["survivors_ratio"] - 100.0) < 0.5
    )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
