"""Dump explain('formatted') for the named registry keys (no timed runs —
plan text only; used to produce plans/r15/*_{before,after}.txt evidence).

Usage: python scripts/dump_plans.py --keys k1,k2 --out-dir plans/r15 \
          [--suffix _after] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--keys", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--suffix", default="_after")
    args = ap.parse_args()

    from hive3_replication_spark.registry import build_queries
    from hive3_replication_spark.session import get_spark

    spark = get_spark(app_name="h3r-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    os.makedirs(args.out_dir, exist_ok=True)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for key in args.keys.split(","):
        df = queries[key](spark, args.sf)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.out_dir, f"{key}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
