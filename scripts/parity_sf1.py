"""One-time sf1.0 empirical parity + timing sweep (VERDICT r10 ask #2).

Every 100x claim in docs/SCALE.md is plan-shape + counter extrapolation;
this script MEASURES one decade above the per-round gate: it expands
/root/testdata/sf0.1 by 10x with scripts/gen_scale_probe.py (referential
integrity + disjoint per-copy token vocabularies — ~6M-row lineitem,
~59k documents) and runs EVERY registered queries() key against its
DuckDB oracle on that data, on a PLAIN SparkSession (the driver's exact
environment), recording per-key wall seconds (Spark side), row count,
and pass/fail into PARITY_SF1.json.

Usage: python scripts/parity_sf1.py [--out PARITY_SF1.json]
Runtime: dominated by the dedup/ANN families; expect a multi-hour run
budget at local[32] (the sf0.1 gate takes ~18 min).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    out_path = "PARITY_SF1.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import duckdb

    from scripts.gen_scale_probe import generate

    repo_root = Path(__file__).resolve().parent.parent
    probe_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", str(repo_root / ".scaleprobe" / "sf1")
    )
    generate("/root/testdata/sf0.1", probe_dir, factor=10)

    # plain driver-equivalent session: engine confs must be set at
    # runtime by catalog.load_table, never assumed
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("parity-sf1")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", os.environ.get("H3R_DRIVER_MEM", "48g"))
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{probe_dir}/{t}.parquet'"
            if os.path.isfile(f"{probe_dir}/{t}.parquet")
            else (
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{probe_dir}/{t}.parquet/*.parquet'"
            )
        )

    from hive3_replication_spark.llm.dedup import clear_caches
    from hive3_replication_spark.registry import build_oracles, build_queries
    from tests.conftest import assert_frames_match

    queries, oracles = build_queries(), build_oracles()
    results: dict[str, dict] = {}
    t_begin = time.perf_counter()
    for i, (key, fn) in enumerate(queries.items(), 1):
        rec: dict = {}
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, probe_dir).toPandas()
            rec["wall_s"] = round(time.perf_counter() - t0, 3)
            rec["rows"] = int(len(spark_pdf))
            oracle_pdf = con.sql(oracles[key]).df()
            assert_frames_match(spark_pdf, oracle_pdf, key)
            rec["pass"] = True
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec.setdefault("wall_s", round(time.perf_counter() - t0, 3))
            rec["pass"] = False
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        results[key] = rec
        status = "ok" if rec["pass"] else "FAIL"
        print(
            f"[{i}/{len(queries)}] {key}: {status} "
            f"{rec['wall_s']}s rows={rec.get('rows')}",
            flush=True,
        )
        # incremental dump: a killed sweep still leaves evidence
        Path(out_path).write_text(
            json.dumps(
                {
                    "sf": 1.0,
                    "complete": False,
                    "n_done": i,
                    "n_keys": len(queries),
                    "keys": results,
                },
                indent=1,
            )
        )
    clear_caches()
    n_pass = sum(1 for r in results.values() if r["pass"])
    summary = {
        "sf": 1.0,
        "base": "/root/testdata/sf0.1 x10 (gen_scale_probe)",
        "complete": True,
        "n_keys": len(results),
        "n_pass": n_pass,
        "total_wall_s": round(time.perf_counter() - t_begin, 1),
        "keys": results,
    }
    Path(out_path).write_text(json.dumps(summary, indent=1))
    print(f"\n{n_pass}/{len(results)} pass — wrote {out_path}")


if __name__ == "__main__":
    main()
