"""One-time sf1.0 empirical parity + timing sweep (VERDICT r10 ask #2).

Every 100x claim in docs/SCALE.md is plan-shape + counter extrapolation;
this script MEASURES one decade above the per-round gate: it expands
/root/testdata/sf0.1 by 10x with scripts/gen_scale_probe.py (referential
integrity + disjoint per-copy token vocabularies — ~6M-row lineitem,
~1.5M events, ~59k documents) and runs the TARGET KEY SET — the ask's
data-proportional SCALE_PROBE_KEYS plus the round-11 driver window —
against the DuckDB oracles on that data, on a PLAIN SparkSession (the
driver's exact environment), recording per-key ENGINE wall seconds,
ORACLE wall seconds, row count, and pass/fail into PARITY_SF1.json.

Resume-aware: keys already recorded as passing in an existing output
file are kept and skipped, so an interrupted sweep continues instead of
restarting. ORACLE_SKIP lists keys whose DuckDB replay itself does not
scale to sf1 (an oracle-implementation cost, not an engine property —
the first full-registry attempt spent 25+ min inside DuckDB on
ts_downsample_lttb_hier's two-level list replay at 1.5M events while
the engine side finished in seconds); those keys record engine wall +
rows with pass=null and the reason.

Usage: python scripts/parity_sf1.py [--out PARITY_SF1.json] [--all]
                                    [--next N]
(--all sweeps every registered key — the original full-registry mode;
--next N targets the first N not-yet-measured keys in registry sweep
order — oldest-driver-stamp first, the VERDICT r11 ask-#3 tranche
rotation — on top of everything already recorded in the output file.)
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

    from bench import SCALE_PROBE_KEYS
    from hive3_replication_spark.llm.dedup import clear_caches
    from hive3_replication_spark.registry import build_oracles, build_queries
    from tests.conftest import assert_frames_match

    queries, oracles = build_queries(), build_oracles()
    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        # resume: keep prior passing AND oracle-skip records (pass=None);
        # re-running a skip's engine pass every resume was pure waste
        # (ADVICE r11). Failures are dropped so they re-run.
        prior = json.loads(Path(out_path).read_text()).get("keys", {})
        results.update(
            {k: v for k, v in prior.items() if v.get("pass") is not False}
        )
    if "--all" in sys.argv:
        targets = list(queries)
    elif "--next" in sys.argv:
        n = int(sys.argv[sys.argv.index("--next") + 1])
        fresh = [k for k in queries if k not in results][:n]
        targets = list(results) + fresh
    else:
        window = list(queries)[:50]
        targets = window + [k for k in SCALE_PROBE_KEYS if k not in window]

    # oracle replays that are themselves super-linear in DuckDB at sf1 —
    # engine timing still recorded; parity for these keys holds at sf0.1
    # (scripts/parity_sf01.sh) and on every fuzz corpus
    oracle_skip = {
        "ts_downsample_lttb_hier": (
            "DuckDB two-level list replay is the bottleneck at 1.5M "
            "events (25+ min oracle-side vs ~2 s engine-side); parity "
            "pinned at sf0.1 + fuzz"
        ),
    }

    t_begin = time.perf_counter()
    todo = [k for k in targets if k not in results]
    for i, key in enumerate(todo, 1):
        fn = queries[key]
        rec: dict = {}
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, probe_dir).toPandas()
            rec["wall_s"] = round(time.perf_counter() - t0, 3)
            rec["rows"] = int(len(spark_pdf))
            if key in oracle_skip:
                rec["pass"] = None
                rec["oracle_skipped"] = oracle_skip[key]
            else:
                t1 = time.perf_counter()
                oracle_pdf = con.sql(oracles[key]).df()
                rec["oracle_wall_s"] = round(time.perf_counter() - t1, 3)
                assert_frames_match(spark_pdf, oracle_pdf, key)
                rec["pass"] = True
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec.setdefault("wall_s", round(time.perf_counter() - t0, 3))
            rec["pass"] = False
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        results[key] = rec
        status = (
            "ok"
            if rec["pass"]
            else ("oracle-skip" if rec["pass"] is None else "FAIL")
        )
        print(
            f"[{i}/{len(todo)}] {key}: {status} "
            f"{rec['wall_s']}s rows={rec.get('rows')}",
            flush=True,
        )
        # incremental dump: a killed sweep still leaves evidence
        Path(out_path).write_text(
            json.dumps(
                {
                    "sf": 1.0,
                    "complete": False,
                    "n_done": len(results),
                    "n_targets": len(targets),
                    "keys": results,
                },
                indent=1,
            )
        )
    clear_caches()
    n_pass = sum(1 for r in results.values() if r["pass"])
    n_skip = sum(1 for r in results.values() if r["pass"] is None)
    summary = {
        "sf": 1.0,
        "base": "/root/testdata/sf0.1 x10 (gen_scale_probe)",
        # complete means the sweep finished AND nothing failed — a run
        # that ends with recorded failures must not read as done
        # (ADVICE r11)
        "complete": len(results) == n_pass + n_skip,
        "n_keys": len(results),
        "n_pass": n_pass,
        "n_oracle_skip": n_skip,
        "total_wall_s": round(time.perf_counter() - t_begin, 1),
        "keys": results,
    }
    Path(out_path).write_text(json.dumps(summary, indent=1))
    print(
        f"\n{n_pass} pass / {n_skip} oracle-skip / "
        f"{len(results) - n_pass - n_skip} fail of {len(results)} — "
        f"wrote {out_path}"
    )


if __name__ == "__main__":
    main()
