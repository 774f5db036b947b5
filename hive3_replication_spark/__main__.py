"""CLI entry point — the engine's ``bash hive3repl.sh <dbname>``
(``hive3repl.sh:40-57``): one argument selects the database; config comes
from flags/env instead of ``env.sh``.

Usage:
    python -m hive3_replication_spark DBNAME \
        --source-root DIR --target-root DIR --repl-root DIR \
        [--watermark-dir DIR] [--run-dir DIR] [--allowlist db1,db2] \
        [--include-external-tables] [--incr-rerun N] [--rerun-sleep SECS] \
        [--log-upload-dir DIR]

Exit codes: 0 = verified success; 1 = any ladder failure (mirrors the
reference's nonzero exits at ``hive3repl.sh:110-119``).
"""

from __future__ import annotations

import argparse
import json
import sys

from .repl.model import STATUS_SUCCESS, ReplConfig
from .repl.pipeline import run_replication
from .repl.registry import LockHeldError
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="hive3_replication_spark")
    parser.add_argument("db_name")
    parser.add_argument("--source-root", required=True)
    parser.add_argument("--target-root", required=True)
    parser.add_argument("--repl-root", required=True)
    parser.add_argument("--watermark-dir")
    parser.add_argument("--run-dir")
    parser.add_argument("--allowlist", default="")
    parser.add_argument("--include-external-tables", action="store_true")
    parser.add_argument("--incr-rerun", type=int, default=3)  # env.sh:24
    parser.add_argument("--rerun-sleep", type=float, default=60.0)  # env.sh:26
    # env.sh:39-41 HDFS_UPLOAD / HDFS_UPLOAD_DIR: passing the dir enables
    # the run-log artifact export (S9)
    parser.add_argument("--log-upload-dir")
    args = parser.parse_args(argv)

    cfg = ReplConfig(
        db_name=args.db_name,
        source_root=args.source_root,
        target_root=args.target_root,
        repl_root=args.repl_root,
        db_allowlist=tuple(a for a in args.allowlist.split(",") if a),
        include_external_tables=args.include_external_tables,
        incr_rerun=args.incr_rerun,
        rerun_sleep_s=args.rerun_sleep,
        log_upload=args.log_upload_dir is not None,
        log_upload_dir=args.log_upload_dir,
    )
    spark = get_spark(app_name=f"h3r-{args.db_name}")
    try:
        report = run_replication(
            spark,
            cfg,
            run_dir=args.run_dir or f"{args.repl_root}/_run",
            watermark_dir=args.watermark_dir or f"{args.target_root}/_watermarks",
        )
    except LockHeldError as exc:
        # another run in progress (hive3repl.sh:67-70 instance lock exit)
        print(json.dumps({"db_name": args.db_name, "status": "locked",
                          "error": str(exc)}))
        return 2
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0 if report["status"] == STATUS_SUCCESS else 1


if __name__ == "__main__":
    sys.exit(main())
