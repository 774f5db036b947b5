"""Replication data model + the verification ladder (SURVEY.md §1, §3.2/3.3).

The reference's state is three scalars per run — ``LAST_REPL_ID`` (target
status before load, ``beeline_functions.sh:24``), ``DUMP_TXID`` (source txid
at dump time, ``:118``), ``POST_LOAD_REPL_ID`` (target status after load,
``:48``) — and a 5-way if/elif classification (``hive3repl.sh:106-120``
bootstrap, ``:155-169`` incremental). Here the state is rows in watermark /
manifest tables (FIXTURES.md §12-13) and the ladder is a pure expression,
usable per-row over millions of databases in one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: repl_watermarks — target-side status (one row per db per run);
#: NULL last_repl_id = never replicated (the reference's "NULL" sentinel,
#: ``hive3repl.sh:85``, normalized to SQL NULL at ingest).
WATERMARK_SCHEMA = StructType(
    [
        StructField("db_name", StringType(), False),
        StructField("last_repl_id", LongType(), True),
        StructField("updated_ts", TimestampType(), False),
    ]
)

#: repl_manifest — source-side dump manifest (path + txid, the parsed
#: ``repl dump`` resultset row, ``beeline_functions.sh:117-118``).
MANIFEST_SCHEMA = StructType(
    [
        StructField("db_name", StringType(), False),
        StructField("dump_path", StringType(), False),
        StructField("dump_txid", LongType(), False),
        StructField("is_bootstrap", BooleanType(), False),
        StructField("created_ts", TimestampType(), False),
    ]
)

# Status values — one per branch of the reference's ladder.
STATUS_SUCCESS = "success"              # post == dump        (hive3repl.sh:106-109)
STATUS_LOAD_FAILED = "load_failed"      # post is NULL        (hive3repl.sh:109 bootstrap NULL branch)
STATUS_NO_PROGRESS = "no_progress"      # post == last        (hive3repl.sh:157-158, incremental only)
STATUS_PARTIAL_LOAD = "partial_load"    # post < dump         (hive3repl.sh:110-112)
STATUS_TARGET_AHEAD = "target_ahead"    # post > dump         (hive3repl.sh:113-115)


def classify_repl_status(
    dump_txid: int | None,
    last_repl_id: int | None,
    post_load_id: int | None,
) -> str:
    """Pure-Python ladder — exhaustively branch-tested (SURVEY.md §7 risk 2).

    Branch order mirrors the reference: failure (NULL) first, then success,
    then the incremental no-progress check, then behind/ahead.
    """
    if post_load_id is None:
        return STATUS_LOAD_FAILED
    if dump_txid is not None and post_load_id == dump_txid:
        return STATUS_SUCCESS
    if last_repl_id is not None and post_load_id == last_repl_id:
        return STATUS_NO_PROGRESS
    if dump_txid is not None and post_load_id < dump_txid:
        return STATUS_PARTIAL_LOAD
    return STATUS_TARGET_AHEAD


def classification_expr(
    dump_txid: F.Column, last_repl_id: F.Column, post_load_id: F.Column
) -> F.Column:
    """The same ladder as a Catalyst expression (vectorized over any number
    of databases; used by stream_divergence and the pipeline's verify join)."""
    return (
        F.when(post_load_id.isNull(), STATUS_LOAD_FAILED)
        .when(post_load_id == dump_txid, STATUS_SUCCESS)
        .when(
            last_repl_id.isNotNull() & (post_load_id == last_repl_id),
            STATUS_NO_PROGRESS,
        )
        .when(post_load_id < dump_txid, STATUS_PARTIAL_LOAD)
        .otherwise(STATUS_TARGET_AHEAD)
    )


@dataclass(frozen=True)
class ReplConfig:
    """Engine analog of ``env.sh``: replication targets + knobs."""

    db_name: str
    source_root: str          # source warehouse dir (or JDBC URL)
    target_root: str          # target warehouse dir
    repl_root: str            # dump staging root (env.sh:11 REPL_ROOT)
    db_allowlist: tuple[str, ...] = ()        # env.sh:14 DBLIST
    include_external_tables: bool = False     # env.sh:8
    incr_rerun: int = 3                        # env.sh:24 INCR_RERUN
    rerun_sleep_s: float = 0.0                 # env.sh:26 RERUN_SLEEP (60s prod)
    log_upload: bool = False                   # env.sh:39 HDFS_UPLOAD
    log_upload_dir: str | None = None          # env.sh:41 HDFS_UPLOAD_DIR

    def validate(self) -> None:
        """Arg/allowlist validation (``hive3repl.sh:40-57`` →
        ``misc_functions.sh:185-207``)."""
        if not self.db_name:
            raise ValueError("db_name is required (hive3repl.sh:40-42)")
        # db_name becomes a path component under REPL_ROOT — reject path
        # metacharacters up front so no write can escape the root
        # (beeline_functions.sh:123 path sanity, enforced before any I/O)
        if any(ch in self.db_name for ch in ("/", "\\", "..")):
            raise ValueError(
                f"invalid db_name {self.db_name!r}: path separators not allowed"
            )
        if self.db_allowlist and self.db_name not in self.db_allowlist:
            raise ValueError(
                f"database {self.db_name!r} not in allowlist (misc_functions.sh:198-206)"
            )
