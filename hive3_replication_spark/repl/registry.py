"""Run registry: single-writer locking (SURVEY.md §1.1 "Lock / run registry").

The reference guards concurrent runs with PID files + stale-PID detection
(``misc_functions.sh:151-183``) and serializes bootstrap dumps with a
``dump.lock`` (``beeline_functions.sh:92-101``). The engine uses atomic
directory creation (mkdir is atomic on POSIX and on HDFS/S3A-with-guard) with
the owner PID recorded for staleness checks — same semantics, no daemon.

At scale this lock guards *driver-side orchestration only* (one replication
run per database); executor parallelism inside a run needs no locks because
snapshot dirs are immutable and the watermark advance is a single atomic
rename (see incremental.py).
"""

from __future__ import annotations

import os
from pathlib import Path


class LockHeldError(RuntimeError):
    pass


class RunLock:
    """``with RunLock(dir, 'dump'):`` — mirrors dump.lock semantics."""

    def __init__(self, run_dir: str | os.PathLike, name: str) -> None:
        self.path = Path(run_dir) / f"{name}.lock"

    def __enter__(self) -> "RunLock":
        self.acquire()
        return self

    def __exit__(self, *exc: object) -> None:
        self.release()

    def acquire(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        try:
            self.path.mkdir()
        except FileExistsError:
            owner = self._owner_pid()
            if owner is not None and not _pid_alive(owner):
                # stale-PID takeover (misc_functions.sh:168-180)
                self.release(force=True)
                self.path.mkdir()
            else:
                raise LockHeldError(
                    f"{self.path} held by pid {owner} (beeline_functions.sh:92-101)"
                )
        (self.path / "pid").write_text(str(os.getpid()))

    def release(self, force: bool = False) -> None:
        """Remove only if owned (``beeline_functions.sh:112-114``)."""
        if not self.path.exists():
            return
        if not force and self._owner_pid() != os.getpid():
            return
        pid_file = self.path / "pid"
        if pid_file.exists():
            pid_file.unlink()
        self.path.rmdir()

    def _owner_pid(self) -> int | None:
        try:
            return int((self.path / "pid").read_text())
        except (OSError, ValueError):
            return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
