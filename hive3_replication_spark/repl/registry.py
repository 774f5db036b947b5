"""Run registry: single-writer locking (SURVEY.md §1.1 "Lock / run registry").

The reference guards concurrent runs with PID files + stale-PID detection
(``misc_functions.sh:151-183``) and serializes bootstrap dumps with a
``dump.lock`` (``beeline_functions.sh:92-101``). The engine uses atomic
directory creation (mkdir is atomic on POSIX and on HDFS/S3A-with-guard)
with the owner PID recorded for staleness checks — same semantics, no
daemon.

Takeover of a stale lock is itself atomic: the claimer RENAMES the stale
lock dir aside (rename is atomic; exactly one concurrent claimer wins) and
then re-acquires through the normal mkdir path, so two processes can never
both conclude they took over. A lock dir whose pid file never appeared
(holder crashed between mkdir and pid write) is treated as stale once it is
older than a grace period.

At scale this lock guards *driver-side orchestration only* (one replication
run per database); executor parallelism inside a run needs no locks because
snapshot dirs are immutable and the watermark advance is a single atomic
rename (see incremental.py).
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

#: A lock dir with no pid file older than this is considered stale (the
#: mkdir→pid-write window of a live holder is milliseconds).
_NO_PID_GRACE_S = 5.0

#: Hard backstop for a takeover marker whose recorded claimer pid still
#: reads alive: a takeover completes in milliseconds, so a marker this
#: old belongs to a RECYCLED pid (or a foreign pid _pid_alive reports as
#: alive via PermissionError) — without this bound one recycled pid
#: would block every future takeover of a genuinely stale lock forever
#: (round-9 review). Generous enough that no live stalled claimer (the
#: ADVICE-r8 case the pid check exists for) plausibly spans it.
_MARKER_MAX_AGE_S = 300.0


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
        for _ in range(16):  # bounded retries through takeover races
            try:
                self.path.mkdir()
            except FileExistsError:
                owner = self._owner_pid()
                if owner is not None and _pid_alive(owner):
                    raise LockHeldError(
                        f"{self.path} held by pid {owner} "
                        "(beeline_functions.sh:92-101)"
                    )
                if owner is None and self._age_s() < _NO_PID_GRACE_S:
                    # holder may be mid-acquire; not stale yet
                    raise LockHeldError(
                        f"{self.path} being acquired by another process"
                    )
                # stale (misc_functions.sh:168-180 stale-PID takeover).
                # Rename-aside alone is NOT enough: between this claimer's
                # staleness read and its rename, a competing claimer can
                # complete the takeover and re-create a LIVE lock at this
                # path, which the rename would then steal (double acquire —
                # caught by the round-8 race test). So takeover itself is
                # serialized through an adjacent mkdir-atomic marker, and
                # staleness is RE-validated under that marker before the
                # rename.
                marker = self.path.with_name(f"{self.path.name}.takeover")
                try:
                    marker.mkdir()
                except FileExistsError:
                    # another claimer is mid-takeover. Staleness of the
                    # MARKER mirrors the lock's own check (ADVICE r8): the
                    # claimer records its pid inside, and the marker is
                    # cleared only when that pid is DEAD — a pure age
                    # threshold could rmtree a live claimer merely stalled
                    # past the grace (NFS stall, SIGSTOP), re-opening the
                    # narrow steal window the marker exists to close. The
                    # age grace survives only for the pid-file-not-yet-
                    # written sliver between mkdir and write_text.
                    claimer = self._marker_pid(marker)
                    try:
                        marker_age = time.time() - marker.stat().st_mtime
                    except OSError:
                        continue  # marker just vanished; retry from mkdir
                    if self._marker_pid(marker) != claimer:
                        # TOCTOU (ADVICE r9): the marker was rmtree'd and
                        # re-created by a NEW claimer between the pid read
                        # and the stat — the dead old pid paired with the
                        # fresh mtime would otherwise rmtree a LIVE marker.
                        # A pid re-read straddling the stat detects any
                        # such swap (the new claimer has a different pid);
                        # mismatch means state is torn: retry from mkdir.
                        continue
                    if claimer is not None:
                        if not _pid_alive(claimer) or (
                            marker_age > _MARKER_MAX_AGE_S
                        ):
                            shutil.rmtree(marker, ignore_errors=True)
                        continue
                    if marker_age > _NO_PID_GRACE_S:
                        shutil.rmtree(marker, ignore_errors=True)
                    continue
                try:
                    (marker / "pid").write_text(str(os.getpid()))
                    owner = self._owner_pid()
                    if owner is not None and _pid_alive(owner):
                        raise LockHeldError(
                            f"{self.path} held by pid {owner} "
                            "(taken over while we raced)"
                        )
                    if owner is None and self._age_s() < _NO_PID_GRACE_S:
                        raise LockHeldError(
                            f"{self.path} being acquired by another process"
                        )
                    trash = self.path.with_name(
                        f"{self.path.name}.stale-"
                        f"{os.getpid()}-{time.monotonic_ns()}"
                    )
                    try:
                        os.rename(self.path, trash)
                    except OSError:
                        continue  # dir released meanwhile; retry from mkdir
                    shutil.rmtree(trash, ignore_errors=True)
                finally:
                    shutil.rmtree(marker, ignore_errors=True)
                continue
            (self.path / "pid").write_text(str(os.getpid()))
            return
        raise LockHeldError(f"{self.path}: takeover contention, giving up")

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

    @staticmethod
    def _marker_pid(marker: Path) -> int | None:
        try:
            return int((marker / "pid").read_text())
        except (OSError, ValueError):
            return None

    def _age_s(self) -> float:
        try:
            return time.time() - self.path.stat().st_mtime
        except OSError:
            return 0.0


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
