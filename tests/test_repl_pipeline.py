"""E2E replication pipeline tests — the automated form of the reference's
manual test procedure (``ManualSteps.md:15-33``; SURVEY.md §5):

create db → bootstrap → verify rows → insert more → incremental → verify
watermark advance → no-op rerun → idempotent re-apply → divergence ladder
branches → locks → retry.
"""

from __future__ import annotations

import glob
import shutil
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hive3_replication_spark.repl import incremental as incr
from hive3_replication_spark.repl.model import (
    STATUS_LOAD_FAILED,
    STATUS_NO_PROGRESS,
    STATUS_PARTIAL_LOAD,
    STATUS_SUCCESS,
    STATUS_TARGET_AHEAD,
    ReplConfig,
    classify_repl_status,
)
from hive3_replication_spark.repl.pipeline import run_replication
from hive3_replication_spark.repl.registry import LockHeldError, RunLock
from tests.conftest import SF_DIR


@pytest.fixture()
def repl_env(spark, tmp_path):
    """Source db = fixture tables with the last 100 events held back."""
    src = tmp_path / "source"
    src.mkdir()
    for p in glob.glob(f"{SF_DIR}/*.parquet"):
        name = Path(p).stem
        if name != "events":
            shutil.copy(p, src / f"{name}.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    cut = max_id - 100
    ev.filter(F.col("event_id") <= cut).write.parquet(
        str(src / "events.parquet")
    )
    cfg = ReplConfig(
        db_name="repltest",
        source_root=str(src),
        target_root=str(tmp_path / "target"),
        repl_root=str(tmp_path / "repl"),
        db_allowlist=("repltest",),
    )
    return cfg, str(tmp_path / "run"), str(tmp_path / "wm"), ev, cut, max_id


def test_bootstrap_then_incremental(spark, repl_env):
    cfg, run_dir, wm_dir, ev, cut, max_id = repl_env

    r1 = run_replication(spark, cfg, run_dir, wm_dir)
    assert r1["mode"] == "bootstrap"
    assert r1["status"] == STATUS_SUCCESS
    assert r1["post_load_id"] == cut
    # rows replicated (ManualSteps.md:25)
    for t in ("lineitem", "orders", "nation"):
        src_n = spark.read.parquet(f"{cfg.source_root}/{t}.parquet").count()
        tgt_n = spark.read.parquet(f"{cfg.target_root}/{t}").count()
        assert src_n == tgt_n, t

    # views replicated as metadata and queryable at the target (README.md:4)
    v = spark.sql("SELECT * FROM repltest_v_event_counts")
    src_counts = (
        spark.read.parquet(f"{cfg.source_root}/events.parquet")
        .groupBy("event_type")
        .count()
    )
    assert {
        (r["event_type"], r["n_events"]) for r in v.collect()
    } == {(r["event_type"], r["count"]) for r in src_counts.collect()}

    # insert more rows (ManualSteps.md:26) then incremental
    ev.filter(F.col("event_id") > cut).write.mode("append").parquet(
        f"{cfg.source_root}/events.parquet"
    )
    r2 = run_replication(spark, cfg, run_dir, wm_dir)
    assert r2["mode"] == "incremental"
    assert r2["status"] == STATUS_SUCCESS
    assert r2["post_load_id"] == max_id

    # no-op rerun: watermark unchanged, still success
    r3 = run_replication(spark, cfg, run_dir, wm_dir)
    assert r3["status"] == STATUS_SUCCESS
    assert r3["post_load_id"] == max_id

    # idempotent re-apply of the same dump (SURVEY.md §7 risk 1)
    dump_path = f"{cfg.repl_root}/repltest/incr_{cut}_{max_id}"
    before = sorted(
        map(tuple, spark.read.parquet(f"{cfg.target_root}/user_state_v{max_id}").collect())
    )
    incr.apply_events(spark, cfg, dump_path, wm_dir, cut)
    after = sorted(
        map(tuple, spark.read.parquet(f"{cfg.target_root}/user_state_v{max_id}").collect())
    )
    assert before == after

    # replayed state == batch last-writer-wins semantics
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    expected = sorted(
        map(
            tuple,
            (
                ev.withColumn("rn", F.row_number().over(w))
                .filter("rn = 1")
                .filter("event_type <> 'error'")
                .select(
                    "user_id",
                    F.col("event_id").alias("last_event_id"),
                    F.col("value").alias("state_value"),
                )
                .collect()
            ),
        )
    )
    assert expected == after


def test_partial_bootstrap_rerun_converges(spark, repl_env):
    """The reference's open bug (TODO.md): a partially loaded bootstrap
    'requires a cleanup of the partially loaded database'
    (hive3repl.sh:110-112). The engine's contract: watermark advances only
    after a complete load, and loads are idempotent overwrites — so a crash
    mid-load (simulated: some tables copied, no watermark) converges on
    rerun with no manual cleanup."""
    import shutil

    cfg, run_dir, wm_dir, ev, cut, max_id = repl_env
    from hive3_replication_spark.repl import snapshot as snap

    dump = snap.bootstrap_dump(spark, cfg, run_dir)
    # simulate a crash midway through the load: two tables made it, the
    # watermark write never happened
    for t in ("nation", "region"):
        snap._fs_copy(
            spark, f"{dump['dump_path']}/{t}", f"{cfg.target_root}/{t}"
        )
    assert snap.repl_status(spark, wm_dir, cfg.db_name) is None

    # rerun from the top: status NULL → full bootstrap again → success
    report = run_replication(spark, cfg, run_dir, wm_dir)
    assert report["mode"] == "bootstrap"
    assert report["status"] == STATUS_SUCCESS
    for t in ("nation", "lineitem", "orders"):
        src_n = spark.read.parquet(f"{cfg.source_root}/{t}.parquet").count()
        assert spark.read.parquet(f"{cfg.target_root}/{t}").count() == src_n


def test_run_all_isolates_failures(spark, repl_env):
    """Multi-db orchestration: a bad database errors without blocking the
    good one (per-db isolation, env.sh:14 DBLIST loop)."""
    from hive3_replication_spark.repl.pipeline import run_all

    cfg, run_dir, wm_dir, *_ = repl_env
    bad = ReplConfig(
        db_name="ghost",
        source_root=str(Path(cfg.source_root).parent / "missing"),
        target_root=cfg.target_root,
        repl_root=cfg.repl_root,
    )
    reports = run_all(spark, [bad, cfg], run_dir, wm_dir)
    assert reports[0]["db_name"] == "ghost"
    assert reports[0]["status"] == "error"
    assert reports[1]["db_name"] == "repltest"
    assert reports[1]["status"] == STATUS_SUCCESS


def test_classification_ladder_exhaustive():
    """Every branch of hive3repl.sh:106-120,155-169 (SURVEY.md §7 risk 2)."""
    assert classify_repl_status(100, 90, 100) == STATUS_SUCCESS
    assert classify_repl_status(100, 90, None) == STATUS_LOAD_FAILED
    assert classify_repl_status(100, None, None) == STATUS_LOAD_FAILED
    assert classify_repl_status(100, 90, 90) == STATUS_NO_PROGRESS
    assert classify_repl_status(100, 90, 95) == STATUS_PARTIAL_LOAD
    assert classify_repl_status(100, 90, 110) == STATUS_TARGET_AHEAD
    # bootstrap (no last_repl_id): behind/ahead still classify
    assert classify_repl_status(100, None, 95) == STATUS_PARTIAL_LOAD
    assert classify_repl_status(100, None, 110) == STATUS_TARGET_AHEAD
    assert classify_repl_status(100, None, 100) == STATUS_SUCCESS


def test_allowlist_validation():
    cfg = ReplConfig(
        db_name="evil",
        source_root="/tmp/x",
        target_root="/tmp/y",
        repl_root="/tmp/z",
        db_allowlist=("repltest",),
    )
    with pytest.raises(ValueError, match="allowlist"):
        cfg.validate()


def test_run_lock(tmp_path):
    with RunLock(tmp_path, "dump"):
        with pytest.raises(LockHeldError):
            RunLock(tmp_path, "dump").acquire()
    # released → can reacquire
    with RunLock(tmp_path, "dump"):
        pass


def test_stale_lock_takeover(tmp_path):
    lock = RunLock(tmp_path, "dump")
    lock.path.mkdir(parents=True)
    (lock.path / "pid").write_text("999999999")  # dead pid
    with RunLock(tmp_path, "dump"):  # takes over (misc_functions.sh:168-180)
        pass


def test_retry_exhaustion():
    calls: list[int] = []

    def always_fail(attempt: int) -> None:
        calls.append(attempt)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="after 3 attempts"):
        incr.with_retry(always_fail, max_attempts=3, sleep_s=0.0)
    assert calls == [1, 2, 3]


def test_ddl_replay_table_create_and_drop(spark, repl_env):
    """DDL replay parity (README.md:38 — incremental dumps carry DDL):
    a table created at the source after bootstrap appears at the target on
    the next incremental run; a table dropped at the source disappears.
    State versions, watermarks, and the events transport are never touched."""
    cfg, run_dir, wm_dir, ev, cut, max_id = repl_env
    run_replication(spark, cfg, run_dir, wm_dir)  # bootstrap

    # DROP at source: remove part; CREATE at source is modeled by the
    # fingerprint-diff sync (covered in test_copy_skip) — here we verify
    # the drop side plus that a modified table still syncs.
    (Path(cfg.source_root) / "part.parquet").unlink()
    ev.filter(F.col("event_id") > cut).write.mode("append").parquet(
        f"{cfg.source_root}/events.parquet"
    )
    r2 = run_replication(spark, cfg, run_dir, wm_dir)
    assert r2["mode"] == "incremental"
    assert r2["status"] == STATUS_SUCCESS
    assert r2["tables_dropped"] == ["part"]
    assert not (Path(cfg.target_root) / "part").exists()
    # transport + state versions untouched
    assert (Path(cfg.target_root) / "events").exists()
    assert (Path(cfg.target_root) / f"user_state_v{max_id}").exists()

    # a further no-op incremental drops nothing more
    r3 = run_replication(spark, cfg, run_dir, wm_dir)
    assert r3["tables_dropped"] == []


def test_run_log_export_success_failure_and_gating(spark, repl_env, tmp_path):
    """S9 run-log upload (misc_functions.sh:115-149, flags env.sh:39-41):
    artifacts must land on BOTH the success and the failure path when the
    flag is on and the dir exists; a missing upload dir warn-skips without
    failing the run (the reference never creates it); flag off → nothing."""
    import dataclasses
    import json as _json

    cfg, run_dir, wm_dir, ev, cut, max_id = repl_env
    up = tmp_path / "uploads"
    up.mkdir()

    # flag off (default): no artifact
    report = run_replication(spark, cfg, run_dir, wm_dir)
    assert report["status"] == STATUS_SUCCESS
    assert list(up.glob("replog_*")) == []

    # success path with flag on
    cfg_on = dataclasses.replace(
        cfg, log_upload=True, log_upload_dir=str(up)
    )
    report = run_replication(spark, cfg_on, run_dir, wm_dir)
    arts = sorted(up.glob("replog_repltest_*.json"))
    assert len(arts) == 1
    logged = _json.loads(arts[0].read_text())
    assert logged["status"] == report["status"]
    assert logged["db_name"] == "repltest"

    # failure path: break the source root so the run raises — the artifact
    # must still land, carrying the error
    cfg_bad = dataclasses.replace(
        cfg_on, source_root=str(tmp_path / "nonexistent_source")
    )
    with pytest.raises(Exception):
        run_replication(spark, cfg_bad, run_dir, wm_dir)
    arts = sorted(up.glob("replog_repltest_*.json"))
    assert len(arts) == 2
    failed = _json.loads(arts[-1].read_text())
    assert failed["status"] == "error" and failed["error"]

    # missing upload dir: warn-skip, run still succeeds
    cfg_missing = dataclasses.replace(
        cfg, log_upload=True, log_upload_dir=str(tmp_path / "no_such_dir")
    )
    report = run_replication(spark, cfg_missing, run_dir, wm_dir)
    assert report["status"] in (STATUS_SUCCESS, STATUS_NO_PROGRESS)
    assert not (tmp_path / "no_such_dir").exists()


def test_cli_end_to_end(tmp_path):
    """The user-facing entry point (`python -m hive3_replication_spark`):
    bootstrap a db from the sf0.001 fixtures via the CLI in a subprocess
    (main() owns and stops its own SparkSession), with the log-upload flag
    — exit 0, a success report on stdout, and the run-log artifact."""
    import json as _json
    import subprocess
    import sys

    src = tmp_path / "source"
    src.mkdir()
    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        shutil.copy(p, src / Path(p).name)
    up = tmp_path / "uploads"
    up.mkdir()
    proc = subprocess.run(
        [
            sys.executable, "-m", "hive3_replication_spark", "clidb",
            "--source-root", str(src),
            "--target-root", str(tmp_path / "target"),
            "--repl-root", str(tmp_path / "repl"),
            "--log-upload-dir", str(up),
            "--rerun-sleep", "0",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["db_name"] == "clidb" and report["status"] == "success"
    arts = list(up.glob("replog_clidb_*.json"))
    assert len(arts) == 1


class _ConnectLikeSession:
    """A session with no py4j gateway — what ``spark._jvm`` access would
    look like under Spark Connect (the attributes simply don't exist)."""


def test_fs_copy_local_paths_need_no_jvm(tmp_path):
    """VERDICT r7 ask #4: local-path copies must not touch the private
    _jvm/_jsc gateway at all — proven by running them against a session
    object that has neither attribute."""
    from hive3_replication_spark.repl.snapshot import _fs_copy

    src = tmp_path / "src"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"payload-a")
    (src / "nested").mkdir()
    (src / "nested" / "part-1.parquet").write_bytes(b"payload-b")
    dst = tmp_path / "out" / "dst"

    _fs_copy(_ConnectLikeSession(), str(src), str(dst))
    assert (dst / "part-0.parquet").read_bytes() == b"payload-a"
    assert (dst / "nested" / "part-1.parquet").read_bytes() == b"payload-b"

    # overwrite semantics: a stale destination is replaced, not merged
    (src / "part-0.parquet").write_bytes(b"payload-a2")
    (dst / "stale-file").write_bytes(b"old")
    _fs_copy(_ConnectLikeSession(), str(src), str(dst))
    assert (dst / "part-0.parquet").read_bytes() == b"payload-a2"
    assert not (dst / "stale-file").exists()

    # single-file source, file:// scheme on both sides
    single = tmp_path / "single.parquet"
    single.write_bytes(b"solo")
    _fs_copy(
        _ConnectLikeSession(), f"file://{single}", f"file://{tmp_path}/solo_out"
    )
    assert (tmp_path / "solo_out").read_bytes() == b"solo"


def test_fs_copy_remote_uri_without_gateway_raises_clearly(tmp_path):
    """Under Connect a remote-URI copy must fail with the documented
    classic-mode error, not an AttributeError deep inside py4j."""
    from hive3_replication_spark.repl.snapshot import _fs_copy

    with pytest.raises(RuntimeError, match="classic-mode SparkSession"):
        _fs_copy(
            _ConnectLikeSession(), "hdfs://nn/db/t.parquet", str(tmp_path / "d")
        )


def _race_acquire(tmp_path, n_threads: int) -> list[str]:
    """Race ``n_threads`` concurrent acquirers of the same lock through a
    barrier; returns one 'won'/'lost' token per thread."""
    import threading

    results: list[str] = []
    out_lock = threading.Lock()
    barrier = threading.Barrier(n_threads)

    def worker() -> None:
        lock = RunLock(tmp_path, "dump")
        barrier.wait()
        try:
            lock.acquire()
            token = "won"
        except LockHeldError:
            token = "lost"
        with out_lock:
            results.append(token)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


def test_run_lock_race_single_winner(tmp_path):
    """16 simultaneous acquirers: mkdir atomicity must admit EXACTLY one
    (the reference's dump.lock guards a whole replication run — a double
    acquire would interleave two dumps; beeline_functions.sh:92-101)."""
    results = _race_acquire(tmp_path, 16)
    assert len(results) == 16 and results.count("won") == 1, results
    # the winning thread shares our pid, so an owned release must work
    # and free the lock for a fresh uncontended acquire
    RunLock(tmp_path, "dump").release()
    with RunLock(tmp_path, "dump"):
        pass


def test_stale_lock_takeover_race_single_winner(tmp_path):
    """8 simultaneous acquirers against a STALE (dead-pid) lock: the
    rename-aside takeover must elect exactly one claimer — the losers see
    either the winner's fresh lock (owner alive) or its mid-acquire
    window (no pid yet, inside the grace period) and raise LockHeldError
    rather than double-claiming (misc_functions.sh:168-180, made atomic)."""
    stale = RunLock(tmp_path, "dump")
    stale.path.mkdir(parents=True)
    (stale.path / "pid").write_text("999999999")  # dead pid

    results = _race_acquire(tmp_path, 8)
    assert len(results) == 8 and results.count("won") == 1, results
    # exactly one lock dir remains, owned by this process, releasable
    assert (stale.path / "pid").read_text() == str(__import__("os").getpid())
    RunLock(tmp_path, "dump").release()
    assert not stale.path.exists()


def test_takeover_marker_pid_staleness(tmp_path):
    """ADVICE r8 + round-9 review: the takeover marker carries its
    claimer's pid, and marker staleness mirrors the lock's own check —
    a marker whose claimer is STILL ALIVE is kept through any realistic
    stall (a takeover stalled past the 5 s grace keeps its exclusivity;
    the old pure-age rule would have rmtree'd it and re-opened the
    steal window) — but a pid-bearing marker older than the hard
    backstop is cleared anyway, because at that age the 'alive' pid is
    a RECYCLED one and honoring it would deadlock every future
    takeover. A dead-claimer marker is cleared immediately."""
    import os
    import time

    from hive3_replication_spark.repl import registry as reg

    stale = RunLock(tmp_path, "dump")
    stale.path.mkdir(parents=True)
    (stale.path / "pid").write_text("999999999")  # dead lock owner
    marker = stale.path.with_name(f"{stale.path.name}.takeover")
    marker.mkdir()
    (marker / "pid").write_text(str(os.getpid()))  # live claimer (us)
    stalled = time.time() - 60  # past the 5 s grace, inside the backstop
    os.utime(marker, (stalled, stalled))
    with pytest.raises(LockHeldError):
        RunLock(tmp_path, "dump").acquire()
    assert marker.exists(), "live-claimer marker cleared inside backstop"
    # same live pid but older than the recycled-pid backstop: cleared,
    # takeover completes
    ancient = time.time() - reg._MARKER_MAX_AGE_S - 10
    os.utime(marker, (ancient, ancient))
    lock2 = RunLock(tmp_path, "dump")
    lock2.acquire()
    assert (stale.path / "pid").read_text() == str(os.getpid())
    lock2.release()
    assert not stale.path.exists()
    # dead-claimer marker: cleared immediately regardless of age
    stale.path.mkdir()
    (stale.path / "pid").write_text("999999999")
    marker.mkdir()
    (marker / "pid").write_text("999999999")
    recent = time.time() - 1
    os.utime(marker, (recent, recent))
    lock3 = RunLock(tmp_path, "dump")
    lock3.acquire()
    assert (stale.path / "pid").read_text() == str(os.getpid())
    lock3.release()


def test_marker_backstop_takeover_race_single_winner(tmp_path):
    """Round-10 race target (VERDICT r9 ask #4): 8 claimers racing the
    RECYCLED-PID BACKSTOP — a stale dead-pid lock guarded by a takeover
    marker that is older than _MARKER_MAX_AGE_S yet carries a live pid
    (the recycled-pid shape the backstop exists for). Exactly one
    claimer may clear the ancient marker and complete the takeover; the
    losers must see the winner's fresh marker/lock and raise, never
    double-claim. 10 repetitions — this harness found real bugs three
    rounds running."""
    import os
    import time

    from hive3_replication_spark.repl import registry as reg

    for rep in range(10):
        base = tmp_path / f"rep{rep}"
        base.mkdir()
        stale = RunLock(base, "dump")
        stale.path.mkdir(parents=True)
        (stale.path / "pid").write_text("999999999")  # dead lock owner
        marker = stale.path.with_name(f"{stale.path.name}.takeover")
        marker.mkdir()
        (marker / "pid").write_text(str(os.getpid()))  # "live" claimer
        ancient = time.time() - reg._MARKER_MAX_AGE_S - 10
        os.utime(marker, (ancient, ancient))

        results = _race_acquire(base, 8)
        assert results.count("won") == 1, (rep, results)
        assert (stale.path / "pid").read_text() == str(os.getpid())
        assert not marker.exists(), "winner must clear its own marker"
        RunLock(base, "dump").release()
        assert not stale.path.exists()


def test_marker_pid_reread_detects_swap(tmp_path, monkeypatch):
    """ADVICE r9 TOCTOU regression test: if the marker is replaced by a
    NEW live claimer between the staleness pid read and the stat, the
    pid re-read straddling the stat must detect the swap and retry —
    the pre-fix code paired the dead old pid with the fresh mtime and
    rmtree'd the LIVE claimer's marker. Simulated deterministically by
    feeding the two reads different pids for one iteration."""
    import os

    from hive3_replication_spark.repl import registry as reg

    stale = RunLock(tmp_path, "dump")
    stale.path.mkdir(parents=True)
    (stale.path / "pid").write_text("999999999")  # dead lock owner
    marker = stale.path.with_name(f"{stale.path.name}.takeover")
    marker.mkdir()
    (marker / "pid").write_text(str(os.getpid()))  # live claimer, fresh

    real = reg.RunLock._marker_pid
    feed = iter([999999999])  # first read: the vanished old claimer

    def swapped(m):
        try:
            return next(feed)
        except StopIteration:
            return real(m)

    monkeypatch.setattr(reg.RunLock, "_marker_pid", staticmethod(swapped))
    with pytest.raises(LockHeldError):
        RunLock(tmp_path, "dump").acquire()
    assert marker.exists(), (
        "pid/stat swap window rmtree'd a live claimer's marker"
    )


def test_reclaim_own_marker_frozen_validation(tmp_path, monkeypatch):
    """ADVICE r10: the own-ghost-marker reclaim must rename-aside and
    re-validate the frozen copy's token, never rmtree on a pre-read
    token. Three branches: (a) the frozen copy IS ours — deleted;
    (b) the frozen copy carries a FOREIGN token (the ghost was displaced
    and the path re-used between the caller's read and the rename) —
    restored intact; (c) foreign token AND the restore path re-occupied
    — the copy is dropped, the occupier's marker survives."""
    import os

    from hive3_replication_spark.repl.registry import RunLock

    marker = tmp_path / "dump.lock.takeover"

    # (a) ours → reclaimed
    marker.mkdir()
    (marker / "pid").write_text("123\nghost-token")
    RunLock._reclaim_own_marker(marker, {"123\nghost-token"})
    assert not marker.exists()
    assert not list(tmp_path.glob("*.reclaim-*")), "frozen copy leaked"

    # (b) foreign → restored with its token intact
    marker.mkdir()
    (marker / "pid").write_text("456\nlive-claimer-token")
    RunLock._reclaim_own_marker(marker, {"123\nghost-token"})
    assert marker.exists()
    assert (marker / "pid").read_text() == "456\nlive-claimer-token"
    assert not list(tmp_path.glob("*.reclaim-*"))

    # (c) foreign + restore blocked (path re-occupied while frozen):
    # the copy is dropped, the occupier's marker is untouched
    real_rename = os.rename
    occupied = {"done": False}

    def rename_and_occupy(src, dst):
        real_rename(src, dst)
        if not occupied["done"]:
            occupied["done"] = True
            marker.mkdir()  # a third claimer re-creates the marker
            (marker / "pid").write_text("789\noccupier-token")

    monkeypatch.setattr(os, "rename", rename_and_occupy)
    RunLock._reclaim_own_marker(marker, {"123\nghost-token"})
    monkeypatch.undo()
    assert (marker / "pid").read_text() == "789\noccupier-token", (
        "occupier's live marker must survive the blocked restore"
    )
    assert not list(tmp_path.glob("*.reclaim-*")), "frozen copy leaked"


def test_marker_zero_backstop_race_single_winner(tmp_path, monkeypatch):
    """Round-11 race target (VERDICT r10 ask #7): the takeover race at an
    adversarial ZERO-second recycled-pid backstop — every claimer's fresh
    marker reads as backstop-stale to every other claimer, so all of them
    route through _clear_marker_frozen against each other's LIVE markers
    every retry. The freshness re-check inside the frozen clear (live pid
    + mtime within grace → restore untouched) is the only thing standing
    between this configuration and a marker-steal double acquire; 10 reps
    must elect exactly one winner each with no frozen-copy debris."""
    import os

    from hive3_replication_spark.repl import registry as reg

    monkeypatch.setattr(reg, "_MARKER_MAX_AGE_S", 0.0)
    for rep in range(10):
        base = tmp_path / f"rep{rep}"
        base.mkdir()
        stale = RunLock(base, "dump")
        stale.path.mkdir(parents=True)
        (stale.path / "pid").write_text("999999999")  # dead lock owner

        results = _race_acquire(base, 8)
        assert results.count("won") == 1, (rep, results)
        assert (stale.path / "pid").read_text() == str(os.getpid())
        RunLock(base, "dump").release()
        assert not stale.path.exists()
        debris = [
            p.name
            for p in base.glob("*")
            if ".reclaim-" in p.name or ".clear-" in p.name
            or ".stale-" in p.name
        ]
        assert not debris, (rep, debris)


def test_token_format_marker_backstop_race(tmp_path):
    """Round-11 race target (VERDICT r10 ask #7, thread-token format):
    the recycled-pid-backstop race seeded with a marker in the TWO-LINE
    token format the round-10 code writes (pid + thread-token second
    line) — the staleness parsers must read the pid off line one and the
    clear/takeover paths must behave exactly as with a bare-pid marker.
    10 reps, exactly one winner each."""
    import os
    import time

    from hive3_replication_spark.repl import registry as reg

    for rep in range(10):
        base = tmp_path / f"rep{rep}"
        base.mkdir()
        stale = RunLock(base, "dump")
        stale.path.mkdir(parents=True)
        (stale.path / "pid").write_text("999999999")  # dead lock owner
        marker = stale.path.with_name(f"{stale.path.name}.takeover")
        marker.mkdir()
        # live pid, token format, ancient — the recycled-pid shape
        (marker / "pid").write_text(f"{os.getpid()}\n12345:67890")
        ancient = time.time() - reg._MARKER_MAX_AGE_S - 10
        os.utime(marker, (ancient, ancient))

        results = _race_acquire(base, 8)
        assert results.count("won") == 1, (rep, results)
        assert (stale.path / "pid").read_text() == str(os.getpid())
        assert not marker.exists(), "winner must clear its own marker"
        RunLock(base, "dump").release()
        assert not stale.path.exists()


def test_local_path_uri_edge_cases():
    """ADVICE r8: _local_path must not claim a remote-authority file://
    URI as driver-local, and must treat colon-bearing scheme-less paths
    as paths (urlparse reads 'dir:part' as a scheme)."""
    from pathlib import Path

    from hive3_replication_spark.repl.snapshot import _local_path

    assert _local_path("/a/b") == Path("/a/b")
    assert _local_path("rel/dir") == Path("rel/dir")
    assert _local_path("dir:part/file") == Path("dir:part/file")
    assert _local_path("file:/db") == Path("/db")
    assert _local_path("file:///db") == Path("/db")
    assert _local_path("file://localhost/db") == Path("/db")
    assert _local_path("file://nfs-host/db") is None
    assert _local_path("hdfs://nn:8020/db") is None
    assert _local_path("s3a://bucket/key") is None
    # Hadoop no-authority single-slash URIs are REMOTE (round-9 review:
    # the first '://'-only check silently treated these as local paths)
    assert _local_path("hdfs:/user/repl/db") is None
    assert _local_path("s3a:/bucket/key") is None


def test_export_run_log_concurrent_writers_unique_valid(tmp_path, monkeypatch):
    """round-9 race coverage (VERDICT ask #6): concurrent exporters pinned
    to the SAME timestamp (worst case — monkeypatched clock) must each
    write their OWN parseable JSON artifact. Pre-fix, same-stamp writers
    opened one shared path with 'w' and interleaved two JSON bodies into
    a corrupt file; the O_EXCL + collision-suffix create makes every
    writer exclusive."""
    import datetime as real_dt
    import json as _json
    import threading

    from hive3_replication_spark.repl import pipeline as pl
    from hive3_replication_spark.repl.model import ReplConfig

    class _FixedDatetime(real_dt.datetime):
        @classmethod
        def now(cls, tz=None):  # noqa: D102 - stub
            return cls(2026, 1, 1, 12, 0, 0, 123456, tzinfo=tz)

    monkeypatch.setattr(pl.dt, "datetime", _FixedDatetime)
    cfg = ReplConfig(
        db_name="racedb",
        source_root=str(tmp_path / "src"),
        target_root=str(tmp_path / "tgt"),
        repl_root=str(tmp_path / "repl"),
        db_allowlist=("racedb",),
        log_upload=True,
        log_upload_dir=str(tmp_path),
    )
    paths: list[str] = []
    errors: list[BaseException] = []
    out_lock = threading.Lock()
    n_threads, n_reps = 8, 10
    barrier = threading.Barrier(n_threads)

    def worker(i: int) -> None:
        try:
            barrier.wait()
            for r in range(n_reps):
                p = pl.export_run_log(cfg, {"writer": i, "rep": r})
                with out_lock:
                    paths.append(p)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert all(p is not None for p in paths)
    assert len(paths) == n_threads * n_reps
    assert len(set(paths)) == len(paths), "two writers shared one artifact"
    seen = set()
    for p in sorted(set(paths)):
        body = _json.loads(open(p, encoding="utf-8").read())
        seen.add((body["writer"], body["rep"]))
    assert len(seen) == n_threads * n_reps


def test_reclaim_drop_interval_frozen_validation_floor(tmp_path, monkeypatch):
    """ADVICE r11: _reclaim_own_marker's blocked-restore branch drops a
    foreign claimer's live marker copy; if that claimer had ALREADY
    passed its token re-check, marker exclusivity is silently lost for
    the interval and TWO claimers run the takeover tail concurrently.
    This rep choreographs exactly that interval with event gates:

      B: full acquire, past its token re-check, frozen just before its
         lock rename;
      R: the REAL _reclaim_own_marker — rename-aside lands, restore is
         blocked by C's marker, B's copy is dropped (branch c);
      C: full acquire through a fresh marker, wins the lock while B
         still believes it holds exclusivity;
      B released: renames C's LIVE lock — the post-rename frozen
         validation MUST restore it and send B to a LockHeldError.

    Confirms the lock-rename + frozen-validation floor alone prevents a
    double acquire, with the victim lock intact."""
    import os
    import threading
    import time as _time

    from hive3_replication_spark.repl.registry import RunLock

    base = tmp_path
    stale = RunLock(base, "dump")
    stale.path.mkdir(parents=True)
    (stale.path / "pid").write_text("999999999")  # dead lock owner
    lock_path = str(stale.path)
    marker = stale.path.with_name(f"{stale.path.name}.takeover")

    idents: dict[str, int] = {}
    gates = {k: threading.Event() for k in (
        "b_at_rename", "go_b", "aside_done", "c_marker_up", "go_c",
    )}
    real_rename = os.rename

    def gated_rename(src, dst):
        me = threading.get_ident()
        if str(src) == lock_path and me == idents.get("b"):
            gates["b_at_rename"].set()
            assert gates["go_b"].wait(30)
        elif str(src) == lock_path and me == idents.get("c"):
            assert gates["go_c"].wait(30)
        elif str(src) == str(marker) and me == idents.get("r"):
            real_rename(src, dst)
            gates["aside_done"].set()
            assert gates["c_marker_up"].wait(30)
            return
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", gated_rename)
    results: dict[str, str] = {}

    def claim(tag: str) -> None:
        idents[tag] = threading.get_ident()
        try:
            RunLock(base, "dump").acquire()
            results[tag] = "won"
        except LockHeldError:
            results[tag] = "lost"

    t_b = threading.Thread(target=claim, args=("b",))
    t_b.start()
    assert gates["b_at_rename"].wait(30)  # B past its token re-check

    def reclaim() -> None:
        idents["r"] = threading.get_ident()
        # ghost token ≠ B's live token ⇒ foreign-copy branch
        RunLock._reclaim_own_marker(marker, {"000\nghost-token"})

    t_r = threading.Thread(target=reclaim)
    t_r.start()
    assert gates["aside_done"].wait(30)  # B's marker frozen aside

    t_c = threading.Thread(target=claim, args=("c",))
    t_c.start()
    for _ in range(300):  # C's fresh marker re-occupies the path
        tok = RunLock._marker_token(marker)
        if tok is not None and tok.splitlines()[0] == str(os.getpid()):
            break
        _time.sleep(0.01)
    else:
        raise AssertionError("C never created its marker")
    gates["c_marker_up"].set()  # R's restore now blocked → drops B's copy
    t_r.join(30)
    assert not t_r.is_alive()
    assert not list(base.glob("*.reclaim-*")), "B's frozen copy must drop"

    gates["go_c"].set()  # C runs the takeover tail and wins
    t_c.join(30)
    assert not t_c.is_alive() and results["c"] == "won"
    assert (stale.path / "pid").read_text() == str(os.getpid())

    gates["go_b"].set()  # B now renames C's LIVE lock
    t_b.join(30)
    assert not t_b.is_alive()
    # the frozen validation restored C's lock and B lost — no double
    # acquire, no destroyed live lock
    assert results["b"] == "lost"
    assert (stale.path / "pid").read_text() == str(os.getpid())
    monkeypatch.undo()
    RunLock(base, "dump").release()
    assert not stale.path.exists()
    debris = [
        p.name for p in base.glob("*")
        if ".reclaim-" in p.name or ".stale-" in p.name
    ]
    assert not debris, debris


def test_parity_resume_never_erases_failures():
    """Round-12 review: a resume whose mode didn't re-target a failed
    key dropped its record at load, and the final summary then read
    complete/0-fail on a sweep with a known failure. The policy
    (scripts/parity_sf1.py resume_and_targets) must (a) carry passes
    and non-sampled oracle-skips, (b) re-run a skip that gained a
    sampled verifier, (c) force every still-registered failure back
    into the target set in EVERY mode, and (d) keep — never erase —
    the failure record of a key that left the registry."""
    from scripts.parity_sf1 import resume_and_targets

    keys = [f"k{i:02d}" for i in range(60)]
    sampled = {"k03": object()}
    prior = {
        "k00": {"pass": True},
        "k01": {"pass": None, "oracle_skipped": "slow"},  # plain skip
        "k03": {"pass": None, "oracle_skipped": "slow"},  # now sampled
        "k55": {"pass": False, "err": "boom"},  # outside default window
        "gone": {"pass": False, "err": "old"},  # left the registry
    }
    probe = ["k58"]

    # default (window) mode: k55 is outside keys[:50] yet must re-run
    res, targets = resume_and_targets(prior, keys, sampled, probe, [])
    assert res["k00"]["pass"] is True
    assert res["k01"]["pass"] is None  # skip carried, not re-run
    assert "k03" not in res  # sampled verifier exists → re-runs
    assert "k55" not in res and "k55" in targets  # failure re-runs
    assert res["gone"]["pass"] is False  # unregistered: record kept
    assert "gone" not in targets
    assert targets[:50] == keys[:50] and "k58" in targets

    # --all mode: failure is already targeted, no duplicate appended
    res, targets = resume_and_targets(
        prior, keys, sampled, probe, ["--all"]
    )
    assert targets.count("k55") == 1 and "k55" not in res

    # --next mode: N fresh keys on top of carried records, failure and
    # sampled-skip forced in regardless of N
    res, targets = resume_and_targets(
        prior, keys, sampled, probe, ["--next", "2"]
    )
    todo = [k for k in targets if k not in res]
    assert "k55" in todo and "k03" in todo
    # the 2 "fresh" slots go to the first not-carried keys in sweep
    # order — k02 plus the re-running sampled-skip k03
    assert [k for k in todo if k not in ("k55",)][:2] == ["k02", "k03"]

    # --keys mode (round 13): the named keys are FORCED to re-measure —
    # prior records dropped so the fresh result re-dates them — while
    # untouched records carry forward and failures still re-run
    res, targets = resume_and_targets(
        prior, keys, sampled, probe, ["--keys", "k00,k07,absent"]
    )
    assert "k00" not in res and "k00" in targets  # pass dropped → re-run
    assert "k07" in targets  # never-measured named key targeted
    assert "absent" not in targets  # unregistered name ignored
    assert res["k01"]["pass"] is None  # unnamed records untouched
    assert "k55" in targets and "k55" not in res  # failure still forced
    assert res["gone"]["pass"] is False

    # --keys naming a key that LEFT the registry (ADVICE r13): it can't
    # re-run, so its prior record must survive the forced-pop — a pop
    # would silently erase it, violating invariant (d)
    res, targets = resume_and_targets(
        prior, keys, sampled, probe, ["--keys", "gone,k00"]
    )
    assert res["gone"]["pass"] is False  # record kept, not erased
    # main() runs only targets NOT already carried in res — the kept
    # record keeps "gone" out of the run set
    assert "gone" not in [k for k in targets if k not in res]
    assert "k00" not in res and "k00" in targets  # registered force OK
