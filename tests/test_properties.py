"""Hypothesis property tests for driver-side pure logic (SURVEY.md §7 risk
2: the divergence ladder is "easy to get subtly wrong")."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from hive3_replication_spark.repl.model import (
    STATUS_LOAD_FAILED,
    STATUS_NO_PROGRESS,
    STATUS_PARTIAL_LOAD,
    STATUS_SUCCESS,
    STATUS_TARGET_AHEAD,
    classify_repl_status,
)

ids = st.one_of(st.none(), st.integers(min_value=0, max_value=10**9))
ALL_STATUSES = {
    STATUS_SUCCESS,
    STATUS_LOAD_FAILED,
    STATUS_NO_PROGRESS,
    STATUS_PARTIAL_LOAD,
    STATUS_TARGET_AHEAD,
}


@given(dump=ids, last=ids, post=ids)
def test_ladder_is_total_and_closed(dump, last, post):
    """Every input classifies to exactly one known status."""
    assert classify_repl_status(dump, last, post) in ALL_STATUSES


@given(dump=st.integers(0, 10**9), last=ids)
def test_none_post_always_fails(dump, last):
    assert classify_repl_status(dump, last, None) == STATUS_LOAD_FAILED


@given(dump=st.integers(0, 10**9), last=ids)
def test_equal_watermarks_always_success(dump, last):
    """post == dump is success regardless of prior state — the reference's
    primary verification invariant (hive3repl.sh:106, README.md:76,89)."""
    assert classify_repl_status(dump, last, dump) == STATUS_SUCCESS


@given(dump=st.integers(1, 10**9), last=st.integers(0, 10**9))
def test_no_progress_detected(dump, last):
    """post == last != dump → no transactions applied (hive3repl.sh:157)."""
    if last != dump:
        assert (
            classify_repl_status(dump, last, last) == STATUS_NO_PROGRESS
        )


@given(
    dump=st.integers(1, 10**9),
    delta=st.integers(1, 10**6),
)
def test_behind_vs_ahead_sign(dump, delta):
    behind = classify_repl_status(dump, None, dump - delta)
    ahead = classify_repl_status(dump, None, dump + delta)
    assert behind == STATUS_PARTIAL_LOAD
    assert ahead == STATUS_TARGET_AHEAD
