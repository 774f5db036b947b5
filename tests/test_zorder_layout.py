"""Z-order layout quality gates (S5g, scan_zorder): the clustered write
must yield files whose parquet min/max statistics prune on BOTH cluster
dimensions — the property that distinguishes a z-order from a plain sort
(a date-sorted layout prunes dates perfectly and event types not at all).

Measured, not eyeballed: the footers of every written file are read back
with pyarrow and each single-value predicate's overlap set is counted.
The 60% read bound is deliberately loose against repartitionByRange's
boundary sampling; the typical measured read fraction is ≤50% per
dimension (simulation and sf0.01 both give 7-8 of 16 files).
"""

from __future__ import annotations

import datetime
import glob

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _file_stats(path: str, col: str):
    """(min, max) over all row groups of one file for ``col``, or None
    when the footer carries no stats for it."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(col)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is not None and st.has_min_max:
            mins.append(st.min)
            maxs.append(st.max)
    return (min(mins), max(maxs)) if mins else None


def _files_overlapping(files, col, value):
    hit = 0
    for f in files:
        s = _file_stats(f, col)
        if s is None or (s[0] <= value <= s[1]):
            hit += 1  # stats-free file can never be skipped
    return hit


@pytest.fixture(scope="module")
def zorder_files(spark):
    from hive3_replication_spark.sources.readers import zorder_events_path

    path = zorder_events_path(spark, SF_DIR)
    files = sorted(glob.glob(path + "/*.parquet"))
    assert len(files) >= 8, f"layout produced only {len(files)} files"
    return files


def test_zorder_prunes_event_type(zorder_files):
    """Every single event-type predicate must be satisfiable from a
    strict subset of files — the dimension the S5b date partitioning
    cannot prune at all."""
    n = len(zorder_files)
    for etype in ("click", "error", "purchase", "signup", "view"):
        hit = _files_overlapping(zorder_files, "event_type", etype)
        assert hit <= 0.6 * n, f"type={etype!r} reads {hit}/{n} files"


def test_zorder_prunes_event_date(zorder_files):
    """Single-day predicates must also skip files: z-order trades a
    little of the perfect date clustering a date-only sort would give
    for the ability to prune the second dimension too."""
    n = len(zorder_files)
    for day in (1, 10, 29):
        d = datetime.date(2024, 1, day)
        hit = _files_overlapping(zorder_files, "event_date", d)
        assert hit <= 0.6 * n, f"day={d} reads {hit}/{n} files"


def test_zorder_layout_is_lossless(spark, zorder_files):
    """The layout is semantics-neutral: same rows, same event_id
    multiset as the source table."""
    from hive3_replication_spark.catalog import load_table

    raw = load_table(spark, SF_DIR, "events")
    z = spark.read.parquet(zorder_files[0].rsplit("/", 1)[0])
    assert z.count() == raw.count()
    assert (
        z.selectExpr("sum(hash(event_id)) h").first()["h"]
        == raw.selectExpr("sum(hash(event_id)) h").first()["h"]
    )
