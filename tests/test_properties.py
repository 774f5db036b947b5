"""Hypothesis property tests for driver-side pure logic (SURVEY.md §7 risk
2: the divergence ladder is "easy to get subtly wrong")."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from tests.conftest import SF_DIR

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


def test_scd2_merge_invariants(spark):
    """SCD2 output must be internally coherent: every changed key carries
    exactly one closed v1 and one open v2; inserted keys are open v1;
    open-row count equals |dim| + |inserts| (one current row per live
    key); nothing is both open and closed at the same version."""
    from hive3_replication_spark.operators.joins import merge_scd2

    pdf = merge_scd2(spark, SF_DIR).toPandas()
    closed = pdf[pdf.row_status == "closed"]
    open_rows = pdf[pdf.row_status == "open"]
    # closed rows are always version 1 (the prior version)
    assert (closed.version == 1).all()
    # every closed key has exactly one open v2 successor
    v2 = open_rows[open_rows.version == 2]
    assert set(closed.key) == set(v2.key)
    assert v2.key.is_unique and closed.key.is_unique
    # exactly one open (current) row per key
    assert open_rows.key.is_unique
    # inserted keys (>= 1e6 shift) enter as open version 1
    inserted = open_rows[open_rows.key >= 1_000_000]
    assert (inserted.version == 1).all() and len(inserted) > 0


def test_ewma_first_row_weight(spark):
    """ts_ewma: a partition's first row has a single-element frame, so its
    EWMA must be exactly alpha * value (weight w0 = alpha = 0.25)."""
    from pyspark.sql import functions as F

    from hive3_replication_spark.operators.timeseries import ts_ewma
    from hive3_replication_spark.catalog import load_table

    ewma = ts_ewma(spark, SF_DIR).toPandas()
    events = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "ts", "value")
        .toPandas()
    )
    firsts = (
        events.sort_values(["ts", "event_id"])
        .groupby("event_type")
        .first()
        .reset_index()
    )
    merged = firsts.merge(ewma, on=["event_id", "event_type"])
    assert len(merged) == events.event_type.nunique()
    assert (abs(merged.ewma - (0.25 * merged.value).round(6)) < 1e-9).all()


def test_documents_fixture_text_is_single_line(spark):
    """Fixture invariant guarding the scan_text oracle (ADVICE r2): the
    per-document payload files are read line-wise by spark.read.text, so
    oracle parity (one row per doc, n_line_chars == length(text)) holds
    only while documents.text is newline-free. If the driver ever ships a
    multi-line fixture this fails loudly instead of a silent hash
    mismatch. (scan_binaryfile's byte oracle is already multi-byte-safe
    via octet_length(encode(text)).)"""
    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n_multiline = docs.filter(
        F.col("text").contains("\n") | F.col("text").contains("\r")
    ).count()
    assert n_multiline == 0


def test_jdbc_partitioned_empty_source(spark, tmp_path_factory):
    """scan_jdbc_partitioned on an EMPTY events table: no stripes exist
    (min/max bounds are NULL), so the operator must return the empty
    summary with the standard schema instead of crashing on the bounds."""
    import pandas as pd

    from hive3_replication_spark.sources.readers import scan_jdbc_partitioned

    out = str(tmp_path_factory.mktemp("empty_events"))
    pdf = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "value": pd.Series([], dtype="float64"),
            "props": pd.Series([], dtype="object"),
        }
    )
    spark.createDataFrame(
        pdf,
        schema=(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ),
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    res = scan_jdbc_partitioned(spark, out)
    assert res.columns == ["id_bucket", "n_rows", "sum_users", "sum_value"]
    assert res.count() == 0


def test_acf_constant_series_is_null(spark, tmp_path_factory):
    """ts_acf on a constant-valued series: variance (the denominator) is
    exactly 0, so the ACF is undefined — both engines must return NULL
    (DuckDB division yields NULL; Spark uses try_divide because ANSI
    division would fault), never crash."""
    import duckdb
    import numpy as np
    import pandas as pd

    from hive3_replication_spark.operators.timeseries import ORACLES, ts_acf

    out = str(tmp_path_factory.mktemp("const_events"))
    n = 20
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="min"),
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": ["heartbeat"] * n,
            "value": np.ones(n),  # constant: den == 0
            "props": ["{}"] * n,
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{out}/events.parquet"
    )
    rows = ts_acf(spark, out).collect()
    assert len(rows) == 1
    assert rows[0]["acf_1"] is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{out}/events.parquet/*.parquet'"
    )
    orc = con.sql(ORACLES["ts_acf"]).fetchall()
    assert orc[0][2] is None  # acf_1 column


def test_ewma_leading_null_partition_pins_null(spark, tmp_path_factory):
    """ts_ewma on a partition whose FIRST rows are all NULL-valued: the
    NULL-filtered trailing frame is EMPTY, which must pin ewma to NULL on
    both engines (ADVICE r12) — without the guard Spark's sequence(1,0)
    yields [1,0] and element_at ANSI-faults while DuckDB returns 0.0."""
    import duckdb
    import numpy as np
    import pandas as pd

    from hive3_replication_spark.operators.timeseries import ORACLES, ts_ewma

    out = str(tmp_path_factory.mktemp("lead_null_events"))
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype="int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(4), unit="min"),
            "user_id": np.zeros(4, dtype="int64"),
            "event_type": ["cold"] * 3 + ["warm"],
            "value": [None, None, 7.5, 3.0],
            "props": ["{}"] * 4,
        }
    )
    spark.createDataFrame(
        pdf,
        schema=(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ),
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    rows = {r["event_id"]: r["ewma"] for r in ts_ewma(spark, out).collect()}
    assert rows[0] is None and rows[1] is None  # empty frames → pinned NULL
    assert rows[2] == pytest.approx(7.5 * 0.25, abs=2e-6)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{out}/events.parquet/*.parquet'"
    )
    orc = {r[0]: r[2] for r in con.sql(ORACLES["ts_ewma"]).fetchall()}
    assert orc[0] is None and orc[1] is None
    assert orc[2] == pytest.approx(rows[2], abs=1e-9)


def test_acf_matches_numpy_reference(spark, tmp_path_factory):
    """ts_acf lags 1-3 vs an independent NumPy implementation of the
    biased mean-centered estimator, over 24 random series (VERDICT r7 ask
    #7 — the same harness idea as the EWMA rows). Values are exact
    milli-unit multiples so both sides see identical quantization; the
    engine rounds to 6 dp, so the comparison tolerance is 2e-6."""
    import numpy as np
    import pandas as pd

    from hive3_replication_spark.operators.timeseries import ts_acf

    series = {}
    frames = []
    t0 = pd.Timestamp("2024-01-01")
    for seed in range(24):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(8, 60))
        milli = rng.integers(-5_000_000, 5_000_000, size=n)
        series[f"s{seed:02d}"] = milli
        frames.append(
            pd.DataFrame(
                {
                    "event_id": np.arange(n, dtype="int64"),
                    "ts": t0 + pd.to_timedelta(np.arange(n), unit="min"),
                    "user_id": np.zeros(n, dtype="int64"),
                    "event_type": [f"s{seed:02d}"] * n,
                    "value": milli / 1000.0,
                    "props": ["{}"] * n,
                }
            )
        )
    out = str(tmp_path_factory.mktemp("acf_prop"))
    spark.createDataFrame(pd.concat(frames)).coalesce(1).write.parquet(
        f"{out}/events.parquet"
    )

    got = {
        r["event_type"]: r for r in ts_acf(spark, out).collect()
    }
    assert set(got) == set(series)
    for name, milli in series.items():
        v = milli.astype("float64")
        m = v.mean()
        den = ((v - m) ** 2).sum()
        for k in (1, 2, 3):
            ref = float(((v[k:] - m) * (v[:-k] - m)).sum() / den)
            eng = got[name][f"acf_{k}"]
            assert eng is not None, (name, k)
            assert abs(eng - ref) <= 2e-6, (name, k, eng, ref)


def test_stl_matches_pandas_twin(spark):
    """TS19 replayed with an independent pandas reference: hourly counts
    reindexed to the dense grid, trend = centered rolling(25) mean,
    seasonal = per-hour-of-day mean of the detrended interior, residual
    the remainder — every output column must agree to float noise, and
    the additive identity must hold row-exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.operators.timeseries import (
        _STL_W,
        ts_stl_decompose,
    )

    got = (
        ts_stl_decompose(spark, SF_DIR)
        .toPandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    recon = got.trend + got.seasonal + got.residual
    assert np.allclose(recon, got.n_events, rtol=0, atol=1e-9)
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .toPandas()
    )
    frames = []
    for t, g in ev.groupby("event_type"):
        counts = g.groupby("hour").size()
        idx = pd.date_range(counts.index.min(), counts.index.max(), freq="h")
        series = counts.reindex(idx, fill_value=0).astype("float64")
        trend = series.rolling(_STL_W, center=True).mean()
        detr = series - trend
        seasonal = detr.groupby(detr.index.hour).transform("mean")
        interior = trend.notna()
        frames.append(
            pd.DataFrame(
                {
                    "event_type": t,
                    "hour": series.index[interior],
                    "n_events": series[interior].astype("int64").values,
                    "trend": trend[interior].values,
                    "seasonal": seasonal[interior].values,
                }
            )
        )
    ref = (
        pd.concat(frames)
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    assert len(ref) == len(got)
    assert (ref.event_type.values == got.event_type.values).all()
    assert (ref.hour.values == got.hour.values).all()
    assert (ref.n_events.values == got.n_events.values).all()
    assert np.allclose(ref.trend, got.trend, rtol=1e-9, atol=1e-9)
    assert np.allclose(ref.seasonal, got.seasonal, rtol=1e-9, atol=1e-9)


def test_holt_winters_matches_recursion_twin(spark):
    """TS20 two-sided twin: (1) the EXACT Holt level/trend recursion —
    an independent reference the engine never evaluates — must agree
    with the engine's truncated-filter forecast within the documented
    tail mass (Σ_{j>48} c_j ≈ 2.6e-4 of the deseasonalized scale);
    (2) the outlier flags must recompute EXACTLY from the engine's own
    residuals via the integer band test (m·e_q − S1)² > 9·(m·S2 − S1²)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.operators.timeseries import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_K,
        _HW_RQ,
        ts_holt_winters,
    )

    got = (
        ts_holt_winters(spark, SF_DIR)
        .toPandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .toPandas()
    )
    for t, g in ev.groupby("event_type"):
        counts = g.groupby("hour").size()
        idx = pd.date_range(counts.index.min(), counts.index.max(), freq="h")
        series = counts.reindex(idx, fill_value=0).astype("float64")
        seas = series.groupby(series.index.hour).transform(
            "mean"
        ) - series.mean()
        d = (series - seas).to_numpy()
        sub = got[got.event_type == t]
        assert len(sub) == len(series) - _HW_K
        # exact recursion over the full deseasonalized history (zero init,
        # matching the filter's zero-init impulse response)
        scale = np.abs(d).max()
        for row_i, (pos, row) in enumerate(sub.iterrows()):
            te = _HW_K + row_i  # forecast target index in the series
            lvl = b = 0.0
            for yv in d[:te]:
                l_new = _HW_ALPHA * yv + (1 - _HW_ALPHA) * (lvl + b)
                b = _HW_BETA * (l_new - lvl) + (1 - _HW_BETA) * b
                lvl = l_new
            f_exact = lvl + b + seas.iloc[te]
            assert abs(f_exact - row.forecast_r) < 5e-4 * scale + 1e-5, (
                t, row.hour, f_exact, row.forecast_r,
            )
        # integer band test replayed exactly from the engine's residuals
        e_q = np.floor(
            (sub.n_events.to_numpy() - sub.forecast_r.to_numpy()) * _HW_RQ
            + 0.5
        ).astype("int64")
        m, s1, s2 = len(e_q), int(e_q.sum()), int((e_q.astype(object) ** 2).sum())
        expect = (m * e_q.astype(object) - s1) ** 2 > 9 * (m * s2 - s1 * s1)
        # forecast_r is the 6-dp rounded forecast, so e_q recomputed from
        # it can sit one milli-unit off the engine's unrounded value right
        # at a .0005 boundary; allow AT MOST ONE flipped flag per stream
        # (an absolute bound — a 0.1% RATE bound is vacuous below 1000
        # rows, where a single benign flip would already fail it)
        flips = int((sub.is_outlier.to_numpy() != expect.astype(bool)).sum())
        assert flips <= 1, (t, flips)
    assert 0 < got.is_outlier.sum() < 0.05 * len(got)


def test_holt_winters_band_bound_edge(spark):
    """TS20 bound gate (VERDICT r10 ask #4): the documented DECIMAL(38,0)
    capacity claim — m ≤ 1e6 interior hours per stream, |residual| ≤ 1e9
    (so |e_q| ≤ 1e12) — exercised AT the edge through Spark's own decimal
    engine with the band's exact expression shapes. At the edge every
    intermediate ((m·e_q − S1)² ≤ 4e36, 9·(m·S2 − S1²) ≤ 1.8e37) must fit
    DECIMAL(38,0): an overflow would surface as NULL (non-ANSI) or raise
    (ANSI), so the assertion that both the boolean and its inputs are
    non-NULL and equal the exact Python-int evaluation IS the capacity
    proof, in the A18/A27 bracket style."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StructField,
        StructType,
    )

    m_edge = 10**6  # 114 years of hourly rows per stream
    eq_edge = 10**12  # |resid| = 1e9 at milli-unit quantization
    s1_edge = m_edge * eq_edge  # |S1| maximal when every e_q is extreme
    s2_edge = m_edge * eq_edge**2  # S2 = Σe_q² at the same extreme
    rows = [
        # (m, e_q, s1, s2) — all four corners of the bound box, with s1
        # signed AGAINST e_q so |m·e_q − S1| is maximal (2e18)
        (m_edge, eq_edge, -s1_edge, s2_edge),
        (m_edge, -eq_edge, s1_edge, s2_edge),
        (m_edge, eq_edge, s1_edge, s2_edge),
        (m_edge, -eq_edge, -s1_edge, s2_edge),
    ]
    schema = StructType(
        [
            StructField("m", LongType()),
            StructField("e_q", LongType()),
            StructField("s1", DecimalType(38, 0)),
            StructField("s2", DecimalType(38, 0)),
        ]
    )
    df = spark.createDataFrame(
        [(m, e, Decimal(s1), Decimal(s2)) for m, e, s1, s2 in rows], schema
    )
    # character-identical expression shapes to ts_holt_winters
    lhs = F.col("m") * F.col("e_q").cast("decimal(19,0)") - F.col("s1")
    rhs = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    got = df.select(
        "m",
        "e_q",
        "s1",
        "s2",
        (lhs * lhs).alias("lhs_sq"),
        (F.lit(9).cast("decimal(19,0)") * rhs).alias("rhs_9"),
        (lhs * lhs > F.lit(9).cast("decimal(19,0)") * rhs).alias(
            "is_outlier"
        ),
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        m, e_q, s1, s2 = r["m"], r["e_q"], int(r["s1"]), int(r["s2"])
        lhs_exact = (m * e_q - s1) ** 2
        rhs_exact = 9 * (m * s2 - s1 * s1)
        assert r["lhs_sq"] is not None and r["rhs_9"] is not None, (
            "decimal overflow inside the documented bound",
            r,
        )
        assert int(r["lhs_sq"]) == lhs_exact, r
        assert int(r["rhs_9"]) == rhs_exact, r
        assert r["is_outlier"] == (lhs_exact > rhs_exact), r


def test_interval_overlap_matches_pandas_twin(spark):
    """J17 replayed in pure pandas: independent sessionization of both
    relations (30-min user sessions, 5-min error bursts) and a plain
    O(n·m) overlap join — the bucket-blocked Spark form must return
    exactly that pair set, each pair exactly once (the exactly-once
    bucket filter must not duplicate or drop boundary pairs)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.operators.joins import (
        _IVO_BURST_GAP_US,
        _IVO_SESSION_GAP_US,
        join_interval_overlap,
    )

    got = join_interval_overlap(spark, SF_DIR).toPandas()
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "event_id", "ts")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )

    def islands(df: pd.DataFrame, gap_us: int) -> list[tuple]:
        out = []
        start = end = None
        for t in df.ts:
            if end is not None and (t - end).value // 1000 <= gap_us:
                end = t
            else:
                if start is not None:
                    out.append((start, end))
                start = end = t
        if start is not None:
            out.append((start, end))
        return out

    sessions = []
    for uid, g in ev.groupby("user_id"):
        sessions += [(uid, s, e) for s, e in islands(g, _IVO_SESSION_GAP_US)]
    bursts = islands(ev[ev.event_type == "error"], _IVO_BURST_GAP_US)
    expect = sorted(
        (uid, s, e, bs, be)
        for uid, s, e in sessions
        for bs, be in bursts
        if s <= be and bs <= e
    )
    got_rows = sorted(
        map(
            tuple,
            got[
                ["user_id", "s_start", "s_end", "b_start", "b_end"]
            ].itertuples(index=False),
        )
    )
    assert len(got_rows) == len(expect), (len(got_rows), len(expect))
    assert got_rows == expect


def test_mmr_rerank_matches_python_twin(spark):
    """L35 replayed in pure python: both retrieval arms (BM25 +
    sequential-fold cosine) → fused RRF scores for every candidate →
    greedy MMR with quantized integer sims — the selected sequence,
    relevances, and scores must match the engine EXACTLY (the greedy
    path is all-BIGINT comparisons). Also asserts the MMR invariants:
    scores are non-increasing in step (the greedy argmax can only
    shrink), and the diversified list differs from pure-relevance order
    (the penalty actually did something)."""
    import math

    import pyarrow.parquet as pq

    from hive3_replication_spark.llm.retrieval import (
        _BM25_B,
        _BM25_IDF_SCALE,
        _BM25_K1,
        _BM25_QUERY,
        _MMR_D_NUM,
        _MMR_L_NUM,
        _MMR_OUT,
        _MMR_RELMAX,
        _MMR_SIMQ,
        _RRF_ARM_K,
        _RRF_K,
        _RRF_SCALE,
        llm_mmr_rerank,
    )

    got = (
        llm_mmr_rerank(spark, SF_DIR)
        .toPandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    rows = []
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        rows.append(
            (int(r.doc_id), len(toks), [toks.count(t) for t in _BM25_QUERY])
        )
    n_docs = len(rows)
    avgdl = sum(r[1] for r in rows) / n_docs
    dfreq = [
        sum(1 for r in rows if r[2][i] > 0) for i in range(len(_BM25_QUERY))
    ]

    def lex_score(r) -> float:
        s = 0.0
        for i in range(len(_BM25_QUERY)):
            idf = (n_docs - dfreq[i] + 1) * _BM25_IDF_SCALE // (dfreq[i] + 1)
            tf = r[2][i]
            s += (
                idf
                * (tf * (_BM25_K1 + 1.0))
                / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * r[1] / avgdl))
            )
        return s

    lex_sorted = sorted(rows, key=lambda r: (-lex_score(r), r[0]))
    lex_rank = {r[0]: i + 1 for i, r in enumerate(lex_sorted[:_RRF_ARM_K])}
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    vecs = {
        int(r.vec_id): list(map(float, r.embedding))
        for _, r in emb.iterrows()
    }
    q = vecs[0]

    def seq_dot(a, b) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    qn = math.sqrt(seq_dot(q, q))
    cos_q = {
        d: seq_dot(v, q) / (math.sqrt(seq_dot(v, v)) * qn)
        for d, v in vecs.items()
        if d != 0
    }
    vec_sorted = sorted(cos_q.items(), key=lambda kv: (-kv[1], kv[0]))
    vec_rank = {d: i + 1 for i, (d, _) in enumerate(vec_sorted[:_RRF_ARM_K])}
    rel_n = {}
    for d in set(lex_rank) | set(vec_rank):
        rrf = 0
        if d in lex_rank:
            rrf += _RRF_SCALE // (_RRF_K + lex_rank[d])
        if d in vec_rank:
            rrf += _RRF_SCALE // (_RRF_K + vec_rank[d])
        rel_n[d] = rrf * _MMR_SIMQ // _MMR_RELMAX

    def sim_q(a: int, b: int) -> int:
        va, vb = vecs[a], vecs[b]
        cos = seq_dot(va, vb) / (
            math.sqrt(seq_dot(va, va)) * math.sqrt(seq_dot(vb, vb))
        )
        return math.floor(cos * _MMR_SIMQ + 0.5)

    selected: list[tuple[int, int]] = []
    remaining = set(rel_n)
    for _ in range(min(_MMR_OUT, len(rel_n))):
        best = None
        for c in sorted(remaining):
            pen = max(0, max((sim_q(c, s) for s, _ in selected), default=0))
            score = _MMR_L_NUM * rel_n[c] - _MMR_D_NUM * pen
            if best is None or score > best[1]:
                best = (c, score)
        selected.append(best)
        remaining.discard(best[0])
    assert [
        (int(r.doc_id), int(r.mmr_score)) for _, r in got.iterrows()
    ] == selected
    assert [int(r.rel_n) for _, r in got.iterrows()] == [
        rel_n[d] for d, _ in selected
    ]
    scores = got.mmr_score.tolist()
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    pure_rel = [
        d for d, _ in sorted(rel_n.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_MMR_OUT]
    assert got.doc_id.tolist() != pure_rel


def test_eval_calibration_matches_python_twin(spark):
    """L36 replayed in pure python integers: marker counts, argmax
    prediction, exact rational confidence, binning, per-bin gaps, and
    the textbook ECE = Σ (n_b/N)·|acc_b − conf̄_b| — the python twin
    computes it as the exact integer numerator Σ|k·1e6 − Σconf| // N
    and every output cell must match. Sanity: bins partition the corpus
    and the heuristic's ECE is materially nonzero on the fixture (its
    confidence is NOT trustworthy — which is the point of the metric)."""
    import pyarrow.parquet as pq

    from hive3_replication_spark.llm.text import (
        _CAL_BINS,
        _CAL_PRIOR,
        _CAL_SCALE,
        llm_eval_calibration,
    )

    got = (
        llm_eval_calibration(spark, SF_DIR)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    bins: dict[int, list[tuple[int, int]]] = {}
    for _, r in docs.iterrows():
        t = r.text
        n_the = (len(t) - len(t.replace("the", ""))) // 3
        n_data = (len(t) - len(t.replace("data", ""))) // 4
        n_spark = (len(t) - len(t.replace("spark", ""))) // 5
        if n_the >= n_data and n_the >= n_spark:
            pred = "en"
        elif n_data >= n_spark:
            pred = "de"
        else:
            pred = "zh"
        total = n_the + n_data + n_spark
        conf = (
            max(n_the, n_data, n_spark) * _CAL_SCALE // total
            if total > 0
            else _CAL_PRIOR
        )
        b = min(conf // (_CAL_SCALE // _CAL_BINS), _CAL_BINS - 1)
        bins.setdefault(b, []).append((int(pred == r.lang), conf))
    gap_total = sum(
        abs(sum(c for c, _ in rows) * _CAL_SCALE - sum(x for _, x in rows))
        for rows in bins.values()
    )
    ece = gap_total // len(docs)
    assert got.n.sum() == len(docs)
    assert set(got.bin) == set(bins)
    for _, row in got.iterrows():
        rows = bins[int(row.bin)]
        n, k = len(rows), sum(c for c, _ in rows)
        csum = sum(x for _, x in rows)
        assert row.n == n and row.n_correct == k
        assert row.acc_micro == k * _CAL_SCALE // n
        assert row.avg_conf_micro == csum // n
        assert row.gap_micro == abs(k * _CAL_SCALE - csum) // n
        assert row.ece_micro == ece
    assert got.ece_micro.iloc[0] > 10_000  # materially miscalibrated


def test_eval_ndcg_matches_python_twin(spark):
    """L34 replayed in pure python: cosine ranking per query (sequential
    index-order dot products matching the engines), label-distance
    grades, textbook DCG@10 = Σ (2^rel − 1)·D_i against the literal
    discount table, ideal DCG from the sorted grade multiset (NOT the
    engine's prefix-sum shortcut — an independent formulation that must
    land on the identical integer), and the metric sanity bounds
    0 ≤ nDCG ≤ 1 with at least two queries strictly inside."""
    import pyarrow.parquet as pq

    from hive3_replication_spark.llm.retrieval import (
        _NDCG_D,
        _NDCG_K,
        _NDCG_NQ,
        llm_eval_ndcg,
    )

    got = (
        llm_eval_ndcg(spark, SF_DIR)
        .toPandas()
        .sort_values("q_id")
        .reset_index(drop=True)
    )
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()

    def seq_dot(a, b) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    corpus = emb[emb.vec_id >= _NDCG_NQ]
    assert len(got) == _NDCG_NQ
    for _, qrow in emb[emb.vec_id < _NDCG_NQ].iterrows():
        q = list(map(float, qrow.embedding))
        qn = seq_dot(q, q) ** 0.5
        scored = []
        for _, r in corpus.iterrows():
            v = list(map(float, r.embedding))
            cos = seq_dot(v, q) / ((seq_dot(v, v) ** 0.5) * qn)
            rel = max(0, 3 - abs(int(r.label) - int(qrow.label)))
            scored.append((cos, int(r.vec_id), rel))
        scored.sort(key=lambda t: (-t[0], t[1]))
        dcg = sum(
            ((1 << rel) - 1) * _NDCG_D[i]
            for i, (_, _, rel) in enumerate(scored[:_NDCG_K])
        )
        ideal = sorted((rel for _, _, rel in scored), reverse=True)
        idcg = sum(
            ((1 << rel) - 1) * _NDCG_D[i]
            for i, rel in enumerate(ideal[:_NDCG_K])
        )
        row = got[got.q_id == int(qrow.vec_id)].iloc[0]
        assert row.dcg_s == dcg, (qrow.vec_id, row.dcg_s, dcg)
        assert row.idcg_s == idcg, (qrow.vec_id, row.idcg_s, idcg)
        assert row.ndcg_micro == dcg * 1_000_000 // idcg
    assert (got.ndcg_micro >= 0).all() and (got.ndcg_micro <= 1_000_000).all()
    assert ((got.ndcg_micro > 0) & (got.ndcg_micro < 1_000_000)).sum() >= 2


def test_line_boilerplate_matches_python_twin(spark):
    """L33 replayed in pure python: tile every document into 3-token
    lines, count exact line occurrences corpus-wide, drop lines at the
    threshold, md5 the space-joined survivors — every output row must
    match exactly, and the planted invariants must hold (a doc whose
    every line is unique corpus-wide keeps md5(text); n_dropped ≤
    n_lines everywhere; at least one line is actually dropped)."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from hive3_replication_spark.llm.text import (
        _BP_T,
        _BP_W,
        llm_line_boilerplate,
    )

    got = (
        llm_line_boilerplate(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    tiled: dict[int, list[str]] = {}
    freq: Counter = Counter()
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        lines = [
            " ".join(toks[i : i + _BP_W]) for i in range(0, len(toks), _BP_W)
        ]
        tiled[int(r.doc_id)] = lines
        freq.update(lines)
    assert len(got) == len(docs)
    n_dropped_total = 0
    for _, row in got.iterrows():
        lines = tiled[int(row.doc_id)]
        kept = [ln for ln in lines if freq[ln] < _BP_T]
        dropped = len(lines) - len(kept)
        n_dropped_total += dropped
        assert row.n_lines == len(lines)
        assert row.n_dropped == dropped
        assert (
            row.cleaned_md5
            == hashlib.md5(" ".join(kept).encode()).hexdigest()
        )
        if dropped == 0:
            assert (
                row.cleaned_md5
                == hashlib.md5(" ".join(lines).encode()).hexdigest()
            )
    assert n_dropped_total > 0


def test_rank_fusion_matches_python_twin(spark):
    """L32 replayed in pure python: BM25 arm (document granularity),
    cosine arm (sequential fold matching the engines' index-order sum),
    per-arm top-50 ranks, integer RRF — the fused top-10 must match
    exactly, scores included (they are exact BIGINTs)."""
    import pandas as pd
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F  # noqa: F401 - parity of style

    from hive3_replication_spark.llm.retrieval import (
        _BM25_B,
        _BM25_IDF_SCALE,
        _BM25_K1,
        _BM25_QUERY,
        _RRF_ARM_K,
        _RRF_K,
        _RRF_SCALE,
        _RRF_TOPK,
        llm_rank_fusion,
    )

    got = llm_rank_fusion(spark, SF_DIR).toPandas()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    rows = []
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        rows.append(
            (int(r.doc_id), len(toks), [toks.count(t) for t in _BM25_QUERY])
        )
    n_docs = len(rows)
    avgdl = sum(r[1] for r in rows) / n_docs
    dfreq = [
        sum(1 for r in rows if r[2][i] > 0) for i in range(len(_BM25_QUERY))
    ]

    def lex_score(r) -> float:
        s = 0.0
        for i in range(len(_BM25_QUERY)):
            idf = (n_docs - dfreq[i] + 1) * _BM25_IDF_SCALE // (dfreq[i] + 1)
            tf = r[2][i]
            s += (
                idf
                * (tf * (_BM25_K1 + 1.0))
                / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * r[1] / avgdl))
            )
        return s

    lex_sorted = sorted(rows, key=lambda r: (-lex_score(r), r[0]))
    lex_rank = {r[0]: i + 1 for i, r in enumerate(lex_sorted[:_RRF_ARM_K])}
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    q = list(map(float, emb.loc[emb.vec_id == 0, "embedding"].iloc[0]))

    def seq_dot(a, b) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    cos = {}
    qn = seq_dot(q, q) ** 0.5
    for _, r in emb.iterrows():
        if int(r.vec_id) == 0:
            continue
        v = list(map(float, r.embedding))
        cos[int(r.vec_id)] = seq_dot(v, q) / ((seq_dot(v, v) ** 0.5) * qn)
    vec_sorted = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
    vec_rank = {d: i + 1 for i, (d, _) in enumerate(vec_sorted[:_RRF_ARM_K])}
    fused = {}
    for d in set(lex_rank) | set(vec_rank):
        score = 0
        if d in lex_rank:
            score += _RRF_SCALE // (_RRF_K + lex_rank[d])
        if d in vec_rank:
            score += _RRF_SCALE // (_RRF_K + vec_rank[d])
        fused[d] = score
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_TOPK]
    assert list(zip(got.doc_id, got.rrf_score)) == expect
    for _, row in got.iterrows():
        # arm-absent documents report a NULL rank (round-10: the 0
        # sentinel was a magic value a consumer could misread as "best")
        if row.doc_id in lex_rank:
            assert row.lex_rank == lex_rank[row.doc_id]
        else:
            assert pd.isna(row.lex_rank)
        if row.doc_id in vec_rank:
            assert row.vec_rank == vec_rank[row.doc_id]
        else:
            assert pd.isna(row.vec_rank)


def _urllib_canon(url: str) -> tuple[str, int]:
    """Independent canonicalizer (urllib.parse — a different URL grammar
    implementation than the engine's string algebra): returns
    (canon_url, n_params_removed)."""
    import re
    from urllib.parse import urlsplit

    u = urlsplit(url)
    scheme = u.scheme.lower()
    host = (u.hostname or "").lower()
    netloc = host
    if u.port is not None and not (
        (scheme == "https" and u.port == 443)
        or (scheme == "http" and u.port == 80)
    ):
        netloc += f":{u.port}"
    path = re.sub(r"/{2,}", "/", u.path)
    path = "/" if path in ("", "/") else re.sub(r"/$", "", path)
    raw = [p for p in u.query.split("&") if p]
    kept = sorted(
        p
        for p in raw
        if not p.startswith(("utm_", "fbclid=", "gclid="))
    )
    q = "?" + "&".join(kept) if kept else ""
    return f"{scheme}://{netloc}{path}{q}", len(raw) - len(kept)


def test_url_canonicalize_matches_urllib_twin(spark):
    """L38 twin: the engine's string-algebra canonicalization must agree
    with an independent urllib.parse-based implementation on every
    synthesized URL (all three mess-variant classes), including the
    tracking-removal count."""
    from hive3_replication_spark.llm.web import llm_url_canonicalize

    got = llm_url_canonicalize(spark, SF_DIR).toPandas()
    assert len(got) > 0
    for row in got.itertuples():
        canon, removed = _urllib_canon(row.url)
        assert row.canon_url == canon, (row.url, row.canon_url, canon)
        assert row.n_params_removed == removed, row
        # structural canonicality: one scheme case, no fragment, no
        # default port, no duplicate slashes, no tracking params
        assert canon.startswith("https://www.src"), canon
        assert "#" not in canon and ":443" not in canon, canon
        assert "//" not in canon[len("https://"):], canon
        assert "utm_" not in canon and "fbclid" not in canon, canon


def test_dedup_url_matches_python_twin(spark):
    """L2e twin: URL groups replayed from the urllib canonicalizer over
    the engine's raw URLs — group count, keeper, and copy count must all
    match, and the synthesis guarantee (three mess variants per page)
    must show up as all-but-at-most-one groups of size 3."""
    from hive3_replication_spark.llm.web import (
        llm_dedup_url,
        llm_url_canonicalize,
    )

    raw = llm_url_canonicalize(spark, SF_DIR).toPandas()
    groups: dict[str, list[int]] = {}
    for row in raw.itertuples():
        canon, _ = _urllib_canon(row.url)
        groups.setdefault(canon, []).append(row.doc_id)
    got = llm_dedup_url(spark, SF_DIR).toPandas()
    assert len(got) == len(groups)
    for row in got.itertuples():
        ids = groups[row.canon_url]
        assert row.canonical_doc_id == min(ids), row
        assert row.n_copies == len(ids), row
    # every page group collapses exactly its 3 mess variants, except AT
    # MOST ONE partial tail group (doc count not divisible by 3)
    non_full = [s for s in got.n_copies.tolist() if s != 3]
    assert len(non_full) <= 1 and all(1 <= s < 3 for s in non_full), (
        "exactly the partial tail group may be smaller than 3", non_full,
    )


def test_domain_authority_matches_python_twin(spark):
    """L37 twin: the damped integer power iteration replayed in pure
    Python dict arithmetic from the raw documents table — out-weights,
    pr1, and pr2 must match the engine EXACTLY (same integer divisions
    in the same places)."""
    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.llm.web import _PR_SCALE, llm_domain_authority

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "source")
        .toPandas()
    )
    docs = docs[docs.lang.notna() & docs.source.notna()]
    doms = sorted(set(zip(docs.lang, docs.source)))
    dom_id = {d: i for i, d in enumerate(doms)}
    host = {i: f"{d[0]}.{d[1]}.example.com" for i, d in enumerate(doms)}
    n = len(doms)
    edges: dict[tuple[int, int], int] = {}
    for row in docs.itertuples():
        s = dom_id[(row.lang, row.source)]
        for j in (1, 2, 3):
            t = (row.doc_id * 31 + 7 * j) % n
            if t != s:
                edges[(s, t)] = edges.get((s, t), 0) + 1
    out_w = {i: 0 for i in range(n)}
    for (s, _t), w in edges.items():
        out_w[s] += w
    base = (15 * _PR_SCALE) // 100

    def iterate(rank: dict[int, int]) -> dict[int, int]:
        mass = {i: 0 for i in range(n)}
        for (s, t), w in edges.items():
            mass[t] += (rank[s] * w) // out_w[s]
        return {i: base + (85 * mass[i]) // 100 for i in range(n)}

    r1 = iterate({i: _PR_SCALE for i in range(n)})
    r2 = iterate(r1)
    got = llm_domain_authority(spark, SF_DIR).toPandas()
    assert len(got) == n
    for row in got.itertuples():
        i = next(k for k, h in host.items() if h == row.host)
        assert row.out_w == out_w[i], row
        assert row.pr1 == r1[i], row
        assert row.pr2 == r2[i], row
    # total rank mass stays bounded by the damping (sanity of the scheme)
    assert 0 < got.pr2.min() <= got.pr2.max() < 100 * _PR_SCALE


def test_forecast_backtest_matches_python_twin(spark):
    """TS21 twin: MAE/sMAPE/skill replayed in Python big-int arithmetic
    from the ENGINE's own TS20 output (the backtest grades the rounded
    relation both engines already agree on bit-for-bit) — every
    aggregate must match exactly, and the Holt forecaster must beat the
    seasonal-naive baseline on the fixture (positive skill)."""
    import math

    from hive3_replication_spark.operators.timeseries import (
        _BT_LAG,
        ts_forecast_backtest,
        ts_holt_winters,
    )

    hw = (
        ts_holt_winters(spark, SF_DIR)
        .toPandas()
        .sort_values(["event_type", "hour"])
    )
    got = (
        ts_forecast_backtest(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    for t, g in hw.groupby("event_type"):
        y = g.n_events.tolist()
        resid = g.resid_r.tolist()
        rows = [
            (y[i], resid[i], y[i - _BT_LAG]) for i in range(_BT_LAG, len(y))
        ]
        n = len(rows)
        e_m = [int(math.floor(abs(r) * 1000.0 + 0.5)) for _, r, _ in rows]
        e_n = [abs(yv - nf) * 1000 for yv, _, nf in rows]

        def smape_q(num: float, den: float) -> int:
            return (
                0 if den == 0.0 else int(math.floor(num / den * 1e9 + 0.5))
            )

        s_m = [
            smape_q(2.0 * abs(r), abs(float(yv)) + abs(float(yv) - r))
            for yv, r, _ in rows
        ]
        s_n = [
            smape_q(2.0 * float(abs(yv - nf)), float(yv + nf))
            for yv, _, nf in rows
        ]
        row = got.loc[t]
        assert row.n_eval == n, (t, n, row.n_eval)
        assert row.mae_model_milli == sum(e_m) // n, t
        assert row.mae_naive_milli == sum(e_n) // n, t
        assert row.smape_model_nano == sum(s_m) // n, t
        assert row.smape_naive_nano == sum(s_n) // n, t
        assert row.skill_micro == (
            (sum(e_n) - sum(e_m)) * 1_000_000 // sum(e_n)
        ), t
        assert row.skill_micro > 0, (
            "Holt must beat seasonal-naive on the fixture", t, row,
        )


def test_pack_quality_matches_python_twin(spark):
    """L10b twin: the packing quality report replayed from a pure-Python
    greedy repack of the raw documents — every per-shard statistic must
    match exactly, and the global accounting identity
    n_seqs·budget = total − overflow + slack must hold per shard."""
    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.llm.sampling import (
        _CTX_TOKENS,
        _PACK_SHARDS,
        llm_pack_quality,
    )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    fills: dict[tuple[int, int], list[int]] = {}
    for row in docs.sort_values("doc_id").itertuples():
        nt = min(len(row.text.split(" ")), _CTX_TOKENS)
        shard = row.doc_id % _PACK_SHARDS
        cum = sum(
            sum(v) for (s, _q), v in fills.items() if s == shard
        )
        seq = cum // _CTX_TOKENS
        fills.setdefault((shard, seq), []).append(nt)
    got = llm_pack_quality(spark, SF_DIR).toPandas().set_index("shard")
    shards = {s for s, _q in fills}
    assert len(got) == len(shards)
    for s in shards:
        seqs = {q: v for (sh, q), v in fills.items() if sh == s}
        used = {q: sum(v) for q, v in seqs.items()}
        row = got.loc[s]
        assert row.n_seqs == len(seqs), s
        assert row.n_docs == sum(len(v) for v in seqs.values()), s
        assert row.total_tokens == sum(used.values()), s
        assert row.slack_tokens == sum(
            max(_CTX_TOKENS - u, 0) for u in used.values()
        ), s
        assert row.overflow_tokens == sum(
            max(u - _CTX_TOKENS, 0) for u in used.values()
        ), s
        assert row.max_fill == max(used.values()), s
        assert row.min_fill == min(used.values()), s
        assert row.efficiency_micro == (
            row.total_tokens * 1_000_000 // (row.n_seqs * _CTX_TOKENS)
        ), s
        assert (
            row.n_seqs * _CTX_TOKENS
            == row.total_tokens - row.overflow_tokens + row.slack_tokens
        ), s


def test_anomaly_mad_matches_python_twin(spark):
    """TS22 twin: lower-median MAD replayed in pure Python from the raw
    events — per-stream median, MAD, and every flag must match exactly
    (the quantization replayed through Decimal, matching the engines'
    DECIMAL(18,3) half-up device)."""
    from decimal import ROUND_HALF_UP, Decimal

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.operators.timeseries import (
        _MAD_K,
        ts_anomaly_mad,
    )

    events = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "value")
        .toPandas()
    )
    q = {
        row.event_id: int(
            # float() first: itertuples yields numpy scalars, whose repr
            # under numpy>=2 is 'np.float64(x)' — not Decimal-parseable
            Decimal(repr(float(row.value))).quantize(
                Decimal("0.001"), rounding=ROUND_HALF_UP
            )
            * 1000
        )
        for row in events.itertuples()
    }

    def lower_median(vals: list[int]) -> int:
        s = sorted(vals)
        # min v with 2*cum >= n  ==  element at ceil(n/2) - 1
        return s[(len(s) + 1) // 2 - 1]

    got = ts_anomaly_mad(spark, SF_DIR).toPandas()
    assert len(got) == len(events)
    for t, g in events.groupby("event_type"):
        vals = [q[e] for e in g.event_id]
        med = lower_median(vals)
        mad = lower_median([abs(v - med) for v in vals])
        sub = got[got.event_type == t].set_index("event_id")
        assert (sub.med_milli == med).all(), t
        assert (sub.mad_milli == mad).all(), t
        for e in g.event_id:
            d = abs(q[e] - med)
            row = sub.loc[e]
            assert row.value_milli == q[e], (t, e)
            assert row.dev_milli == d, (t, e)
            assert bool(row.is_outlier) == (d > _MAD_K * mad), (t, e)
    # robustness sanity: the MAD flags a minority, never the majority
    assert 0 < got.is_outlier.mean() < 0.5


def _py_html_page(doc_id, text, lang, source) -> str:
    """Python twin of web._synth_html_col — same literals, '' coalesce."""
    d, t = str(doc_id), text or ""
    lg, src = lang or "", source or ""
    return (
        f"<html>\n<head>\n<title>Doc &#39;{d}&#39; &amp; {src}</title>\n"
        "<style>body { color: #0f0; }</style>\n"
        f'<script type="text/javascript">var d = {d};'
        ' if (d > 0) { track("&amp;nbsp;"); }</script>\n'
        f'</head>\n<body class="doc lang-{lg}">\n'
        f"<h1>Doc {d} &lt;draft&gt;</h1>\n<!-- crawl artifact {d} -->\n"
        f'<p id="p1">{t}</p>\n<script>inline(d);</script>\n'
        '<p id="p2">tail&nbsp;&amp;&nbsp;end &amp;lt;esc&amp;gt;</p>\n'
        "</body>\n</html>"
    )


def _py_html_extract(page: str) -> tuple[str, str]:
    """Python twin of the L39 strip pipeline: block strips on the whole
    page, body span, tag strip, entity decode (&amp; last), ws collapse."""
    import re

    cleaned = page
    for pat in (
        r"(?is)<script[^>]*>.*?</script>",
        r"(?is)<style[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
    ):
        cleaned = re.sub(pat, " ", cleaned)
    m = re.search(r"(?is)<body[^>]*>(.*?)</body>", cleaned)
    body = re.sub(r"<[^>]+>", " ", m.group(1) if m else "")
    tm = re.search(r"(?is)<title[^>]*>(.*?)</title>", page)
    title = tm.group(1) if tm else ""
    out = []
    for frag in (title, body):
        for src, dst in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
        ):
            frag = frag.replace(src, dst)
        # explicit ASCII class, NOT \s — Python's \s is Unicode-wide
        # while Java/RE2 differ from it AND from each other (web.py
        # _HTML_WS_RE); strip(' ') not strip() for the same reason —
        # both engines' trim() strips ASCII spaces only, and after the
        # collapse every boundary ASCII-ws char IS a space
        out.append(re.sub(r"[ \t\r\n\x0b\f]+", " ", frag).strip(" "))
    return out[0], out[1]


def test_html_extract_matches_python_twin(spark):
    """L39 twin: the engine's regexp extraction must agree with an
    independent Python `re` replay on every document — title, body text,
    and length — and the planted noise classes must verifiably round-trip
    (entities decoded, no tag/script/style/comment residue)."""
    import pandas as pd

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.llm.web import llm_html_extract

    docs = load_table(spark, SF_DIR, "documents").toPandas()
    got = llm_html_extract(spark, SF_DIR).toPandas().set_index("doc_id")
    assert len(got) == len(docs)
    for row in docs.itertuples():
        page = _py_html_page(row.doc_id, row.text, row.lang, row.source)
        title, body = _py_html_extract(page)
        g = got.loc[row.doc_id]
        assert g.title == title, (row.doc_id, g.title, title)
        assert g.body_text == body, (row.doc_id, g.body_text, body)
        assert g.n_body_chars == len(body), row.doc_id
        # noise classes provably handled
        assert title == f"Doc '{row.doc_id}' & {row.source}", title
        assert body.startswith(f"Doc {row.doc_id} <draft> "), body
        # the double-escaped &amp;lt;esc&amp;gt; must surface as the
        # LITERAL &lt;esc&gt; — pins &amp; decoding strictly last (any
        # other entity ordering yields '<esc>' here)
        assert body.endswith(" tail & end &lt;esc&gt;"), body
        assert "<esc>" not in body, body
        for residue in ("<p", "<script", "track(", "inline(", "color:",
                        "crawl artifact", "&amp;", "&nbsp;"):
            assert residue not in body, (residue, body)
    assert not pd.isna(got.title).any()


def test_classifier_trainset_matches_python_twin(spark):
    """L40 twin: the training-set assembly replayed in pure Python —
    curated source, balance threshold, per-doc keep decision, label and
    every feature must match EXACTLY; and the assembled classes must be
    usable (both present, hash-balanced within 2x on the fixture)."""
    import re as _re

    from hive3_replication_spark.catalog import load_table
    from hive3_replication_spark.llm.sampling import (
        _BUCKETS,
        _INC,
        _MULT,
        _PRIME,
        llm_classifier_trainset,
    )

    docs = load_table(spark, SF_DIR, "documents").toPandas()
    pool = docs[docs.source.notna()]
    curated = pool.source.min()
    n_pos = int((pool.source == curated).sum())
    n_neg = len(pool) - n_pos
    thr = 0 if n_neg == 0 else min(
        _BUCKETS, (_BUCKETS * n_pos + n_neg - 1) // n_neg
    )
    expected = {}
    for row in pool.itertuples():
        bucket = ((row.doc_id % _PRIME) * _MULT + _INC) % _BUCKETS
        if row.source == curated:
            expected[row.doc_id] = 1
        elif bucket < thr:
            expected[row.doc_id] = 0
    got = llm_classifier_trainset(spark, SF_DIR).toPandas()
    assert dict(zip(got.doc_id, got.label)) == expected
    by_id = docs.set_index("doc_id")
    for row in got.itertuples():
        text = by_id.loc[row.doc_id, "text"]
        toks = text.split(" ")
        f_tokens, f_distinct = len(toks), len(set(toks))
        f_stop = len(_re.findall(r"\b(the|a|of|and|is)\b", text))
        assert row.f_tokens == f_tokens, row.doc_id
        assert row.f_stop == f_stop, row.doc_id
        assert row.f_distinct == f_distinct, row.doc_id
        score = (2 * f_tokens + 5 * f_stop + 3 * f_distinct
                 - int(by_id.loc[row.doc_id, "n_chars"]) // 20)
        assert row.quality_score == score, row.doc_id
    # class usability: both labels present, negatives within 2x of
    # positives (the hash-uniform balance the threshold math targets)
    n_p = int((got.label == 1).sum())
    n_n = int((got.label == 0).sum())
    assert n_p == n_pos and n_p > 0 and n_n > 0
    assert n_p / 2 <= n_n <= 2 * n_p, (n_p, n_n)


# --- parity-sweep resume policy (scripts/parity_sf1.py) ----------------

_rec = st.fixed_dictionaries(
    {"pass": st.sampled_from([True, False, None])},
    optional={"err": st.just("boom"), "oracle_skipped": st.just("slow")},
)
_key = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@given(
    prior=st.dictionaries(_key, _rec, max_size=12),
    registered=st.lists(_key, unique=True, max_size=12),
    sampled=st.lists(_key, unique=True, max_size=3),
    mode=st.sampled_from([[], ["--all"], ["--next", "0"], ["--next", "3"]]),
)
def test_parity_resume_no_record_lost(prior, registered, sampled, mode):
    """Round-12 invariant, for EVERY (prior file, registry, CLI mode)
    combination: a prior record is either carried into the resumed
    results or its key is re-targeted this run — never silently
    dropped — and a still-registered failure is always re-targeted (so
    the summary's `complete` can only flip true after a re-run)."""
    from scripts.parity_sf1 import resume_and_targets

    results, targets = resume_and_targets(
        prior, registered, dict.fromkeys(sampled), [], mode
    )
    tset = set(targets)
    for k, v in prior.items():
        assert k in results or k in tset, (k, v, mode)
        if v["pass"] is False and k in registered:
            assert k in tset and k not in results, (k, mode)
        if v["pass"] is True:
            assert results[k] == v, (k, mode)
    # targets stay within the known universe: registered keys plus
    # carried-forward record keys (never an invented key)
    assert tset <= set(registered) | set(results) | set(sampled)


def test_cross_correlation_equals_numpy(spark, tmp_path_factory):
    """ts_cross_correlation lags −3..+3 vs an independent NumPy Pearson
    over the same hourly-sum alignment, for every type pair (VERDICT-r7
    harness idea, as for ACF/EWMA). Values are exact milli-unit
    multiples; the engine rounds 6 dp, so tolerance is 2e-6. Also pins
    the zero-variance → NULL contract on a planted constant series."""
    import duckdb
    import numpy as np
    import pandas as pd

    from hive3_replication_spark.operators.timeseries import (
        ts_cross_correlation,
    )

    rng = np.random.RandomState(99991)
    n = 600
    out = str(tmp_path_factory.mktemp("ccf_events"))
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.randint(0, 96 * 3600, n), unit="s"),
            "user_id": np.zeros(n, dtype="int64"),
            "event_type": [
                ("a", "b", "const")[i] for i in rng.randint(0, 3, n)
            ],
            "value": np.round(rng.randn(n) * 50, 3),
            "props": ["{}"] * n,
        }
    )
    # make the const series ACTUALLY constant per its own type column
    pdf.loc[pdf.event_type == "const", "value"] = 2.5
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{out}/events.parquet"
    )
    got = {
        (r["type_x"], r["type_y"], r["lag"]): (r["n_hours"], r["ccf"])
        for r in ts_cross_correlation(spark, out).collect()
    }
    # twin
    pdf["v"] = (pdf["value"] * 1000).round().astype("int64")
    # pandas datetimes are ns-resolution: ns → s → hour index (the engine
    # computes unix_micros DIV 3.6e9 — the same hour)
    pdf["t_h"] = pdf["ts"].astype("int64") // 10**9 // 3600
    hourly = (
        pdf.groupby(["event_type", "t_h"])["v"].sum().reset_index()
    )
    types = sorted(hourly.event_type.unique())
    n_checked = 0
    for xi in types:
        for yi in types:
            if not xi < yi:
                continue
            hx = dict(
                hourly[hourly.event_type == xi][["t_h", "v"]].values
            )
            hy = dict(
                hourly[hourly.event_type == yi][["t_h", "v"]].values
            )
            for lag in range(-3, 4):
                pairs = [
                    (hx[h], hy[h + lag]) for h in hx if h + lag in hy
                ]
                if not pairs:
                    assert (xi, yi, lag) not in got
                    continue
                xs = np.array([p[0] for p in pairs], dtype=float)
                ys = np.array([p[1] for p in pairs], dtype=float)
                n_hours, ccf = got[(xi, yi, lag)]
                assert n_hours == len(pairs)
                if xs.std() == 0.0 or ys.std() == 0.0:
                    assert ccf is None, (xi, yi, lag)
                else:
                    expect = np.corrcoef(xs, ys)[0, 1]
                    assert abs(ccf - expect) < 2e-6, (xi, yi, lag)
                n_checked += 1
    assert n_checked >= 14  # all three pairs x 7 lags present-ish


def test_load_table_schema_memo_invalidates_on_rewrite(spark, tmp_path_factory):
    """The catalog's inferred-schema memo (round-15 optimization) must
    never serve a stale schema: rewriting a table payload at the same
    path (new mtime) re-infers. Metadata-only memo — row contents always
    come from the parquet files themselves."""
    import os
    import time

    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table

    root = str(tmp_path_factory.mktemp("schema_memo"))
    p = f"{root}/events.parquet"
    spark.range(5).select(
        F.col("id").alias("event_id"), F.lit(1.0).alias("value")
    ).write.parquet(p)
    first = load_table(spark, root, "events")
    assert dict(first.dtypes) == {"event_id": "bigint", "value": "double"}
    # memo hit returns the identical schema
    assert load_table(spark, root, "events").schema == first.schema
    # rewrite with a different schema; dir mtime changes with the new files
    time.sleep(0.05)
    spark.range(3).select(
        F.col("id").alias("event_id"),
        F.lit("x").alias("extra"),
        F.lit(2.0).alias("value"),
    ).write.mode("overwrite").parquet(p)
    os.utime(p)  # belt and braces on coarse-mtime filesystems
    evolved = load_table(spark, root, "events")
    assert "extra" in dict(evolved.dtypes)
    assert evolved.count() == 3


def test_load_table_plan_memo_reuses_and_invalidates(spark, tmp_path_factory):
    """The loaded-DataFrame memo (round-15 optimization) returns the
    IDENTICAL lazy plan object on a repeat load — plan reuse is metadata
    only (no persist; every action recomputes from the parquet files) —
    and a payload rewrite at the same path (new mtime) yields a fresh
    plan over the new file set, never the stale file index."""
    import os
    import time

    from pyspark.sql import functions as F

    from hive3_replication_spark.catalog import load_table

    root = str(tmp_path_factory.mktemp("df_memo"))
    p = f"{root}/orders.parquet"
    spark.range(4).select(F.col("id").alias("o_orderkey")).write.parquet(p)
    first = load_table(spark, root, "orders")
    assert load_table(spark, root, "orders") is first
    time.sleep(0.05)
    spark.range(9).select(
        F.col("id").alias("o_orderkey")
    ).write.mode("overwrite").parquet(p)
    os.utime(p)
    again = load_table(spark, root, "orders")
    assert again is not first
    assert again.count() == 9
