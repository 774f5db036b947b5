"""Randomized-corpus oracle parity: the fixed fixture can hide agreement
by coincidence, so the text/dedup pipeline re-verifies on procedurally
generated corpora with deliberately nasty shapes — empty documents,
sub-shingle-length documents, exact-duplicate groups, planted near-dups —
running the SAME Spark operator and the SAME DuckDB oracle SQL over a
fresh view set per corpus. Any engine-divergent assumption (hash edge
case, empty-array fold, tie handling, NULL propagation) that the fixture
happens to never exercise fails here.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import assert_frames_match

#: Keys whose FULL output is deterministic (no top-k boundary where random
#: ties could legitimately differ) and whose only input is `documents`.
KEYS = (
    "llm_dedup_exact",
    "llm_dedup_ngram",
    "llm_dedup_minhash",
    "llm_dedup_simhash",
    "llm_dedup_clusters",
    "llm_dedup_minhash_clusters",
    "llm_dedup_semantic",
    "llm_split_leakage_safe",
    "llm_text_profile",
    "llm_text_fingerprint",
    "llm_doc_embed_hash",
)

_SEEDS = (7, 23)
_CORPUS_CACHE: dict[int, tuple[str, object]] = {}


def _random_corpus(spark, tmp_path_factory, seed: int) -> tuple[str, object]:
    """Deterministic random documents table: ~340 docs including empty
    texts, 1- and 2-token docs (below shingle length), 20 exact dups and
    20 one-token-prefix near-dups. Returns (sf_dir, duckdb con with the
    `documents` view registered)."""
    if seed in _CORPUS_CACHE:
        return _CORPUS_CACHE[seed]
    import numpy as np

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(40)] + ["the", "and", "of", "data", "x"]
    n = 300
    rows = []
    for d in range(n):
        ln = int(rng.randint(0, 40))  # 0 ⇒ empty text
        toks = [vocab[int(rng.randint(len(vocab)))] for _ in range(ln)]
        rows.append((d, " ".join(toks)))
    for j in range(20):  # exact duplicates of random originals
        rows.append((n + j, rows[int(rng.randint(n))][1]))
    for j in range(20):  # near-dups: one-token prefix change
        rows.append((n + 20 + j, f"zq{j} " + rows[int(rng.randint(n))][1]))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = [("en", "de", "fr")[i % 3] for i in range(len(pdf))]
    pdf["source"] = [("web", "book")[i % 2] for i in range(len(pdf))]
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    out = str(tmp_path_factory.mktemp(f"randcorpus{seed}"))
    spark.createDataFrame(pdf).coalesce(2).write.parquet(
        f"{out}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(  # Spark writes a directory of part files; DuckDB globs it
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{out}/documents.parquet/*.parquet'"
    )
    _CORPUS_CACHE[seed] = (out, con)
    return out, con


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("key", KEYS)
def test_random_corpus_parity(spark, tmp_path_factory, key, seed):
    from hive3_replication_spark.llm.dedup import clear_caches
    from hive3_replication_spark.registry import build_oracles, build_queries

    sf_dir, con = _random_corpus(spark, tmp_path_factory, seed)
    clear_caches()  # memos are corpus-keyed, but start each key clean
    spark_pdf = build_queries()[key](spark, sf_dir).toPandas()
    oracle_pdf = con.sql(build_oracles()[key]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"{key}@seed{seed}")


#: Events-only keys with fully deterministic outputs (ties broken by
#: event_id everywhere the fixture keys already guarantee it).
TS_KEYS = (
    "ts_resample",
    "ts_fill_forward",
    "ts_interpolate",
    "ts_ohlc",
    "ts_rollup_hypertable",
    "ts_sessionize",
    "ts_funnel",
    "ts_retention_cohort",
    "ts_ewma",
    "ts_anomaly_zscore",
    "ts_changepoint",
    "ts_seasonal_profile",
    "ts_gap_detect",
)

_EVENTS_CACHE: dict[int, tuple[str, object]] = {}


def _random_events(spark, tmp_path_factory, seed: int) -> tuple[str, object]:
    """Deterministic random events table: strictly increasing (unique)
    timestamps with a heavy-tailed increment mixture (~5% of gaps in the
    1-6 h range so the gap/sessionize paths see real silences), negative
    and positive values, 4 event types, 40 users."""
    if seed in _EVENTS_CACHE:
        return _EVENTS_CACHE[seed]
    import numpy as np

    rng = np.random.RandomState(seed)
    n = 2000
    small = rng.randint(1_000_000, 300_000_000, size=n)  # 1 s .. 5 min
    big = rng.randint(3_600_000_000, 21_600_000_000, size=n)  # 1 h .. 6 h
    inc = np.where(rng.rand(n) < 0.05, big, small)
    ts_us = 1_700_000_000_000_000 + np.cumsum(inc)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "user_id": rng.randint(0, 40, size=n).astype("int64"),
            "event_type": [
                ("click", "view", "purchase", "error")[i]
                for i in rng.randint(0, 4, size=n)
            ],
            "value": np.round(rng.randn(n) * 100, 3),
            "props": [f'{{"k": {int(i)}}}' for i in rng.randint(0, 9, n)],
        }
    )
    out = str(tmp_path_factory.mktemp(f"randevents{seed}"))
    spark.createDataFrame(pdf).coalesce(2).write.parquet(
        f"{out}/events.parquet"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{out}/events.parquet/*.parquet'"
    )
    _EVENTS_CACHE[seed] = (out, con)
    return out, con


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("key", TS_KEYS)
def test_random_events_parity(spark, tmp_path_factory, key, seed):
    from hive3_replication_spark.registry import build_oracles, build_queries

    sf_dir, con = _random_events(spark, tmp_path_factory, seed)
    spark_pdf = build_queries()[key](spark, sf_dir).toPandas()
    oracle_pdf = con.sql(build_oracles()[key]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"{key}@seed{seed}")
