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
