"""RAG retrieval scoring (SURVEY.md §2.11): BM25 chunk ranking over the
``llm_chunk_windows`` relation — the lexical-retrieval step between corpus
chunking (L14) and embedding-based ANN (L3*) in a retrieval-augmented
pipeline: given a query, rank every chunk by BM25 and keep the top-k as
retrieval candidates (typically re-scored by an embedding model — L3f).

Exactness policy: BM25's idf is transcendental (log), which would make
scores engine-specific. The engine uses the same integer-idf device as
L13 (``llm_text_keywords``): idf_scaled = (N − df + 1)·10⁶ DIV (df + 1),
an exact BIGINT that preserves the idf ordering; the tf-saturation factor
then runs in IEEE doubles with a FIXED operation order shared
character-for-character with the SQL oracle, so scores are bit-identical
across engines and partition counts with no rounding step at all.

Scale shape: term frequencies are narrow per-chunk expressions; corpus
statistics (N, total tokens, per-term df) are ONE single-row aggregate
broadcast back; the top-k is TakeOrderedAndProject. The corpus is never
shuffled and never joined to itself — the whole operator is one pass over
the chunk relation at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import chunk_windows_cte, llm_chunk_windows

#: The fixed retrieval query (one term per BM25 component, fixed order —
#: the score sum is left-associated over this tuple on both engines).
#: 'dup' is deliberately rare in the fixture corpus (df ≈ 5% of docs) so
#: the ranking exercises a high-idf term next to two common ones.
_BM25_QUERY: tuple[str, ...] = ("data", "hash", "dup")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_IDF_SCALE = 1_000_000
_BM25_TOPK = 20


def llm_chunk_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30 — BM25 top-k chunk retrieval (Robertson & Spärck Jones's
    Okapi BM25) for the fixed query ``_BM25_QUERY`` over the L14 chunk
    relation: score(c) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|c|/avgdl)),
    k1=1.2, b=0.75, idf in the exact scaled-integer form (module
    docstring). Output is the global top-20 chunks totally ordered by
    (score DESC, doc_id, chunk_idx) — ties cannot reorder across engines
    or cluster sizes."""
    chunks = llm_chunk_windows(spark, sf_dir)
    toks = F.split(F.col("chunk_text"), " ")

    def tf_col(i: int, term: str) -> F.Column:
        # one-arg lambda only: F.filter treats a 2-arg callable as
        # (element, index), so a bound default arg would receive the index
        return (
            F.size(F.filter(toks, lambda x: x == F.lit(term)))
            .cast("bigint")
            .alias(f"tf{i}")
        )

    tf_cols = [tf_col(i, term) for i, term in enumerate(_BM25_QUERY)]
    base = chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("n_chunk_tokens").alias("dl"),
        *tf_cols,
    )
    stats = base.agg(
        F.count("*").alias("n_chunks"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(_BM25_QUERY))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_chunks").cast(
        "double"
    )
    dl_norm = F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B)
        + F.lit(_BM25_B) * F.col("dl").cast("double") / avgdl
    )

    def term_score(i: int) -> F.Column:
        idf = F.expr(
            f"(n_chunks - df{i} + 1) * {_BM25_IDF_SCALE} DIV (df{i} + 1)"
        )
        tf = F.col(f"tf{i}").cast("double")
        return (
            idf.cast("double")
            * (tf * F.lit(_BM25_K1 + 1.0))
            / (tf + dl_norm)
        )

    score = term_score(0)
    for i in range(1, len(_BM25_QUERY)):
        score = score + term_score(i)
    return (
        scored.select(
            "doc_id",
            "chunk_idx",
            F.col("dl").alias("n_chunk_tokens"),
            *[f"tf{i}" for i in range(len(_BM25_QUERY))],
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx"))
        .limit(_BM25_TOPK)
    )


def _chunk_rank_oracle_sql() -> str:
    terms = _BM25_QUERY
    tf_exprs = ",\n                   ".join(
        f"CAST(len(list_filter(string_split(chunk_text, ' '),"
        f" x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ",\n                   ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    # IEEE-double expression mirrored op-for-op from term_score(): the
    # scaled-integer idf, then tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    # with identical association so the double result is bit-identical.
    term_sqls = [
        f"""(CAST((n_chunks - df{i} + 1) * {_BM25_IDF_SCALE} // (df{i} + 1)
                 AS DOUBLE)
             * (CAST(tf{i} AS DOUBLE) * {_BM25_K1 + 1.0})
             / (CAST(tf{i} AS DOUBLE)
                + {_BM25_K1} * ({1.0 - _BM25_B}
                   + {_BM25_B} * CAST(dl AS DOUBLE)
                     / (CAST(total_tokens AS DOUBLE)
                        / CAST(n_chunks AS DOUBLE)))))"""
        for i in range(len(terms))
    ]
    score_sql = "\n               + ".join(term_sqls)
    tf_out = ", ".join(f"tf{i}" for i in range(len(terms)))
    return f"""
        WITH {chunk_windows_cte()},
        tf AS (
            SELECT doc_id, chunk_idx,
                   CAST(n_chunk_tokens AS BIGINT) AS dl,
                   {tf_exprs}
            FROM chunks
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(dl) AS BIGINT) AS total_tokens,
                   {df_exprs}
            FROM tf
        )
        SELECT doc_id, chunk_idx, dl AS n_chunk_tokens, {tf_out},
               {score_sql} AS score
        FROM tf, stats
        ORDER BY score DESC, doc_id, chunk_idx
        LIMIT {_BM25_TOPK}
    """


ORACLES: dict[str, str] = {
    "llm_chunk_rank": _chunk_rank_oracle_sql(),
}

QUERY_FNS = {
    "llm_chunk_rank": llm_chunk_rank,
}
