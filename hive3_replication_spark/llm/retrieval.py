"""RAG retrieval scoring (SURVEY.md §2.11): BM25 lexical ranking (L30,
over the ``llm_chunk_windows`` relation) and reciprocal-rank fusion of
the lexical and embedding arms (L32) — the retrieval steps between
corpus chunking (L14) and embedding-based ANN / rescoring (L3*) in a
retrieval-augmented pipeline.

Exactness policy: BM25's idf is transcendental (log), which would make
scores engine-specific. The engine uses the same integer-idf device as
L13 (``llm_text_keywords``): idf_scaled = (N − df + 1)·10⁶ DIV (df + 1),
an exact BIGINT that preserves the idf ordering; the tf-saturation factor
then runs in IEEE doubles with a FIXED operation order shared
character-for-character with the SQL oracle, so scores are bit-identical
across engines and partition counts with no rounding step at all. The
scoring chain exists ONCE per engine — ``_bm25_score`` (Spark) and
``_bm25_score_sql`` (DuckDB) are shared by both operators (round-9
review: a duplicated IEEE-ordering chain is four places to keep
character-identical instead of two).

Scale shape: term frequencies are narrow per-row expressions; corpus
statistics (N, total tokens, per-term df) are ONE single-row aggregate
broadcast back; every top-k is TakeOrderedAndProject. The corpus is never
shuffled and never joined to itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
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


def _bm25_tf_cols(text_col: str) -> list[F.Column]:
    """Per-row term frequencies tf0..tfN for the fixed query over a
    whitespace-tokenized text column — narrow expressions, no shuffle."""
    toks = F.split(F.col(text_col), " ")

    def tf_col(i: int, term: str) -> F.Column:
        # one-arg lambda only: F.filter treats a 2-arg callable as
        # (element, index), so a bound default arg would receive the index
        return (
            F.size(F.filter(toks, lambda x: x == F.lit(term)))
            .cast("bigint")
            .alias(f"tf{i}")
        )

    return [tf_col(i, term) for i, term in enumerate(_BM25_QUERY)]


def _bm25_score(base: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """The ONE Spark BM25 chain: ``base`` carries (ids..., dl, tf0..tfN);
    returns (ids..., dl, tf0..tfN, score). Corpus stats (row count,
    total tokens, per-term df) are a single-row aggregate broadcast
    back; score(r) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with the scaled-integer idf and fixed IEEE association mirrored
    op-for-op by ``_bm25_score_sql``."""
    n_terms = len(_BM25_QUERY)
    stats = base.agg(
        F.count("*").alias("n_rel"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(n_terms)
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_rel").cast(
        "double"
    )
    dl_norm = F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B)
        + F.lit(_BM25_B) * F.col("dl").cast("double") / avgdl
    )

    def term_score(i: int) -> F.Column:
        idf = F.expr(
            f"(n_rel - df{i} + 1) * {_BM25_IDF_SCALE} DIV (df{i} + 1)"
        )
        tf = F.col(f"tf{i}").cast("double")
        return (
            idf.cast("double")
            * (tf * F.lit(_BM25_K1 + 1.0))
            / (tf + dl_norm)
        )

    score = term_score(0)
    for i in range(1, n_terms):
        score = score + term_score(i)
    return scored.select(
        *id_cols,
        "dl",
        *[f"tf{i}" for i in range(n_terms)],
        score.alias("score"),
    )


def _bm25_tf_sqls(text_col: str) -> str:
    """DuckDB tf0..tfN expressions mirroring ``_bm25_tf_cols``."""
    return ",\n                   ".join(
        f"CAST(len(list_filter(string_split({text_col}, ' '),"
        f" x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_QUERY)
    )


def _bm25_stats_sql() -> str:
    """DuckDB stats-CTE body over a ``tf`` relation carrying (dl, tfN) —
    standardized column names (n_rel, total_tokens, dfN) shared with
    ``_bm25_score_sql``."""
    df_exprs = ",\n                   ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_QUERY))
    )
    return f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rel,
                   CAST(SUM(dl) AS BIGINT) AS total_tokens,
                   {df_exprs}
            FROM tf
    """


def _bm25_score_sql() -> str:
    """The ONE DuckDB BM25 score expression, mirrored op-for-op from
    ``_bm25_score`` (scaled-integer idf, then tf·(k1+1) / (tf + k1·(1−b
    + b·dl/avgdl)) with identical association so the double result is
    bit-identical)."""
    term_sqls = [
        f"""(CAST((n_rel - df{i} + 1) * {_BM25_IDF_SCALE} // (df{i} + 1)
                 AS DOUBLE)
             * (CAST(tf{i} AS DOUBLE) * {_BM25_K1 + 1.0})
             / (CAST(tf{i} AS DOUBLE)
                + {_BM25_K1} * ({1.0 - _BM25_B}
                   + {_BM25_B} * CAST(dl AS DOUBLE)
                     / (CAST(total_tokens AS DOUBLE)
                        / CAST(n_rel AS DOUBLE)))))"""
        for i in range(len(_BM25_QUERY))
    ]
    return "\n               + ".join(term_sqls)


def llm_chunk_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30 — BM25 top-k chunk retrieval (Robertson & Spärck Jones's
    Okapi BM25) for the fixed query ``_BM25_QUERY`` over the L14 chunk
    relation, k1=1.2, b=0.75, idf in the exact scaled-integer form
    (module docstring). Output is the global top-20 chunks totally
    ordered by (score DESC, doc_id, chunk_idx) — ties cannot reorder
    across engines or cluster sizes."""
    chunks = llm_chunk_windows(spark, sf_dir)
    base = chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("n_chunk_tokens").alias("dl"),
        *_bm25_tf_cols("chunk_text"),
    )
    return (
        _bm25_score(base, ["doc_id", "chunk_idx"])
        .withColumnRenamed("dl", "n_chunk_tokens")
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_idx"))
        .limit(_BM25_TOPK)
    )


def _chunk_rank_oracle_sql() -> str:
    tf_out = ", ".join(f"tf{i}" for i in range(len(_BM25_QUERY)))
    return f"""
        WITH {chunk_windows_cte()},
        tf AS (
            SELECT doc_id, chunk_idx,
                   CAST(n_chunk_tokens AS BIGINT) AS dl,
                   {_bm25_tf_sqls("chunk_text")}
            FROM chunks
        ),
        stats AS ({_bm25_stats_sql()})
        SELECT doc_id, chunk_idx, dl AS n_chunk_tokens, {tf_out},
               {_bm25_score_sql()} AS score
        FROM tf, stats
        ORDER BY score DESC, doc_id, chunk_idx
        LIMIT {_BM25_TOPK}
    """


#: RRF constants: the standard k=60 damping (Cormack, Clarke &
#: Buettcher 2009), per-arm candidate lists of 50, fused top-10 out.
#: Contributions are scaled-integer — SCALE DIV (k + rank) — so the
#: fused score is exact and engine-identical with total-ordered ties.
_RRF_K = 60
_RRF_ARM_K = 50
_RRF_TOPK = 10
_RRF_SCALE = 1_000_000


def llm_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L32 — reciprocal-rank fusion of the two retrieval arms: BM25
    lexical ranking over the documents (the L30 scorer at document
    granularity — the SAME ``_bm25_score`` chain) fused with embedding
    cosine ranking (the L3 arm, vec_id keying the same corpus),
    RRF(d) = Σ_arm 1/(k + rank_arm(d)) — the standard hybrid-retrieval
    combiner (Cormack et al. 2009) a RAG stack runs between retrieval
    and rescoring because lexical and vector arms fail on disjoint
    query classes.

    Each arm contributes its top-``_RRF_ARM_K`` list (TakeOrdered — the
    corpus is never globally sorted; list-absent documents contribute
    nothing and report a NULL rank — self-describing, where a 0 sentinel
    read as "best" by a downstream consumer was the round-9 watch-item);
    ranks are assigned by a window over exactly K rows (bounded by
    construction, the L17 idiom) and the fusion is a K-row full outer
    join + integer contributions — everything after the two arm scans
    is output-sized. Contributions use SCALE DIV (k + rank), so the
    fused score is an exact BIGINT: no float ordering, ties total-
    ordered on doc_id."""
    from .similarity import _dot, _norm

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *_bm25_tf_cols("text"),
    )
    lex_top = (
        _bm25_score(base, ["doc_id"])
        .select("doc_id", F.col("score").alias("lex"))
        .orderBy(F.desc("lex"), F.asc("doc_id"))
        .limit(_RRF_ARM_K)
    )
    w_lex = Window.orderBy(F.desc("lex"), F.asc("doc_id"))
    lex_ranked = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("bigint").alias("lex_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    vec_scored = (
        emb.join(F.broadcast(query))
        .filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
            ).alias("cos"),
        )
    )
    vec_top = vec_scored.orderBy(F.desc("cos"), F.asc("doc_id")).limit(
        _RRF_ARM_K
    )
    w_vec = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    vec_ranked = vec_top.select(
        "doc_id", F.row_number().over(w_vec).cast("bigint").alias("vec_rank")
    )
    fused = lex_ranked.join(vec_ranked, "doc_id", "full_outer").select(
        "doc_id",
        F.col("lex_rank"),
        F.col("vec_rank"),
        (
            F.coalesce(
                F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + vec_rank)"), F.lit(0)
            )
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(
        _RRF_TOPK
    )


def _rank_fusion_oracle_sql() -> str:
    return f"""
        WITH tf AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                   {_bm25_tf_sqls("text")}
            FROM documents
        ),
        stats AS ({_bm25_stats_sql()}),
        lex_top AS (
            SELECT doc_id, {_bm25_score_sql()} AS lex
            FROM tf, stats
            ORDER BY lex DESC, doc_id LIMIT {_RRF_ARM_K}
        ),
        lex_ranked AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY lex DESC, doc_id)
                        AS BIGINT) AS lex_rank
            FROM lex_top
        ),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        vec_scored AS (
            SELECT vec_id AS doc_id,
                   list_aggregate(
                       list_transform(range(1, len(embedding) + 1),
                           i -> CAST(embedding[i] AS DOUBLE)
                              * CAST(q_emb[i] AS DOUBLE)),
                       'sum')
                   / (sqrt(list_aggregate(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))
                      * sqrt(list_aggregate(list_transform(q_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))) AS cos
            FROM embeddings, q WHERE vec_id <> 0
        ),
        vec_top AS (
            SELECT doc_id, cos FROM vec_scored
            ORDER BY cos DESC, doc_id LIMIT {_RRF_ARM_K}
        ),
        vec_ranked AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                        AS BIGINT) AS vec_rank
            FROM vec_top
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
                   CAST(l.lex_rank AS BIGINT) AS lex_rank,
                   CAST(v.vec_rank AS BIGINT) AS vec_rank,
                   CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + l.lex_rank), 0)
                        + COALESCE({_RRF_SCALE} // ({_RRF_K} + v.vec_rank), 0)
                        AS BIGINT) AS rrf_score
            FROM lex_ranked l
            FULL OUTER JOIN vec_ranked v ON l.doc_id = v.doc_id
        )
        SELECT * FROM fused
        ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOPK}
    """


ORACLES: dict[str, str] = {
    "llm_chunk_rank": _chunk_rank_oracle_sql(),
    "llm_rank_fusion": _rank_fusion_oracle_sql(),
}

QUERY_FNS = {
    "llm_chunk_rank": llm_chunk_rank,
    "llm_rank_fusion": llm_rank_fusion,
}
