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

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_embeddings, load_table
from ..util import fan_out
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


def _rrf_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The L32 fused-candidate relation (doc_id, lex_rank, vec_rank,
    rrf_score — ≤ 2·_RRF_ARM_K rows by construction): BM25 lexical
    ranking over the documents (the L30 scorer at document granularity —
    the SAME ``_bm25_score`` chain) fused with embedding cosine ranking
    (the L3 arm, vec_id keying the same corpus),
    RRF(d) = Σ_arm 1/(k + rank_arm(d)) — the standard hybrid-retrieval
    combiner (Cormack et al. 2009) a RAG stack runs between retrieval
    and rescoring because lexical and vector arms fail on disjoint
    query classes. ``llm_rank_fusion`` is this relation's top-10;
    ``llm_mmr_rerank`` diversifies the same relation.

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
    # corpus-side arms fanned out (guide §2.5, round-15 session 2): the
    # BM25 tf expressions and the cosine folds are the per-row cost and
    # the fixture scans are one split — both arm scans otherwise run
    # single-task; a no-op at warehouse scale.
    base = fan_out(docs).select(
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
    emb = load_embeddings(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    vec_scored = (
        fan_out(emb).join(F.broadcast(query))
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
    return lex_ranked.join(vec_ranked, "doc_id", "full_outer").select(
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


def llm_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L32 — reciprocal-rank fusion: the global top-10 of the fused
    candidate relation (see ``_rrf_fused`` for the full design notes),
    totally ordered on (rrf_score DESC, doc_id)."""
    return (
        _rrf_fused(spark, sf_dir)
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(_RRF_TOPK)
    )


def _rrf_fused_ctes() -> str:
    """DuckDB CTE chain producing the ``_rrf_fused`` relation as a CTE
    named ``fused`` — shared by the llm_rank_fusion oracle and the
    llm_mmr_rerank oracle built on top of the fused candidate list."""
    return f"""
        tf AS (
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
    """


def _rank_fusion_oracle_sql() -> str:
    return f"""
        WITH {_rrf_fused_ctes()}
        SELECT * FROM fused
        ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOPK}
    """


#: L35 MMR constants: λ = 0.7 in exact integer tenths — the MMR score is
#: 10× the textbook value, score = 7·rel_n − 3·maxsim, every term a
#: BIGINT. Relevance is the fused rrf_score rescaled onto the cosine
#: quantization grid (rel_n = rrf·1e9 DIV max-possible-rrf, where
#: max-possible-rrf = both arms at rank 1) so the two MMR terms are
#: commensurate; pairwise diversity sims quantize the same way,
#: sim_q = floor(cos·1e9 + 0.5), and the penalty clamps at 0 (textbook
#: MMR assumes sim ≥ 0; an un-clamped negative cosine would act as a
#: BONUS inconsistent with the first pick's no-penalty convention, and
#: would break the score-monotone-in-step property the twin asserts).
#: Greedy argmax ties break on doc_id.
_MMR_OUT = 10
_MMR_L_NUM = 7
_MMR_D_NUM = 3
_MMR_SIMQ = 1_000_000_000
_MMR_RELMAX = 2 * (_RRF_SCALE // (_RRF_K + 1))


def llm_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L35 — MMR-diversified top-10 over the fused candidate list
    (Carbonell & Goldstein 1998): greedily select the candidate
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected —
    the de-duplication rerank every production RAG stack runs after
    fusion, so the context window isn't filled with near-identical
    chunks. Candidates are the ``_rrf_fused`` relation (≤ 100 rows by
    construction) joined to their embeddings; relevance is the exact
    integer rrf_score rescaled per ``_MMR_RELMAX``.

    Spark-first shape: MMR's greedy loop is inherently sequential in k,
    but everything it touches is OUTPUT-SIZED — so the loop runs as a
    single higher-order ``aggregate`` fold over the collected candidate
    array (one row, JVM codegen, no UDF, no driver loop, no self-join):
    the K×K sim map is built once from the same array, and each of the
    10 steps is an `array_max` over the un-selected candidates' integer
    scores. The corpus is touched exactly as _rrf_fused touches it, plus
    ONE broadcast-probe of the embeddings table to fetch ≤ 100 vectors —
    zero hashpartitioning exchanges end to end (plan-gated). All
    comparisons are BIGINT: bit-identical greedy path on any engine.
    Oracle: recursive CTE replaying the greedy selection step-for-step."""
    fused = _rrf_fused(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    cand = (
        emb.join(F.broadcast(fused), emb.vec_id == fused.doc_id)
        .select(
            "doc_id",
            F.expr(f"rrf_score * {_MMR_SIMQ} DIV {_MMR_RELMAX}").alias(
                "rel_n"
            ),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    one = cand.agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "rel_n", "emb"))
        ).alias("cands")
    )
    simq = (
        "cast(floor(aggregate(zip_with(a.emb, b.emb, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
        " / (sqrt(aggregate(transform(a.emb, x -> x * x),"
        " cast(0.0 as double), (acc, v) -> acc + v))"
        " * sqrt(aggregate(transform(b.emb, x -> x * x),"
        " cast(0.0 as double), (acc, v) -> acc + v)))"
        f" * {float(_MMR_SIMQ)} + 0.5) as bigint)"
    )
    # cosine is symmetric and the fold computes sim(a,b) and sim(b,a)
    # bit-identically, so the map stores each UNORDERED pair once
    # (doc_id-ascending key, K(K−1)/2 entries — half the fold work, no
    # never-read self-pairs); lookups key on (least, greatest)
    staged = one.select(
        "cands",
        F.expr(
            "map_from_entries(flatten(transform(cands, a ->"
            " transform(filter(cands, b -> b.doc_id > a.doc_id),"
            " b -> struct(concat(cast(a.doc_id as string), ':',"
            f" cast(b.doc_id as string)), {simq})))))"
        ).alias("simmap"),
    )
    best = (
        "array_max(transform("
        "filter(cands, c -> NOT exists(sel, s -> s.doc_id = c.doc_id)),"
        f" c -> named_struct("
        f"'score', {_MMR_L_NUM} * c.rel_n - {_MMR_D_NUM} * greatest("
        "coalesce(array_max(transform(sel, s -> element_at(simmap,"
        " concat(cast(least(c.doc_id, s.doc_id) as string), ':',"
        " cast(greatest(c.doc_id, s.doc_id) as string))))),"
        " cast(0 as bigint)),"
        " cast(0 as bigint)),"
        " 'negid', -c.doc_id, 'rel_n', c.rel_n)))"
    )
    acc_type = (
        "array<struct<step:int,doc_id:bigint,rel_n:bigint,score:bigint>>"
    )
    # the empty-candidate guard matters: sequence(1, 0) counts DOWNWARD
    # in Spark, so an unguarded fold over an empty corpus would run two
    # phantom steps and fabricate null rows the oracle doesn't have
    fold = (
        f"CASE WHEN size(cands) >= 1 THEN"
        f" aggregate(sequence(1, least({_MMR_OUT}, size(cands))),"
        f" cast(array() as {acc_type}),"
        f" (sel, stp) -> array_append(sel,"
        f" element_at(transform(array({best}),"
        f" b -> named_struct('step', stp, 'doc_id', -b.negid,"
        f" 'rel_n', b.rel_n, 'score', b.score)), 1)))"
        f" ELSE cast(array() as {acc_type}) END"
    )
    return staged.select(F.explode(F.expr(fold)).alias("s")).select(
        F.col("s.step").alias("step"),
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.rel_n").alias("rel_n"),
        F.col("s.score").alias("mmr_score"),
    )


def _mmr_rerank_oracle_sql() -> str:
    cos = (
        "list_aggregate(list_transform(range(1, len(a.emb) + 1),"
        " i -> CAST(a.emb[i] AS DOUBLE) * CAST(b.emb[i] AS DOUBLE)),"
        " 'sum')"
        " / (sqrt(list_aggregate(list_transform(a.emb,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
        " * sqrt(list_aggregate(list_transform(b.emb,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
    )
    return f"""
        WITH RECURSIVE {_rrf_fused_ctes()},
        arm AS (
            SELECT f.doc_id,
                   f.rrf_score * {_MMR_SIMQ} // {_MMR_RELMAX} AS rel_n,
                   e.embedding AS emb
            FROM fused f JOIN embeddings e ON e.vec_id = f.doc_id
        ),
        pair AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(floor({cos} * {float(_MMR_SIMQ)} + 0.5)
                        AS BIGINT) AS sim
            FROM arm a, arm b WHERE a.doc_id <> b.doc_id
        ),
        sel AS (
            (SELECT 1 AS step, doc_id, rel_n,
                    {_MMR_L_NUM} * rel_n AS mmr_score,
                    [doc_id] AS picked
             FROM arm ORDER BY {_MMR_L_NUM} * rel_n DESC, doc_id LIMIT 1)
            UNION ALL
            SELECT s.step + 1, u.doc_id, u.rel_n, u.score,
                   list_append(s.picked, u.doc_id)
            FROM sel s, LATERAL (
                SELECT c.doc_id, c.rel_n,
                       {_MMR_L_NUM} * c.rel_n - {_MMR_D_NUM} * GREATEST(
                           COALESCE(
                               MAX(CASE WHEN list_contains(s.picked, p.b_id)
                                        THEN p.sim END), 0), 0) AS score
                FROM arm c LEFT JOIN pair p ON p.a_id = c.doc_id
                WHERE NOT list_contains(s.picked, c.doc_id)
                GROUP BY c.doc_id, c.rel_n
                ORDER BY score DESC, c.doc_id
                LIMIT 1
            ) u
            WHERE s.step < LEAST({_MMR_OUT},
                                 (SELECT COUNT(*) FROM arm))
        )
        SELECT CAST(step AS INTEGER) AS step, doc_id, rel_n, mmr_score
        FROM sel
    """


#: L34 nDCG constants. The log2 discount is transcendental, so it is
#: evaluated ONCE in Python and embedded as an integer literal table in
#: both engines: D_i = floor(SCALE / log2(i+1)) for ranks 1..k — every
#: DCG is then an exact BIGINT dot product of integer gains (2^rel − 1)
#: against literal integer discounts. _NDCG_PD is the prefix-sum table
#: P(j) = Σ_{i≤j} D_i (P(0) = 0), which turns the IDEAL DCG into a pure
#: expression over the per-query grade COUNTS — no sort of the corpus by
#: grade is ever needed. Bounds: gain ≤ 7, D_i ≤ 1e9, k = 10 ⇒ DCG ≤
#: 7e10 and ndcg_micro's dcg·1e6 ≤ 7e16 — safely inside BIGINT.
_NDCG_K = 10
_NDCG_SCALE = 1_000_000_000
_NDCG_D = [
    int(_NDCG_SCALE / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)
]
_NDCG_PD = [0]
for _d in _NDCG_D:
    _NDCG_PD.append(_NDCG_PD[-1] + _d)
_NDCG_D_ARGS = ", ".join(str(d) for d in _NDCG_D)
_NDCG_PD_ARGS = ", ".join(str(p) for p in _NDCG_PD)
#: Number of held-out query vectors (vec_id < _NDCG_NQ; the corpus is the
#: disjoint vec_id ≥ _NDCG_NQ remainder — the standard eval split).
_NDCG_NQ = 10


def llm_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L34 — graded nDCG@10 of embedding-cosine retrieval, per query: the
    ranking-quality eval a hybrid retrieval stack (L30/L32) is actually
    tuned on — L23 measures binary recall@k/best-rank; nDCG weights HOW
    HIGH each graded-relevant document ranks (Järvelin & Kekäläinen
    2002). Queries are the held-out vec_id < 10; the corpus is the
    disjoint remainder; graded judgments come from the fixture's label
    column, rel(q,d) = max(0, 3 − |label(q) − label(d)|) ∈ {0..3} — a
    deterministic synthetic grade (production swaps in human judgments;
    the metric machinery is the operator).

    Exactness: gains (2^rel − 1) and the literal discount table make
    DCG an exact BIGINT (see ``_NDCG_D``); the IDEAL DCG needs no sort —
    rel has 4 levels, so per-query grade counts (n3, n2, n1) place the
    ideal grades by prefix-sum arithmetic over ``_NDCG_PD``; cosine ties
    break on vec_id. ndcg_micro = dcg·1e6 DIV idcg, an exact integer.

    Plan: queries broadcast against the corpus (narrow scoring — the
    eval side is by definition a corpus×queries scan, run on a sample in
    production); ONE (q_id) exchange serves both the rank window and the
    grade-count window sums; the rank≤10 filter then bounds the final
    groupBy at 10 rows per query."""
    from .similarity import _dot, _norm

    emb = load_embeddings(spark, sf_dir)
    qside = emb.filter(F.col("vec_id") < _NDCG_NQ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    scored = (
        fan_out(emb.filter(F.col("vec_id") >= _NDCG_NQ), probe=emb)
        .join(F.broadcast(qside))
        .select(
            "q_id",
            "vec_id",
            (
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
            ).alias("cos"),
            F.greatest(
                F.lit(0),
                F.lit(3) - F.abs(F.col("label") - F.col("q_label")),
            )
            .cast("bigint")
            .alias("rel"),
        )
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    w_q = Window.partitionBy("q_id")
    staged = scored.select(
        "q_id",
        "rel",
        F.row_number().over(w_rank).alias("rank"),
        F.count("*").over(w_q).alias("n_corpus"),
        F.sum((F.col("rel") == 3).cast("bigint")).over(w_q).alias("n3"),
        F.sum((F.col("rel") == 2).cast("bigint")).over(w_q).alias("n2"),
        F.sum((F.col("rel") == 1).cast("bigint")).over(w_q).alias("n1"),
    ).filter(F.col("rank") <= _NDCG_K)
    # pyspark's shiftleft() only takes a literal bit count — the
    # column-shift form exists in SQL
    gain = F.expr("cast(shiftleft(1, cast(rel as int)) as bigint) - 1")
    dcg_term = gain * F.expr(f"element_at(array({_NDCG_D_ARGS}), rank)")
    pd_at = (
        f"element_at(array({_NDCG_PD_ARGS}),"
        f" cast(least({{0}}, {_NDCG_K}) as int) + 1)"
    )
    idcg = F.expr(
        f"7 * {pd_at.format('n3')}"
        f" + 3 * ({pd_at.format('n3 + n2')} - {pd_at.format('n3')})"
        f" + 1 * ({pd_at.format('n3 + n2 + n1')}"
        f" - {pd_at.format('n3 + n2')})"
    )
    return (
        staged.groupBy("q_id")
        .agg(
            F.max("n_corpus").alias("n_corpus"),
            F.sum(dcg_term).alias("dcg_s"),
            F.max(idcg).alias("idcg_s"),
        )
        .select(
            "q_id",
            "n_corpus",
            "dcg_s",
            "idcg_s",
            # a query with NO relevant corpus docs has IDCG 0: nDCG is
            # undefined there (NULL), and the CASE keeps ANSI division
            # from ever seeing the zero
            F.expr(
                "CASE WHEN idcg_s > 0 THEN dcg_s * 1000000 DIV idcg_s END"
            ).alias("ndcg_micro"),
        )
    )


def _eval_ndcg_oracle_sql() -> str:
    pd_at = (
        f"CAST(([{_NDCG_PD_ARGS}])"
        f"[CAST(LEAST({{0}}, {_NDCG_K}) AS INTEGER) + 1] AS BIGINT)"
    )
    idcg = (
        f"7 * {pd_at.format('n3')}"
        f" + 3 * ({pd_at.format('n3 + n2')} - {pd_at.format('n3')})"
        f" + 1 * ({pd_at.format('n3 + n2 + n1')}"
        f" - {pd_at.format('n3 + n2')})"
    )
    return f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
            FROM embeddings WHERE vec_id < {_NDCG_NQ}
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_aggregate(
                       list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.q_emb[i] AS DOUBLE)),
                       'sum')
                   / (sqrt(list_aggregate(list_transform(e.embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))
                      * sqrt(list_aggregate(list_transform(q.q_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))) AS cos,
                   CAST(GREATEST(0, 3 - ABS(e.label - q.q_label))
                        AS BIGINT) AS rel
            FROM embeddings e, q WHERE e.vec_id >= {_NDCG_NQ}
        ),
        staged AS (
            SELECT q_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rank,
                   COUNT(*) OVER wq AS n_corpus,
                   SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) OVER wq AS n3,
                   SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) OVER wq AS n2,
                   SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) OVER wq AS n1
            FROM scored
            WINDOW wq AS (PARTITION BY q_id)
        ),
        agg AS (
            SELECT q_id,
                   CAST(MAX(n_corpus) AS BIGINT) AS n_corpus,
                   CAST(SUM(CAST((1 << CAST(rel AS INTEGER)) - 1 AS BIGINT)
                            * ([{_NDCG_D_ARGS}])[CAST(rank AS INTEGER)])
                        AS BIGINT) AS dcg_s,
                   CAST(MAX({idcg}) AS BIGINT) AS idcg_s
            FROM staged WHERE rank <= {_NDCG_K}
            GROUP BY q_id
        )
        SELECT q_id, n_corpus, dcg_s, idcg_s,
               CASE WHEN idcg_s > 0
                    THEN dcg_s * 1000000 // idcg_s END AS ndcg_micro
        FROM agg
    """


ORACLES: dict[str, str] = {
    "llm_chunk_rank": _chunk_rank_oracle_sql(),
    "llm_rank_fusion": _rank_fusion_oracle_sql(),
    "llm_eval_ndcg": _eval_ndcg_oracle_sql(),
    "llm_mmr_rerank": _mmr_rerank_oracle_sql(),
}

QUERY_FNS = {
    "llm_chunk_rank": llm_chunk_rank,
    "llm_rank_fusion": llm_rank_fusion,
    "llm_eval_ndcg": llm_eval_ndcg,
    "llm_mmr_rerank": llm_mmr_rerank,
}
