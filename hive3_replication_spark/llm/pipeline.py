"""Composed training-data pipeline (the BASELINE.json north star, end to
end): quality filter → exact dedup → near-dup removal → per-language corpus
stats, as ONE declarative plan.

This is the shape a 100 TB pre-training data job takes: every stage is a
DataFrame transformation over the previous one, so Catalyst fuses the
filters into the scan and the whole chain materializes nothing until the
final aggregate. The near-dup stage uses the exact n-gram path here (SQL-
verifiable); production swaps in the MinHash stage (llm_dedup_minhash) with
the identical dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import ngram_pair_jaccard
from .text import quality_score_expr, token_count_expr


def llm_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality ≥ 0.5 → exact-dedup (keep min doc_id per text) →
    drop the higher-id member of every near-dup pair (3-gram Jaccard ≥ 0.08)
    → per-lang surviving doc count + total tokens."""
    documents = load_table(spark, sf_dir, "documents")

    # stage 1 — quality filter (the shared scoring expression)
    quality = documents.withColumn("q", quality_score_expr()).filter(
        F.col("q") >= 0.5
    )

    # stage 2 — exact dedup: canonical = min doc_id per text
    canonical = quality.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),  # deterministic pick among duplicates
    )

    # stage 3 — near-dup removal: doc_b of every candidate pair at or
    # above NGRAM_MIN_JACCARD (applied inside the shared scorer) is
    # dropped (keep-lowest-id policy); scoring shared with
    # llm_dedup_ngram so blocking/threshold logic cannot drift
    drop = (
        ngram_pair_jaccard(
            canonical.select("doc_id", "text"), "pipeline_shingles"
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = canonical.join(drop, "doc_id", "left_anti")

    # stage 4 — corpus stats per language
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_expr()).alias("total_tokens"),
    )


ORACLES: dict[str, str] = {
    "llm_pipeline_e2e": """
        WITH quality AS (
            SELECT doc_id, text, lang FROM (
                SELECT doc_id, text, lang,
                       LEAST(1.0, n_chars / 500.0) * 0.5
                       + LEAST(1.0, CAST(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 AS DOUBLE) / 80.0) * 0.3
                       + LEAST(1.0, (CAST(LENGTH(REPLACE(text,' ','')) AS DOUBLE)
                                     / CAST(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1 AS DOUBLE)) / 8.0) * 0.2
                           AS q
                FROM documents
            ) WHERE q >= 0.5
        ),
        canonical AS (
            SELECT MIN(doc_id) AS doc_id, text, MIN(lang) AS lang
            FROM quality GROUP BY text
        ),
        t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM canonical),
        tok AS (
            SELECT doc_id, unnest(toks) AS tk, generate_subscripts(toks, 1) AS pos
            FROM t
        ),
        sh3 AS (
            SELECT DISTINCT doc_id,
                   tk || ' ' || LEAD(tk,1) OVER w || ' ' || LEAD(tk,2) OVER w AS shingle
            FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        sh AS (SELECT doc_id, shingle FROM sh3 WHERE shingle IS NOT NULL),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        freq AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
        shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle)),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        dropped AS (
            SELECT DISTINCT doc_b AS doc_id
            FROM pairs
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.08
        ),
        survivors AS (
            SELECT c.* FROM canonical c
            WHERE c.doc_id NOT IN (SELECT doc_id FROM dropped)
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text,' ','')) + 1) AS BIGINT)
                   AS total_tokens
        FROM survivors GROUP BY lang
    """,
}

QUERY_FNS = {
    "llm_pipeline_e2e": llm_pipeline_e2e,
}
