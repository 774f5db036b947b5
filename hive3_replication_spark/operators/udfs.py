"""UDF / UDAF / UDTF surface (SURVEY.md §2.10, X1-X3).

The reference's extension mechanism is "drop in an HQL script"
(``init_variables.sh:36-43``); the engine's is the pandas UDF family —
Arrow-batched, vectorized, never row-at-a-time Python. These three entries
exist to prove the plumbing (scalar / grouped-agg / table-function); the
engine's policy is to use built-ins whenever expressible (see scalars.py) and
reserve UDFs for genuinely non-SQL logic (see llm/multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table


def _text_len_udf():
    """Scalar pandas UDF (Series→Series, one Arrow batch per invocation):
    codepoint length. (Constructed lazily — pandas_udf needs an active
    session to parse its return type.)"""

    @pandas_udf("int")
    def text_len(text: pd.Series) -> pd.Series:
        # nullable Int32, not int32: .str.len() is NaN for NULL text, and
        # astype("int32") raises IntCastingNaNError on the first NULL row
        # (hostile-row fuzz, round 12) — NULL in, NULL out, like LENGTH()
        return text.str.len().astype("Int32")

    return text_len


def _scaled_sum_udf():
    """Grouped-agg pandas UDF (Series→scalar): exact integer sum of
    floor(value*100) — integer accumulation so the result is
    order-independent and reproducible across partitionings."""
    import numpy as np

    @pandas_udf("long")
    def scaled_sum(value: pd.Series) -> int:
        # SQL SUM semantics exactly: NULLs are skipped (floor(NaN) casts
        # to int64 GARBAGE near ±2^63 otherwise — hostile-row fuzz,
        # round 12), and an empty/all-NULL group sums to NULL, not 0
        v = value.dropna()
        if v.empty:
            return None
        return int(np.floor(v.values * 100).astype("int64").sum())

    return scaled_sum


def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — scalar pandas UDF over documents: text length (Arrow-vectorized;
    ~10-100x a row-at-a-time Python UDF)."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id", _text_len_udf()(F.col("text")).alias("text_len")
    )


def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — grouped-aggregate pandas UDF: per-type exact scaled sum. The
    partial/final split is handled by Spark; the UDF sees each group's
    values as one Series."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        _scaled_sum_udf()(F.col("value")).alias("scaled_sum")
    )


def udf_table_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3b — class-based Python UDTF (Spark 3.5+ ``@udtf``): tokenize with
    positions, one input row → N output rows, registered and invoked through
    SQL ``LATERAL`` — the declarative table-function surface (mapInPandas
    below is the Arrow-batch alternative)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            # ''.split(' ') == [''] — one empty token, matching the SQL
            # string_split semantics the oracle uses; only NULL yields nothing
            if text is not None:
                for pos, token in enumerate(text.split(" ")):
                    yield pos, token

    spark.udtf.register("h3r_tokenize", Tokenize)
    documents = load_table(spark, sf_dir, "documents")
    documents.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL h3r_tokenize(d.text) t
        WHERE d.doc_id < 100
        """
    )


def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — Arrow-optimized Python UDF (Spark 3.5+ ``useArrow=True``): a
    row-wise Python function with Arrow-batched transport — the migration
    path for row-at-a-time ``@udf`` code that can't be vectorized as a
    Series operation (branchy per-value logic, third-party per-item
    libraries). Same serialization win as pandas UDFs (one Arrow batch
    per ~10k rows instead of one pickle round-trip per row); the Python
    loop itself remains the floor, which is why scalars.py keeps every
    SQL-expressible function in built-ins."""
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def vowel_count(text: str) -> int:
        if text is None:
            return None
        return sum(1 for ch in text if ch in "aeiou")

    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id", vowel_count(F.col("text")).alias("n_vowels")
    )


def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — table function via mapInPandas: tokenize documents into
    (doc_id, token) rows — a 1→N row expansion with Arrow-batched I/O.
    (Built-in explode is preferred when expressible — see llm/text.py; this
    entry exercises the arbitrary-fanout path.)"""
    documents = load_table(spark, sf_dir, "documents")

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf[["doc_id", "text"]].copy()
            toks["token"] = toks["text"].str.split(" ")
            out = toks[["doc_id", "token"]].explode("token")
            yield out[out["token"].notna()]

    return documents.mapInPandas(tokenize, "doc_id long, token string")


ORACLES: dict[str, str] = {
    "udf_scalar": """
        SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS text_len FROM documents
    """,
    "udf_grouped_agg": """
        SELECT event_type,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS scaled_sum
        FROM events GROUP BY event_type
    """,
    "udf_arrow": """
        SELECT doc_id,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[aeiou]', '', 'g'))
                    AS INTEGER) AS n_vowels
        FROM documents
    """,
    "udf_table": """
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
    "udf_table_udtf": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents WHERE doc_id < 100)
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
               unnest(toks) AS token
        FROM t
    """,
}

QUERY_FNS = {
    "udf_scalar": udf_scalar,
    "udf_grouped_agg": udf_grouped_agg,
    "udf_table": udf_table,
    "udf_table_udtf": udf_table_udtf,
    "udf_arrow": udf_arrow,
}
