"""Table catalog: schema-normalized access to the engine's tables.

The reference delegates schema ownership to the Hive metastore and is itself
schema-agnostic (SURVEY.md §1.2). Here the catalog is a thin layer over
parquet directories: one table per file/dir, explicit normalization at the
ingest edge only (ns-timestamp → microsecond TimestampType), everything else
flows through Catalyst untouched so predicate pushdown / column pruning hit
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_engine_confs

#: Tables provided by the test fixtures (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns stored as parquet TIMESTAMP(NANOS); Spark reads them as long
#: (nanosAsLong) and we convert to microsecond TimestampType here, matching
#: DuckDB's CAST(ts_ns AS TIMESTAMP) truncation semantics exactly.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with normalized schema.

    Normalization happens at the ingest edge only: downstream operators see
    proper TimestampType and can rely on Catalyst pushing filters into the
    parquet scan (the ns->us conversion is a projection, so pruning of other
    columns still reaches the reader).
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer DIV, not `/`: ns-since-epoch (~1.7e18) exceeds double's
            # 2^53 integer range, so float division would round the microsecond
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (lazy plans; nothing is materialized)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


#: DuckDB twin of ``load_embeddings`` — an UNALIASED subquery, so the
#: registry's mechanical ``embeddings`` → ``(subquery)`` relation
#: substitution stays valid whether or not the original reference
#: carried its own alias (``FROM embeddings e`` / ``JOIN embeddings ce``
#: / bare ``FROM embeddings``).
EMB_CLEAN_SUBQUERY = (
    "(SELECT * FROM embeddings"
    " WHERE embedding IS NOT NULL AND len(embedding) > 0"
    " AND (list_max(embedding) <> 0 OR list_min(embedding) <> 0))"
)


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings relation every vector operator consumes: NULL,
    empty, and all-zero vectors are excluded at the source (one narrow
    pushed-down filter on the scan). A zero-norm embedding has no cosine
    direction — every normalized similarity would ANSI-fault on the 0
    divisor — and real 100 TB corpora DO contain such rows (failed or
    padded encoder outputs), so the policy is pinned HERE once rather
    than per-op (hostile-row fuzz wave 2, round 12: 12 vector keys
    faulted on one planted zero vector). The zero-norm test is exact
    and lambda-free — all-zero ⇔ array_max = 0 ∧ array_min = 0 — using
    plain collection expressions instead of a higher-order ``exists()``
    so the predicate stays inside whole-stage codegen on every rescan
    of the relation (kmeans re-evaluates this subtree per unrolled
    iteration); identical in the SQL twin ``EMB_CLEAN_SUBQUERY``."""
    zero = F.lit(0.0).cast("float")
    return load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
        & (F.size("embedding") > 0)
        & (
            (F.array_max("embedding") != zero)
            | (F.array_min("embedding") != zero)
        )
    )
