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

#: Inferred-schema memo: (table path, payload mtime_ns) → StructType.
#: Schema INFERENCE (spark.read.parquet with no schema) launches a footer-
#: read job per call — measured ~170 ms each, and operators load 2-7 tables
#: per invocation, which made inference the single largest fixed cost of a
#: bench pass (round-15 measurement). Supplying the memoized schema
#: explicitly skips that job; the memo is METADATA only (never rows or
#: results — every query still computes from the parquet inputs), and the
#: mtime in the key invalidates it if a table payload is ever rewritten.
#: Non-statable paths (remote URIs) skip the memo and infer as before.
_SCHEMA_MEMO: dict[tuple[str, int], "object"] = {}

#: Loaded-DataFrame memo: (session id, table path, payload mtime_ns) →
#: (session, DataFrame). A DataFrame is an immutable LAZY PLAN — returning
#: the same object for a repeated load is pure plan reuse (METADATA, like
#: _SCHEMA_MEMO; no persist, no rows — every action still computes from
#: the parquet inputs). Building the plan costs two eagerly-analyzed
#: Dataset creations (~15-30 ms of JVM analysis); operators load 2-7
#: tables per invocation and a bench pass makes a few hundred load_table
#: calls, so this was the largest remaining per-call fixed cost after the
#: round-15 schema memo. The value keeps a STRONG reference to the owning
#: session so a collected session's id() can never alias a new session;
#: the mtime key invalidates on payload rewrite exactly like the schema
#: memo.
_DF_MEMO: dict[tuple[int, str, int], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with normalized schema.

    Normalization happens at the ingest edge only: downstream operators see
    proper TimestampType and can rely on Catalyst pushing filters into the
    parquet scan (the ns->us conversion is a projection, so pruning of other
    columns still reaches the reader).
    """
    import os

    from pyspark.sql.types import LongType

    ensure_engine_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = None
    try:
        key = (path, os.stat(path).st_mtime_ns)
    except OSError:  # remote URI / unstatable — plain inference path
        pass
    if key is not None:
        hit = _DF_MEMO.get((id(spark), *key))
        if hit is not None:
            return hit[1]
    schema = _SCHEMA_MEMO.get(key) if key is not None else None
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        schema = df.schema
        if key is not None:
            # drop stale entries for the same path before inserting
            for k in [k for k in _SCHEMA_MEMO if k[0] == path]:
                del _SCHEMA_MEMO[k]
            _SCHEMA_MEMO[key] = schema
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        field = next((f for f in schema.fields if f.name == col), None)
        if field is not None and isinstance(field.dataType, LongType):
            # integer DIV, not `/`: ns-since-epoch (~1.7e18) exceeds double's
            # 2^53 integer range, so float division would round the microsecond
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000"))
            )
    if key is not None:
        for k in [k for k in _DF_MEMO if k[0] == id(spark) and k[1] == path]:
            del _DF_MEMO[k]
        _DF_MEMO[(id(spark), *key)] = (spark, df)
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


#: Embedding dimensionality memo, keyed like _SCHEMA_MEMO on (table path,
#: payload mtime_ns). The vector width is STRUCTURAL metadata the parquet
#: type system simply cannot carry for list columns (a fixed-width vector
#: space's dim is schema-level information); probing it cost one Spark job
#: (~120 ms) per operator call, three headline operators deep (round-15
#: measurement). Rows never enter this memo and a rewritten payload
#: re-probes via the mtime key.
_DIM_MEMO: dict[tuple[str, int], int] = {}


def embedding_dim(spark: SparkSession, sf_dir: str) -> int:
    """Dimensionality of the embeddings relation (length of the first
    clean vector), memoized per (path, payload mtime). Consumers build
    per-dimension expression lists from this, so it must be a driver-side
    int; the memo makes it one probe job per dataset per process instead
    of one per operator invocation."""
    import os

    path = f"{sf_dir}/embeddings.parquet"
    key = None
    try:
        key = (path, os.stat(path).st_mtime_ns)
    except OSError:
        pass
    if key is not None:
        hit = _DIM_MEMO.get(key)
        if hit is not None:
            return hit
    dim = len(load_embeddings(spark, sf_dir).select("embedding").first()[0])
    if key is not None:
        for k in [k for k in _DIM_MEMO if k[0] == path]:
            del _DIM_MEMO[k]
        _DIM_MEMO[key] = dim
    return dim


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
    iteration); identical in the SQL twin ``EMB_CLEAN_SUBQUERY``.

    The cleaned plan is memoized like ``load_table``'s (_DF_MEMO — lazy
    plan-object reuse, metadata only): eight vector operators re-derived
    the identical filter per invocation."""
    import os

    path = f"{sf_dir}/embeddings.parquet"
    key = None
    try:
        key = (id(spark), f"{path}#clean", os.stat(path).st_mtime_ns)
    except OSError:
        pass
    if key is not None:
        hit = _DF_MEMO.get(key)
        if hit is not None:
            return hit[1]
    zero = F.lit(0.0).cast("float")
    df = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
        & (F.size("embedding") > 0)
        & (
            (F.array_max("embedding") != zero)
            | (F.array_min("embedding") != zero)
        )
    )
    if key is not None:
        for k in [k for k in _DF_MEMO if k[0] == key[0] and k[1] == key[1]]:
            del _DF_MEMO[k]
        _DF_MEMO[key] = (spark, df)
    return df
