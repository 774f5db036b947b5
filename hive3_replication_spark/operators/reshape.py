"""Reshaping operators (SURVEY.md §2.13): pivot, unpivot/melt, and the
explode/lateral-view generator.

The reference's resultsets are already "wide" text tables; the engine adds
the standard reshape surface every analytics engine needs (and that
training-data pipelines use for per-measure normalization and token
fan-out). All three are pure Catalyst — pivot compiles to a single
conditional aggregate pass, unpivot to an Expand node (one scan, no join),
explode to a Generate node — so each is one shuffle or less and scales
linearly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

#: Pivot columns are declared, not discovered: at 100 TB a value-discovery
#: pass would be an extra full scan, and an unbounded value set would blow
#: up the schema. Declaring the domain keeps pivot a single-pass aggregate.
_STATUSES = ("F", "O", "P")


def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status, statuses as columns.

    ``groupBy().pivot(col, values).count()`` compiles to ONE conditional
    aggregate (no self-join per status); empty cells are coalesced to 0 so
    the result is stable as data grows.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .count()
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}")
            for s in _STATUSES
        ],
    )


def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: lineitem measures into (measure, val) long form — the
    shape feature-normalization pipelines want. Compiles to an Expand node:
    one scan emitting k rows per input row, no join, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


def reshape_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode with position (lateral view): token fan-out over documents —
    the first stage of every shingling/tokenizing pipeline. Generate node:
    streams rows, never materializes the full exploded set per partition.

    Position is emitted 1-based to match SQL ``WITH ORDINALITY`` semantics.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token"
    )


def reshape_struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 — nested-struct flatten: nest order facts into a two-level
    struct (the shape semi-structured ingests produce) and flatten back
    to columns with struct-star expansion — pure projection, zero
    shuffles; Catalyst prunes the nested fields it doesn't need at the
    scan (schema pruning for nested columns)."""
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            ).alias("meta"),
            F.col("o_totalprice").alias("price"),
        ).alias("payload"),
    )
    return nested.select(
        "o_orderkey",
        F.col("payload.meta.status").alias("status"),
        F.col("payload.meta.priority").alias("priority"),
        F.col("payload.price").alias("price"),
    )


ORACLES: dict[str, str] = {
    "reshape_struct_flatten": """
        SELECT o_orderkey, o_orderstatus AS status,
               o_orderpriority AS priority, o_totalprice AS price
        FROM orders
    """,
    "reshape_pivot": """
        SELECT o_orderpriority,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "reshape_unpivot": """
        WITH src AS (
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
            FROM lineitem WHERE l_orderkey < 100
        )
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
    """,
    "reshape_explode": """
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 20
    """,
}

QUERY_FNS = {
    "reshape_pivot": reshape_pivot,
    "reshape_unpivot": reshape_unpivot,
    "reshape_explode": reshape_explode,
    "reshape_struct_flatten": reshape_struct_flatten,
}
