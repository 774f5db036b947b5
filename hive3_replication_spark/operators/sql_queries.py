"""End-to-end SQL workloads (SURVEY.md §2.12): classic TPC-H-shaped queries
run through ``spark.sql`` over the registered catalog — the proof that the
engine's SQL surface composes (scan pushdown + multi-way joins + grouped
aggregation + ordering in one declarative statement, all Catalyst-planned).

Float determinism: every summed measure uses the engine-wide exact-decimal
accumulation policy (see operators/aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_disc_price,
       COUNT(*) AS count_order
FROM {lineitem}
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       o_orderdate, o_orderpriority
FROM {customer}
JOIN {orders} ON c_custkey = o_custkey
JOIN {lineitem} ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM {customer}
JOIN {orders} ON c_custkey = o_custkey
JOIN {lineitem} ON l_orderkey = o_orderkey
JOIN {supplier} ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN {nation} ON s_nationkey = n_nationkey
JOIN {region} ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
"""

_TABLES = ("lineitem", "orders", "customer", "supplier", "nation", "region")


def _run(spark: SparkSession, sf_dir: str, template: str) -> DataFrame:
    names = {}
    for t in _TABLES:
        view = f"h3r_sql_{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(view)
        names[t] = view
    return spark.sql(template.format(**names))


def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-table scan + grouped aggregation, the pattern
    of every verification rollup. Plan: pushed shipdate filter → partial
    agg → one exchange → final agg."""
    return _run(spark, sf_dir, _Q1)


def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered 3-way join + top-k by aggregate —
    the reference's 'which databases are furthest behind' question at
    warehouse scale."""
    return _run(spark, sf_dir, _Q3)


def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a co-location predicate
    (c_nationkey = s_nationkey); AQE broadcasts every dim."""
    return _run(spark, sf_dir, _Q5)


ORACLES: dict[str, str] = {
    "sql_pricing_summary": _Q1.format(
        lineitem="lineitem", orders="orders", customer="customer",
        supplier="supplier", nation="nation", region="region",
    ),
    "sql_shipping_priority": _Q3.format(
        lineitem="lineitem", orders="orders", customer="customer",
        supplier="supplier", nation="nation", region="region",
    ),
    "sql_local_supplier_volume": _Q5.format(
        lineitem="lineitem", orders="orders", customer="customer",
        supplier="supplier", nation="nation", region="region",
    ),
}

QUERY_FNS = {
    "sql_pricing_summary": sql_pricing_summary,
    "sql_shipping_priority": sql_shipping_priority,
    "sql_local_supplier_volume": sql_local_supplier_volume,
}
