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

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM {customer}
    LEFT OUTER JOIN {orders}
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

_Q15 = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS total_revenue
    FROM {lineitem}
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
),
ranked AS (
    SELECT supplier_no, total_revenue,
           MAX(total_revenue) OVER () AS max_revenue
    FROM revenue
)
SELECT s_suppkey, s_name, total_revenue
FROM {supplier}
JOIN ranked ON s_suppkey = supplier_no
WHERE total_revenue = max_revenue
ORDER BY s_suppkey
"""

_Q16 = """
SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM {part}
JOIN {lineitem} ON p_partkey = l_partkey
WHERE p_type NOT LIKE 'MEDIUM%'
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM {supplier} WHERE s_acctbal < 0
  )
GROUP BY p_brand
ORDER BY supplier_cnt DESC, p_brand
LIMIT 20
"""

_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM {orders}
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
      SELECT 1 FROM {lineitem}
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM {orders}
JOIN {lineitem} ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_Q14 = """
SELECT CAST(100.0 * promo / total AS DOUBLE) AS promo_revenue_pct,
       promo AS promo_revenue, total AS total_revenue
FROM (
    SELECT
        CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS total
    FROM {lineitem}
    JOIN {part} ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
) sums
"""

_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       c_acctbal, n_name
FROM {customer}
JOIN {orders} ON c_custkey = o_custkey
JOIN {lineitem} ON l_orderkey = o_orderkey
JOIN {nation} ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM {customer}
JOIN {orders} ON c_custkey = o_custkey
JOIN {lineitem} ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM {lineitem}
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS line_count
FROM {lineitem}
JOIN {part} ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
"""

_Q17 = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM {lineitem}
JOIN {part} ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.2 * AVG(l_quantity)
      FROM {lineitem} l2
      WHERE l2.l_partkey = {lineitem}.l_partkey
  )
"""

_Q22 = """
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM {customer}
WHERE c_acctbal > (
    -- exact-decimal sum / integer count: the threshold is bit-identical
    -- across engines and partitionings (a float AVG would not be)
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    FROM {customer} WHERE c_acctbal > 0.0
)
  AND NOT EXISTS (
      SELECT 1 FROM {orders} WHERE o_custkey = c_custkey
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM {supplier}
    JOIN {lineitem} ON s_suppkey = l_suppkey
    JOIN {orders} ON o_orderkey = l_orderkey
    JOIN {customer} ON c_custkey = o_custkey
    JOIN {nation} n1 ON s_nationkey = n1.n_nationkey
    JOIN {nation} n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

_Q8 = """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                          THEN CAST(volume AS DECIMAL(18,4))
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)
           AS mkt_share
FROM (
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM {part}
    JOIN {lineitem} ON p_partkey = l_partkey
    JOIN {supplier} ON s_suppkey = l_suppkey
    JOIN {orders} ON l_orderkey = o_orderkey
    JOIN {customer} ON o_custkey = c_custkey
    JOIN {nation} n1 ON c_nationkey = n1.n_nationkey
    JOIN {region} ON n1.n_regionkey = r_regionkey
    JOIN {nation} n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

_Q9 = """
SELECT nation, o_year,
       CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM (
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity / 10
               AS amount
    FROM {part}
    JOIN {lineitem} ON p_partkey = l_partkey
    JOIN {supplier} ON s_suppkey = l_suppkey
    JOIN {orders} ON o_orderkey = l_orderkey
    JOIN {nation} ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM {supplier}
JOIN {lineitem} l1 ON s_suppkey = l1.l_suppkey
JOIN {orders} ON o_orderkey = l1.l_orderkey
JOIN {nation} ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_5'
  AND EXISTS (
      SELECT 1 FROM {lineitem} l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM {lineitem} l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

_Q2 = """
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS ps_supplycost
    FROM {lineitem}
    GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM {part}
JOIN ps ON p_partkey = ps_partkey
JOIN {supplier} ON s_suppkey = ps_suppkey
JOIN {nation} ON s_nationkey = n_nationkey
JOIN {region} ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type = 'PROMO' AND r_name = 'EUROPE'
  AND ps_supplycost = (
      SELECT MIN(ps2.ps_supplycost)
      FROM ps ps2
      JOIN {supplier} s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN {nation} n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN {region} r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
LIMIT 100
"""

_TABLES = (
    "lineitem", "orders", "customer", "supplier", "nation", "region", "part",
)


def _run(spark: SparkSession, sf_dir: str, template: str) -> DataFrame:
    # Register ONLY the tables the statement references (optimization
    # round 15, guide §1.2 fixed costs): registering all 7 views charged
    # every SQL key ~5 unused load_table + createOrReplaceTempView round
    # trips. The placeholder set comes from the template itself, so a
    # query can never see a missing view.
    import string

    needed = {
        field
        for _, field, _, _ in string.Formatter().parse(template)
        if field
    }
    names = {}
    for t in _TABLES:
        if t not in needed:
            continue
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


def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with a join-time predicate, then a
    two-level aggregation (orders per customer → customers per order-count).
    The outer join keeps zero-order customers — the classic distribution
    query a driver-side loop gets wrong. Plan: one shuffle per grouping
    level, the second over the (tiny) distinct-count domain."""
    return _run(spark, sf_dir, _Q13)


def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate, then keep the max-revenue supplier(s).

    Deliberately written with a window MAX over the aggregated CTE instead
    of the textbook scalar subquery: Spark plans a scalar subquery as a
    SEPARATE job that re-scans and re-aggregates lineitem (verified via
    explain — no exchange reuse across the subquery boundary), while the
    empty-frame window runs over the already-tiny per-supplier aggregate.
    One lineitem scan at any scale."""
    return _run(spark, sf_dir, _Q15)


def sql_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN anti-join against a filtered dim + distinct
    aggregation per group. The anti side broadcasts; COUNT(DISTINCT) plans
    as a two-phase partial-distinct expand."""
    return _run(spark, sf_dir, _Q16)


def sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS rewritten by Catalyst to a left
    semi join — orders with at least one line shipped after the order date,
    counted per priority. The semi join deduplicates the fact side without
    a distinct; at scale the join shuffles on orderkey and the final agg
    domain is the 5-value priority column (map-side partial collapse)."""
    return _run(spark, sf_dir, _Q4)


def sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + dual conditional aggregation
    (`SUM(CASE WHEN ...)` pivot on priority class). One shuffle for the
    join, the grouped agg collapses map-side over the 3-value returnflag
    domain; the l_shipdate range predicate is pushed to the parquet scan."""
    return _run(spark, sf_dir, _Q12)


def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global conditional-aggregate ratio over a
    fact-dim join. Both sums come from a single pass (no self-join);
    the division happens on already-final DOUBLE scalars so the result is
    bit-identical across engines and cluster sizes."""
    return _run(spark, sf_dir, _Q14)


def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item customer ranking — 3 joins against a
    date-windowed fact slice, grouped per customer, top-20 by lost revenue.
    The nation dim broadcasts; the date-range + returnflag predicates are
    pushed to the lineitem/orders scans so the join sees only the slice;
    ORDER BY + LIMIT plans as TakeOrderedAndProject (no global sort)."""
    return _run(spark, sf_dir, _Q10)


def sql_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers via an IN subquery with a
    grouped HAVING — the 'which orders exceed a volume threshold' question.
    Catalyst rewrites IN to a left semi join on the pre-aggregated key set;
    lineitem is scanned twice but the semi side collapses to orderkeys that
    pass the threshold (tiny at any scale), so it broadcasts."""
    return _run(spark, sf_dir, _Q18)


def sql_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicates (OR of ANDed ranges
    across both join sides). Tests that Catalyst extracts the common
    join key and pushes the per-table disjunction halves down to each scan
    (brand/size brackets to part, quantity brackets to lineitem) instead of
    evaluating the whole OR post-join."""
    return _run(spark, sf_dir, _Q19)


def sql_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) gating a fact filter. Catalyst decorrelates into a grouped
    aggregate on l_partkey joined back to the fact — one extra shuffle on
    the correlation key instead of a per-row subquery execution; the
    brand predicate broadcasts from the dim side. The per-part threshold
    is exact (integer-valued quantities sum exactly in double), so the
    comparison is engine- and partitioning-invariant."""
    return _run(spark, sf_dir, _Q17)


def sql_inactive_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti join + a global scalar-subquery
    threshold. Catalyst plans the scalar as a separate tiny job whose
    result is literal-folded into the main scan filter; the anti join
    against orders runs as broadcast-anti on the distinct custkey set."""
    return _run(spark, sf_dir, _Q22)


def sql_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade volume — the same fact joined to
    the nation dim TWICE (supplier side and customer side) under a
    disjunctive nation-pair predicate, grouped by both nations and ship
    year. Both nation dims broadcast; the pair disjunction survives as a
    post-join filter while the date range pushes to the lineitem scan.
    The year column is extracted once in the subquery, so the group-by
    key is a plain attribute, not a repeated expression."""
    return _run(spark, sf_dir, _Q7)


def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — a 7-relation star (two nation roles
    + region) feeding a conditional-aggregate ratio per year. Numerator
    and denominator come from ONE pass (SUM(CASE)/SUM over the same
    grouped rows — no self-join); decimal sums are finalized to DOUBLE
    before the division so the ratio is bit-identical across engines and
    partitionings."""
    return _run(spark, sf_dir, _Q8)


def sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit — LIKE-filtered part dim
    gating a 5-way join, profit = revenue minus a cost proxy
    (p_retailprice · quantity / 10; the fixture schema carries no
    partsupp/ps_supplycost table), aggregated per supplier nation per
    order year. The '%red%' LIKE cannot push below the dim scan's row
    filter but prunes part before the join fans out; the profit
    expression stays in the fact projection so the shuffle carries one
    decimal, not three doubles."""
    return _run(spark, sf_dir, _Q9)


def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — the classic correlated
    scalar-subquery decorrelation pattern, the last of the canonical
    TPC-H shapes missing from this surface (VERDICT r12 ask #4b). For
    each size/type-filtered part, keep exactly the region-local
    supplier(s) whose supply cost equals the per-part regional minimum,
    where the part-supplier cost relation is DERIVED from lineitem
    (min observed discounted price per (partkey, suppkey); the fixture
    schema carries no partsupp table — the Q9 cost-proxy precedent).

    Catalyst decorrelates the `= (SELECT MIN ...)` into an aggregate of
    the shared `ps` CTE joined back on p_partkey — the subquery's 4-way
    dim chain (ps→supplier→nation→region) plans as two broadcast-dim
    chains off one shuffled fact, not a per-row re-execution. Cost is
    DECIMAL(18,4): MIN is order-independent and the min-equality compare
    is exact, so the surviving row set is bit-identical across engines
    and partitionings; the selected columns total-order the output
    (s_name is unique per supplier), making the LIMIT stable."""
    return _run(spark, sf_dir, _Q2)


def sql_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest correlation pattern in the suite —
    EXISTS and NOT EXISTS both correlated to the same fact alias
    (multi-supplier orders where exactly this supplier's line is flagged
    'R'; receipt/commit lateness reformulated over the fixture's
    returnflag column). Catalyst plans the EXISTS as a left-semi and the
    NOT EXISTS as a left-anti join against the same lineitem relation,
    both shuffling on l_orderkey — three scans of the fact, each pruned
    to (orderkey, suppkey, returnflag) columns."""
    return _run(spark, sf_dir, _Q21)


_QREC = """
WITH RECURSIVE chain(s_suppkey, root, depth) AS (
    SELECT s_suppkey, s_suppkey AS root, 0 AS depth
    FROM {supplier} WHERE s_suppkey = 1
    UNION ALL
    SELECT s.s_suppkey, c.root, c.depth + 1
    FROM {supplier} s JOIN chain c
      ON CAST(FLOOR(s.s_suppkey / 2.0) AS BIGINT) = c.s_suppkey
         AND s.s_suppkey > 1
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MIN(s_suppkey) AS BIGINT) AS min_key,
       CAST(MAX(s_suppkey) AS BIGINT) AS max_key
FROM chain GROUP BY depth ORDER BY depth
"""


def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): hierarchy
    traversal the reference expresses only procedurally (bash loops) —
    here the supplier id space forms an implicit binary tree (parent =
    id DIV 2) walked from the root to produce per-depth level stats.

    Each recursion step is one self-join of the frontier against the
    supplier relation — Spark executes it as an iterative union of
    micro-plans, the relational twin of the label-propagation loop in
    llm_dedup_clusters (which remains the scalable form for billion-edge
    graphs; this is the declarative surface for catalog-sized
    hierarchies: org charts, BOM trees, schema lineage). DuckDB runs the
    identical statement, so the key has a full SQL oracle. The parent
    edge uses FLOOR(key / 2.0) because bare `/` is float division in
    both engines (exact for these magnitudes); `id > 1` guards the
    root's self-edge."""
    return _run(spark, sf_dir, _QREC)


_ORACLE_NAMES = dict(
    lineitem="lineitem", orders="orders", customer="customer",
    supplier="supplier", nation="nation", region="region", part="part",
)

ORACLES: dict[str, str] = {
    "sql_recursive_hierarchy": _QREC.format(**_ORACLE_NAMES),
    "sql_pricing_summary": _Q1.format(**_ORACLE_NAMES),
    "sql_shipping_priority": _Q3.format(**_ORACLE_NAMES),
    "sql_local_supplier_volume": _Q5.format(**_ORACLE_NAMES),
    "sql_customer_distribution": _Q13.format(**_ORACLE_NAMES),
    "sql_top_supplier": _Q15.format(**_ORACLE_NAMES),
    "sql_parts_supplier_count": _Q16.format(**_ORACLE_NAMES),
    "sql_order_priority": _Q4.format(**_ORACLE_NAMES),
    "sql_shipmode_priority": _Q12.format(**_ORACLE_NAMES),
    "sql_promo_revenue": _Q14.format(**_ORACLE_NAMES),
    "sql_returned_items": _Q10.format(**_ORACLE_NAMES),
    "sql_large_volume_customer": _Q18.format(**_ORACLE_NAMES),
    "sql_discount_revenue": _Q19.format(**_ORACLE_NAMES),
    "sql_small_quantity_revenue": _Q17.format(**_ORACLE_NAMES),
    "sql_inactive_customer_balance": _Q22.format(**_ORACLE_NAMES),
    "sql_nation_volume": _Q7.format(**_ORACLE_NAMES),
    "sql_market_share": _Q8.format(**_ORACLE_NAMES),
    "sql_product_profit": _Q9.format(**_ORACLE_NAMES),
    "sql_waiting_supplier": _Q21.format(**_ORACLE_NAMES),
    "sql_min_cost_supplier": _Q2.format(**_ORACLE_NAMES),
}

QUERY_FNS = {
    "sql_pricing_summary": sql_pricing_summary,
    "sql_shipping_priority": sql_shipping_priority,
    "sql_local_supplier_volume": sql_local_supplier_volume,
    "sql_customer_distribution": sql_customer_distribution,
    "sql_top_supplier": sql_top_supplier,
    "sql_parts_supplier_count": sql_parts_supplier_count,
    "sql_order_priority": sql_order_priority,
    "sql_shipmode_priority": sql_shipmode_priority,
    "sql_promo_revenue": sql_promo_revenue,
    "sql_returned_items": sql_returned_items,
    "sql_large_volume_customer": sql_large_volume_customer,
    "sql_discount_revenue": sql_discount_revenue,
    "sql_small_quantity_revenue": sql_small_quantity_revenue,
    "sql_inactive_customer_balance": sql_inactive_customer_balance,
    "sql_nation_volume": sql_nation_volume,
    "sql_market_share": sql_market_share,
    "sql_product_profit": sql_product_profit,
    "sql_waiting_supplier": sql_waiting_supplier,
    "sql_min_cost_supplier": sql_min_cost_supplier,
    "sql_recursive_hierarchy": sql_recursive_hierarchy,
}
