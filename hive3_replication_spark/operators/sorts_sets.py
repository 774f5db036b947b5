"""Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7).

Top-k compiles to Catalyst's TakeOrderedAndProject: per-partition heaps of k
rows merged at the driver — O(k) memory regardless of input size, the only
acceptable "sort" at 100 TB. Full sorts are range-partitioned (Exchange
rangepartitioning) and reserved for replay ordering where the semantics
demand it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def sort_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — last-match select: ``grep ... | tail -1`` (``hive3repl.sh:132``)
    = order desc, take 1 (TakeOrderedAndProject, no full sort)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select("event_id", "event_type", "user_id")
    )


def sort_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — full ordering of the change stream: events must replay in id
    order (``README.md:38``). Range-partitioned sort; at scale the repl
    pipeline instead sorts within partitions after range-bucketing by id
    span, preserving global replay order per bucket."""
    events = load_table(spark, sf_dir, "events")
    return events.orderBy("event_id").select("event_id", "event_type")


def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — top-k: k largest orders (deterministic tiebreak on key)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — stream merge (tee to console+file, ``misc_functions.sh:18``):
    UNION ALL of two event selections."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id"
    )
    return clicks.unionByName(errors)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — difference audit: source-minus-target rows (failure branch
    semantics ``hive3repl.sh:110-112``). exceptAll keeps multiplicity, which
    is what row-level divergence checking needs."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    purchasers = events.filter(F.col("event_type") == "purchase").select(
        "user_id"
    )
    return clickers.exceptAll(purchasers)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — rows confirmed identical on both sides: INTERSECT ALL."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    purchasers = events.filter(F.col("event_type") == "purchase").select(
        "user_id"
    )
    return clickers.intersectAll(purchasers)


ORACLES: dict[str, str] = {
    "sort_top1": """
        SELECT event_id, event_type, user_id FROM events
        ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    "sort_events": "SELECT event_id, event_type FROM events ORDER BY event_id",
    "sort_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "set_union": """
        SELECT event_id, user_id FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, user_id FROM events WHERE event_type = 'error'
    """,
    "set_except": """
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "set_intersect": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
}

QUERY_FNS = {
    "sort_top1": sort_top1,
    "sort_events": sort_events,
    "sort_topk": sort_topk,
    "set_union": set_union,
    "set_except": set_except,
    "set_intersect": set_intersect,
}
