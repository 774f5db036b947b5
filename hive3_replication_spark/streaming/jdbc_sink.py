"""Exactly-once streaming → warehouse sink (S2 × T3): foreachBatch writing
to a JDBC warehouse with batch-id bookkeeping.

The reference's target-side writes go through beeline/JDBC and rely on
Hive's REPL bookkeeping for idempotency; the engine's equivalent for a
stream is the standard foreachBatch + idempotent-marker pattern:

- the warehouse is DURABLE (on-disk Derby next to the checkpoint by
  default; any production JDBC URL works the same) so a restarted driver
  recovers the committed batch-id set from the warehouse itself;
- each micro-batch's rows are written tagged with ``batch_id`` in a SINGLE
  coalesced partition, i.e. one JDBC transaction — a crash mid-batch leaves
  either all of the batch's rows or none, never a partial batch;
- a batch whose id is already present is skipped, so checkpoint replay
  cannot double-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def run_jdbc_stream(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    warehouse_dir: str | None = None,
) -> DataFrame:
    """Stream per-type counts into the warehouse exactly once; returns the
    warehouse table contents after the drain."""
    from .structured import _event_stream

    if warehouse_dir is None:
        warehouse_dir = f"{checkpoint_dir}_warehouse"
    url = f"jdbc:derby:{warehouse_dir};create=true"

    def read_table(sess: SparkSession) -> DataFrame:
        return (
            sess.read.format("jdbc")
            .option("url", url)
            .option(
                "query",
                'SELECT "event_type", "n_events", "batch_id" FROM stream_counts',
            )
            .option("driver", _DRIVER)
            .load()
        )

    def committed_batches(sess: SparkSession) -> set[int] | None:
        """Committed batch ids recovered from the warehouse itself; None
        means the table does not exist yet. The DISTINCT is pushed down to
        the warehouse (dedicated query), so the check transfers one row per
        batch, not the whole table. Any other JDBC failure is re-raised —
        swallowing it could flip a later write into a destructive
        overwrite."""
        try:
            rows = (
                sess.read.format("jdbc")
                .option("url", url)
                .option(
                    "query", 'SELECT DISTINCT "batch_id" FROM stream_counts'
                )
                .option("driver", _DRIVER)
                .load()
                .collect()
            )
        except Exception as exc:
            if "does not exist" in str(exc) or "42X05" in str(exc):
                return None
            raise
        return {r["batch_id"] for r in rows}

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        done = committed_batches(sess)
        if done is not None and batch_id in done:
            return  # checkpoint replay → skip (idempotent)
        agg = (
            batch_df.groupBy("event_type")
            .agg(F.count("*").alias("n_events"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            # coalesce(1): the whole batch commits as ONE JDBC transaction,
            # so batch presence is atomic (marker == data)
            agg.coalesce(1)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", "stream_counts")
            .option("driver", _DRIVER)
            .mode("append" if done is not None else "overwrite")
            .save()
        )

    stream = _event_stream(spark, sf_dir)
    query = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(180):
        raise TimeoutError("jdbc sink stream did not drain within 180s")
    out = read_table(spark)
    return out.select(
        F.col("event_type").cast("string"),
        F.col("n_events").cast("long"),
        F.col("batch_id").cast("long"),
    )
