"""Exactly-once streaming → warehouse sink (S2 × T3): foreachBatch writing
to a JDBC warehouse with batch-id bookkeeping.

The reference's target-side writes go through beeline/JDBC and rely on
Hive's REPL bookkeeping for idempotency; the engine's equivalent for a
stream is the standard foreachBatch + transactional-marker pattern: each
micro-batch writes its rows tagged with ``batch_id``, and a batch that was
already committed (marker present) is skipped — so checkpoint replay after
a crash cannot double-write. This is the exactly-once recipe the Spark docs
prescribe for idempotent JDBC sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import jdbc_read, jdbc_write
from .structured import _event_stream


def run_jdbc_stream(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    db: str = "repl_stream",
) -> DataFrame:
    """Stream per-type counts into the warehouse exactly once; returns the
    warehouse table contents after the drain."""

    state = {"initialized": False}

    def committed_batches(sess: SparkSession) -> set[int]:
        """Recover committed batch ids from the warehouse itself, so a
        restarted driver (fresh process, same checkpoint) still skips
        already-written batches."""
        try:
            rows = jdbc_read(
                sess, db, 'SELECT DISTINCT "batch_id" FROM stream_counts'
            ).collect()
            return {r["batch_id"] for r in rows}
        except Exception:  # table not created yet
            return set()

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        done = committed_batches(sess)
        if batch_id in done:  # checkpoint replay → skip (idempotent)
            return
        agg = (
            batch_df.groupBy("event_type")
            .agg(F.count("*").alias("n_events"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        mode = "append" if (done or state["initialized"]) else "overwrite"
        (
            agg.write.format("jdbc")
            .option("url", f"jdbc:derby:memory:{db};create=true")
            .option("dbtable", "stream_counts")
            .option(
                "driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver"
            )
            .mode(mode)
            .save()
        )
        state["initialized"] = True

    stream = _event_stream(spark, sf_dir)
    query = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    out = jdbc_read(
        spark, db, 'SELECT "event_type", "n_events", "batch_id" FROM stream_counts'
    )
    return out.select(
        F.col("event_type").cast("string"),
        F.col("n_events").cast("long"),
        F.col("batch_id").cast("long"),
    )
