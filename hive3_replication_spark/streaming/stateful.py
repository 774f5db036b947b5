"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 engine surface; the task brief's "custom stateful
operators" path).

Per-user replication progress tracking: for each user key the operator keeps
(count, max_event_id, last_value) across micro-batches — the per-key form of
the watermark bookkeeping the reference keeps per database. State lives in
the streaming state store (checkpointed, recoverable); each Arrow batch
updates one group's state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .structured import _event_stream

OUTPUT_SCHEMA = (
    "user_id long, n_events long, max_event_id long, last_value double"
)
#: last_valid_id tracks the max event_id AMONG NULL-VALUED-ROW-EXCLUDED
#: observations separately from max_id: last_value is the LAST OBSERVED
#: (non-NULL) value — the LOCF contract DuckDB's arg_max(value, event_id)
#: implements natively by skipping NULL values (round-13 fuzz: the
#: leading-NULL hostile row carries the table's max event_id, where
#: "value of the max-event_id row" and "last observed value" diverge).
STATE_SCHEMA = "n long, max_id long, last_valid_id long, last_value double"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, max_id, last_valid_id, last_value = (
        state.get if state.exists else (0, -1, -1, float("nan"))
    )
    for pdf in pdfs:
        n += len(pdf)
        batch_max = int(pdf["event_id"].max())
        if batch_max > max_id:
            max_id = batch_max
        # last value = LAST OBSERVED value: the max-event_id row among
        # rows that CARRY a value — a NULL-valued event advances the
        # watermark (max_id) but not the observed state (the LOCF
        # contract; DuckDB's arg_max skips NULL values the same way).
        # NaN is the in-state "never observed" sentinel (the state
        # store's double field can't hold SQL NULL); the relational
        # wrapper maps it back to NULL.
        valid = pdf.dropna(subset=["value"])
        if len(valid):
            valid_max = int(valid["event_id"].max())
            if valid_max > last_valid_id:
                last_value = float(
                    valid.loc[valid["event_id"].idxmax(), "value"]
                )
                last_valid_id = valid_max
    state.update((n, max_id, last_valid_id, last_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "max_event_id": [max_id],
            "last_value": [last_value],
        }
    )


def run_stateful_progress_stream(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Drain the event stream with per-user state; returns the final
    per-user progress rows (memory sink, update mode)."""
    stream = _event_stream(spark, sf_dir)
    progress = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    query = (
        progress.writeStream.format("memory")
        .queryName("h3r_user_progress")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(180):
        raise TimeoutError(f"stream {query.name} did not drain within 180s")
    # update mode appends one row per (user, batch); keep the latest per user
    from pyspark.sql import Window

    raw = spark.sql("SELECT * FROM h3r_user_progress")
    # n_events is the cumulative count and strictly grows per batch, so it
    # breaks max_event_id ties (a later batch can deliver only lower ids)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("max_event_id"), F.desc("n_events")
    )
    return (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
