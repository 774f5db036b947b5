"""Custom stateful streaming via ``transformWithStateInPandas`` — Spark 4's
stateful-v2 API (SPARK-49564 "State API v2"), the successor to
``applyInPandasWithState`` used in stateful.py.

What v2 adds over v1 (and why a 100 TB streaming deployment cares):
- TYPED state primitives (ValueState / ListState / MapState) instead of one
  opaque tuple — the MapState here keeps per-event-type counts under a user
  key without serializing the whole map per update;
- state schema evolution and independent per-variable storage in RocksDB;
- timers owned by the processor (not a single timeout conf).

ENVIRONMENT GATE: the v2 processor's driver worker speaks protobuf to the
JVM state server; this container ships no working ``google.protobuf``, so
the pipeline cannot run here (tests/test_streaming.py skip-gates on the
import, and no ``queries()`` key is registered — the verify sweep must
never hit a crash-by-environment). The implementation is complete and
becomes live wherever protobuf is installed; applyInPandasWithState
(stateful.py, key ``stream_stateful_progress``) remains the exercised
custom-stateful path.

The operator mirrors the reference's per-database watermark bookkeeping as
per-user progress: across micro-batches each user accumulates
(n_events, sum of values, per-type counts). Value sums are kept in integer
micro-units (floor(v*1e4 + 0.5) — half-up in exact double arithmetic, so
the fold is associative and identical on any engine/batch split), which is
what gives the final state a full SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .structured import _event_stream

OUTPUT_SCHEMA = "user_id long, n_events long, n_types long, sum_m long"


class _ProgressProcessor(StatefulProcessor):
    """Per-user progress: ValueState carries (n_events, sum_m); MapState
    carries per-event-type counts (n_types = map cardinality)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, sum_m long")
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "cnt long"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, sum_m = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            # half-up via floor(v*1e4 + 0.5): plain IEEE double ops, so the
            # per-row quantization is engine- and batch-split-independent
            import numpy as np

            sum_m += int(
                np.floor(pdf["value"].to_numpy() * 10_000.0 + 0.5)
                .astype("int64")
                .sum()
            )
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, sum_m))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "n_types": [n_types],
                "sum_m": [sum_m],
            }
        )

    def close(self) -> None:
        pass


def run_tws_progress_stream(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Drain the event stream through the v2 stateful processor; returns
    the final per-user state rows (memory sink, update mode, latest row
    per user)."""
    stream = _event_stream(spark, sf_dir)
    progress = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_ProgressProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    query = (
        progress.writeStream.format("memory")
        .queryName("h3r_tws_progress")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(180):
        raise TimeoutError(f"stream {query.name} did not drain within 180s")
    from pyspark.sql import Window

    raw = spark.sql("SELECT * FROM h3r_tws_progress")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        raw.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
