"""Custom stateful streaming operator (applyInPandasWithState).

The reference's ObservabilityClient keeps a mutable per-process buffer
(records since last flush) across events (``ObservabilityClient.scala:
84-105``). The Spark-first equivalent of "mutable operator state that
outlives a batch" is keyed state in Structured Streaming. This module
implements the buffer counter as an ``applyInPandasWithState`` operator:
per executor, persist (records_seen, flush_count) across micro-batches and
emit one row per batch with the updated totals + how many size-triggered
flushes occurred (batchSize=100 parity).

State is a two-int struct → bounded per key; with RocksDB state store this
scales to millions of keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.telemetry import task_metrics
from .collector import events_stream

OUTPUT_SCHEMA = (
    "executor_id string, batch_records bigint, total_records bigint, "
    "total_flushes bigint"
)
STATE_SCHEMA = "total_records bigint, total_flushes bigint"

BATCH_SIZE = 100  # reference default (Utils.scala:103-105)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch_records = 0
    for pdf in pdfs:
        batch_records += len(pdf)
    if state.exists:
        total_records, total_flushes = state.get
    else:
        total_records, total_flushes = 0, 0
    new_total = total_records + batch_records
    new_flushes = new_total // BATCH_SIZE
    state.update((new_total, new_flushes))
    yield pd.DataFrame(
        {
            "executor_id": [key[0]],
            "batch_records": [batch_records],
            "total_records": [new_total],
            "total_flushes": [new_flushes],
        }
    )


def run_stateful_buffer_counter(
    spark: SparkSession, sf_dir: str, sink_name: str = "gfaooa_stateful_sink"
) -> DataFrame:
    """Run the stateful buffer counter to completion (availableNow)."""
    tm = task_metrics(events_stream(spark, sf_dir))
    counted = (
        tm.groupBy("executor_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        counted.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)


# --- transformWithState twin (Spark 4 arbitrary-state API) -------------------
# Same buffer-counter semantics on the NEW StatefulProcessor API: typed
# ValueState handles, explicit lifecycle, RocksDB-backed (the API requires
# the RocksDB provider — exactly the store the 100 TB posture calls for).
# Gated on BOTH the API and google.protobuf: the TWS state-server protocol
# speaks protobuf, which this container does not ship — the operator is
# fully written and the test runs wherever protobuf exists (no pip install
# here, per the environment rules).
try:  # the API exists from Spark 4.0; guard for older runtimes
    import google.protobuf.descriptor  # noqa: F401  (TWS wire dependency)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _BufferProcessor(StatefulProcessor):
        """O18-twin: per-executor (total_records, total_flushes) across
        micro-batches via a ValueState handle."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("buffer", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            batch_records = 0
            for pdf in rows:
                batch_records += len(pdf)
            prior = self._state.get() if self._state.exists() else (0, 0)
            new_total = prior[0] + batch_records
            new_flushes = new_total // BATCH_SIZE
            self._state.update((new_total, new_flushes))
            yield pd.DataFrame(
                {
                    "executor_id": [key[0]],
                    "batch_records": [batch_records],
                    "total_records": [new_total],
                    "total_flushes": [new_flushes],
                }
            )

        def close(self) -> None:
            pass

    HAS_TWS = True
    TWS_MISSING: str | None = None
except ImportError as exc:  # pragma: no cover - older Spark / no protobuf
    HAS_TWS = False
    # Record WHICH import failed so the error names the real gap — the
    # guard trips both on Spark < 4.0 (no stateful_processor module) and
    # on a protobuf-less Spark 4 container (the known env gap here).
    TWS_MISSING = getattr(exc, "name", None) or str(exc)


def run_tws_buffer_counter(
    spark: SparkSession, sf_dir: str, sink_name: str = "gfaooa_tws_sink"
) -> DataFrame:
    """Run the buffer counter on ``transformWithStateInPandas`` to
    completion (availableNow); result rows match the
    ``applyInPandasWithState`` twin (asserted in tests).

    The RocksDB state-store provider is required by the API and scoped to
    this call (restored after), leaving other queries on the session
    default.
    """
    if not HAS_TWS:
        raise RuntimeError(
            "transformWithStateInPandas requires Spark >= 4.0 AND "
            f"google.protobuf; missing import: {TWS_MISSING}"
        )
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        tm = task_metrics(events_stream(spark, sf_dir))
        counted = tm.groupBy("executor_id").transformWithStateInPandas(
            statefulProcessor=_BufferProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        q = (
            counted.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prior is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prior)
    return spark.table(sink_name)
