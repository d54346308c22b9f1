"""Telemetry data model: derive the reference's task-metric records from the
driver's ``events`` table.

Reference parity: the record layout mirrors ``CustomTaskMetrics``
(reference ``source/collector/src/main/scala/com/amazonaws/
sparkobservability/CustomMetrics.scala:28-49``): app/job/stage/task/executor
identity, input/output bytes+records, runTime, executorCpuTime,
peakExecutionMemory, shuffle read/write bytes+records, metricTime, plus the
``metricsType`` discriminator the ingestion pipeline routes on
(``deployment/infra/resources/pipelines/metrics-pipeline.yaml``).

The mapping is a pure per-row projection (narrow, shuffle-free, fully
deterministic) so it scales linearly and is exactly reproducible in the
DuckDB oracle — every arithmetic op below is IEEE-identical across engines:
integer modulo, string concat, JSON field extraction, FLOOR of
power-of-two-scaled doubles, and epoch milliseconds.

The same function is applied to a batch DataFrame and to a streaming
DataFrame (``streaming/collector.py``) — Structured Streaming reuses the
batch logical plan, which is the Spark-first replacement for the reference's
imperative listener callbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metric columns of the task-metrics record (all BIGINT, exact-summable).
METRIC_COLUMNS = [
    "input_bytes_read",
    "input_records_read",
    "run_time_ms",
    "executor_cpu_time_ms",
    "peak_execution_memory",
    "output_bytes_written",
    "output_records_written",
    "shuffle_bytes_read",
    "shuffle_records_read",
    "shuffle_bytes_written",
    "shuffle_records_written",
]

ID_COLUMNS = [
    "app_name",
    "app_id",
    "job_id",
    "stage_id",
    "task_id",
    "executor_id",
    "partition_id",
    "metrics_type",
    "metric_time_ms",
]


def normalize_events(events: DataFrame) -> DataFrame:
    """Return ``events`` with ``ts`` as a session-timezone TIMESTAMP,
    whatever the on-disk encoding.

    The driver has shipped the events table with ``ts`` as bigint
    epoch-nanos (round 1) and as parquet ``timestamp[us]``/TIMESTAMP_NTZ
    (round 2+); every consumer goes through this adapter so a future
    re-encoding changes exactly one function. With the session timezone
    pinned to UTC (``session.tune_session``), the NTZ→LTZ cast is a pure
    relabel and ``unix_millis(ts)`` equals DuckDB's ``epoch_ms(ts)`` on
    the same naive value.

    Works on batch and streaming DataFrames alike (schema is static).
    """
    ts_type = dict(events.dtypes).get("ts")
    if ts_type is None:
        return events
    if ts_type in ("bigint", "long"):
        # epoch-nanos: integer DIV keeps full precision (double division
        # would lose bits above 2^53).
        return events.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type.startswith("timestamp"):
        return events.withColumn("ts", F.col("ts").cast("timestamp"))
    raise TypeError(
        f"events.ts has unsupported type {ts_type!r}; expected bigint "
        "epoch-nanos or a timestamp type — the testdata encoding changed "
        "again; extend normalize_events()."
    )


def task_metrics(events: DataFrame) -> DataFrame:
    """events → task-metrics records (CustomTaskMetrics parity)."""
    events = normalize_events(events)
    u = F.col("user_id")
    e = F.col("event_id")
    v = F.col("value")
    app_name = F.concat(F.lit("app-"), (u % 4).cast("string"))
    return events.select(
        app_name.alias("app_name"),
        F.concat(app_name, F.lit("-run-"), (u % 3).cast("string")).alias("app_id"),
        (e % 13).alias("job_id"),
        (e % 47).alias("stage_id"),
        e.alias("task_id"),
        F.concat(F.lit("exec-"), (u % 8).cast("string")).alias("executor_id"),
        F.get_json_object("props", "$.k").cast("int").alias("partition_id"),
        F.when(F.col("event_type") == "error", F.lit("logs"))
        .otherwise(F.lit("taskMetrics"))
        .alias("metrics_type"),
        F.col("ts").alias("metric_time"),
        F.unix_millis(F.col("ts")).alias("metric_time_ms"),
        F.floor(v * 1024).alias("input_bytes_read"),
        F.floor(v).alias("input_records_read"),
        F.floor(v * 16).alias("run_time_ms"),
        F.floor(v * 8).alias("executor_cpu_time_ms"),
        F.floor(v * 4096).alias("peak_execution_memory"),
        F.floor(v * 256).alias("output_bytes_written"),
        F.floor(v / 4).alias("output_records_written"),
        F.floor(v * 512).alias("shuffle_bytes_read"),
        F.floor(v / 2).alias("shuffle_records_read"),
        F.floor(v * 128).alias("shuffle_bytes_written"),
        F.floor(v / 8).alias("shuffle_records_written"),
        F.col("event_type"),
        F.col("value"),
        u.alias("user_id"),
    )


def _events_ts_is_timestamp() -> bool:
    """Peek at the on-disk events schema so the DuckDB oracle SQL matches
    the encoding DuckDB will actually see.

    The Spark side adapts per-DataFrame (:func:`normalize_events`), but
    oracle SQL is static text run by the driver against raw parquet views —
    it must be generated for the right encoding. Footer reads are ~1 ms
    each, so EVERY candidate dir is probed: a silent first-hit answer could
    mask a dataset whose encodings disagree across scale factors. Any probe
    failure or cross-dir disagreement emits a loud warning (never a silent
    default) before falling back to the current (timestamp) encoding.
    """
    import os
    import warnings

    candidates = [
        os.environ.get("SPARK_GRAFT_SF_DIR"),
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR"),
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.1",
    ]
    try:
        import pyarrow.parquet as pq
    except Exception as exc:  # pragma: no cover - pyarrow is baked in
        warnings.warn(
            f"events.ts encoding probe unavailable (pyarrow import failed: "
            f"{exc!r}); assuming timestamp encoding for oracle SQL",
            stacklevel=2,
        )
        return True

    found: dict[str, bool] = {}
    for d in candidates:
        if not d:
            continue
        path = f"{d}/events.parquet"
        if not os.path.exists(path):
            continue
        try:
            t = str(pq.read_schema(path).field("ts").type)
        except Exception as exc:
            warnings.warn(
                f"failed to probe events.ts encoding at {path}: {exc!r}",
                stacklevel=2,
            )
            continue
        found[path] = t.startswith("timestamp")
    if not found:
        warnings.warn(
            "no readable events.parquet found under any candidate dir; "
            "assuming timestamp encoding for oracle SQL",
            stacklevel=2,
        )
        return True
    answers = set(found.values())
    if len(answers) > 1:
        warnings.warn(
            f"events.ts encoding DISAGREES across testdata dirs: {found}; "
            "using the first candidate's encoding — oracle SQL may mismatch "
            "for the other dirs",
            stacklevel=2,
        )
    return next(iter(found.values()))


if _events_ts_is_timestamp():
    #: DuckDB expr: events.ts → epoch milliseconds (BIGINT).
    EPOCH_MS_SQL = "epoch_ms(ts)"
    #: DuckDB expr: events.ts → naive timestamp.
    TS_TIMESTAMP_SQL = "ts"
else:  # bigint epoch-nanos encoding (round-1 testdata)
    EPOCH_MS_SQL = "(ts // 1000000)"
    TS_TIMESTAMP_SQL = "make_timestamp(ts // 1000)"


#: DuckDB CTE mirroring :func:`task_metrics` exactly (same names, same ops).
TELEMETRY_CTE = f"""
task_metrics AS (
  SELECT
    'app-' || CAST(user_id % 4 AS VARCHAR) AS app_name,
    'app-' || CAST(user_id % 4 AS VARCHAR) || '-run-' || CAST(user_id % 3 AS VARCHAR) AS app_id,
    event_id % 13 AS job_id,
    event_id % 47 AS stage_id,
    event_id AS task_id,
    'exec-' || CAST(user_id % 8 AS VARCHAR) AS executor_id,
    CAST(json_extract_string(props, '$.k') AS INTEGER) AS partition_id,
    CASE WHEN event_type = 'error' THEN 'logs' ELSE 'taskMetrics' END AS metrics_type,
    {TS_TIMESTAMP_SQL} AS metric_time,
    {EPOCH_MS_SQL} AS metric_time_ms,
    CAST(FLOOR(value * 1024) AS BIGINT) AS input_bytes_read,
    CAST(FLOOR(value) AS BIGINT) AS input_records_read,
    CAST(FLOOR(value * 16) AS BIGINT) AS run_time_ms,
    CAST(FLOOR(value * 8) AS BIGINT) AS executor_cpu_time_ms,
    CAST(FLOOR(value * 4096) AS BIGINT) AS peak_execution_memory,
    CAST(FLOOR(value * 256) AS BIGINT) AS output_bytes_written,
    CAST(FLOOR(value / 4) AS BIGINT) AS output_records_written,
    CAST(FLOOR(value * 512) AS BIGINT) AS shuffle_bytes_read,
    CAST(FLOOR(value / 2) AS BIGINT) AS shuffle_records_read,
    CAST(FLOOR(value * 128) AS BIGINT) AS shuffle_bytes_written,
    CAST(FLOOR(value / 8) AS BIGINT) AS shuffle_records_written,
    event_type,
    value,
    user_id
  FROM events
)
"""
