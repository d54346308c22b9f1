"""Live task-metrics collector — REAL observability of the running app.

This is the direct functional counterpart of the reference's collector
(``source/collector/src/main/scala/com/amazonaws/sparkobservability/
CustomMetricsListener.scala:41-104``): where the reference registers a
SparkListener and accumulates ``CustomTaskMetrics`` per finished task, we
read the SAME metrics from Spark's status REST API (served by the app's own
UI endpoint) and normalize them into the engine's task-metrics record
layout (``CustomMetrics.scala:28-49`` parity — the 16-field record).

The stage→job mapping the reference maintains in its listener
(``onJobStart`` bookkeeping) is reconstructed from ``/jobs``, which lists
each job's stage ids.

PySpark cannot host a JVM SparkListener without a py4j callback server
(fragile in production); the status API exposes the identical
``TaskMetrics`` values the listener would see, pull-style. Pulling is also
the right shape for a Spark-first collector: the fetch itself is driver-side
and tiny (metrics volume is O(tasks), unrelated to data volume), and the
resulting DataFrame feeds every group-O dashboard query unchanged.
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


#: Timestamp layouts the status REST API has been observed to emit
#: (with and without fractional seconds; GMT suffix or bare).
_REST_TIME_FORMATS = (
    "%Y-%m-%dT%H:%M:%S.%fGMT",
    "%Y-%m-%dT%H:%M:%SGMT",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S",
)


def _epoch_ms(launch_time) -> int:
    """REST reports launchTime as ISO text with a GMT suffix.

    Raises on an unrecognized value rather than silently returning epoch 0,
    which would quietly skew every time-bucketed rollup built on it.
    """
    if isinstance(launch_time, (int, float)):
        return int(launch_time)
    if isinstance(launch_time, str):
        for fmt in _REST_TIME_FORMATS:
            try:
                dt = datetime.strptime(launch_time, fmt)
            except ValueError:
                continue
            return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)
    raise ValueError(f"unrecognized REST launchTime value: {launch_time!r}")

#: Output schema — field-for-field CustomTaskMetrics parity.
LIVE_TASK_METRICS_SCHEMA = (
    "app_name string, app_id string, job_id long, stage_id long, task_id long,"
    "executor_id string, partition_id long, metrics_type string,"
    "metric_time_ms long, input_bytes_read long, input_records_read long,"
    "run_time_ms long, executor_cpu_time_ms long, peak_execution_memory long,"
    "output_bytes_written long, output_records_written long,"
    "shuffle_bytes_read long, shuffle_records_read long,"
    "shuffle_bytes_written long, shuffle_records_written long"
)


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return json.load(r)


def stage_to_job_map(spark: SparkSession) -> dict[int, int]:
    """Reconstruct the listener's stage→job bookkeeping from /jobs."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    mapping: dict[int, int] = {}
    for job in _get(base, f"applications/{app_id}/jobs"):
        for sid in job.get("stageIds", []):
            mapping[sid] = job["jobId"]
    return mapping

def live_task_metrics(spark: SparkSession, max_stages: int = 200) -> DataFrame:
    """Collect real per-task metrics for this application's completed
    stages, as a DataFrame in the canonical task-metrics layout."""
    sc = spark.sparkContext
    base, app_id, app_name = sc.uiWebUrl, sc.applicationId, sc.appName
    rows = []
    if not base:  # UI disabled in this session — no REST endpoint to poll
        return spark.createDataFrame(rows, LIVE_TASK_METRICS_SCHEMA)
    jobs = stage_to_job_map(spark)
    stages = _get(base, f"applications/{app_id}/stages?status=complete")
    for st in stages[:max_stages]:
        detail = _get(
            base,
            f"applications/{app_id}/stages/{st['stageId']}/"
            f"{st['attemptId']}?details=true",
        )
        attempts = detail if isinstance(detail, list) else [detail]
        for att in attempts:
            for tid, t in (att.get("tasks") or {}).items():
                m = t.get("taskMetrics") or {}
                inp = m.get("inputMetrics") or {}
                outp = m.get("outputMetrics") or {}
                shr = m.get("shuffleReadMetrics") or {}
                shw = m.get("shuffleWriteMetrics") or {}
                rows.append(
                    (
                        app_name,
                        app_id,
                        jobs.get(st["stageId"], -1),
                        st["stageId"],
                        int(tid),
                        t.get("executorId", "driver"),
                        t.get("index", -1),
                        "taskMetrics",
                        _epoch_ms(t.get("launchTime", 0)),
                        int(inp.get("bytesRead", 0)),
                        int(inp.get("recordsRead", 0)),
                        int(m.get("executorRunTime", 0)),
                        # REST reports cpuTime in ns; the reference ships ms
                        int(m.get("executorCpuTime", 0)) // 1_000_000,
                        int(m.get("peakExecutionMemory", 0)),
                        int(outp.get("bytesWritten", 0)),
                        int(outp.get("recordsWritten", 0)),
                        int(shr.get("localBytesRead", 0)) + int(shr.get("remoteBytesRead", 0)),
                        int(shr.get("recordsRead", 0)),
                        int(shw.get("bytesWritten", 0)),
                        int(shw.get("recordsWritten", 0)),
                    )
                )
    return spark.createDataFrame(rows, LIVE_TASK_METRICS_SCHEMA)


def live_stage_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end self-observation: run a real marker workload, collect its
    REAL task metrics, and push them through the group-O skewness
    aggregation (the reference's collector → stage-agg path on live data).
    """
    from pyspark.sql import functions as F

    from ..operators.observability import stage_agg_skewness
    from .tables import load_tables

    # marker workload: a scan + shuffle so input and shuffle metrics are real
    t = load_tables(spark, sf_dir)
    t["lineitem"].groupBy("l_returnflag").agg(F.count(F.lit(1))).collect()

    tm = live_task_metrics(spark)
    return stage_agg_skewness(tm)
