"""Canonical observability schemas.

These mirror the reference's three OpenSearch index templates
(``deployment/infra/resources/lambda/opensearch-bootstrap/resources/
templates/spark-task-metrics.json``, ``spark-stage-agg-metrics.json``,
``spark-logs.json``) re-typed for Spark. They are the public data model of
the engine: external telemetry (e.g. a real SparkListener shipping JSON)
lands in these shapes and every group-O operator consumes them.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, t) -> StructField:
    return StructField(name, t, nullable=True)


#: spark-task-metrics (CustomTaskMetrics, CustomMetrics.scala:28-49)
TASK_METRICS_SCHEMA = StructType(
    [
        _f("app_name", StringType()),
        _f("app_id", StringType()),
        _f("job_id", LongType()),
        _f("stage_id", LongType()),
        _f("stage_attempt_id", IntegerType()),
        _f("task_id", LongType()),
        _f("executor_id", StringType()),
        _f("partition_id", IntegerType()),
        _f("metrics_type", StringType()),
        _f("metric_time_ms", LongType()),
        _f("input_bytes_read", LongType()),
        _f("input_records_read", LongType()),
        _f("run_time_ms", LongType()),
        _f("executor_cpu_time_ms", LongType()),
        _f("peak_execution_memory", LongType()),
        _f("output_bytes_written", LongType()),
        _f("output_records_written", LongType()),
        _f("shuffle_bytes_read", LongType()),
        _f("shuffle_records_read", LongType()),
        _f("shuffle_bytes_written", LongType()),
        _f("shuffle_records_written", LongType()),
    ]
)

#: spark-stage-agg-metrics (CustomStageAggMetrics, CustomMetrics.scala:68-78)
STAGE_AGG_SCHEMA = StructType(
    [
        _f("app_name", StringType()),
        _f("app_id", StringType()),
        _f("job_id", LongType()),
        _f("stage_id", LongType()),
        _f("input_bytes_read_skewness", DoubleType()),
        _f("max_input_bytes_read", LongType()),
        _f("shuffle_bytes_read_skewness", DoubleType()),
        _f("max_shuffle_bytes_read", LongType()),
        _f("metric_time_ms", LongType()),
        _f("n_tasks", LongType()),
    ]
)

#: spark-logs (enriched LogEvent, spark-logs.json template + Utils.scala:24-56)
LOG_SCHEMA = StructType(
    [
        _f("app_name", StringType()),
        _f("app_id", StringType()),
        _f("executor_id", StringType()),
        _f("task_id", LongType()),
        _f("log_time_ms", LongType()),
        _f("level", StringType()),
        _f("mdc_task_name", StringType()),
        _f("parsed_task_id", StringType()),
        _f("parsed_stage_id", StringType()),
        _f("message", StringType()),
        _f("end_of_batch", BooleanType()),
    ]
)
