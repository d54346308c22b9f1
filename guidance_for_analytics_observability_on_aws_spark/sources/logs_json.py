"""JSON-lines log ingestion + partitioned telemetry sink.

The reference ships log4j2 ``LogEvent`` records as JSON over HTTP
(``source/collector/src/main/scala/com/amazonaws/sparkobservability/
ObservabilityClient.scala:241-264`` serializes level / message / timeMillis
/ the MDC ``taskName``; ``Utils.scala:24-56`` enriches with
appName/appId/executorId) and OpenSearch Ingestion lands them in the
``spark-logs`` index. Here the transport is a JSON-lines directory and the
"index" is partitioned parquet — the enrichment and MDC-parsing semantics
are identical, expressed as JVM-side column ops.

Scale posture: schema is supplied explicitly (no sampling inference pass),
corrupt records are quarantined per-row instead of failing the job, the
normalization is a narrow projection, and the sink partitions by
``metrics_type`` × UTC date — the parquet analogue of the reference's
per-type daily index rotation, giving partition pruning to every
dashboard query that filters on type or day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: Wire shape of one shipped log event (LogEvent JSON + enrichment fields).
RAW_LOG_JSON_SCHEMA = StructType(
    [
        StructField("appName", StringType(), True),
        StructField("appId", StringType(), True),
        StructField("executorId", StringType(), True),
        StructField("level", StringType(), True),
        StructField("message", StringType(), True),
        StructField("timeMillis", LongType(), True),
        StructField("taskName", StringType(), True),
        StructField("_corrupt_record", StringType(), True),
    ]
)

TASK_ID_RE = r"task (\d+\.\d+)"
STAGE_ID_RE = r"stage (\d+\.\d+)"


def read_log_events(spark: SparkSession, path: str, cache: bool = True) -> DataFrame:
    """Read shipped JSON-lines log events with per-row corrupt quarantine.

    PERMISSIVE mode keeps malformed lines in ``_corrupt_record`` (one bad
    payload must not kill a 100 TB ingest); the explicit schema skips the
    inference pass that would otherwise read the data twice.

    The parsed batch is cached by default: Spark refuses plans whose pruned
    references are ONLY the corrupt-record column of a raw JSON scan
    (SPARK-26228) — e.g. ``normalize(...).count()`` — and every ingest
    splits the batch into good + quarantine sides anyway, so one cached
    scan serves both instead of re-reading the files. Ingest is per
    micro-batch, so the cached unit is a batch, not the corpus; pass
    ``cache=False`` for a one-shot full-column scan.
    """
    df = (
        spark.read.schema(RAW_LOG_JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.cache() if cache else df


def normalize_log_events(raw: DataFrame) -> DataFrame:
    """raw wire records → canonical ``LOG_SCHEMA`` rows.

    Parity: the ``task (\\d+\\.\\d+)`` / ``stage (\\d+\\.\\d+)`` MDC
    extraction and the ``[Stage $s - Task $t - Thread $th] msg`` prefix of
    ``CollectorAppender.scala:36-45``. Narrow projection — no shuffle.
    """
    ok = raw.filter(F.col("_corrupt_record").isNull())
    # Missing MDC (driver-side logs) → empty parsed ids, never NULL: the
    # appender always emits the prefix, with blanks when ids are unknown.
    mdc = F.coalesce(F.col("taskName"), F.lit(""))
    parsed_task = F.regexp_extract(mdc, TASK_ID_RE, 1)
    parsed_stage = F.regexp_extract(mdc, STAGE_ID_RE, 1)
    return ok.select(
        F.col("appName").alias("app_name"),
        F.col("appId").alias("app_id"),
        F.col("executorId").alias("executor_id"),
        # try_cast: blank parsed id (no MDC) → NULL under ANSI mode.
        F.floor(parsed_task.try_cast("double")).cast("long").alias("task_id"),
        F.col("timeMillis").alias("log_time_ms"),
        "level",
        F.col("taskName").alias("mdc_task_name"),
        parsed_task.alias("parsed_task_id"),
        parsed_stage.alias("parsed_stage_id"),
        F.concat(
            F.lit("[Stage "),
            parsed_stage,
            F.lit(" - Task "),
            parsed_task,
            F.lit("] "),
            F.col("message"),
        ).alias("message"),
        F.lit(False).alias("end_of_batch"),
    )


def corrupt_log_events(raw: DataFrame) -> DataFrame:
    """The quarantine side: raw lines that failed JSON parsing.

    Requires the cached read from :func:`read_log_events` (SPARK-26228
    forbids corrupt-only references against the raw scan).
    """
    return raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )


def write_partitioned_telemetry(
    df: DataFrame, path: str, time_col: str = "metric_time_ms"
) -> None:
    """Write telemetry partitioned by type × UTC day (index-rotation parity).

    The reference routes records by ``metricsType`` into per-type indexes
    (``metrics-pipeline.yaml``) with daily rotation. Partitioned parquet is
    the Spark-native equivalent: `metrics_type=/metric_date=` directories
    give static partition pruning for type- or day-filtered reads.
    """
    out = df.withColumn(
        "metric_date",
        F.to_date(F.timestamp_millis(F.col(time_col).cast("long"))),
    )
    cols = ["metrics_type", "metric_date"] if "metrics_type" in df.columns else ["metric_date"]
    out.write.mode("overwrite").partitionBy(*cols).parquet(path)
