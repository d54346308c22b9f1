"""CSV log ingestion — the second wire transport for LogEvent records.

The reference's collector ships JSON over HTTP, but the analytics surface
only depends on the canonical ``LOG_SCHEMA`` rows; this module proves the
ingest layer is transport-pluggable by accepting the SAME wire fields
(``ObservabilityClient.scala:241-264``: appName/appId/executorId/level/
message/timeMillis/taskName) as headered CSV. Normalization is shared with
the JSON path (``logs_json.normalize_log_events``), so enrichment and MDC
parsing are written once.

Scale posture mirrors the JSON source: explicit schema (no inference
pass), PERMISSIVE per-row corrupt quarantine (a malformed line lands in
``_corrupt_record`` instead of failing a 100 TB ingest), narrow
projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .logs_json import RAW_LOG_JSON_SCHEMA


def read_log_events_csv(
    spark: SparkSession, path: str, cache: bool = True
) -> DataFrame:
    """Read shipped CSV log events with per-row corrupt quarantine.

    The wire schema is shared with the JSON transport
    (:data:`logs_json.RAW_LOG_JSON_SCHEMA`), so the same
    ``normalize_log_events`` / ``corrupt_log_events`` split applies
    downstream. Cached for the same SPARK-26228 reason as the JSON path:
    corrupt-only projections are illegal against the raw scan.
    """
    df = (
        spark.read.schema(RAW_LOG_JSON_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return df.cache() if cache else df
