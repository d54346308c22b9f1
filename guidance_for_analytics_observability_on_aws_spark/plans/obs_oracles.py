"""DuckDB oracle SQL for the observability group (O).

Every statement mirrors its DataFrame builder in
``operators/observability.py`` op-for-op: integer arithmetic, FLOOR of
power-of-two scalings, epoch-ms timestamps, and two-pass skewness, so the
driver's value-hash comparison is exact (no float-summation order issues).
"""

from ..sources.telemetry import ID_COLUMNS, METRIC_COLUMNS, TELEMETRY_CTE

# Shared CTE chain computing the reference's stage-level skewness
# (CustomMetricsListener.scala:146-188 formula).
STAGE_AGG_CTES = f"""
WITH {TELEMETRY_CTE},
stage_stats AS (
  SELECT app_name, app_id, job_id, stage_id,
         COUNT(*) AS n_tasks,
         CAST(SUM(input_bytes_read) AS BIGINT) AS sum_in,
         MAX(input_bytes_read) AS max_input_bytes_read,
         MIN(input_bytes_read) AS min_in,
         CAST(SUM(shuffle_bytes_read) AS BIGINT) AS sum_sh,
         MAX(shuffle_bytes_read) AS max_shuffle_bytes_read,
         MIN(shuffle_bytes_read) AS min_sh,
         MAX(metric_time_ms) AS metric_time_ms
  FROM task_metrics
  GROUP BY 1, 2, 3, 4
),
stage_dist AS (
  SELECT t.app_name, t.app_id, t.job_id, t.stage_id,
         MAX(ABS(t.input_bytes_read - s.sum_in / s.n_tasks)) AS max_in_dist,
         MAX(ABS(t.shuffle_bytes_read - s.sum_sh / s.n_tasks)) AS max_sh_dist,
         MAX(s.n_tasks) AS n_tasks,
         MAX(s.max_input_bytes_read) AS max_input_bytes_read,
         MAX(s.min_in) AS min_in,
         MAX(s.max_shuffle_bytes_read) AS max_shuffle_bytes_read,
         MAX(s.min_sh) AS min_sh,
         MAX(s.metric_time_ms) AS metric_time_ms
  FROM task_metrics t
  JOIN stage_stats s USING (app_name, app_id, job_id, stage_id)
  GROUP BY 1, 2, 3, 4
),
stage_agg AS (
  SELECT app_name, app_id, job_id, stage_id,
         max_in_dist / (CASE WHEN max_input_bytes_read - min_in = 0 THEN 1
                             ELSE max_input_bytes_read - min_in END)
           AS input_bytes_read_skewness,
         max_input_bytes_read,
         max_sh_dist / (CASE WHEN max_shuffle_bytes_read - min_sh = 0 THEN 1
                             ELSE max_shuffle_bytes_read - min_sh END)
           AS shuffle_bytes_read_skewness,
         max_shuffle_bytes_read,
         metric_time_ms, n_tasks
  FROM stage_dist
)
"""

_W_EXEC = "PARTITION BY executor_id ORDER BY metric_time_ms, task_id"

OBS_ORACLES: dict[str, str] = {}

OBS_ORACLES["obs_task_metrics"] = f"""
WITH {TELEMETRY_CTE}
SELECT {", ".join(ID_COLUMNS + METRIC_COLUMNS)} FROM task_metrics
"""

OBS_ORACLES["obs_stage_agg_skewness"] = f"""
{STAGE_AGG_CTES}
SELECT * FROM stage_agg
"""

OBS_ORACLES["obs_skew_distribution"] = f"""
{STAGE_AGG_CTES},
both_metrics AS (
  SELECT 'input' AS metric, input_bytes_read_skewness AS skew, app_id, job_id FROM stage_agg
  UNION ALL
  SELECT 'shuffle' AS metric, shuffle_bytes_read_skewness AS skew, app_id, job_id FROM stage_agg
)
SELECT metric,
       CASE WHEN skew < 0.1 THEN '0.0-0.1'
            WHEN skew < 0.5 THEN '0.1-0.5'
            WHEN skew < 0.8 THEN '0.5-0.8'
            ELSE '0.8-1.0' END AS skew_bucket,
       COUNT(*) AS n_stages,
       COUNT(DISTINCT app_id || '/' || CAST(job_id AS VARCHAR)) AS n_jobs
FROM both_metrics
GROUP BY 1, 2
"""

OBS_ORACLES["obs_app_summary"] = f"""
WITH {TELEMETRY_CTE}
SELECT app_name, app_id,
       COUNT(*) AS n_tasks,
       CAST(SUM(run_time_ms) AS BIGINT) AS total_run_time_ms,
       CAST(SUM(executor_cpu_time_ms) AS BIGINT) AS total_cpu_time_ms,
       CAST(SUM(input_bytes_read) AS BIGINT) AS total_input_bytes,
       CAST(SUM(input_records_read) AS BIGINT) AS total_input_records,
       CAST(SUM(output_bytes_written) AS BIGINT) AS total_output_bytes,
       CAST(SUM(output_records_written) AS BIGINT) AS total_output_records,
       CAST(SUM(shuffle_bytes_read) AS BIGINT) AS total_shuffle_bytes_read,
       CAST(SUM(shuffle_records_read) AS BIGINT) AS total_shuffle_records_read,
       CAST(SUM(shuffle_bytes_written) AS BIGINT) AS total_shuffle_bytes_written,
       CAST(SUM(shuffle_records_written) AS BIGINT) AS total_shuffle_records_written,
       COUNT(DISTINCT job_id) AS n_jobs,
       COUNT(DISTINCT stage_id) AS n_stages,
       COUNT(DISTINCT executor_id) AS n_executors
FROM task_metrics
GROUP BY 1, 2
"""

OBS_ORACLES["obs_cardinality"] = f"""
WITH {TELEMETRY_CTE}
SELECT COUNT(DISTINCT app_name) AS n_apps,
       COUNT(DISTINCT app_id) AS n_runs,
       COUNT(DISTINCT app_id || '/' || CAST(job_id AS VARCHAR)) AS n_jobs,
       COUNT(DISTINCT app_id || '/' || CAST(stage_id AS VARCHAR)) AS n_stages,
       COUNT(DISTINCT executor_id) AS n_executors,
       COUNT(*) AS n_tasks
FROM task_metrics
"""

OBS_ORACLES["obs_date_histogram"] = f"""
WITH {TELEMETRY_CTE}
SELECT metric_time_ms - metric_time_ms % 3600000 AS hour_ms,
       app_name,
       COUNT(*) AS n_tasks,
       CAST(SUM(input_bytes_read) AS BIGINT) AS total_input_bytes,
       CAST(SUM(run_time_ms) AS BIGINT) AS total_run_time_ms,
       COUNT(DISTINCT executor_id) AS n_executors
FROM task_metrics
GROUP BY 1, 2
"""

OBS_ORACLES["obs_top_n_skew"] = f"""
{STAGE_AGG_CTES}
SELECT * FROM stage_agg
ORDER BY input_bytes_read_skewness DESC, app_id, job_id, stage_id
LIMIT 20
"""

OBS_ORACLES["obs_task_percentiles"] = f"""
WITH {TELEMETRY_CTE},
ranked AS (
  SELECT event_type, value, task_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM task_metrics
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_tasks,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.25) AS BIGINT) THEN value END) AS p25,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT) THEN value END) AS p50,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.75) AS BIGINT) THEN value END) AS p75,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT) THEN value END) AS p99
FROM ranked
GROUP BY 1
"""

# The ObservabilityClient state machine, unrolled ONCE for both O9 and O10
# (mirrors operators/observability.py::_client_state — one definition so the
# success-reset / retryable / abort semantics cannot diverge).
_CLIENT_STATE_CTES = f"""
WITH {TELEMETRY_CTE},
ev AS (
  SELECT executor_id, task_id, metric_time_ms,
         event_type = 'error' AS is_fail,
         event_type = 'error' AND task_id % 5 <> 0 AS retryable,
         COALESCE(SUM(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
           OVER ({_W_EXEC} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS run_id
  FROM task_metrics
),
seg AS (
  SELECT *,
         COALESCE(SUM(CASE WHEN is_fail AND NOT retryable THEN 1 ELSE 0 END)
           OVER (PARTITION BY executor_id, run_id
                 ORDER BY metric_time_ms, task_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS nr_before
  FROM ev
),
st AS (
  SELECT *,
         CAST((fail_pos - 1) % 6 + 1 AS BIGINT) AS attempt_no,
         is_fail AND (NOT retryable OR (fail_pos - 1) % 6 + 1 = 6) AS aborted_evt,
         CASE WHEN NOT is_fail
                OR (is_fail AND (NOT retryable OR (fail_pos - 1) % 6 + 1 = 6))
              THEN 0 ELSE 1 END AS state_after
  FROM (
    SELECT *,
           SUM(CASE WHEN is_fail THEN 1 ELSE 0 END)
             OVER (PARTITION BY executor_id, run_id, nr_before
                   ORDER BY metric_time_ms, task_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fail_pos
    FROM seg
  )
)
"""

OBS_ORACLES["obs_batch_flush"] = f"""
{_CLIENT_STATE_CTES},
seq AS (
  SELECT executor_id, task_id,
         ROW_NUMBER() OVER ({_W_EXEC}) AS rn,
         metric_time_ms - LAG(metric_time_ms) OVER ({_W_EXEC}) AS gap_ms_raw,
         COALESCE(LAG(state_after) OVER ({_W_EXEC}), 0) = 1 AS backing_off
  FROM st
),
nbc AS (
  SELECT *,
         COALESCE(SUM(CASE WHEN NOT backing_off THEN 1 ELSE 0 END)
           OVER (PARTITION BY executor_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS nbc_excl
  FROM seq
),
def AS (
  SELECT *,
         MAX(CASE WHEN backing_off AND rn % 100 = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY executor_id, nbc_excl) AS deferred
  FROM nbc
)
SELECT executor_id, task_id,
       CAST(FLOOR((rn - 1) / 100) AS BIGINT) AS batch_seq,
       COALESCE(gap_ms_raw, 0) AS gap_ms,
       COALESCE(gap_ms_raw, 0) >= 10000 AS flushed_by_time,
       backing_off,
       NOT backing_off AND (rn % 100 = 0 OR deferred = 1) AS flushed_by_size
FROM def
"""

OBS_ORACLES["obs_retry_backoff"] = f"""
{_CLIENT_STATE_CTES},
backoffs AS (
  SELECT executor_id, task_id, metric_time_ms, retryable, attempt_no,
         aborted_evt AS aborted,
         CAST(CASE WHEN aborted_evt THEN 0
                   WHEN attempt_no = 1 THEN 10
                   WHEN attempt_no = 2 THEN 20
                   WHEN attempt_no = 3 THEN 40
                   ELSE 60 END AS BIGINT) AS backoff_s
  FROM st WHERE is_fail
)
SELECT executor_id, task_id, retryable, attempt_no, backoff_s,
       CAST(SUM(backoff_s) OVER ({_W_EXEC}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_wait_s,
       retryable AND attempt_no = 6 AS retries_exhausted,
       aborted
FROM backoffs
"""

OBS_ORACLES["obs_log_enrich"] = f"""
WITH {TELEMETRY_CTE},
enriched AS (
  SELECT app_name, app_id, executor_id, task_id,
         task_id % 16 AS thread,
         metric_time_ms AS log_time_ms,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'purchase' THEN 'WARN'
              ELSE 'INFO' END AS level,
         'task ' || CAST(task_id AS VARCHAR) || '.0 in stage '
           || CAST(stage_id AS VARCHAR) || '.0 (TID '
           || CAST(task_id AS VARCHAR) || ')' AS mdc_task_name
  FROM task_metrics
),
parsed AS (
  SELECT *,
         regexp_extract(mdc_task_name, 'task (\\d+\\.\\d+)', 1) AS parsed_task_id,
         regexp_extract(mdc_task_name, 'stage (\\d+\\.\\d+)', 1) AS parsed_stage_id
  FROM enriched
)
SELECT app_name, app_id, executor_id, task_id, thread, log_time_ms, level,
       mdc_task_name, parsed_task_id, parsed_stage_id,
       '[Stage ' || parsed_stage_id || ' - Task ' || parsed_task_id
         || ' - Thread ' || CAST(task_id % 16 AS VARCHAR) || '] level=' || level
         AS message
FROM parsed
"""

OBS_ORACLES["obs_error_rate"] = f"""
WITH {TELEMETRY_CTE}
SELECT metric_time_ms - metric_time_ms % 3600000 AS hour_ms,
       COUNT(*) AS n_logs,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*)
         AS error_ratio
FROM task_metrics
GROUP BY 1
"""

OBS_ORACLES["obs_executor_utilization"] = f"""
WITH {TELEMETRY_CTE},
agg AS (
  SELECT executor_id,
         COUNT(*) AS n_tasks,
         CAST(SUM(run_time_ms) AS BIGINT) AS total_run_time_ms,
         CAST(SUM(executor_cpu_time_ms) AS BIGINT) AS total_cpu_time_ms,
         MIN(metric_time_ms) AS first_ms,
         MAX(metric_time_ms) AS last_ms,
         MAX(peak_execution_memory) AS max_peak_memory
  FROM task_metrics
  GROUP BY 1
)
SELECT *,
       last_ms - first_ms AS span_ms,
       CASE WHEN last_ms - first_ms = 0 THEN 0.0
            ELSE total_run_time_ms / (last_ms - first_ms) END AS run_time_density
FROM agg
"""

OBS_ORACLES["obs_session_windows"] = f"""
WITH {TELEMETRY_CTE},
flagged AS (
  SELECT executor_id, task_id, metric_time_ms,
         CASE WHEN LAG(metric_time_ms) OVER ({_W_EXEC}) IS NULL
                OR metric_time_ms - LAG(metric_time_ms) OVER ({_W_EXEC}) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM task_metrics
),
sessioned AS (
  SELECT *,
         CAST(SUM(new_session) OVER ({_W_EXEC}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT executor_id, session_idx,
       MIN(metric_time_ms) AS session_start_ms,
       MAX(metric_time_ms) AS session_end_ms,
       COUNT(*) AS n_events,
       MAX(metric_time_ms) - MIN(metric_time_ms) AS duration_ms
FROM sessioned
GROUP BY 1, 2
"""

OBS_ORACLES["stream_metrics_window"] = f"""
WITH {TELEMETRY_CTE}
SELECT metric_time_ms - metric_time_ms % 300000 AS window_start_ms,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(input_bytes_read) AS BIGINT) AS sum_input_bytes,
       COUNT(DISTINCT executor_id) AS n_executors
FROM task_metrics
GROUP BY 1, 2
"""

OBS_ORACLES["obs_log_search"] = f"""
WITH {TELEMETRY_CTE},
enriched AS (
  SELECT app_id, executor_id, metric_time_ms AS log_time_ms,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'purchase' THEN 'WARN'
              ELSE 'INFO' END AS level,
         'task ' || CAST(task_id AS VARCHAR) || '.0 in stage '
           || CAST(stage_id AS VARCHAR) || '.0 (TID '
           || CAST(task_id AS VARCHAR) || ')' AS mdc_task_name,
         task_id
  FROM task_metrics
),
msgs AS (
  SELECT app_id, executor_id, log_time_ms, level,
         '[Stage ' || regexp_extract(mdc_task_name, 'stage (\\d+\\.\\d+)', 1)
           || ' - Task ' || regexp_extract(mdc_task_name, 'task (\\d+\\.\\d+)', 1)
           || ' - Thread ' || CAST(task_id % 16 AS VARCHAR) || '] level=' || level
           AS message
  FROM enriched
)
SELECT app_id,
       COUNT(*) AS n_hits,
       COUNT(DISTINCT executor_id) AS n_executors,
       MIN(log_time_ms) AS first_hit_ms,
       MAX(log_time_ms) AS last_hit_ms
FROM msgs
WHERE level = 'ERROR' AND message LIKE '%stage 1%'
GROUP BY 1
"""

OBS_ORACLES["obs_skew_timeline"] = f"""
{STAGE_AGG_CTES}
SELECT app_id,
       metric_time_ms - metric_time_ms % 3600000 AS hour_ms,
       MAX(input_bytes_read_skewness) AS max_input_skewness,
       MAX(shuffle_bytes_read_skewness) AS max_shuffle_skewness,
       COUNT(*) AS n_stages,
       CAST(SUM(n_tasks) AS BIGINT) AS n_tasks
FROM stage_agg
GROUP BY 1, 2
"""

OBS_ORACLES["obs_counter_rate"] = f"""
WITH {TELEMETRY_CTE},
d AS (
  SELECT executor_id, task_id, metric_time_ms, input_bytes_read,
         input_bytes_read - LAG(input_bytes_read) OVER ({_W_EXEC}) AS delta_bytes,
         metric_time_ms - LAG(metric_time_ms) OVER ({_W_EXEC}) AS delta_ms
  FROM task_metrics
)
SELECT executor_id, task_id, metric_time_ms, delta_ms,
       CAST((CASE WHEN delta_bytes >= 0 THEN delta_bytes
                  ELSE input_bytes_read END) * 1000 AS BIGINT) / delta_ms
         AS rate_bytes_per_s
FROM d WHERE delta_ms > 0
"""

OBS_ORACLES["obs_gap_fill"] = f"""
WITH {TELEMETRY_CTE},
observed AS (
  SELECT executor_id, metric_time_ms // 60000 AS minute,
         MAX(input_bytes_read) AS minute_bytes
  FROM task_metrics GROUP BY 1, 2
),
span AS (
  SELECT executor_id, MIN(minute) AS min_minute, MAX(minute) AS max_minute
  FROM observed GROUP BY 1
),
grid AS (
  SELECT executor_id, unnest(generate_series(min_minute, max_minute)) AS minute
  FROM span
),
filled AS (
  SELECT g.executor_id, g.minute,
         o.minute_bytes IS NOT NULL AS is_observed,
         LAST_VALUE(o.minute_bytes IGNORE NULLS) OVER (
           PARTITION BY g.executor_id ORDER BY g.minute
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_bytes
  FROM grid g
  LEFT JOIN observed o ON o.executor_id = g.executor_id AND o.minute = g.minute
)
SELECT executor_id, minute // 60 AS hour,
       COUNT(*) AS n_minutes,
       CAST(SUM(CASE WHEN is_observed THEN 1 ELSE 0 END) AS BIGINT) AS n_observed,
       CAST(SUM(filled_bytes) AS BIGINT) AS sum_filled_bytes
FROM filled GROUP BY 1, 2
"""

OBS_ORACLES["obs_anomaly_zscore"] = f"""
WITH {TELEMETRY_CTE},
d AS (
  SELECT executor_id, task_id, metric_time_ms, input_bytes_read AS x,
         COUNT(*) OVER w AS n,
         CAST(SUM(input_bytes_read) OVER w AS BIGINT) AS s,
         CAST(SUM(input_bytes_read * input_bytes_read) OVER w AS BIGINT) AS ssq
  FROM task_metrics
  WINDOW w AS ({_W_EXEC} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT executor_id, task_id, metric_time_ms, x,
       (n * x - s) * (n * x - s) * (n - 1) AS score_num,
       9 * n * (n * ssq - s * s) AS score_den
FROM d
WHERE n = 20
  AND (n * x - s) * (n * x - s) * (n - 1) > 9 * n * (n * ssq - s * s)
"""

OBS_ORACLES["obs_log_templates"] = f"""
WITH {TELEMETRY_CTE},
enriched AS (
  SELECT app_id, executor_id, metric_time_ms AS log_time_ms, task_id,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'purchase' THEN 'WARN'
              ELSE 'INFO' END AS level,
         'task ' || CAST(task_id AS VARCHAR) || '.0 in stage '
           || CAST(stage_id AS VARCHAR) || '.0 (TID '
           || CAST(task_id AS VARCHAR) || ')' AS mdc_task_name
  FROM task_metrics
),
msgs AS (
  SELECT app_id, executor_id, log_time_ms, level,
         '[Stage ' || regexp_extract(mdc_task_name, 'stage (\\d+\\.\\d+)', 1)
           || ' - Task ' || regexp_extract(mdc_task_name, 'task (\\d+\\.\\d+)', 1)
           || ' - Thread ' || CAST(task_id % 16 AS VARCHAR) || '] level=' || level
           AS message
  FROM enriched
)
SELECT regexp_replace(message, '\\d+', '#', 'g') AS template, level,
       COUNT(*) AS n_logs,
       COUNT(DISTINCT executor_id) AS n_executors,
       COUNT(DISTINCT app_id) AS n_apps,
       MIN(log_time_ms) AS first_seen_ms,
       MAX(log_time_ms) AS last_seen_ms
FROM msgs GROUP BY 1, 2
"""

from ..functions.hashing import md5_int_sql as _mi  # noqa: E402
from ..operators.observability import CMS_DEPTH, CMS_WIDTH  # noqa: E402

_CMS_EVENT_ROWS = "\n  UNION ALL\n".join(
    "  SELECT executor_id AS key, CAST({i} AS BIGINT) AS row_id, "
    "{h} % {w} AS bucket FROM task_metrics".format(
        i=i, w=CMS_WIDTH, h=_mi("'cms{}:' || executor_id".format(i), 8)
    )
    for i in range(CMS_DEPTH)
)
_CMS_KEY_ROWS = "\n  UNION ALL\n".join(
    "  SELECT key, exact_n, CAST({i} AS BIGINT) AS row_id, "
    "{h} % {w} AS bucket FROM keys".format(
        i=i, w=CMS_WIDTH, h=_mi("'cms{}:' || key".format(i), 8)
    )
    for i in range(CMS_DEPTH)
)

OBS_ORACLES["obs_heavy_hitters_cms"] = f"""
WITH {TELEMETRY_CTE},
rows_ AS (
{_CMS_EVENT_ROWS}
),
sketch AS (
  SELECT row_id, bucket, COUNT(*) AS c FROM rows_ GROUP BY 1, 2
),
keys AS (
  SELECT executor_id AS key, COUNT(*) AS exact_n FROM task_metrics GROUP BY 1
),
key_buckets AS (
{_CMS_KEY_ROWS}
),
est AS (
  SELECT kb.key, kb.exact_n, MIN(s.c) AS est_n
  FROM key_buckets kb JOIN sketch s USING (row_id, bucket)
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY est_n DESC, key) AS BIGINT) AS rank
  FROM est
)
SELECT rank, key, est_n, exact_n FROM ranked WHERE rank <= 20
"""

from ..operators.observability import ALERT_RULES  # noqa: E402

OBS_ORACLES["obs_error_rate_moving_avg"] = f"""
WITH {TELEMETRY_CTE},
hourly AS (
  SELECT metric_time_ms - metric_time_ms % 3600000 AS hour_ms,
         COUNT(*) AS n_logs,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*)
           AS error_ratio
  FROM task_metrics
  GROUP BY 1
)
SELECT hour_ms, n_logs, n_errors, error_ratio,
       CAST(SUM(n_errors) OVER w AS BIGINT) AS window_errors,
       CAST(SUM(n_logs) OVER w AS BIGINT) AS window_logs,
       CAST(SUM(n_errors) OVER w AS BIGINT) / CAST(SUM(n_logs) OVER w AS BIGINT)
         AS ma_error_ratio
FROM hourly
WINDOW w AS (ORDER BY hour_ms RANGE BETWEEN 10800000 PRECEDING AND 10800000 FOLLOWING)
"""

_RULES_VALUES = ",\n         ".join(
    f"({rid}, '{metric}', {thr})" for rid, metric, thr in ALERT_RULES
)

OBS_ORACLES["obs_alert_rules"] = f"""
WITH {TELEMETRY_CTE},
rules(rule_id, metric, threshold) AS (
  VALUES {_RULES_VALUES}
),
checked AS (
  SELECT r.rule_id, r.metric, CAST(r.threshold AS BIGINT) AS threshold,
         t.app_id, t.executor_id,
         CASE r.metric
           WHEN 'input_bytes_read' THEN t.input_bytes_read
           WHEN 'run_time_ms' THEN t.run_time_ms
           WHEN 'shuffle_bytes_read' THEN t.shuffle_bytes_read
           ELSE t.peak_execution_memory
         END AS value
  FROM task_metrics t CROSS JOIN rules r
)
SELECT CAST(rule_id AS BIGINT) AS rule_id, metric, threshold,
       COUNT(*) AS n_violations,
       COUNT(DISTINCT app_id) AS n_apps,
       COUNT(DISTINCT executor_id) AS n_executors,
       MAX(value) AS max_value
FROM checked
WHERE value > threshold
GROUP BY 1, 2, 3
"""

OBS_ORACLES["obs_props_variant_stats"] = """
WITH per AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       COUNT(DISTINCT k) AS n_distinct_k
FROM per GROUP BY 1
"""

OBS_ORACLES["obs_downsample_rollup"] = f"""
WITH {TELEMETRY_CTE},
minutes AS (
  SELECT app_id,
         metric_time_ms - metric_time_ms % 60000 AS minute_ms,
         COUNT(*) AS n_tasks,
         CAST(SUM(input_bytes_read) AS BIGINT) AS sum_input_bytes,
         MAX(run_time_ms) AS max_run_time_ms
  FROM task_metrics
  GROUP BY 1, 2
)
SELECT app_id,
       minute_ms - minute_ms % 3600000 AS hour_ms,
       COUNT(*) AS n_minutes,
       CAST(SUM(n_tasks) AS BIGINT) AS n_tasks,
       CAST(SUM(sum_input_bytes) AS BIGINT) AS sum_input_bytes,
       MAX(max_run_time_ms) AS max_run_time_ms
FROM minutes
GROUP BY 1, 2
"""

OBS_ORACLES["obs_slo_burn_rate"] = f"""
WITH {TELEMETRY_CTE},
hours AS (
  SELECT app_id,
         metric_time_ms - metric_time_ms % 3600000 AS hour_ms,
         COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM task_metrics
  GROUP BY 1, 2
),
with6 AS (
  SELECT app_id, hour_ms, n_total, n_err,
         CAST(SUM(n_total) OVER (PARTITION BY app_id ORDER BY hour_ms
              RANGE BETWEEN 18000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS total_6h,
         CAST(SUM(n_err) OVER (PARTITION BY app_id ORDER BY hour_ms
              RANGE BETWEEN 18000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS err_6h
  FROM hours
)
SELECT app_id, hour_ms, n_total, n_err,
       n_err * 100 / n_total AS burn_1h,
       err_6h * 100 / total_6h AS burn_6h,
       (n_err * 1000 >= n_total * 144) AND (err_6h * 1000 >= total_6h * 60) AS page
FROM with6
"""

OBS_ORACLES["obs_value_histogram"] = f"""
WITH {TELEMETRY_CTE},
binned AS (
  SELECT metrics_type,
         LEAST(CAST(FLOOR(run_time_ms / 100) AS BIGINT), 15) AS bin,
         COUNT(*) AS n_tasks
  FROM task_metrics
  GROUP BY 1, 2
)
SELECT metrics_type, bin,
       bin * 100 AS bin_lo,
       n_tasks,
       n_tasks * 100 / CAST(SUM(n_tasks) OVER (PARTITION BY metrics_type) AS BIGINT) AS pct
FROM binned
"""

# O41's oracle states the NAIVE inequality range join — identical result
# set to the bucketed-equi-join Spark plan, intentionally different
# (non-scalable) physical strategy.
OBS_ORACLES["obs_metric_log_correlate"] = f"""
WITH {TELEMETRY_CTE},
errors AS (
  SELECT executor_id, task_id AS err_task_id, metric_time_ms AS err_ms
  FROM task_metrics WHERE metrics_type = 'logs'
),
metrics AS (
  SELECT executor_id AS m_executor_id, metric_time_ms AS m_ms, input_bytes_read
  FROM task_metrics WHERE metrics_type = 'taskMetrics'
)
SELECT e.executor_id, e.err_task_id, e.err_ms,
       COUNT(m.m_ms) AS n_metrics_60s,
       CAST(COALESCE(SUM(m.input_bytes_read), 0) AS BIGINT) AS bytes_60s
FROM errors e
LEFT JOIN metrics m
  ON e.executor_id = m.m_executor_id
 AND m.m_ms >= e.err_ms - 60000
 AND m.m_ms <= e.err_ms
GROUP BY 1, 2, 3
"""

OBS_ORACLES["obs_input_bytes_percentiles"] = f"""
WITH {TELEMETRY_CTE},
ranked AS (
  SELECT app_id, input_bytes_read, task_id,
         ROW_NUMBER() OVER (PARTITION BY app_id ORDER BY input_bytes_read, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY app_id) AS n
  FROM task_metrics
)
SELECT app_id,
       CAST(MAX(n) AS BIGINT) AS n_tasks,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.25) AS BIGINT) THEN input_bytes_read END) AS p25,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT) THEN input_bytes_read END) AS p50,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.75) AS BIGINT) THEN input_bytes_read END) AS p75,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT) THEN input_bytes_read END) AS p99
FROM ranked
GROUP BY 1
"""

OBS_ORACLES["obs_skew_exemplars"] = f"""
{STAGE_AGG_CTES},
top AS (
  SELECT app_name, app_id, job_id, stage_id, input_bytes_read_skewness
  FROM stage_agg
  ORDER BY input_bytes_read_skewness DESC, app_id, job_id, stage_id
  LIMIT 5
),
tasks AS (
  SELECT t.app_name, t.app_id, t.job_id, t.stage_id,
         p.input_bytes_read_skewness, t.task_id, t.input_bytes_read, t.run_time_ms,
         ROW_NUMBER() OVER (PARTITION BY t.app_name, t.app_id, t.job_id, t.stage_id
                            ORDER BY t.input_bytes_read DESC, t.task_id) AS task_rank,
         CAST(SUM(t.input_bytes_read) OVER (PARTITION BY t.app_name, t.app_id,
              t.job_id, t.stage_id) AS BIGINT) AS stage_input_bytes
  FROM task_metrics t
  JOIN top p USING (app_name, app_id, job_id, stage_id)
)
SELECT app_name, app_id, job_id, stage_id, input_bytes_read_skewness,
       CAST(task_rank AS BIGINT) AS task_rank, task_id, input_bytes_read,
       run_time_ms,
       input_bytes_read / stage_input_bytes AS task_input_share
FROM tasks WHERE task_rank <= 3
"""

OBS_ORACLES["obs_executor_concurrency"] = f"""
WITH {TELEMETRY_CTE},
ev AS (
  SELECT executor_id, metric_time_ms - run_time_ms AS t_ms, 1 AS delta
  FROM task_metrics
  UNION ALL
  SELECT executor_id, metric_time_ms AS t_ms, -1 AS delta
  FROM task_metrics
),
swept AS (
  SELECT executor_id, t_ms,
         CAST(SUM(delta) OVER (PARTITION BY executor_id ORDER BY t_ms, delta
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS level
  FROM ev
),
peaked AS (
  SELECT *, MAX(level) OVER (PARTITION BY executor_id) AS peak FROM swept
)
SELECT executor_id,
       CAST(MAX(level) AS BIGINT) AS peak_concurrency,
       MIN(CASE WHEN level = peak THEN t_ms END) AS peak_at_ms,
       COUNT(*) AS n_boundary_events
FROM peaked GROUP BY 1
"""

OBS_ORACLES["obs_alert_debounce"] = f"""
WITH {TELEMETRY_CTE},
buckets AS (
  SELECT executor_id,
         metric_time_ms // 60000 AS bucket,
         COUNT(*) AS n_errors
  FROM task_metrics
  WHERE metrics_type = 'logs' AND event_type = 'error'
  GROUP BY 1, 2
),
islands AS (
  SELECT *,
         bucket - ROW_NUMBER() OVER (PARTITION BY executor_id ORDER BY bucket)
           AS island
  FROM buckets
)
SELECT executor_id,
       MIN(bucket) * 60000 AS island_start_ms,
       MAX(bucket) * 60000 AS island_end_ms,
       COUNT(*) AS n_buckets,
       CAST(SUM(n_errors) AS BIGINT) AS total_errors,
       COUNT(*) >= 3 AS fired
FROM islands
GROUP BY executor_id, island
"""

OBS_ORACLES["obs_straggler_detect"] = f"""
WITH {TELEMETRY_CTE},
ranked AS (
  SELECT app_name, app_id, job_id, stage_id, task_id, run_time_ms,
         ROW_NUMBER() OVER (PARTITION BY app_name, app_id, job_id, stage_id
                            ORDER BY run_time_ms, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY app_name, app_id, job_id, stage_id) AS n
  FROM task_metrics
),
stats AS (
  SELECT app_name, app_id, job_id, stage_id,
         MAX(n) AS n_tasks,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN run_time_ms END)
            + SUM(CASE WHEN rn = n // 2 + 1 THEN run_time_ms END)
            AS BIGINT) AS median_x2
  FROM ranked
  GROUP BY 1, 2, 3, 4
)
SELECT t.app_name, t.app_id, t.job_id, t.stage_id, t.task_id, t.executor_id,
       t.run_time_ms, s.n_tasks, s.median_x2,
       (t.run_time_ms * 2) / s.median_x2 AS ratio
FROM task_metrics t
JOIN stats s USING (app_name, app_id, job_id, stage_id)
WHERE t.run_time_ms >= 100 AND t.run_time_ms * 4 > s.median_x2 * 3
"""

OBS_ORACLES["obs_log_sample"] = f"""
WITH {TELEMETRY_CTE},
keyed AS (
  SELECT executor_id,
         metric_time_ms // 60000 * 60000 AS minute_ms,
         task_id, app_id, metric_time_ms,
         md5(app_id || '-' || CAST(task_id AS VARCHAR)) AS sample_key
  FROM task_metrics
  WHERE metrics_type = 'logs'
),
sampled AS (
  SELECT *,
         COUNT(*) OVER (PARTITION BY executor_id, minute_ms) AS n_logs,
         ROW_NUMBER() OVER (PARTITION BY executor_id, minute_ms
                            ORDER BY sample_key, task_id, metric_time_ms)
           AS sample_rank
  FROM keyed
)
SELECT executor_id, minute_ms, task_id, app_id, metric_time_ms,
       CAST(sample_rank AS BIGINT) AS sample_rank,
       CAST(n_logs AS BIGINT) AS n_logs
FROM sampled
WHERE sample_rank <= 5
"""

OBS_ORACLES["obs_latency_heatmap"] = f"""
WITH {TELEMETRY_CTE},
cells AS (
  SELECT metric_time_ms // 3600000 * 3600000 AS hour_ms,
         LEAST(run_time_ms // 500, 19) AS bucket_id,
         COUNT(*) AS n_tasks
  FROM task_metrics
  GROUP BY 1, 2
)
SELECT hour_ms, bucket_id,
       bucket_id * 500 AS bucket_lo_ms,
       CASE WHEN bucket_id = 19 THEN NULL ELSE (bucket_id + 1) * 500 END
         AS bucket_hi_ms,
       CAST(n_tasks AS BIGINT) AS n_tasks,
       n_tasks / SUM(n_tasks) OVER (PARTITION BY hour_ms) AS share_of_hour
FROM cells
"""

OBS_ORACLES["obs_job_critical_stage"] = f"""
WITH {TELEMETRY_CTE},
per_stage AS (
  SELECT app_id, job_id, stage_id,
         CAST(SUM(run_time_ms) AS BIGINT) AS stage_time_ms,
         COUNT(*) AS n_tasks
  FROM task_metrics
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *,
         CAST(SUM(stage_time_ms) OVER (PARTITION BY app_id, job_id) AS BIGINT)
           AS job_time_ms,
         COUNT(*) OVER (PARTITION BY app_id, job_id) AS n_stages,
         ROW_NUMBER() OVER (PARTITION BY app_id, job_id
                            ORDER BY stage_time_ms DESC, stage_id) AS rn
  FROM per_stage
)
SELECT app_id, job_id, n_stages, job_time_ms,
       stage_id AS critical_stage_id,
       stage_time_ms AS critical_stage_time_ms,
       n_tasks AS critical_stage_n_tasks,
       stage_time_ms / CAST(job_time_ms AS DOUBLE) AS critical_share
FROM ranked WHERE rn = 1
"""

OBS_ORACLES["obs_percentile_timeline"] = f"""
WITH {TELEMETRY_CTE},
ranked AS (
  SELECT metric_time_ms // 3600000 * 3600000 AS hour_ms,
         run_time_ms, task_id,
         ROW_NUMBER() OVER (PARTITION BY metric_time_ms // 3600000 * 3600000
                            ORDER BY run_time_ms, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY metric_time_ms // 3600000 * 3600000) AS n
  FROM task_metrics
)
SELECT hour_ms,
       CAST(MAX(n) AS BIGINT) AS n_tasks,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.25) AS BIGINT) THEN run_time_ms END) AS p25,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT) THEN run_time_ms END) AS p50,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.75) AS BIGINT) THEN run_time_ms END) AS p75,
       MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT) THEN run_time_ms END) AS p99
FROM ranked
GROUP BY 1
"""

OBS_ORACLES["obs_apdex"] = f"""
WITH {TELEMETRY_CTE},
agg AS (
  SELECT app_id,
         COUNT(*) AS n_tasks,
         CAST(SUM(CASE WHEN run_time_ms <= 500 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_satisfied,
         CAST(SUM(CASE WHEN run_time_ms > 500 AND run_time_ms <= 2000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating,
         CAST(SUM(CASE WHEN run_time_ms > 2000 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_frustrated
  FROM task_metrics
  GROUP BY 1
)
SELECT app_id, n_tasks, n_satisfied, n_tolerating, n_frustrated,
       (n_satisfied * 2 + n_tolerating) / CAST(n_tasks * 2 AS DOUBLE) AS apdex
FROM agg
"""

OBS_ORACLES["obs_seasonal_baseline"] = f"""
WITH {TELEMETRY_CTE},
base AS (
  SELECT executor_id,
         metric_time_ms // 86400000 AS day,
         metric_time_ms // 3600000 % 24 AS hour_of_day,
         run_time_ms
  FROM task_metrics
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM base),
cut AS (SELECT b.*, s.d0 + (s.d1 - s.d0) * 7 // 10 AS cutoff FROM base b, span s),
baseline AS (
  SELECT executor_id, hour_of_day,
         COUNT(*) AS base_n,
         CAST(SUM(run_time_ms) AS BIGINT) AS base_sum
  FROM cut WHERE day <= cutoff
  GROUP BY 1, 2
),
current AS (
  SELECT executor_id, day, hour_of_day,
         COUNT(*) AS cur_n,
         CAST(SUM(run_time_ms) AS BIGINT) AS cur_sum
  FROM cut WHERE day > cutoff
  GROUP BY 1, 2, 3
)
SELECT c.executor_id, c.day, c.hour_of_day, c.cur_n, c.cur_sum,
       b.base_n, b.base_sum,
       (c.cur_sum * b.base_n) / CAST(b.base_sum * c.cur_n AS DOUBLE)
         AS ratio_vs_baseline,
       c.cur_sum * b.base_n > b.base_sum * c.cur_n * 2 AS flagged
FROM current c
JOIN baseline b USING (executor_id, hour_of_day)
"""

OBS_ORACLES["obs_top_movers"] = f"""
WITH {TELEMETRY_CTE},
span AS (SELECT MIN(metric_time_ms) AS t0, MAX(metric_time_ms) AS t1
         FROM task_metrics),
halved AS (
  SELECT m.*, m.metric_time_ms * 2 > s.t0 + s.t1 AS second_half
  FROM task_metrics m, span s
),
agg AS (
  SELECT executor_id,
         CAST(SUM(CASE WHEN NOT second_half THEN run_time_ms ELSE 0 END)
              AS BIGINT) AS first_half_ms,
         CAST(SUM(CASE WHEN second_half THEN run_time_ms ELSE 0 END)
              AS BIGINT) AS second_half_ms,
         COUNT(*) AS n_tasks
  FROM halved GROUP BY 1
),
ranked AS (
  SELECT *,
         second_half_ms - first_half_ms AS delta_ms,
         CAST(ROW_NUMBER() OVER (ORDER BY ABS(second_half_ms - first_half_ms)
              DESC, executor_id) AS BIGINT) AS rank
  FROM agg
)
SELECT rank, executor_id, n_tasks, first_half_ms, second_half_ms, delta_ms,
       delta_ms / CAST(first_half_ms AS DOUBLE) AS pct_change
FROM ranked WHERE rank <= 10
"""

# O58: median + MAD robust outliers — both medians the shared lower-order-
# statistic convention; the outlier verdict is the cross-multiplied BIGINT
# inequality |x−med|·10000 > 44478·MAD (3·1.4826 held as an exact rational).
OBS_ORACLES["obs_anomaly_mad"] = f"""
WITH {TELEMETRY_CTE},
base AS (
  SELECT event_type, task_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM task_metrics
),
r1 AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
),
med AS (
  SELECT event_type,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)
                  THEN v END) AS med_cents
  FROM r1 GROUP BY 1
),
dev AS (
  SELECT b.event_type, b.task_id, b.v, m.med_cents,
         ABS(b.v - m.med_cents) AS abs_dev
  FROM base b JOIN med m USING (event_type)
),
r2 AS (
  SELECT event_type, abs_dev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY abs_dev, task_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)
                  THEN abs_dev END) AS mad_cents
  FROM r2 GROUP BY 1
),
final AS (
  SELECT d.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_tasks,
         MAX(d.med_cents) AS med_cents,
         MAX(m.mad_cents) AS mad_cents,
         CAST(SUM(CASE WHEN d.abs_dev * 10000 > 44478 * m.mad_cents
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM dev d JOIN mad m USING (event_type)
  GROUP BY 1
)
SELECT event_type, n_tasks, med_cents, mad_cents, n_outliers,
       n_outliers / CAST(n_tasks AS BIGINT) AS outlier_share
FROM final
"""

# O59: CUSUM drift localization — cross-multiplied integer cumulative
# deviations, extremes re-located via join-back (arg_max tie-breaks are
# engine-arbitrary; MIN(time) at the exact extreme is not).
OBS_ORACLES["obs_cusum_drift"] = f"""
WITH {TELEMETRY_CTE},
base AS (
  SELECT event_type, task_id, metric_time_ms,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM task_metrics
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(x) AS BIGINT) AS sum_x
  FROM base GROUP BY 1
),
cum AS (
  SELECT b.event_type, b.metric_time_ms, t.n_events,
         CAST(SUM(t.n_events * b.x - t.sum_x) OVER (
           PARTITION BY b.event_type
           ORDER BY b.metric_time_ms, b.task_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS s
  FROM base b JOIN tot t USING (event_type)
),
extremes AS (
  SELECT event_type, MAX(n_events) AS n_events,
         MAX(s) AS cum_peak, MIN(s) AS cum_trough
  FROM cum GROUP BY 1
),
peak_t AS (
  SELECT c.event_type, MIN(c.metric_time_ms) AS peak_time_ms
  FROM cum c JOIN extremes e
    ON c.event_type = e.event_type AND c.s = e.cum_peak
  GROUP BY 1
),
trough_t AS (
  SELECT c.event_type, MIN(c.metric_time_ms) AS trough_time_ms
  FROM cum c JOIN extremes e
    ON c.event_type = e.event_type AND c.s = e.cum_trough
  GROUP BY 1
)
SELECT e.event_type, e.n_events, e.cum_peak, e.cum_trough,
       p.peak_time_ms, tr.trough_time_ms,
       GREATEST(e.cum_peak, -e.cum_trough)
         / (e.n_events * e.n_events) AS drift_score
FROM extremes e
JOIN peak_t p USING (event_type)
JOIN trough_t tr USING (event_type)
"""

# O60: tail-based sampling policy — shared O8 p99 convention for the tail
# threshold, md5-derived deterministic 1% baseline coin, priority-
# partitioned keep reasons (error > tail > baseline).
from ..functions.hashing import md5_int_sql as _md5_int_sql  # noqa: E402

OBS_ORACLES["obs_tail_sampling"] = f"""
WITH {TELEMETRY_CTE},
ranked AS (
  SELECT event_type, value, task_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM task_metrics
),
p99 AS (
  SELECT event_type,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT)
                  THEN value END) AS p99_value
  FROM ranked GROUP BY 1
),
classified AS (
  SELECT t.event_type, t.value, p.p99_value,
         CASE WHEN t.metrics_type = 'logs' THEN 'error'
              WHEN t.value >= p.p99_value THEN 'tail'
              WHEN {_md5_int_sql("CAST(t.task_id AS VARCHAR)", 7)} % 100 = 0
                THEN 'baseline'
              ELSE 'drop' END AS reason
  FROM task_metrics t JOIN p99 p USING (event_type)
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN reason = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_error_kept,
         CAST(SUM(CASE WHEN reason = 'tail' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tail_kept,
         CAST(SUM(CASE WHEN reason = 'baseline' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_baseline_kept,
         MAX(p99_value) AS p99_value
  FROM classified GROUP BY 1
)
SELECT event_type, n_total, n_error_kept, n_tail_kept, n_baseline_kept,
       n_error_kept + n_tail_kept + n_baseline_kept AS n_kept,
       p99_value,
       (n_error_kept + n_tail_kept + n_baseline_kept)
         / CAST(n_total AS BIGINT) AS kept_share
FROM agg
"""

# O63: least-squares trend — exact integer sufficient statistics (HUGEINT
# sums mirror Spark's DECIMAL(38,0)), closed forms in DOUBLE with the
# identical expression tree (IEEE-deterministic; NULLIF mirrors
# try_divide's zero-divisor NULL).
OBS_ORACLES["obs_trend_regression"] = f"""
WITH {TELEMETRY_CTE},
base AS (
  SELECT event_type, metric_time_ms,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM task_metrics
),
t0 AS (
  SELECT event_type, MIN(metric_time_ms) AS t0_ms FROM base GROUP BY 1
),
wt AS (
  SELECT b.event_type, b.x, ((b.metric_time_ms - t.t0_ms) // 1000) AS t,
         t.t0_ms
  FROM base b JOIN t0 t USING (event_type)
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(t AS HUGEINT)) AS st,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(t AS HUGEINT) * x) AS stx,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         MAX(t0_ms) AS t0_ms
  FROM wt GROUP BY 1
),
d AS (
  SELECT event_type, n, t0_ms,
         CAST(n AS DOUBLE) AS nd, CAST(st AS DOUBLE) AS std,
         CAST(sx AS DOUBLE) AS sxd, CAST(stx AS DOUBLE) AS stxd,
         CAST(stt AS DOUBLE) AS sttd, CAST(sxx AS DOUBLE) AS sxxd
  FROM stats
)
SELECT event_type,
       n AS n_events,
       t0_ms,
       (nd * stxd - std * sxd) / NULLIF(nd * sttd - std * std, 0)
         AS slope_cents_per_s,
       (sxd - ((nd * stxd - std * sxd) / NULLIF(nd * sttd - std * std, 0))
              * std) / NULLIF(nd, 0) AS intercept_cents,
       ((nd * stxd - std * sxd) * (nd * stxd - std * sxd))
         / NULLIF((nd * sttd - std * std) * (nd * sxxd - sxd * sxd), 0)
         AS r2
FROM d
"""

# O64: pairwise Pearson over common hourly buckets — HUGEINT per-row
# products (two ~1e11-cent hour sums multiply past BIGINT), DOUBLE
# closed form with IEEE-correctly-rounded sqrt.
OBS_ORACLES["obs_metric_correlation"] = f"""
WITH {TELEMETRY_CTE},
buckets AS (
  SELECT (metric_time_ms // 3600000) * 3600000 AS hour_ms, event_type,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM task_metrics GROUP BY 1, 2
),
joined AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.v AS va, b.v AS vb
  FROM buckets a JOIN buckets b USING (hour_ms)
  WHERE a.event_type < b.event_type
),
stats AS (
  SELECT type_a, type_b,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         SUM(CAST(va AS HUGEINT)) AS sa,
         SUM(CAST(vb AS HUGEINT)) AS sb,
         SUM(CAST(va AS HUGEINT) * vb) AS sab,
         SUM(CAST(va AS HUGEINT) * va) AS saa,
         SUM(CAST(vb AS HUGEINT) * vb) AS sbb
  FROM joined GROUP BY 1, 2
),
d AS (
  SELECT type_a, type_b, n_hours,
         CAST(n_hours AS DOUBLE) AS nd, CAST(sa AS DOUBLE) AS sad,
         CAST(sb AS DOUBLE) AS sbd, CAST(sab AS DOUBLE) AS sabd,
         CAST(saa AS DOUBLE) AS saad, CAST(sbb AS DOUBLE) AS sbbd
  FROM stats
)
SELECT type_a, type_b, n_hours,
       (nd * sabd - sad * sbd)
         / NULLIF(SQRT((nd * saad - sad * sad) * (nd * sbbd - sbd * sbd)), 0)
         AS pearson_r
FROM d
ORDER BY type_a, type_b
"""


# O67: dyadic truncated EWMA — lag chain and integer weight sums generated
# from the same power-of-two schedule as the builder.
def _ewma_oracle() -> str:
    lag_defs = ",\n         ".join(
        f"LAG(run_ms_sum, {i}) OVER (PARTITION BY app_name ORDER BY minute_ms)"
        f" AS l{i}"
        for i in range(1, 9)
    )
    num = " + ".join(
        ["run_ms_sum * 128"]
        + [f"COALESCE(l{i} * {1 << (7 - i)}, 0)" for i in range(1, 8)]
    )
    den = " + ".join(
        ["128"]
        + [
            f"CASE WHEN l{i} IS NOT NULL THEN {1 << (7 - i)} ELSE 0 END"
            for i in range(1, 8)
        ]
    )
    num_p = " + ".join(f"COALESCE(l{i} * {1 << (8 - i)}, 0)" for i in range(1, 9))
    den_p = " + ".join(
        f"CASE WHEN l{i} IS NOT NULL THEN {1 << (8 - i)} ELSE 0 END"
        for i in range(1, 9)
    )
    return f"""
WITH {TELEMETRY_CTE},
per_min AS (
  SELECT app_name, metric_time_ms // 60000 * 60000 AS minute_ms,
         CAST(SUM(run_time_ms) AS BIGINT) AS run_ms_sum
  FROM task_metrics GROUP BY 1, 2
),
lagged AS (
  SELECT app_name, minute_ms, run_ms_sum,
         {lag_defs}
  FROM per_min
)
SELECT app_name, minute_ms, run_ms_sum,
       CAST({num} AS BIGINT) AS ewma_num,
       CAST({den} AS BIGINT) AS ewma_den,
       CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) AS ewma,
       CAST(CASE WHEN {den_p} = 0 THEN 0
                 WHEN run_ms_sum * ({den_p}) > 2 * ({num_p}) THEN 1
                 ELSE 0 END AS INTEGER) AS is_spike
FROM lagged
"""


OBS_ORACLES["obs_ewma_smooth"] = _ewma_oracle()


# O68: error-budget burn-down — integer DIV floor budget, cross-multiplied
# exhaustion, RANGE cumulative window on the day key.
OBS_ORACLES["obs_error_budget"] = f"""
WITH {TELEMETRY_CTE},
per_day AS (
  SELECT app_name,
         metric_time_ms - metric_time_ms % 86400000 AS day_ms,
         CAST(COUNT(*) AS BIGINT) AS n_logs,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM task_metrics GROUP BY 1, 2
),
cum AS (
  SELECT app_name, day_ms, n_logs, n_errors,
         CAST(SUM(n_logs) OVER (PARTITION BY app_name ORDER BY day_ms
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_logs,
         CAST(SUM(n_errors) OVER (PARTITION BY app_name ORDER BY day_ms
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_errors
  FROM per_day
)
SELECT app_name, day_ms, n_logs, n_errors, cum_logs, cum_errors,
       CAST(cum_logs * 20 // 100 AS BIGINT) AS budget_total,
       CAST(cum_logs * 20 // 100 - cum_errors AS BIGINT) AS budget_remaining,
       CAST(CASE WHEN cum_errors * 100 > cum_logs * 20 THEN 1 ELSE 0 END
            AS INTEGER) AS is_exhausted
FROM cum
"""


# O71: multi-window multi-burn-rate — RANGE-framed trailing sums on the
# hour key, cross-multiplied burn inequalities, no division.
OBS_ORACLES["obs_burn_rate_multiwindow"] = f"""
WITH {TELEMETRY_CTE},
per_hour AS (
  SELECT app_name,
         metric_time_ms - metric_time_ms % 3600000 AS hour_ms,
         CAST(COUNT(*) AS BIGINT) AS n_logs,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM task_metrics GROUP BY 1, 2
),
sums AS (
  SELECT app_name, hour_ms, n_logs, n_errors,
         CAST(SUM(n_logs) OVER (PARTITION BY app_name ORDER BY hour_ms
              RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS BIGINT) AS logs_1h,
         CAST(SUM(n_errors) OVER (PARTITION BY app_name ORDER BY hour_ms
              RANGE BETWEEN 0 PRECEDING AND CURRENT ROW) AS BIGINT) AS errors_1h,
         CAST(SUM(n_logs) OVER (PARTITION BY app_name ORDER BY hour_ms
              RANGE BETWEEN 18000000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS logs_6h,
         CAST(SUM(n_errors) OVER (PARTITION BY app_name ORDER BY hour_ms
              RANGE BETWEEN 18000000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS errors_6h,
         CAST(SUM(n_logs) OVER (PARTITION BY app_name ORDER BY hour_ms
              RANGE BETWEEN 255600000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS logs_72h,
         CAST(SUM(n_errors) OVER (PARTITION BY app_name ORDER BY hour_ms
              RANGE BETWEEN 255600000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS errors_72h
  FROM per_hour
)
SELECT app_name, hour_ms, n_logs, n_errors,
       logs_1h, errors_1h, logs_6h, errors_6h, logs_72h, errors_72h,
       CAST(CASE WHEN errors_1h * 100 >= 40 * logs_1h
                  AND errors_6h * 100 >= 40 * logs_6h THEN 1 ELSE 0 END
            AS INTEGER) AS page_alert,
       CAST(CASE WHEN errors_6h * 100 >= 20 * logs_6h
                  AND errors_72h * 100 >= 20 * logs_72h THEN 1 ELSE 0 END
            AS INTEGER) AS ticket_alert
FROM sums
"""


# O74: threshold-crossing forecast — O63's stats CTEs plus a layered
# forecast select over the already-aliased doubles (identical tree).
OBS_ORACLES["obs_forecast_linear"] = f"""
WITH {TELEMETRY_CTE},
base AS (
  SELECT event_type, metric_time_ms,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM task_metrics
),
t0 AS (
  SELECT event_type, MIN(metric_time_ms) AS t0_ms FROM base GROUP BY 1
),
wt AS (
  SELECT b.event_type, b.x, ((b.metric_time_ms - t.t0_ms) // 1000) AS t,
         t.t0_ms
  FROM base b JOIN t0 t USING (event_type)
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(t AS HUGEINT)) AS st,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(t AS HUGEINT) * x) AS stx,
         SUM(CAST(t AS HUGEINT) * t) AS stt,
         CAST(MAX(t) AS BIGINT) AS t_max,
         MAX(t0_ms) AS t0_ms
  FROM wt GROUP BY 1
),
d AS (
  SELECT event_type, n, t0_ms, t_max,
         CAST(n AS DOUBLE) AS nd, CAST(st AS DOUBLE) AS std,
         CAST(sx AS DOUBLE) AS sxd, CAST(stx AS DOUBLE) AS stxd,
         CAST(stt AS DOUBLE) AS sttd
  FROM stats
),
fitted AS (
  SELECT event_type,
         n AS n_events,
         t0_ms,
         t_max,
         (nd * stxd - std * sxd) / NULLIF(nd * sttd - std * std, 0)
           AS slope_cents_per_s,
         (sxd - ((nd * stxd - std * sxd) / NULLIF(nd * sttd - std * std, 0))
                * std) / NULLIF(nd, 0) AS intercept_cents,
         2.0 * (sxd / NULLIF(nd, 0)) AS threshold_cents
  FROM d
)
SELECT *,
       CASE WHEN slope_cents_per_s > 0
            THEN (threshold_cents - intercept_cents) / slope_cents_per_s
       END AS cross_t_s,
       CASE WHEN slope_cents_per_s > 0
            THEN (threshold_cents - intercept_cents) / slope_cents_per_s
       END - CAST(t_max AS DOUBLE) AS seconds_remaining,
       CAST(CASE WHEN slope_cents_per_s > 0
                  AND (CASE WHEN slope_cents_per_s > 0
                       THEN (threshold_cents - intercept_cents)
                            / slope_cents_per_s END) > CAST(t_max AS DOUBLE)
                 THEN 1 ELSE 0 END AS INTEGER) AS will_cross_ahead
FROM fitted
"""


# O75: histogram-partial percentile rollup — pure integer bin counts at
# every level (minute partials -> hour/day sums), percentile bin selected
# by the cross-multiplied inequality cum*100 >= p*n; no floats anywhere.
OBS_ORACLES["obs_histogram_rollup"] = f"""
WITH {TELEMETRY_CTE},
binned AS (
  SELECT event_type,
         metric_time_ms // 60000 * 60000 AS bucket_ms,
         LEAST(run_time_ms // 100, 31) AS bin
  FROM task_metrics
),
minute AS (
  SELECT event_type, bucket_ms, bin, CAST(COUNT(*) AS BIGINT) AS n
  FROM binned GROUP BY 1, 2, 3
),
hour AS (
  SELECT event_type, bucket_ms // 3600000 * 3600000 AS bucket_ms, bin,
         CAST(SUM(n) AS BIGINT) AS n
  FROM minute GROUP BY 1, 2, 3
),
day AS (
  SELECT event_type, bucket_ms // 86400000 * 86400000 AS bucket_ms, bin,
         CAST(SUM(n) AS BIGINT) AS n
  FROM hour GROUP BY 1, 2, 3
),
levels AS (
  SELECT 'hour' AS level, * FROM hour
  UNION ALL
  SELECT 'day' AS level, * FROM day
),
cum AS (
  SELECT level, event_type, bucket_ms, bin, n,
         CAST(SUM(n) OVER (PARTITION BY level, event_type, bucket_ms
              ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY level, event_type, bucket_ms)
              AS BIGINT) AS n_rows
  FROM levels
)
SELECT level, event_type, bucket_ms,
       CAST(MAX(n_rows) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used,
       CAST(MIN(CASE WHEN cum * 100 >= 50 * n_rows THEN bin END) * 100
            AS BIGINT) AS p50_lo,
       CAST(MIN(CASE WHEN cum * 100 >= 95 * n_rows THEN bin END) * 100
            AS BIGINT) AS p95_lo,
       CAST(MIN(CASE WHEN cum * 100 >= 99 * n_rows THEN bin END) * 100
            AS BIGINT) AS p99_lo
FROM cum
GROUP BY 1, 2, 3
"""


# O77: alert flap detection — minute-grain 0/1 firing states over O33's
# rules table, lag transitions between consecutive observed minutes,
# trailing-1h RANGE transition counts; all-integer, flap verdict >= 4.
OBS_ORACLES["obs_alert_flap"] = f"""
WITH {TELEMETRY_CTE},
rules(rule_id, metric, threshold) AS (
  VALUES {_RULES_VALUES}
),
minute AS (
  SELECT CAST(r.rule_id AS BIGINT) AS rule_id, r.metric,
         CAST(r.threshold AS BIGINT) AS threshold, t.app_id,
         t.metric_time_ms // 60000 * 60000 AS minute_ms,
         CAST(MAX(CASE WHEN
           CASE r.metric
             WHEN 'input_bytes_read' THEN t.input_bytes_read
             WHEN 'run_time_ms' THEN t.run_time_ms
             WHEN 'shuffle_bytes_read' THEN t.shuffle_bytes_read
             ELSE t.peak_execution_memory
           END > r.threshold THEN 1 ELSE 0 END) AS INTEGER) AS firing
  FROM task_metrics t CROSS JOIN rules r
  GROUP BY 1, 2, 3, 4, 5
),
st AS (
  SELECT *,
         CAST(CASE WHEN LAG(firing) OVER w IS NOT NULL
                    AND firing <> LAG(firing) OVER w
               THEN 1 ELSE 0 END AS BIGINT) AS is_transition
  FROM minute
  WINDOW w AS (PARTITION BY rule_id, app_id ORDER BY minute_ms)
),
tr AS (
  SELECT *,
         CAST(SUM(is_transition) OVER (
           PARTITION BY rule_id, app_id ORDER BY minute_ms
           RANGE BETWEEN 3540000 PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS trans_1h
  FROM st
)
SELECT rule_id, metric, threshold, app_id,
       CAST(COUNT(*) AS BIGINT) AS n_minutes,
       CAST(SUM(firing) AS BIGINT) AS n_firing_minutes,
       CAST(SUM(is_transition) AS BIGINT) AS n_transitions,
       CAST(MAX(trans_1h) AS BIGINT) AS max_transitions_1h,
       CAST(SUM(CASE WHEN trans_1h >= 4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flapping_minutes
FROM tr
GROUP BY 1, 2, 3, 4
"""


# O79: RED panel — shared floor((n-1)p) order statistics per (app, hour),
# cross-multiplied error-budget breach, try_divide display ratios.
OBS_ORACLES["obs_red_panel"] = f"""
WITH {TELEMETRY_CTE},
ranked AS (
  SELECT app_id, metric_time_ms // 3600000 * 3600000 AS hour_ms,
         run_time_ms, task_id,
         ROW_NUMBER() OVER (PARTITION BY app_id, metric_time_ms // 3600000
                            ORDER BY run_time_ms, task_id) AS rn,
         COUNT(*) OVER (PARTITION BY app_id, metric_time_ms // 3600000) AS n
  FROM task_metrics
),
dur AS (
  SELECT app_id, hour_ms,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)
             THEN run_time_ms END) AS p50_ms,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.75) AS BIGINT)
             THEN run_time_ms END) AS p75_ms,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT)
             THEN run_time_ms END) AS p99_ms
  FROM ranked GROUP BY 1, 2
),
re AS (
  SELECT app_id, metric_time_ms // 3600000 * 3600000 AS hour_ms,
         CAST(COUNT(*) AS BIGINT) AS n_logs,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors
  FROM task_metrics GROUP BY 1, 2
)
SELECT re.app_id, re.hour_ms, re.n_logs, re.n_errors,
       re.n_logs / 60 AS rate_per_min,
       re.n_errors / re.n_logs AS err_share,
       CAST(CASE WHEN re.n_errors * 100 > 5 * re.n_logs THEN 1 ELSE 0 END
            AS INTEGER) AS err_breach,
       CAST(d.p50_ms AS BIGINT) AS p50_ms,
       CAST(d.p75_ms AS BIGINT) AS p75_ms,
       CAST(d.p99_ms AS BIGINT) AS p99_ms
FROM re JOIN dur d ON d.app_id = re.app_id AND d.hour_ms = re.hour_ms
"""
