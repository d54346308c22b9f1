"""ANALYZE-style table statistics (S11) — the optimizer-food maintenance
job every lake table needs.

Cost-based decisions (join sides, broadcast thresholds, partition
pruning sanity) run on per-column statistics: row count, null count,
exact distinct count, min/max. This job computes them as a TALL frame
(one row per column) over the events table, with every statistic exact
and engine-portable: BIGINT counts, timestamps as epoch-ms, money as
integer cents — so unlike the sketch-based ANALYZE of most warehouses it
carries a DuckDB hash-exact oracle (the one S-group entry with a full
sql row).

Plan shape: one aggregate PER COLUMN, unioned — each aggregate's parquet
scan is column-pruned to exactly its own column (verified shape: a
five-stat pass reads five single-column scans, never the full table),
and every aggregate partial-merges map-side, so the shuffle per column
is one partial row per partition. At 100 TB this is the I/O-optimal
layout for a columnar store; a single wide aggregate would read all
columns in one scan — fewer passes but no pruning — and ``countDistinct``
×5 in one aggregate forces a 5× row expand, strictly worse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables


def _col_stats(
    events: DataFrame, name: str, col: Column, with_minmax: bool = True
) -> DataFrame:
    agg = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
        F.countDistinct(col).alias("n_distinct"),
        F.min(col).cast("long").alias("_min"),
        F.max(col).cast("long").alias("_max"),
    )
    mn = F.col("_min") if with_minmax else F.lit(None).cast("long")
    mx = F.col("_max") if with_minmax else F.lit(None).cast("long")
    return agg.select(
        F.lit(name).alias("col_name"),
        "n_rows",
        "n_nulls",
        "n_distinct",
        mn.alias("min_v"),
        mx.alias("max_v"),
    )


def table_stats(events: DataFrame) -> DataFrame:
    """Tall per-column statistics over the (normalized) events table.

    Integer-exact views of each column: ids as-is, ``ts`` as epoch-ms,
    ``value`` as cents (the shared oracle-exactness convention), and the
    categorical ``event_type`` with NULL min/max (a string extreme has no
    BIGINT home; its distinct count is the statistic planners use).
    """
    frames = [
        _col_stats(events, "event_id", F.col("event_id")),
        _col_stats(events, "user_id", F.col("user_id")),
        _col_stats(events, "ts_ms", F.unix_millis(F.col("ts"))),
        _col_stats(
            events, "value_cents", F.floor(F.col("value") * 100 + 0.5).cast("long")
        ),
        _col_stats(events, "event_type", F.col("event_type"), with_minmax=False),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def table_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_stats(load_tables(spark, sf_dir)["events"])


#: DuckDB oracle — the same five per-column aggregates, unioned tall.
TABLE_STATS_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
         event_type
  FROM events
)
SELECT 'event_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(MIN(event_id) AS BIGINT) AS min_v,
       CAST(MAX(event_id) AS BIGINT) AS max_v
FROM ev
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
       CAST(COUNT(DISTINCT user_id) AS BIGINT),
       CAST(MIN(user_id) AS BIGINT), CAST(MAX(user_id) AS BIGINT)
FROM ev
UNION ALL
SELECT 'ts_ms', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(ts_ms) AS BIGINT),
       CAST(COUNT(DISTINCT ts_ms) AS BIGINT),
       CAST(MIN(ts_ms) AS BIGINT), CAST(MAX(ts_ms) AS BIGINT)
FROM ev
UNION ALL
SELECT 'value_cents', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(value_cents) AS BIGINT),
       CAST(COUNT(DISTINCT value_cents) AS BIGINT),
       CAST(MIN(value_cents) AS BIGINT), CAST(MAX(value_cents) AS BIGINT)
FROM ev
UNION ALL
SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
       CAST(COUNT(DISTINCT event_type) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM ev
"""
