"""Partition retention — the reference's daily index-rotation DELETION side.

The reference rotates per-type daily indexes and relies on the store to age
them out. The Spark-native sink (``logs_json.write_partitioned_telemetry``)
lays data out as ``metrics_type=*/metric_date=*`` directories, so retention
is partition-directory deletion: list ``metric_date`` partitions, drop the
ones older than the cutoff, leave everything else byte-identical. Deleting
whole partition directories is O(partitions) metadata work — no data scan,
no rewrite — which is the only retention shape that works at 100 TB.

Safety: this deletes ONLY paths that parse as ``metric_date=YYYY-MM-DD``
directories strictly older than the cutoff; unknown layouts are refused.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import date

_DATE_DIR = re.compile(r"^metric_date=(\d{4}-\d{2}-\d{2})$")


def list_date_partitions(path: str) -> list[tuple[date, str]]:
    """All (partition_date, absolute_path) under a partitioned dataset,
    covering both layouts: date at the top level or nested under
    ``metrics_type=`` dirs."""
    found: list[tuple[date, str]] = []
    for root, dirs, _ in os.walk(path):
        for d in list(dirs):
            m = _DATE_DIR.match(d)
            if m:
                found.append((date.fromisoformat(m.group(1)), os.path.join(root, d)))
                dirs.remove(d)  # don't descend into data files
    return sorted(found)


def apply_retention(path: str, keep_since: date) -> list[str]:
    """Delete partitions with ``metric_date < keep_since``; returns the
    deleted partition paths (empty if nothing aged out)."""
    deleted = []
    for part_date, part_path in list_date_partitions(path):
        if part_date < keep_since:
            shutil.rmtree(part_path)
            deleted.append(part_path)
    return deleted


def retention_report(spark, sf_dir: str):
    """S7 as a driver-checkable query: build a date-partitioned telemetry
    sink from events, apply a retention cutoff, and report kept/dropped
    partition counts + the surviving row count. Rows-only driver check
    (paths/dates are environment-local); exact partition-drop semantics
    asserted in ``tests/test_sources.py``.
    """
    import shutil
    import tempfile

    from pyspark.sql import Row

    from ..sources.telemetry import task_metrics
    from .logs_json import write_partitioned_telemetry

    work = tempfile.mkdtemp(prefix="gfaooa_retention_")
    try:
        tm = task_metrics(spark.read.parquet(f"{sf_dir}/events.parquet"))
        write_partitioned_telemetry(tm, work)
        parts = list_date_partitions(work)
        dates = sorted(d for d, _ in parts)
        cutoff = dates[len(dates) // 2] if dates else None
        dropped = apply_retention(work, cutoff) if cutoff else []
        remaining = list_date_partitions(work)
        survivors = spark.read.option("basePath", work).parquet(work)
        n_rows_after = survivors.count()
        min_kept = str(min((d for d, _ in remaining), default=""))
    finally:
        # every reported value is already materialized — the sink can go
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            Row(
                n_partitions_before=len(parts),
                n_dropped=len(dropped),
                n_partitions_after=len(remaining),
                min_kept_date=min_kept,
                n_rows_after=n_rows_after,
            )
        ]
    )
