"""S12: incremental materialized-view maintenance off snapshot diffs.

The nightly-lakehouse pattern the snapshot core (S10) exists to enable:
a dashboard rollup (the O38 continuous-aggregate shape) must be kept
current as commits land, WITHOUT re-scanning the whole table per commit.
Snapshot manifests make the delta computable exactly: version N's file
list minus version N-1's IS the newly committed data (commits are
append-only immutable files — `snapshots.commit_append`), so maintenance
is ``view(N) = merge(view(N-1), rollup(new files))`` — and because the
rollup is ADDITIVE (BIGINT counts/sums), the merge is a groupBy-sum, and
the result is EXACTLY the full recompute (asserted loud in the runner on
real commits, not claimed).

At 100 TB this is the difference between a per-commit cost proportional
to the COMMIT and one proportional to the TABLE — the same reason O38
rolls hours up from minute partials instead of raw.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import _manifest_path, commit_append, snapshot_versions


def _manifest_files(table_dir: str, version: int) -> list[str]:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)["files"]


def new_files_between(table_dir: str, v_from: int | None, v_to: int) -> list[str]:
    """The file-level delta two manifests pin down exactly: files in
    ``v_to`` not in ``v_from`` (all of ``v_to`` when ``v_from`` is None).
    Append-only commits guarantee no file is ever rewritten in place, so
    scanning exactly these files reads exactly the committed delta."""
    to_files = _manifest_files(table_dir, v_to)
    if v_from is None:
        return to_files
    prior = set(_manifest_files(table_dir, v_from))
    return [f for f in to_files if f not in prior]


def hourly_rollup(df: DataFrame) -> DataFrame:
    """The maintained view: per (event_type, hour) additive partials —
    one definition shared by the incremental merge and the full-recompute
    check so the two can never drift."""
    return (
        df.select(
            "event_type",
            F.expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 3600000").alias("hour"),
            F.col("value"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
    )


def merge_rollups(view: DataFrame, delta: DataFrame) -> DataFrame:
    """Additive merge — the reason the view stays exact under
    incremental maintenance: BIGINT partials sum associatively."""
    return (
        view.unionByName(delta)
        .groupBy("event_type", "hour")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
    )


def incremental_view_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 runner (rows-only — paths are environment-local): three
    commits of the events table, the view maintained commit-by-commit
    from manifest diffs only, and THREE loud invariants per step: the
    delta file set is disjoint from the prior version's, delta rows are
    a strict subset of the table (incremental cost ∝ commit), and the
    maintained view is row-identical to a full recompute of the version.
    """
    import shutil
    import tempfile

    from pyspark.sql import Row

    work = tempfile.mkdtemp(prefix="gfaooa_incview_")
    table = os.path.join(work, "events_table")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        thirds = [events.filter(f"event_id % 3 = {i}") for i in range(3)]
        view = None
        prev_version: int | None = None
        steps = []
        total_rows = events.count()
        for part in thirds:
            version = commit_append(part, table)
            delta_files = new_files_between(table, prev_version, version)
            if prev_version is not None:
                overlap = set(delta_files) & set(
                    _manifest_files(table, prev_version)
                )
                if overlap:
                    raise AssertionError(f"delta not disjoint: {overlap}")
            delta = spark.read.parquet(*delta_files)
            delta_rows = delta.count()
            inc = hourly_rollup(delta)
            view = inc if view is None else merge_rollups(view, inc)
            view = view.localCheckpoint(eager=True)
            # the exactness claim, proven on this commit: maintained view
            # == full recompute of the pinned version
            from .snapshots import read_snapshot

            full = hourly_rollup(read_snapshot(spark, table, version))
            mism = (
                view.exceptAll(full).count() + full.exceptAll(view).count()
            )
            if mism:
                raise AssertionError(
                    f"incremental view diverged at v{version}: {mism} rows"
                )
            steps.append(
                Row(
                    version=version,
                    delta_files=len(delta_files),
                    delta_rows=delta_rows,
                    view_rows=view.count(),
                    view_equals_full=mism == 0,
                    delta_is_partial=delta_rows < total_rows,
                )
            )
            prev_version = version
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(steps).orderBy("version")
