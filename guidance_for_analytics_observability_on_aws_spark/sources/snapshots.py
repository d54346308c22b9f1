"""Manifest-pinned snapshot tables (minimal lake-format core) — S10.

Directory-listing reads are non-atomic: a reader that lists a path while
a writer appends sees a torn table (half a commit), and a failed job
leaves orphan files that silently join every later scan. The lake-format
answer (the Iceberg/Delta core idea, in its minimal form) is METADATA
INDIRECTION: a commit writes immutable data files under ``data/``, then
publishes a manifest listing exactly the files of that version with one
atomic rename. Readers pin a manifest — they see a version in full or
not at all; uncommitted data files are invisible; every old version
stays readable (time travel) until explicitly expired.

At 100 TB this also kills the O(files) directory listing per query: the
scan's file list comes from one manifest read. The report runner proves
the three invariants on real commits: snapshot isolation (v1's result is
byte-stable after v2 commits), append visibility, and orphan-file
invisibility.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-{version:06d}.json")


def snapshot_versions(table_dir: str) -> list[int]:
    """Published versions, ascending (a manifest IS the publication)."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-"):-len(".json")]))
    return sorted(out)


def commit_append(df: DataFrame, table_dir: str) -> int:
    """Append ``df`` as a new snapshot version; returns the version.

    Data files are written to a commit-private directory (never visible
    to readers), then the new manifest = previous manifest's files + the
    new files is published with exclusive-create ``os.link`` — atomic on
    POSIX AND collision-detecting: if a concurrent writer already
    published this version number the link raises ``FileExistsError``
    (re-raised with a retry hint after the loser's staged data directory
    is removed), so a commit can never silently clobber another. A crash
    before the publish leaves only orphan data files, which no manifest
    references and no reader ever scans.
    """
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    commit_id = uuid.uuid4().hex
    staging = os.path.join(table_dir, "data", commit_id)
    df.write.mode("errorifexists").parquet(staging)
    new_files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    versions = snapshot_versions(table_dir)
    prior_files: list[str] = []
    if versions:
        with open(_manifest_path(table_dir, versions[-1])) as fh:
            prior_files = json.load(fh)["files"]
    version = (versions[-1] + 1) if versions else 1
    tmp = os.path.join(table_dir, f".manifest-{commit_id}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": prior_files + new_files}, fh)
    try:
        # Exclusive-create publish: os.link raises FileExistsError if a
        # concurrent writer already claimed this version number — unlike
        # os.rename, which silently clobbers the other commit's manifest
        # and orphans its data files. The loser retries against the new
        # latest version.
        os.link(tmp, _manifest_path(table_dir, version))
    except FileExistsError:
        # The loser's staged parquet dir would otherwise leak forever (a
        # retry stages under a fresh commit_id), so reclaim it before
        # surfacing the collision.
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise FileExistsError(
            f"snapshot version {version} of {table_dir} was published by a "
            "concurrent writer; re-read the latest version and retry"
        ) from None
    finally:
        os.unlink(tmp)
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (latest if ``None``) — scans exactly the
    manifest's files, never a directory listing."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no published snapshots under {table_dir}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    with open(_manifest_path(table_dir, version)) as fh:
        files = json.load(fh)["files"]
    return spark.read.parquet(*files)


def expire_snapshots(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop old manifests (and data files no surviving version
    references); returns expired versions. The delete order — manifests
    first, then unreferenced files — means a crash mid-expire never
    breaks a surviving version."""
    versions = snapshot_versions(table_dir)
    expired = versions[:-keep_last] if keep_last > 0 else versions
    survivors = versions[len(expired):]
    keep_files: set[str] = set()
    for v in survivors:
        with open(_manifest_path(table_dir, v)) as fh:
            keep_files.update(json.load(fh)["files"])
    dropped_files: set[str] = set()
    for v in expired:
        with open(_manifest_path(table_dir, v)) as fh:
            dropped_files.update(json.load(fh)["files"])
        os.remove(_manifest_path(table_dir, v))
    for f in dropped_files - keep_files:
        os.remove(f)
    return expired


def snapshot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 as a driver-checkable query: two commits from the events
    table, then prove snapshot isolation (v1 re-read identical after v2
    commits), append visibility (v2 = v1 + appended), and orphan
    invisibility (a dangling data directory changes nothing). Rows-only
    driver check (paths are environment-local); the invariants are
    asserted both here and in ``tests/test_sources.py``.
    """
    import shutil
    import tempfile

    from pyspark.sql import Row

    work = tempfile.mkdtemp(prefix="gfaooa_snap_")
    table = os.path.join(work, "events_table")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        first = events.filter("event_id % 2 = 0")
        second = events.filter("event_id % 2 = 1")
        v1 = commit_append(first, table)
        n_v1_before = read_snapshot(spark, table, v1).count()
        v2 = commit_append(second, table)
        # orphan files: a writer that died before publishing its manifest
        orphan = os.path.join(table, "data", "deadbeef_orphan")
        first.limit(10).write.parquet(orphan)
        n_v1_after = read_snapshot(spark, table, v1).count()
        n_v2 = read_snapshot(spark, table, v2).count()
        n_total = events.count()
        if n_v1_before != n_v1_after:
            raise AssertionError("snapshot isolation violated: v1 changed")
        if n_v2 != n_total:
            raise AssertionError("append visibility violated")
        expired = expire_snapshots(table, keep_last=1)
        n_after_expire = read_snapshot(spark, table).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            Row(
                v1=v1,
                v2=v2,
                n_v1=n_v1_before,
                n_v2=n_v2,
                isolation_ok=n_v1_before == n_v1_after,
                n_expired=len(expired),
                n_after_expire=n_after_expire,
            )
        ]
    )


def manifest_files(table_dir: str, version: int) -> list[str]:
    """The exact file list a version pins — the metadata a diff reads."""
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)["files"]


def snapshot_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14: SNAPSHOT DIFF / incremental-read report — the Iceberg
    ``changes``-table shape S10's time travel enables: between two
    versions, the files ADDED and REMOVED come from comparing two
    manifests (pure metadata — O(manifest), no data scan), and because
    commits are append-only, reading ONLY the added files yields exactly
    the new rows. That contract is what incremental consumers (CDC
    downstreams, nightly dedup folds like P19) rely on at 100 TB: a
    version-to-version sync scans the delta, never the table.

    The report VERIFIES the contract on real commits instead of assuming
    it: per version step, ``rows_added_incremental`` (count over added
    files only) must equal ``rows_added_antijoin`` (v_b exceptAll v_a —
    the full-diff definition, quadratic-scan expensive, computed here as
    the independent check) — ``incremental_read_exact`` pinned in tests.
    Rows-only driver check (paths are environment-local).
    """
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="gfaooa_snapdiff_")
    table = os.path.join(work, "events_table")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        slices = [
            events.filter("event_id % 3 = 0"),
            events.filter("event_id % 3 = 1"),
            events.filter("event_id % 3 = 2"),
        ]
        versions = [commit_append(s, table) for s in slices]
        rows = []
        for va, vb in zip(versions, versions[1:]):
            fa, fb = set(manifest_files(table, va)), set(manifest_files(table, vb))
            added, removed = sorted(fb - fa), sorted(fa - fb)
            inc = spark.read.parquet(*added).count() if added else 0
            anti = (
                read_snapshot(spark, table, vb)
                .exceptAll(read_snapshot(spark, table, va))
                .count()
            )
            rows.append(
                (
                    va,
                    vb,
                    len(added),
                    len(removed),
                    int(inc),
                    int(anti),
                    inc == anti,
                )
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "version_from int, version_to int, n_files_added long, "
        "n_files_removed long, rows_added_incremental long, "
        "rows_added_antijoin long, incremental_read_exact boolean",
    )
