"""Small-file compaction for streaming sinks — table maintenance.

A continuously-appending sink (the collector's micro-batches, the
partitioned telemetry sink) accretes many small files; at 100 TB that
means scan tasks dominated by open/footer overhead and a throttled
namenode/object-store listing. Compaction rewrites a dataset into files
sized near a target, preserving the partition layout. The reference
delegates this to OpenSearch's segment merging — a parquet lake needs it
as an explicit job.

Scale posture: the file count is computed from the ACTUAL byte size on
disk (not row counts), the rewrite is a single shuffle-free coalesce when
shrinking or a hash repartition when partition-local balance matters, and
the output goes to a NEW directory — compact-then-swap, never an in-place
rewrite that could torch data on job failure.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dataset_bytes(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (recursive)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, name))
    return total


def plan_file_count(path: str, target_file_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    return max(1, math.ceil(dataset_bytes(path) / target_file_bytes))


def compact_dataset(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite ``src`` into ``dst`` with ~``target_file_bytes`` files.

    Unpartitioned: ``coalesce(n)`` — a narrow, shuffle-free merge of input
    splits into ``n`` output files. Partitioned: hash-repartition on the
    partition columns plus a salt bounded by ``n``, so each output task
    writes whole partition directories without one giant file per
    partition value. Returns the planned file count ``n``.
    """
    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("compact_dataset writes to a NEW directory (compact-then-swap)")
    n = plan_file_count(src, target_file_bytes)
    df = spark.read.parquet(src)
    if partition_cols:
        # pmod, not %: Spark's % keeps the dividend's sign, which would yield
        # up to 2n-1 distinct salts and unbalance the planned file count.
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n))
        (
            df.repartition(n, *[F.col(c) for c in partition_cols], salt)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(dst)
        )
    else:
        df.coalesce(n).write.mode("overwrite").parquet(dst)
    return n


def compaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 as a driver-checkable query: write a deliberately-fragmented
    copy of the events table, compact it, and report before/after file
    counts + row-count preservation. Values depend on local file sizes →
    rows-only driver check; exact row preservation asserted here and in
    ``tests/test_sources.py``.
    """
    import shutil
    import tempfile

    from pyspark.sql import Row

    work = tempfile.mkdtemp(prefix="gfaooa_compact_")
    try:
        frag, dst = f"{work}/frag", f"{work}/compact"
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        events.repartition(64).write.mode("overwrite").parquet(frag)

        def n_files(p: str) -> int:
            return sum(
                1
                for root, _d, fs in os.walk(p)
                for f in fs
                if f.endswith(".parquet")
            )

        n_before = n_files(frag)
        planned = compact_dataset(spark, frag, dst, target_file_bytes=64 * 1024 * 1024)
        n_after = n_files(dst)
        rows_src = events.count()
        rows_dst = spark.read.parquet(dst).count()
    finally:
        # every reported value is already materialized — the copies can go
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            Row(
                n_files_before=n_before,
                n_files_after=n_after,
                planned_files=planned,
                rows_preserved=(rows_src == rows_dst),
                n_rows=rows_dst,
            )
        ]
    )
