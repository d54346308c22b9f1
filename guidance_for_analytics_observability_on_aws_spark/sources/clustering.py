"""Sort-clustered parquet layout + data-skipping report — S9.

The reference's OpenSearch indexes answer selective per-entity queries
(one appId, one executor) from inverted indexes; a parquet lake gets the
same selectivity from LAYOUT: cluster the data by the filter key at write
time (range-partition + sort), and every row group's min/max footer
statistics become a zone map. Spark's parquet reader then skips whole row
groups whose [min, max] cannot contain the predicate value — I/O
proportional to the selected key range, not the table size. At 100 TB
this is the difference between reading ~1/N of the files and reading all
of them; it composes with (and outperforms) partition pruning for
high-cardinality keys that would over-fragment a partitioned layout.

``clustering_report`` quantifies the effect from the actual parquet
footers (pyarrow metadata — the same statistics the Spark reader
consults) on a clustered vs hash-scattered copy of the SAME rows, and
cross-checks that both layouts return identical query results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int
) -> None:
    """Write ``df`` range-partitioned AND sorted by ``cluster_cols``.

    ``repartitionByRange`` gives disjoint key ranges per file (file-level
    skipping), ``sortWithinPartitions`` orders rows inside each file so
    every row group's min/max spans a narrow slice (row-group-level
    skipping). One shuffle paid at write time; every later selective read
    benefits.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*[F.col(c) for c in cluster_cols])
        .write.mode("overwrite")
        .parquet(path)
    )


def row_group_ranges(path: str, column: str) -> list[tuple]:
    """(min, max, num_rows) per row group for ``column``, read from the
    parquet footers under ``path`` — exactly the zone-map statistics the
    scan consults before deciding to read a row group."""
    import os

    import pyarrow.parquet as pq

    ranges = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, name)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(column)
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    # fail loud: a stats-suppressed file has no zone map,
                    # so the skipping numbers would silently lie.
                    raise ValueError(
                        f"no min/max statistics for column {column!r} in "
                        f"{name} row group {rg} — cannot build a zone-map "
                        "report over this file"
                    )
                ranges.append((stats.min, stats.max, md.row_group(rg).num_rows))
    return ranges


def matching_row_groups(ranges: list[tuple], lo, hi) -> int:
    """Row groups whose [min, max] overlaps [lo, hi] — the ones a scan
    with that predicate must actually read."""
    return sum(1 for mn, mx, _n in ranges if not (mx < lo or mn > hi))


def clustering_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 as a driver-checkable query: write the events table twice —
    clustered by ``user_id`` and hash-scattered — and report, from the
    real parquet footers, how many row groups a selective ``user_id``
    range predicate must read under each layout. Rows-only driver check
    (row-group geometry is size/environment-dependent); the skipping
    inequality and result-equality invariants are asserted in
    ``tests/test_sources.py``.
    """
    import shutil
    import tempfile

    from pyspark.sql import Row

    work = tempfile.mkdtemp(prefix="gfaooa_cluster_")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_files = 8
        clustered = f"{work}/clustered"
        scattered = f"{work}/scattered"
        write_clustered(events, clustered, ["user_id"], n_files)
        # control layout: same rows, hash-scattered on an uncorrelated key,
        # so every file holds the full user_id range.
        (
            events.repartition(n_files, F.col("event_id"))
            .write.mode("overwrite")
            .parquet(scattered)
        )
        # a ~1%-of-keyspace range around a mid percentile: selective but
        # guaranteed non-empty
        lo = events.agg(F.expr("percentile_approx(user_id, 0.45)")).collect()[0][0]
        hi = lo + max(1, int(lo * 0.01))
        rg_c = row_group_ranges(clustered, "user_id")
        rg_s = row_group_ranges(scattered, "user_id")
        match_c = matching_row_groups(rg_c, lo, hi)
        match_s = matching_row_groups(rg_s, lo, hi)
        pred = (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
        rows_c = spark.read.parquet(clustered).filter(pred).count()
        rows_s = spark.read.parquet(scattered).filter(pred).count()
        if rows_c != rows_s:
            raise AssertionError(
                f"layouts disagree under the same predicate: {rows_c} vs {rows_s}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            Row(
                n_row_groups_clustered=len(rg_c),
                n_row_groups_scattered=len(rg_s),
                rg_read_clustered=match_c,
                rg_read_scattered=match_s,
                rows_selected=rows_c,
                skip_ratio_clustered=1.0 - match_c / len(rg_c),
                skip_ratio_scattered=1.0 - match_s / len(rg_s),
            )
        ]
    )
