"""Zone-map / file-skipping report (S13) — lake-layout maintenance.

At 100 TB, whether a predicate scans 2 files or 2000 is decided by data
LAYOUT, not the engine: parquet footers carry per-file (and row-group)
min/max, and a scan can skip any file whose [min, max] range misses the
predicate — but only if writes clustered the column so ranges are
narrow. This report quantifies that, the number a team reads before
paying for a clustering rewrite (S9's design loop): it writes the SAME
rows in two layouts — range-clustered on the predicate column vs
hash-scattered — and measures, per layout, how many files a date-range
predicate can skip and how many rows those files hold.

It also VERIFIES the zone-map contract on the actual data instead of
assuming it: a skippable file (max < lo or min > hi) must contain zero
matching rows, so the matching rows found in non-skippable files must
equal the table's total matches (``guarantee_holds`` — pinned in tests;
if this were ever false, file skipping would silently drop data).

Values depend on local file sizes/row placement → rows-only driver
check; the contract and the clustered-beats-scattered ordering are
asserted in ``tests/test_sources.py``.

Scale posture: per-file stats come from ONE pass per layout
(``groupBy(input_file_name())`` — map-side combined, output is
|files| rows); the verification join is file-keyed and broadcast
(|files| rows). Nothing here scales with row count except the two
linear stat scans, which at a real lake are replaced by reading the
parquet footers alone.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_FILES = 16
PRED_LO = "1996-01-01"
PRED_HI = "1996-12-31"


def _per_file_stats(df: DataFrame, col: str) -> DataFrame:
    return df.groupBy(F.input_file_name().alias("file")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(col).alias("min_v"),
        F.max(col).alias("max_v"),
        F.sum(
            F.when(
                (F.col(col) >= F.lit(PRED_LO)) & (F.col(col) <= F.lit(PRED_HI)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_match"),
    )


def zone_map_report(
    spark: SparkSession, sf_dir: str, col: str = "o_orderdate"
) -> DataFrame:
    """S13: write orders range-clustered vs hash-scattered, report each
    layout's file-skipping power for the [PRED_LO, PRED_HI] range and
    verify the zone-map guarantee against the actual rows."""
    work = tempfile.mkdtemp(prefix="gfaooa_zonemap_")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        layouts = {
            "clustered": orders.repartitionByRange(N_FILES, F.col(col)),
            "scattered": orders.repartition(N_FILES, F.col("o_orderkey")),
        }
        rows = []
        for name, df in layouts.items():
            path = f"{work}/{name}"
            df.write.mode("overwrite").parquet(path)
            stats = _per_file_stats(spark.read.parquet(path), col).withColumn(
                "skippable",
                (F.col("max_v") < F.lit(PRED_LO))
                | (F.col("min_v") > F.lit(PRED_HI)),
            )
            agg = stats.agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("n_match").cast("long").alias("n_match"),
                F.sum(F.col("skippable").cast("long"))
                .cast("long")
                .alias("n_skippable"),
                F.sum(F.when(F.col("skippable"), F.col("n_rows")).otherwise(0))
                .cast("long")
                .alias("rows_in_skippable"),
                F.sum(F.when(~F.col("skippable"), F.col("n_match")).otherwise(0))
                .cast("long")
                .alias("match_in_scanned"),
            ).collect()[0]
            rows.append(
                (
                    name,
                    agg.n_files,
                    agg.n_rows,
                    agg.n_match,
                    agg.n_skippable,
                    agg.rows_in_skippable,
                    # zone-map contract: every match lives in a scanned file
                    agg.match_in_scanned == agg.n_match,
                )
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = spark.createDataFrame(
        rows,
        "layout string, n_files long, n_rows long, n_match long, "
        "n_skippable long, rows_in_skippable long, guarantee_holds boolean",
    )
    return out.withColumn(
        "skip_share", F.try_divide(F.col("n_skippable"), F.col("n_files"))
    )
