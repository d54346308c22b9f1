"""Schema evolution for long-lived parquet telemetry tables (S8).

A 100 TB observability lake outlives its schema: new metric columns get
added (the reference's CustomTaskMetrics gained fields across releases),
and years of already-written files cannot be rewritten to match. Parquet
handles this structurally — each file carries its own schema in the
footer — and Spark reconciles them on read with ``mergeSchema``; columns a
file does not contain come back NULL, with full column pruning (an old
file never reads bytes for a column it lacks, and a filter on the new
column simply matches nothing in old files).

Two pieces:

- :func:`read_with_evolution` — the production read path: merge footer
  schemas across file generations, then OPTIONALLY align to an expected
  schema (missing columns added as typed NULLs, extras dropped) so
  downstream plans always see one stable shape. Alignment is per-column
  projection — no shuffle, no rewrite.
- :func:`schema_evolution_report` — driver-checkable demonstration over
  scratch copies of the events table: generation 1 lacks a column that
  generation 2 adds; the merged read must see the union schema, NULL-fill
  the old rows, and keep exact row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_with_evolution(
    spark: SparkSession, path: str, expected: StructType | None = None
) -> DataFrame:
    """Read a parquet dataset whose files span schema generations.

    ``mergeSchema`` unions the footer schemas (one extra footer pass —
    the read itself still prunes columns per file). With ``expected``
    given, the result is aligned to exactly that schema: columns missing
    from every generation materialize as typed NULL literals, unexpected
    extras are dropped, and column order is normalized — so a consumer
    pipeline compiled against ``expected`` never sees schema drift.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for field in expected.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def schema_evolution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report proving the evolution invariants on real data.

    Writes the events table twice into one dataset directory: generation
    1 WITHOUT ``props`` (the pre-evolution files), generation 2 with
    ``props`` plus a new ``schema_rev`` column (the post-evolution files).
    The merged read must produce the union schema, exactly
    ``rows_gen1 + rows_gen2`` rows, NULL ``schema_rev`` for every
    generation-1 row, and a pushed-down filter on the new column must
    select only generation-2 rows.
    """
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="gfaooa_evolve_")
    try:
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        gen1 = events.drop("props")
        gen2 = events.withColumn("schema_rev", F.lit(2))
        gen1.write.mode("overwrite").parquet(f"{work}/data")
        gen2.write.mode("append").parquet(f"{work}/data")

        merged = read_with_evolution(spark, f"{work}/data")
        n_events = events.count()
        row = merged.agg(
            F.count(F.lit(1)).alias("rows_merged"),
            F.sum(F.when(F.col("schema_rev").isNull(), 1).otherwise(0)).alias(
                "rows_gen1_nullfilled"
            ),
            F.sum(F.when(F.col("schema_rev") == 2, 1).otherwise(0)).alias(
                "rows_gen2"
            ),
            F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias(
                "rows_without_props"
            ),
        ).collect()[0]
        n_filtered = merged.filter(F.col("schema_rev") == 2).count()
        report = spark.createDataFrame(
            [
                (
                    n_events,
                    row.rows_merged,
                    row.rows_gen1_nullfilled,
                    row.rows_gen2,
                    row.rows_without_props,
                    n_filtered,
                    len(merged.columns),
                    len(gen1.columns),
                )
            ],
            "rows_per_gen long, rows_merged long, rows_gen1_nullfilled long, "
            "rows_gen2 long, rows_without_props long, rows_new_col_filter long, "
            "n_cols_merged int, n_cols_gen1 int",
        )
        # Built from already-collected Python values — safe to return after
        # the scratch dir is deleted.
        return report
    finally:
        shutil.rmtree(work, ignore_errors=True)
