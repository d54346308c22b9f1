"""Bucketed parquet tables — shuffle-free co-located joins.

The 100 TB rationale: a fact⋈fact join on a high-cardinality key shuffles
BOTH sides every query. Writing the tables bucketed (hash-partitioned into a
fixed bucket count, sorted within buckets) pays that shuffle ONCE at write
time; every subsequent join on the bucket key runs with zero Exchange —
each task sort-merge-joins bucket i of the left table against bucket i of
the right. This is Spark's native equivalent of the co-located index
layouts the reference gets from its store's shard routing.

Bucket counts must match (or divide) across join sides; pick a count sized
so one bucket of the larger table fits an executor's memory at target scale
(e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sortBy`` the bucket key too: within-bucket order lets the join skip
    its sort (SortMergeJoin reads presorted runs) and improves min/max
    row-group pruning for point lookups on the key.
    """
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two bucketed tables on their bucket keys — planner emits no
    Exchange when bucket specs are compatible (asserted in tests)."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
