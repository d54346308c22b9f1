"""Parquet table loaders for the driver-generated test data.

All queries read the same ten tables; loads are lazy DataFrames so Catalyst
can push filters/column pruning down to the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tune_session(spark)
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
