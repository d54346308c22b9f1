"""Parquet table loaders for the driver-generated test data.

All queries read the same ten tables; loads are lazy DataFrames so Catalyst
can push filters/column pruning down to the parquet scans.

Loads are memoized per (session, sf_dir): `spark.read.parquet` performs file
listing + footer/schema resolution eagerly (~0.1s/table), and every query
builder calls `load_tables` — without the cache a 10-table workload pays
that resolution once per query instead of once per session. The cached
DataFrames are lazy plans, so sharing them costs nothing and every query
still gets its own pushdown/pruning.
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

_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        tune_session(spark)
        _CACHE[key] = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}
    return dict(_CACHE[key])
