"""Parquet table loaders for the driver-generated test data.

All queries read the same ten tables; loads are lazy DataFrames so Catalyst
can push filters/column pruning down to the parquet scans.

Loads are memoized per (session, sf_dir): `spark.read.parquet` performs file
listing + footer/schema resolution eagerly (~0.1s/table), and every query
builder calls `load_tables` — without the cache a 10-table workload pays
that resolution once per query instead of once per session. The cached
DataFrames are lazy plans, so sharing them costs nothing and every query
still gets its own pushdown/pruning.

The cache is a WeakKeyDictionary keyed on the live session object (not
id(spark)): entries die with their session, so a new SparkSession that
happens to reuse a collected session's memory address can never receive
DataFrames bound to a stopped SparkContext, and the cache self-evicts.
"""

from __future__ import annotations

import weakref

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

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    per_session = _CACHE.get(spark)
    if per_session is None:
        per_session = {}
        _CACHE[spark] = per_session
    if sf_dir not in per_session:
        tune_session(spark)
        per_session[sf_dir] = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES
        }
    return dict(per_session[sf_dir])
