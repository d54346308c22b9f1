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
from .telemetry import normalize_events

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

#: Column types every query assumes. Values are sets of acceptable Spark
#: simpleString dtypes — the driver has re-encoded columns between rounds
#: (events.ts: bigint nanos → timestamp_ntz), so any drift outside this
#: map should fail fast with ONE actionable message instead of dozens of
#: cryptic per-query analysis errors.
EXPECTED_TYPES: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int"}, "n_name": {"string"}, "n_regionkey": {"int"}},
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
        "c_nationkey": {"int"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"},
        "s_name": {"string"},
        "s_nationkey": {"int"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_linenumber": {"int"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": {"bigint"},
        # both historical encodings are fine — normalize_events adapts
        "ts": {"timestamp", "timestamp_ntz", "bigint"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int"},
    },
}


def check_schema(name: str, df: DataFrame) -> None:
    """Raise one clear error naming every column/type drift in ``df``."""
    expected = EXPECTED_TYPES.get(name)
    if not expected:
        return
    actual = dict(df.dtypes)
    problems = []
    for col, allowed in expected.items():
        if col not in actual:
            problems.append(f"missing column {col!r} (expected one of {sorted(allowed)})")
        elif actual[col] not in allowed:
            problems.append(
                f"column {col!r} is {actual[col]!r}, expected one of {sorted(allowed)}"
            )
    if problems:
        raise TypeError(
            f"testdata table {name!r} schema drifted from what the engine "
            f"assumes: {'; '.join(problems)}. Update EXPECTED_TYPES + the "
            "affected operators (see sources/tables.py)."
        )

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # Re-apply on EVERY load, not just the first: the driver owns the
    # session and may reset confs between queries; UTC must hold whenever a
    # query is built or oracle timestamp comparisons silently drift.
    tune_session(spark)
    per_session = _CACHE.get(spark)
    if per_session is None:
        per_session = {}
        _CACHE[spark] = per_session
    if sf_dir not in per_session:
        loaded = {}
        for t in TABLES:
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            check_schema(t, df)
            if t == "events":
                df = normalize_events(df)
            loaded[t] = df
        per_session[sf_dir] = loaded
    return dict(per_session[sf_dir])
