"""Spark-vs-DuckDB oracle parity for every sql-checked query in SURVEY §2.

This is a local replica of the driver's t2 correctness gate: run the
DataFrame builder and the oracle SQL on the same parquet, sort columns by
name and rows by value, and require EXACT equality (the driver hashes
values, so even 1-ulp float drift must be caught here, not there).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from guidance_for_analytics_observability_on_aws_spark.plans.registry import REGISTRY
from guidance_for_analytics_observability_on_aws_spark.sources.tables import TABLES

SQL_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    got = canon(spec.builder(spark, sf_dir).toPandas())
    want = canon(run_oracle(spec.oracle, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # The driver hashes the CSV rendering, where an int-vs-float dtype
    # drift (e.g. DuckDB's window SUM(BIGINT) → HUGEINT → float64) shows
    # as "1106.0" vs "1106" even though the frames compare equal above —
    # caught in r7 only by the bulk sweep; pinned here so it can't recur.
    import hashlib

    h = lambda df: hashlib.md5(df.to_csv(index=False).encode()).hexdigest()  # noqa: E731
    assert h(got) == h(want), f"{name}: value-hash (CSV rendering) mismatch"
