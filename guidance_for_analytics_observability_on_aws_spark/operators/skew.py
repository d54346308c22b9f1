"""Skew mitigation utilities — salted aggregation and salted broadcast join.

The reference exists because data skew wrecks Spark jobs (its whole
dashboard surface is skewness analysis, ``CustomMetricsListener.scala:
146-188``). This module is the other half: operators that *survive* skewed
keys. AQE's skew-join split handles sort-merge joins automatically; these
utilities cover the two cases AQE does not re-plan today:

* a single hot grouping key whose partial aggregate still lands on one
  reducer → :func:`salted_sum` spreads the partial aggregation over
  ``n_salts`` reducers, then merges the (tiny) per-salt partials;
* a broadcast-sized dim joined on a hot fact key where one task drags →
  :func:`salted_broadcast_join` replicates the dim per salt so the fact
  side can be split arbitrarily.

Both are deterministic (salt = pmod(hash(row-id), n)) so results are
byte-identical to their unsalted equivalents — asserted in
``tests/test_operators.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str, n_salts: int) -> DataFrame:
    """Deterministic salt column in [0, n_salts) derived from a row id."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    salt_from: str,
    n_salts: int = 32,
) -> DataFrame:
    """SUM/COUNT per key via two-stage salted aggregation.

    Stage 1 groups by (keys, salt) — a hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the ≤ n_salts partial rows per
    key. Sums and counts re-aggregate losslessly, so the result equals the
    direct ``groupBy(keys)`` exactly; only the shuffle layout changes.
    """
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in value_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in value_cols],
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner-join a skewed fact against a small dim, salt-split per task.

    The dim is exploded ``n_salts``× (still broadcast-sized) and the fact's
    deterministic salt picks one replica, so a hot key's rows no longer
    co-locate. Join cardinality and columns match the plain join exactly.
    """
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = with_salt(fact, salt_from, n_salts).join(
        F.broadcast(salted_dim), [key, "_salt"], "inner"
    )
    return out.drop("_salt")
