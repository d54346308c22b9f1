"""Vector column functions for embedding similarity.

Cosine similarity is computed over **quantized integer** vectors:
``q[i] = FLOOR(x[i] * 2^15)`` — the scaling is a float exponent shift
(exact), FLOOR is exact, and the dot/norm sums are then BIGINT arithmetic,
which is order-insensitive-exact in every engine. The only floating point is
the final ``dot / sqrt(na*nb)`` (IEEE-identical), rounded to 6 decimals.
This removes the float-summation-order hazard that makes naive cosine
implementations diverge between engines at the last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUANT = 32768  # 2^15


def quantize(col: Column) -> Column:
    return F.transform(col, lambda x: F.floor(x * QUANT))


def sq_norm(qv: Column) -> Column:
    return F.aggregate(
        F.transform(qv, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot(qa: Column, qb: Column) -> Column:
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine6(dot_col: Column, na: Column, nb: Column) -> Column:
    return F.round(
        dot_col / F.sqrt(na.cast("double") * nb.cast("double")), 6
    )


# DuckDB mirrors
QUANTIZE_SQL = "list_transform(embedding, x -> CAST(FLOOR(x * 32768) AS BIGINT))"
SQ_NORM_SQL = "CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)"


def dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i] * {b}[i])) AS BIGINT)"
    )
