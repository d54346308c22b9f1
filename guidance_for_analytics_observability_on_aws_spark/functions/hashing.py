"""Engine-portable hashing primitives.

All content hashing is md5-derived so the Spark plans and the DuckDB oracles
compute bit-identical integers: Spark ``conv(substr(md5(x),1,k),16,10)`` ==
DuckDB ``CAST('0x' || substr(md5(x),1,k) AS BIGINT)``.

MinHash uses universal hashing ``(a*h + b) mod P`` over a 28-bit base hash;
operands stay < 2^59 so the arithmetic never overflows int64 in either
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — modulus for the MinHash permutations.
MINHASH_P = 2147483647

#: Fixed (a, b) permutation constants (k=16). Deterministic small-prime
#: progression; shared verbatim by the SQL oracle generator.
MINHASH_AB: list[tuple[int, int]] = [
    (1610612741, 12345),
    (805306457, 67891),
    (402653189, 24681),
    (201326611, 13579),
    (100663319, 97531),
    (50331653, 86421),
    (25165843, 11235),
    (12582917, 81321),
    (6291469, 34553),
    (3145739, 89144),
    (1572869, 23337),
    (786433, 61987),
    (393241, 41077),
    (196613, 71293),
    (98317, 52361),
    (49157, 93251),
]

#: LSH banding: 16 hashes → 4 bands × 4 rows.
MINHASH_BANDS = 4
MINHASH_ROWS = 4


def md5_int(col: Column, nhex: int) -> Column:
    """First ``nhex`` hex chars of md5 as a BIGINT (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, nhex), 16, 10).cast("long")


def md5_int_sql(expr: str, nhex: int) -> str:
    """DuckDB equivalent of :func:`md5_int`."""
    return f"CAST('0x' || substr(md5({expr}), 1, {nhex}) AS BIGINT)"
