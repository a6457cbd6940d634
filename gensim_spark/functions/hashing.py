"""Deterministic cross-engine hashing helpers.

``hash60`` produces the same value in Spark SQL and ANSI/DuckDB SQL
(``('0x' || substr(md5(x), 1, 15))::BIGINT``), which makes every
hash-derived operator (minhash, simhash, LSH buckets, fingerprints)
oracle-checkable bit-for-bit. 15 hex digits = 60 bits → always positive,
fits in a signed 64-bit integer.

xxhash64 (Spark-native, fastest JVM path) is used where cross-engine
equality is not required (HashDictionary scale path, salting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """First 60 bits of md5(utf8(col)) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """The DuckDB-equivalent expression for :func:`hash60`."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


def hash60_py(s: str) -> int:
    """Pure-python replica of :func:`hash60` (tests / driver-side models)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def seeded(col: Column, seed: int) -> Column:
    """Seed-perturbed hash: hash60(seed || ':' || col)."""
    return hash60(F.concat(F.lit(f"{seed}:"), col.cast("string")))


def seeded_sql(expr: str, seed: int) -> str:
    return hash60_sql(f"'{seed}:' || CAST({expr} AS VARCHAR)")
