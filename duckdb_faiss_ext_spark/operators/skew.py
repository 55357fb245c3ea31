"""Skew-mitigation utilities for hot-key joins at scale.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
transparently; salting is the explicit tool for the remaining case — a
shuffle join where one key dominates (e.g. a near-dup bucket with millions of
members, or a degenerate LSH band).

`salted_join`: replicate the small side R times, salt the big side's key with
hash(row)%R — the hot key's rows spread over R reducers instead of one.
Result is identical to a plain inner equi-join (verified in tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on column `on`, salted `salt` ways.

    big gets a per-row salt in [0, salt); small is exploded x salt so every
    (key, salt) pair exists on the build side.  Only worth it when `small`
    is genuinely small (it is replicated salt times)."""
    assert how in ("inner", "left"), "salting only meaningful for inner/left"
    salted_big = big.withColumn(
        "_salt", (F.abs(F.xxhash64(*big.columns)) % salt).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
