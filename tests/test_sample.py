"""Seeded exact-size sampling (examples/ai.py:9 'USING SAMPLE 500
(reservoir, 42)' semantics).

Spark's .sample() is Bernoulli — wrong shape for a reservoir sample — so the
engine's idiom is orderBy(rand(seed)).limit(n): exact size, deterministic per
seed.  Seeds aren't portable across engines, so this is pytest-pinned rather
than oracle-checked (the former q20_sample contract row).
"""

import pyspark.sql.functions as F


def _sample(df, n, seed):
    return df.orderBy(F.rand(seed)).limit(n)


def test_exact_size_and_determinism(spark):
    df = spark.range(0, 10_000)
    s1 = _sample(df, 500, 42).collect()
    s2 = _sample(df, 500, 42).collect()
    assert len(s1) == 500
    assert {r["id"] for r in s1} == {r["id"] for r in s2}


def test_different_seeds_differ(spark):
    df = spark.range(0, 10_000)
    a = {r["id"] for r in _sample(df, 500, 42).collect()}
    b = {r["id"] for r in _sample(df, 500, 43).collect()}
    assert a != b


def test_sample_smaller_than_n(spark):
    # n larger than the table: the whole table comes back, no padding
    df = spark.range(0, 100)
    assert len(_sample(df, 500, 42).collect()) == 100
