"""Testdata loaders + the reference's scan surface (SURVEY.md §2.2).

The reference reads CSV (w/ header inference), gzipped CSV, JSONL and globbed
.jsonl.gz through DuckDB's scanners (test/sql/faiss.test:11, examples/ai.py:7,
go/benches_c.go:41,:82).  Spark's readers cover all of these natively; the
helpers here only pin the engine-facing conventions (one call per format,
schema inference on).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
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


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every driver-generated parquet table; optionally register temp
    views so Spark SQL sees the same names the DuckDB oracle does."""
    out: dict[str, DataFrame] = {}
    # events.ts is parquet TIMESTAMP(NANOS): Spark 4 needs this runtime conf
    # to read it (as BIGINT nanos) on sessions not built by get_spark()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV / .csv.gz scan with header + schema inference (faiss.test:11,
    examples/ai.py:7 — Spark decompresses .gz transparently)."""
    return spark.read.csv(path, header=header, inferSchema=True)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL / globbed .jsonl.gz scan (go/benches_c.go:41, :82, :112)."""
    return spark.read.json(path)
