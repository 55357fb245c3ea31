"""SQL-function surface registration.

The reference exposes its capability as SQL functions inside the host engine
(faiss_search & co, registered in LoadInternal — faiss_extension.cpp:
1025-1149).  Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN <expr>) let us give
users the same experience for the scalar surface: pure SQL-body functions,
fully codegen'd (no Python), usable from `spark.sql` anywhere.

The table-valued surface (search itself returns per-query top-k sets) stays
on the DataFrame API — `FaissSparkEngine.search` / `similarity_join` — since
Spark has no user-defined table functions in SQL without registering Python
UDTFs (slow path we deliberately avoid).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQL_FUNCTIONS: dict[str, str] = {
    # vector scalar surface (DuckDB twins: list_inner_product/list_distance/
    # list_cosine_similarity; reference baseline fn array_negative_inner_product
    # go/benches_c.go:207)
    "vec_inner_product": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    ),
    "vec_negative_inner_product": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "-aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    ),
    "vec_l2sq": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
    ),
    "vec_cosine": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / "
        "(sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, x) -> acc + x)) * "
        "sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)))"
    ),
    # deterministic cross-engine rounding (see functions/vector.round_half_up)
    "round_half_up": (
        "(x DOUBLE, s INT) RETURNS DOUBLE RETURN "
        "floor(x * power(10D, s) + 0.5D) / power(10D, s)"
    ),
    # text surface
    "text_token_count": (
        "(t STRING) RETURNS BIGINT RETURN "
        "CAST(size(split(trim(t), '\\\\s+')) AS BIGINT)"
    ),
    "text_fingerprint": (
        "(t STRING) RETURNS STRING RETURN "
        "md5(regexp_replace(lower(trim(t)), '\\\\s+', ' '))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the engine's scalar SQL surface into the session; returns the
    registered names."""
    for name, body in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(_SQL_FUNCTIONS)
