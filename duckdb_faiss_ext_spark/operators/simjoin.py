"""similarity_join — top-k join between two vector DataFrames.

SURVEY.md §7 M6: beyond the reference's named-index API, pipelines want a
direct "for each left row, the k nearest right rows" join.  Physical plan
reuses the exact-kNN kernel: the LEFT side is chunk-broadcast (8192 rows per
chunk), the RIGHT side (the big corpus) streams through mapInPandas with
per-partition top-k, one small merge shuffle per chunk — right side never
shuffles whole, left side never exceeds broadcast budget.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from duckdb_faiss_ext_spark.operators.topk import exact_knn_flat


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    metric: str = "INNER_PRODUCT",
    left_id: str = "id",
    left_vec: str = "vector",
    right_id: str = "id",
    right_vec: str = "vector",
    dtype=None,
) -> DataFrame:
    """(left_id, rank, right_id, distance) — k nearest right rows per left row.

    ``dtype`` numpy float type for the distance kernel (default float32,
    FAISS parity; float64 for the double-precision oracle-checked path)."""
    import numpy as np

    q = left.select(F.col(left_id).alias("qid"), F.col(left_vec).alias("vector"))
    corpus = right.select(
        F.col(right_id).alias("label"), F.col(right_vec).alias("vector")
    )
    flat = exact_knn_flat(
        corpus, q, k, metric=metric, dtype=dtype if dtype is not None else np.float32
    )
    return flat.select(
        F.col("qid").alias(left_id),
        "rank",
        F.col("label").alias(right_id if right_id != left_id else f"{right_id}_right"),
        "distance",
    )
