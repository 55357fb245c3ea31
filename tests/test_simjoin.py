"""similarity_join: the left side must stream through bounded driver blocks
(VERDICT r1 #3 — r1 collected the whole left side with toPandas)."""

import numpy as np
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.operators import topk
from duckdb_faiss_ext_spark.operators.simjoin import similarity_join
from conftest import gen_vectors


def test_left_side_streams_in_blocks(spark, monkeypatch):
    """With block=16 and chunk=8, an 80-row left side crosses 5 blocks and
    10 broadcast chunks; results must equal the single-block run."""
    right = gen_vectors(60, 8, 0)
    left = gen_vectors(80, 8, 123)
    rdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(right)],
        "id bigint, vector array<float>",
    )
    ldf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(left)],
        "id bigint, vector array<float>",
    )

    def run():
        return sorted(
            (r["id"], r["rank"], r["id_right"])
            for r in similarity_join(ldf, rdf, 3, metric="INNER_PRODUCT").collect()
        )

    base = run()
    monkeypatch.setattr(topk, "MAX_QUERY_BLOCK", 16)
    monkeypatch.setattr(topk, "MAX_QUERY_BATCH", 8)
    chunked = run()
    assert chunked == base
    # and the numpy golden agrees
    s = left.astype(np.float32) @ right.astype(np.float32).T
    gold = np.argsort(-s, axis=1, kind="stable")[:, :3]
    expect = sorted(
        (i, rk, int(gold[i, rk])) for i in range(80) for rk in range(3)
    )
    assert chunked == expect


def test_empty_left_side(spark):
    rdf = spark.createDataFrame(
        [(0, [1.0, 0.0])], "id bigint, vector array<float>"
    )
    ldf = spark.createDataFrame([], "id bigint, vector array<float>")
    assert similarity_join(ldf, rdf, 2).count() == 0
