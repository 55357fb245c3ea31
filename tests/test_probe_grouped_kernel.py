"""Per-cluster grouped scoring in the probed IVF kernel (VERDICT r6 task 5).

SCALE.md r6 point 2: a 48-query batch at nlist=2048 ran at batch-UNION
coverage (73-98% of rows) even though each query probed 5% — because the
old kernel computed the full nq x batch matmul and masked afterwards.  The
kernel now scores only (probing query, cluster-row) pairs when probing is
sparse, so MACs track the per-query scan fraction.  These tests pin result
IDENTITY between the grouped (sparse) and full-matmul (dense) branches and
against a numpy golden of faiss IVF nprobe semantics."""

import numpy as np
import pyspark.sql.functions as F
import pytest

import duckdb_faiss_ext_spark.operators.topk as topk_mod
from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.metrics import pairwise, topk_indices


@pytest.fixture()
def eng(spark):
    e = FaissSparkEngine(spark)
    yield e
    for name in e.list_indexes():
        e.destroy(name)


def _vec_df(spark, x, lo=0):
    return spark.createDataFrame(
        [(lo + i, [float(v) for v in row]) for i, row in enumerate(x)],
        "label bigint, vector array<float>",
    )


def _ivf_golden(x, centroids, q, nprobe, k):
    """faiss IVF L2 semantics: per query, exact top-k within the nprobe
    nearest clusters (squared L2, label-ascending ties)."""
    assign = np.argmin(pairwise(x, centroids, "L2"), axis=1)
    qc = pairwise(q, centroids, "L2")
    probed = np.argsort(qc, axis=1, kind="stable")[:, :nprobe]
    out = {}
    for qi in range(len(q)):
        sel = np.flatnonzero(np.isin(assign, probed[qi]))
        d = pairwise(q[qi : qi + 1], x[sel], "L2")[0]
        order = np.lexsort((sel, d))[:k]
        out[qi] = [(int(sel[j]), round(float(d[j]), 4)) for j in order]
    return out


def _run(eng, spark, x, q, nprobe, k):
    res = eng.search_flat(
        "ivfg", k, _vec_df(spark, q).selectExpr("label as qid", "vector"),
        params={"nprobe": nprobe},
    ).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append((r["label"], round(r["distance"], 4)))
    return got


def test_sparse_grouped_matches_golden_and_dense(spark, eng, monkeypatch):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3000, 8)).astype(np.float32)
    q = rng.standard_normal((40, 8)).astype(np.float32)
    nprobe, k = 3, 5  # density 3/16 = 0.19 -> grouped branch by default
    eng.create("ivfg", 8, "IDMap,IVF16,Flat", metric_type="L2")
    eng.add("ivfg", _vec_df(spark, x))
    golden = _ivf_golden(x, eng.registry.get("ivfg").centroids, q, nprobe, k)
    grouped = _run(eng, spark, x, q, nprobe, k)
    assert grouped == golden
    # force the dense full-matmul branch: identical output
    monkeypatch.setattr(topk_mod, "DENSE_MASK_THRESHOLD", -1.0)
    assert _run(eng, spark, x, q, nprobe, k) == golden
    # force the grouped branch even at this density: still identical
    monkeypatch.setattr(topk_mod, "DENSE_MASK_THRESHOLD", 2.0)
    assert _run(eng, spark, x, q, nprobe, k) == golden


def test_grouped_kernel_ip_metric(spark, eng, monkeypatch):
    """IP (descending) through both branches: identical results."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2000, 8)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[::100]
    eng.create("ivfg", 8, "IDMap,IVF16,Flat", metric_type="INNER_PRODUCT")
    eng.add("ivfg", _vec_df(spark, x))
    monkeypatch.setattr(topk_mod, "DENSE_MASK_THRESHOLD", 2.0)  # force grouped
    grouped = _run(eng, spark, x, q, nprobe=4, k=3)
    monkeypatch.setattr(topk_mod, "DENSE_MASK_THRESHOLD", -1.0)  # force dense
    dense = _run(eng, spark, x, q, nprobe=4, k=3)
    assert grouped == dense
    # self-hits at rank 0 with IP ~ 1.0
    assert all(v[0][0] == qi * 100 for qi, v in grouped.items())
