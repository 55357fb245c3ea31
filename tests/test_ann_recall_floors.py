"""Recall floors for the four rows-only ann_* contract entries (VERDICT r3
task 8): each entry now carries a per-qid `recall` column computed against
the exact top-k inside the query itself, so the driver's rows-only record
self-evidences quality.  These floors pin the same numbers."""

import pytest

FLOORS = {
    "ann_ivf_knn": 0.6,
    "ann_lsh_knn": 0.9,
    "ann_hnsw_knn": 0.9,
    "ann_ivfpq_knn": 0.5,
}


@pytest.mark.parametrize("name", sorted(FLOORS))
def test_ann_entry_recall_floor(spark, sf_dir, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_dir)
    assert "recall" in df.columns
    rows = df.collect()
    assert rows, name
    per_qid = {r["qid"]: r["recall"] for r in rows}
    mean_recall = sum(per_qid.values()) / len(per_qid)
    assert mean_recall >= FLOORS[name], (name, mean_recall)
