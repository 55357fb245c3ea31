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

    # detail=True: the raw (qid, rank, label, distance, recall) frame — the
    # queries() surface now returns the per-query invariant row instead
    df = getattr(e, name)(spark, sf_dir, detail=True)
    assert "recall" in df.columns
    rows = df.collect()
    assert rows, name
    per_qid = {r["qid"]: r["recall"] for r in rows}
    mean_recall = sum(per_qid.values()) / len(per_qid)
    assert mean_recall >= FLOORS[name], (name, mean_recall)


@pytest.mark.parametrize("name", sorted(FLOORS))
def test_ann_entry_invariant_row_matches_oracle_constants(spark, sf_dir, name):
    """The queries() surface emits (qid, k_returned, recall_ok, admissible)
    rows that must equal the constant TRUE oracle (VERDICT r5 task 5)."""
    import __spark_entry__ as e

    rows = e.queries()[name](spark, sf_dir).collect()
    assert [r["qid"] for r in rows] == list(range(10))
    for r in rows:
        assert r["k_returned"] == 10, (name, r)
        assert r["recall_ok"] is True, (name, r)
        assert r["admissible"] is True, (name, r)
