"""Median-of-N pin extractor for the vec1m re-pin batch (r11)."""
import json, statistics, sys, glob

keys = ["vec1m_flat_build_sec", "vec1m_build_sec", "vec1m_warm_sec",
        "vec1m_knn_exact", "vec1m_knn_np4", "vec1m_knn_np16",
        "vec1m_filtered_p1", "vec1m_filtered_p50",
        "vec1m_bulk_np16", "vec1m_sq8_build_sec", "vec1m_sq8_knn"]
runs = []
for p in sorted(glob.glob("tools/out_r11/vec1m_pin*_full.json")):
    with open(p) as f:
        runs.append((p, json.load(f)["queries"]))
for p, q in runs:
    print(p, "ctrl", q.get("vec1m_ctrl_ratio"), "load", q.get("host_load_1m"))
print()
for k in keys:
    vals = [q[k] for _, q in runs if k in q]
    if not vals:
        print(f"{k}: MISSING"); continue
    med = statistics.median(vals)
    print(f'    "{k}": {round(med, 2)},  # runs: {[round(v,2) for v in vals]}')
for k in ("vec1m_recall_np4", "vec1m_recall_np16", "vec1m_sq8_recall",
          "vec1m_corpus_max_share"):
    vals = [q.get(k) for _, q in runs]
    print(f"# {k}: {vals}")
