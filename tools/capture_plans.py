"""Capture .explain('formatted') for every declared query (r14 deliverable).

Writes plans/r14/<query>_<tag>.txt for each `__spark_entry__.queries()` entry.
Usage: python tools/capture_plans.py <before|after> [sf_dir] [query ...]

explain() only plans (no execution) for the relational entries; the engine-
backed entries (knn_*/ann_*/similarity/dedup components) build their index /
run bounded routing probes while constructing the DataFrame — that is the
plan the driver's harness times, so it is what we capture.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    import __spark_entry__ as entry
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — capture what we can, loudly
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
