"""Physical-plan inspection and audit utilities.

The reference delegates all optimization to DuckDB (SURVEY.md §4: "the
extension implements no query optimizer"); here Catalyst is the optimizer,
and what the engine owes its users is *verifiable plan shape* — filters
pushed to scans, small sides broadcast, top-k applied below exchanges,
partial aggregation.  These helpers make those properties assertable in
tests (tests/test_plans.py) and inspectable by users.
"""

from duckdb_faiss_ext_spark.plans.audit import (
    assert_plan,
    explain_str,
    plan_counts,
    scan_summary,
)

__all__ = ["explain_str", "assert_plan", "plan_counts", "scan_summary"]
