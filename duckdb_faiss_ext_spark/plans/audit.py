"""Formatted-plan inspection helpers (no Catalyst extension — read-only)."""

from __future__ import annotations

import re
from typing import Iterable, Optional

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The string `df.explain(mode)` would print."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_plan(
    df: DataFrame,
    require: Iterable[str] = (),
    forbid: Iterable[str] = (),
) -> str:
    """Assert substrings present/absent in the formatted physical plan.

    The scale-contract vocabulary (loose substrings survive cosmetic plan
    format changes across Spark versions):

    - ``PushedFilters`` / ``ReadSchema`` — pushdown + column pruning reached
      the parquet scan;
    - ``BroadcastHashJoin`` vs ``SortMergeJoin`` — small side broadcast;
    - ``WindowGroupLimit`` — per-partition top-k below the exchange;
    - ``TakeOrderedAndProject`` — ORDER BY + LIMIT without a global sort;
    - ``CartesianProduct`` — (forbid) accidental cross join.
    """
    plan = explain_str(df)
    for s in require:
        assert s in plan, f"plan missing required fragment {s!r}:\n{plan}"
    for s in forbid:
        assert s not in plan, f"plan contains forbidden fragment {s!r}:\n{plan}"
    return plan


def plan_counts(df: DataFrame, *fragments: str) -> dict[str, int]:
    """Occurrence count per fragment (e.g. Exchange, HashAggregate)."""
    plan = explain_str(df)
    return {f: plan.count(f) for f in fragments}


def scan_summary(df: DataFrame) -> list[dict[str, Optional[str]]]:
    """One dict per file scan: location, pushed filters, read schema."""
    plan = explain_str(df)
    out: list[dict[str, Optional[str]]] = []
    for scan in re.finditer(r"Scan parquet.*?(?=\n\n|\Z)", plan, re.S):
        block = scan.group(0)
        if "Location" not in block:  # tree-header mention, not a detail block
            continue

        def grab(key: str) -> Optional[str]:
            m = re.search(rf"{key}: \[?([^\n\]]*)", block)
            return m.group(1).strip() if m else None

        out.append(
            {
                "location": grab("Location"),
                "pushed_filters": grab("PushedFilters"),
                "read_schema": grab("ReadSchema"),
            }
        )
    return out
