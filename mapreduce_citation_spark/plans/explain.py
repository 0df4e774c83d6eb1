"""Plan-inspection helpers.

Scale discipline is enforced by tests, not hope: these helpers let a
test assert that a filter actually reached the parquet scan
(PushedFilters), that a scan prunes columns (ReadSchema), that a dim
join is broadcast, or that an operator stays inside whole-stage
codegen. The reference hand-builds its physical plan (SURVEY.md §4);
here the physical plan is Catalyst's, and the tests pin the properties
we rely on at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text that ``df.explain(mode)`` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for n in needles:
        assert n.lower() in plan.lower(), f"{n!r} not found in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for n in needles:
        assert n.lower() not in plan.lower(), f"{n!r} unexpectedly in plan:\n{plan}"
    return plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names each scan actually reads (one list per scan)."""
    plan = explain_str(df, "formatted")
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans
