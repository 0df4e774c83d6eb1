"""Plan audit: for every registered query, count table scans,
shuffles, broadcasts, and driver-unfriendly shapes in the ANALYZED
physical plan at sf0.01, and flag suspicious patterns:

- a table scanned more than once (usually a missing reuse/window
  rewrite — sometimes legitimate, e.g. genuinely different filters),
- CartesianProduct / BroadcastNestedLoopJoin anywhere (cross-ish join
  that isn't an intentional 1-row scalar fold),
- row-at-a-time PythonUDF (BatchEvalPython) — the non-Arrow slow path.

Usage: python tools/audit_plans.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")


def main() -> None:
    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    flagged = 0
    for name, spec in all_specs().items():
        if only and name not in only:
            continue
        if "streaming" in spec.tags:
            print(f"SKIP  {name}: live streaming query (plan is per-batch)")
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {str(e)[:120]}")
            flagged += 1
            continue
        scans = Counter(re.findall(r"file:[^\]\s]*?/(\w+)\.parquet", plan))
        issues = []
        multi = {t: c for t, c in scans.items() if c > 1}
        if multi:
            issues.append(f"multi-scan {multi}")
        if "CartesianProduct" in plan:
            issues.append("CartesianProduct")
        nlj = plan.count("BroadcastNestedLoopJoin")
        if nlj:
            # 1-row scalar crossJoins legitimately use BNLJ; flag only
            # when the build side isn't an aggregate-to-one-row subtree
            issues.append(f"BroadcastNestedLoopJoin x{nlj} (check 1-row scalar)")
        if "BatchEvalPython" in plan:
            issues.append("row-at-a-time PythonUDF")
        n_sh = plan.count("Exchange hashpartitioning")
        n_bc = plan.count("BroadcastExchange")
        status = "FLAG " if issues else "ok   "
        if issues:
            flagged += 1
        print(f"{status}{name}: shuffles={n_sh} bcasts={n_bc} scans={dict(scans)}"
              + (f"  << {'; '.join(issues)}" if issues else ""))
    print(f"\n{flagged} flagged")


if __name__ == "__main__":
    main()
