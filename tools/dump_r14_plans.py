"""Dump .explain("formatted") for bench-headline queries into
plans/r14/<query>_<tag>.txt — the optimization round's before/after
plan evidence (guide §1: capture the plan shape — Exchange count,
join strategy, PushedFilters/ReadSchema, codegen spans, Python
boundary nodes — before and after each change).

Usage: python tools/dump_r14_plans.py TAG [name ...]
       (TAG = before|after|...; default query set = bench headline)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(args: list[str]) -> int:
    tag = args[0] if args else "before"
    names = args[1:]

    from mapreduce_citation_spark.plans import explain_str
    from mapreduce_citation_spark.registry import all_specs, bench_queries
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("plan-dump-r14")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs() if names else bench_queries()
    if names:
        specs = {n: specs[n] for n in names}
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, spec in specs.items():
        df = spec.fn(spark, SF_DIR)
        plan = explain_str(df, "formatted")
        plan = re.sub(r", \[plan_id=\d+\]", "", plan)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        # one-line plan-shape digest for quick triage (counts TREE
        # operator occurrences: "OpName (n)")
        def n(op: str) -> int:
            # tree nodes print as e.g. "SortMergeJoin Inner (15)" or
            # "Scan parquet  (1)" — allow qualifier words before (n)
            return len(re.findall(rf"\b{op}[A-Za-z ]*\(\d+\)", plan))

        print(
            f"{name}: exch={n('Exchange')} "
            f"bcast={n('BroadcastExchange')} "
            f"smj={n('SortMergeJoin')} shj={n('ShuffledHashJoin')} "
            f"bhj={n('BroadcastHashJoin')} bnlj={n('BroadcastNestedLoopJoin')} "
            f"py={n('BatchEvalPython') + n('ArrowEvalPython') + n('MapInPandas') + n('MapInArrow') + n('FlatMapGroupsInPandas')} "
            f"scans={n('Scan parquet')}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
