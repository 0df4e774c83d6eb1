"""Dump .explain("formatted") into plans/r15/<query>_<tag>.txt —
the r15 optimization round's before/after plan evidence (guide §1).

Knows the r15 variant toggles: ``--variant old`` flips every r15
toggle to the pre-r15 shape before building the plans (so "before"
plans can be captured from the optimized tree), ``--variant new``
(default) uses the shipped defaults.

Usage: python tools/dump_r15_plans.py TAG [--variant old|new] [name ...]
       (default query set = bench headline)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (module, attr, old value) for every r15 shape toggle
OLD_TOGGLES = (
    ("mapreduce_citation_spark.operators.pipeline", "FUNNEL_EXACT_DEDUP",
     "window"),
    ("mapreduce_citation_spark.operators.dedup", "PREFIX_RANK", "window"),
    ("mapreduce_citation_spark.operators.text", "BOILER_BASE_CACHE", "none"),
    ("mapreduce_citation_spark.operators.tpch_extra", "Q21_SOLE", "selfjoin"),
)


def main(args: list[str]) -> int:
    tag = args[0] if args else "before"
    variant = "new"
    if "--variant" in args:
        variant = args[args.index("--variant") + 1]
        i = args.index("--variant")
        args = args[:i] + args[i + 2:]
    names = args[1:]

    import importlib

    from mapreduce_citation_spark.plans import explain_str
    from mapreduce_citation_spark.registry import all_specs, bench_queries
    from mapreduce_citation_spark.session import get_spark

    if variant == "old":
        for modname, attr, old in OLD_TOGGLES:
            setattr(importlib.import_module(modname), attr, old)

    spark = get_spark("plan-dump-r15")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs() if names else bench_queries()
    if names:
        specs = {n: specs[n] for n in names}
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, spec in specs.items():
        df = spec.fn(spark, SF_DIR)
        plan = explain_str(df, "formatted")
        plan = re.sub(r", \[plan_id=\d+\]", "", plan)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)

        def n(op: str) -> int:
            return len(re.findall(rf"\b{op}[A-Za-z ]*\(\d+\)", plan))

        print(
            f"{name}: exch={n('Exchange')} "
            f"bcast={n('BroadcastExchange')} "
            f"smj={n('SortMergeJoin')} shj={n('ShuffledHashJoin')} "
            f"bhj={n('BroadcastHashJoin')} "
            f"bnlj={n('BroadcastNestedLoopJoin')} "
            f"py={n('BatchEvalPython') + n('ArrowEvalPython') + n('MapInPandas') + n('MapInArrow') + n('FlatMapGroupsInPandas')} "
            f"win={n('Window')} sort={n('Sort')}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
