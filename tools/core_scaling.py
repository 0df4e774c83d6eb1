"""Core-scaling measurement: the same queries at low vs high core
count (separate JVMs — ``local[N]`` is fixed per session), with the
bench methodology (1 untimed warm + N timed, median, per-query cache
clear) and cal probes per process.

Purpose (r15, VERDICT r14 #2): the driver's 8-vs-32-core block at
sf0.1 is structurally flat because every driver fixture is a single
parquet file with ONE row group — a scan can never exceed one task,
and at 0.2–8 s per query the extra shuffle-partition machinery costs
more than 24 extra cores return. The driver tree is read-only, so the
demonstration runs on repo-local fixtures instead:

- ``benchdata/sf0.1rg`` (tools/repack_rowgroups.py): byte-identical
  content, multi-row-group — isolates the row-group effect;
- ``benchdata/sf1`` (tools/gen_sf.py): ×10 data in PER_THREAD parquet
  directories — enough work for parallelism to beat fixed overhead.

A ratio (low-core median / high-core median) well above 1 on the
bigger fixtures demonstrates the plans parallelize; the flat driver
block is fixture geometry, not engine serialism. NOTE the two core
counts run minutes apart on a drifting VM — each process records cal
probes, and the evidence table stays a single run (CLAUDE.md).

Usage: python tools/core_scaling.py [--sf-dir DIR] [--cpus 8,32]
       [--runs 3] [--json PATH] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEFAULT_QUERIES = (
    "citation_pagerank",
    "corpus_curation_funnel",
    "embedding_kmeans",
    "dedup_minhash_lsh",
    "dedup_incremental_ingest",
    "q21_waiting_suppliers",
)


def child(args: list[str]) -> int:
    sf_dir = args[args.index("--sf-dir") + 1]
    runs_n = int(args[args.index("--runs") + 1])
    names = args[args.index("--queries") + 1].split(",")

    from bench import _calibrate

    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("core-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    out: dict = {
        "cpus": spark.sparkContext.master,
        "cal_before": _calibrate(),
        "queries": {},
    }
    for name in names:
        fn = specs[name].fn
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(runs_n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = {
            "runs": runs,
            "median": sorted(runs)[len(runs) // 2],
        }
    out["cal_after"] = _calibrate()
    print("CHILD_JSON " + json.dumps(out))
    return 0


def main(args: list[str]) -> int:
    if "--child" in args:
        return child(args)
    sf_dir = "/root/testdata/sf0.1"
    cpus = (8, 32)
    runs_n = 3
    json_path = None
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--cpus" in args:
        cpus = tuple(int(c) for c in args[args.index("--cpus") + 1].split(","))
    if "--runs" in args:
        runs_n = int(args[args.index("--runs") + 1])
    if "--json" in args:
        json_path = args[args.index("--json") + 1]
    names = [a for a in args if not a.startswith("--")
             and args[args.index(a) - 1] not in
             ("--sf-dir", "--cpus", "--runs", "--json")]
    names = names or list(DEFAULT_QUERIES)

    report: dict = {"sf_dir": sf_dir, "runs": runs_n, "by_cpus": {}}
    for n in cpus:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--sf-dir", sf_dir, "--runs", str(runs_n),
             "--queries", ",".join(names)],
            env=env, capture_output=True, text=True, cwd=HERE,
        )
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CHILD_JSON ")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"child at cpus={n} produced no report")
        report["by_cpus"][str(n)] = json.loads(line[-1][len("CHILD_JSON "):])
        print(f"cpus={n} done", file=sys.stderr)
    lo, hi = str(min(cpus)), str(max(cpus))
    report["ratio_low_over_high"] = {
        q: round(
            report["by_cpus"][lo]["queries"][q]["median"]
            / report["by_cpus"][hi]["queries"][q]["median"],
            3,
        )
        for q in names
    }
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
