"""Measure the ingest-base disk index's load-vs-build split at the
100× corpus point (r10, pairs with r9 verdict #7): the index exists to
let a restarted ingest stream skip the O(base) prep — this probe puts
numbers on that claim at the 500k-doc corpus (437.5k-doc base, the %8
ingest cohort's complement).

Timed phases (one session, same methodology caveats as every probe —
single run per phase, this is an attribution probe not a drift
tracker):

- build: `prepare_ingest_base(base).materialize()` — the per-process
  cost a restart USED to pay (shingle explode, df aggregation, per-doc
  ranking window, eager cache fill);
- save: writing the four artifact frames to the fingerprint-keyed
  parquet index (one-time, amortized across restarts);
- fingerprint: the content scan every load-or-build pays;
- load: `load_or_build_ingest_base` against the populated index —
  four columnar reads + the layout shuffles + eager fill.

Equivalence is asserted, not assumed: per-frame row counts match
between the built and loaded artifacts, and one 625-doc delta batch
is reported against BOTH — rejection sets must be identical.

Usage: python tools/probe_ingest_index.py [--json PATH]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

CORPUS = "benchdata/docs_x100"


def main(args: list[str]) -> int:
    json_path = None
    if "--json" in args:
        json_path = args[args.index("--json") + 1]

    from pyspark.sql import functions as F

    from bench import _calibrate

    from mapreduce_citation_spark.operators.dedup import (
        _docs,
        ingest_base_fingerprint,
        ingest_report_against_base,
        load_or_build_ingest_base,
        prepare_ingest_base,
        _INGEST_BASE_PARTS,
    )
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("probe-ingest-index")
    spark.sparkContext.setLogLevel("ERROR")

    d = _docs(spark, CORPUS)
    base = d.filter(F.col("doc_id") % 8 != 0)
    delta = d.filter((F.col("doc_id") % 8 == 0) & (F.col("doc_id") < 10000))

    report: dict = {"corpus": CORPUS, "cal": _calibrate()}

    t0 = time.perf_counter()
    built = prepare_ingest_base(base).materialize()
    report["build_sec"] = round(time.perf_counter() - t0, 3)

    index_dir = tempfile.mkdtemp(prefix="ingest_index_probe_")
    try:
        t0 = time.perf_counter()
        fp = ingest_base_fingerprint(base)
        report["fingerprint_sec"] = round(time.perf_counter() - t0, 3)

        root = os.path.join(index_dir, f"ingest_base_{fp}")
        t0 = time.perf_counter()
        for name, _keys in _INGEST_BASE_PARTS:
            getattr(built, name).write.mode("overwrite").parquet(
                os.path.join(root, f"{name}.parquet")
            )
        report["save_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        loaded = load_or_build_ingest_base(spark, base, index_dir)
        report["load_sec"] = round(time.perf_counter() - t0, 3)

        counts = {}
        for name, _keys in _INGEST_BASE_PARTS:
            nb, nl = getattr(built, name).count(), getattr(loaded, name).count()
            assert nb == nl, f"{name}: built {nb} rows vs loaded {nl}"
            counts[name] = nb
        report["frame_rows"] = counts

        def reject(arts) -> frozenset:
            caches: list = []
            try:
                return frozenset(
                    tuple(r)
                    for r in ingest_report_against_base(
                        delta, arts, caches
                    ).collect()
                )
            finally:
                for c in caches:
                    c.unpersist()

        rb, rl = reject(built), reject(loaded)
        assert rb == rl, "rejection sets differ between built and loaded base"
        report["delta_docs"] = delta.count()
        report["rejections"] = len(rb)
        loaded.unpersist()
        built.unpersist()
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
