"""Attribute streaming_funnel_left_outer's 4× run spread (r8 verdict,
next-round #4: STREAM_BENCH_r8 measured 12.2 / 29.3 / 52.6 s for the
same 200k-row stream).

Same-session repeated measurement with full per-batch progress
capture: a listener records every micro-batch's ``durationMs``
breakdown (triggerExecution / addBatch / getBatch / walCommit /
commitOffsets) plus state-store metrics, so the variance can be
attributed to a component instead of guessed. The family function is
run N times back-to-back in one session (house drift discipline);
each run's wall time is paired with ITS batches' durations and the
idle gap (wall − Σ batch durations) — the settle/poll/startup term
the verdict suspected.

Usage: python tools/probe_funnel_outer.py [--runs N] [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _ProgressTap(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(json.loads(p.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main(args: list[str]) -> int:
    runs_n, json_path = 7, None
    if "--runs" in args:
        runs_n = int(args[args.index("--runs") + 1])
    if "--json" in args:
        json_path = args[args.index("--json") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import _calibrate

    from mapreduce_citation_spark.operators.streaming_queries import (
        streaming_funnel_left_outer,
    )
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("probe-funnel-outer")
    spark.sparkContext.setLogLevel("ERROR")
    tap = _ProgressTap()
    spark.streams.addListener(tap)

    def settle() -> None:
        last, t0 = len(tap.progress), time.time()
        while time.time() - t0 < 10:
            time.sleep(1.0)
            if len(tap.progress) == last:
                return
            last = len(tap.progress)

    streaming_funnel_left_outer(spark, sf_dir).count()  # warmup
    settle()

    report: dict = {"sf_dir": sf_dir, "cal_before": _calibrate(), "runs": []}
    for _ in range(runs_n):
        settle()
        mark = len(tap.progress)
        t0 = time.perf_counter()
        streaming_funnel_left_outer(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        settle()
        batches = []
        for p in tap.progress[mark:]:
            d = p.get("durationMs", {})
            so = p.get("stateOperators", [])
            batches.append({
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "triggerExecution_ms": d.get("triggerExecution"),
                "addBatch_ms": d.get("addBatch"),
                "getBatch_ms": d.get("getBatch"),
                "latestOffset_ms": d.get("latestOffset"),
                "walCommit_ms": d.get("walCommit"),
                "commitOffsets_ms": d.get("commitOffsets"),
                "state_commit_ms": sum(
                    s.get("commitTimeMs", 0) or 0 for s in so),
                "state_rows_total": sum(
                    s.get("numRowsTotal", 0) or 0 for s in so),
                "state_mem_bytes": sum(
                    s.get("memoryUsedBytes", 0) or 0 for s in so),
            })
        trig = sum(b["triggerExecution_ms"] or 0 for b in batches) / 1000.0
        report["runs"].append({
            "wall_sec": round(wall, 3),
            "sum_trigger_sec": round(trig, 3),
            "idle_gap_sec": round(wall - trig, 3),
            "n_batches": len(batches),
            "batches": batches,
        })
        print(f"  wall {wall:.2f}s, trigger sum {trig:.2f}s, "
              f"gap {wall - trig:.2f}s, {len(batches)} batches",
              file=sys.stderr)

    walls = sorted(r["wall_sec"] for r in report["runs"])
    report["wall_median_sec"] = walls[len(walls) // 2]
    report["wall_min_max"] = [walls[0], walls[-1]]
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
