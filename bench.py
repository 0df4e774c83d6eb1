"""Benchmark harness — the driver runs this per-round at sf0.1.

Runs the registry's bench-flagged headline queries on
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (results drained via count or a
bounded collect) — timings measure the full distributed plan, not lazy
construction. A warmup pass primes the JVM/codegen caches, then each
query is timed THREE times and the MEDIAN reported — a single GC
pause or compilation stall on a contended 32-thread local JVM must
not masquerade as a plan regression (round 1: the driver measured
q3 at 31.3s single-shot; it reproduces at 1.1s warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _calibrate() -> dict[str, float]:
    """~0.5 s CPU-throughput probe (single thread + all threads).

    This box is a VM whose effective parallel CPU capacity varies
    several-fold between measurement windows (host neighbors are
    invisible from the guest). The probe is recorded alongside the
    timings so a cross-round wall-time delta can be attributed to
    host capacity vs plan changes: aggregate throughput / single
    thread ≈ the cores actually available to the 32-thread JVM."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    def work(mb: int) -> None:
        h = hashlib.sha256()
        for _ in range(mb):
            h.update(b"x" * 1_000_000)

    t0 = time.perf_counter()
    work(50)
    one = 50 / (time.perf_counter() - t0)
    n = os.cpu_count() or 1
    t0 = time.perf_counter()
    with ThreadPoolExecutor(n) as ex:
        list(ex.map(work, [50] * n))
    alln = n * 50 / (time.perf_counter() - t0)
    return {
        "cal_1t_mbps": round(one),
        "cal_all_mbps": round(alln),
        "cal_effective_cores": round(alln / one, 1),
    }


def _prior_artifact(sf: float) -> tuple[str, dict] | None:
    """Latest committed BENCH_r*.json for the SAME scale factor —
    the baseline for the mechanical drift-envelope block (r8 verdict,
    next-round #8: stop hand-computing cal-normalized ratios in
    SCALE.md prose)."""
    import glob
    import re

    best: tuple[int, str] | None = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        # driver-recorded rounds wrap the bench line under "parsed";
        # locally-run artifacts (e.g. the sf1 series) are the raw line
        data = data.get("parsed", data)
        if data.get("sf") != sf or "queries" not in data:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, path, data)
    if best is None:
        return None
    return os.path.basename(best[1]), best[2]


def _compare_block(
    timings: dict[str, float], cal: dict[str, float], sf: float
) -> dict | None:
    """Per-query raw and cal-normalized ratios vs the prior committed
    artifact. Normalized ratio scales the raw ratio by the window's
    measured CPU capacity (time × throughput ≈ work): ``norm_1t``
    uses the single-thread probe, ``norm_all`` the all-threads probe;
    a query is flagged ``beyond_envelope`` only when BOTH normalized
    ratios exceed 1.2 (the house envelope) — a raw ratio alone never
    proves a regression on this drifting VM (CLAUDE.md)."""
    prior = _prior_artifact(sf)
    if prior is None:
        return None
    fname, base = prior
    c1 = cal["cal_1t_mbps"] / base.get("cal_1t_mbps", cal["cal_1t_mbps"])
    ca = cal["cal_all_mbps"] / base.get("cal_all_mbps", cal["cal_all_mbps"])
    queries: dict[str, dict] = {}
    flagged: list[str] = []
    for name, sec in timings.items():
        psec = base["queries"].get(name)
        if not psec:
            continue
        raw = sec / psec
        entry = {
            "prior_sec": psec,
            "ratio_raw": round(raw, 3),
            "ratio_norm_1t": round(raw * c1, 3),
            "ratio_norm_all": round(raw * ca, 3),
        }
        if entry["ratio_norm_1t"] > 1.2 and entry["ratio_norm_all"] > 1.2:
            entry["beyond_envelope"] = True
            flagged.append(name)
        queries[name] = entry
    return {
        "baseline": fname,
        "cal_1t_ratio": round(c1, 3),
        "cal_all_ratio": round(ca, 3),
        "beyond_envelope": sorted(flagged),
        "queries": queries,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from mapreduce_citation_spark.registry import bench_queries
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = bench_queries()

    def drain(df) -> None:
        # noop sink: computes EVERY output column and discards rows on
        # the executors. count() is NOT a valid drain — Catalyst prunes
        # projections and can eliminate whole joins under it (found in
        # r6: the substring spans/strip left join against a unique-key
        # aggregate was being optimized away, so their bench entries
        # timed only the eager cache fill — and in r5, ONLY that fill).
        df.write.format("noop").mode("overwrite").save()

    # Warmup: run every query once so timings measure steady-state
    # execution (JIT + whole-stage-codegen compile amortized), then
    # time five full executions of each and keep the MEDIAN — the
    # heavy iterative entries (6-iteration pageranks) dominate the
    # headline and their per-run variance on this drifting VM would
    # otherwise swamp the other entries' signal (r5 verdict #6).
    for spec in specs.values():
        drain(spec.fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        # r9: clear the SQL cache registry before each query's timed
        # block, then re-warm the query once (untimed) so its timed
        # runs still see their own warm cache (CacheManager dedups by
        # analyzed plan, so this matches every earlier round's
        # semantics). Without the clear, the global warmup pass left
        # ALL queries' persisted frames co-resident — several bench
        # operators persist corpus-sized frames a lazy query function
        # cannot unpersist itself (minhash signatures, ingest shingle
        # streams/prefixes) — and at sf1 that co-residency pressure
        # contaminated unrelated queries' timings (7 spurious
        # beyond-envelope flags in the first r9 sf1 run).
        spark.catalog.clearCache()
        drain(spec.fn(spark, sf_dir))
        runs: list[float] = []
        counts: set[int] = set()
        for i in range(5):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            drain(df)
            runs.append(time.perf_counter() - t0)
            if i < 2:  # untimed determinism spot-check (first two runs)
                counts.add(df.count())
        # real sanity gate: a deterministic query over static parquet
        # must return the same row count on every run
        assert len(counts) == 1, f"{name}: unstable row count {counts}"
        timings[name] = round(sorted(runs)[2], 3)

    cal = _calibrate()
    out = {
        "metric": "headline query wall time at sf" + sf,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        **cal,
    }
    compare = _compare_block(timings, cal, float(sf))
    if compare is not None:
        out["compare"] = compare
    print(json.dumps(out))


if __name__ == "__main__":
    main()
