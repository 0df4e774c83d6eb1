"""Scaling-curve audit: wall-time vs input size for the heavy
operator families, across every fixture scale factor.

A single sf0.1 timing can't distinguish linear from quadratic
growth; three points (sf0.001 / sf0.01 / sf0.1 — 100× input spread)
can. For each family this runs the registered query at each SF with
the bench methodology (1 warmup + 3 timed runs, median) and prints a
JSON report plus a markdown table for SCALE.md, including the
time-ratio vs input-ratio comparison between adjacent SFs.

Reading the table: t(10×input)/t(1×input) ≈ 10 means linear, ≈ 100
means quadratic. Small-SF points carry a fixed per-job scheduling
overhead (~0.1-0.3 s), so sub-linear ratios at the low end are
expected; the sf0.01 → sf0.1 ratio is the informative one.

Usage: python tools/scaling_curve.py [family ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
# r7: a fourth decade when the generated sf1 fixtures exist
# (tools/gen_sf.py benchdata/sf1 10) — three decades of input spread
_SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchdata", "sf1")
if os.path.isdir(_SF1):
    SF_DIRS = SF_DIRS + (_SF1,)

#: family -> (query name, driving table whose row count is "input size")
FAMILIES = {
    "dedup_minhash_lsh": "documents",
    "dedup_exact_substring_pairs": "documents",
    "dedup_substring_spans": "documents",
    "dedup_substring_strip": "documents",
    "decontaminate_eval_overlap": "documents",
    "knn_ivf_ann": "embeddings",
    "citation_pagerank": "lineitem",
    "citation_pagerank_scale": "lineitem",
    "join_hot_key_salted": "lineitem",
    "embedding_kmeans": "embeddings",
    "corpus_curation_funnel": "documents",
    # r6b additions
    "citation_triangles": "lineitem",
    "citation_kcore": "lineitem",
    "basket_brand_pairs": "lineitem",
    "join_bloom_prefilter": "lineitem",
    "text_bpe_merges": "documents",
    "embedding_kcenter_coreset": "embeddings",
    "multimodal_audio_fp_pairs": "documents",
    "citation_personalized_pagerank": "lineitem",
    "basket_brand_triples": "lineitem",
    # r6c additions (the session's heaviest new families)
    "multimodal_audio_minhash_pairs": "documents",
    "citation_hits": "lineitem",
    "citation_label_propagation": "lineitem",
    "citation_link_prediction": "lineitem",
    "layout_zorder_stats": "lineitem",
    "events_pattern_sequences": "events",
    "interval_overlap_join": "events",
    "stats_ks_two_sample": "orders",
    "embedding_power_iteration": "embeddings",
    "text_pmi_collocations": "documents",
    # r7: the three prefix-offset rewrites (pps joins the file so all
    # three ex-global-window queries carry a curve)
    "corpus_pps_systematic_sample": "documents",
}


def _drain(df) -> None:
    """noop sink: computes every output column on the executors —
    count() lets Catalyst prune projections/joins (r6 find), which
    under-measured the spans/strip rows of the r5 table."""
    df.write.format("noop").mode("overwrite").save()


def main(names: list[str]) -> int:
    from mapreduce_citation_spark.registry import all_specs
    from mapreduce_citation_spark.session import get_spark

    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    todo = {n: t for n, t in FAMILIES.items() if not names or n in names}

    sizes: dict[str, dict[str, int]] = {}
    for sf_dir in SF_DIRS:
        sizes[sf_dir] = {}
        for tbl in set(todo.values()):
            sizes[sf_dir][tbl] = spark.read.parquet(
                os.path.join(sf_dir, f"{tbl}.parquet")
            ).count()

    report: dict[str, dict] = {}
    for name, tbl in todo.items():
        spec = specs[name]
        points = []
        for sf_dir in SF_DIRS:
            _drain(spec.fn(spark, sf_dir))  # warmup
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                _drain(spec.fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            points.append(
                {
                    "sf": os.path.basename(sf_dir),
                    "input_rows": sizes[sf_dir][tbl],
                    "sec": round(sorted(runs)[1], 3),
                }
            )
            print(f"  {name} @ {os.path.basename(sf_dir)}: "
                  f"{points[-1]['sec']}s ({points[-1]['input_rows']} rows)",
                  file=sys.stderr)
        ratios = []
        for lo, hi in zip(points, points[1:]):
            ratios.append(
                {
                    "input_x": round(hi["input_rows"] / lo["input_rows"], 1),
                    "time_x": round(hi["sec"] / lo["sec"], 1),
                }
            )
        report[name] = {"table": tbl, "points": points, "ratios": ratios}

    print(json.dumps(report, indent=1))
    # markdown for SCALE.md
    print("\n| family | rows 0.001/0.01/0.1 | sec 0.001/0.01/0.1 | "
          "time× step 1 | time× step 2 |", file=sys.stderr)
    print("| --- | --- | --- | --- | --- |", file=sys.stderr)
    for name, r in report.items():
        p = r["points"]
        print(
            f"| `{name}` | "
            + "/".join(str(x["input_rows"]) for x in p)
            + " | "
            + "/".join(f"{x['sec']:.2f}" for x in p)
            + " | "
            + f"{r['ratios'][0]['time_x']}× | {r['ratios'][1]['time_x']}× |",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
