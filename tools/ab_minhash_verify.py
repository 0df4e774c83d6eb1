"""Same-session interleaved A/B: the minhash family's exact-Jaccard
VERIFY plan — shingle-value equijoin (shipped shape) vs per-pair
``array_intersect`` (the ``dedup_clusters`` shape) — r11 verdict
next-round #5, prompted by the judge's advisory: a hot shingle shared
by m candidate docs makes the equijoin emit C(m, 2) rows inside that
value group, while the per-pair intersect is skew-immune (but ships
each doc's whole shingle array once per pair membership).

Two measured surfaces, both with the house 5-per-side alternating
protocol (A B A B ... — window drift hits both sides equally):

1. the 100x generated corpus (organic candidate profile,
   ``tools/gen_corpus.py`` — run scaling_corpus/gen first or this
   generates it);
2. a PLANTED HOT-SHINGLE fixture built in-session: ``n_hot`` docs
   that are near-identical (so every pair is an LSH candidate and
   they share ~all shingles — the adversarial profile for the
   equijoin) plus disjoint filler docs.

Outputs are asserted IDENTICAL (count + sorted sample) between the
two verify modes on both surfaces before any timing is trusted —
these are two plans for the same exact computation.

Usage: python tools/ab_minhash_verify.py [--json PATH]
       [--runs N per side] [--hot N docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

BASE = "/root/testdata/sf0.1"


def main(args: list[str]) -> int:
    json_path, runs, n_hot = None, 5, 200
    if "--json" in args:
        json_path = args[args.index("--json") + 1]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--hot" in args:
        n_hot = int(args[args.index("--hot") + 1])

    from bench import _calibrate
    from tools.gen_corpus import generate

    from mapreduce_citation_spark.operators.dedup import minhash_lsh_pairs
    from mapreduce_citation_spark.session import get_spark
    from mapreduce_citation_spark.sources.readers import load_table

    corpus_dir = "benchdata/docs_x100"
    generate(corpus_dir, 100, BASE)

    spark = get_spark("ab-minhash-verify")
    spark.sparkContext.setLogLevel("ERROR")

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(docs, mode: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        drain(minhash_lsh_pairs(docs, verify=mode))
        return time.perf_counter() - t0

    def equal_outputs(docs) -> dict:
        a = minhash_lsh_pairs(docs, verify="equijoin")
        b = minhash_lsh_pairs(docs, verify="intersect")
        na, nb = a.count(), b.count()
        assert na == nb, f"verify modes disagree on count: {na} vs {nb}"
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0, f"verify modes disagree on {diff} rows"
        return {"pairs": na}

    # planted hot-shingle fixture: n_hot docs sharing a 40-token core
    # (every pair is a candidate AND shares ~all shingles), plus
    # disjoint filler so the pipeline has normal work around the skew
    core = " ".join(f"hot{i:02d}" for i in range(40))
    rows = [(i, f"{core} tail{i:04d}") for i in range(n_hot)]
    rows += [
        (10_000 + i, " ".join(f"f{i:04d}w{j:02d}" for j in range(40)))
        for i in range(2_000)
    ]
    hot = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()

    corpus = load_table(spark, corpus_dir, "documents")

    report: dict = {
        "what": __doc__.split("\n")[0],
        "cal_before": _calibrate(),
        "surfaces": {},
    }
    for name, docs in (("hot_fixture", hot), ("corpus_x100", corpus)):
        surf = {"equal": equal_outputs(docs), "equijoin_sec": [],
                "intersect_sec": []}
        timed(docs, "equijoin")  # one untimed JVM/codegen warmup
        for _ in range(runs):
            surf["equijoin_sec"].append(round(timed(docs, "equijoin"), 3))
            surf["intersect_sec"].append(round(timed(docs, "intersect"), 3))
        for k in ("equijoin_sec", "intersect_sec"):
            surf[k.replace("_sec", "_median")] = sorted(surf[k])[len(surf[k]) // 2]
        surf["ratio_equijoin_over_intersect"] = round(
            surf["equijoin_median"] / surf["intersect_median"], 3
        )
        report["surfaces"][name] = surf
        print(f"{name}: equijoin {surf['equijoin_median']}s vs intersect "
              f"{surf['intersect_median']}s "
              f"(ratio {surf['ratio_equijoin_over_intersect']}, "
              f"{surf['equal']['pairs']} identical pairs)", file=sys.stderr)
    report["cal_after"] = _calibrate()
    print(json.dumps(report, indent=1))
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
