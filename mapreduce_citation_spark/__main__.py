"""CLI — the reference's docker-compose workflow as one command.

The reference runs 5 containers (master + 2 mappers + 2 reducers) to
turn ``data/cit-HepTh.txt`` into ``output/final_citation_counts.txt``
(reference: docker-compose.yml:4-86, master/master.py:232-257). The
equivalent here:

    python -m mapreduce_citation_spark \
        --input data/cit-HepTh.txt \
        --output output/final_citation_counts.txt \
        [--top-k 30] [--malformed drop|fail|keep] [--counts-parquet DIR]

Same input format (tab-separated edges, '#' comments, malformed rows
dropped), same report layout, deterministic (-count, paper_id) order —
with Spark as the engine instead of the hand-rolled control plane.
``--counts-parquet`` additionally writes the full per-paper counts as
parquet (the reference leaves them as loose CSV shuffle files).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="mapreduce_citation_spark",
        description="Citation analysis: ranked top-k most-cited report from a tab-separated edge list.",
    )
    p.add_argument("--input", required=True, help="edge-list text file (from\\tto per line)")
    p.add_argument("--output", required=True, help="path for the formatted report")
    p.add_argument("--top-k", type=int, default=30)
    p.add_argument(
        "--malformed",
        choices=["drop", "fail", "keep"],
        default="drop",
        help="malformed-row policy (reference behavior: drop)",
    )
    p.add_argument(
        "--counts-parquet",
        default=None,
        help="optionally write full per-paper citation counts as parquet here",
    )
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from .citations import CitationAnalytics
    from .session import get_spark

    spark = get_spark("citation-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ca = CitationAnalytics.from_text(spark, args.input, malformed=args.malformed)
    if args.counts_parquet:
        ca.citation_counts().write.mode("overwrite").parquet(args.counts_parquet)
    ca.write_report(args.output, k=args.top_k)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
