"""Market-basket pair mining: python replay + metric identities."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest


def test_basket_pairs_match_python_replay(spark, sf_dir):
    """Top-20 brand pairs (counts, support, lift) equal a pure-python
    reconstruction from the raw parquet — counts exactly, the two
    ratios as the same single division of the same integers."""
    from mapreduce_citation_spark.operators.mining import basket_brand_pairs

    got = basket_brand_pairs(spark, sf_dir).collect()
    assert len(got) > 0

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    e = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")
        [["l_orderkey", "p_brand"]].drop_duplicates()
    )
    n_orders = e["l_orderkey"].nunique()
    marg = e.groupby("p_brand")["l_orderkey"].nunique().to_dict()
    pair_counts: dict[tuple[str, str], int] = {}
    for _, grp in e.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(grp["p_brand"]), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    expected = sorted(
        pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:20]
    assert [((r["brand_a"], r["brand_b"]), r["n_both"]) for r in got] == expected
    for r in got:
        assert r["support"] == r["n_both"] / n_orders
        assert r["lift"] == pytest.approx(
            (r["n_both"] * n_orders) / (marg[r["brand_a"]] * marg[r["brand_b"]]),
            rel=0, abs=0,
        )
        # lift-vs-support identity: lift = support / (p_a * p_b)
        pa = marg[r["brand_a"]] / n_orders
        pb = marg[r["brand_b"]] / n_orders
        assert r["lift"] == pytest.approx(r["support"] / (pa * pb), rel=1e-12)


def test_basket_triples_match_python_replay(spark, sf_dir):
    """Top-20 brand triples equal a pure-python reconstruction
    (combinations, not permutations), with the same ordering and
    exact single-division support."""
    from mapreduce_citation_spark.operators.mining import basket_brand_triples

    got = basket_brand_triples(spark, sf_dir).collect()
    assert len(got) > 0

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    e = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")
        [["l_orderkey", "p_brand"]].drop_duplicates()
    )
    n_orders = e["l_orderkey"].nunique()
    counts: dict[tuple[str, str, str], int] = {}
    for _, grp in e.groupby("l_orderkey"):
        for t in itertools.combinations(sorted(grp["p_brand"]), 3):
            counts[t] = counts.get(t, 0) + 1
    expected = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    assert [
        ((r["brand_a"], r["brand_b"], r["brand_c"]), r["n_all3"]) for r in got
    ] == expected
    for r in got:
        assert r["support"] == r["n_all3"] / n_orders
