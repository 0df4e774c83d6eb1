"""Roundtrip tests for sinks + partition pruning on partitioned
parquet output."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_citation_spark.plans import explain_str
from mapreduce_citation_spark.sources.readers import load_table
from mapreduce_citation_spark.sources.sinks import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)


def test_parquet_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # a filter on the partition column must prune, not scan+filter:
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = explain_str(pruned, "formatted")
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == want


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = read_csv(spark, out, nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "customer_json")
    write_json(cust, out)
    back = read_json(spark, out, cust.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from mapreduce_citation_spark.sources.sinks import read_orc, write_orc

    supp = load_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_orc")
    write_orc(supp, out)
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, supp.collect()))
    # filters push into the ORC scan just like parquet
    plan = back.filter(back.s_suppkey == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(s_suppkey), EqualTo(s_suppkey,1)]" in plan
