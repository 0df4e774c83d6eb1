"""Pattern-mining analytics: market-basket co-occurrence.

The classic retail question over the TPC-H shape: which part brands
co-occur in the same order more often than chance? This is frequent-
itemset mining at the pair level (support + lift), the building block
of recommendation candidate generation — and a canonical MapReduce
workload (the reference engine's domain is exactly this count/join
shape, generalized: SURVEY.md §2 ops 6-11).

Scale shape: the corpus never self-joins — the pair explosion happens
per ORDER over that order's distinct-brand set (bounded by the brand
domain, ≤25 in TPC-H, and by basket size in general), and the
aggregation domain is brand × brand, which is tiny however large the
fact table grows. One shuffle to build the (order, brand) incidence
table, one equi-join on the order key to form pairs, bounded-domain
aggregates after.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


def order_brand_incidence(li: DataFrame, part: DataFrame) -> DataFrame:
    """Distinct (order, brand) incidence table — the "basket" view.

    The join is fact→dim on l_partkey (AQE broadcasts the measured
    part side when it is small; no manual hint so the same plan holds
    when part outgrows a broadcast at larger SFs)."""
    return (
        li.select("l_orderkey", "l_partkey")
        .join(part.select("p_partkey", "p_brand"),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )


@register(
    "basket_brand_pairs",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM e),
c AS (SELECT b, COUNT(*) AS n_b FROM e GROUP BY b),
p AS (
  SELECT x.b AS brand_a, y.b AS brand_b, COUNT(*) AS n_both
  FROM e x JOIN e y ON x.o = y.o AND x.b < y.b
  GROUP BY x.b, y.b
)
SELECT p.brand_a, p.brand_b, p.n_both,
       CAST(p.n_both AS DOUBLE) / CAST(tot.n_orders AS DOUBLE) AS support,
       CAST(p.n_both * tot.n_orders AS DOUBLE)
         / CAST(ca.n_b * cb.n_b AS DOUBLE) AS lift
FROM p, tot
JOIN c ca ON ca.b = p.brand_a
JOIN c cb ON cb.b = p.brand_b
ORDER BY n_both DESC, brand_a ASC, brand_b ASC
LIMIT 20
""",
    tags=("mining", "market-basket", "itemsets", "lift"),
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: top-20 brand pairs by co-occurrence
    support, with lift against the independence baseline.

    All counting is integer-exact; support and lift are each ONE
    division of exact BIGINT products, so the doubles are bit-equal
    across engines (no accumulation-order sensitivity). The incidence
    table is materialized once (three consumers: pair join both sides
    + marginals; the 1-row order total is the vetted scalar-fold
    pattern). At 100 TB the pair join shuffles on the order key only,
    and every aggregate lands on the bounded brand×brand domain."""
    e = order_brand_incidence(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tot = e.select(F.count_distinct("o").alias("n_orders"))
    c = e.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    x, y = e.alias("x"), e.alias("y")
    p = (
        x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.b") < F.col("y.b")))
        .groupBy(F.col("x.b").alias("brand_a"), F.col("y.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = c.select(F.col("b").alias("ba"), F.col("n_b").alias("n_a_orders"))
    cb = c.select(F.col("b").alias("bb"), F.col("n_b").alias("n_b_orders"))
    return (
        p.crossJoin(tot)
        .join(ca, F.col("brand_a") == F.col("ba"))
        .join(cb, F.col("brand_b") == F.col("bb"))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            (F.col("n_both").cast("double") / F.col("n_orders").cast("double"))
            .alias("support"),
            (
                (F.col("n_both") * F.col("n_orders")).cast("double")
                / (F.col("n_a_orders") * F.col("n_b_orders")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("n_both").desc(), F.col("brand_a").asc(), F.col("brand_b").asc())
        .limit(20)
    )


@register(
    "parts_fuzzy_name_match",
    oracle="""
WITH e AS (SELECT DISTINCT p_brand, p_name FROM part)
SELECT a.p_brand AS brand, a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance
FROM e a JOIN e b ON a.p_brand = b.p_brand AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
""",
    tags=("mining", "fuzzy-match", "record-linkage", "levenshtein"),
)
def parts_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY record linkage: near-identical part labels within a
    brand (edit distance ≤ 2 over the distinct (brand, name) entity
    table) — the blocking-join shape of entity resolution: the
    equi-join on the blocking key (brand) bounds each comparison
    block, so the quadratic edit-distance work never crosses blocks.
    Spark's ``levenshtein`` and DuckDB's agree on the classic
    definition (probed: kitten/sitting = 3, empty-string cases), so
    the pairs and distances are hash-exact. At 100 TB the blocking
    key comes from a higher-cardinality candidate generator — the
    repo's MinHash/SimHash LSH families are exactly that — with this
    same verify-within-block join downstream."""
    e = (
        load_table(spark, sf_dir, "part")
        .select("p_brand", "p_name")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = e.alias("a"), e.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 2)
    )


@register(
    "basket_brand_triples",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM e),
t AS (
  SELECT x.b AS brand_a, y.b AS brand_b, z.b AS brand_c,
         COUNT(*) AS n_all3
  FROM e x
  JOIN e y ON x.o = y.o AND x.b < y.b
  JOIN e z ON y.o = z.o AND y.b < z.b
  GROUP BY 1, 2, 3
)
SELECT t.brand_a, t.brand_b, t.brand_c, t.n_all3,
       CAST(t.n_all3 AS DOUBLE) / CAST(tot.n_orders AS DOUBLE) AS support
FROM t, tot
ORDER BY n_all3 DESC, brand_a ASC, brand_b ASC, brand_c ASC
LIMIT 20
""",
    tags=("mining", "market-basket", "itemsets", "triples"),
)
def basket_brand_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-itemset mining — the pair miner's next lattice level: top-20
    brand TRIPLES by co-occurrence support. The explosion stays
    per-basket (C(k,3) over each order's distinct-brand set — the
    chained ordered self-joins materialize combinations, never
    permutations) and the aggregation domain is brand³, still tiny.
    At 100 TB a full Apriori/FP-growth run prunes candidates by
    support between levels; the per-level plan is exactly this
    shape."""
    e = order_brand_incidence(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tot = e.select(F.count_distinct("o").alias("n_orders"))
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    t = (
        x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.b") < F.col("y.b")))
        .join(z, (F.col("y.o") == F.col("z.o")) & (F.col("y.b") < F.col("z.b")))
        .groupBy(
            F.col("x.b").alias("brand_a"),
            F.col("y.b").alias("brand_b"),
            F.col("z.b").alias("brand_c"),
        )
        .agg(F.count(F.lit(1)).alias("n_all3"))
    )
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "brand_a", "brand_b", "brand_c", "n_all3",
            (F.col("n_all3").cast("double") / F.col("n_orders").cast("double"))
            .alias("support"),
        )
        .orderBy(
            F.col("n_all3").desc(), F.col("brand_a").asc(),
            F.col("brand_b").asc(), F.col("brand_c").asc(),
        )
        .limit(20)
    )
