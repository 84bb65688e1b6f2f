"""Analytical anchor queries over the star schema.

The reference has no heavy OLAP queries (its biggest aggregation is a
20-way group count, SURVEY.md A3) — these anchors exercise the engine's
scan/join/agg machinery at bench scale the way the admin analytics would
if the table grew to 100 TB: full-scan aggregation (pricing_summary),
selective 3-way join + top-k (top_orders), 6-way snowflake join
(region_volume), and an EXISTS semi-join (priority_orders).

Determinism: every floating aggregate accumulates in exact DECIMAL and
casts to DOUBLE once at the end, so Spark's partial (map-side) aggregates
and DuckDB's single-threaded sums produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..domain import load_table
from .catalog import register


def _dec_sum(col, alias: str, scale: str = "decimal(18,6)"):
    """Exact-decimal accumulation, one final cast to double."""
    return F.sum(col.cast(scale)).cast("double").alias(alias)


@register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape — full-scan group-agg; the scale form of A4's "
    "conditional counts. One shuffle, map-side partials, pushed filter.",
    tags=("agg", "bench"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), "sum_qty"),
        _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        _dec_sum(disc_price, "sum_disc_price"),
        _dec_sum(charge, "sum_charge"),
        (F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "top_orders",
    """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape — selective 3-way join + group + top-k. The dim "
    "side (filtered customer) broadcasts; top-k is TakeOrdered, no full sort.",
    tags=("join", "topk", "bench"),
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "region_volume",
    """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    doc="TPC-H Q5 shape — 6-way snowflake join with a local-supplier "
    "predicate. nation/region/supplier broadcast; fact tables join on keys.",
    tags=("join", "agg", "bench"),
)
def q_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape — pure scan-aggregate where EVERY predicate pushes "
    "to the parquet scan; the no-join throughput ceiling of the engine.",
    tags=("agg", "bench"),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"),
        F.count("*").alias("n_lines"),
    )


@register(
    "promo_share",
    """
SELECT CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
       / NULLIF(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 0)
       * 100.0 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-09-01'
""",
    doc="TPC-H Q14 shape — fact⋈dim with conditional numerator/denominator; "
    "part broadcasts, the ratio divides two exact decimal sums once. "
    "promo_pct is NULL when the window's revenue is zero (all-discounted "
    "rows; fuzz-found: ANSI double division raises where DuckDB gives "
    "NaN — both sides pin NULL via try_divide/NULLIF).",
    tags=("join", "agg", "bench"),
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.try_divide(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", disc)
                    .otherwise(F.lit(0))
                    .cast("decimal(18,6)")
                ).cast("double"),
                F.sum(disc.cast("decimal(18,6)")).cast("double"),
            )
            * 100.0
        ).alias("promo_pct")
    )


@register(
    "priority_orders",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape — EXISTS as a left-semi join (the batch form of "
    "the reference's S5 batch-get-by-keys, SURVEY.md).",
    tags=("semi-join", "agg", "bench"),
)
def q_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "supplier_diversity",
    """
SELECT p_type, CAST(p_size AS INTEGER) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 5, 9, 13, 17) AND p_type NOT LIKE 'MEDIUM%'
GROUP BY p_type, p_size
ORDER BY supplier_cnt DESC, p_type, p_size
LIMIT 20
""",
    doc="TPC-H Q16 shape — count(DISTINCT) per attribute group over a "
    "fact⋈dim join with a negative predicate; the distinct is the "
    "expensive part (two-level shuffle: (group, supp) dedup then group "
    "count), exactly what Spark's partial-distinct aggregation handles.",
    tags=("agg", "distinct", "bench"),
)
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13, 17) & ~F.col("p_type").like("MEDIUM%")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            "supplier_cnt",
        )
        .orderBy(F.desc("supplier_cnt"), "p_type", "p_size")
        .limit(20)
    )


@register(
    "big_spenders",
    """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 110
)
SELECT c_name, o_orderkey, o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    doc="TPC-H Q18 shape — HAVING over a fact aggregation feeding a "
    "dim-join top-k: the aggregate prunes the fact table BEFORE the "
    "joins (orders/customer join only the few big orders, broadcast-"
    "sized at any scale).",
    tags=("agg", "having", "bench"),
)
def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"))
        .filter(F.col("_q") > 110)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "revenue_cube",
    """
SELECT r_name, o_orderpriority,
       CAST(GROUPING(r_name, o_orderpriority) AS INTEGER) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE(r_name, o_orderpriority)
HAVING count(*) > 0
""",
    doc="CUBE multi-granularity rollup — region × priority revenue with "
    "all four subtotal levels in ONE pass (the OLAP cube/grouping-sets "
    "family nothing else in the catalog exercises). Spark expands the "
    "cube into grouping sets BEFORE the exchange, so partial aggregation "
    "still collapses map-side and the shuffle carries per-set partials, "
    "not the fact table ×4; dims broadcast. grouping_id disambiguates "
    "subtotal rows from genuine NULL dimension values — both engines "
    "emit the identical MSB-first bitmask (operators: cube/rollup are "
    "Catalyst built-ins; no custom code needed — that IS the point).",
    tags=("agg", "cube", "bench"),
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.cube("r_name", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").cast("long").alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "total_price"),
    )


@register(
    "bloom_semi_reduction",
    """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
""",
    doc="Bloom-filter semi-join reduction: a ~2%-fp bloom over the "
    "urgent-order keys broadcasts (one boolean-array row) and prunes "
    "lineitem MAP-SIDE before the join shuffle — the runtime-filter "
    "pattern that keeps a 100 TB fact table from shuffling rows the "
    "dim-side predicate would discard anyway. Result is EXACTLY the "
    "plain join (no false negatives; false positives die in the real "
    "join), which is what the oracle checks; the pruning itself is "
    "asserted in tests/test_layout.py "
    "(operators/layout.py:bloom_build, bloom_might_contain)",
    tags=("join", "layout", "bench"),
)
def q_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import bloom_build, bloom_might_contain  # noqa: PLC0415

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    # xxhash64 on both sides: the oracle is the PLAIN join (the bloom
    # changes no result rows), so the hash needs no cross-engine twin —
    # take the scale-path hash, not the md5 portable one
    bits = bloom_build(urgent, "o_orderkey", portable=False)
    pruned = bloom_might_contain(li, "l_orderkey", bits, portable=False)
    joined = pruned.join(
        urgent, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_items"),
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )


@register(
    "small_quantity_revenue",
    """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
WHERE l_quantity < (
  SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                / CAST(count(*) AS BIGINT))
  FROM lineitem i WHERE i.l_partkey = l.l_partkey
)
""",
    doc="TPC-H Q17 shape — CORRELATED scalar subquery (per-part average "
    "quantity in the predicate), the one optimizer family no other "
    "entry exercises: Catalyst decorrelates it into a per-part "
    "aggregate joined back to the fact table (one agg shuffle + one "
    "join keyed on l_partkey), never a per-row subquery execution. "
    "Threshold average is exact decimal-accumulated / bigint-count in "
    "one double division, so the comparison is bit-identical "
    "cross-engine; 0.2*avg as double*double stays deterministic.",
    tags=("join", "subquery", "agg", "bench"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count("*").cast("long")
            )
        ).alias("_thr")
    )
    # the decorrelated form Catalyst itself would produce — written
    # explicitly so the join side is visible to AQE/broadcast planning
    small = li.join(per_part, F.col("l_partkey") == F.col("_pk")).filter(
        F.col("l_quantity") < F.col("_thr")
    )
    return small.agg(
        F.count("*").cast("long").alias("n_items"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
    )
