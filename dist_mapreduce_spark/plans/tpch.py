"""Canonical TPC-H queries over the driver's TPC-H-ish tables.

The reference never ran a recognized benchmark (BASELINE.md: no TPC-H/
TPC-DS/SSB anywhere in /root/reference). These two plans give the engine
named, industry-standard headline workloads — Q1 (the scan-heavy
aggregate that stresses partial aggregation + codegen) and Q3 (the
selective join + top-k that stresses join order, broadcast, and
pushdown) — adapted to the driver's slightly-reduced schemas
(no l_shipmode/o_shippriority columns; date ranges 1995–2001).

Cross-engine float parity follows the repo-wide rules (docs/SCALE.md):
money flows through DECIMAL before any sum, averages are ONE double
division of exact decimal sums, and ordering keys are exact types, so
Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

# Exact-decimal building blocks: extendedprice fits DECIMAL(12,2);
# discount/tax are small fractions → DECIMAL(4,2). Their products stay
# well inside DECIMAL(38,x), so every sum below is exact.
_DEC_PRICE = "decimal(12,2)"
_DEC_FRAC = "decimal(4,2)"


@query(
    "tpch_q1",
    oracle="""
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
            AS sum_base_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                   * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
               AS DOUBLE) AS sum_charge,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS DOUBLE) AS avg_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS DOUBLE) AS avg_price,
          CAST(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               / count(*) AS DOUBLE) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing-summary report. One scan, map-side partial
    aggregation into 6 groups, everything inside whole-stage codegen —
    the pure-throughput benchmark. The shipdate predicate reaches the
    parquet scan as a pushed filter, so at 100 TB row groups beyond the
    date are never decoded. Averages are computed as one double
    division of the exact decimal sums (never builtin avg — partition-
    order float drift breaks cross-engine parity)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    qty = F.col("l_quantity").cast(_DEC_PRICE)
    price = F.col("l_extendedprice").cast(_DEC_PRICE)
    disc = F.col("l_discount").cast(_DEC_FRAC)
    tax = F.col("l_tax").cast(_DEC_FRAC)
    one = F.lit(1).cast(_DEC_FRAC)
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / n).cast("double").alias("avg_qty"),
            (F.sum(price).cast("double") / n).cast("double").alias("avg_price"),
            (F.sum(disc).cast("double") / n).cast("double").alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle="""
        SELECT
          l_orderkey,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS DOUBLE) AS revenue,
          o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 DESC,
                 o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority top-10 (shippriority column absent in
    the driver schema, otherwise canonical). Catalyst broadcast-joins
    the segment-filtered customer side and pushes both date predicates
    into the scans; the top-10 is a TakeOrderedAndProject (per-partition
    heaps + driver merge — no global sort). The ORDER BY carries
    (o_orderdate, l_orderkey) tiebreaks on top of the exact-decimal
    revenue so LIMIT selects identical rows in both engines."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    price = F.col("l_extendedprice").cast(_DEC_PRICE)
    disc = F.col("l_discount").cast(_DEC_FRAC)
    one = F.lit(1).cast(_DEC_FRAC)
    revenue_exact = F.sum(price * (one - disc))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_exact.alias("_rev"))
        .orderBy(F.col("_rev").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
        )
    )
