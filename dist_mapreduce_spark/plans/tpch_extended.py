"""Extended TPC-H coverage over the driver's reduced star schema.

The reference runs no recognized benchmark (BASELINE.md); tpch.py added
Q1/Q3 as headline workloads. This module widens coverage to every other
canonical TPC-H query the driver's schema can express. The driver's
tables omit ``partsupp`` entirely plus several columns
(l_commitdate/l_receiptdate/l_shipmode, p_container, c_phone/c_address,
o_shippriority), so:

- Q2, Q9, Q11, Q16, Q20 (need partsupp) and Q12, Q21 (need
  commit/receipt dates + shipmode) live in ``tpch_partsupp.py``,
  expressed over a supply relation DERIVED from lineitem — see that
  module's docstring; with them the full 22-query suite is covered;
- Q4, Q17, Q19, Q22 are ADAPTED: the structural operator shape (EXISTS
  semi-join, correlated per-group average, multi-disjunct pushdown,
  anti-join + scalar subquery) is preserved, with predicates rewritten
  onto columns that exist. Each docstring states the adaptation.

Cross-engine float parity follows the repo-wide rules (docs/SCALE.md):
money flows through DECIMAL before any sum, each average/ratio is ONE
double division of exact decimal sums, and every LIMIT has an exact-type
total tiebreak, so Spark and DuckDB agree bit-for-bit.

Scale notes (100 TB): every query here is pure declarative DataFrame —
Catalyst chooses broadcast for the dimension sides (region/nation/
customer/part/supplier are KB-to-GB while lineitem is the 100 TB fact),
date predicates reach the parquet scans as PushedFilters, and the only
wide shuffles are the final group-bys on already-reduced rows. AQE
handles skewed order keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

_DEC_PRICE = "decimal(12,2)"
_DEC_FRAC = "decimal(4,2)"

# Shared exact-decimal revenue expression: extendedprice * (1 - discount).
_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev() -> F.Column:
    price = F.col("l_extendedprice").cast(_DEC_PRICE)
    disc = F.col("l_discount").cast(_DEC_FRAC)
    return price * (F.lit(1).cast(_DEC_FRAC) - disc)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


@query(
    "tpch_q4",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking, ADAPTED: the canonical EXISTS
    predicate is l_commitdate < l_receiptdate; those columns are absent,
    so the slow-lineitem test becomes l_shipdate > o_orderdate + 60 days
    — same correlated-EXISTS shape, realized as a LEFT SEMI join with a
    non-equi conjunct. Spark plans it as a single shuffled semi-join on
    orderkey; the quarter predicate on orders is pushed to the scan, so
    at 100 TB only one quarter of the orders table is read."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_q5",
    oracle=f"""
        SELECT n_name, CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: 6-table join where the
    customer-nation must equal the supplier-nation. region→nation→
    supplier/customer are broadcast dims; lineitem⋈orders is the one
    big shuffle. The c_nationkey = s_nationkey conjunct rides on the
    join rather than a post-filter so Catalyst can use it in join
    selectivity estimates."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q6",
    oracle="""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: the canonical scan-dominated
    query. All three predicates (date range, discount band, quantity
    cap) are scan-pushable parquet filters — at 100 TB the vectorized
    reader skips whole row groups on shipdate min/max statistics, which
    is exactly the access pattern this query exists to test."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(_DEC_PRICE) * F.col("l_discount").cast(
        _DEC_FRAC
    )
    return li.agg(F.sum(rev).cast("double").alias("revenue"))


@query(
    "tpch_q7",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
                 {_SQL_REV} AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations (NATION_1/NATION_2
    substituted for FRANCE/GERMANY in the driver's synthetic nation
    names). The nation table joins twice under different roles — the
    classic self-join-dimension pattern — both broadcast. The two-sided
    nation-pair disjunction is applied after both nation joins, and the
    year extraction stays JVM-side (built-in year())."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q8",
    oracle=f"""
        SELECT o_year,
               CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                                  THEN volume ELSE 0 END) AS DOUBLE)
                    / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
        FROM (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                 {_SQL_REV} AS volume,
                 n2.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA'
            AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                AND TIMESTAMP '1996-12-31'
            AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: 8-table join, nation in two roles
    (customer-side region membership, supplier-side share numerator).
    The ratio is one double division of two exact decimal sums computed
    in the same aggregate — never a join of two separately-aggregated
    frames, which would add a shuffle and an FP-order hazard."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1995-01-01"), _ts("1996-12-31"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    num = F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0)))
    den = F.sum(vol)
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(region, F.col("n1_rk") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (num.cast("double") / den.cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
    )


@query(
    "tpch_q10",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY sum({_SQL_REV}) DESC, c_custkey
        LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by lost
    revenue on returned lineitems in one quarter (c_address/c_phone/
    c_comment omitted — absent from the driver schema). The LIMIT rides
    on the exact decimal revenue with a c_custkey tiebreak, planned as
    TakeOrderedAndProject; the returnflag and date predicates push to
    the two fact scans."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


@query(
    "tpch_q13",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution, ADAPTED: the
    canonical filter excludes 'special requests' via o_comment LIKE;
    o_comment is absent, so the join-side predicate becomes
    o_orderpriority <> '4-NOT SPECIFIED' — same structural point (the
    filter must live ON the outer join, not WHERE, to keep zero-order
    customers). Two cascaded aggregations, both map-side combinable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q14",
    oracle=f"""
        SELECT CAST(CAST(100 AS DOUBLE)
                    * CAST(sum(CASE WHEN p_type = 'PROMO'
                               THEN {_SQL_REV} ELSE 0 END) AS DOUBLE)
                    / CAST(sum({_SQL_REV}) AS DOUBLE) AS DOUBLE) AS promo_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: percent of one month's revenue from
    PROMO parts (driver p_type is a single word, so equality replaces
    the canonical LIKE 'PROMO%'). Part broadcasts against the
    date-pruned lineitem scan; numerator and denominator are exact
    decimal sums in one aggregate, divided once in double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = _rev()
    num = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
    den = F.sum(vol)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100).cast("double") * num.cast("double") / den.cast("double"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


@query(
    "tpch_q15",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, sum({_SQL_REV}) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the canonical view-with-scalar-subquery.
    The global max (a one-row aggregate) broadcast-joins back against
    the per-supplier revenue — NOT an unpartitioned window, which would
    drag every per-supplier row to a single partition (millions of
    suppliers at 100 TB). The physical plan evaluates the revenue view
    twice (once under the max, once as the join probe) — both scans are
    quarter-pruned; a production run at 100 TB would persist the tiny
    per-supplier aggregate instead. Equality against the max is on the
    exact decimal, so ties are engine-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("_max"))
    best = rev.join(F.broadcast(top)).filter(F.col("total_rev") == F.col("_max"))
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(best, F.col("s_suppkey") == F.col("supplier_no")).select(
        "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
    )


@query(
    "tpch_q17",
    oracle="""
        SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                    / CAST(7 AS DOUBLE) AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
            SELECT CAST(0.2 AS DOUBLE)
                   * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                      / count(*))
            FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
          )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue, ADAPTED: the canonical
    p_container predicate is dropped (column absent), leaving the brand
    filter. The correlated per-part average-quantity subquery is
    decorrelated into an explicit per-part aggregate joined back to the
    brand-filtered fact — the exact rewrite Catalyst/DuckDB perform, but
    stated declaratively. The per-part average is one double division of
    an exact decimal sum so both engines compute the identical
    threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.lit(0.2).cast("double")
            * (
                F.sum(F.col("l_quantity").cast(_DEC_PRICE)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(_DEC_PRICE)).cast("double")
                / F.lit(7).cast("double")
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q18",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: the IN-subquery-with-HAVING is
    a semi-join from orders to the per-order quantity aggregate. The
    heavy aggregate runs on lineitem ONCE, pre-filtered to qualifying
    orderkeys (>300 units), then the tiny survivor set joins customer.
    o_orderkey carries the LIMIT tiebreak (o_totalprice is double but a
    raw column value, not a recomputed sum — engine-stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC_PRICE)).alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"), "_qty")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_qty").cast("double").alias("sum_qty"),
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
        SELECT CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#6' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted-revenue, ADAPTED: p_container and l_shipmode
    predicates are dropped (columns absent); the three-disjunct
    brand/size/quantity structure — the query's point, a multi-branch
    predicate straddling both join sides — is preserved. Catalyst
    extracts the common l_partkey equi-join and pushes the
    single-table conjuncts (p_brand/p_size to part, none fully
    single-sided on lineitem since quantity bands differ per brand)
    below the join where possible."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#6")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "tpch_q22",
    oracle="""
        WITH avg_bal AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*) AS threshold
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > threshold
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity, ADAPTED: the canonical
    cntrycode = substring(c_phone) is absent, so grouping is by
    c_nationkey, and "has no orders" becomes "no orders since
    1999-01-01" (lapsed customers) so the anti-join selects a real
    cohort on the driver data. The operator shape (scalar-subquery
    threshold + NOT EXISTS anti-join + group) is intact. The
    average-balance threshold is one double division of an exact
    decimal sum; the anti-join needs only two orders columns, which
    column pruning reduces to a narrow scan."""
    cust = load_table(spark, sf_dir, "customer")
    thr_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(_DEC_PRICE)).cast("double")
                / F.count(F.lit(1))
            ).alias("threshold")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(thr_row)).filter(
        F.col("c_acctbal") > F.col("threshold")
    )
    no_orders = rich.join(
        recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast(_DEC_PRICE)).cast("double").alias("totacctbal"),
    )
