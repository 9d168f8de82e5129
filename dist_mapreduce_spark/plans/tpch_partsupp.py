"""TPC-H completion: the seven queries that need ``partsupp``
(Q2, Q9, Q11, Q16, Q20) or commit/receipt/shipmode columns (Q12, Q21),
expressed over a DERIVED supply relation.

The driver's schema has no partsupp table, so ``tpch_extended`` left
these out of scope. This module closes the gap the way a lakehouse
would: the supply relation is derived from the fact table itself —

    partsupp := SELECT l_partkey  AS ps_partkey,
                       l_suppkey  AS ps_suppkey,
                       min(unit_price_cents) AS ps_supplycost_cents,
                       sum(quantity)         AS ps_availqty
                FROM lineitem GROUP BY 1, 2

TPC-H's generator guarantees every lineitem (partkey, suppkey) pair
exists in partsupp, so deriving it preserves the join topology every
one of these queries exercises; supply cost becomes the best observed
unit price and availability the total shipped quantity. Each docstring
states any further adaptation (absent columns → equivalent predicates
on existing ones), exactly as tpch_extended does for Q4/Q17/Q19/Q22.

Cross-engine float parity: unit cost is exact integer cents via
DECIMAL-cents DIV integer-quantity (both engines' BIGINT integer
division — no float division anywhere near an aggregate), revenue
flows through DECIMAL into exact integer micro-units before any sum,
and every LIMIT carries an exact-type total tiebreak.

Scale notes (100 TB): the derived partsupp is ONE map-side-combinable
aggregation of two key columns + two small measures — the classic
pre-aggregation that a real deployment materializes once (like
sim_index_build) and every query here then treats as a dimension-ish
side: at TPC-H cardinalities |partsupp| = 4 × |part| ≪ |lineitem|, so
Catalyst broadcast-joins it where it lands under the threshold and
shuffle-joins on (partkey, suppkey) otherwise. All date/brand/type
predicates sit on base columns and reach the parquet scans as
PushedFilters before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

_DEC_PRICE = "decimal(12,2)"
_DEC_FRAC = "decimal(4,2)"

# Derived supply relation, shared verbatim by every oracle below.
# Unit cost = best observed price per unit, in exact integer cents
# (DECIMAL-cents DIV BIGINT-quantity; quantities are integral doubles).
_SQL_PARTSUPP = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   // greatest(CAST(l_quantity AS BIGINT), 1))
                 AS ps_supplycost_cents,
               sum(CAST(l_quantity AS BIGINT)) AS ps_availqty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
"""

# Exact integer micro-units (4 decimal places) of the revenue
# expression extendedprice * (1 - discount): scale-4 DECIMAL * 10000
# is integral, so the BIGINT cast is exact.
_SQL_REV_U = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    " * 10000 AS BIGINT)"
)


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived supply relation (see module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast(_DEC_PRICE) * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
                " DIV greatest(CAST(l_quantity AS BIGINT), 1)"
            )).alias("ps_supplycost_cents"),
            F.sum(qty).alias("ps_availqty"),
        )
    )


def _rev_u() -> F.Column:
    price = F.col("l_extendedprice").cast(_DEC_PRICE)
    disc = F.col("l_discount").cast(_DEC_FRAC)
    return ((price * (F.lit(1).cast(_DEC_FRAC) - disc)) * 10000).cast("long")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


@query(
    "tpch_q2",
    oracle=f"""
        WITH partsupp AS ({_SQL_PARTSUPP}),
        eur AS (
          SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
                 s_acctbal, s_name, n_name
          FROM partsupp
          JOIN supplier ON s_suppkey = ps_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ),
        ranked AS (
          SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                 ps_supplycost_cents,
                 min(ps_supplycost_cents)
                   OVER (PARTITION BY p_partkey) AS min_cost
          FROM part JOIN eur ON p_partkey = ps_partkey
          WHERE p_size BETWEEN 12 AND 15 AND p_type = 'STANDARD'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               ps_supplycost_cents
        FROM ranked WHERE ps_supplycost_cents = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier, ADAPTED: partsupp is the derived
    supply relation; p_mfgr/p_comment/s_address columns are absent so
    the output carries p_brand instead, and the part predicate is
    p_size BETWEEN 12 AND 15 AND p_type = 'STANDARD' (no '%BRASS' types
    in this generator). The query's point — the correlated
    min-supplycost-within-region subquery — is realized as a window
    min over p_partkey on the region-restricted supply rows, which is
    exactly how Catalyst de-correlates the canonical form: ONE pass,
    no re-join of the supply relation against its own aggregate.
    region→nation→supplier broadcast onto partsupp; the window
    partitions by partkey, already the join key, so no extra exchange
    beyond the aggregate's own."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        ps.join(supp, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(region, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("ps_partkey", "ps_supplycost_cents", "s_acctbal", "s_name", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(12, 15) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("p_partkey")
    ranked = (
        part.join(eur, F.col("p_partkey") == F.col("ps_partkey"))
        .withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
    )
    return (
        ranked.filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost_cents",
        )
    )


@query(
    "tpch_q9",
    oracle=f"""
        WITH partsupp AS ({_SQL_PARTSUPP})
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(sum({_SQL_REV_U}
                   - ps_supplycost_cents * CAST(l_quantity AS BIGINT) * 100)
                 AS BIGINT) AS sum_profit_u
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit, ADAPTED: supply cost comes from
    the derived partsupp (best observed unit price in integer cents),
    and the part filter is p_name LIKE '%red%' (this generator's names
    are 'color noun'). Profit is EXACT INTEGER micro-units throughout
    — revenue micro-units minus cents·quantity·100 — so the per-nation
    per-year sums are order-independent and bit-equal across engines.
    The plan is the canonical profit shape: part filter pushed to the
    scan prunes lineitem via the partkey join, partsupp rides the SAME
    (partkey, suppkey) keys the fact row already carries, supplier/
    nation broadcast, one final narrow group-by."""
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev_u() - (
        F.col("ps_supplycost_cents") * F.col("l_quantity").cast("long") * 100
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).alias("sum_profit_u"))
    )


@query(
    "tpch_q11",
    oracle=f"""
        WITH partsupp AS ({_SQL_PARTSUPP}),
        nat AS (
          SELECT ps_partkey,
                 ps_supplycost_cents * ps_availqty AS value_u
          FROM partsupp
          JOIN supplier ON s_suppkey = ps_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'
        ),
        byp AS (
          SELECT ps_partkey, CAST(sum(value_u) AS BIGINT) AS value_u
          FROM nat GROUP BY ps_partkey
        ),
        tot AS (
          SELECT sum(value_u) AS total_u,
                 count(*) AS nparts
          FROM byp
        )
        SELECT ps_partkey, value_u
        FROM byp, tot
        WHERE value_u * nparts > 2 * total_u
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock identification, ADAPTED: partsupp is
    derived; the nation is NATION_7 (no 'GERMANY' here); and the
    canonical fixed fraction 0.0001/SF — which would make the survivor
    set collapse to empty as scale grows — becomes 'value > 2× the
    mean part value' (value_u · nparts > 2 · total_u, exact integers),
    preserving the HAVING-against-scalar-subquery structure while
    staying non-degenerate at every test scale. The scalar (total, n)
    row is computed once from the per-part aggregate and broadcast;
    everything upstream of it is the same single shuffle on
    ps_partkey."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    byp = (
        ps.join(supp, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("value_u")
        )
    )
    tot = byp.agg(
        F.sum("value_u").alias("total_u"), F.count(F.lit(1)).alias("nparts")
    )
    return (
        byp.join(F.broadcast(tot))
        .filter(F.col("value_u") * F.col("nparts") > 2 * F.col("total_u"))
        .select("ps_partkey", "value_u")
    )


@query(
    "tpch_q12",
    oracle="""
        SELECT l_returnflag AS ship_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag IN ('A', 'N')
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY ship_class
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority, ADAPTED: l_shipmode/
    l_commitdate/l_receiptdate are absent, so the two-mode IN list is
    l_returnflag IN ('A','N') and 'received later than committed'
    becomes 'shipped more than 90 days after order'. The structural
    content is intact: an IN-list + date-window scan predicate on the
    fact side, a non-equi lateness conjunct straddling the join, and
    the signature CASE-on-priority conditional aggregation. The
    shipdate year window is pushed to the lineitem scan; the
    priority CASE needs only one orders column, so both scans are
    narrow."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N")
        & (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q16",
    oracle=f"""
        WITH partsupp AS ({_SQL_PARTSUPP})
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
          )
        GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship, ADAPTED: partsupp is
    derived and the excluded-supplier predicate (canonically s_comment
    LIKE '%Customer%Complaints%') becomes s_name LIKE '%7' — same
    NOT-IN-subquery shape over a non-null key, which Spark and DuckDB
    both execute as an anti-join since the subquery column cannot be
    NULL. The triple predicate on part (<> brand, NOT LIKE type,
    IN-list size) is pushed to the part scan; count(DISTINCT
    ps_suppkey) is the query's point — a two-phase distinct aggregate
    over the (brand, type, size) groups."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        ps.join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .join(bad, F.col("s_suppkey") == F.col("ps_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle=f"""
        WITH partsupp AS ({_SQL_PARTSUPP}),
        shipped_1996 AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(l_quantity AS BIGINT)) AS qty_1996
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_partkey, l_suppkey
        ),
        active AS (
          SELECT DISTINCT ps_suppkey
          FROM partsupp
          JOIN shipped_1996 ON l_partkey = ps_partkey
                           AND l_suppkey = ps_suppkey
          WHERE ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
            )
            AND 2 * qty_1996 > ps_availqty
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (SELECT ps_suppkey FROM active)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, ADAPTED: partsupp is
    derived (availqty = all-time shipped quantity), the nation is
    NATION_3, the part filter p_name LIKE 'red%', and — because the
    derived availqty is by construction ≥ any one year's shipments —
    the canonical 'availqty > 0.5 × year quantity' (vacuously true
    here) is INVERTED to '1996 shipments > 0.5 × all-time quantity':
    supply relationships doing most of their lifetime volume in the
    probe year. The nested-subquery topology is untouched: a part
    IN-subquery inside a correlated partsupp-vs-lineitem-aggregate
    comparison inside a supplier IN-subquery, realized as three
    semi-joins with the year window pushed to the lineitem scan."""
    ps = _partsupp(spark, sf_dir)
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_1996"))
    )
    active = (
        ps.join(red, F.col("p_partkey") == F.col("ps_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(2 * F.col("qty_1996") > F.col("ps_availqty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    return (
        supp.join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(active, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21",
    oracle="""
        WITH lf AS (
          SELECT l_orderkey, l_suppkey,
                 (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'
        ),
        per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS nsupp,
                 count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
          FROM lf GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM lf
        JOIN per_order USING (l_orderkey)
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE lf.late AND nsupp > 1 AND nlate = 1
          AND n_name IN ('NATION_2', 'NATION_4')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting, ADAPTED: lateness
    (canonically l_receiptdate > l_commitdate) is 'shipped more than
    60 days after the order', and the nation filter covers two
    NATION_* values for a non-trivial cohort. The famous EXISTS /
    NOT-EXISTS pair ('another supplier contributed to the order' /
    'no OTHER supplier was late') is realized as its standard
    scalable rewrite: ONE pass computes per-order distinct-supplier
    and distinct-late-supplier counts, and the waiting lines are
    late lines in multi-supplier orders where nlate = 1 — the sole
    late supplier is necessarily the row's own. Lineitem is touched
    once for the flags and reaggregated on the same l_orderkey key
    (no second exchange under AQE coalescing); supplier/nation
    broadcast onto the survivors."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    lf = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")).alias(
                "late"
            ),
        )
    )
    per_order = lf.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nlate"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_4")
    )
    return (
        lf.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
