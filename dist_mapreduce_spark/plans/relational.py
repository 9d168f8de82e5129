"""Relational completion (SURVEY.md §2.3, §2.5, §2.6, §2.7): the
capabilities the reference's MapReduce paradigm implies but never
exercises — joins, window functions, set ops, distinct, grouping sets,
pivot, global top-k — over the TPC-H-ish star schema.

Scale posture per query:
- dimension joins are broadcast (nation/region/part/customer are tiny
  relative to fact tables at any SF; broadcast threshold 64 MiB in
  session.py) — no shuffle of the fact side's join key;
- fact-fact joins rely on AQE (skew-join splitting enabled);
- money sums go through DECIMAL(18,2) so results are exact and
  bit-identical to the DuckDB oracle (double summation order would
  differ); quantities are integral doubles → exact in either engine;
- every window has a total order (tiebreak on a key column) so ranks
  are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _money_sum(col: str) -> F.Column:
    """Exact money aggregation: accumulate as DECIMAL(18,2), present as
    double. Bit-identical across engines regardless of add order."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


# ------------------------------------------------------------------ joins

@query(
    "join_inner",
    oracle=(
        "SELECT c_mktsegment, count(*) AS n_orders,"
        " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " GROUP BY c_mktsegment"
    ),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer (equi-join) + aggregate. customer is the small
    side → Catalyst broadcasts it (verify: BroadcastHashJoin in the
    plan); the orders scan prunes to 2 columns."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _money_sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "join_broadcast",
    oracle=(
        "SELECT p_brand,"
        " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
        "          * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)"
        "  AS revenue,"
        " CAST(sum(l_quantity) AS DOUBLE) AS sum_qty"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        " GROUP BY p_brand"
    ),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ broadcast(part): the canonical fact-dim pattern. At
    100 TB the fact side never shuffles for this join — the dim ships to
    every executor once. Revenue rounded to cents at the row level
    before summing (exact, order-independent)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            # Exact decimal arithmetic at the row level: price is 2-dec,
            # discount 2-dec, so the product is an exact 4-dec decimal in
            # both engines — no double-rounding ties (half-up vs
            # half-even) like a double→decimal cast of the product.
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
        )
    )


@query(
    "join_multiway",
    oracle=(
        "SELECT r_name, n_name, count(*) AS n_customers,"
        " CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal"
        " FROM customer"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY r_name, n_name"
    ),
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way snowflake join customer→nation→region. Both dims are
    broadcast; Catalyst is free to reorder (no shuffle either way)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            _money_sum("c_acctbal").alias("total_acctbal"),
        )
    )


@query(
    "join_semi",
    oracle=(
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS"
        " (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having ≥1 order. Semi joins
    ship only the join key of the probe side and never duplicate rows —
    the right plan shape for existence filters at scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle=(
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS"
        " (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------- windows

@query(
    "window_topk",
    oracle=(
        "SELECT letter, word, cnt, rk FROM ("
        " SELECT substr(word, 1, 1) AS letter, word, cnt,"
        "  row_number() OVER (PARTITION BY substr(word, 1, 1)"
        "                     ORDER BY cnt DESC, word) AS rk"
        " FROM (SELECT word, count(*) AS cnt FROM"
        "   (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word"
        "    FROM documents) WHERE word <> '' GROUP BY word)"
        ") WHERE rk <= 3"
    ),
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 words per initial letter — the natural windowed extension
    of the reference's partitioned word count (SURVEY.md §2.5).
    Deterministic tiebreak (cnt DESC, word ASC)."""
    from dist_mapreduce_spark.operators.wordcount import word_count

    counts = word_count(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("letter").orderBy(F.desc("cnt"), F.asc("word"))
    return (
        counts.withColumn("letter", F.substring("word", 1, 1))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("letter", "word", "cnt", "rk")
    )


@query(
    "window_running",
    oracle=(
        "SELECT o_custkey, o_orderkey,"
        " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER"
        "  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
        "  AS running_total"
        " FROM orders"
    ),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running order total per customer (analytic frame). DECIMAL
    accumulation keeps every prefix sum exact → engine-identical."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "window_lag",
    oracle=(
        "SELECT user_id, event_id,"
        " epoch_us(ts) - lag(epoch_us(ts)) OVER"
        "  (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us"
        " FROM events"
    ),
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): microsecond gap between consecutive events per user.
    Time compared as unix microseconds (bigint) — no tz ambiguity."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "user_id", "event_id", (us - F.lag(us).over(w)).alias("gap_us")
    )


# ------------------------------------------------------------------ sorts

@query(
    "topk_global",
    oracle=(
        "SELECT rk, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM ("
        " SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk,"
        "  o_orderkey, o_totalprice FROM orders) WHERE rk <= 10"
    ),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price. orderBy(...).limit(k) compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge, no
    global sort. The rank column pins the order for the oracle."""
    o = _t(spark, sf_dir, "orders")
    top = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10)
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        F.row_number().over(w).alias("rk"), "o_orderkey", "o_totalprice"
    )


# ----------------------------------------------------------------- setops

_SRC_WORDS = (
    "SELECT DISTINCT word FROM (SELECT unnest(string_split_regex(text,"
    " '[^a-zA-Z]+')) AS word FROM documents WHERE source = '{src}')"
    " WHERE word <> ''"
)


def _src_words(spark: SparkSession, sf_dir: str, src: str) -> DataFrame:
    from dist_mapreduce_spark.operators.wordcount import tokenize

    docs = _t(spark, sf_dir, "documents").filter(F.col("source") == src)
    return tokenize(docs).distinct()


@query(
    "setop_intersect",
    oracle=f"({_SRC_WORDS.format(src='src0')}) INTERSECT ({_SRC_WORDS.format(src='src1')})",
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary common to two sources (INTERSECT = semi-join on all
    columns after distinct)."""
    return _src_words(spark, sf_dir, "src0").intersect(
        _src_words(spark, sf_dir, "src1")
    )


@query(
    "setop_except",
    oracle=f"({_SRC_WORDS.format(src='src0')}) EXCEPT ({_SRC_WORDS.format(src='src1')})",
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary unique to src0 (EXCEPT = anti-join after distinct).
    subtract() IS EXCEPT DISTINCT — both inputs are already distinct,
    so exceptAll + a trailing distinct would only add a redundant
    aggregate."""
    return _src_words(spark, sf_dir, "src0").subtract(
        _src_words(spark, sf_dir, "src1")
    )


# --------------------------------------------------------------- distinct

@query(
    "distinct_exact",
    oracle=(
        "SELECT lang, count(DISTINCT source) AS n_sources,"
        " count(DISTINCT n_chars) AS n_lengths FROM documents GROUP BY lang"
    ),
)
def q_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (expands to a two-level aggregate)."""
    return _t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("n_chars").alias("n_lengths"),
    )


@query(
    "approx_distinct",
    oracle=(
        # The HLL estimate itself is engine-specific, so the checkable
        # contract is (exact count, estimate-within-5%): the oracle
        # emits the exact distinct count and literal TRUE; Spark emits
        # the same exact count plus its own |approx-exact|/exact <= 5%
        # verdict. A broken sketch flips the boolean and hash-fails.
        "SELECT event_type,"
        " CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,"
        " CAST(count(*) AS BIGINT) AS n_events,"
        " TRUE AS within_5pct"
        " FROM events GROUP BY event_type"
    ),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for
    distinct-user-style metrics — one pass, bounded memory, mergeable
    sketches instead of the exact two-level expansion. The query
    returns the exact count alongside a boolean asserting the HLL
    estimate (rsd=0.01) lands within 5% of it, making an
    engine-specific estimate exactly checkable against DuckDB. The
    relative-error denominator is floored at 1 so a group whose
    user_ids are all NULL (exact = 0) stays a total boolean instead of
    a divide-by-zero under ANSI mode — both sketches agree on 0 there,
    so the flag is trivially true."""
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.01)
                - F.countDistinct("user_id")
            )
            / F.greatest(F.countDistinct("user_id"), F.lit(1))
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )


# ---------------------------------------------------- grouping sets / pivot

@query(
    "rollup_agg",
    oracle=(
        "SELECT coalesce(l_returnflag, 'ALL') AS returnflag,"
        " coalesce(l_linestatus, 'ALL') AS linestatus,"
        " CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, count(*) AS n"
        " FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag, flag+status, grand). NULL grouping
    markers are coalesced to 'ALL' in both engines — no NULL-vs-NULL
    hash ambiguity. Quantities are integral doubles → exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "cube_agg",
    oracle=(
        "SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,"
        " coalesce(o_orderpriority, 'ALL') AS orderpriority,"
        " count(*) AS n_orders"
        " FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations in one shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
        )
    )


@query(
    "pivot_linestatus",
    oracle=(
        "SELECT l_returnflag,"
        " CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE) AS qty_O,"
        " CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE) AS qty_F"
        " FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = grouped conditional aggregation. Explicit pivot values
    ('O','F') avoid the extra distinct-discovery job — required practice
    at scale."""
    li = _t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity").cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


@query(
    "window_rank_stats",
    oracle=(
        "SELECT o_orderkey, o_orderpriority,"
        " rank() OVER w AS rnk,"
        " dense_rank() OVER w AS drnk,"
        " ntile(4) OVER w AS quartile,"
        " percent_rank() OVER w AS prank,"
        " cume_dist() OVER w AS cdist"
        " FROM orders"
        " WINDOW w AS (PARTITION BY o_orderpriority"
        "              ORDER BY o_totalprice DESC, o_orderkey)"
    ),
)
def q_window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-analytic breadth per priority class: rank, dense_rank,
    ntile, percent_rank, cume_dist. percent_rank/cume_dist are exact
    rationals evaluated with one IEEE division — engine-identical.
    Total order pinned by the o_orderkey tiebreak (SURVEY.md §7 risk a
    pattern: determinism is part of the query contract)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


_GROUPING_SETS_SQL = (
    "SELECT coalesce(l_returnflag, 'ALL') AS returnflag,"
    " coalesce(l_linestatus, 'ALL') AS linestatus,"
    " grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,"
    " count(*) AS n,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty"
    " FROM lineitem"
    " GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
)


@query("grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form of cube/rollup (§2.4 'absent'
    rows): three aggregation granularities in ONE pass over lineitem
    (Expand + single hash aggregate, not three scans), with grouping()
    flags disambiguating real NULLs from grouping NULLs. Same SQL text
    runs on both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "join_left_outer",
    oracle=(
        "SELECT c.c_custkey, c.c_mktsegment,"
        " count(o.o_orderkey) AS n_orders,"
        " CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)"
        "  AS DOUBLE) AS total_spent"
        " FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey"
        " GROUP BY c.c_custkey, c.c_mktsegment"
    ),
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders (count 0,
    total 0) — count(col) skips the nulls the outer side introduces.
    Broadcast of the smaller side still applies to outer joins (left
    outer can broadcast the right side)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle=(
        "SELECT coalesce(o.d, e.d) AS day,"
        " coalesce(o.n_orders, 0) AS n_orders,"
        " coalesce(e.n_events, 0) AS n_events"
        " FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,"
        "        count(*) AS n_orders FROM orders GROUP BY 1) o"
        " FULL OUTER JOIN"
        "      (SELECT strftime(ts, '%Y-%m-%d') AS d,"
        "        count(*) AS n_events FROM events GROUP BY 1) e"
        " ON o.d = e.d"
    ),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two daily-activity aggregates — the date
    ranges of orders and events barely overlap, so both null sides are
    exercised (coalesce to 0 keeps the result typed and checkable).
    Shape note: full outer cannot broadcast either side; it is the one
    join type that always shuffles both inputs — at scale, pre-
    aggregate before the join (done here: join runs on the small
    grouped outputs, not the fact tables)."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("n_events"))
    )
    return o.join(e, "d", "full").select(
        F.col("d").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


# ------------------------------------------------------------ subqueries

_SUBQ_IN_SQL = (
    "SELECT o_orderkey, o_totalprice FROM orders"
    " WHERE o_custkey IN (SELECT c_custkey FROM customer"
    "                     WHERE c_mktsegment = 'BUILDING')"
    " AND o_orderpriority = '1-URGENT'"
)

_SUBQ_SCALAR_SQL = (
    # The scalar is exact-decimal SUM, one double CAST, one division:
    # avg(DECIMAL) would be exact DECIMAL(22,6) in Spark but DOUBLE in
    # DuckDB — same text, differently-typed arithmetic, and a
    # threshold differing in the 6th decimal flips membership for any
    # order sitting in that sliver. sum(DECIMAL) is exact in both, and
    # CAST + divide + *1.5 are the same IEEE ops.
    "SELECT o_orderkey, o_totalprice FROM orders"
    " WHERE o_totalprice >"
    " (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
    "         / count(*) FROM orders) * 1.5"
)

_SUBQ_EXISTS_SQL = (
    "SELECT c_custkey, c_mktsegment FROM customer c"
    " WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
    "               AND o.o_totalprice > 300000)"
)


def _sql_query(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]):
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("subquery_in", oracle=_SUBQ_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery — Catalyst rewrites it to a left-semi
    join (broadcast here: the subquery output is dim-sized). Same SQL
    text on both engines."""
    return _sql_query(spark, sf_dir, _SUBQ_IN_SQL, ("orders", "customer"))


@query("subquery_scalar", oracle=_SUBQ_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery in a predicate — one extra aggregate
    job whose single-row result folds into the filter (broadcast of a
    scalar). DECIMAL avg: exact, so the 1.5× threshold is identical on
    both engines."""
    return _sql_query(spark, sf_dir, _SUBQ_SCALAR_SQL, ("orders",))


@query("subquery_exists", oracle=_SUBQ_EXISTS_SQL)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi-join on
    the correlation key with the extra predicate pushed beneath it."""
    return _sql_query(spark, sf_dir, _SUBQ_EXISTS_SQL, ("customer", "orders"))


@query(
    "join_cross",
    oracle=(
        "SELECT r1.r_name AS from_region, r2.r_name AS to_region"
        " FROM region r1 CROSS JOIN region r2 WHERE r1.r_name <> r2.r_name"
    ),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (region × region route matrix, 5×5):
    the nested-loop join §2.3 lists. Crossing is only ever sane on
    tiny inputs — Spark guards accidental ones (broadcast NLJ chosen
    here since both sides are small)."""
    r1 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    r2 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return r1.crossJoin(r2).filter(F.col("from_region") != F.col("to_region"))


_NULL_SAFE_SQL = (
    "SELECT a.event_id AS id_a, b.event_id AS id_b FROM"
    " (SELECT event_id, CASE WHEN event_type = 'error' THEN NULL"
    "   ELSE event_type END AS et FROM events WHERE event_id % 97 = 0) a"
    " JOIN"
    " (SELECT event_id, CASE WHEN event_type = 'error' THEN NULL"
    "   ELSE event_type END AS et FROM events WHERE event_id % 89 = 0) b"
    " ON a.et IS NOT DISTINCT FROM b.et AND a.event_id < b.event_id"
)


@query("join_null_safe", oracle=_NULL_SAFE_SQL)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the join variant plain
    equality silently drops. Same SQL text on both engines; the %-mod
    prefilters keep the pair count bounded."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_NULL_SAFE_SQL)


_UNPIVOT_SQL = (
    "WITH agg AS (SELECT o_orderpriority,"
    " CAST(count(*) AS DOUBLE) AS n_orders,"
    " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,"
    " CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price"
    " FROM orders GROUP BY o_orderpriority)"
    " SELECT o_orderpriority, 'n_orders' AS measure, n_orders AS value FROM agg"
    " UNION ALL"
    " SELECT o_orderpriority, 'total', total FROM agg"
    " UNION ALL"
    " SELECT o_orderpriority, 'max_price', max_price FROM agg"
)


@query("unpivot_measures", oracle=_UNPIVOT_SQL)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt — the inverse of pivot_linestatus: wide per-priority
    measures back to long (measure, value) rows via Spark's native
    unpivot (an Expand node — one pass, no join/union re-scan; the
    oracle's UNION ALL re-scans, which is why engines grew a dedicated
    operator)."""
    o = _t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "total", "max_price"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "join_right_outer",
    oracle=(
        "SELECT c.c_custkey, count(o.o_orderkey) AS n_orders"
        " FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey"
        " GROUP BY c.c_custkey"
    ),
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (§2.3's remaining literal variant — left's
    mirror; Spark broadcasts the LEFT side under a right outer, the
    symmetric rule to join_left_outer)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "window_range_frame",
    oracle=(
        "SELECT o_orderkey, o_custkey,"
        " count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_days"
        "   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS orders_30d"
        " FROM (SELECT o_orderkey, o_custkey,"
        "        date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))"
        "         AS epoch_days FROM orders)"
    ),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frames used elsewhere):
    per customer, how many orders landed in the trailing 30 days —
    peer rows with equal ordering values enter the frame together,
    the semantic ROWS cannot express."""
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.alias("epoch_days"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("orders_30d"),
    )


@query(
    "agg_bool",
    oracle=(
        "SELECT l_returnflag,"
        " bool_and(l_quantity > 0) AS all_positive,"
        " bool_or(l_discount > 0.09) AS any_high_discount,"
        " CAST(count_if(l_tax = 0) AS BIGINT) AS n_taxfree"
        " FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: bool_and / bool_or / count_if."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_taxfree"),
    )


@query(
    "dedup_latest",
    oracle=(
        "SELECT user_id, event_id, event_type FROM ("
        " SELECT user_id, event_id, event_type,"
        "  row_number() OVER (PARTITION BY user_id"
        "   ORDER BY ts DESC, event_id DESC) AS rn FROM events)"
        " WHERE rn = 1"
    ),
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key — the CDC/compaction pattern (a change
    stream reduces to current state): row_number over (key, recency)
    = 1. One shuffle on the key; at 100 TB this is the standard
    log-to-snapshot compactor."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


# ------------------------------------------------------ mode / histogram

@query(
    "agg_mode",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM ("
        " SELECT o_orderstatus, o_orderpriority, count(*) AS n,"
        "  row_number() OVER (PARTITION BY o_orderstatus"
        "   ORDER BY count(*) DESC, o_orderpriority) AS rk"
        " FROM orders GROUP BY o_orderstatus, o_orderpriority)"
        " WHERE rk = 1"
    ),
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group (mode), tie-broken by value so the
    answer is total-order deterministic — the builtin mode() leaves
    ties engine-defined. Shape: one (group, value) hash aggregate with
    map-side combine, then a window over the (small) distinct-value
    set; the raw fact rows shuffle once."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@query(
    "agg_histogram",
    oracle=(
        "SELECT bin, count(*) AS n_orders,"
        " CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_min,"
        " CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_max"
        " FROM (SELECT o_totalprice,"
        "   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        "        // 2500000 AS INT) AS bin"
        "  FROM orders) GROUP BY bin"
    ),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (25k-wide bins) via exact
    integer bucket arithmetic (cents DIV bin-width-in-cents) — the same
    bin on every engine, unlike float width_bucket at boundaries.
    Map-side: bin is computed in the scan projection, then one tiny
    (n_bins) aggregate. The 100 TB profile: histogram of a column =
    one pass, shuffle of n_bins rows."""
    o = _t(spark, sf_dir, "orders")
    binned = o.select(
        "o_totalprice",
        F.expr(
            "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 2500000 AS INT)"
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_orders"),
        F.min(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("bin_min"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("bin_max"),
    )


@query(
    "scd2_intervals",
    oracle=(
        "SELECT user_id, event_id, event_type,"
        " strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,"
        " strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,"
        " (lead(ts) OVER w IS NULL) AS is_current"
        " FROM events"
        " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval building: each
    change event is valid from its timestamp until the user's next
    event; the latest row per user is open-ended (is_current). This is
    the log→dimension-table compactor: one shuffle on the key, one
    ordered window pass — lead() with an (ts, event_id) total order so
    interval edges are deterministic under timestamp ties."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "merge_upsert",
    oracle=(
        "WITH changes AS ("
        " SELECT o_orderkey AS k,"
        "  CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10.00 AS DECIMAL(18,2)) AS p"
        " FROM orders WHERE o_orderkey % 10 = 3"
        " UNION ALL"
        " SELECT -o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p"
        " FROM orders WHERE o_orderkey % 10 = 7)"
        " SELECT coalesce(b.o_orderkey, c.k) AS o_orderkey,"
        "  CASE WHEN b.o_orderkey IS NULL THEN 'insert'"
        "       WHEN c.k IS NULL THEN 'keep' ELSE 'update' END AS action,"
        "  CAST(coalesce(c.p, CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
        "   AS final_price"
        " FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.k"
    ),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert) emulated with a full-outer join +
    coalesce — the engine-level core of what Delta/Iceberg MERGE
    compiles to: matched rows take the change's value, unmatched
    source rows insert, unmatched target rows carry forward. The change
    set derives deterministically from orders (key%10==3 → updates,
    negated key%10==7 → inserts). At 100 TB the join shuffles on the
    key both sides — or neither, if target and changelog share a
    bucketing; AQE handles the usual changelog-much-smaller skew."""
    o = _t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    updates = o.filter(F.col("o_orderkey") % 10 == 3).select(
        F.col("o_orderkey").alias("k"),
        (dec + F.lit("10.00").cast("decimal(18,2)")).alias("p"),
    )
    inserts = o.filter(F.col("o_orderkey") % 10 == 7).select(
        (-F.col("o_orderkey")).alias("k"), dec.alias("p")
    )
    changes = updates.union(inserts)
    b = o.alias("b")
    c = changes.alias("c")
    return b.join(c, F.col("b.o_orderkey") == F.col("c.k"), "full_outer").select(
        F.coalesce(F.col("b.o_orderkey"), F.col("c.k")).alias("o_orderkey"),
        F.when(F.col("b.o_orderkey").isNull(), "insert")
        .when(F.col("c.k").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.coalesce(
            F.col("c.p"), F.col("b.o_totalprice").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("final_price"),
    )


@query(
    "agg_salted",
    oracle=(
        "SELECT l_suppkey,"
        " CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,"
        " count(*) AS n_rows"
        " FROM lineitem GROUP BY l_suppkey"
    ),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators.skew.salted_sum_count):
    per-supplier quantity totals where each key's rows are first
    partially aggregated under a salt, then combined. The oracle is the
    PLAIN group-by — salting must be execution-only, invisible in the
    result (guaranteed here because the partial sums are exact
    decimals, so regrouping cannot reorder float error). This is the
    aggregation counterpart of join_skew_salted: AQE splits skewed JOIN
    partitions but not skewed aggregation keys; at 100 TB a key holding
    1% of all rows lands on one final-stage task unless salted."""
    from dist_mapreduce_spark.operators.skew import salted_sum_count

    li = _t(spark, sf_dir, "lineitem")
    out = salted_sum_count(
        li, ["l_suppkey"], F.col("l_quantity").cast("decimal(12,2)")
    )
    return out.select(
        "l_suppkey", F.col("sum_value").cast("double").alias("sum_value"), "n_rows"
    )


# ONE string, two engines: this SQL is executed verbatim by Spark SQL
# AND by the DuckDB oracle — the parity claim with zero translation
# layer. Stays inside the ANSI subset both dialects share exactly
# (GROUP BY, decimal casts/sums, CASE, HAVING, scalar arithmetic).
_SHARED_DIALECT_SQL = (
    "SELECT l_returnflag, l_linestatus,"
    " count(*) AS n_items,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,"
    " CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,"
    # CAST AS BIGINT: DuckDB widens sum(int) to HUGEINT → float export.
    " CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)"
    "  AS n_discounted"
    " FROM lineitem"
    " GROUP BY l_returnflag, l_linestatus"
    " HAVING count(*) > 10"
)


@query("sql_shared_dialect", oracle=_SHARED_DIALECT_SQL)
def q_sql_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-entry-point surface: registers the parquet tables as
    temp views and runs ONE SQL string through spark.sql — the
    IDENTICAL string the DuckDB oracle executes (the oracle above IS
    this query's text, not a translation). Catalyst plans it exactly
    like the DataFrame dialect: pruned scan, partial+final hash
    aggregate, HAVING as a post-aggregate filter."""
    from dist_mapreduce_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SHARED_DIALECT_SQL)


_PROFILE_COLS = (
    "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate o_orderpriority"
).split()


@query(
    "profile_table",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, count(*) - count({c}) AS n_nulls,"
        f" count(DISTINCT {c}) AS n_distinct FROM orders"
        for c in _PROFILE_COLS
    ),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column null count + exact distinct count over
    orders, in long format — the schema-inspection primitive a pipeline
    engine runs before ingesting a new 100 TB corpus.

    Single pass: ONE aggregate computes every (nulls, distinct) pair,
    then stack() unpivots the 1-row wide result to long — versus the
    oracle's 6 UNION ALL scans, which is what profiling looks like
    without a columnar multi-aggregate. Multiple exact count_distincts
    expand the aggregate input (one duplicate per measure — Spark's
    Expand operator); at 100 TB swap count_distinct for
    approx_count_distinct (HLL, no expand) and keep the same plan
    shape."""
    o = _t(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(c).alias(f"{c}__distinct"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (column_name, n_nulls, n_distinct)"
    )


@query(
    "skyline_pareto",
    oracle=(
        "WITH pairs AS (SELECT p_retailprice AS price, p_size,"
        "  count(*) AS n_parts, min(p_partkey) AS min_partkey"
        "  FROM part GROUP BY 1, 2),"
        " sw AS (SELECT *, max(p_size) OVER (ORDER BY price ASC, p_size DESC"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax"
        "  FROM pairs)"
        " SELECT price, p_size, n_parts, min_partkey FROM sw"
        " WHERE runmax IS NULL OR p_size > runmax"
    ),
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of parts: minimize price, maximize
    size — rows no other row dominates on both dimensions (multi-
    objective top-k, the operator behind "cheapest-but-biggest" style
    queries).

    Not the naive O(n²) dominance self-join: collapse to DISTINCT
    (price, size) pairs first (one data-sized aggregate), then the
    classic O(n log n) sweep — sort by price asc / size desc and keep
    a pair iff its size beats the running max of every earlier pair —
    as ONE window over the pair set. Ties on both dimensions survive
    together by construction (they share a pair row). The pair frame is
    |distinct price×size| ≪ |rows|, so the global-order window is a
    frontier-sized sort, not a data-sized one; at 100 TB the same two
    stages hold (the sweep input is already tiny), or range-partition
    the sweep by price band and merge band frontiers — skyline merge is
    associative. Values are compared, never computed, so the oracle is
    exact on raw doubles."""
    p = _t(spark, sf_dir, "part")
    pairs = p.groupBy(
        F.col("p_retailprice").alias("price"), "p_size"
    ).agg(
        F.count("*").alias("n_parts"), F.min("p_partkey").alias("min_partkey")
    )
    w = (
        Window.orderBy(F.asc("price"), F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pairs.withColumn("runmax", F.max("p_size").over(w))
        .filter(F.col("runmax").isNull() | (F.col("p_size") > F.col("runmax")))
        .select("price", "p_size", "n_parts", "min_partkey")
    )


# ------------------------------------- incremental aggregate maintenance

# Incremental view maintenance — the production pattern behind every
# nightly rollup: keep a per-key STATE table of mergeable partials
# (count / decimal sum / min / max), aggregate only the NEW BATCH, and
# merge. The oracle is the FULL recompute over all events, so the gate
# proves merge(state, delta) == recompute — the algebraic property that
# makes a 100 TB metric table maintainable by touching only the day's
# delta. Batch split mirrors dedup_incremental (event_id % 5 == 4).
AGGI_MOD, AGGI_REM = 5, 4


@query(
    "agg_incremental",
    oracle=(
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,"
        " CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,"
        " CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,"
        " CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value"
        " FROM events GROUP BY user_id"
    ),
)
def q_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge a maintained per-user aggregate state with a new-batch
    delta and return the merged table — which the oracle checks against
    a from-scratch recompute. Counts add; sums add EXACTLY (decimal
    partials, so merge order cannot reorder float error — the same
    guarantee agg_salted relies on); min/max combine with NULL-skipping
    CASE logic (a key seen only in history, only in the batch, or with
    all-NULL values on one side must merge totally). The full-outer
    merge join is null-safe (<=>) so a NULL user key merges as one
    group, exactly as GROUP BY treats it.

    Scale shape: history is NEVER re-scanned as raw events — its side
    of the merge is the state table (one narrow row per key); the only
    full-width pass is over the delta. At 100 TB this turns a daily
    metric refresh from an O(corpus) recompute into O(delta) + an
    equi-join on the key — and the oracle equality IS the proof the
    shortcut is lossless."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("decimal(18,6)").alias("v")
    )
    # coalesce(..., False): a NULL event_id would make the predicate
    # NULL and both filter(is_batch) and filter(~is_batch) would drop
    # the row — while the full-recompute oracle counts it. NULL ids
    # deterministically join the history side.
    is_batch = F.coalesce(
        F.col("event_id") % AGGI_MOD == AGGI_REM, F.lit(False)
    )

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    state = _partial(ev.filter(~is_batch)).alias("h")
    delta = _partial(ev.filter(is_batch)).alias("d")
    merged = state.join(
        delta, F.col("h.user_id").eqNullSafe(F.col("d.user_id")), "full_outer"
    )

    def _nz(side: str, col: str):
        return F.coalesce(F.col(f"{side}.{col}"), F.lit(0))

    def _skip_null(col: str, fn):
        a, b = F.col(f"h.{col}"), F.col(f"d.{col}")
        return (
            F.when(a.isNull(), b).when(b.isNull(), a).otherwise(fn(a, b))
        )

    return merged.select(
        F.coalesce(F.col("h.user_id"), F.col("d.user_id")).alias("user_id"),
        (_nz("h", "cnt") + _nz("d", "cnt")).alias("n_events"),
        F.when(
            F.col("h.s").isNull() & F.col("d.s").isNull(), F.lit(None)
        )
        .otherwise(
            F.coalesce(F.col("h.s"), F.lit(0).cast("decimal(18,6)"))
            + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("sum_value"),
        _skip_null("mn", F.least).cast("double").alias("min_value"),
        _skip_null("mx", F.greatest).cast("double").alias("max_value"),
    )


# ------------------------------------------- data-quality expectations

@query(
    "dq_expectations",
    oracle=(
        "SELECT 'orders_custkey_fk' AS check_name,"
        "  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_checked,"
        "  (SELECT CAST(count(*) AS BIGINT) FROM orders o WHERE NOT EXISTS"
        "    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))"
        "   AS n_violations"
        " UNION ALL SELECT 'lineitem_orderkey_fk',"
        "  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),"
        "  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l WHERE NOT EXISTS"
        "    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))"
        " UNION ALL SELECT 'orders_orderkey_unique',"
        "  (SELECT CAST(count(*) AS BIGINT) FROM orders),"
        "  (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)"
        "   FROM orders)"
        " UNION ALL SELECT 'documents_text_nonnull',"
        "  (SELECT CAST(count(*) AS BIGINT) FROM documents),"
        "  (SELECT CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT)"
        "   FROM documents)"
        " UNION ALL SELECT 'lineitem_quantity_range',"
        "  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),"
        "  (SELECT CAST(count(*) FILTER (WHERE l_quantity IS NULL"
        "    OR l_quantity < 1 OR l_quantity > 50) AS BIGINT) FROM lineitem)"
        " UNION ALL SELECT 'lineitem_discount_range',"
        "  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),"
        "  (SELECT CAST(count(*) FILTER (WHERE l_discount IS NULL"
        "    OR l_discount < 0.0 OR l_discount > 0.1) AS BIGINT)"
        "   FROM lineitem)"
    ),
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit — the expectation suite a
    production pipeline runs before training on (or publishing) a
    snapshot: referential integrity (orders→customer,
    lineitem→orders, counted via anti-joins whose NULL-key rows are
    violations in both engines — anti-join and NOT EXISTS agree NULL
    matches nothing), key uniqueness (count − distinct), null-rate,
    and accepted value ranges, all as exact counts in one result
    table. A violation count of zero is a PASSING check, not a
    missing row — the audit always emits every check.

    Scale shape: every single-table check shares ONE aggregate (and so
    one scan) per table — lineitem's row count and both range checks
    are three counters in the same HashAggregate; orders' count and
    uniqueness likewise — and each referential check adds exactly its
    one anti-join. The 1-row per-table stats cross-join (all tiny)
    into a single row, and the six check rows are an explode of that
    row, so violations cost the scans you already pay to read the
    snapshot. Violation counters use count(CASE …) — never NULL, even
    on an empty table, matching the oracle's count(*) FILTER."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    documents = _t(spark, sf_dir, "documents")

    li_stats = lineitem.agg(
        F.count("*").alias("li_n"),
        F.count(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            )
        ).alias("qty_v"),
        F.count(
            F.when(
                F.col("l_discount").isNull()
                | (F.col("l_discount") < 0.0)
                | (F.col("l_discount") > 0.1),
                1,
            )
        ).alias("disc_v"),
    )
    ord_stats = orders.agg(
        F.count("*").alias("o_n"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("uniq_v"),
    )
    doc_stats = documents.agg(
        F.count("*").alias("d_n"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("null_v"),
    )
    fk_o = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
    ).agg(F.count("*").alias("fk_o_v"))
    fk_l = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
    ).agg(F.count("*").alias("fk_l_v"))

    row = (
        li_stats.crossJoin(ord_stats)
        .crossJoin(doc_stats)
        .crossJoin(fk_o)
        .crossJoin(fk_l)
    )

    def c(name: str, checked: str, violations: str):
        return F.struct(
            F.lit(name).alias("check_name"),
            F.col(checked).alias("n_checked"),
            F.col(violations).alias("n_violations"),
        )

    return row.select(
        F.explode(
            F.array(
                c("orders_custkey_fk", "o_n", "fk_o_v"),
                c("lineitem_orderkey_fk", "li_n", "fk_l_v"),
                c("orders_orderkey_unique", "o_n", "uniq_v"),
                c("documents_text_nonnull", "d_n", "null_v"),
                c("lineitem_quantity_range", "li_n", "qty_v"),
                c("lineitem_discount_range", "li_n", "disc_v"),
            )
        ).alias("chk")
    ).select("chk.*")


# ------------------------------------------------------------- ntile

@query(
    "window_ntile",
    oracle=(
        "SELECT o_orderkey, o_orderpriority,"
        " CAST(ntile(4) OVER (PARTITION BY o_orderpriority"
        "  ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile"
        " FROM orders"
    ),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment per order-priority band — the feature-
    bucketing window (ntile) the rank/lag/frame family was missing.
    ntile is purely row-count arithmetic over a TOTAL order (price,
    then key), so both engines place every row identically; the only
    cross-engine hazard is the return type (int vs bigint), pinned by
    casting both sides. One shuffle on the partition key, nothing
    else."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --------------------------------------- distribution-position windows

@query(
    "window_percent_rank",
    oracle=(
        "SELECT o_orderkey, o_orderpriority,"
        " percent_rank() OVER (PARTITION BY o_orderpriority"
        "  ORDER BY o_totalprice, o_orderkey) AS pct_rank,"
        " cume_dist() OVER (PARTITION BY o_orderpriority"
        "  ORDER BY o_totalprice, o_orderkey) AS cume"
        " FROM orders"
    ),
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position windows (percent_rank + cume_dist) per
    order-priority band — the distribution-position twins that complete
    the rank family (rank/dense_rank in window_rank_stats, buckets in
    window_ntile). Both functions are a single IEEE division of two
    exact integers ((rank-1)/(n-1), peers/n) over a TOTAL order, so the
    engines agree bit-for-bit — no quantization needed. Same physical
    shape as every window here: one hash exchange on the partition key,
    one in-partition sort, no second shuffle."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ------------------------------------------------- skew diagnostics

#: Heavy hitters reported by the skew audit.
SKEW_TOPK = 20


@query(
    "skew_hitters",
    oracle=(
        "WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt"
        "  FROM events GROUP BY user_id),"
        " tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),"
        " top AS (SELECT user_id, cnt, CAST(cnt * 1000000 // tot.n AS BIGINT)"
        "   AS ppm FROM c CROSS JOIN tot"
        "  ORDER BY cnt DESC, user_id NULLS LAST"
        f"  LIMIT {SKEW_TOPK})"
        " SELECT user_id, cnt, ppm,"
        "  CAST(sum(cnt) OVER (ORDER BY cnt DESC, user_id NULLS LAST"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        "   AS BIGINT) AS cum_cnt"
        " FROM top"
    ),
)
def q_skew_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter skew audit — the measurement that DECIDES the
    mitigation every skew-sensitive plan here assumes (join_skew_salted,
    agg_salted, the minhash band caps): top-K keys by row count with
    exact parts-per-million share and the cumulative count of the
    frontier. At 100 TB you run this before choosing salt factors or
    AQE skew thresholds; a key above a few thousand ppm of a
    multi-billion-row table is a straggler in waiting. Everything is
    integer-exact (counts, floor-ppm, running sum over the pinned
    total order), so the audit is bit-stable across engines and runs.

    Plan: one hash aggregate on the key, a broadcast 1-row total, and
    a TakeOrderedAndProject frontier — the running sum happens on the
    K-row result, not the key space. NULL keys participate (a NULL-key
    flood is the most common real-world skew) with NULLS LAST pinned
    in the tie order."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    # sum of per-key counts == total row count (NULL keys group too), so
    # the total comes from a bare count(*) over the scan — parquet
    # answers it from row-group metadata — instead of re-planning the
    # whole groupBy pipeline a second time under the old
    # counts.agg(sum) subtree (round 15, guide §1.2 "don't compute
    # things you throw away"). A global window over counts would be
    # wrong at scale: it single-partitions an unbounded key space.
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    top = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id", "cnt", F.expr("cnt * 1000000 DIV n").alias("ppm")
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id").asc_nulls_last())
        .limit(SKEW_TOPK)
    )
    w = (
        Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        "user_id", "cnt", "ppm", F.sum("cnt").over(w).alias("cum_cnt")
    )


# ----------------------------------------------------- portable HLL sketch

#: sketch_hll: hand-rolled HyperLogLog whose registers AND estimate are
#: bit-exact across engines (unlike approx_distinct, whose built-in
#: sketches are engine-specific and only contract-checked to ±5%).
HLL_M = 256                # registers (b = 8 index bits); rsd ≈ 6.5%
HLL_WBITS = 40             # 48-bit md5 prefix minus the 8 index bits
#: alpha_256 · m² · 2^50 as one double literal (alpha_m = 0.7213 /
#: (1 + 1.079/m), the published constant); the raw estimate is this
#: single constant divided by the exact-integer register sum — ONE
#: IEEE division per engine.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_ALPHA_NUM = HLL_ALPHA * HLL_M * HLL_M * (2 ** 50)
#: Small-range (linear counting) correction table: ln(m / V) for
#: V = 1..m, precomputed ONCE in driver Python and inlined as the same
#: double literals into both dialects — ln() itself is libm and not
#: bit-portable, but a shared literal table is, so the corrected
#: estimator stays exactly cross-engine-checkable.
import math as _math  # noqa: E402

_HLL_LN = [_math.log(HLL_M / v) for v in range(1, HLL_M + 1)]
_LN_SPARK = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in _HLL_LN) + ")"
_LN_DUCK = "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in _HLL_LN) + "]"


def _hll_est_sql(raw: str, vz: str, lut: str) -> str:
    """Corrected estimate — dialect-neutral given a 1-based array index
    syntax hole: linear counting m·ln(m/V) when V > 0 and the raw
    estimate is under 2.5·m (the published switch), else raw."""
    return (
        f"CASE WHEN {vz} > 0 AND ({raw}) < {2.5 * HLL_M!r}"
        f" THEN CAST({HLL_M} AS DOUBLE) * {lut}"
        f" ELSE ({raw}) END"
    )


@query(
    "sketch_hll",
    oracle=(
        f"WITH h AS (SELECT DISTINCT"
        f"  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))"
        f"   AS BIGINT) AS hv"
        f"  FROM events WHERE user_id IS NOT NULL),"
        f" reg AS (SELECT hv % {HLL_M} AS j, hv // {HLL_M} AS w FROM h),"
        f" rho AS (SELECT j, CASE WHEN w = 0 THEN {HLL_WBITS + 1}"
        f"  ELSE {HLL_WBITS + 1} - length(bin(w)) END AS r FROM reg),"
        f" mx AS (SELECT j, max(r) AS mj FROM rho GROUP BY j),"
        f" fl AS (SELECT t.j, coalesce(mx.mj, 0) AS mj"
        f"  FROM range(0, {HLL_M}) t(j) LEFT JOIN mx ON mx.j = t.j),"
        f" agg AS (SELECT"
        f"  CAST(sum(CAST(1 AS BIGINT) << (50 - mj)) AS BIGINT) AS reg_sum,"
        f"  CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f"   AS v_zero FROM fl),"
        f" ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users"
        f"  FROM events WHERE user_id IS NOT NULL),"
        f" es AS (SELECT reg_sum, v_zero,"
        f"  {_hll_est_sql(f'CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(reg_sum AS DOUBLE)', 'v_zero', _LN_DUCK + '[CAST(v_zero AS INT)]')}"
        f"   AS hll_estimate,"
        f"  CASE WHEN v_zero > 0 AND CAST({HLL_ALPHA_NUM!r} AS DOUBLE)"
        f"    / CAST(reg_sum AS DOUBLE) < {2.5 * HLL_M!r}"
        f"   THEN 'linear_counting' ELSE 'raw' END AS method FROM agg)"
        f" SELECT CAST({HLL_M} AS BIGINT) AS m, reg_sum, v_zero,"
        f"  hll_estimate, method, exact_users,"
        f"  abs(hll_estimate - CAST(exact_users AS DOUBLE))"
        f"   / CAST(greatest(exact_users, 1) AS DOUBLE) AS rel_err"
        f" FROM es, ex"
    ),
)
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog (Flajolet et al. 2007) — the distinct-count
    sketch implemented so that every register and the final estimate
    are bit-identical across engines, which is what lets a 100 TB
    pipeline persist sketches, merge them across days/partitions and
    audit them anywhere (approx_distinct's built-in HLL++ is
    engine-private state; this one is an open wire format by
    construction). Register index = low 8 bits of a 48-bit md5 prefix;
    rho = leading-zero count of the remaining 40 bits + 1, computed as
    41 − length(bin(w)) — the quality_perplexity floor-log2-via-bin
    trick, pure integer. Registers max-merge (order-independent and
    mergeable — the sketch's whole point); the harmonic-mean
    denominator Σ 2^−Mⱼ is EXACT-INTEGER as Σ 2^(50−Mⱼ) / 2^50 (every
    term a representable power of two — no float-summation order
    anywhere); the raw estimate is one double division; and the
    published small-range correction (linear counting m·ln(m/V) when
    the raw estimate < 2.5m and empty registers exist) stays
    bit-portable because the 256-entry ln(m/V) table is precomputed in
    driver Python and inlined as IDENTICAL double literals into both
    dialects — ln() itself is libm and engine-varying, a shared
    literal table is not.

    The row carries the estimate, which branch fired, the exact
    distinct count, and the realized relative error (gate corpora:
    3.0% / 10.5% / 11.6% at sf0.001/0.01/0.1 — within the 2σ band of
    the 1.04/√256 = 6.5% rsd).

    Scale shape: one scan, one 256-row aggregate, no
    distinct-expansion shuffle of user ids (the DISTINCT hv is
    belt-and-braces at sf; max-merge makes it redundant) — the
    mergeable-sketch pattern agg_incremental's contract composes
    with."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = ev.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("hv")
    ).distinct()
    reg = h.select(
        (F.col("hv") % HLL_M).alias("j"),
        F.floor(F.col("hv") / HLL_M).cast("bigint").alias("w"),
    )
    rho = reg.select(
        "j",
        F.when(F.col("w") == 0, F.lit(HLL_WBITS + 1))
        .otherwise(F.lit(HLL_WBITS + 1) - F.length(F.bin("w")))
        .alias("r"),
    )
    mx = rho.groupBy("j").agg(F.max("r").alias("mj"))
    allj = spark.range(HLL_M).select(F.col("id").alias("j"))
    fl = allj.join(mx, "j", "left").select(
        "j", F.coalesce(F.col("mj"), F.lit(0)).alias("mj")
    )
    agg = fl.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - mj)"))
        .cast("long")
        .alias("reg_sum"),
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
    ).withColumn("k", F.lit(1))
    ex = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    ).withColumn("k", F.lit(1))
    raw = (
        f"CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(reg_sum AS DOUBLE)"
    )
    est_sql = _hll_est_sql(
        raw, "v_zero", f"element_at({_LN_SPARK}, CAST(v_zero AS INT))"
    )
    method_sql = (
        f"CASE WHEN v_zero > 0 AND ({raw}) < {2.5 * HLL_M!r}"
        f" THEN 'linear_counting' ELSE 'raw' END"
    )
    return (
        agg.join(ex, "k")
        .select(
            F.lit(HLL_M).cast("long").alias("m"),
            "reg_sum",
            "v_zero",
            F.expr(est_sql).alias("hll_estimate"),
            F.expr(method_sql).alias("method"),
            "exact_users",
            (
                F.abs(F.expr(est_sql) - F.col("exact_users").cast("double"))
                / F.greatest(F.col("exact_users"), F.lit(1)).cast("double")
            ).alias("rel_err"),
        )
    )


# ------------------------------------------- partitioned HLL sketches

def _hll_sum_sql(src: str, part_expr: str) -> str:
    """reg_sum / v_zero aggregate over a zero-filled register table
    `src(part?, j, mj)` — the exact-integer Σ 2^(50−Mⱼ) denominator
    shared by sketch_hll."""
    grp = f" GROUP BY {part_expr}" if part_expr else ""
    sel = f"{part_expr} AS part, " if part_expr else ""
    return (
        f"SELECT {sel}"
        f"CAST(sum(CAST(1 AS BIGINT) << (50 - mj)) AS BIGINT) AS reg_sum,"
        f" CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS v_zero FROM {src}{grp}"
    )


def _hll_merge_oracle() -> str:
    raw = f"CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(reg_sum AS DOUBLE)"
    est = _hll_est_sql(raw, "v_zero", _LN_DUCK + "[CAST(v_zero AS INT)]")
    return (
        f"WITH h AS (SELECT DISTINCT coalesce(event_type, '(null)') AS part,"
        f"  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))"
        f"   AS BIGINT) AS hv"
        f"  FROM events WHERE user_id IS NOT NULL),"
        f" rho AS (SELECT part, hv % {HLL_M} AS j,"
        f"  CASE WHEN hv // {HLL_M} = 0 THEN {HLL_WBITS + 1}"
        f"   ELSE {HLL_WBITS + 1} - length(bin(hv // {HLL_M})) END AS r"
        f"  FROM h),"
        f" mx AS (SELECT part, j, max(r) AS mj FROM rho GROUP BY part, j),"
        f" parts AS (SELECT DISTINCT part FROM h),"
        f" fl AS (SELECT p.part, t.j, coalesce(mx.mj, 0) AS mj"
        f"  FROM parts p CROSS JOIN range(0, {HLL_M}) t(j)"
        f"  LEFT JOIN mx ON mx.part = p.part AND mx.j = t.j),"
        f" mg AS (SELECT j, max(mj) AS mj FROM fl GROUP BY j),"
        f" grho AS (SELECT hv % {HLL_M} AS j,"
        f"  CASE WHEN hv // {HLL_M} = 0 THEN {HLL_WBITS + 1}"
        f"   ELSE {HLL_WBITS + 1} - length(bin(hv // {HLL_M})) END AS r"
        f"  FROM (SELECT DISTINCT hv FROM h)),"
        f" gmx AS (SELECT j, max(r) AS mj FROM grho GROUP BY j),"
        f" gfl AS (SELECT t.j, coalesce(gmx.mj, 0) AS mj"
        f"  FROM range(0, {HLL_M}) t(j) LEFT JOIN gmx ON gmx.j = t.j),"
        f" pa AS ({_hll_sum_sql('fl', 'part')}),"
        f" ma AS (SELECT 'zz_merged' AS part, reg_sum, v_zero"
        f"  FROM ({_hll_sum_sql('mg', '')})),"
        f" ga AS (SELECT 'zz_global' AS part, reg_sum, v_zero"
        f"  FROM ({_hll_sum_sql('gfl', '')})),"
        f" u AS (SELECT * FROM pa UNION ALL SELECT * FROM ma"
        f"  UNION ALL SELECT * FROM ga)"
        f" SELECT part, reg_sum, v_zero, {est} AS hll_estimate FROM u"
    )


@query("sketch_hll_merge", oracle=_hll_merge_oracle())
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED HyperLogLog sketches + max-merge — the 100 TB
    deployment shape of sketch_hll: one 256-register sketch PER
    SOURCE PARTITION (event_type here; per-day/per-shard in
    production), persisted as plain (part, j, Mⱼ) rows, then combined
    by register-wise MAX — the merge that makes HLL the standard
    distinct sketch for data warehouses (merge is associative,
    commutative, idempotent; a year of daily sketches folds into one).

    The output carries the per-partition sketch summaries AND two
    independently derived rows: `zz_merged` (max-merge of the per-part
    register sets) and `zz_global` (the sketch computed directly over
    the undivided corpus). These two rows are equal BY THE ALGEBRA
    (max over parts of per-part maxima = global maximum, register by
    register) and the value-hash compare proves both engines agree on
    every register sum — the mergeability contract the sketch_hll
    docstring sells, demonstrated rather than asserted
    (test_hll_merge_equals_global pins merged == global row equality).

    Scale shape: per-part sketching is one narrow aggregate keyed
    (part, j) — map-side combinable, ≤ |parts|·256 rows ever shuffle;
    the merge touches only register rows, never re-reads events. At
    100 TB the per-day sketches are a few KB each and the merge is a
    driver-trivial 256-row aggregate — this is why one NEVER
    re-scans history for a distinct count."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h = ev.select(
        F.coalesce(F.col("event_type"), F.lit("(null)")).alias("part"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("hv"),
    ).distinct()
    rho_r = (
        F.when(F.floor(F.col("hv") / HLL_M) == 0, F.lit(HLL_WBITS + 1))
        .otherwise(
            F.lit(HLL_WBITS + 1)
            - F.length(F.bin(F.floor(F.col("hv") / HLL_M).cast("bigint")))
        )
        .alias("r")
    )
    rho = h.select("part", (F.col("hv") % HLL_M).alias("j"), rho_r)
    mx = rho.groupBy("part", "j").agg(F.max("r").alias("mj"))
    allj = spark.range(HLL_M).select(F.col("id").alias("j"))
    parts = h.select("part").distinct()
    fl = (
        parts.crossJoin(allj)
        .join(mx, ["part", "j"], "left")
        .select("part", "j", F.coalesce(F.col("mj"), F.lit(0)).alias("mj"))
    )
    mg = fl.groupBy("j").agg(F.max("mj").alias("mj"))
    grho = h.select("hv").distinct().select(
        (F.col("hv") % HLL_M).alias("j"), rho_r
    )
    gmx = grho.groupBy("j").agg(F.max("r").alias("mj"))
    gfl = allj.join(gmx, "j", "left").select(
        "j", F.coalesce(F.col("mj"), F.lit(0)).alias("mj")
    )
    reg_sum = (
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - mj)"))
        .cast("long")
        .alias("reg_sum")
    )
    v_zero = (
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0)).cast("long").alias("v_zero")
    )
    pa = fl.groupBy("part").agg(reg_sum, v_zero)
    ma = mg.agg(reg_sum, v_zero).select(
        F.lit("zz_merged").alias("part"), "reg_sum", "v_zero"
    )
    ga = gfl.agg(reg_sum, v_zero).select(
        F.lit("zz_global").alias("part"), "reg_sum", "v_zero"
    )
    raw = f"CAST({HLL_ALPHA_NUM!r} AS DOUBLE) / CAST(reg_sum AS DOUBLE)"
    est_sql = _hll_est_sql(
        raw, "v_zero", f"element_at({_LN_SPARK}, CAST(v_zero AS INT))"
    )
    return (
        pa.unionByName(ma)
        .unionByName(ga)
        .select("part", "reg_sum", "v_zero", F.expr(est_sql).alias("hll_estimate"))
    )
