"""Scalar-function surface (SURVEY.md §2.8): the reference has exactly
four scalar operations (tokenize-split, regex match, prefix test,
int→string format — all covered in reference_core); Spark provides the
full library. These queries pin the breadth — string, date/time, math,
JSON, array aggregation, percentiles — with cross-engine-exact oracles.

Parity rules used here:
- no round() on doubles (Spark rounds HALF_UP, DuckDB HALF_EVEN) and
  no libm transcendentals (ln/exp differ by 1 ulp across engines);
  math stays in exact ints/decimals or IEEE-correctly-rounded ops
  (sqrt, pow-of-2 on small ints);
- collect_list order is pinned with sort_array ↔ ORDER BY in agg;
- JSON extraction compared as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "fn_string",
    oracle=(
        "SELECT p_partkey,"
        " upper(p_brand) AS brand_up,"
        " lower(p_type) AS type_lo,"
        " substr(p_name, 1, 10) AS name10,"
        " length(p_name) AS name_len,"
        " concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,"
        " replace(p_type, ' ', '_') AS type_snake,"
        " lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,"
        " CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,"
        " trim(p_name) AS name_trim"
        " FROM part"
    ),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth over part."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.trim("p_name").alias("name_trim"),
    )


@query(
    "fn_date",
    oracle=(
        "SELECT o_orderkey,"
        " CAST(year(o_orderdate) AS INT) AS yr,"
        " CAST(month(o_orderdate) AS INT) AS mo,"
        " CAST(dayofmonth(o_orderdate) AS INT) AS dom,"
        " strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,"
        " strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')"
        "  AS plus30,"
        " CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))"
        "  AS INT) AS days_since_2024"
        " FROM orders"
    ),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions over orders (o_orderdate is a timestamp)."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(d.cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_2024"
        ),
    )


@query(
    "fn_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber,"
        " abs(l_quantity - 25.0) AS dist25,"
        " sqrt(l_quantity) AS root,"
        " power(l_quantity, 2.0) AS q2,"
        # CAST AS BIGINT: DuckDB floor/ceil return DOUBLE; Spark's are LONG.
        " CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,"
        " CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,"
        # floor, not CAST: DuckDB CAST(double AS BIGINT) rounds half-even
        # while Spark's cast truncates — floor() is identical in both.
        " CAST(floor(l_quantity) AS BIGINT) % 7 AS mod7,"
        " greatest(l_tax, l_discount) AS gmax,"
        " least(l_tax, l_discount) AS lmin"
        " FROM lineitem"
    ),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions. Parity-safe subset only: sqrt is IEEE-754
    correctly-rounded everywhere and pow(x, 2) of small integers is
    exact, but ln/exp are libm-dependent (JVM vs DuckDB differ by
    1 ulp) — transcendentals beyond sqrt are excluded from the
    oracle-checked surface. No round(): its tie behavior is
    engine-specific (HALF_UP vs HALF_EVEN)."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("dist25"),
        F.sqrt(q).alias("root"),
        F.pow(q, 2.0).alias("q2"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.floor(q) % 7).alias("mod7"),
        F.greatest("l_tax", "l_discount").alias("gmax"),
        F.least("l_tax", "l_discount").alias("lmin"),
    )


@query(
    "fn_json",
    oracle=(
        # try_cast to DOUBLE then floor: Spark's ANSI string->bigint cast
        # THROWS on '1.5' while DuckDB's rounds it; double-then-floor is
        # total (NULL on non-numeric) and identical in both engines.
        "SELECT event_id, json_extract_string(props, '$.k') AS k_str,"
        " CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))"
        "  AS BIGINT) AS k_num"
        " FROM events"
    ),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column. The
    reference uses JSON only as a wire format (worker.go:94); here it
    is a queryable column type."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        F.floor(F.expr("try_cast(get_json_object(props, '$.k') AS DOUBLE)"))
        .cast("bigint")
        .alias("k_num"),
    )


@query(
    "agg_collect",
    oracle=(
        "SELECT n_regionkey, list(n_name ORDER BY n_name) AS nations,"
        " count(*) AS n FROM nation GROUP BY n_regionkey"
    ),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with pinned order: sort_array(collect_list())
    ↔ list(x ORDER BY x) — collect order is nondeterministic in any
    distributed engine, so the sort is part of the contract."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("nations"),
        F.count("*").alias("n"),
    )


@query(
    "agg_percentile",
    oracle=(
        "SELECT l_returnflag,"
        " quantile_cont(l_quantity, 0.5) AS median_qty,"
        " quantile_cont(l_quantity, 0.9) AS p90_qty,"
        " min(l_quantity) AS min_qty, max(l_quantity) AS max_qty"
        " FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — percentile() ↔
    quantile_cont over integral quantities gives identical doubles).
    The 100 TB path is approx_percentile (one-pass sketch), pinned
    rows-only in agg_percentile_approx."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "agg_percentile_approx",
    oracle=(
        # The GK sketch value is engine-specific; the checkable contract
        # is its rank guarantee: with accuracy=10000 the estimate's rank
        # error is ≤ n/10000, so it must land between the exact 0.49 and
        # 0.51 quantiles. Spark computes that boolean (the exact
        # percentiles never leave Spark, so no FP-interpolation parity
        # issue); the oracle asserts TRUE.
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,"
        " TRUE AS median_in_band"
        " FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the mergeable-sketch quantile for 100 TB
    scans (Greenwald-Khanna). Emits the sketch's rank-guarantee verdict
    — estimate within the exact [p49, p51] band — instead of the raw
    engine-specific estimate, making the operator exactly checkable."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.approx_percentile("l_extendedprice", 0.5, 10000)
        .between(
            F.percentile("l_extendedprice", 0.49),
            F.percentile("l_extendedprice", 0.51),
        )
        .alias("median_in_band"),
    )


# ------------------------------------------------- array / map / cond

#: Shared token expressions — Spark filter(split()) ↔ DuckDB
#: list_filter(string_split_regex()) — both drop the empty strings a
#: leading/trailing separator produces.
_D_TOKS_NONEMPTY = (
    "list_filter(string_split_regex(text, '[^a-zA-Z]+'), x -> x <> '')"
)


@query(
    "fn_array",
    oracle=(
        f"SELECT doc_id,"
        f" len(t) AS n_tokens,"
        f" CAST(list_contains(t, 'the') AS INT) AS has_the,"
        f" array_to_string(t[1:3], ' ') AS first3,"
        f" list_sort(t)[1] AS first_sorted,"
        f" len(list_distinct(t)) AS n_uniq,"
        f" list_reverse(t)[1] AS last_tok"
        f" FROM (SELECT doc_id, {_D_TOKS_NONEMPTY} AS t FROM documents)"
    ),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth (size/contains/slice/sort/distinct/
    reverse) over the tokenized documents — all higher-order /
    collection functions evaluate JVM-side inside codegen, the 100 TB
    alternative to a Python tokenizer UDF."""
    d = _t(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.col("text"), "[^a-zA-Z]+"), lambda x: x != F.lit("")
    )
    return d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.array_contains(t, "the").cast("int").alias("has_the"),
        F.array_join(F.slice(t, 1, 3), " ").alias("first3"),
        # try_element_at: NULL on an empty token array (blank document)
        # instead of ANSI INVALID_ARRAY_INDEX — matches DuckDB's
        # out-of-range list access returning NULL.
        F.try_element_at(F.array_sort(t), F.lit(1)).alias("first_sorted"),
        F.size(F.array_distinct(t)).alias("n_uniq"),
        F.try_element_at(F.reverse(t), F.lit(1)).alias("last_tok"),
    )


@query(
    "fn_map",
    oracle=(
        "SELECT n_regionkey,"
        " array_to_string(list(n_name ORDER BY n_name), ',') AS keys_join,"
        " count(*) AS n_entries,"
        " max(CASE WHEN n_name = 'ALGERIA' THEN n_nationkey END) AS algeria_key,"
        # CAST AS BIGINT: DuckDB sum() widens to HUGEINT → float export.
        " CAST(sum(n_nationkey) AS BIGINT) AS key_sum"
        " FROM nation GROUP BY n_regionkey"
    ),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build name→key maps per region
    (map_from_entries over an order-pinned entry array), then read them
    back with map_keys / element_at / aggregate-over-map_values. The
    oracle computes the same scalars relationally — what is checked is
    the values; what is exercised is Spark's map machinery."""
    n = _t(spark, sf_dir, "nation")
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("n_name", "n_nationkey")))
    )
    return (
        n.groupBy("n_regionkey")
        .agg(m.alias("m"))
        .select(
            "n_regionkey",
            F.array_join(F.map_keys("m"), ",").alias("keys_join"),
            F.size("m").cast("long").alias("n_entries"),
            F.element_at(F.col("m"), F.lit("ALGERIA")).alias("algeria_key"),
            F.aggregate(
                F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
            ).alias("key_sum"),
        )
    )


@query(
    "fn_conditional",
    oracle=(
        "SELECT c_custkey,"
        " coalesce(nullif(c_mktsegment, 'BUILDING'), '<bldg>') AS seg_masked,"
        " CASE WHEN c_acctbal < 0 THEN 'debt'"
        "      WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,"
        " CAST(nullif(c_mktsegment, 'BUILDING') IS NULL AS INT) AS seg_null,"
        " if(c_acctbal >= 0, 'ok', 'neg') AS sign_flag"
        " FROM customer"
    ),
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling breadth: nullif, coalesce, CASE
    chains, IS NULL, if() — the boolean algebra §2.2 marks absent in
    the reference."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("<bldg>")
        ).alias("seg_masked"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.isnull(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
        .cast("int")
        .alias("seg_null"),
        F.when(F.col("c_acctbal") >= 0, "ok").otherwise("neg").alias("sign_flag"),
    )


# Exact decimal sum rendered to DOUBLE via VARCHAR: decimal→string is
# exact and string→double is correctly rounded in every engine, so the
# resulting bits are engine-independent. A direct decimal→double CAST
# is NOT: DuckDB converts (int128 unscaled)/(10^scale) with two float
# roundings while Spark's BigDecimal conversion rounds once — they can
# (and at sf0.001 did) differ in the last ulp.
def _dsum(expr: str) -> str:
    return f"CAST(CAST(sum({expr}) AS VARCHAR) AS DOUBLE)"


_QTY_D = "CAST(l_quantity AS DECIMAL(18,2))"
_PRICE_D = "CAST(l_extendedprice AS DECIMAL(18,2))"


@query(
    "agg_stats",
    oracle=(
        # greatest(…, 0): the cancellation form can go a hair negative
        # for a (near-)constant group — DuckDB sqrt(-1e-10) ABORTS the
        # whole query where Spark yields NaN, so clamp on both sides.
        "SELECT l_returnflag, n, avg_qty, var_qty, sqrt(var_qty) AS stddev_qty"
        " FROM (SELECT l_returnflag, count(*) AS n,"
        f"  {_dsum(_QTY_D)} / n AS avg_qty,"
        f"  greatest(({_dsum(f'{_QTY_D} * {_QTY_D}')}"
        f"   - {_dsum(_QTY_D)} * {_dsum(_QTY_D)} / n)"
        "  / (n - 1), 0.0) AS var_qty"
        " FROM lineitem GROUP BY l_returnflag)"
    ),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics (avg/variance/stddev) per return flag.

    Deliberately NOT the built-in stddev(): one-pass central-moment
    aggregators are partition-order-dependent in their float error, so
    a distributed Spark run and a single-threaded DuckDB run disagree
    in the last ulps. Instead: exact DECIMAL sums of x and x² (order-
    independent), then one fixed double expression — bit-identical on
    both engines AND still a single map-side-combined aggregate pass.
    That is also the right 100 TB shape: sum/sum² are tiny mergeable
    state, same as the built-in, with none of the float drift."""
    li = _t(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(18,2)")
    n = F.count("*")
    # string-routed decimal→double: see _dsum above (ulp parity).
    sx = F.sum(qd).cast("string").cast("double")
    sxx = F.sum(qd * qd).cast("string").cast("double")
    base = li.groupBy("l_returnflag").agg(
        n.alias("n"), sx.alias("sx"), sxx.alias("sxx")
    )
    # try_divide: a single-row group has n-1 = 0; ANSI mode would abort
    # the job where DuckDB (and SQL var_samp) yield NULL.
    # greatest-with-0 mirrors the oracle's clamp (NULL propagates
    # through greatest untouched since try_divide NULLs stay NULL).
    var = F.greatest(
        F.try_divide(
            F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
            F.col("n") - 1,
        ),
        F.lit(0.0),
    )
    return base.select(
        "l_returnflag",
        "n",
        (F.col("sx") / F.col("n")).alias("avg_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


@query(
    "fn_string2",
    oracle=(
        "SELECT p_partkey,"
        " levenshtein(p_brand, 'Brand#13') AS lev_brand,"
        " translate(p_type, 'aeiou', '-----') AS type_devowel,"
        " split_part(p_type, ' ', 1) AS type_first,"
        " reverse(p_name) AS name_rev,"
        " repeat('*', p_size % 5) AS stars,"
        " instr(p_name, 'red') AS red_at,"
        " left(p_name, 5) AS name_left,"
        " right(p_name, 5) AS name_right"
        " FROM part"
    ),
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function tranche: edit distance, translate,
    split_part, reverse, repeat, instr, left/right — all exact-integer
    or pure-string ops, parity-safe across engines."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).alias("lev_brand"),
        F.translate(F.col("p_type"), "aeiou", "-----").alias("type_devowel"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.instr(F.col("p_name"), "red").alias("red_at"),
        F.left(F.col("p_name"), F.lit(5)).alias("name_left"),
        F.right(F.col("p_name"), F.lit(5)).alias("name_right"),
    )


@query(
    "agg_argmax",
    oracle=(
        "SELECT o_orderpriority,"
        # floor(), not CAST: DuckDB CAST(double AS BIGINT) rounds
        # half-even while Spark's cast truncates — on sf0.01, 708 of
        # ~15k prices disagree between the two. floor is identical.
        " arg_max(o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT)"
        "         * 1000000000 + o_orderkey) AS top_order,"
        " arg_min(o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT)"
        "         * 1000000000 + o_orderkey) AS bottom_order,"
        " max(o_totalprice) AS top_price"
        " FROM orders GROUP BY o_orderpriority"
    ),
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min aggregates (max_by/min_by ↔ arg_max/arg_min):
    which order, not just which price. The ordering scalar folds
    floor(price×100) with the key as tiebreak, so the
    winner is unique and engine-independent — max_by on a tied column
    is otherwise nondeterministic in any distributed engine."""
    o = _t(spark, sf_dir, "orders")
    ordkey = (
        F.floor(F.col("o_totalprice") * 100) * F.lit(1_000_000_000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordkey).alias("top_order"),
        F.min_by("o_orderkey", ordkey).alias("bottom_order"),
        F.max("o_totalprice").alias("top_price"),
    )


@query(
    "fn_bitwise",
    oracle=(
        "SELECT event_id,"
        " event_id & 255 AS low_byte,"
        " event_id | 4096 AS with_flag,"
        " xor(event_id, 65535) AS xored,"
        " event_id << 2 AS shl2,"
        " event_id >> 3 AS shr3,"
        " CAST(bit_count(event_id) AS INT) AS popcount"
        " FROM events"
    ),
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise functions (&, |, xor, shifts, popcount) — exact int
    ops, engine-identical. (Spark spells xor ^; DuckDB's ^ is POWER —
    the same dialect gap functions/hashing.py documents.)"""
    e = _t(spark, sf_dir, "events")
    k = F.col("event_id")
    return e.select(
        "event_id",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(65535)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


# --------------------------------------------------- correlation (exact)

@query(
    "agg_corr",
    oracle=(
        "SELECT l_returnflag, n, cov_qty_price,"
        " (sxy - sx * sy / n)"
        "  / (sqrt(greatest(sxx - sx * sx / n, 0.0))"
        "     * sqrt(greatest(syy - sy * sy / n, 0.0)))"
        "  AS corr_qty_price"
        " FROM (SELECT l_returnflag, count(*) AS n,"
        f"  {_dsum(_QTY_D)} AS sx,"
        f"  {_dsum(_PRICE_D)} AS sy,"
        f"  {_dsum(f'{_QTY_D} * {_QTY_D}')} AS sxx,"
        f"  {_dsum(f'{_PRICE_D} * {_PRICE_D}')} AS syy,"
        f"  {_dsum(f'{_QTY_D} * {_PRICE_D}')} AS sxy,"
        f"  ({_dsum(f'{_QTY_D} * {_PRICE_D}')}"
        f"   - {_dsum(_QTY_D)} * {_dsum(_PRICE_D)} / n)"
        "   / (n - 1) AS cov_qty_price"
        " FROM lineitem GROUP BY l_returnflag)"
    ),
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance and Pearson correlation of quantity vs price
    per return flag — from EXACT decimal sums (sx, sy, sxx, syy, sxy)
    combined in one shared double expression tree, never the builtin
    corr()/covar_samp() whose float accumulation order varies with
    partitioning. One aggregate pass, five exact sums riding the same
    shuffle; bit-identical on any engine and any parallelism."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    # string-routed decimal→double: see _dsum above (ulp parity).
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("string").cast("double").alias("sx"),
        F.sum(y).cast("string").cast("double").alias("sy"),
        F.sum(x * x).cast("string").cast("double").alias("sxx"),
        F.sum(y * y).cast("string").cast("double").alias("syy"),
        F.sum(x * y).cast("string").cast("double").alias("sxy"),
    )
    # try_divide on both: n-1 = 0 for single-row groups, and a constant
    # column makes corr's denominator 0 — NULL (as DuckDB), not abort.
    cov = F.try_divide(
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"), F.col("n") - 1
    )
    corr = F.try_divide(
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"),
        F.sqrt(
            F.greatest(
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
                F.lit(0.0),
            )
        )
        * F.sqrt(
            F.greatest(
                F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"),
                F.lit(0.0),
            )
        ),
    )
    return agg.select(
        "l_returnflag",
        "n",
        cov.alias("cov_qty_price"),
        corr.alias("corr_qty_price"),
    )


@query(
    "fn_variant",
    oracle=(
        "SELECT event_id,"
        " CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,"
        " json_extract_string(props, '$.k') IS NOT NULL AS has_k"
        " FROM events"
    ),
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path over the same JSON column fn_json reads
    with string functions: parse_json builds the binary variant once,
    variant_get extracts typed values without re-parsing. At 100 TB
    this is the semi-structured scale story — variant decode is
    vectorized and column-pruned, where repeated get_json_object calls
    re-parse the string per extraction."""
    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return e.select(
        "event_id", k.alias("k_num"), k.isNotNull().alias("has_k")
    )


@query(
    "fn_similarity",
    oracle=(
        "WITH cs AS (SELECT s_suppkey, s_name, n_name,"
        "   list_distinct(string_split(s_name, '')) AS ca,"
        "   list_distinct(string_split(n_name, '')) AS cb"
        "  FROM supplier JOIN nation ON s_nationkey = n_nationkey)"
        " SELECT s_suppkey, levenshtein(s_name, n_name) AS edit_dist,"
        "  CAST(len(list_intersect(ca, cb)) AS DOUBLE)"
        "   / CAST(len(list_distinct(ca || cb)) AS DOUBLE) AS char_jaccard"
        " FROM cs"
    ),
)
def q_fn_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity primitives for fuzzy matching / entity
    resolution: Levenshtein edit distance (built-in both engines,
    classic DP definition) and character-set Jaccard spelled out
    explicitly on BOTH sides (set intersect / set union, ONE integer
    division) rather than trusting engine-specific jaccard() variants.
    All-codegen string kernels — the cheap pre-filter tier of a dedup
    cascade (cf. dedup_ngram_jaccard for the shingled version)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = s.join(n, s["s_nationkey"] == n["n_nationkey"])
    ca = F.array_distinct(F.split("s_name", ""))
    cb = F.array_distinct(F.split("n_name", ""))
    return j.select(
        "s_suppkey",
        F.levenshtein("s_name", "n_name").alias("edit_dist"),
        (
            F.size(F.array_intersect(ca, cb)).cast("double")
            / F.size(F.array_union(ca, cb)).cast("double")
        ).alias("char_jaccard"),
    )
