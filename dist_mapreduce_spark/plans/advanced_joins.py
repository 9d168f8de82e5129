"""As-of and range joins (SURVEY.md §2.3's "expressible with non-equi
conditions / window tricks" rows) plus the split UDF-surface queries
(§2.10: udf_map and udf_reduce exercised independently).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.operators.text_analysis import WS_CHARS as ta_WS
from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table


@query(
    "join_asof",
    oracle=(
        "WITH u AS ("
        " SELECT o_custkey AS ukey, o_orderdate AS uts, 1 AS is_ref,"
        "  o_orderkey, CAST(NULL AS BIGINT) AS event_id FROM orders"
        " UNION ALL"
        " SELECT user_id, ts, 0, NULL, event_id FROM events"
        "), m AS ("
        " SELECT *, last_value(o_orderkey IGNORE NULLS) OVER ("
        "  PARTITION BY ukey ORDER BY uts, is_ref DESC, o_orderkey"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_o_orderkey"
        " FROM u"
        ") SELECT event_id, ukey AS user_id, asof_o_orderkey"
        " FROM m WHERE is_ref = 0"
    ),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the most recent order (by
    o_orderdate <= event ts) of the customer with the same key.
    Union-and-carry-forward: one shuffle on the key, one window pass —
    the scale-correct distributed as-of (operators/asof_join.py)."""
    from dist_mapreduce_spark.operators.asof_join import asof_join

    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events").withColumnRenamed("user_id", "ukey")
    out = asof_join(
        left=events,
        right=orders.withColumnRenamed("o_custkey", "ukey"),
        key="ukey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey"],
        left_cols=["event_id"],
    )
    return out.select(
        "event_id", F.col("ukey").alias("user_id"),
        F.col("asof_o_orderkey").alias("asof_o_orderkey"),
    )


@query(
    "join_range",
    oracle=(
        "SELECT s.s_suppkey, count(*) AS n_close_customers"
        " FROM supplier s JOIN customer c"
        "  ON c.c_acctbal BETWEEN s.s_acctbal - 100.0 AND s.s_acctbal + 100.0"
        " GROUP BY s.s_suppkey"
    ),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: customers whose balance is within ±100 of
    each supplier's. Executed as a broadcast nested-loop on the small
    side; the 100 TB formulation bucketizes the range key (floor(bal /
    width)) and equi-joins on adjacent buckets — shown in
    tests/test_advanced_joins.py to produce identical results."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(
            F.broadcast(s),
            (F.col("c_acctbal") >= F.col("s_acctbal") - 100.0)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + 100.0),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close_customers"))
    )


_WC_ORACLE = (
    "SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM"
    " (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word"
    "  FROM documents) WHERE word <> '' GROUP BY word"
)


@query("udf_map", oracle=_WC_ORACLE)
def q_udf_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map half of the UDF surface in isolation (mapF, worker.go:75):
    tokenization runs as user Python through mapInPandas (the UDTF
    shape: one row in, N out), then the COUNT is built-in — proving
    UDF output feeds native aggregation seamlessly."""
    import re

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("text")

    def tokenize_udtf(batches):
        pat = re.compile("[^a-zA-Z]+")
        for pdf in batches:
            words = [w for t in pdf["text"] for w in pat.split(t or "") if w]
            if words:
                yield pd.DataFrame({"word": words})

    tokens = docs.mapInPandas(tokenize_udtf, schema="word string")
    return tokens.groupBy("word").agg(F.count("*").alias("cnt"))


@query("udf_reduce", oracle=_WC_ORACLE)
def q_udf_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reduce half in isolation (reduceF, worker.go:105):
    tokenization is built-in (explode/split), the per-key reduction is
    user Python through applyInPandas (grouped-map: key + all its rows
    → one row), exactly doReduce's contract with a spillable grouped
    exchange instead of an in-memory map[key][]string."""
    import pandas as pd

    from dist_mapreduce_spark.operators.wordcount import project_kv, tokenize

    kv = project_kv(tokenize(load_table(spark, sf_dir, "documents")))

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [(pdf["word"].iloc[0], int(pdf["one"].sum()))], columns=["word", "cnt"]
        )

    return kv.groupBy("word").applyInPandas(reduce_fn, schema="word string, cnt long")


@query(
    "join_skew_salted",
    oracle=(
        "SELECT c.c_mktsegment, count(*) AS n_events,"
        " CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value"
        " FROM events e JOIN customer c ON e.user_id = c.c_custkey"
        " GROUP BY c.c_mktsegment"
    ),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dim via an explicitly salted join (operators.skew): the
    large side's rows spread over 16 sub-keys, the dim replicated per
    salt — a hot key's probe work lands on 16 tasks instead of one.
    The oracle is the PLAIN join: salting must be execution-only,
    invisible in the result. (AQE skew splitting is the automatic
    version; this is the operator for keys hot enough that you plan
    for them.)"""
    from dist_mapreduce_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        e, c, F.col("user_id") == F.col("c_custkey"), n_salts=16
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )


_WC_ORACLE_NGRAM = (
    "SELECT bigram, count(*) AS cnt FROM ("
    " SELECT t[i] || ' ' || t[i+1] AS bigram"
    " FROM (SELECT list_filter(string_split_regex(text, '[^a-zA-Z]+'),"
    "              x -> x <> '') AS t FROM documents),"
    "      LATERAL (SELECT unnest(range(1, len(t))) AS i) ix"
    ") GROUP BY bigram"
)


@query("udtf_ngrams", oracle=_WC_ORACLE_NGRAM)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 @udtf, arrow-optimized): one input
    row → N output rows, the exact contract of the reference's map
    function (mapF: one file → many KVs, worker.go:75-81) as a
    first-class table function invoked per-row via lateral join —
    emits word bigrams per document, aggregated downstream by a
    regular JVM-side groupBy.

    This completes the §2.10 triple: scalar UDF (elsewhere), grouped
    UDAF (udf_reduce), and table UDTF (here). Python runs ONLY the
    row-expansion; counting stays in codegen."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string")
    class Bigrams:
        def eval(self, text: str):
            toks = [w for w in _re.split("[^a-zA-Z]+", text or "") if w]
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("bigrams_udtf", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT bigram, count(*) AS cnt"
        " FROM documents, LATERAL bigrams_udtf(text)"
        " GROUP BY bigram"
    )


@query(
    "udf_scalar",
    oracle=(
        "SELECT doc_id,"
        " length(text) - length(replace(text, ' ', '')) + 1 AS approx_words,"
        " upper(substr(text, 1, 8)) AS head_up"
        " FROM documents"
    ),
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (§2.10's third shape: the Writable-style
    per-record function, WordCount.java:36-50): Arrow-batched,
    vectorized pandas string ops — one Python stage, everything else
    codegen. The oracle recomputes the same scalars in SQL, pinning
    the UDF's semantics, not just its plumbing."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def approx_words(s: pd.Series) -> pd.Series:
        return s.str.count(" ").astype("int64") + 1

    @pandas_udf("string")
    def head_up(s: pd.Series) -> pd.Series:
        return s.str.slice(0, 8).str.upper()

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        approx_words("text").alias("approx_words"),
        head_up("text").alias("head_up"),
    )


@query(
    "udf_arrow",
    oracle=(
        "SELECT doc_id, length(text) AS n_chars_py,"
        f" len(list_filter(string_split_regex(text, '[{ta_WS}]+'), w -> w <> ''))"
        "  AS n_tokens_py"
        " FROM documents"
    ),
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy tier of the Python data plane: batches
    arrive as pyarrow RecordBatch, computed on with Arrow kernels
    (utf8_length, split+list_value_length), never converted to pandas
    objects. For numeric/string kernels this skips the Arrow→pandas
    materialization mapInPandas pays; same physical exchange shape
    (ArrowEvalPython) otherwise. Token semantics match the whitespace
    tokenizer exactly (split on the shared whitespace class, drop
    empties)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def arrow_stats(batches):
        for batch in batches:
            text = batch.column("text")
            toks = pc.split_pattern_regex(text, rf"[{ta_WS}]+")
            # Per-row token counts excluding the empty strings that
            # leading/trailing whitespace runs produce: total list
            # lengths minus per-row empty counts (via parent indices
            # of the flattened list).
            flat = pc.list_flatten(toks)
            keep = pc.not_equal(flat, "")
            parents = pc.list_parent_indices(toks)
            empty_parents = pc.filter(parents, pc.invert(keep))
            import numpy as np

            n_rows = batch.num_rows
            empties = np.zeros(n_rows, dtype=np.int64)
            if len(empty_parents) > 0:
                idx, cnt = np.unique(empty_parents.to_numpy(), return_counts=True)
                empties[idx] = cnt
            n_tokens = pc.subtract(
                pc.list_value_length(toks).cast(pa.int64()),
                pa.array(empties),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.utf8_length(text).cast(pa.int64()),
                    n_tokens,
                ],
                names=["doc_id", "n_chars_py", "n_tokens_py"],
            )

    return docs.mapInArrow(
        arrow_stats, schema="doc_id long, n_chars_py long, n_tokens_py long"
    )


# ------------------------------------------- Bloom-prefiltered join

#: Bloom prefilter geometry: bucket-domain size per hash function and
#: the two independent xxhash64 seeds (k = 2 "hash functions").
BLOOM_M = 1 << 16
BLOOM_SEEDS = (42, 1337)


@query(
    "join_bloom",
    oracle=(
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers"
        " FROM customer WHERE c_custkey IN"
        "  (SELECT o_custkey FROM orders"
        "   WHERE o_orderpriority = '1-URGENT')"
        " GROUP BY c_mktsegment"
    ),
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-prefiltered semi-join: customers with at least one
    URGENT order, counted per market segment. The scale problem this
    solves: when the build side's key set is too large to broadcast as
    raw keys but the probe side is vastly larger, shuffling the whole
    probe table into the join is the dominant cost. A Bloom filter of
    the build keys — here k=2 independent xxhash64 bucket sets over a
    2^16 domain, the set-of-buckets representation of the bitmap —
    broadcasts in kilobytes and eliminates most probe rows MAP-SIDE,
    before any exchange. False positives are fine (the exact semi-join
    after the prefilter restores precise semantics, so the result is
    hash-identical to the plain semi-join oracle); false negatives are
    impossible (every true key's buckets are in the sets). This is the
    manual form of Spark's runtime row-level bloom pushdown
    (spark.sql.optimizer.runtime.bloomFilter.*), spelled out so the
    mechanics are visible and testable.

    Plan shape: the build side is distinct-ed ONCE (one pushed-filter
    scan of orders + one exchange) and pinned in memory — by contract
    it is the SMALL side, that is the premise of a bloom filter — so
    the two bucket-set distincts and the exact key join all read the
    cached key set instead of re-scanning orders (Catalyst merges each
    bucket projection into its distinct, repartitioning by bucket, so
    plain ReusedExchange cannot dedupe the three branches; the cache
    can, and the audit row pins scans of orders at 1).
    Probe filters through both broadcast hash semi-joins (AND of k
    membership tests), then the surviving minority flows into the
    exact broadcast semi-join on the true key set. Zero probe-side
    shuffles before the filter; at 100 TB swap the final exact join's
    broadcast for a shuffle join — the bloom stage's selectivity is
    what keeps that shuffle small."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"))
        .filter(F.col("key").isNotNull())
        .distinct()
        .cache()
    )
    probe = cust
    for seed in BLOOM_SEEDS:
        buckets = keys.select(
            F.pmod(F.xxhash64("key", F.lit(seed)), F.lit(BLOOM_M)).alias(
                "bucket"
            )
        ).distinct()
        probe = probe.join(
            F.broadcast(buckets),
            F.pmod(F.xxhash64("c_custkey", F.lit(seed)), F.lit(BLOOM_M))
            == F.col("bucket"),
            "left_semi",
        )
    exact = probe.join(
        F.broadcast(keys),
        F.col("c_custkey") == F.col("key"),
        "left_semi",
    )
    return exact.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ------------------------------------------------------ entity linkage

#: Max unit-cost edit distance for two records to link. Both engines
#: ship classic unit-cost Levenshtein (integer — no float drift).
LINK_MAX_DIST = 2

#: Skew guard for the blocking join (round 6, after the 100× stress):
#: a block of B records contributes B(B-1)/2 Levenshtein pairs, so a
#: degenerate block (coarse key on a skewed corpus) goes quadratic —
#: the same failure mode BAND_BUCKET_CAP guards in dedup_minhash.
#: Keep the CAP lowest keys per (nation, segment) block; records past
#: the cap emit no pairs and resolve as their own canonical. Driver
#: blocks are ~120 records at sf0.1, far under the cap, so gate
#: results are unchanged; mirrored in the oracle.
LINK_BLOCK_CAP = 1024

@query(
    "link_records",
    oracle=(
        f"WITH cnum AS MATERIALIZED (SELECT c_custkey, c_name,"
        f"  c_nationkey, c_mktsegment, row_number() OVER"
        f"  (PARTITION BY c_nationkey, c_mktsegment ORDER BY c_custkey)"
        f"  AS rn FROM customer),"
        f" cpd AS (SELECT * FROM cnum WHERE rn <= {LINK_BLOCK_CAP}),"
        f" pr AS (SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,"
        f"  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist"
        f"  FROM cpd a JOIN cpd b"
        f"   ON a.c_nationkey = b.c_nationkey"
        f"   AND a.c_mktsegment = b.c_mktsegment"
        f"   AND a.c_custkey < b.c_custkey"
        f"  WHERE levenshtein(a.c_name, b.c_name) <= {LINK_MAX_DIST})"
        f" SELECT v.c_custkey AS key,"
        f"  coalesce(min(pr.key_a), v.c_custkey) AS canonical_key,"
        f"  coalesce(min(pr.key_a), v.c_custkey) <> v.c_custkey AS is_linked,"
        f"  CAST(count(pr.key_a) AS BIGINT) AS n_matches,"
        f"  (min(v.rn) <= {LINK_BLOCK_CAP}) AS in_block_cap"
        f" FROM cnum v LEFT JOIN pr ON pr.key_b = v.c_custkey"
        f" GROUP BY v.c_custkey"
    ),
)
def q_link_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage — the data-cleaning twin of
    dedup: candidate pairs come from an equi-join on a BLOCKING key
    (nation × market segment — the deterministic attributes a real
    pipeline blocks on), verified by unit-cost Levenshtein ≤ 2 on the
    name, and every record linked to a more-canonical (lower-key)
    match adopts it as its cluster representative. Output is one row
    per record: (key, canonical_key, is_linked, n_matches,
    in_block_cap) — the merge decision a master-data pipeline
    consumes, plus the coverage audit: in_block_cap=false marks a
    record its block's LINK_BLOCK_CAP excluded from pair generation
    (it self-canonicalizes UNVERIFIED — round-6 advice: the cap must
    not be silent; `filter(NOT in_block_cap)` is the escalation
    work-list for a second pass with a finer blocking key).

    Cross-engine exactness: Levenshtein is integer dynamic programming
    (identical in Spark and DuckDB); blocking, tie-breaks and counts
    are pure integer relational logic — no similarity floats anywhere.

    Scale shape: the name comparison runs only within blocks (an
    equi-join, never a cross product), exactly the dedup_minhash /
    dedup_semantic banding skeleton with attributes as the band.
    Blocks are capped at LINK_BLOCK_CAP (keep-lowest row_number,
    mirrored in the oracle) after the 100× stress showed replicated
    corpora driving blocks quadratic — the BAND_BUCKET_CAP treatment;
    the row_number shuffles on the same block key the self-join hashes
    on, so the cap reuses that exchange. The O(|name|²) DP per pair is
    why real pipelines put the CHEAP blocking first — the plan encodes
    that order."""
    c = load_table(spark, sf_dir, "customer")
    wblk = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "c_custkey"
    )
    cnum = c.withColumn("rn", F.row_number().over(wblk))
    capped = cnum.filter(F.col("rn") <= LINK_BLOCK_CAP).drop("rn")
    a = capped.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
        "c_mktsegment",
    )
    b = capped.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("c_nationkey") == F.col("nk_b"))
            & (F.col("c_mktsegment") == F.col("seg_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"),
        )
        .filter(F.col("edit_dist") <= LINK_MAX_DIST)
        .select("key_a", "key_b")
    )
    return (
        cnum.select(F.col("c_custkey").alias("key"), "rn")
        .join(pairs, F.col("key") == F.col("key_b"), "left")
        .groupBy("key")
        .agg(
            F.coalesce(F.min("key_a"), F.first("key")).alias("canonical_key"),
            F.count("key_a").cast("long").alias("n_matches"),
            (F.min("rn") <= LINK_BLOCK_CAP).alias("in_block_cap"),
        )
        .select(
            "key",
            "canonical_key",
            (F.col("canonical_key") != F.col("key")).alias("is_linked"),
            "n_matches",
            "in_block_cap",
        )
    )


# ------------------------------------------- interval-overlap self-join

#: Order validity window for the overlap join, in days.
OVERLAP_DAYS = 30


@query(
    "join_interval_overlap",
    oracle=f"""
        WITH o AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 o_orderdate + INTERVAL {OVERLAP_DAYS} DAY AS o_end
          FROM orders
        ),
        b AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 unnest(list_distinct([date_trunc('month', o_orderdate),
                                       date_trunc('month', o_end)])) AS bin
          FROM o
        ),
        pairs AS (
          SELECT DISTINCT x.o_custkey, x.o_orderkey AS k1,
                 y.o_orderkey AS k2, x.o_orderdate AS d1, y.o_orderdate AS d2
          FROM b x JOIN b y
            ON x.o_custkey = y.o_custkey AND x.bin = y.bin
           AND x.o_orderkey < y.o_orderkey
        ),
        hits AS (
          SELECT o_custkey, k1, k2,
                 {OVERLAP_DAYS} - abs(date_diff('day', d1, d2)) AS overlap_days
          FROM pairs
          WHERE abs(date_diff('day', d1, d2)) <= {OVERLAP_DAYS}
        )
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(overlap_days) AS BIGINT) AS overlap_days_sum,
               CAST(max(overlap_days) AS BIGINT) AS max_overlap_days
        FROM hits GROUP BY o_custkey
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP self-join (the Flink/Timescale interval-join
    class, distinct from join_range's value bands and join_asof's
    nearest-match): per customer, pairs of orders whose
    {OVERLAP_DAYS}-day validity windows overlap — the order-congestion
    audit. Executed the only way it scales: each interval explodes to
    the MONTH BINS it covers (≤2 for a 30-day window), pairs form via
    an equi-join on (customer, bin), duplicates from pairs meeting in
    two shared bins collapse with one distinct, and the exact overlap
    predicate verifies. Blocking is COMPLETE by construction —
    overlapping intervals share at least one day, hence that day's
    month — so unlike the ANN blocks this one has recall 1.0 always,
    not just measured.

    Scale shape: the naive form is a per-customer theta-join
    (quadratic in per-customer order count, unplannable as an
    equi-join); the binned form is a plain hash join on (custkey, bin)
    whose pair volume is Σ per-(cust, month) counts² — bounded by time
    locality, the same Σ|cell|² economics every blocked join in this
    repo runs on. Overlap lengths are exact integer days."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr(f"o_orderdate + INTERVAL {OVERLAP_DAYS} DAYS").alias("o_end"),
    )
    b = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.explode(
            F.array_distinct(
                F.array(
                    F.date_trunc("month", F.col("o_orderdate")),
                    F.date_trunc("month", F.col("o_end")),
                )
            )
        ).alias("bin"),
    )
    x = b.select(
        "o_custkey",
        "bin",
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    y = b.select(
        "o_custkey",
        "bin",
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    pairs = (
        x.join(y, ["o_custkey", "bin"])
        .filter(F.col("k1") < F.col("k2"))
        .select("o_custkey", "k1", "k2", "d1", "d2")
        .distinct()
    )
    delta = F.abs(F.datediff(F.col("d2"), F.col("d1")))
    hits = pairs.filter(delta <= OVERLAP_DAYS).select(
        "o_custkey", (F.lit(OVERLAP_DAYS) - delta).cast("long").alias("overlap_days")
    )
    return hits.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("overlap_days").cast("long").alias("overlap_days_sum"),
        F.max("overlap_days").cast("long").alias("max_overlap_days"),
    )
