"""Queries covering the reference's own operator inventory
(SURVEY.md §2.1, §2.2, §2.4, §2.6, §2.7, §2.11) over the driver's
``documents`` table (doc_id bigint, text string, lang string,
source string, n_chars bigint).

Every query here is pure DataFrame API → whole-stage codegen; the
word-count family shuffles only (word, partial_count) pairs thanks to
Spark's automatic partial aggregation — the combiner the legacy hw02
variants implement by hand (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.operators.text_analysis import WS_CHARS
from dist_mapreduce_spark.functions.hashing import (
    fnv1a_bucket_duckdb_sql,
    fnv1a_bucket_spark_sql,
)
from dist_mapreduce_spark.operators.wordcount import (
    MQ_FILTER,
    alpha_partition_expr,
    filter_mq,
    project_kv,
    sink_text_lines,
    tokenize,
    tokenize_ws,
    word_count,
    word_sum,
)
from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

# DuckDB-side token stream (shared subquery for oracles): reference
# tokenizer semantics — split on non-alpha runs, keep case, drop empties.
_DUCK_TOKENS = (
    "SELECT word FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word"
    " FROM documents) WHERE word <> ''"
)
_DUCK_TOKENS_WS = (
    f"SELECT word FROM (SELECT unnest(string_split_regex(text, '[{WS_CHARS}]+')) AS word"
    " FROM documents) WHERE word <> ''"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------- scans

@query(
    "scan_text",
    oracle="SELECT doc_id, text FROM documents",
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file text scan (worker.go:77-81): one row per document with
    full contents. Column-pruned parquet scan in Spark (ReadSchema shows
    only doc_id, text)."""
    return _docs(spark, sf_dir).select("doc_id", "text")


@query(
    "scan_lines",
    oracle=(
        "SELECT doc_id, line FROM (SELECT doc_id, unnest(string_split(text,"
        " chr(10))) AS line FROM documents) WHERE line <> ''"
    ),
)
def scan_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-at-a-time records — legacy Hadoop input shape
    (FileInputFormat, legacy/.../hw01/WordCount.java:82-84). Splitting
    stored text on newlines reproduces spark.read.text's line semantics
    over the same corpus."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", "\n")).alias("line"))
        .filter(F.col("line") != "")
    )


# ----------------------------------------------------- tokenize / project

@query(
    "tokenize",
    oracle=f"SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word",
)
def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference tokenizer + count — the flagship word count
    (MapFunc worker.go:24-38 → ReduceFunc worker.go:41-44),
    case-sensitive, split on [^a-zA-Z]+."""
    return word_count(_docs(spark, sf_dir))


@query(
    "tokenize_ws",
    oracle=f"SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS_WS}) GROUP BY word",
)
def q_tokenize_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy StringTokenizer (whitespace) tokenization + count
    (WordCount.java:44-48)."""
    return tokenize_ws(_docs(spark, sf_dir)).groupBy("word").agg(
        F.count("*").alias("cnt")
    )


@query(
    "project_kv",
    oracle=f"SELECT word, CAST(1 AS BIGINT) AS one FROM ({_DUCK_TOKENS})",
)
def q_project_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The universal (word, 1) KeyValue projection (worker.go:31-37)."""
    return project_kv(tokenize(_docs(spark, sf_dir)))


# --------------------------------------------------------------- filters

@query(
    "filter_regex",
    oracle=(
        f"SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS})"
        f" WHERE regexp_matches(word, '{MQ_FILTER}') GROUP BY word"
    ),
)
def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hw02's ^[m-qM-Q].*$ token filter then count
    (WordCountNoCombiner.java:30-35)."""
    return filter_mq(tokenize(_docs(spark, sf_dir))).groupBy("word").agg(
        F.count("*").alias("cnt")
    )


# ---------------------------------------------------------- aggregations

@query(
    "groupby_key",
    oracle=(
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,"
        " min(doc_id) AS first_doc FROM documents GROUP BY lang"
    ),
)
def q_groupby_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-side grouping generalized beyond count (doReduce's
    map[key][]values, worker.go:107-126): multiple aggregates per key in
    one hash-agg pass."""
    return _docs(spark, sf_dir).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "agg_count",
    oracle=f"SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word",
)
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReduceFunc = len(values) (worker.go:41-44) as groupBy().count()."""
    return tokenize(_docs(spark, sf_dir)).groupBy("word").agg(
        F.count("*").alias("cnt")
    )


@query(
    "agg_sum",
    oracle=(
        f"SELECT word, CAST(sum(one) AS BIGINT) AS cnt FROM"
        f" (SELECT word, 1 AS one FROM ({_DUCK_TOKENS})) GROUP BY word"
    ),
)
def q_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy IntSumReducer (WordCount.java:52-66): sum of projected 1s —
    must hash-match agg_count's values (the hw01 pedagogical claim)."""
    return word_sum(_docs(spark, sf_dir))


@query(
    "combiner",
    oracle=f"SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word",
)
def q_combiner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side combine (setCombinerClass, WordCount.java:78). In Spark
    the partial/final HashAggregateExec pair is automatic — this query
    exists to pin that equivalence: same result as the no-combiner plan,
    with the shuffle carrying partial counts. Verify in the physical
    plan: two HashAggregate nodes around the Exchange."""
    return word_count(_docs(spark, sf_dir))


# --------------------------------------------------------- sorts / sinks

@query(
    "sort_keys",
    oracle=(
        f"SELECT row_number() OVER (ORDER BY word) AS rk, word, cnt FROM"
        f" (SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word)"
    ),
)
def q_sort_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pre-sink key sort (sort.Strings, worker.go:128-132)
    surfaced as an auditable rank: global order by word. The driver's
    hash compare is order-insensitive, so sortedness is asserted via the
    rank column, not row order (SURVEY.md §7 risk d).

    Scale note: an unpartitioned row_number() window is a single-
    partition sort — acceptable only because this query's output is a
    post-aggregation vocabulary (small by construction). The scale path
    for sorted *output* is write_sorted_text (repartition +
    sortWithinPartitions, exactly the reference's per-reduce-task sort);
    a global dense rank over big data uses range partitioning +
    per-partition offsets instead."""
    counts = word_count(_docs(spark, sf_dir))
    w = Window.orderBy("word")
    return counts.select(F.row_number().over(w).alias("rk"), "word", "cnt")


@query(
    "sink_text",
    oracle=(
        f"SELECT row_number() OVER (ORDER BY word) AS rk,"
        f" word || ' ' || CAST(cnt AS VARCHAR) AS line FROM"
        f" (SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word)"
    ),
)
def q_sink_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text sink's "key value" line format (worker.go:134-141),
    rank-stamped for order-insensitive checking. The actual file sink is
    operators.wordcount.write_sorted_text (exercised in tests)."""
    return sink_text_lines(word_count(_docs(spark, sf_dir)))


# ----------------------------------------------------------- set ops

@query(
    "union_sources",
    oracle=(
        "SELECT word, count(*) AS cnt FROM ("
        " SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word"
        "  FROM documents WHERE source = 'src0'"
        " UNION ALL"
        " SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS word"
        "  FROM documents WHERE source = 'src1'"
        ") WHERE word <> '' GROUP BY word"
    ),
)
def q_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file input = union-all of text sources (one map task per
    file, coordinator.go:60-68, is the degenerate union). Two filtered
    scans unioned before a single shared aggregation."""
    docs = _docs(spark, sf_dir)
    a = docs.filter(F.col("source") == "src0")
    b = docs.filter(F.col("source") == "src1")
    return word_count(a.unionByName(b))


# ------------------------------------------------------- partitioning

@query(
    "partition_hash",
    oracle=(
        f"SELECT {fnv1a_bucket_duckdb_sql('word', 10)} AS bucket, word, cnt FROM"
        f" (SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word)"
    ),
)
def q_partition_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FNV-1a(word) % nReduce routing (worker.go:84-88, ihash
    worker.go:167-171), nReduce=10 (cmd/coordinator/main.go:29) — exact
    bit parity with the reference's bucketing, computed as a codegen'd
    higher-order-function fold (no Python). The physical placement uses
    Spark's own shuffle; the bucket column is the auditable routing."""
    counts = word_count(_docs(spark, sf_dir))
    return counts.selectExpr(
        f"{fnv1a_bucket_spark_sql('word', 10)} AS bucket", "word", "cnt"
    ).repartition(10, F.col("bucket"))


@query(
    "partition_custom_range",
    oracle=(
        f"SELECT CASE lower(substr(word, 1, 1))"
        f" WHEN 'm' THEN 0 WHEN 'n' THEN 1 WHEN 'o' THEN 2 WHEN 'p' THEN 3"
        f" ELSE 4 END AS bucket, word, cnt FROM"
        f" (SELECT word, count(*) AS cnt FROM ({_DUCK_TOKENS})"
        f"  WHERE regexp_matches(word, '{MQ_FILTER}') GROUP BY word)"
    ),
)
def q_partition_custom_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hw02's alphabetic WordPartitioner (m→0 n→1 o→2 p→3 else→4, 5
    reducers; WordCountNoCombiner.java:39-52, :85-86) over the m-q
    filtered count. q* words land in bucket 4 — preserved asymmetry."""
    counts = filter_mq(tokenize(_docs(spark, sf_dir))).groupBy("word").agg(
        F.count("*").alias("cnt")
    )
    return counts.select(
        alpha_partition_expr(F.col("word")).alias("bucket"), "word", "cnt"
    ).repartition(5, F.col("bucket"))


# ------------------------------------------- in-mapper combining variants

_TALLY_ORACLE = f"SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM ({_DUCK_TOKENS}) GROUP BY word"


def _final_merge(partials: DataFrame) -> DataFrame:
    return partials.groupBy("word").agg(F.sum("cnt").alias("cnt"))


@query("inmapper_combine_per_call", oracle=_TALLY_ORACLE)
def q_inmapper_per_call(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hw02 WordCountPerMapTally (legacy/.../hw02/WordCountPerMapTally.java:28-46):
    a HashMap tally inside each map() call (= per input record), flushed
    per call. Faithfully reproduced as an Arrow-batched mapInPandas that
    tallies *per row* then emits partials; the final merge is the
    reduce-side sum. Result must hash-match the plain GROUP BY — the
    hw02 pedagogical claim, and the reason Spark's automatic partial
    aggregation subsumes all three tally strategies."""
    import pandas as pd

    docs = _docs(spark, sf_dir).select("text")

    def per_call_tally(batches):
        import re

        pat = re.compile("[^a-zA-Z]+")
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                tally: dict[str, int] = {}
                for w in pat.split(text or ""):
                    if w:
                        tally[w] = tally.get(w, 0) + 1
                out.extend(tally.items())
            if out:
                yield pd.DataFrame(out, columns=["word", "cnt"])

    partials = docs.mapInPandas(per_call_tally, schema="word string, cnt long")
    return _final_merge(partials)


@query("inmapper_combine_per_task", oracle=_TALLY_ORACLE)
def q_inmapper_per_task(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hw02 WordCountPerTaskTally (legacy/.../hw02/WordCountPerTaskTally.java:27-58):
    one HashMap across the whole task lifetime (setup/cleanup), flushed
    once per task. Reproduced as mapInPandas accumulating across the
    entire partition iterator, yielding once at end — the per-partition
    dict tally. Same oracle as per-call: identical results, fewer
    shuffle rows (this is the point of in-mapper combining; Spark's
    partial hash agg achieves it with spilling, which the legacy version
    lacks — SURVEY.md §4.2)."""
    import pandas as pd

    docs = _docs(spark, sf_dir).select("text")

    def per_task_tally(batches):
        import re

        pat = re.compile("[^a-zA-Z]+")
        tally: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                for w in pat.split(text or ""):
                    if w:
                        tally[w] = tally.get(w, 0) + 1
        if tally:
            yield pd.DataFrame(list(tally.items()), columns=["word", "cnt"])

    partials = docs.mapInPandas(per_task_tally, schema="word string, cnt long")
    return _final_merge(partials)


# --------------------------------------------- generic map_reduce wrapper

@query("udf_map_reduce", oracle=_TALLY_ORACLE)
def q_udf_map_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count re-expressed through the generic map_reduce
    compatibility wrapper (operators.mapreduce) — the reference's
    pluggable mapF/reduceF surface (worker.go:75, :105). Must
    hash-match the DataFrame-native plans."""
    from dist_mapreduce_spark.operators.mapreduce import map_reduce

    import re

    def map_fn(doc_id, text):
        # MapFunc shape (worker.go:24-38): one record in, N KV pairs out.
        for w in re.split("[^a-zA-Z]+", text or ""):
            if w:
                yield (w, 1)

    def reduce_fn(key, values):
        # ReduceFunc shape (worker.go:41-44): key + all values → one value.
        return sum(values)

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string"), F.col("text")
    )
    return map_reduce(docs, map_fn, reduce_fn).select(
        F.col("key").alias("word"), F.col("value").cast("long").alias("cnt")
    )
