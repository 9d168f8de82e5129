"""The reference's entire data-plane query surface, Spark-first.

Reference semantics being reproduced (file:line in /root/reference/):
- tokenize: split on runs of non-alphabetic chars, case-SENSITIVE
  (strings.FieldsFunc with unicode.IsLetter-equivalent a-zA-Z check,
  internal/worker/worker.go:24-38). "Hello" and "hello" are distinct.
- project to (word, 1): worker.go:31-37; legacy context.write(word, one),
  legacy/.../hw01/WordCount.java:44-48.
- group + count: ReduceFunc returns len(values), worker.go:41-44;
  legacy IntSumReducer sums IntWritables, WordCount.java:52-66.
- regex filter ^[m-qM-Q].*$: legacy/.../hw02/WordCountNoCombiner.java:30-35.
- sorted text sink "key value\n": worker.go:128-141.
- combiner / in-mapper-combining variants (hw02): all reduce to the same
  GROUP BY — Spark's partial+final HashAggregateExec *is* the combiner,
  so the DataFrame plan below gets map-side combine automatically.

Scale posture: tokenization is explode(split(...)) — whole-stage
codegen'd, no Python in the loop. The groupBy count is a two-phase
hash aggregate (partial map-side, final after shuffle) — identical in
shape to the reference's combiner design but with spilling, codegen and
AQE-coalesced reducers. At 100 TB the shuffle carries only (word,
partial_count) pairs, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dist_mapreduce_spark.operators.text_analysis import WS_CHARS

#: Reference tokenizer: runs of anything outside [a-zA-Z] separate words
#: (worker.go:27-29). Case is preserved.
TOKEN_SEP = "[^a-zA-Z]+"

#: hw02 filter: keep words starting m-q in either case
#: (WordCountNoCombiner.java:31).
MQ_FILTER = "^[m-qM-Q]"


def tokenize(df: DataFrame, text_col: str = "text", sep: str = TOKEN_SEP) -> DataFrame:
    """text rows → one row per token, empty tokens dropped.

    explode(split()) stays inside whole-stage codegen — this is the
    UDTF-shaped map step of the reference (MapFunc, worker.go:24-38)
    with zero Python in the data path.
    """
    return (
        df.select(F.explode(F.split(F.col(text_col), sep)).alias("word"))
        .filter(F.col("word") != "")
    )


def tokenize_ws(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization — legacy StringTokenizer semantics
    (WordCount.java:44-48): split on whitespace runs, punctuation kept
    attached to words."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), rf"[{WS_CHARS}]+")).alias("word")
        )
        .filter(F.col("word") != "")
    )


def project_kv(tokens: DataFrame) -> DataFrame:
    """token rows → (word, 1) pairs — the universal KeyValue projection
    (worker.go:31-37). Typed long instead of the reference's
    stringly-typed "1"."""
    return tokens.select(F.col("word"), F.lit(1).cast("long").alias("one"))


def word_count(df: DataFrame, text_col: str = "text", sep: str = TOKEN_SEP) -> DataFrame:
    """The flagship pipeline: tokenize → group → count.

    Equivalent MapReduce stages: MapFunc (worker.go:24-38) → hash
    shuffle (worker.go:84-101) → ReduceFunc len(values) (worker.go:41-44).
    Spark runs it as scan → explode → partial hash agg → exchange →
    final hash agg; the partial agg is the combiner the legacy hw01/hw02
    jobs add by hand.
    """
    return tokenize(df, text_col, sep).groupBy("word").agg(
        F.count("*").alias("cnt")
    )


def word_sum(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Legacy IntSumReducer shape (WordCount.java:52-66): project to
    (word, 1) then SUM the ones — provably identical to count(*)."""
    return (
        project_kv(tokenize(df, text_col))
        .groupBy("word")
        .agg(F.sum("one").alias("cnt"))
    )


def filter_mq(tokens: DataFrame) -> DataFrame:
    """hw02 predicate: keep tokens matching ^[m-qM-Q].*$
    (WordCountNoCombiner.java:30-35). rlike is codegen'd and, as a scan
    predicate on a parquet string column, is evaluated post-scan on the
    pruned column only."""
    return tokens.filter(F.col("word").rlike(MQ_FILTER))


def sink_text_lines(counts: DataFrame, key: str = "word", val: str = "cnt") -> DataFrame:
    """Format (key, value) as the reference's text-sink lines
    ("%v %v\\n", worker.go:134-141) with the per-partition key sort
    (sort.Strings, worker.go:128-132) expressed as a rank column so
    correctness is order-insensitive-checkable.

    For an actual file sink use ``write_sorted_text``.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(key))
    return counts.select(
        F.row_number().over(w).alias("rk"),
        F.concat_ws(" ", F.col(key), F.col(val).cast("string")).alias("line"),
    )


def write_sorted_text(counts: DataFrame, path: str, key: str = "word",
                      val: str = "cnt", n_partitions: int | None = None) -> None:
    """Materialize the reference's output files: text lines "key value",
    sorted within each output partition (worker.go:128-141 sorts keys
    within one reduce task's bucket, not globally).

    sortWithinPartitions gives the exact reference semantics (each
    mr-out-J-R file internally sorted); repartition(n, key) mirrors the
    nReduce hash bucketing (worker.go:84-88). At scale this is a single
    shuffle followed by a streaming per-partition sort — no global
    range exchange.
    """
    df = counts
    if n_partitions:
        df = df.repartition(n_partitions, F.col(key))
    (
        df.sortWithinPartitions(key)
        .select(F.concat_ws(" ", F.col(key), F.col(val).cast("string")).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def alpha_partition_expr(word: Column) -> Column:
    """The legacy custom partitioner as a declarative expression:
    m*→0, n*→1, o*→2, p*→3, else→4 (WordPartitioner.getPartition,
    WordCountNoCombiner.java:39-52; 5 reducers per setNumReduceTasks(5),
    :86). q* words pass the m-q filter but land in bucket 4 — that
    asymmetry is part of the reference's observable behavior."""
    first = F.lower(F.substring(word, 1, 1))
    return (
        F.when(first == "m", 0)
        .when(first == "n", 1)
        .when(first == "o", 2)
        .when(first == "p", 3)
        .otherwise(4)
    )


def partitioned_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """hw02 end-to-end: tokenize → filter m-q → count per word → tag with
    the alphabetic partition id. The repartition(5, bucket) reproduces
    the reference's physical placement; the bucket column makes the
    routing auditable by the oracle."""
    counts = filter_mq(tokenize(df, text_col)).groupBy("word").agg(
        F.count("*").alias("cnt")
    )
    counts = counts.withColumn("bucket", alpha_partition_expr(F.col("word")))
    # 5 reducers, custom routing — the knob the REST API exposes as
    # nReduce (server.go:35) and hw02 hardcodes as 5.
    return counts.repartition(5, F.col("bucket"))
