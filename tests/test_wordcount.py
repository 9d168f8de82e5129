"""Goldens ported from the reference's unit tests
(/root/reference/internal/worker/worker_test.go) plus the README demo
corpus golden (FIXTURES.md §1.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_mapreduce_spark.operators.wordcount import (
    alpha_partition_expr,
    filter_mq,
    partitioned_counts,
    project_kv,
    tokenize,
    word_count,
    word_sum,
)


def _counts(df):
    return {r["word"]: r["cnt"] for r in df.collect()}


def test_mapfunc_golden(spark):
    # worker_test.go:7-27 — "hello world hello" → exactly 3 KV pairs.
    df = spark.createDataFrame([("hello world hello",)], "text string")
    kvs = project_kv(tokenize(df)).collect()
    assert sorted((r["word"], r["one"]) for r in kvs) == [
        ("hello", 1),
        ("hello", 1),
        ("world", 1),
    ]


def test_mapfunc_special_characters(spark):
    # worker_test.go:29-43 — punctuation stripped, 3 tokens.
    df = spark.createDataFrame([("hello, world! hello.",)], "text string")
    toks = [r["word"] for r in tokenize(df).collect()]
    assert sorted(toks) == ["hello", "hello", "world"]


def test_reducefunc_golden(spark):
    # worker_test.go:45-55 — three 1s reduce to 3.
    df = spark.createDataFrame([("hello world hello hello",)], "text string")
    assert _counts(word_count(df))["hello"] == 3


def test_case_sensitivity(spark, demo_docs):
    # MapFunc preserves case (worker.go:27-29): Hello ≠ hello.
    counts = _counts(word_count(demo_docs))
    assert counts == {
        "Hello": 1, "New": 1, "World": 1, "hello": 1, "job": 1,
        "map": 1, "reduce": 1, "test": 1, "world": 1,
    }


def test_word_sum_equals_word_count(spark, demo_docs):
    assert _counts(word_sum(demo_docs)) == _counts(word_count(demo_docs))


def test_mq_filter(spark):
    # WordCountNoCombiner.java:30-35 — ^[m-qM-Q].*$ keeps m..q either case.
    df = spark.createDataFrame(
        [("map Nation orange Pear quiz zebra apple Mango",)], "text string"
    )
    kept = sorted(r["word"] for r in filter_mq(tokenize(df)).collect())
    assert kept == ["Mango", "Nation", "Pear", "map", "orange", "quiz"]


def test_alpha_partitioner_truth_table(spark):
    # WordPartitioner truth table (WordCountNoCombiner.java:42-50):
    # m→0 n→1 o→2 p→3 else→4; q* passes the filter but routes to 4.
    df = spark.createDataFrame(
        [("map",), ("Nation",), ("orange",), ("Pear",), ("quiz",), ("zebra",)],
        "word string",
    )
    got = {
        r["word"]: r["b"]
        for r in df.select("word", alpha_partition_expr(F.col("word")).alias("b")).collect()
    }
    assert got == {"map": 0, "Nation": 1, "orange": 2, "Pear": 3, "quiz": 4, "zebra": 4}


def test_partitioned_counts_has_five_buckets_max(spark):
    df = spark.createDataFrame(
        [("map nation orange pear quiz map",)], "text string"
    )
    rows = partitioned_counts(df).collect()
    assert {r["bucket"] for r in rows} <= {0, 1, 2, 3, 4}
    assert {r["word"]: r["cnt"] for r in rows}["map"] == 2


def test_fnv1a_matches_reference_ihash(spark):
    """FNV-1a-32 & 0x7fffffff parity with ihash (worker.go:167-171),
    checked against a pure-Python reimplementation of the Go code."""
    from dist_mapreduce_spark.functions.hashing import fnv1a_spark_sql

    def ihash_py(s: str) -> int:
        h = 2166136261
        for ch in s.encode():
            h ^= ch
            h = (h * 16777619) % (1 << 32)
        return h & 0x7FFFFFFF

    words = ["hello", "world", "map", "a", "Q", "zebra"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["h"]
        for r in df.selectExpr("word", f"{fnv1a_spark_sql('word')} AS h").collect()
    }
    assert got == {w: ihash_py(w) for w in words}


def test_write_sorted_text_sink(spark, demo_docs, tmp_path):
    # worker.go:128-141 — text lines "key value", sorted within partition.
    from dist_mapreduce_spark.operators.wordcount import write_sorted_text

    out = str(tmp_path / "out")
    write_sorted_text(word_count(demo_docs), out, n_partitions=2)
    lines = [r["value"] for r in spark.read.text(out).collect()]
    assert sorted(lines) == sorted(
        f"{w} 1" for w in
        ["Hello", "New", "World", "hello", "job", "map", "reduce", "test", "world"]
    )


def test_read_text_files_whole_file_identity(spark, tmp_path):
    # One logical shard per file (coordinator.go:60-68) with multi-line files.
    from dist_mapreduce_spark.sources.tables import read_text_files

    (tmp_path / "a.txt").write_text("Hello world\nhello")
    (tmp_path / "b.txt").write_text("World map reduce")
    df = read_text_files(spark, str(tmp_path))
    assert df.count() == 2
    counts = _counts(word_count(df))
    assert counts["hello"] == 1 and counts["Hello"] == 1 and counts["World"] == 1


def test_core_operators_handle_empty_input(spark, tmp_path):
    """Zero-row inputs must produce zero-row outputs (not errors) for
    the core families — the degenerate partitions every 100 TB run
    contains somewhere."""
    import __spark_entry__ as e
    from dist_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    empty_dir = str(tmp_path / "empty_sf")
    for t in ("documents", "orders", "customer", "events", "embeddings"):
        load_table(spark, sf, t).limit(0).write.parquet(f"{empty_dir}/{t}.parquet")

    qs = e.queries()
    for name in (
        "tokenize",
        "agg_count",
        "window_topk",
        "join_inner",
        "dedup_exact",
        "dedup_minhash",
        "sim_topk_bruteforce",
        "sessionize_gaps",
        "text_tfidf",
        "pipeline_corpus",
        "sample_temperature",
        "dedup_cluster",
    ):
        assert qs[name](spark, empty_dir).count() == 0, name
