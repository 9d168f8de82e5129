"""Bucketed (pre-partitioned) storage for co-located joins — the
reference's signature capability generalized (SURVEY.md §2.11: its
FNV-hash bucketing of map output, worker.go:84-88, exists precisely so
the reduce stage reads co-partitioned inputs without re-shuffling).

Spark's durable form of that idea is bucketed tables: both sides are
written hash-bucketed on the join key, so the join's Exchange
disappears — at 100 TB a repeated fact⋈fact join on a bucketed key
saves the entire shuffle of both tables on every query that reuses the
layout. This is the storage-level complement to the in-flight
repartition() queries in reference_core.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

from dist_mapreduce_spark.scratch import scratch_root

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = N_BUCKETS
) -> None:
    """Persist df hash-bucketed (and per-file sorted) on bucket_col.
    Bucketed layout lives in the session catalog + parquet files under
    .scratch; overwrite keeps runs idempotent."""
    (
        df.write.mode("overwrite")
        .option("path", os.path.join(scratch_root(), f"bucketed_{table}"))
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


@query(
    "join_bucketed",
    oracle=(
        "SELECT c.c_mktsegment, count(*) AS n_orders,"
        " CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " GROUP BY c.c_mktsegment"
    ),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer with BOTH sides stored bucketed on the join
    key: the sort-merge join (forced via merge hint — at test scale the
    small side would otherwise broadcast) runs with ZERO Exchange —
    each task merges bucket i of orders with bucket i of customer
    directly off storage. Asserted in tests: no Exchange in the final
    plan. The write cost is paid once; every subsequent join on the
    key is shuffle-free."""
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        ),
        "bkt_orders",
        "o_custkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        "bkt_customer",
        "c_custkey",
    )
    o = spark.table("bkt_orders")
    c = spark.table("bkt_customer")
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("total"),
        )
    )
