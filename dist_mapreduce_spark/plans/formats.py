"""Source/sink format coverage (SURVEY.md §2.1): the reference reads
whole text files and writes "key value" text lines; every other
connector row in §2.1 is marked absent-but-built-into-Spark. These
queries pin that claim with executable round-trips: write a projected
table through a format, read it back, and aggregate — the oracle runs
the same aggregate on the original parquet, so a PASS proves the
format preserved values exactly.

Sinks write under ``.scratch/`` inside the repo (gitignored); each
query overwrites its own directory, so runs are idempotent.

Scale notes baked into the plans:
- CSV/JSON are row formats — fine as interchange sinks, never as the
  100 TB analytic store (no column pruning, no predicate pushdown,
  full-row parse cost). ORC/Parquet keep vectorized scans + pushdown.
- ``sink_parquet_partitioned`` demonstrates the hive-style layout that
  makes partition pruning work: the read-back filter on the partition
  column becomes a PartitionFilter (zero data files of other
  partitions opened) — *the* dominant cost lever for 100 TB tables.
- Doubles survive CSV/JSON via Spark's shortest-round-trip float
  formatting, but money stays decimal(18,2) end-to-end anyway: text
  formats + exact types is the robust contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


def _sink_dir(name: str) -> str:
    return os.path.join(_SCRATCH, name)


_ORDERS_AGG_ORACLE = (
    "SELECT o_orderpriority, count(*) AS n_orders,"
    " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total"
    " FROM orders GROUP BY o_orderpriority"
)


def _orders_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )


def _agg_orders(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").cast("double").alias("total"),
    )


@query("sink_csv_roundtrip", oracle=_ORDERS_AGG_ORACLE)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV files → read back (explicit schema — schema
    inference is a full extra pass, never used at scale) → aggregate.
    Money as decimal(18,2): exact through text serialization."""
    path = _sink_dir("csv_orders")
    _orders_projection(spark, sf_dir).write.mode("overwrite").option(
        "header", True
    ).csv(path)
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, o_totalprice decimal(18,2)"
    ).option("header", True).csv(path)
    return _agg_orders(back)


@query("sink_json_roundtrip", oracle=_ORDERS_AGG_ORACLE)
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → JSON-lines files → read back with explicit schema →
    aggregate. JSON-lines is the reference's own intermediate format
    (worker.go:90-101) — here it is just another interchange sink, and
    the shuffle it served stays inside Spark."""
    path = _sink_dir("json_orders")
    _orders_projection(spark, sf_dir).write.mode("overwrite").json(path)
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, o_totalprice decimal(18,2)"
    ).json(path)
    return _agg_orders(back)


@query("sink_orc_roundtrip", oracle=_ORDERS_AGG_ORACLE)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → read back → aggregate. ORC keeps the columnar
    properties (vectorized scan, pruning, pushdown) — a drop-in
    alternative to parquet for the analytic store."""
    path = _sink_dir("orc_orders")
    _orders_projection(spark, sf_dir).write.mode("overwrite").orc(path)
    return _agg_orders(spark.read.orc(path))


@query(
    "sink_parquet_partitioned",
    oracle=(
        "SELECT o_orderpriority, count(*) AS n_orders,"
        " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total"
        " FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"
    ),
)
def q_sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderstatus (hive layout) →
    read back filtered to one partition → aggregate. The filter on the
    partition column prunes at the directory level (PartitionFilters in
    .explain, zero foreign data files opened) — at 100 TB this is the
    difference between scanning a shard and scanning the table."""
    path = _sink_dir("parquet_orders_by_status")
    (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            "o_orderstatus",
        )
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return _agg_orders(back)
