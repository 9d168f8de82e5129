"""Production connectors (SURVEY.md §2.1's "absent in reference,
built into Spark" rows): Kafka streams and JDBC tables.

Neither can execute in this container (no Kafka broker/package, no
JDBC driver jar), so these builders wire up the exact reader/writer
configuration a cluster deployment uses and fail with a clear error
only at ``.load()`` time if the runtime lacks the connector — the
pattern that keeps one codebase valid locally and on the cluster.

Scale notes baked in:
- Kafka: ``minPartitions`` decouples Spark parallelism from Kafka
  partition count; ``maxOffsetsPerTrigger`` bounds micro-batch size
  (backpressure) — without it one catch-up batch can OOM the job.
- JDBC: parallel reads REQUIRE partitionColumn/lowerBound/upperBound/
  numPartitions — the default single-connection read serializes the
  whole table through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int = 10_000_000,
    min_partitions: int | None = None,
):
    """Streaming Kafka source, value as string. Swap for
    ``read_events_stream`` in any streaming plan — the plan itself is
    source-agnostic (the design point of streaming/windows.py)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .option("failOnDataLoss", "false")
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
):
    """Parallel JDBC table reader: ``num_partitions`` range-sliced
    queries over ``partition_column`` instead of one serial cursor."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """Streaming Kafka sink: exactly-once via the checkpoint dir. The
    frame must have a ``value`` (and optionally ``key``) column."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
