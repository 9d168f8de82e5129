"""Production-pattern tests: in-flight query metrics (observe) and
streaming checkpoint resume (exactly-once across restarts)."""

from __future__ import annotations

import shutil

from tests.conftest import SF_SMOKE as SF


def test_observe_metrics_ride_the_query(spark):
    """df.observe: data-quality counters collected DURING the query —
    no second scan. At 100 TB a separate validation pass doubles cost;
    observe makes it free."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    obs = Observation("quality")
    docs = load_table(spark, SF, "documents")
    out = (
        docs.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        )
        .groupBy("lang")
        .count()
    )
    out.collect()
    got = obs.get
    assert got["rows_seen"] == docs.count()
    assert got["null_texts"] == 0


def test_streaming_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Kill a checkpointed stream, add data, restart from the same
    checkpoint: the second run picks up ONLY the new file (source
    offsets live in the checkpoint) — exactly-once across restarts."""
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").coalesce(
        1
    ).write.parquet(str(src / "batch1.parquet"))
    # File-stream sources scan a directory of files.
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(src.rglob("*.parquet")):
        if f.is_file() and not f.name.startswith("_"):
            shutil.copy(f, flat / f"f{i}.parquet")

    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema("id long, v string").parquet(str(flat))
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(r["id"] for r in spark.read.parquet(out_dir).collect())

    assert run_once() == [1, 2]

    spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1).write.parquet(
        str(src / "batch2.parquet")
    )
    for f in (src / "batch2.parquet").rglob("*.parquet"):
        if f.is_file() and not f.name.startswith("_"):
            shutil.copy(f, flat / "f_new.parquet")

    # Restart from the same checkpoint: the sink gains ONLY id 3 —
    # batch1's rows are not reprocessed (no duplicates = exactly-once).
    assert run_once() == [1, 2, 3]


def test_runtime_bloom_filter_prunes_probe_side():
    """Runtime bloom-filter join pruning: when a selective filter sits
    on the build side of a shuffle join, the optimizer injects a
    might_contain(bloom) predicate into the probe-side scan — at 100 TB
    this skips most fact rows before the shuffle. The feature keys off
    session confs, so the probe runs in its own subprocess (one
    SparkContext per JVM; reconfiguring the shared test session would
    poison it for the other test files)."""
    import os
    import subprocess
    import sys

    code = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from dist_mapreduce_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("bloom_test", master="local[4]", shuffle_partitions=4, extra_conf={{
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}})
li = spark.read.parquet({SF!r} + "/lineitem.parquet")
o = spark.read.parquet({SF!r} + "/orders.parquet").filter(
    F.col("o_orderpriority") == "1-URGENT")
j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("l_returnflag").count()
assert j.collect(), "join produced no groups"
plan = j._jdf.queryExecution().executedPlan().toString()
assert "might_contain" in plan, "bloom filter not injected"
print("BLOOM_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "BLOOM_OK" in out.stdout, out.stderr[-2000:]


def test_dynamic_partition_pruning_skips_fact_partitions(spark, tmp_path):
    """Dynamic partition pruning: joining a disk-partitioned fact table
    with a filtered dimension on the partition column injects a
    dynamicpruningexpression into the fact scan's PartitionFilters, so
    only the matching directories are read. At 100 TB with a
    date/shipmode-partitioned fact this is the difference between
    scanning 7 partitions and scanning 1. DPP is on by default
    (spark.sql.optimizer.dynamicPartitionPruning.enabled) and reuses the
    broadcast exchange of the dim side — no extra job."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    fact_dir = str(tmp_path / "lineitem_by_returnflag")
    load_table(spark, SF, "lineitem").write.partitionBy("l_returnflag").parquet(
        fact_dir
    )

    dim = spark.createDataFrame(
        [("A", "returned"), ("R", "returned"), ("N", "kept")],
        "flag string, disposition string",
    ).filter(F.col("disposition") == "returned")

    fact = spark.read.parquet(fact_dir)
    j = (
        fact.join(F.broadcast(dim), fact.l_returnflag == dim.flag)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = {r["l_returnflag"]: r["n"] for r in j.collect()}
    assert set(rows) == {"A", "R"}, rows

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]
