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
