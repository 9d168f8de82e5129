"""Streaming throughput / latency measurement (round-5 verdict #8).

stream_cdc and stream_index_append have correctness + crash-resume
proofs but no sustained-rate numbers. This harness drives BOTH shapes
from a rate-limited source (Structured Streaming's `rate` source) at
two configured rates and reports, per (shape, rate):

- sustained processedRowsPerSecond (median over the steady-state
  micro-batches, first batch dropped as warmup);
- per-batch end-to-end latency (median + max triggerExecution ms);
- rows processed / wall seconds as a cross-check.

Shapes mirror the registered queries' sinks exactly:
- cdc_snapshot: groupBy(key).agg(max(struct(ts, payload))) in complete
  mode, foreachBatch full-snapshot overwrite — stream_cdc's
  merge-order-free keep-latest contract.
- index_append: map-side IVF cell assignment with a frozen literal
  16-cell quantizer over a derived 64-dim vector, appended
  hive-partitioned by (cell, ingest_batch) with dynamic partition
  overwrite — stream_index_append's exactly-once sink.

Usage: python tools/stream_throughput.py [rate1,rate2] [seconds]
Defaults: 20000,100000 rows/s for 20 s each.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dist_mapreduce_spark.session import get_spark

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)


def _steady(progress: list, key: str) -> list[float]:
    vals = []
    for p in progress[1:]:  # drop warmup batch
        if p is None:
            continue
        if key == "rate":
            v = p.get("processedRowsPerSecond") or 0.0
            if p.get("numInputRows", 0) > 0:
                vals.append(float(v))
        else:
            d = p.get("durationMs", {}) or {}
            if p.get("numInputRows", 0) > 0 and "triggerExecution" in d:
                vals.append(float(d["triggerExecution"]))
    return vals


def run_shape(spark, shape: str, rate: int, seconds: int) -> dict:
    out = os.path.join(SCRATCH, f"thr_{shape}_{rate}")
    ckpt = os.path.join(SCRATCH, f"thr_{shape}_{rate}_ckpt")
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
    )
    if shape == "cdc_snapshot":
        agg = (
            src.select(
                (F.col("value") % 100000).alias("user_id"),
                F.col("timestamp").alias("ts"),
                F.col("value").alias("event_id"),
            )
            .groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id")).alias("last"))
        )

        def sink(bdf, bid):
            bdf.write.mode("overwrite").parquet(out)

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
    elif shape == "index_append":
        # 64-dim derived vector (cheap integer closed form — the rate
        # source must not be bottlenecked by the payload generator) +
        # frozen 16-cell quantizer as a literal modulus assignment.
        vec = "transform(sequence(0, 63), j -> CAST((value * 31 + j) % 97 AS DOUBLE) / 97.0)"
        rows = src.select(
            F.col("value").alias("vec_id"),
            F.expr(vec).alias("embedding"),
            (F.col("value") % 16).cast("int").alias("cell"),
        )

        def sink(bdf, bid):
            (
                bdf.withColumn("ingest_batch", F.lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell", "ingest_batch")
                .parquet(out)
            )

        q = (
            rows.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
    else:
        raise ValueError(shape)

    t0 = time.time()
    time.sleep(seconds)
    progress = [p for p in (q.recentProgress or [])]
    q.stop()
    wall = time.time() - t0
    rates = _steady(progress, "rate")
    lats = _steady(progress, "lat")
    n_rows = sum(int(p.get("numInputRows", 0)) for p in progress if p)
    res = {
        "shape": shape,
        "rate_target": rate,
        "batches": len(rates),
        "sustained_rows_s": int(statistics.median(rates)) if rates else 0,
        "batch_ms_p50": int(statistics.median(lats)) if lats else 0,
        "batch_ms_max": int(max(lats)) if lats else 0,
        "rows_per_wall_s": int(n_rows / wall),
    }
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return res


def main() -> int:
    rates = (
        [int(r) for r in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [20000, 100000]
    )
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stream-throughput")
    for shape in ("cdc_snapshot", "index_append"):
        for rate in rates:
            print(run_shape(spark, shape, rate, seconds), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
