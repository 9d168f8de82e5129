"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once with a cheap action that still runs the full
plan (count of the result). Timing includes plan + execution, not
session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — word-count core, partitioning,
# relational (joins/windows/rollup), events windows, LLM-pipeline ops,
# plus the four canonical TPC-H shapes (scan-agg, selective-join top-k,
# pure-scan predicate, semi-join + having).
HEADLINE = [
    "tokenize",
    "filter_regex",
    "partition_hash",
    "join_inner",
    "join_broadcast",
    "window_topk",
    "rollup_agg",
    "agg_window_tumbling",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk_bruteforce",
    "text_stats",
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q18",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from dist_mapreduce_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm the session outside timing: JVM JIT, whole-stage-codegen
    # compiler, shuffle machinery, parquet reader — exercised on the
    # sf0.001 tables, NOT the benchmarked sf_dir, so no benchmarked
    # plan or data is pre-cached. This is the steady-state posture of a
    # long-running cluster; cold-JVM costs are a session property, not
    # a query property.
    from pyspark.sql import functions as F  # noqa: PLC0415

    warm_dir = "/root/testdata/sf0.001"
    warm = spark.read.parquet(f"{warm_dir}/documents.parquet")
    (
        warm.select(F.explode(F.split("text", "[^a-zA-Z]+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .join(warm.limit(10), F.col("w") == F.col("text"), "left")
        .count()
    )
    # Second warmup pass for the hash/regex/higher-order expression
    # compilers (md5, regexp_replace, aggregate-fold) used by the
    # dedup and partitioning queries.
    (
        warm.select(
            F.md5(F.regexp_replace("text", "\\s+", " ")).alias("fp"),
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") % 8 + 1),
                    lambda i: i,
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("fold"),
        ).count()
    )

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
