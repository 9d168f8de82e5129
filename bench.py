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
# relational (joins/windows/rollup), events windows, LLM-pipeline ops.
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from dist_mapreduce_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm the session (JVM + parquet footer caches) outside timing.
    spark.range(1).count()

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
