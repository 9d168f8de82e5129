"""Hot-shingle skew stress for the span-rewrite family (round-10
verdict item #1's DONE criterion): the uniform replication stress makes
every shingle occur exactly rep times — it can never produce ONE
corpus-wide hot key, which is precisely the shape that broke the old
row_number-window first-wins (all occurrences of one hash sorted in a
single task). This probe builds two corpora of IDENTICAL size:

  control: the documents table replicated REP× (every shingle occurs
           REP times — the standard stress shape);
  hot:     the same corpus with ONE fixed 8-token boilerplate span
           appended to EVERY document — that span's shingle occurs
           n_docs·REP times (10^5 at the default 20× of sf0.1), the
           license-header/navigation-chrome shape of a real crawl.

dedup_substring_rewrite is timed on both with a full-evaluation
aggregate (a bare count lets Catalyst prune the reconstructed text out
of the plan). FLAT time (hot ≈ control) is the evidence that
first-wins is a map-side-combinable aggregate: the hot key partial-
aggregates in every task instead of sorting 10^5 rows in one.

Usage: python tools/stress_hot_shingle.py [rep] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SPAN = " ".join(f"hotspanword{i}" for i in range(8))


def _full_eval(df) -> tuple[int, float]:
    from pyspark.sql import functions as F

    # md5-of-row forces every output column to materialize (count(col)
    # folds to count(1) on non-nullable columns and Catalyst prunes
    # the reconstructed text right back out of the plan).
    t0 = time.time()
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.md5(F.to_json(F.struct(*df.columns)))).alias("h"),
    ).collect()[0]
    return int(agg["n"]), time.time() - t0


def main() -> int:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from dist_mapreduce_spark.session import get_spark

    spark = get_spark("stress_hot_shingle")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qs = e.queries()

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    repd = (
        src.crossJoin(spark.range(rep).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") * rep + F.col("rep"))
        .drop("rep")
    )
    dirs = {}
    for tag, frame in (
        ("control", repd),
        (
            "hot",
            repd.withColumn(
                "text",
                F.when(
                    F.col("text").isNotNull(),
                    F.concat(F.col("text"), F.lit(" " + HOT_SPAN)),
                ).otherwise(F.col("text")),
            ),
        ),
    ):
        d = os.path.join(repo, ".scratch", f"hotshingle_{tag}_x{rep}")
        frame.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"# {tag}: {n} docs", flush=True)
        dirs[tag] = d

    times = {}
    for tag in ("control", "hot"):
        rows, sec = _full_eval(qs["dedup_substring_rewrite"](spark, dirs[tag]))
        times[tag] = sec
        print(
            f"{tag:8s} dedup_substring_rewrite {rows:>9} rows {sec:7.2f}s",
            flush=True,
        )
    ratio = times["hot"] / max(times["control"], 1e-9)
    print(f"hot/control ratio: {ratio:.2f} (flat ≈ 1.0)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
