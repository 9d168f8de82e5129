"""Hot-key skew stress for the first-wins dedup family (round-10):
uniform replication makes every content key occur exactly rep times —
it can never produce ONE corpus-wide hot key, which is precisely the
shape that broke row_number-window first-wins (all occurrences of one
hash sorted in a single task). This probe measures the three
aggregate-rewritten operators under a planted hot key at 10^5
occurrences, against same-size controls:

  dedup_substring_rewrite : one fixed 8-token span APPENDED to every
                            document (hot SHINGLE, n_docs·rep occs);
  dedup_paragraph         : one fixed SEG_WORDS-token header PREPENDED
                            to every document — segment 0 of every doc
                            is identical (hot SEGMENT hash);
  pipeline_corpus         : a corpus that is 10^5 copies of ONE
                            document (hot normalized FINGERPRINT) vs
                            10^5 distinct documents.

FLAT time (hot ≈ control) is the evidence first-wins partial-
aggregates map-side instead of sorting the hot key in one task.
Payload queries are timed with an md5-of-row full-evaluation aggregate
(a bare count lets Catalyst prune the reconstructed text).

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
    from dist_mapreduce_spark.plans.llm_pipeline import SEG_WORDS
    from dist_mapreduce_spark.session import get_spark

    spark = get_spark("stress_hot_shingle")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qs = e.queries()
    hot_header = " ".join(f"hotheadword{i}" for i in range(SEG_WORDS))

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    repd = (
        src.crossJoin(spark.range(rep).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") * rep + F.col("rep"))
        .drop("rep")
    )
    hot_text = F.when(
        F.col("text").isNotNull(),
        F.concat(
            F.lit(hot_header + " "), F.col("text"), F.lit(" " + HOT_SPAN)
        ),
    ).otherwise(F.col("text"))
    # Hot-fp pair: 10^5 distinct docs vs 10^5 copies of doc 0.
    n_hot = repd.count()
    one = src.filter(F.col("doc_id") == 0).drop("doc_id")
    clones = (
        spark.range(n_hot)
        .withColumnRenamed("id", "doc_id")
        .crossJoin(F.broadcast(one))
        .select(*repd.columns)
    )
    dirs = {}
    for tag, frame in (
        ("control", repd),
        ("hot", repd.withColumn("text", hot_text)),
        ("hotfp", clones),
    ):
        d = os.path.join(repo, ".scratch", f"hotshingle_{tag}_x{rep}")
        frame.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        print(f"# {tag}: {n} docs", flush=True)
        dirs[tag] = d

    probes = (
        ("dedup_substring_rewrite", "control", "hot"),
        ("dedup_paragraph", "control", "hot"),
        ("pipeline_corpus", "control", "hotfp"),
    )
    for name, base_tag, hot_tag in probes:
        times = {}
        for tag in (base_tag, hot_tag):
            rows, sec = _full_eval(qs[name](spark, dirs[tag]))
            times[tag] = sec
            print(
                f"{tag:8s} {name:26s} {rows:>9} rows {sec:7.2f}s",
                flush=True,
            )
        ratio = times[hot_tag] / max(times[base_tag], 1e-9)
        print(f"{name}: hot/control ratio {ratio:.2f} (flat ≈ 1.0)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
