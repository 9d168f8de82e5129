"""NN-Descent recall trajectory (round-8 verdict item 3): probe-set
edge recall of the sampled NN-Descent iteration sequence — seed (cell
blocking only), then each of KNN_ITERS sampled iterations — against the
exact brute-force truth. Publishes whether the isotropic ceiling is a
FIXPOINT (recall flat across late iterations), which docs/SCALE.md
records.

Usage: python tools/knn_trajectory.py [sf_dir] [iters]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.functions.vectors import cosine_spark_sql
    from dist_mapreduce_spark.plans.knn_graph import (
        KNN_K,
        KNN_PROBE,
        KNN_SAMPLE,
        _emb,
        q_knn_graph,
    )
    from dist_mapreduce_spark.session import get_spark

    spark = get_spark("knn-trajectory")
    emb = _emb(spark, sf_dir).filter(F.col("embedding").isNotNull())

    # Exact truth on the probe set.
    probe = emb.filter(F.col("vec_id") < KNN_PROBE).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(
        F.col("vec_id").alias("dst_id"), F.col("embedding").alias("ev")
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("dst_id"))
    truth = (
        corpus.join(F.broadcast(probe), F.col("dst_id") != F.col("src_id"))
        .withColumn("score", F.expr(cosine_spark_sql("qv", "ev")))
        .select("src_id", "dst_id", "score")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .select("src_id", "dst_id")
        .cache()
    )
    n_truth = truth.count()

    def recall(edges) -> float:
        hit = truth.join(edges.select("src_id", "dst_id"), ["src_id", "dst_id"]).count()
        return hit / max(n_truth, 1)

    qa = emb.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("va"))
    qb = emb.select(F.col("vec_id").alias("dst_id"), F.col("embedding").alias("vb"))
    wtop = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("dst_id"))

    g = q_knn_graph(spark, sf_dir).localCheckpoint(eager=True)
    print(f"iter0(seed) recall={recall(g):.4f}  edges={g.count()}", flush=True)

    # The q_knn_graph_converged iteration body, run step by step so
    # every iteration's recall is observable (the registered query
    # returns only the final graph).
    for i in range(1, iters + 1):
        e = g.select("src_id", "dst_id")
        und = (
            e.union(
                e.select(
                    F.col("dst_id").alias("src_id"),
                    F.col("src_id").alias("dst_id"),
                )
            )
            .distinct()
            .select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        )
        ws = Window.partitionBy("a").orderBy(
            F.md5(
                F.concat_ws(
                    "_", F.lit(str(i)), F.col("a").cast("string"),
                    F.col("b").cast("string"),
                )
            ),
            F.asc("b"),
        )
        smp = (
            und.withColumn("rs", F.row_number().over(ws))
            .filter(F.col("rs") <= KNN_SAMPLE)
            .select("a", "b")
        )
        x, y = smp.alias("x"), smp.alias("y")
        cand = (
            x.join(y, (F.col("x.a") == F.col("y.a")) & (F.col("x.b") != F.col("y.b")))
            .select(F.col("x.b").alias("src_id"), F.col("y.b").alias("dst_id"))
            .union(e)
            .distinct()
        )
        sc = (
            cand.join(qa, "src_id")
            .join(qb, "dst_id")
            .withColumn("score", F.expr(cosine_spark_sql("va", "vb")))
            .select("src_id", "dst_id", "score")
        )
        g = (
            sc.withColumn("rk", F.row_number().over(wtop))
            .filter(F.col("rk") <= KNN_K)
            .localCheckpoint(eager=True)
        )
        print(f"iter{i} recall={recall(g):.4f}  edges={g.count()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
