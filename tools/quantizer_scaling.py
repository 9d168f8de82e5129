"""k ~ sqrt(N) quantizer-scaling measurement (round-5 verdict item #7).

The clustered-regime demo (plans/ann_index.py sim_ivf_clustered) uses a
FIXED 16-cell quantizer, which makes a 1-probe scan a constant 1/16 of
the corpus at any scale — SCALE.md honestly notes that production IVF
grows k with the corpus (FAISS guidance: k ~ sqrt(N)), so the probed
FRACTION shrinks as data grows. This script executes that claim:

- corpus = the deterministic clustered universe (closed-form cvec from
  vec_id, the sim_ivf_clustered machinery) at 1x and 100x of the sf0.1
  embedding id space;
- quantizer k = 16 at 1x and k = 64 (4x, ~sqrt(100) rounding to the
  LCG centroid grid) at 100x, CLUST_PROBE = 1 probes either way;
- measures per-batch serving wall time from the partitioned index
  (the batched one-plan join, serve shape) vs the brute-force full
  scan, and recall@10 of the pruned serving against that truth.

Expected (and measured — see SCALE.md round-6 table): the probe/full
gap WIDENS with k: at fixed k the probe is a constant fraction; at
k ~ sqrt(N) the probed fraction drops 16/64 = 4x while full-scan cost
grows with N. Recall stays at the clustered-regime ceiling because
cluster noise (0.05-bounded) is far below centroid separation at both
k values.

Usage: python tools/quantizer_scaling.py  (prints one table row per
(scale, k) point; wall times are medians of 3 runs on a warm session).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.ann_index import (
    CLUST_MUL,
    _CVEC_SPARK,
    _py_clust_centroid,
)
from dist_mapreduce_spark.plans.similarity import (
    TOP_K,
    ivf_py_probe_cells,
    ivf_ranked_cells_sql,
)
from dist_mapreduce_spark.functions.vectors import cosine_spark_sql
from dist_mapreduce_spark.session import get_spark

N_BASE = 2_000          # sf0.1 embeddings id-space
N_Q = 4                 # query batch (small so the union stays pruned)
REPEATS = 3


def run_point(spark, scale: int, k: int) -> dict:
    n = N_BASE * scale
    g_sql = f"CAST((vec_id * {CLUST_MUL}) % 4294967296 % {k} AS INT)"
    corp = (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .withColumn("g", F.expr(g_sql))
        .withColumn("cvec", F.expr(_CVEC_SPARK))
        .drop("g")
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"qscale_x{scale}_k{k}",
    )
    cents = [(g, _py_clust_centroid(g)) for g in range(k)]
    ranked = ivf_ranked_cells_sql(cents, col="cvec")
    (
        corp.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("cell", F.expr(f"{ranked}[0].c"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    qdf = back.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("cvec").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))

    # --- pruned batched serving (1 probe per query, union-cell filter)
    ranked_q = ivf_ranked_cells_sql(cents, col="qv")
    probes = qdf.select(
        "query_id",
        "qv",
        F.explode(
            F.expr(f"transform(slice({ranked_q}, 1, 1), x -> x.c)")
        ).alias("pcell"),
    )
    union_cells = sorted(
        int(r["pcell"]) for r in probes.select("pcell").distinct().collect()
    )

    def serve() -> list:
        scan = spark.read.parquet(path).filter(F.col("cell").isin(union_cells))
        return (
            scan.join(
                F.broadcast(probes),
                (F.col("cell") == F.col("pcell"))
                & (F.col("vec_id") != F.col("query_id")),
            )
            .withColumn("score", F.expr(cosine_spark_sql("qv", "cvec")))
            .select("query_id", "vec_id", "score")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
            .collect()
        )

    def full() -> list:
        return (
            back.join(F.broadcast(qdf), F.col("vec_id") != F.col("query_id"))
            .withColumn("score", F.expr(cosine_spark_sql("qv", "cvec")))
            .select("query_id", "vec_id", "score")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
            .collect()
        )

    probe_times, full_times = [], []
    approx = truth = None
    for _ in range(REPEATS):
        t0 = time.time()
        approx = serve()
        probe_times.append(time.time() - t0)
        t0 = time.time()
        truth = full()
        full_times.append(time.time() - t0)
    hits = len({tuple(r) for r in truth} & {tuple(r) for r in approx})
    # probe-cell replay parity sanity (driver ranking == in-plan ranking)
    for r in qdf.collect():
        pc = ivf_py_probe_cells(cents, [float(v) for v in r["qv"]], 1)
        assert pc[0] in union_cells
    cell_rows = {
        int(r["cell"]): int(r["cnt"])
        for r in back.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    per_q_rows = sum(cell_rows.get(c, 0) for c in union_cells) / max(
        len(union_cells), 1
    )
    return {
        "scale": scale,
        "k": k,
        "n": n,
        "union_cells": len(union_cells),
        "per_query_rows": int(per_q_rows),
        "per_query_frac": round(per_q_rows / n, 4),
        "probe_s": round(statistics.median(probe_times), 2),
        "full_s": round(statistics.median(full_times), 2),
        "speedup": round(
            statistics.median(full_times) / statistics.median(probe_times), 1
        ),
        "recall": round(hits / max(len(truth), 1), 3),
    }


def run_point_trained(spark, scale: int, train_sample_mod: int = 1) -> dict:
    """The TRAINED-path point (round 9): write the clustered corpus as
    an `embedding` table, train the DEFAULT quantizer (K from the
    corpus-size rule — trained_quantizer's exact path), probe at the
    rule's np, and measure the probed fraction / recall / speedup the
    serving family actually gets. ``train_sample_mod`` > 1 trains on a
    vec_id % mod == 0 sample — the documented 100 TB posture (the
    trainer needs ~k·10³ points, not N); the FULL corpus is still
    assigned and served."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.similarity import (
        ivf_ranked_cells_sql,
        trained_n_probe,
        trained_quantizer,
    )

    n = N_BASE * scale
    g_sql = f"CAST((vec_id * {CLUST_MUL}) % 4294967296 % 16 AS INT)"
    corp = (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .withColumn("g", F.expr(g_sql))
        .withColumn("embedding", F.expr(_CVEC_SPARK))
        .drop("g")
        .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    )
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"qscale_trained_x{scale}",
    )
    corp.write.mode("overwrite").parquet(os.path.join(root, "embeddings.parquet"))
    emb = spark.read.parquet(os.path.join(root, "embeddings.parquet"))
    t0 = time.time()
    if train_sample_mod > 1:
        import math as _m

        from dist_mapreduce_spark.plans.iterative import (
            kmeans_quantize_col,
            train_kmeans_centroids_df,
        )
        from dist_mapreduce_spark.plans.iterative import KMEANS_SCALE
        from dist_mapreduce_spark.plans.similarity import K_DIV, K_MAX, K_MIN

        n_full = emb.count()
        k = max(K_MIN, min(K_MAX, int(_m.floor(_m.sqrt(float(n_full)))) // K_DIV))
        sample = emb.filter(F.col("vec_id") % train_sample_mod == 0).select(
            "vec_id", kmeans_quantize_col().alias("q")
        )
        ints = train_kmeans_centroids_df(sample, k)
        cents = [
            (cid, [c / float(KMEANS_SCALE) for c in cq])
            for cid, cq in enumerate(ints)
        ]
        n_corpus = n_full
    else:
        cents, n_corpus = trained_quantizer(emb)
    train_s = time.time() - t0
    k = len(cents)
    np_ = trained_n_probe(k, n_corpus)
    ranked = ivf_ranked_cells_sql(cents)
    path = os.path.join(root, "index")
    (
        emb.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("cell", F.expr(f"{ranked}[0].c"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    qdf = back.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    ranked_q = ivf_ranked_cells_sql(cents, col="qv")
    probes = qdf.select(
        "query_id",
        "qv",
        F.explode(
            F.expr(f"transform(slice({ranked_q}, 1, {np_}), x -> x.c)")
        ).alias("pcell"),
    )
    union_cells = sorted(
        int(r["pcell"]) for r in probes.select("pcell").distinct().collect()
    )

    def serve() -> list:
        scan = spark.read.parquet(path).filter(F.col("cell").isin(union_cells))
        return (
            scan.join(
                F.broadcast(probes),
                (F.col("cell") == F.col("pcell"))
                & (F.col("vec_id") != F.col("query_id")),
            )
            .withColumn("score", F.expr(cosine_spark_sql("qv", "embedding")))
            .select("query_id", "vec_id", "score")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
            .collect()
        )

    def full() -> list:
        return (
            back.join(F.broadcast(qdf), F.col("vec_id") != F.col("query_id"))
            .withColumn("score", F.expr(cosine_spark_sql("qv", "embedding")))
            .select("query_id", "vec_id", "score")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("query_id", "vec_id")
            .collect()
        )

    probe_times, full_times = [], []
    approx = truth = None
    for _ in range(REPEATS):
        t0 = time.time()
        approx = serve()
        probe_times.append(time.time() - t0)
        t0 = time.time()
        truth = full()
        full_times.append(time.time() - t0)
    hits = len({tuple(r) for r in truth} & {tuple(r) for r in approx})
    cell_rows = {
        int(r["cell"]): int(r["cnt"])
        for r in back.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # PER-QUERY probed fraction (the serving cost metric): mean over
    # the batch of the rows in THAT query's np probed cells / n — the
    # union across the batch overstates what any one query scans.
    per_q = probes.groupBy("query_id").agg(
        F.collect_set("pcell").alias("cs")
    ).collect()
    pq_rows = [
        sum(cell_rows.get(int(c), 0) for c in r["cs"]) for r in per_q
    ]
    probed_rows = sum(pq_rows) / max(len(pq_rows), 1)
    return {
        "path": "trained",
        "scale": scale,
        "k_rule": k,
        "n_probe_rule": np_,
        "n": n,
        "train_sample_mod": train_sample_mod,
        "train_s": round(train_s, 1),
        "union_cells": len(union_cells),
        "per_query_frac": round(probed_rows / n, 4),
        "probe_s": round(statistics.median(probe_times), 2),
        "full_s": round(statistics.median(full_times), 2),
        "speedup": round(
            statistics.median(full_times) / statistics.median(probe_times), 1
        ),
        "recall": round(hits / max(len(truth), 1), 3),
    }


def main() -> int:
    spark = get_spark("quantizer-scaling")
    for scale, k in ((1, 16), (100, 16), (100, 64)):
        print(run_point(spark, scale, k), flush=True)
    # Round-9 trained-path extension: the DEFAULT quantizer's rule-K
    # at 1x, and at 20x with the production sampled-trainer posture.
    print(run_point_trained(spark, 1), flush=True)
    print(run_point_trained(spark, 20, train_sample_mod=8), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
