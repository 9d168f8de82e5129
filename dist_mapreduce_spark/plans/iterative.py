"""Deterministic sampling + iterative algorithms — the two remaining
operator classes a 100 TB pipeline needs beyond one-pass SQL.

Sampling: rand()-based TABLESAMPLE is irreproducible across runs,
engines and partitionings. The scale-correct pattern is a hash-mod
filter on a stable key — the same rows are selected on every engine,
every run, every cluster size, and the predicate pushes down to the
scan. (This is how training corpora hold out eval slices: membership
is a pure function of the key.)

Iteration: Lloyd's k-means over the embeddings table, expressed as a
per-round Spark plan — broadcast centroids into a codegen'd
assignment expression, recompute centroids with posexplode + a single
(cluster, dim) aggregation. No Python touches row data; the driver
loop only carries k×dim centroid floats per round. That is the 100 TB
shape: per-iteration cost = one scan + one shuffle of (k·dim) partial
sums, with deterministic seeding (first-k by vec_id) so results are
reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.registry import query
from dist_mapreduce_spark.sources.tables import load_table

# ------------------------------------------------------------- sampling


@query(
    "sample_deterministic",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))"
        "       AS BIGINT) % 100 < 10"
    ),
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample of orders: md5(key) mod 100 < 10.
    Engine-portable (md5 is md5 everywhere), partition-invariant, and
    rerunnable — unlike rand()/TABLESAMPLE. At 100 TB the same
    predicate defines train/eval membership forever."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 100
    )
    return o.filter(bucket < 10).select("o_orderkey", "o_totalprice")


# Per-language sampling rates (percent): downsample the dominant
# language, keep the tails — the standard corpus-rebalancing move.
STRATA_PCT = {"en": 20, "zh": 50, "es": 80, "de": 80, "fr": 80}
DEFAULT_PCT = 100


@query(
    "sample_stratified",
    oracle=(
        "SELECT doc_id, lang FROM documents WHERE"
        " CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)"
        " % 100 < CASE lang"
        + "".join(f" WHEN '{k}' THEN {v}" for k, v in STRATA_PCT.items())
        + f" ELSE {DEFAULT_PCT} END"
    ),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language rates applied
    through the same md5-bucket predicate as sample_deterministic, so
    membership is reproducible and partition-invariant. This is the
    language-rebalancing pass of a corpus pipeline; unlike
    df.sampleBy (seeded RNG per partition — resample on any repartition)
    the hash-mod predicate gives the same sample on any cluster
    topology. Map-side only: a filter over the scan, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 100
    )
    rate = F.lit(DEFAULT_PCT)
    for k, v in reversed(STRATA_PCT.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return d.filter(bucket < rate).select("doc_id", "lang")


# -------------------------------------------------------------- k-means

K = 8
N_ITER = 5
DIM = 64


@query("kmeans_embeddings")  # no oracle: iterative algorithm (driver contract
# allows rows-only for these); determinism is pinned by seeded init +
# exact counts, asserted in tests.
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, k=8, 5 fixed rounds, over embeddings
    (array<float>, dim 64).

    Per round, entirely declarative:
    1. assignment: squared-L2 to each broadcast centroid via an
       aggregate() fold over the zipped arrays; argmin with
       array_position — codegen'd, no Python, no UDF;
    2. update: posexplode the vector, aggregate avg per
       (cluster, dim) — ONE shuffle of k×dim partial sums thanks to
       map-side combine — then collect k×dim floats to the driver and
       rebuild the centroid literals for the next round.

    Deterministic: init = first k vectors by vec_id, float math in a
    fixed fold order. Returns per-cluster sizes + centroid L2 norm."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    init = emb.orderBy("vec_id").limit(K).collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init]

    def centroid_lit(c: list[float]):
        return F.array(*[F.lit(x) for x in c])

    def sqdist(vec, c: list[float]):
        return F.aggregate(
            F.zip_with(vec, centroid_lit(c), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    assigned = None
    for _ in range(N_ITER):
        dists = F.array(*[sqdist(F.col("embedding"), c) for c in centroids])
        assigned = emb.select(
            "vec_id",
            "embedding",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
        )
        new_rows = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "mean"))
                ).alias("dims")
            )
            .select(
                "cluster",
                F.transform(F.col("dims"), lambda s: s["mean"]).alias("centroid"),
            )
            .collect()
        )
        by_cluster = {r["cluster"]: [float(x) for x in r["centroid"]] for r in new_rows}
        # Empty clusters keep their previous centroid.
        centroids = [by_cluster.get(i, centroids[i]) for i in range(K)]

    norms = [sum(x * x for x in c) ** 0.5 for c in centroids]
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("n_vectors"))
    norm_col = F.element_at(
        F.array(*[F.lit(round(n, 6)) for n in norms]), F.col("cluster") + 1
    )
    return sizes.select("cluster", "n_vectors", norm_col.alias("centroid_norm"))


# ------------------------------------------------- connected components

CC_MAX_ITERS = 20


@query(
    "graph_components",
    oracle=(
        "SELECT s_suppkey AS node,"
        " min(s_suppkey) OVER (PARTITION BY s_nationkey) AS component"
        " FROM supplier"
    ),
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by iterative min-label propagation (the
    Pregel/GraphX pattern as plain DataFrame rounds).

    Graph: suppliers are nodes; each supplier links to the supplier at
    half its rank within its nation — a binary tree per nation, so the
    TRUE components are exactly the nation groups and the oracle can
    state them in closed form, while the Spark side runs the general
    algorithm with no knowledge of that structure.

    Per round: join labels into the symmetric edge list (one shuffle on
    node id), union with self-labels, min-aggregate — converged when
    sum(label) stops falling (it is monotone non-increasing).
    localCheckpoint truncates lineage each round so the plan does not
    grow with iterations. Tree diameter is O(log n), so rounds stay
    single-digit at any SF; at 100 TB scale the same loop runs with the
    edge list pre-partitioned by src and AQE handling skew."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rk_w = F.row_number().over(
        Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    )
    ranked = s.select(
        F.col("s_suppkey").alias("node"), "s_nationkey", rk_w.alias("rk")
    )
    child = ranked.filter(F.col("rk") >= 2).alias("c")
    parent = ranked.alias("p")
    edges = child.join(
        parent,
        (F.col("c.s_nationkey") == F.col("p.s_nationkey"))
        & (F.col("p.rk") == F.expr("c.rk DIV 2")),
    ).select(F.col("c.node").alias("src"), F.col("p.node").alias("dst"))
    edges_sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    labels = ranked.select("node", F.col("node").alias("label")).localCheckpoint()
    prev_sum = None
    for _ in range(CC_MAX_ITERS):
        msgs = edges_sym.join(labels, edges_sym["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "label"
        )
        labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("component"))


# Temperature-based language rebalancing (the multilingual-corpus
# mixing rule): sample language l with probability ∝ p_l^alpha, here
# alpha = 0.5 so the weight is sqrt — chosen deliberately because sqrt
# and division are IEEE correctly-rounded in every engine, while pow()
# is not; the acceptance threshold is therefore bit-identical on Spark
# and DuckDB. Acceptance rate a_l = sqrt(n_min / n_l) (the rarest
# language keeps 100%), quantized to a 1e6-bucket integer threshold.
TEMP_BUCKETS = 1_000_000


@query(
    "sample_temperature",
    oracle=(
        "WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),"
        " m AS (SELECT min(n_l) AS n_min FROM c),"
        " r AS (SELECT lang,"
        "   CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_l AS DOUBLE))"
        f"        * {TEMP_BUCKETS}) AS BIGINT) AS thresh"
        "  FROM c, m)"
        " SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang"
        " WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))"
        f"       AS BIGINT) % {TEMP_BUCKETS} < r.thresh"
    ),
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling (alpha=0.5) over the documents corpus:
    per-language acceptance rate sqrt(n_min/n_l), membership decided by
    the same md5-bucket predicate as sample_deterministic — so the
    sample is reproducible on any engine, run, or cluster topology.

    Plan shape at 100 TB: one tiny groupBy(lang) to get counts (a few
    hundred rows), a broadcast join of the per-language threshold back
    onto the corpus, and a map-side filter. No large shuffle; the only
    pass over the data is the final filtered scan."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.join(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_l").cast("double"))
            * TEMP_BUCKETS
        ).alias("thresh"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint") % TEMP_BUCKETS
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("thresh"))
        .select("doc_id", "lang")
    )


# ------------------------------------------------------------- pagerank

#: Fixed-point scale for integer PageRank: ranks are stored as
#: rank * 1e12 in BIGINT. Integer sums are order-independent and floor
#: division is identical across engines, so an ITERATIVE float-free
#: PageRank gets a full value-hash oracle — no rows-only escape hatch.
PR_SCALE = 10**12
PR_ITERS = 5


def _pr_oracle() -> str:
    """Unrolled DuckDB mirror of the Spark loop (recursive CTEs cannot
    aggregate in the recursive term, and the iteration count is a fixed
    constant, so unrolling is both legal and clearer)."""
    s = PR_SCALE
    parts = [
        "WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src,"
        " l_suppkey * 2 + 1 AS dst FROM lineitem),"
        " edges AS (SELECT src, dst FROM e0"
        "           UNION ALL SELECT dst AS src, src AS dst FROM e0),"
        " deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),"
        " nn AS (SELECT count(*) AS n FROM deg),"
        f" r0 AS (SELECT src AS node, {s} // n AS rank FROM deg, nn)"
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f", r{i} AS (SELECT e.dst AS node,"
            f" (SELECT (15 * {s}) // (100 * n) FROM nn)"
            f" + sum((85 * r.rank) // (100 * d.d)) AS rank"
            f" FROM edges e JOIN r{i-1} r ON r.node = e.src"
            f" JOIN deg d ON d.src = e.src GROUP BY e.dst)"
        )
    parts.append(
        f" SELECT node, CAST(rank AS BIGINT) AS rank_fp FROM r{PR_ITERS}"
    )
    return "".join(parts)


@query("graph_pagerank", oracle=_pr_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 rounds) over the bipartite
    part↔supplier graph from distinct lineitem pairs, in FIXED-POINT
    integer arithmetic: rank_fp = rank·1e12 as BIGINT, contributions
    (85·r) DIV (100·outdeg), teleport (15·SCALE) DIV (100·N).

    Why fixed-point: float PageRank is partition-order-dependent (FP
    addition does not commute), which would force a rows-only check.
    Integer sums commute and DIV is floor on both engines, so every bit
    of the result is deterministic — the oracle-parity discipline
    applied to an iterative algorithm.

    Scale shape: per round = one join of the edge list with the rank
    frame (both hash-partitioned on src — co-partitioned after round 1)
    + one (dst) aggregation; lineage cut per round with localCheckpoint
    so the plan stays O(1). The symmetric bipartite graph has no
    dangling nodes (in-degree = out-degree ≥ 1), so no lost-mass term.
    N is a driver-side scalar (one count per job, like the k-means
    centroid fetch). Part/supplier ids interleave as 2k / 2k+1 to make
    the node-id space disjoint."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    e0 = (
        li.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    edges_deg = edges.join(deg, "src").localCheckpoint()

    n = deg.count()
    base = (15 * PR_SCALE) // (100 * n)
    ranks = deg.select("src", F.lit(PR_SCALE // n).cast("long").alias("rank"))
    ranks = ranks.withColumnRenamed("src", "node").localCheckpoint()

    for _ in range(PR_ITERS):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            F.expr("(85 * rank) DIV (100 * d)").alias("c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("s"))
            .select("node", (F.lit(base) + F.col("s")).cast("long").alias("rank"))
            .localCheckpoint()
        )
    return ranks.select("node", F.col("rank").alias("rank_fp"))
