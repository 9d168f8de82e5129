"""As-of join semantics on a hand-built fixture + the bucketized
range-join equivalence promised in plans/advanced_joins.q_join_range."""

from __future__ import annotations

from pyspark.sql import functions as F

from dist_mapreduce_spark.operators.asof_join import asof_join


def test_asof_join_semantics(spark):
    right = spark.createDataFrame(
        [(1, 10, 101), (1, 50, 105), (2, 20, 202)],
        "key long, rts long, order_id long",
    )
    left = spark.createDataFrame(
        [(1, 0, 900), (1, 30, 901), (1, 50, 902), (1, 70, 903), (2, 19, 904), (3, 5, 905)],
        "key long, lts long, event_id long",
    )
    out = {
        r["event_id"]: r["asof_order_id"]
        for r in asof_join(
            left, right, key="key", left_ts="lts", right_ts="rts",
            value_cols=["order_id"], left_cols=["event_id"],
        ).collect()
    }
    assert out[900] is None        # before any reference row
    assert out[901] == 101         # latest at/before ts=30
    assert out[902] == 105         # inclusive: ts == reference ts
    assert out[903] == 105
    assert out[904] is None        # key 2's order is later than the event
    assert out[905] is None        # key with no reference rows at all


def test_range_join_bucketized_equivalence(spark):
    """The 100 TB formulation of join_range: bucketize the range key by
    the window width, equi-join on the bucket and its two neighbors,
    re-filter exactly. Must equal the broadcast nested-loop result."""
    from dist_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    width = 100.0

    naive = (
        c.join(
            F.broadcast(s),
            (F.col("c_acctbal") >= F.col("s_acctbal") - width)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + width),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n"))
    )

    sb = s.withColumn("sb", F.floor(F.col("s_acctbal") / width).cast("long"))
    cb = c.withColumn("cb", F.floor(F.col("c_acctbal") / width).cast("long"))
    # A |Δbal| ≤ width pair can only straddle adjacent buckets: explode
    # the supplier row into its bucket ± 1 and equi-join — the shuffle
    # is on the bucket id, never a cross product.
    sx = sb.withColumn(
        "jb", F.explode(F.array(F.col("sb") - 1, F.col("sb"), F.col("sb") + 1))
    )
    bucketed = (
        cb.join(sx, cb.cb == sx.jb)
        .filter(
            (F.col("c_acctbal") >= F.col("s_acctbal") - width)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + width)
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n"))
    )

    a = {(r["s_suppkey"], r["n"]) for r in naive.collect()}
    b = {(r["s_suppkey"], r["n"]) for r in bucketed.collect()}
    assert a == b and len(a) > 0
