"""Relational + windowed-aggregate behavior on the sf0.001 tables, plus
plan-shape assertions (broadcast joins actually broadcast, aggregates
are partial+final) — the properties that matter at 100 TB."""

from __future__ import annotations

import pytest

from dist_mapreduce_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.QUERIES[name]


def test_join_inner_broadcasts(spark):
    df = _q("join_inner")(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_wordcount_is_partial_final_agg(spark):
    # The automatic combiner: two HashAggregate nodes around the exchange
    # (SURVEY.md §2.4 'combiner' row).
    df = _q("combiner")(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2


def test_semi_anti_partition_customers(spark):
    semi = _q("join_semi")(spark, SF).count()
    anti = _q("join_anti")(spark, SF).count()
    from dist_mapreduce_spark.sources.tables import load_table

    total = load_table(spark, SF, "customer").count()
    assert semi + anti == total


def test_topk_global_is_take_ordered(spark):
    from dist_mapreduce_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, SF, "orders")
    plan = (
        o.orderBy(F.desc("o_totalprice")).limit(10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_rollup_grand_total(spark):
    rows = _q("rollup_agg")(spark, SF).collect()
    grand = [r for r in rows if r["returnflag"] == "ALL" and r["linestatus"] == "ALL"]
    assert len(grand) == 1
    per_leaf = sum(
        r["n"] for r in rows if r["returnflag"] != "ALL" and r["linestatus"] != "ALL"
    )
    assert grand[0]["n"] == per_leaf


def test_stream_tumbling_matches_batch(spark):
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _q("agg_window_tumbling")(spark, SF).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _q("stream_tumbling")(spark, SF).collect()
    }
    assert batch.keys() == stream.keys()
    for k, (n_b, _) in batch.items():
        assert stream[k][0] == n_b


def test_session_windows_respect_gap(spark):
    # No two sessions of one user may be closer than the 30-min gap:
    # session_start >= previous session_end (end already includes +gap).
    rows = _q("agg_window_session")(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for sessions in by_user.values():
        sessions.sort()
        for (s1, e1), (s2, _) in zip(sessions, sessions[1:]):
            assert s2 >= e1


@pytest.mark.parametrize("name", ["setop_intersect", "setop_except"])
def test_setops_disjoint_union(spark, name):
    inter = {r["word"] for r in _q("setop_intersect")(spark, SF).collect()}
    exc = {r["word"] for r in _q("setop_except")(spark, SF).collect()}
    assert not (inter & exc)


def test_dim_joins_broadcast(spark):
    """Dimension joins must be broadcast (no shuffle of the fact side's
    join key) — the claim in README/docs/EXPLAIN.md, pinned here."""
    for name in ("join_inner", "join_broadcast", "join_multiway"):
        df = _q(name)(spark, SF)
        df.collect()
        plan = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_filter_pushdown_reaches_parquet_scan(spark):
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    df = load_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderpriority" in pushed
