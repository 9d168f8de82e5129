"""Golden-fixture tests for the text-index plans (inverted index,
secondary sort, bigram collocations) — hand-computed expectations on
tiny corpora, mirroring the reference's golden-style unit tests
(/root/reference/internal/worker/worker_test.go:7-43)."""

from __future__ import annotations

import pytest

from dist_mapreduce_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.QUERIES[name]


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a"),
            (2, "b c"),
            (3, "a,a!a"),  # punctuation separates tokens (worker.go:27-29)
        ],
        "doc_id long, text string",
    )


def test_inverted_index_postings(spark, tiny_docs, monkeypatch):
    import dist_mapreduce_spark.plans.text_index as ti

    monkeypatch.setattr(ti, "_docs", lambda s, d: tiny_docs)
    rows = {r["word"]: r for r in _q("inverted_index")(spark, SF).collect()}
    assert list(rows["a"]["postings"]) == [1, 3]
    assert list(rows["b"]["postings"]) == [1, 2]
    assert list(rows["c"]["postings"]) == [2]
    assert rows["a"]["doc_freq"] == 2 and rows["c"]["doc_freq"] == 1


def test_secondary_sort_orders_values_by_date(spark, monkeypatch):
    import dist_mapreduce_spark.plans.text_index as ti

    orders = spark.createDataFrame(
        [
            (10, 7, "1995-03-02"),
            (11, 7, "1995-01-15"),
            (12, 7, "1995-01-15"),  # date tie → orderkey tiebreak
            (20, 8, "1996-06-01"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr("o_orderkey", "o_custkey", "CAST(o_orderdate AS DATE) AS o_orderdate")
    monkeypatch.setattr(ti, "load_table", lambda s, d, t: orders)
    rows = {r["o_custkey"]: r for r in _q("secondary_sort")(spark, SF).collect()}
    assert list(rows[7]["orders_by_date"]) == [11, 12, 10]
    assert rows[7]["n_orders"] == 3
    assert list(rows[8]["orders_by_date"]) == [20]


def test_bigram_colloc_counts_and_lift(spark, tiny_docs, monkeypatch):
    import dist_mapreduce_spark.plans.text_index as ti

    monkeypatch.setattr(ti, "_docs", lambda s, d: tiny_docs)
    rows = {(r["w1"], r["w2"]): r for r in _q("bigram_colloc")(spark, SF).collect()}
    # Tokens: doc1 [a b a], doc2 [b c], doc3 [a a a] → unigrams a=5,
    # b=2, c=1, N=8. Bigrams: (a,b),(b,a) in doc1; (b,c); (a,a)×2 in doc3.
    assert rows[("a", "a")]["cnt_ab"] == 2
    assert rows[("a", "b")]["cnt_ab"] == 1
    assert rows[("b", "c")]["cnt_ab"] == 1
    r = rows[("a", "a")]
    assert r["cnt_a"] == 5 and r["cnt_b"] == 5
    assert r["lift"] == pytest.approx(2 * 8 / 25)
    # single-token docs produce no bigrams; no (c, *) pairs exist
    assert not any(w1 == "c" for (w1, _) in rows)


def test_events_retention_triangle(spark, monkeypatch):
    import dist_mapreduce_spark.plans.events_windows as ew

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),
            (1, "2024-01-03 09:00:00"),
            (2, "2024-01-02 08:00:00"), (2, "2024-01-03 08:00:00"),
        ],
        "user_id long, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    monkeypatch.setattr(ew, "_events", lambda s, d: ev)
    rows = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in registry.QUERIES["events_retention"](spark, SF).collect()
    }
    # user 1 cohort Jan 1, active offsets {0, 2}; user 2 cohort Jan 2,
    # active offsets {0, 1}. Same-day repeat events collapse.
    assert rows == {
        ("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 1): 1,
    }


def test_profile_table_counts_nulls_and_distincts(spark, monkeypatch):
    import dist_mapreduce_spark.plans.relational as rel

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, "2024-01-01", "1-URGENT"),
            (2, 10, None, 5.0, "2024-01-02", "1-URGENT"),
            (3, None, "F", None, "2024-01-02", "2-HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    monkeypatch.setattr(rel, "_t", lambda s, d, t: orders)
    rows = {
        r["column_name"]: (r["n_nulls"], r["n_distinct"])
        for r in registry.QUERIES["profile_table"](spark, SF).collect()
    }
    assert rows["o_orderkey"] == (0, 3)
    assert rows["o_custkey"] == (1, 1)
    assert rows["o_orderstatus"] == (1, 2)
    assert rows["o_totalprice"] == (1, 1)
    assert rows["o_orderpriority"] == (0, 2)


def test_ts_gapfill_zero_fills_and_carries_forward(spark, monkeypatch):
    import dist_mapreduce_spark.plans.events_windows as ew

    ev = spark.createDataFrame(
        [
            (1, "click", "2024-01-01 05:00:00", 10.0),
            (2, "click", "2024-01-03 06:00:00", 7.5),  # Jan 2 is a gap
        ],
        "event_id long, event_type string, ts string, value double",
    ).selectExpr("event_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts", "value")
    monkeypatch.setattr(ew, "_events", lambda s, d: ev)
    rows = {
        r["bucket"]: (r["n_events"], r["filled_value"])
        for r in registry.QUERIES["ts_gapfill"](spark, SF).collect()
    }
    assert rows["2024-01-01 00:00:00"] == (1, 10.0)
    assert rows["2024-01-02 00:00:00"] == (0, 10.0)  # gap: zero count, LOCF sum
    assert rows["2024-01-03 00:00:00"] == (1, 7.5)


def test_fn_similarity_known_distances(spark, monkeypatch):
    import dist_mapreduce_spark.plans.scalar_functions as sf

    sup = spark.createDataFrame(
        [(1, "kitten", 7)], "s_suppkey long, s_name string, s_nationkey long"
    )
    nat = spark.createDataFrame(
        [(7, "sitting")], "n_nationkey long, n_name string"
    )
    tables = {"supplier": sup, "nation": nat}
    monkeypatch.setattr(sf, "_t", lambda s, d, t: tables[t])
    r = registry.QUERIES["fn_similarity"](spark, SF).collect()[0]
    assert r["edit_dist"] == 3
    # chars kitten={k,i,t,e,n}, sitting={s,i,t,n,g}: |∩|=3, |∪|=7
    assert r["char_jaccard"] == pytest.approx(3 / 7)


def test_rolling_active_users_window_membership(spark, monkeypatch):
    import dist_mapreduce_spark.plans.events_windows as ew

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-05 10:00:00"),
            (1, "2024-01-10 10:00:00"),  # >6 days after Jan 1
        ],
        "user_id long, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    monkeypatch.setattr(ew, "_events", lambda s, d: ev)
    rows = {
        r["day"]: r["active_7d"]
        for r in registry.QUERIES["rolling_active_users"](spark, SF).collect()
    }
    # Windows end on observed days only. Jan 5 window [Dec 30..Jan 5]
    # sees users {1, 2}; Jan 10 window [Jan 4..Jan 10] sees {2, 1} via
    # Jan 5 + Jan 10 activity; Jan 1 sees {1}.
    assert rows == {"2024-01-01": 1, "2024-01-05": 2, "2024-01-10": 2}


def test_skyline_pareto_matches_bruteforce(spark, monkeypatch):
    """Sweep-based skyline equals the O(n²) dominance definition on a
    fixture with ties on both dimensions."""
    import dist_mapreduce_spark.plans.relational as rel

    rows = [
        (1, 10.0, 5), (2, 10.0, 5),   # duplicate point: both survive, one pair row
        (3, 10.0, 3),                  # dominated (same price, smaller size)
        (4, 12.0, 7), (5, 12.0, 6),   # (12,7) on frontier; (12,6) dominated by (12,7)
        (6, 9.0, 1),                   # cheapest point: on frontier
    ]
    part = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    monkeypatch.setattr(rel, "_t", lambda s, d, t: part)
    got = {
        (r["price"], r["p_size"]): (r["n_parts"], r["min_partkey"])
        for r in registry.QUERIES["skyline_pareto"](spark, SF).collect()
    }
    # brute-force dominance over the fixture
    pts = [(pk, pr, sz) for pk, pr, sz in rows]
    frontier = {}
    for pk, pr, sz in pts:
        dominated = any(
            (bpr <= pr and bsz >= sz and (bpr < pr or bsz > sz))
            for _, bpr, bsz in pts
        )
        if not dominated:
            n, mn = frontier.get((pr, sz), (0, pk))
            frontier[(pr, sz)] = (n + 1, min(mn, pk))
    assert got == frontier
    assert (10.0, 5) in got and got[(10.0, 5)] == (2, 1)
    assert (10.0, 3) not in got


def test_skyline_pareto_random_points_vs_bruteforce(spark, monkeypatch):
    """200 seeded-random points (dense grid → many ties/dominations):
    sweep output must equal the quadratic dominance definition."""
    import random

    import dist_mapreduce_spark.plans.relational as rel

    rng = random.Random(42)
    rows = [
        (i, float(rng.randint(0, 15)), rng.randint(0, 15)) for i in range(200)
    ]
    part = spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    )
    monkeypatch.setattr(rel, "_t", lambda s, d, t: part)
    got = {
        (r["price"], r["p_size"]): (r["n_parts"], r["min_partkey"])
        for r in registry.QUERIES["skyline_pareto"](spark, SF).collect()
    }
    frontier = {}
    for pk, pr, sz in rows:
        if not any(
            bpr <= pr and bsz >= sz and (bpr < pr or bsz > sz)
            for _, bpr, bsz in rows
        ):
            n, mn = frontier.get((pr, sz), (0, pk))
            frontier[(pr, sz)] = (n + 1, min(mn, pk))
    assert got == frontier
