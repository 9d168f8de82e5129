"""Deterministic sampling + k-means tests (plans/iterative.py)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE as SF


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


def test_sample_is_reproducible_and_sane(spark):
    a = sorted(r["o_orderkey"] for r in _q("sample_deterministic")(spark, SF).collect())
    b = sorted(r["o_orderkey"] for r in _q("sample_deterministic")(spark, SF).collect())
    assert a == b
    from dist_mapreduce_spark.sources.tables import load_table

    total = load_table(spark, SF, "orders").count()
    # ~10% with hash-uniform slack.
    assert 0.05 * total < len(a) < 0.15 * total


def test_kmeans_deterministic_and_total(spark):
    from dist_mapreduce_spark.sources.tables import load_table

    run1 = sorted(map(tuple, _q("kmeans_embeddings")(spark, SF).collect()))
    run2 = sorted(map(tuple, _q("kmeans_embeddings")(spark, SF).collect()))
    assert run1 == run2
    total = load_table(spark, SF, "embeddings").count()
    assert sum(r[1] for r in run1) == total
    # All centroids finite and non-degenerate.
    assert all(r[2] > 0 for r in run1)


def test_graph_components_match_nations(spark):
    """Label propagation must converge to the nation partition (the
    synthetic per-nation trees are the true components)."""
    from dist_mapreduce_spark.sources.tables import load_table

    got = {
        r["node"]: r["component"]
        for r in _q("graph_components")(spark, SF).collect()
    }
    s = load_table(spark, SF, "supplier").select("s_suppkey", "s_nationkey")
    rows = s.collect()
    want_min = {}
    for r in rows:
        k = r["s_nationkey"]
        want_min[k] = min(want_min.get(k, r["s_suppkey"]), r["s_suppkey"])
    want = {r["s_suppkey"]: want_min[r["s_nationkey"]] for r in rows}
    assert got == want
