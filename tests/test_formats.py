"""Format round-trip + partition-pruning tests (plans/formats.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE as SF


def _q(name):
    import __spark_entry__ as e

    return e.queries()[name]


@pytest.mark.parametrize(
    "name", ["sink_csv_roundtrip", "sink_json_roundtrip", "sink_orc_roundtrip",
             "sink_xml_roundtrip"]
)
def test_roundtrip_matches_parquet_agg(spark, name):
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    direct = {
        r["o_orderpriority"]: (r["n_orders"], r["total"])
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    via_format = {
        r["o_orderpriority"]: (r["n_orders"], r["total"])
        for r in _q(name)(spark, SF).collect()
    }
    assert via_format == direct


def test_partitioned_sink_prunes_partitions(spark):
    """The read-back filter on the partition column must become a
    PartitionFilter (directory-level pruning), not a data filter."""
    df = _q("sink_parquet_partitioned")(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # The status filter must appear among the partition filters.
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderstatus" in pf


def test_stream_dedup_matches_batch_distinct(spark):
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.sources.tables import load_table

    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .select("event_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stream = {
        r["event_type"]: r["n_events"]
        for r in _q("stream_dedup")(spark, SF).collect()
    }
    assert stream == batch


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed on the join key → the sort-merge join runs
    with zero shuffle (the durable form of the reference's hash-bucket
    co-partitioning, worker.go:84-88)."""
    df = _q("join_bucketed")(spark, SF)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "SortMergeJoin" in plan
    # The join itself must be exchange-free; the final aggregate may
    # still shuffle its (tiny) grouped output.
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part


def test_zorder_files_are_range_disjoint(spark):
    """sink_zorder's layout claim: after repartitionByRange+sort on the
    Morton code, each parquet file owns a disjoint z-range, so a 2-D box
    predicate maps to a handful of files/row-groups instead of the whole
    table. Verified by reading each written file alone and checking the
    [min(z), max(z)] intervals never overlap."""
    import glob
    import os

    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.formats import _sink_dir

    _q("sink_zorder")(spark, SF).collect()
    # The sink writes under THIS process's scratch root (the round-11
    # PID isolation) — resolve it the way the sink does, not via the
    # pre-round-11 shared path (which only matched stale files).
    files = sorted(glob.glob(os.path.join(_sink_dir("lineitem_zorder"), "*.parquet")))
    assert len(files) >= 2, files
    spans = []
    for f in files:
        lo, hi = (
            spark.read.parquet(f)
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
            .first()
        )
        spans.append((lo, hi))
    spans.sort()
    for (_, prev_hi), (nxt_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= nxt_lo, spans


def test_sink_compact_collapses_file_count(spark):
    """The compaction job's point: the fragmented write produces many
    small files, the rewrite exactly 4 leveled ones, and the table
    content survives byte-for-byte (the registered oracle checks the
    aggregate; here we check the files)."""
    import glob
    import os

    from dist_mapreduce_spark.plans import registry
    from dist_mapreduce_spark.plans.formats import _sink_dir

    registry.load_all()
    rows = registry.QUERIES["sink_compact"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5
    frag = glob.glob(os.path.join(_sink_dir("compact_fragmented"), "*.parquet"))
    leveled = glob.glob(os.path.join(_sink_dir("compact_leveled"), "*.parquet"))
    assert len(frag) >= 3 * len(leveled), (len(frag), len(leveled))
    assert len(leveled) == 4, leveled
    sizes = [os.path.getsize(f) for f in leveled]
    # Round-robin leveling: no output file more than 2x another.
    assert max(sizes) <= 2 * min(sizes), sizes
