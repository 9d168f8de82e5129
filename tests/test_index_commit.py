"""Crash-atomic index publication (round-13 verdict item #1): the
manifest commit must guarantee a reader sees ONLY the old or only the
new generation — never a mix — no matter where a mutation crashes.
The old in-place protocol (per-cell delete + rename) corrupted exactly
the window between two cell swaps; these tests inject a crash there.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dist_mapreduce_spark.plans.index_commit import (
    MANIFEST_NAME,
    commit_cell_swap,
    current_generation,
    index_data_dir,
    write_index_base,
)


def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, cell long")


def _snapshot(spark, root):
    return sorted(
        (int(r["vec_id"]), int(r["cell"]))
        for r in spark.read.parquet(index_data_dir(root)).collect()
    )


BASE = [(i, i % 3) for i in range(30)]  # cells 0,1,2 × 10 rows


def test_write_index_base_flips_generations_and_gcs(spark, tmp_path):
    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    assert current_generation(root) == 1
    assert _snapshot(spark, root) == sorted(BASE)
    # Re-publish: generation increments, old one is GC'd, content swaps.
    write_index_base(_mk_df(spark, BASE[:10]), root)
    assert current_generation(root) == 2
    assert _snapshot(spark, root) == sorted(BASE[:10])
    assert not os.path.isdir(os.path.join(root, "gen-1"))


def test_legacy_flat_root_resolves_to_itself(spark, tmp_path):
    flat = str(tmp_path / "flat")
    _mk_df(spark, BASE).write.partitionBy("cell").parquet(flat)
    assert current_generation(flat) is None
    assert index_data_dir(flat) == flat


def _stage_rewrite(spark, tmp_path, rows):
    stage = str(tmp_path / "stage")
    _mk_df(spark, rows).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(stage)
    return stage


def test_commit_swaps_affected_cells_and_drops_emptied(spark, tmp_path):
    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    # Rewrite cell 0 to 2 rows; empty cell 1 (affected but absent from
    # the stage); leave cell 2 untouched.
    new0 = [(100, 0), (101, 0)]
    stage = _stage_rewrite(spark, tmp_path, new0)
    commit_cell_swap(root, stage, [0, 1])
    want = sorted(new0 + [r for r in BASE if r[1] == 2])
    assert _snapshot(spark, root) == want
    assert current_generation(root) == 2
    # Untouched cell 2 was carried over by hardlink: same inode.
    g1 = os.path.join(root, "gen-1", "cell=2")
    assert not os.path.isdir(g1), "old generation must be GC'd"


def test_kill_mid_swap_reader_sees_only_old_then_only_new(
    spark, tmp_path
):
    """THE crash-atomicity pin: inject a crash BETWEEN two cell moves
    (the window the old delete+rename protocol corrupted). The reader
    must see the old generation in full; a rerun then publishes the
    new generation in full. Never a mix."""
    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    before = _snapshot(spark, root)
    new_rows = [(200, 0), (201, 1), (202, 2)]  # rewrite ALL 3 cells
    stage = _stage_rewrite(spark, tmp_path, new_rows)
    with pytest.raises(RuntimeError, match="injected crash"):
        commit_cell_swap(root, stage, [0, 1, 2], _fail_after_moves=2)
    # Crashed after moving 2 of 3 cells: manifest never flipped, so the
    # reader sees the OLD generation — complete, not a 2/3 hybrid.
    assert current_generation(root) == 1
    assert _snapshot(spark, root) == before
    # Recovery: re-stage (the crashed attempt consumed stage dirs) and
    # commit cleanly — reader now sees ONLY the new content.
    stage = _stage_rewrite(spark, tmp_path, new_rows)
    commit_cell_swap(root, stage, [0, 1, 2])
    assert _snapshot(spark, root) == sorted(new_rows)
    assert current_generation(root) == 2
    # The abandoned scratch dir from the crashed attempt is GC'd.
    assert not any(
        d.startswith(".gen-") for d in os.listdir(root)
    ), os.listdir(root)


def test_commit_requires_manifest(spark, tmp_path):
    flat = str(tmp_path / "flat")
    _mk_df(spark, BASE).write.partitionBy("cell").parquet(flat)
    stage = _stage_rewrite(spark, tmp_path, [(1, 0)])
    with pytest.raises(ValueError, match="no manifest"):
        commit_cell_swap(flat, stage, [0])


def test_manifest_is_ignored_by_spark_scan(spark, tmp_path):
    """The manifest lives INSIDE the root with a leading underscore so
    a naive spark.read.parquet(gen_dir) never trips on it, and the gen
    dir itself carries plain hive cell= partitioning (PartitionFilters
    pruning works unchanged)."""
    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    assert MANIFEST_NAME.startswith("_")
    data = index_data_dir(root)
    pruned = spark.read.parquet(data).filter(F.col("cell").isin([1]))
    assert sorted(int(r["vec_id"]) for r in pruned.collect()) == [
        i for i in range(30) if i % 3 == 1
    ]
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan


# --------------------- LSM run-store compaction (round 13, item #3)

SF_SMOKE = "/root/testdata/sf0.001"


def test_lsm_compact_dedup_collapses_runs_and_preserves_verdicts(spark):
    """The fingerprint index's maintenance pass: run directories
    collapse to the single base run while the drained verdicts stay
    bit-equal to the pre-compact stream's."""
    from dist_mapreduce_spark.plans.index_commit import lsm_live_runs
    from dist_mapreduce_spark.plans.llm_pipeline import (
        _dedup_stream_paths,
        q_lsm_compact_dedup,
        q_stream_dedup_incremental,
    )

    before = sorted(
        tuple(r) for r in q_stream_dedup_incremental(spark, SF_SMOKE).collect()
    )
    _stage, _ckpt, runs = _dedup_stream_paths(SF_SMOKE)
    assert len(lsm_live_runs(runs)) > 1, "ingest must leave several runs"
    after = sorted(
        tuple(r) for r in q_lsm_compact_dedup(spark, SF_SMOKE).collect()
    )
    assert lsm_live_runs(runs) == [-1], "compaction must fold to ONE base"
    assert before == after


def test_lsm_compact_cms_crash_then_replay_stays_exactly_once(spark):
    """The SUM-fold (non-idempotent) case end-to-end: a crash injected
    before the manifest flip leaves the old run set current; a clean
    compact folds to one base; a micro-batch REPLAYED after its run
    was folded (the sink rewriting ingest_batch=0 into the live
    generation) is ignored by readers via the folded_through watermark
    — drained counters identical throughout."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.index_commit import (
        current_generation,
        index_data_dir,
        lsm_compact,
        lsm_live_runs,
        lsm_read,
    )
    from dist_mapreduce_spark.plans.sketches import (
        _cms_stream_paths,
        q_stream_sketch_cms,
    )

    q_stream_sketch_cms(spark, SF_SMOKE).collect()
    _stage, _ckpt, runs = _cms_stream_paths(SF_SMOKE)
    runs_live = lsm_live_runs(runs)
    assert len([b for b in runs_live if b >= 0]) > 1

    def drained():
        return sorted(
            (int(r["d"]), int(r["w"]), int(r["c"]))
            for r in lsm_read(spark, runs)
            .groupBy("d", "w")
            .agg(F.sum("c").cast("long").alias("c"))
            .collect()
        )

    want = drained()
    fold = lambda df: df.groupBy("d", "w").agg(
        F.sum("c").cast("long").alias("c")
    )
    gen0 = current_generation(runs)
    # Keep batch 0's run content for the replay simulation below.
    batch0 = [
        tuple(r)
        for r in spark.read.parquet(index_data_dir(runs))
        .filter(F.col("ingest_batch") == 0)
        .collect()
    ]
    assert batch0
    # Crash before the flip: old generation stays current, counters
    # unchanged, no double-count from the half-written base.
    with _pytest.raises(RuntimeError, match="injected crash"):
        lsm_compact(spark, runs, fold, _fail_before_flip=True)
    assert current_generation(runs) == gen0
    assert drained() == want
    # Clean compact: one base run, counters bit-equal.
    ft = lsm_compact(spark, runs, fold)
    assert ft == max(b for b in runs_live if b >= 0)
    assert lsm_live_runs(runs) == [-1]
    assert drained() == want
    # Replay ghost: the sink rewrites batch 0 into the LIVE generation
    # (exactly what a crashed-then-restarted stream would do). The
    # reader must ignore it — its counts are already inside the base.
    cols = ["d", "w", "c", "ingest_batch"]
    (
        spark.createDataFrame(batch0, "d int, w int, c long, ingest_batch int")
        .select(*cols)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(index_data_dir(runs))
    )
    assert lsm_live_runs(runs) == [-1]
    assert drained() == want


def test_lsm_compact_hll_collapses_runs_and_preserves_sketch(spark):
    """The MAX-fold member: run collapse + bit-equal drained registers
    + the full estimate row unchanged through compaction."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.index_commit import (
        lsm_live_runs,
        lsm_read,
    )
    from dist_mapreduce_spark.plans.sketches import (
        _hll_stream_paths,
        q_lsm_compact_hll,
        q_stream_sketch_hll,
    )

    before = sorted(
        tuple(r) for r in q_stream_sketch_hll(spark, SF_SMOKE).collect()
    )
    _stage, _ckpt, runs = _hll_stream_paths(SF_SMOKE)
    assert len(lsm_live_runs(runs)) > 1
    regs_before = sorted(
        (int(r["j"]), int(r["mj"]))
        for r in lsm_read(spark, runs)
        .groupBy("j")
        .agg(F.max("mj").alias("mj"))
        .collect()
    )
    after = sorted(
        tuple(r) for r in q_lsm_compact_hll(spark, SF_SMOKE).collect()
    )
    assert lsm_live_runs(runs) == [-1]
    assert before == after
    regs_after = sorted(
        (int(r["j"]), int(r["mj"]))
        for r in lsm_read(spark, runs)
        .groupBy("j")
        .agg(F.max("mj").alias("mj"))
        .collect()
    )
    assert regs_before == regs_after
