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
    # Re-publish: generation increments, content swaps; the JUST
    # dereferenced generation survives one commit cycle (GC grace for
    # in-flight readers, round-14), then the NEXT commit sweeps it.
    write_index_base(_mk_df(spark, BASE[:10]), root)
    assert current_generation(root) == 2
    assert _snapshot(spark, root) == sorted(BASE[:10])
    assert os.path.isdir(os.path.join(root, "gen-1")), "GC grace"
    write_index_base(_mk_df(spark, BASE[:5]), root)
    assert current_generation(root) == 3
    assert _snapshot(spark, root) == sorted(BASE[:5])
    assert not os.path.isdir(os.path.join(root, "gen-1"))
    assert os.path.isdir(os.path.join(root, "gen-2")), "GC grace"


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
    # The dereferenced generation survives one cycle (GC grace), and
    # untouched cell 2 was carried over by hardlink: same inode.
    g1 = os.path.join(root, "gen-1", "cell=2")
    assert os.path.isdir(g1), "GC grace keeps the previous generation"
    g2 = os.path.join(root, "gen-2", "cell=2")
    old_inodes = {os.stat(os.path.join(g1, f)).st_ino for f in os.listdir(g1)}
    new_inodes = {os.stat(os.path.join(g2, f)).st_ino for f in os.listdir(g2)}
    assert old_inodes & new_inodes, "carry-over must be hardlinks"
    # The NEXT commit sweeps gen-1.
    stage2 = _stage_rewrite(spark, tmp_path, [(300, 0)])
    commit_cell_swap(root, stage2, [0])
    assert not os.path.isdir(os.path.join(root, "gen-1"))
    assert os.path.isdir(os.path.join(root, "gen-2")), "GC grace"


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


# ------------------- round-14 hardening: refusal, lease, grace, race


def test_corrupt_manifest_refuses_instead_of_destroying(spark, tmp_path):
    """A manifest that EXISTS but cannot be parsed must never be
    mistaken for 'no manifest' (which write_index_base treats as a
    destroyable fresh/legacy root) — round-13 advice, medium."""
    from dist_mapreduce_spark.plans.index_commit import (
        CorruptManifestError,
        read_manifest,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    before = _snapshot(spark, root)
    with open(os.path.join(root, MANIFEST_NAME), "w") as fh:
        fh.write("{not json")
    with pytest.raises(CorruptManifestError):
        read_manifest(root)
    with pytest.raises(CorruptManifestError):
        write_index_base(_mk_df(spark, BASE[:3]), root)
    # Nothing was destroyed: restore the manifest, data intact.
    import json

    with open(os.path.join(root, MANIFEST_NAME), "w") as fh:
        json.dump({"gen": 1}, fh)
    assert _snapshot(spark, root) == before


def test_orphan_generations_refuse_migration(spark, tmp_path):
    """gen-* dirs with NO manifest = a torn manifest-rooted index
    (manifest lost), not legacy flat data; publishing over it must
    raise, not rmtree the surviving generation."""
    from dist_mapreduce_spark.plans.index_commit import (
        CorruptManifestError,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    os.unlink(os.path.join(root, MANIFEST_NAME))
    with pytest.raises(CorruptManifestError, match="gen-"):
        write_index_base(_mk_df(spark, BASE[:3]), root)
    assert os.path.isdir(os.path.join(root, "gen-1"))


def test_legacy_migration_preserves_flat_data_until_commit(
    spark, tmp_path
):
    """Migrating a legacy flat-layout root: the flat files must stay
    intact (and the root must keep resolving to itself) until the
    replacement generation is COMMITTED — a crash mid-build loses
    nothing (round-13 advice: the old code rmtree'd the root first)."""
    flat = str(tmp_path / "flat")
    _mk_df(spark, BASE).write.partitionBy("cell").parquet(flat)
    before = _snapshot(spark, flat)

    def boom(_gen_dir):
        raise RuntimeError("injected crash mid-migration")

    with pytest.raises(RuntimeError, match="mid-migration"):
        write_index_base(
            _mk_df(spark, BASE[:6]), flat, extra_writes=boom
        )
    # Crash before the flip: still a legacy root, data intact.
    assert current_generation(flat) is None
    assert index_data_dir(flat) == flat
    assert _snapshot(spark, flat) == before
    # Clean migration: committed generation, legacy leftovers cleared.
    write_index_base(_mk_df(spark, BASE[:6]), flat)
    assert current_generation(flat) == 1
    assert _snapshot(spark, flat) == sorted(BASE[:6])
    assert not any(d.startswith("cell=") for d in os.listdir(flat))


def test_base_and_appends_publish_atomically(spark, tmp_path):
    """extra_writes stages follow-up appends INSIDE the uncommitted
    generation: a crash between base and append leaves the PREVIOUS
    generation current (never a base-only index), and a clean run
    publishes base+append as one unit — round-13 advice on
    build_dense_index_incr / sim_index_compact."""
    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    before = _snapshot(spark, root)
    batch = [(500, 0), (501, 1)]

    def crash_after_base(_gen_dir):
        raise RuntimeError("injected crash between base and append")

    with pytest.raises(RuntimeError, match="between base and append"):
        write_index_base(
            _mk_df(spark, BASE[:9]), root, extra_writes=crash_after_base
        )
    assert current_generation(root) == 1
    assert _snapshot(spark, root) == before, "no base-only index visible"

    def append(gen_dir):
        _mk_df(spark, batch).write.mode("append").partitionBy(
            "cell"
        ).parquet(gen_dir)

    write_index_base(_mk_df(spark, BASE[:9]), root, extra_writes=append)
    assert _snapshot(spark, root) == sorted(BASE[:9] + batch)


def test_concurrent_commit_raises_not_discards(spark, tmp_path):
    """Single-writer made explicit (round-13 verdict item #3): while
    one lifecycle op holds the commit lease, a second raises
    ConcurrentCommitError instead of silently rebuilding scratch and
    stealing the flip."""
    from dist_mapreduce_spark.plans.index_commit import (
        ConcurrentCommitError,
        commit_lease,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    stage = _stage_rewrite(spark, tmp_path, [(900, 0)])
    with commit_lease(root):  # the "other writer"
        with pytest.raises(ConcurrentCommitError, match="held by a live"):
            commit_cell_swap(root, stage, [0])
        with pytest.raises(ConcurrentCommitError):
            write_index_base(_mk_df(spark, BASE[:3]), root)
    # Lease released: the same commit now succeeds.
    commit_cell_swap(root, stage, [0])
    assert current_generation(root) == 2


def test_stale_lease_is_taken_over(spark, tmp_path, monkeypatch):
    """A lease abandoned by a crashed writer must not wedge the root
    forever: past the TTL the next commit takes it over."""
    from dist_mapreduce_spark.plans.index_commit import LOCK_NAME

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    lock = os.path.join(root, LOCK_NAME)
    with open(lock, "w") as fh:
        fh.write("{}")
    os.utime(lock, (1, 1))  # ancient mtime = crashed writer
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_LEASE_TTL", "60")
    write_index_base(_mk_df(spark, BASE[:3]), root)
    assert current_generation(root) == 2
    assert not os.path.exists(lock)


def test_link_tree_falls_back_to_copy(spark, tmp_path, monkeypatch):
    """Filesystems without hardlinks (object-store mounts raising
    EXDEV) must degrade to byte copy, not abort the commit."""
    import dist_mapreduce_spark.plans.index_commit as ic

    def no_link(_s, _d):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(ic.os, "link", no_link)
    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    new0 = [(100, 0)]
    stage = _stage_rewrite(spark, tmp_path, new0)
    commit_cell_swap(root, stage, [0])
    want = sorted(new0 + [r for r in BASE if r[1] in (1, 2)])
    assert _snapshot(spark, root) == want


def test_lsm_compact_while_ingesting_loses_no_rows(
    spark, tmp_path, monkeypatch
):
    """THE round-14 race pin: a micro-batch that lands WHILE a
    compaction is folding (after the fold listed the runs, before the
    manifest flip) used to be written into the old generation and
    GC'd — silent data loss. Now: the compact carries runs above the
    watermark into the new generation before flipping, the sink
    re-resolves the generation per write, and GC grace keeps the old
    generation one cycle. Zero lost rows in every interleaving."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.index_commit import (
        lsm_compact,
        lsm_live_runs,
        lsm_read,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsm")
    ckpt = str(tmp_path / "ckpt")
    lsm_run_dir(root)
    # The injected sink write runs INSIDE the compact's lease (same
    # thread), so the happens-after wait must time out fast — this
    # test exercises exactly the degraded path the pre/post-flip
    # carry-over passes exist for.
    monkeypatch.setenv("SPARK_GRAFT_SINK_COMMIT_WAIT", "0.1")

    def run_frame(base_val):
        return spark.createDataFrame(
            [(k, base_val * 10 + k) for k in range(3)], "k int, v long"
        )

    for b in range(2):
        lsm_write_run(run_frame(b), root, b, ckpt=ckpt)
    fold = lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))

    def drained():
        return sorted(
            (int(r["k"]), int(r["v"]))
            for r in fold(lsm_read(spark, root).drop("ingest_batch")).collect()
        )

    want_after_b2 = sorted(
        (k, (0 * 10 + k) + (1 * 10 + k) + (2 * 10 + k)) for k in range(3)
    )
    # Interleave: batch 2 arrives between the compact's base write and
    # its manifest flip (the lost-update window). It must survive.
    lsm_compact(
        spark,
        root,
        fold,
        _between_write_and_flip=lambda: lsm_write_run(
            run_frame(2), root, 2, ckpt=ckpt
        ),
    )
    assert drained() == want_after_b2
    assert 2 in lsm_live_runs(root), "the in-flight run stays readable"
    # The next compact folds it into the base.
    lsm_compact(spark, root, fold)
    assert lsm_live_runs(root) == [-1]
    assert drained() == want_after_b2
    # And the inverse interleaving: a sink write that STARTS before a
    # compact and finishes after its flip re-resolves the generation
    # and re-publishes (lsm_write_run's post-write check) — simulated
    # by compacting INSIDE the sink call via the injection-free path:
    lsm_write_run(run_frame(3), root, 3, ckpt=ckpt)
    assert drained() == sorted(
        (k, v + (3 * 10 + k)) for k, v in want_after_b2
    )


def test_lsm_fresh_checkpoint_epoch_reset_is_rejected(spark, tmp_path):
    """round-13 advice item #3: a stream restarted with a FRESH
    checkpoint re-emits batch ids from 0; silently dropping those as
    replay ghosts under the folded_through watermark would be data
    loss. The sink must refuse loudly. Same-stream replays stay
    allowed (the designed ghost case)."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.index_commit import (
        lsm_compact,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsm")
    ckpt = str(tmp_path / "ckpt")
    lsm_run_dir(root)
    frame = spark.createDataFrame([(1, 5)], "k int, v long")
    for b in range(2):
        lsm_write_run(frame, root, b, ckpt=ckpt)
    lsm_compact(
        spark, root, lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))
    )
    # Same stream, replayed batch under the watermark: allowed (ghost).
    lsm_write_run(frame, root, 0, ckpt=ckpt)
    # Fresh checkpoint (new stream id), batch id 0 under the
    # watermark: rejected.
    _shutil.rmtree(ckpt)
    with pytest.raises(RuntimeError, match="folded_through"):
        lsm_write_run(frame, root, 0, ckpt=ckpt)
    # The new stream's batches ABOVE the watermark are accepted (and
    # adopt the new stream id).
    lsm_write_run(frame, root, 7, ckpt=ckpt)


def test_lsm_maintain_policy_arms(spark, tmp_path):
    """lsm_maintain (round-14): the compact arm folds the run store to
    the one base when more than LSM_MAINTAIN_RUNS runs are live (the
    driver corpus's shape); the keep arm leaves the runs untouched
    when they are already bounded (a fixture whose new docs all land
    in ONE ingest split). Both decisions ride the drained verdicts."""
    from dist_mapreduce_spark.plans.index_commit import lsm_live_runs
    from dist_mapreduce_spark.plans.llm_pipeline import (
        _dedup_maintain_paths,
        q_lsm_maintain,
    )

    # --- compact arm: the smoke corpus spreads new docs over all 3
    # deterministic splits -> 3 live runs > LSM_MAINTAIN_RUNS.
    out = q_lsm_maintain(spark, SF_SMOKE).collect()
    assert out and all(r["decision"] == "compact" for r in out)
    _stage, runs = _dedup_maintain_paths(SF_SMOKE)
    assert lsm_live_runs(runs) == [-1], "compact arm must fold to ONE base"

    # --- keep arm: new docs (doc_id % 5 == 4) chosen so doc_id % 3 is
    # constant -> exactly one live run <= LSM_MAINTAIN_RUNS.
    sf = str(tmp_path / "keepfix")
    os.makedirs(sf)
    rows = [
        (0, "alpha text corpus", "en", "web", 17),
        (1, "bravo text corpus", "en", "web", 17),
        (2, "charlie text corpus", "en", "web", 19),
        (4, "delta new text", "en", "web", 14),       # 4 % 3 == 1
        (34, "delta new text", "en", "web", 14),      # dup_in_batch
        (64, "bravo text corpus", "en", "web", 17),   # dup_of_corpus
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(sf + "/documents.parquet")
    out = q_lsm_maintain(spark, sf).collect()
    assert out and all(r["decision"] == "keep" for r in out)
    by_id = {int(r["doc_id"]): r["status"] for r in out}
    assert by_id == {4: "unique", 34: "dup_in_batch", 64: "dup_of_corpus"}
    _stage, runs = _dedup_maintain_paths(sf)
    live = lsm_live_runs(runs)
    assert -1 not in live and len(live) == 1, (
        "keep arm must leave the run store un-compacted",
        live,
    )


# ------------- object-store commit mode: file_manifest (round 14, #7)


def _snapshot_fm(spark, root):
    from dist_mapreduce_spark.plans.index_commit import index_read

    return sorted(
        (int(r["vec_id"]), int(r["cell"]))
        for r in index_read(spark, root).select("vec_id", "cell").collect()
    )


def test_file_manifest_commit_and_pruned_read(spark, tmp_path):
    """file_manifest mode: the manifest lists the committed file set
    (partition columns ride as data columns); index_read serves the
    full set and the cells= pruning reads ONLY the listed files — the
    manifest-level pruning an object store uses in place of directory
    PartitionFilters."""
    from dist_mapreduce_spark.plans.index_commit import (
        index_files,
        index_read,
        read_manifest,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    man = read_manifest(root)
    assert man["mode"] == "file_manifest" and set(man["files"]) == {
        "cell=0",
        "cell=1",
        "cell=2",
    }
    assert _snapshot_fm(spark, root) == sorted(BASE)
    pruned = index_read(spark, root, cells=[1])
    assert sorted(int(r["vec_id"]) for r in pruned.collect()) == [
        i for i in range(30) if i % 3 == 1
    ]
    assert set(pruned.inputFiles()) == {
        "file://" + p if not p.startswith("file:") else p
        for p in index_files(root, cells=[1])
    } or len(pruned.inputFiles()) == len(index_files(root, cells=[1]))


def test_file_manifest_swap_relists_untouched_cells(spark, tmp_path):
    """The object-store point: a partial rewrite must carry untouched
    cells by MANIFEST RE-LISTING — their parquet files stay at their
    original paths (same inode, same generation dir), with zero data
    movement and zero per-file metadata ops."""
    from dist_mapreduce_spark.plans.index_commit import (
        read_manifest,
        write_stage,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    before = read_manifest(root)["files"]
    stage = str(tmp_path / "stage")
    new0 = [(100, 0), (101, 0)]
    write_stage(_mk_df(spark, new0), stage, mode="file_manifest")
    commit_cell_swap(root, stage, [0, 1])  # rewrite 0, empty 1
    man = read_manifest(root)
    assert man["gen"] == 2 and man["mode"] == "file_manifest"
    files = man["files"]
    assert "cell=1" not in files, "emptied cell must drop from the manifest"
    assert files["cell=2"] == before["cell=2"], (
        "untouched cell must be re-listed verbatim (gen-1 paths)"
    )
    assert all(p.startswith("gen-1/") for p in files["cell=2"])
    assert all(p.startswith("gen-2/") for p in files["cell=0"])
    want = sorted(new0 + [r for r in BASE if r[1] == 2])
    assert _snapshot_fm(spark, root) == want
    # gen-1 survives because referenced files live in it (not grace).
    assert os.path.isdir(os.path.join(root, "gen-1"))


def test_file_manifest_kill_mid_swap_old_then_new(spark, tmp_path):
    """The kill-mid-swap pin, file_manifest mode (round-13 verdict
    item #7's done-criterion): a crash between two cell moves leaves
    the old manifest current and the reader on the OLD file set in
    full; the rerun publishes the new set in full. Never a mix."""
    from dist_mapreduce_spark.plans.index_commit import write_stage

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    before = _snapshot_fm(spark, root)
    new_rows = [(200, 0), (201, 1), (202, 2)]
    stage = str(tmp_path / "stage")
    write_stage(_mk_df(spark, new_rows), stage, mode="file_manifest")
    with pytest.raises(RuntimeError, match="injected crash"):
        commit_cell_swap(root, stage, [0, 1, 2], _fail_after_moves=2)
    assert current_generation(root) == 1
    assert _snapshot_fm(spark, root) == before
    write_stage(_mk_df(spark, new_rows), stage, mode="file_manifest")
    commit_cell_swap(root, stage, [0, 1, 2])
    assert current_generation(root) == 2
    assert _snapshot_fm(spark, root) == sorted(new_rows)
    assert not any(
        d.startswith(".gen-") for d in os.listdir(root)
    ), os.listdir(root)


def test_file_manifest_mode_is_sticky_and_gc_keeps_referenced(
    spark, tmp_path
):
    """A root committed in file_manifest mode stays in it (the
    manifest mode wins over the argument/env), and GC never deletes a
    generation dir a referenced file lives in — only generations no
    current file needs, past the grace window."""
    from dist_mapreduce_spark.plans.index_commit import (
        read_manifest,
        write_stage,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    # Re-publish WITHOUT the explicit mode: must stay file_manifest.
    write_index_base(_mk_df(spark, BASE[:10]), root)
    assert read_manifest(root)["mode"] == "file_manifest"
    assert _snapshot_fm(spark, root) == sorted(BASE[:10])
    # Swap cell 0 twice; gen-2 keeps cells 1,2's referenced files
    # through both, while gen-3 (pure-swap generation) is swept once
    # its cell-0 files are superseded and the grace window passes.
    for val in (300, 301):
        stage = str(tmp_path / f"stage{val}")
        write_stage(
            _mk_df(spark, [(val, 0)]), stage, mode="file_manifest"
        )
        commit_cell_swap(root, stage, [0])
    man = read_manifest(root)
    assert man["gen"] == 4
    assert all(
        p.startswith("gen-2/") for p in man["files"]["cell=1"]
    ), man["files"]
    assert os.path.isdir(os.path.join(root, "gen-2"))
    want = sorted([(301, 0)] + [r for r in BASE[:10] if r[1] in (1, 2)])
    assert _snapshot_fm(spark, root) == want


def test_lsm_maintain_cms_policy_arms(spark, tmp_path):
    """lsm_maintain_cms (round-14): the SUM-fold policy — compact arm
    folds the counter runs to one base on the smoke corpus (3 live
    runs); keep arm leaves them untouched when every event lands in
    ONE ingest split, and the probe/exact audit is identical either
    way (sum associativity — the non-idempotent algebra is safe ONLY
    through the run/watermark machinery this policy drives)."""
    from dist_mapreduce_spark.plans.index_commit import lsm_live_runs
    from dist_mapreduce_spark.plans.sketches import (
        _cms_maintain_paths,
        q_lsm_maintain_cms,
    )

    out = q_lsm_maintain_cms(spark, SF_SMOKE).collect()
    assert out and all(r["decision"] == "compact" for r in out)
    _stage, runs = _cms_maintain_paths(SF_SMOKE)
    assert lsm_live_runs(runs) == [-1]

    # keep arm: user_ids all ≡ 0 (mod 3), probes (< 8) included.
    sf = str(tmp_path / "keepcms")
    os.makedirs(sf)
    rows = [(i, v) for i, v in enumerate([0, 0, 3, 3, 3, 6, 9, 12])]
    spark.createDataFrame(
        rows, "event_id long, user_id long"
    ).write.parquet(sf + "/events.parquet")
    out = q_lsm_maintain_cms(spark, sf).collect()
    assert out and all(r["decision"] == "keep" for r in out)
    by_probe = {int(r["probe"]): int(r["exact_cnt"]) for r in out}
    assert by_probe == {0: 2, 3: 3, 6: 1}
    _stage, runs = _cms_maintain_paths(sf)
    live = lsm_live_runs(runs)
    assert -1 not in live and len(live) == 1, live


def test_lsm_maintain_hll_policy_arms(spark, tmp_path):
    """lsm_maintain_hll (round-14): the MAX-fold member of the policy
    trio — compact on the smoke corpus, keep on a single-split
    fixture, estimate row identical either way (max idempotence)."""
    from dist_mapreduce_spark.plans.index_commit import lsm_live_runs
    from dist_mapreduce_spark.plans.sketches import (
        _hll_maintain_paths,
        q_lsm_maintain_hll,
    )

    out = q_lsm_maintain_hll(spark, SF_SMOKE).collect()
    assert out and all(r["decision"] == "compact" for r in out)
    _stage, runs = _hll_maintain_paths(SF_SMOKE)
    assert lsm_live_runs(runs) == [-1]

    sf = str(tmp_path / "keephll")
    os.makedirs(sf)
    rows = [(i, v) for i, v in enumerate([0, 3, 3, 6, 9, 12, 15, 18])]
    spark.createDataFrame(
        rows, "event_id long, user_id long"
    ).write.parquet(sf + "/events.parquet")
    out = q_lsm_maintain_hll(spark, sf).collect()
    assert len(out) == 1 and out[0]["decision"] == "keep"
    assert int(out[0]["exact_users"]) == 7
    _stage, runs = _hll_maintain_paths(sf)
    live = lsm_live_runs(runs)
    assert -1 not in live and len(live) == 1, live


def test_lsm_compact_respects_commit_lease(spark, tmp_path):
    """The third commit entry point (after write_index_base and
    commit_cell_swap) honors the single-writer lease too: a compaction
    attempted while another lifecycle op holds the lock raises instead
    of folding concurrently."""
    from pyspark.sql import functions as F

    from dist_mapreduce_spark.plans.index_commit import (
        ConcurrentCommitError,
        commit_lease,
        lsm_compact,
        lsm_live_runs,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsm")
    lsm_run_dir(root)
    frame = spark.createDataFrame([(1, 5)], "k int, v long")
    for b in range(2):
        lsm_write_run(frame, root, b)
    fold = lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))
    with commit_lease(root):
        with pytest.raises(ConcurrentCommitError):
            lsm_compact(spark, root, fold)
    assert sorted(b for b in lsm_live_runs(root) if b >= 0) == [0, 1]
    lsm_compact(spark, root, fold)  # lease released: succeeds
    assert lsm_live_runs(root) == [-1]


def test_stream_lsm_maintain_compacts_mid_stream(spark):
    """stream_lsm_maintain (round-14): the maintenance policy riding
    the LIVE stream must have actually compacted mid-ingest — after
    the drain the store holds the folded base PLUS the post-compact
    batch (run 2) above the folded_through=1 watermark, and the
    verdicts equal the plain ingest row's (bit-equal semantics through
    a mid-stream manifest flip — the race fix made gated)."""
    from dist_mapreduce_spark.plans.index_commit import (
        lsm_folded_through,
        lsm_live_runs,
    )
    from dist_mapreduce_spark.plans.llm_pipeline import (
        _dedup_live_maint_paths,
        q_stream_dedup_incremental,
        q_stream_lsm_maintain,
    )

    got = sorted(
        tuple(r) for r in q_stream_lsm_maintain(spark, SF_SMOKE).collect()
    )
    _stage, _ckpt, runs = _dedup_live_maint_paths(SF_SMOKE)
    assert lsm_folded_through(runs) == 1, "compaction must fire at batch 1"
    assert lsm_live_runs(runs) == [-1, 2], (
        "store must hold the folded base + the post-compact batch",
        lsm_live_runs(runs),
    )
    plain = sorted(
        tuple(r)
        for r in q_stream_dedup_incremental(spark, SF_SMOKE).collect()
    )
    assert got == plain


# ---------------------------- round-15 hardening pins


def test_double_takeover_admits_at_most_one_writer(
    spark, tmp_path, monkeypatch
):
    """round-14 verdict item #2: two waiters that both stat a stale
    lock must NOT both end up inside the critical section (the old
    unlink-then-create takeover let the second unlink remove the
    first's FRESH lock). The inode-pinned takeover serializes them:
    race N threads over one stale lock and assert the critical
    section was never concurrently occupied."""
    import threading

    from dist_mapreduce_spark.plans.index_commit import (
        LOCK_NAME,
        ConcurrentCommitError,
        commit_lease,
    )

    root = str(tmp_path / "idx")
    os.makedirs(root)
    lock = os.path.join(root, LOCK_NAME)
    with open(lock, "w") as fh:
        fh.write("{}")
    os.utime(lock, (1, 1))  # ancient mtime = crashed writer
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_LEASE_TTL", "60")

    barrier = threading.Barrier(4)
    active = []
    entered = []
    overlap = []
    guard = threading.Lock()

    def contend():
        barrier.wait()
        try:
            with commit_lease(root):
                with guard:
                    if active:
                        overlap.append(True)
                    active.append(1)
                    entered.append(1)
                import time as _t

                _t.sleep(0.05)
                with guard:
                    active.pop()
        except ConcurrentCommitError:
            pass  # losing cleanly is the correct outcome

    threads = [threading.Thread(target=contend) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not overlap, "two writers entered the critical section"
    assert entered, "the stale lease was never taken over"
    assert not os.path.exists(lock)


def test_takeover_refused_while_live_writer_holds_flock(
    tmp_path, monkeypatch
):
    """A commit that legitimately outruns the lease TTL is still
    protected: its flock on the lock inode makes the TTL-stale
    takeover fail at the flock step instead of stealing the lease."""
    import fcntl

    from dist_mapreduce_spark.plans.index_commit import (
        LOCK_NAME,
        ConcurrentCommitError,
        commit_lease,
    )

    root = str(tmp_path / "idx")
    os.makedirs(root)
    lock = os.path.join(root, LOCK_NAME)
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        os.utime(lock, (1, 1))  # mtime says stale; flock says alive
        monkeypatch.setenv("SPARK_GRAFT_COMMIT_LEASE_TTL", "60")
        with pytest.raises(ConcurrentCommitError, match="flock"):
            with commit_lease(root):
                pass
    finally:
        os.close(fd)


def test_lsm_run_landing_between_carryover_and_flip_survives(
    spark, tmp_path
):
    """round-14 verdict item #1 (the residual window): a sink write
    that completes AFTER the pre-flip carry-over listing and whose
    generation recheck also runs BEFORE the flip publishes into the
    old generation only — the post-flip second carry-over pass must
    pick it up. The injection writes raw parquet into the old
    generation dir (simulating exactly that sink) at the last
    pre-flip instant."""
    from dist_mapreduce_spark.plans.index_commit import (
        index_data_dir,
        lsm_compact,
        lsm_live_runs,
        lsm_read,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsm")
    lsm_run_dir(root)

    def run_frame(b):
        return spark.createDataFrame(
            [(k, b * 10 + k) for k in range(3)], "k int, v long"
        )

    for b in range(2):
        lsm_write_run(run_frame(b), root, b)
    fold = lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))

    def sneak_in_run_2():
        # A sink that resolved the OLD generation and never rechecks:
        # write ingest_batch=2 directly into the pre-flip data dir.
        old = index_data_dir(root)
        (
            run_frame(2)
            .withColumn("ingest_batch", F.lit(2))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(old)
        )

    lsm_compact(
        spark, root, fold, _between_carryover_and_flip=sneak_in_run_2
    )
    assert 2 in lsm_live_runs(root), "run 2 was stranded in the old gen"
    got = sorted(
        (int(r["k"]), int(r["v"]))
        for r in fold(lsm_read(spark, root).drop("ingest_batch")).collect()
    )
    want = sorted((k, (0 + 10 + 20) + 3 * k) for k in range(3))
    assert got == want


def test_epoch_guard_ambiguous_unrecorded_stream_requires_opt_in(
    spark, tmp_path, monkeypatch
):
    """round-14 advice item #3: folded_through set but NO sink_stream
    recorded (a store compacted before the guard existed) + a batch id
    at/under the watermark is ambiguous — refuse by default, accept
    under the explicit replay opt-in."""
    from dist_mapreduce_spark.plans.index_commit import (
        commit_lease,
        lsm_compact,
        lsm_run_dir,
        lsm_write_run,
        read_manifest,
        _flip_manifest,
    )

    root = str(tmp_path / "lsm")
    ckpt = str(tmp_path / "ckpt")
    lsm_run_dir(root)
    frame = spark.createDataFrame([(1, 5)], "k int, v long")
    for b in range(2):
        lsm_write_run(frame, root, b, ckpt=ckpt)
    fold = lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))
    lsm_compact(spark, root, fold)
    # Simulate a pre-guard store: strip the recorded stream id.
    with commit_lease(root):
        man = read_manifest(root)
        gen = int(man["gen"])
        extra = {
            k: v
            for k, v in man.items()
            if k not in ("gen", "sink_stream")
        }
        _flip_manifest(root, gen, extra, expect=gen)
    assert read_manifest(root).get("sink_stream") is None
    monkeypatch.delenv("SPARK_GRAFT_LSM_EPOCH_BYPASS", raising=False)
    with pytest.raises(RuntimeError, match="NO recorded sink stream"):
        lsm_write_run(frame, root, 0, ckpt=ckpt)
    monkeypatch.setenv("SPARK_GRAFT_LSM_EPOCH_BYPASS", "replay")
    lsm_write_run(frame, root, 0, ckpt=ckpt)  # adopted as replay ghost
    assert read_manifest(root).get("sink_stream") is not None


def test_rebuild_honors_explicit_mode_migration(spark, tmp_path):
    """round-14 advice item #4: a full rebuild with an explicit mode
    argument is a legitimate mode-migration point — the stated intent
    wins over the recorded manifest mode, in both directions."""
    from dist_mapreduce_spark.plans.index_commit import (
        index_read,
        read_manifest,
    )

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root, mode="hardlink")
    assert read_manifest(root).get("mode") is None  # hardlink
    # hardlink -> file_manifest
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    man = read_manifest(root)
    assert man.get("mode") == "file_manifest" and man["files"]
    got = sorted(
        (int(r["vec_id"]), int(r["cell"]))
        for r in index_read(spark, root).collect()
    )
    assert got == sorted(BASE)
    # file_manifest -> hardlink (the round-14 silent-override case)
    write_index_base(_mk_df(spark, BASE[:9]), root, mode="hardlink")
    man = read_manifest(root)
    assert man.get("mode") is None and "files" not in man
    assert _snapshot(spark, root) == sorted(BASE[:9])


def test_index_read_same_schema_in_both_modes(spark, tmp_path):
    """round-14 advice item #5: file_manifest reads must not leak the
    internal __part_<col> partition-discovery column — both modes
    return the same columns for the same index."""
    from dist_mapreduce_spark.plans.index_commit import index_read

    hl = str(tmp_path / "hl")
    fm = str(tmp_path / "fm")
    write_index_base(_mk_df(spark, BASE), hl, mode="hardlink")
    write_index_base(_mk_df(spark, BASE), fm, mode="file_manifest")
    df_hl = index_read(spark, hl, cells=[0, 1])
    df_fm = index_read(spark, fm, cells=[0, 1])
    assert sorted(df_hl.columns) == sorted(df_fm.columns) == [
        "cell",
        "vec_id",
    ]
    assert sorted(
        (int(r["vec_id"]), int(r["cell"])) for r in df_fm.collect()
    ) == sorted(r for r in BASE if r[1] in (0, 1))


def test_index_snapshot_pins_generation_across_commits(spark, tmp_path):
    """round-14 verdict item #4: a pinned reader session survives any
    number of commits — GC keeps the pinned generation alive past the
    one-cycle blind grace — and release lets the next commit sweep
    it."""
    from dist_mapreduce_spark.plans.index_commit import index_snapshot

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    snap = index_snapshot(root)
    assert snap.gen == 1
    for gen_rows in (BASE[:9], BASE[:6], BASE[:3]):
        write_index_base(_mk_df(spark, gen_rows), root)
    # gen-1 is far beyond grace, but the pin keeps it.
    assert os.path.isdir(os.path.join(root, "gen-1"))
    got = sorted(
        (int(r["vec_id"]), int(r["cell"]))
        for r in snap.read(spark).collect()
    )
    assert got == sorted(BASE), "pinned read must serve gen-1 verbatim"
    assert _snapshot(spark, root) == sorted(BASE[:3])  # live read moved on
    snap.release()
    write_index_base(_mk_df(spark, BASE[:3]), root)
    assert not os.path.isdir(os.path.join(root, "gen-1"))


def test_expired_pin_never_blocks_gc_and_refresh_extends(
    spark, tmp_path, monkeypatch
):
    from dist_mapreduce_spark.plans.index_commit import index_snapshot

    root = str(tmp_path / "idx")
    write_index_base(_mk_df(spark, BASE), root)
    snap = index_snapshot(root)
    monkeypatch.setenv("SPARK_GRAFT_PIN_TTL", "3600")
    snap.refresh()
    write_index_base(_mk_df(spark, BASE[:9]), root)
    write_index_base(_mk_df(spark, BASE[:6]), root)
    assert os.path.isdir(os.path.join(root, "gen-1"))  # fresh pin holds
    monkeypatch.setenv("SPARK_GRAFT_PIN_TTL", "0")
    write_index_base(_mk_df(spark, BASE[:3]), root)
    assert not os.path.isdir(
        os.path.join(root, "gen-1")
    ), "an expired pin must not block GC"


def test_index_snapshot_file_manifest_mode(spark, tmp_path):
    """Pinned reads work in the object-store commit mode too: the pin
    records every dir the pinned FILE LIST references, and the read
    replays that list (schema-parity drop included)."""
    from dist_mapreduce_spark.plans.index_commit import index_snapshot

    root = str(tmp_path / "fm")
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    snap = index_snapshot(root)
    for gen_rows in (BASE[:9], BASE[:6], BASE[:3]):
        write_index_base(_mk_df(spark, gen_rows), root, mode="file_manifest")
    got = sorted(
        (int(r["vec_id"]), int(r["cell"]))
        for r in snap.read(spark, cells=[0, 1, 2]).collect()
    )
    assert got == sorted(BASE)
    assert sorted(snap.read(spark).columns) == ["cell", "vec_id"]
    snap.release()


def test_snapshot_lsm_read_as_of(spark, tmp_path):
    """An LSM-store snapshot serves the merge-on-read view AS OF pin
    time: later ingests and even a compaction (which folds + flips)
    stay invisible to the pinned reader."""
    from dist_mapreduce_spark.plans.index_commit import (
        index_snapshot,
        lsm_compact,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsm")
    lsm_run_dir(root)

    def run_frame(b):
        return spark.createDataFrame(
            [(k, b * 10 + k) for k in range(3)], "k int, v long"
        )

    for b in range(2):
        lsm_write_run(run_frame(b), root, b)
    snap = index_snapshot(root)
    with snap:
        lsm_write_run(run_frame(2), root, 2)
        fold = lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))
        lsm_compact(spark, root, fold)
        got = sorted(
            (int(r["k"]), int(r["v"]), int(r["ingest_batch"]))
            for r in snap.lsm_read(spark).collect()
        )
        want = sorted(
            (k, b * 10 + k, b) for b in range(2) for k in range(3)
        )
        assert got == want, "pinned LSM view must exclude batch 2 + fold"


def test_sink_lease_wait_deadline_is_configurable(
    spark, tmp_path, monkeypatch
):
    """round-14 verdict ('what's wrong' #3): the sink's lease wait is
    a knob now — a tiny deadline surfaces the contention fast instead
    of hard-coding 30 s."""
    import time as _t

    from dist_mapreduce_spark.plans.index_commit import (
        ConcurrentCommitError,
        _record_sink_stream,
        commit_lease,
        lsm_run_dir,
    )

    root = str(tmp_path / "lsm")
    lsm_run_dir(root)
    monkeypatch.setenv("SPARK_GRAFT_SINK_LEASE_WAIT", "0.6")
    with commit_lease(root):
        t0 = _t.monotonic()
        with pytest.raises(ConcurrentCommitError):
            _record_sink_stream(root, "sid-test")
        assert _t.monotonic() - t0 < 10, "deadline must honor the env"


def test_pluggable_backend_conditional_put_lifecycle(spark, tmp_path):
    """round-14 verdict item #3: the lease/flip pair is a pluggable
    backend. Exercise the contract with a simulated object-store
    backend — lease = PUT-if-absent into an in-memory bucket, flip =
    conditional PUT keyed on the generation actually stored (the
    store-side CAS) — and run a full build + cell-swap lifecycle
    through it. Value bar: same content as the default backend; a
    concurrent flip with a losing precondition raises."""
    from dist_mapreduce_spark.plans.index_commit import (
        ConcurrentCommitError,
        PosixCommitBackend,
        get_commit_backend,
        set_commit_backend,
    )

    class CondPutBackend(PosixCommitBackend):
        """Conditional-PUT semantics over an in-memory lock table +
        manifest writes that go through an If-Match generation check
        (the ETag stand-in), never through os.replace-as-rename
        assumptions."""

        def __init__(self):
            self.locks = {}
            self.flips = 0

        @staticmethod
        def _ctx(release):
            import contextlib as _ctx

            @_ctx.contextmanager
            def cm():
                try:
                    yield
                finally:
                    release()

            return cm()

        def lease(self, root):
            import os as _os

            _os.makedirs(root, exist_ok=True)
            if self.locks.get(root):  # PUT-if-absent precondition
                raise ConcurrentCommitError(
                    f"cond-put: lock object exists for {root}"
                )
            self.locks[root] = True
            return self._ctx(lambda: self.locks.pop(root, None))

        def flip(self, root, manifest, expect):
            import json as _json
            import os as _os

            from dist_mapreduce_spark.plans.index_commit import (
                MANIFEST_NAME,
                current_generation,
            )

            if expect != -1 and current_generation(root) != expect:
                raise ConcurrentCommitError(
                    f"cond-put: If-Match failed for {root}"
                    f" (expected gen {expect})"
                )
            # The object-store PUT: single whole-object write.
            with open(_os.path.join(root, MANIFEST_NAME), "w") as fh:
                _json.dump(manifest, fh)
            self.flips += 1

    prev = get_commit_backend()
    backend = CondPutBackend()
    set_commit_backend(backend)
    try:
        root = str(tmp_path / "idx")
        write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
        new0 = [(700, 0)]
        from dist_mapreduce_spark.plans.index_commit import write_stage

        stage = str(tmp_path / "stage")
        write_stage(_mk_df(spark, new0), stage, ("cell",), "file_manifest")
        commit_cell_swap(root, stage, [0])
        assert backend.flips >= 2, "lifecycle must publish via the backend"
        from dist_mapreduce_spark.plans.index_commit import index_read

        got = sorted(
            (int(r["vec_id"]), int(r["cell"]))
            for r in index_read(spark, root).collect()
        )
        assert got == sorted(
            new0 + [r for r in BASE if r[1] in (1, 2)]
        )
        # The lease refuses a second writer through the same backend.
        from dist_mapreduce_spark.plans.index_commit import commit_lease

        with commit_lease(root):
            with pytest.raises(ConcurrentCommitError, match="cond-put"):
                write_index_base(_mk_df(spark, BASE[:3]), root)
    finally:
        set_commit_backend(prev)


def test_lsm_chaos_concurrent_sinks_and_compactions(spark, tmp_path):
    """Round-15 chaos pin: a REAL concurrent interleaving — one sink
    thread publishing monotonic batches with jittered pauses, one
    maintenance thread compacting repeatedly — must lose nothing for
    the non-idempotent SUM fold. This drives the whole three-net
    story (snapshot-first watermark, pre+post-flip carry-over,
    looped sink recheck) under scheduler-chosen timings instead of
    injected ones; the seed is fixed so a failure reproduces."""
    _lsm_chaos(spark, tmp_path, mode=None)


def test_lsm_chaos_file_manifest_mode(spark, tmp_path):
    """The same chaos drive with the store committed in file_manifest
    mode: the manifest-relisting carry-over, the addendum flip, and
    the directory-supersedes-manifest read merge must hold under
    scheduler-chosen sink/compactor timings too — carried-and-then-
    republished runs are the exact double-count hazard the SUM fold
    detects."""
    _lsm_chaos(spark, tmp_path, mode="file_manifest")


def _lsm_chaos(spark, tmp_path, mode):
    import random
    import threading

    from dist_mapreduce_spark.plans.index_commit import (
        lsm_compact,
        lsm_read,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsm")
    lsm_run_dir(root, mode=mode)
    rng = random.Random(1507)
    n_batches = 10
    fold = lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))
    errors = []

    def sink():
        try:
            for b in range(n_batches):
                frame = spark.createDataFrame(
                    [(k, b * 100 + k) for k in range(3)], "k int, v long"
                )
                lsm_write_run(frame, root, b)
                time_sleep(rng.random() * 0.15)
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(("sink", exc))

    def maintainer():
        try:
            for _ in range(4):
                time_sleep(rng.random() * 0.4)
                lsm_compact(spark, root, fold)
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(("compact", exc))

    from time import sleep as time_sleep

    t1 = threading.Thread(target=sink)
    t2 = threading.Thread(target=maintainer)
    t1.start()
    t2.start()
    t1.join()
    t2.join()
    assert not errors, errors
    lsm_compact(spark, root, fold)  # final fold: everything in the base
    got = sorted(
        (int(r["k"]), int(r["v"]))
        for r in fold(lsm_read(spark, root).drop("ingest_batch")).collect()
    )
    want = sorted(
        (k, sum(b * 100 + k for b in range(n_batches))) for k in range(3)
    )
    assert got == want, "rows lost or double-counted under concurrency"


def test_crash_between_rename_and_flip_recovers_on_retry(spark, tmp_path):
    """Round-15: a crash in the narrow window AFTER the scratch→gen
    rename but BEFORE the manifest flip leaves gen-<new> orphaned;
    the retry used to wedge on ENOTEMPTY at the rename (the root was
    unpublishable until manual cleanup). Both batch commit paths now
    clear the provably-unreferenced orphan first."""
    import dist_mapreduce_spark.plans.index_commit as ic

    class Bomb(ic.PosixCommitBackend):
        armed = False

        def flip(self, root, man, expect):
            if self.armed:
                type(self).armed = False
                raise RuntimeError("injected crash between rename and flip")
            return super().flip(root, man, expect)

    prev = ic.get_commit_backend()
    ic.set_commit_backend(Bomb())
    try:
        root = str(tmp_path / "idx")
        write_index_base(_mk_df(spark, BASE), root)
        # write_index_base path
        Bomb.armed = True
        with pytest.raises(RuntimeError, match="injected crash"):
            write_index_base(_mk_df(spark, BASE[:9]), root)
        assert current_generation(root) == 1  # old gen still current
        assert _snapshot(spark, root) == sorted(BASE)
        write_index_base(_mk_df(spark, BASE[:9]), root)  # retry works
        assert current_generation(root) == 2
        assert _snapshot(spark, root) == sorted(BASE[:9])
        # commit_cell_swap path
        Bomb.armed = True
        stage = _stage_rewrite(spark, tmp_path, [(500, 0)])
        with pytest.raises(RuntimeError, match="injected crash"):
            commit_cell_swap(root, stage, [0])
        assert current_generation(root) == 2
        stage = _stage_rewrite(spark, tmp_path, [(500, 0)])
        commit_cell_swap(root, stage, [0])
        assert current_generation(root) == 3
        assert _snapshot(spark, root) == sorted(
            [(500, 0)] + [r for r in BASE[:9] if r[1] != 0]
        )
    finally:
        ic.set_commit_backend(prev)


def test_randomized_crash_points_never_tear_a_generation(spark, tmp_path):
    """Round-15 robustness sweep: a seeded sequence of cell swaps,
    each first attempted with a crash at a random protocol point
    (between cell moves, or between rename and flip), then retried
    clean. Invariant after EVERY attempt: the reader sees exactly the
    pre-op or the post-op content — never a mix, never an error —
    and the clean retry always lands the op."""
    import random

    import dist_mapreduce_spark.plans.index_commit as ic

    class Bomb(ic.PosixCommitBackend):
        armed = False

        def flip(self, root, man, expect):
            if self.armed:
                type(self).armed = False
                raise RuntimeError("injected crash at flip")
            return super().flip(root, man, expect)

    rng = random.Random(1515)
    prev = ic.get_commit_backend()
    ic.set_commit_backend(Bomb())
    try:
        root = str(tmp_path / "idx")
        rows = [(i, i % 4) for i in range(24)]
        write_index_base(
            spark.createDataFrame(rows, "vec_id long, cell long"), root
        )
        current = sorted(rows)

        def snap():
            return sorted(
                (int(r["vec_id"]), int(r["cell"]))
                for r in spark.read.parquet(
                    index_data_dir(root)
                ).collect()
            )

        for step in range(6):
            cell = rng.randrange(4)
            n_new = rng.randrange(0, 3)
            new_rows = [(1000 * (step + 1) + j, cell) for j in range(n_new)]
            expected = sorted(
                [r for r in current if r[1] != cell] + new_rows
            )

            def mk_stage():
                stage = str(tmp_path / f"stage{step}")
                import shutil as _sh

                _sh.rmtree(stage, ignore_errors=True)
                if new_rows:
                    spark.createDataFrame(
                        new_rows, "vec_id long, cell long"
                    ).write.mode("overwrite").partitionBy("cell").parquet(
                        stage
                    )
                else:
                    os.makedirs(stage)
                return stage

            crash_kind = rng.choice(["moves", "flip", "none"])
            if crash_kind != "none":
                kw = {}
                if crash_kind == "moves":
                    kw["_fail_after_moves"] = 1
                else:
                    Bomb.armed = True
                with pytest.raises(RuntimeError, match="injected"):
                    commit_cell_swap(root, mk_stage(), [cell], **kw)
                Bomb.armed = False
                assert snap() == current, (
                    f"step {step}: crashed {crash_kind} attempt tore"
                    " the visible generation"
                )
            commit_cell_swap(root, mk_stage(), [cell])
            assert snap() == expected, f"step {step}: clean retry wrong"
            current = expected
    finally:
        ic.set_commit_backend(prev)


def test_migration_gc_graces_all_outgoing_manifest_dirs(spark, tmp_path):
    """Round-15 (review finding): a file_manifest manifest can
    reference files across MANY generation dirs; the one-cycle reader
    grace must cover that whole set when the next commit (including
    an explicit fm→hardlink migration) lands — not just gen-<cur> —
    or a reader resolving the outgoing file list loses files
    mid-scan. The NEXT commit after that sweeps them."""
    from dist_mapreduce_spark.plans.index_commit import (
        read_manifest,
        write_stage,
    )

    root = str(tmp_path / "fm")
    write_index_base(_mk_df(spark, BASE), root, mode="file_manifest")
    # Two cell swaps: the manifest now references files in gen-1
    # (untouched cells, carried by re-listing) AND gen-2/gen-3.
    for step, cell in enumerate((0, 1)):
        stage = str(tmp_path / f"stage{step}")
        write_stage(
            _mk_df(spark, [(900 + step, cell)]),
            stage,
            ("cell",),
            "file_manifest",
        )
        commit_cell_swap(root, stage, [cell])
    man = read_manifest(root)
    referenced = {p.split(os.sep, 1)[0] for ps in man["files"].values() for p in ps}
    assert "gen-1" in referenced, "precondition: old gens still referenced"
    # Explicit migration to hardlink mode: ONE commit later, every
    # dir the outgoing fm manifest referenced must still exist.
    write_index_base(_mk_df(spark, BASE[:6]), root, mode="hardlink")
    for d in referenced:
        assert os.path.isdir(os.path.join(root, d)), (
            f"{d} was referenced by the outgoing manifest and must"
            " survive one grace cycle"
        )
    # The commit after that sweeps them.
    write_index_base(_mk_df(spark, BASE[:3]), root)
    assert not os.path.isdir(os.path.join(root, "gen-1"))
    assert _snapshot(spark, root) == sorted(BASE[:3])


# ---------------- LSM run stores in file_manifest mode (round 15)


def _fm_run_frame(spark, b):
    return spark.createDataFrame(
        [(k, b * 10 + k) for k in range(3)], "k int, v long"
    )


def _fm_fold():
    return lambda df: df.groupBy("k").agg(F.sum("v").alias("v"))


def _fm_drained(spark, root):
    from dist_mapreduce_spark.plans.index_commit import lsm_read

    return sorted(
        (int(r["k"]), int(r["v"]))
        for r in _fm_fold()(
            lsm_read(spark, root).drop("ingest_batch")
        ).collect()
    )


def test_lsm_file_manifest_carryover_relists_instead_of_copying(
    spark, tmp_path
):
    """round-14 verdict item #6: on a file_manifest LSM store a late
    run landing in the residual window (between the carry-over listing
    and the flip) survives by MANIFEST RE-LISTING — its parquet files
    stay byte-for-byte where the sink wrote them, in the OLD
    generation dir, with the new manifest pointing at them (zero data
    movement, the object-store shape) — and reads lose no rows for
    the non-idempotent SUM fold."""
    import os

    from dist_mapreduce_spark.plans.index_commit import (
        index_data_dir,
        lsm_live_runs,
        lsm_compact,
        lsm_run_dir,
        lsm_write_run,
        read_manifest,
    )

    root = str(tmp_path / "lsmfm")
    lsm_run_dir(root, mode="file_manifest")
    assert (read_manifest(root) or {}).get("mode") == "file_manifest"
    for b in range(2):
        lsm_write_run(_fm_run_frame(spark, b), root, b)

    def sneak_in_run_2():
        old = index_data_dir(root)
        (
            _fm_run_frame(spark, 2)
            .withColumn("ingest_batch", F.lit(2))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(old)
        )

    lsm_compact(
        spark, root, _fm_fold(),
        _between_carryover_and_flip=sneak_in_run_2,
    )
    man = read_manifest(root)
    assert man["gen"] == 2 and man.get("mode") == "file_manifest"
    # The carried run is referenced IN PLACE: every one of its listed
    # files still lives under gen-1 (no copy into gen-2), and all
    # listed paths exist.
    carried = man["runs"]["2"]
    assert carried and all(p.startswith("gen-1/") for p in carried)
    assert all(os.path.isfile(os.path.join(root, p)) for p in carried)
    assert not os.path.isdir(
        os.path.join(root, "gen-2", "ingest_batch=2")
    ), "fm carry-over must not materialize the run in the new gen"
    assert 2 in lsm_live_runs(root)
    want = sorted((k, (0 + 10 + 20) + 3 * k) for k in range(3))
    assert _fm_drained(spark, root) == want
    # The NEXT compact folds the carried (cross-generation) run too,
    # and GC then sweeps its now-unreferenced source generation.
    lsm_compact(spark, root, _fm_fold())
    assert lsm_live_runs(root) == [-1]
    assert _fm_drained(spark, root) == want
    # One more cycle releases the grace on gen-1.
    lsm_write_run(_fm_run_frame(spark, 5), root, 5)
    lsm_compact(spark, root, _fm_fold())
    assert not os.path.isdir(os.path.join(root, "gen-1"))


def test_lsm_fm_kill_mid_compact_then_retry(spark, tmp_path):
    """Kill-mid-compact pinned in file_manifest mode (the verdict's
    'Done' condition): a crash before the flip leaves the old run set
    current and complete; the retry publishes cleanly."""
    import pytest as _pytest

    from dist_mapreduce_spark.plans.index_commit import (
        lsm_compact,
        lsm_live_runs,
        lsm_run_dir,
        lsm_write_run,
        read_manifest,
    )

    root = str(tmp_path / "lsmfmk")
    lsm_run_dir(root, mode="file_manifest")
    for b in range(3):
        lsm_write_run(_fm_run_frame(spark, b), root, b)
    want = sorted((k, (0 + 10 + 20) + 3 * k) for k in range(3))
    with _pytest.raises(RuntimeError, match="injected crash"):
        lsm_compact(spark, root, _fm_fold(), _fail_before_flip=True)
    assert read_manifest(root)["gen"] == 1, "old manifest must stay current"
    assert sorted(lsm_live_runs(root)) == [0, 1, 2]
    assert _fm_drained(spark, root) == want
    lsm_compact(spark, root, _fm_fold())
    assert lsm_live_runs(root) == [-1]
    assert _fm_drained(spark, root) == want


def test_lsm_fm_republished_run_reads_once(spark, tmp_path):
    """A carried run the sink then REPUBLISHES into the new generation
    (the live-writer recheck path) exists in two physical places —
    the old gen files the manifest lists and the new gen directory.
    The reader must merge exactly ONE copy (directory supersedes
    manifest), or the SUM fold double-counts; and replay ghosts at or
    under the watermark stay dropped."""
    from dist_mapreduce_spark.plans.index_commit import (
        index_data_dir,
        lsm_compact,
        lsm_read,
        lsm_run_dir,
        lsm_write_run,
        read_manifest,
    )

    root = str(tmp_path / "lsmfmd")
    lsm_run_dir(root, mode="file_manifest")
    for b in range(2):
        lsm_write_run(_fm_run_frame(spark, b), root, b)

    def sneak_in_run_2():
        (
            _fm_run_frame(spark, 2)
            .withColumn("ingest_batch", F.lit(2))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(index_data_dir(root))
        )

    lsm_compact(
        spark, root, _fm_fold(),
        _between_carryover_and_flip=sneak_in_run_2,
    )
    assert "2" in read_manifest(root)["runs"]
    # The sink's replay republishes batch 2 wholesale into the NEW
    # generation (what lsm_write_run's recheck does on a raced flip).
    lsm_write_run(_fm_run_frame(spark, 2), root, 2)
    rows = lsm_read(spark, root).filter(F.col("ingest_batch") == 2)
    assert rows.count() == 3, "republished run must be read exactly once"
    want = sorted((k, (0 + 10 + 20) + 3 * k) for k in range(3))
    assert _fm_drained(spark, root) == want
    # Replay ghost: a batch at or under the watermark re-lands (same
    # stream semantics) — readers must keep ignoring it.
    lsm_write_run(_fm_run_frame(spark, 1), root, 1)
    assert _fm_drained(spark, root) == want


def test_lsm_maintain_green_in_file_manifest_mode(spark, monkeypatch):
    """The verdict's 'Done' bar: q_lsm_maintain (the maintenance
    policy over the dedup run store) must produce the SAME verdicts
    with the store committed in file_manifest mode as in the default
    hardlink mode — the commit mode is storage plumbing, never
    semantics."""
    import shutil

    from dist_mapreduce_spark.plans.index_commit import read_manifest
    from dist_mapreduce_spark.plans.llm_pipeline import (
        _dedup_maintain_paths,
        q_lsm_maintain,
    )
    from tests.conftest import SF_SMOKE

    def rows_of(df):
        return sorted(
            (int(r["doc_id"]), r["status"], r["canonical_id"], r["decision"])
            for r in df.collect()
        )

    want = rows_of(q_lsm_maintain(spark, SF_SMOKE))  # hardlink run
    stage, runs = _dedup_maintain_paths(SF_SMOKE)
    for d in (stage, runs):
        shutil.rmtree(d, ignore_errors=True)
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_MODE", "file_manifest")
    got = rows_of(q_lsm_maintain(spark, SF_SMOKE))
    man = read_manifest(runs)
    assert man is not None and man.get("mode") == "file_manifest"
    assert man["gen"] >= 2 and "runs" in man, "the policy compacted in fm mode"
    assert got == want


def test_snapshot_lsm_read_as_of_fm(spark, tmp_path):
    """Pinned reader snapshots hold on file_manifest LSM stores too:
    the pin freezes the run FILE LISTS of pin time, so a compaction
    AND fresh ingest behind the pin stay invisible, even though the
    pinned runs' files span generations."""
    from dist_mapreduce_spark.plans.index_commit import (
        index_snapshot,
        lsm_compact,
        lsm_run_dir,
        lsm_write_run,
    )

    root = str(tmp_path / "lsmfms")
    lsm_run_dir(root, mode="file_manifest")
    for b in range(2):
        lsm_write_run(_fm_run_frame(spark, b), root, b)
    want_pin = sorted((k, 10 + 2 * k) for k in range(3))
    with index_snapshot(root) as pin:
        lsm_compact(spark, root, _fm_fold())
        lsm_write_run(_fm_run_frame(spark, 2), root, 2)
        got = sorted(
            (int(r["k"]), int(r["v"]))
            for r in _fm_fold()(
                pin.lsm_read(spark).drop("ingest_batch")
            ).collect()
        )
        assert got == want_pin, "pinned view must be as-of pin time"
    want_live = sorted((k, 30 + 3 * k) for k in range(3))
    assert _fm_drained(spark, root) == want_live


def test_stream_lsm_maintain_compacts_mid_stream_fm(spark, monkeypatch):
    """The live-stream maintenance composition on a file_manifest
    store: the mid-stream compaction publishes by manifest re-listing
    and later batches land in the new generation via the sink's
    per-batch resolution — drained verdicts stay bit-equal to the
    plain ingest row's, and the store's physical walk matches the
    hardlink twin's (folded base + post-compact run above the
    watermark)."""
    from dist_mapreduce_spark.plans.index_commit import (
        lsm_folded_through,
        lsm_live_runs,
        read_manifest,
    )
    from dist_mapreduce_spark.plans.llm_pipeline import (
        _dedup_live_maint_paths,
        q_stream_dedup_incremental,
        q_stream_lsm_maintain,
    )

    monkeypatch.setenv("SPARK_GRAFT_COMMIT_MODE", "file_manifest")
    got = sorted(
        tuple(r) for r in q_stream_lsm_maintain(spark, SF_SMOKE).collect()
    )
    _stage, _ckpt, runs = _dedup_live_maint_paths(SF_SMOKE)
    man = read_manifest(runs)
    assert man is not None and man.get("mode") == "file_manifest"
    assert lsm_folded_through(runs) == 1, "compaction must fire at batch 1"
    assert lsm_live_runs(runs) == [-1, 2], lsm_live_runs(runs)
    monkeypatch.delenv("SPARK_GRAFT_COMMIT_MODE")
    plain = sorted(
        tuple(r)
        for r in q_stream_dedup_incremental(spark, SF_SMOKE).collect()
    )
    assert got == plain


def test_lsm_run_dir_mode_validation_and_conflict_refusal(
    spark, tmp_path, monkeypatch
):
    """Review fixes (round 15): an unknown mode string raises even on
    an ALREADY-initialized store (it used to be silently ignored once
    the init branch was skipped), and an explicit mode conflicting
    with the recorded one is refused instead of ignored — LSM stores
    migrate by compact-into-a-fresh-root, not silently in place."""
    import pytest as _pytest

    from dist_mapreduce_spark.plans.index_commit import (
        lsm_run_dir,
        lsm_write_run,
    )

    # The ambient env must not leak into the 'hardlink default' init
    # below (the fm gate sweeps export this very variable).
    monkeypatch.delenv("SPARK_GRAFT_COMMIT_MODE", raising=False)
    root = str(tmp_path / "lsmmv")
    lsm_run_dir(root, mode="file_manifest")
    lsm_write_run(_fm_run_frame(spark, 0), root, 0)
    with _pytest.raises(ValueError, match="unknown commit mode"):
        lsm_run_dir(root, mode="file_manifes")  # typo, existing store
    with _pytest.raises(ValueError, match="conflicts"):
        lsm_run_dir(root, mode="hardlink")
    assert lsm_run_dir(root, mode="file_manifest")  # matching: fine
    assert lsm_run_dir(root)  # unspecified: recorded mode, fine
    root2 = str(tmp_path / "lsmmv2")
    lsm_run_dir(root2)  # hardlink default
    with _pytest.raises(ValueError, match="conflicts"):
        lsm_run_dir(root2, mode="file_manifest")
