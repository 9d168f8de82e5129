"""Crash-atomic publication for the materialized ANN / dense-RAG
index directories (round-13 verdict item #1).

The batch lifecycle ops (sim_index_delete / _upsert / _compact /
_retrain and their dense twins) previously published by rewriting the
affected ``cell=<id>`` directories in place: staged write, then a
per-cell delete + rename loop. A driver crash between two cell swaps
left a MIXED-generation index — some cells new, some old — that
readers could not detect (no manifest, no epoch, no commit marker).
The streaming side earned exactly-once via replay-idempotent fold
algebras; this module gives the batch side its equivalent: the
Delta/Iceberg commit pattern reduced to its core.

Layout of a committed index root::

    root/
      _MANIFEST.json      # {"gen": N} — the ONE mutable file
      gen-1/              # hive layout, unchanged: cell=0/, cell=7/, ...
      gen-3/

Protocol (commit_cell_swap):

1. build the next generation under a hidden scratch dir
   ``.gen-<N+1>.tmp``: untouched cells are carried over by HARDLINK
   (``os.link`` per parquet file — metadata-only, zero data copy; the
   object-store analogue is an Iceberg manifest re-listing the
   unchanged files), affected cells are moved in from the staged
   rewrite;
2. rename the scratch dir to ``gen-<N+1>`` (still unreferenced —
   readers resolve the manifest, so this is invisible);
3. flip the manifest with write-temp + ``os.replace`` — the ONE
   atomic step; a crash anywhere before it leaves the old generation
   fully intact and fully referenced, a crash after it leaves the new
   one — never a mix (pinned by tests/test_index_commit.py's
   kill-mid-swap test);
4. garbage-collect generations the new manifest no longer references
   (a crash during GC is harmless: the manifest already points at the
   survivor, and the next commit re-sweeps).

Readers call index_data_dir(root) and read the resolved ``gen-N``
directory exactly as they read the flat layout before — same hive
``cell=`` partitioning, same PartitionFilters pruning, one extra path
component. Roots without a manifest resolve to themselves (legacy
flat layout), so mixed deployments keep working.

At 100 TB: the manifest flip is O(1) regardless of index size; the
hardlink carry-over is O(#files) metadata operations (never bytes),
which is what compaction keeps bounded; on an object store the same
protocol writes per-cell file lists into the manifest instead of
hardlinking — the flip stays the single atomic publish either way.
"""

from __future__ import annotations

import json
import os
import shutil

MANIFEST_NAME = "_MANIFEST.json"  # leading "_": ignored by Spark scans


def read_manifest(root: str) -> dict | None:
    """The committed manifest dict, or None when ``root`` has no
    manifest (uninitialized, or a legacy flat-layout index)."""
    try:
        with open(os.path.join(root, MANIFEST_NAME)) as fh:
            man = json.load(fh)
        int(man["gen"])
        return man
    except (OSError, ValueError, KeyError):
        return None


def current_generation(root: str) -> int | None:
    man = read_manifest(root)
    return None if man is None else int(man["gen"])


def index_data_dir(root: str) -> str:
    """Resolve the directory readers should scan: the manifest's
    generation dir, or ``root`` itself for legacy flat layouts."""
    gen = current_generation(root)
    return root if gen is None else os.path.join(root, f"gen-{gen}")


def _flip_manifest(root: str, gen: int, extra: dict | None = None) -> None:
    """THE commit: write-temp + fsync + atomic replace of the one
    manifest file. Everything before this is invisible to readers;
    everything after is cleanup. ``extra`` carries protocol-specific
    fields (the LSM store's folded_through watermark)."""
    man = {"gen": gen}
    if extra:
        man.update(extra)
    tmp = os.path.join(root, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(root, MANIFEST_NAME))


def _gc_generations(root: str, keep: int) -> None:
    """Drop every generation dir (and abandoned scratch) the manifest
    no longer references. Best-effort: a failure here never affects
    correctness — unreferenced dirs are invisible."""
    for d in os.listdir(root):
        full = os.path.join(root, d)
        if d == f"gen-{keep}" or not os.path.isdir(full):
            continue
        if d.startswith("gen-") or d.startswith(".gen-"):
            shutil.rmtree(full, ignore_errors=True)


def write_index_base(df, root: str, partition_cols=("cell",)) -> str:
    """Publish ``df`` as a complete new generation of ``root`` (the
    full build / full retrain path). The Spark write lands in the
    next generation dir, which stays unreferenced until the manifest
    flips — a crash mid-write leaves the previous generation (if any)
    untouched and current. Returns the new data dir."""
    cur = current_generation(root)
    if cur is None:
        # Fresh or legacy root: clear any flat-layout leftovers so the
        # first committed generation starts clean.
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        cur = 0
    new = cur + 1
    gen_dir = os.path.join(root, f"gen-{new}")
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(gen_dir)
    _flip_manifest(root, new)
    _gc_generations(root, keep=new)
    return gen_dir


def _link_tree(src: str, dst: str) -> None:
    """Hardlink-copy a cell directory: metadata-only carry-over of the
    untouched files into the next generation."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s = os.path.join(src, name)
        d = os.path.join(dst, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            os.link(s, d)


def commit_cell_swap(
    root: str,
    stage: str,
    affected_cells,
    _fail_after_moves: int | None = None,
) -> str:
    """Atomically publish a partial rewrite: cells in
    ``affected_cells`` come from ``stage``'s ``cell=<id>`` dirs (a
    cell absent from the stage was emptied by the rewrite and is
    dropped), every other cell is carried over unchanged. Readers see
    the OLD generation in full until the manifest flips, then the NEW
    one in full — never a mix.

    ``_fail_after_moves`` is a crash-injection hook for the
    kill-mid-swap test ONLY: raise after that many staged-cell moves,
    i.e. between two cell swaps — the exact window the old in-place
    protocol corrupted."""
    cur = current_generation(root)
    if cur is None:
        raise ValueError(
            f"commit_cell_swap: {root} has no manifest — publish the"
            " base index with write_index_base first"
        )
    src_dir = os.path.join(root, f"gen-{cur}")
    new = cur + 1
    scratch = os.path.join(root, f".gen-{new}.tmp")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    affected = {f"cell={int(c)}" for c in affected_cells}
    for d in os.listdir(src_dir):
        if d.startswith("cell=") and d not in affected:
            _link_tree(os.path.join(src_dir, d), os.path.join(scratch, d))
    moves = 0
    for c in sorted(int(c) for c in affected_cells):
        s = os.path.join(stage, f"cell={c}")
        if os.path.isdir(s):
            shutil.move(s, os.path.join(scratch, f"cell={c}"))
        moves += 1
        if _fail_after_moves is not None and moves >= _fail_after_moves:
            raise RuntimeError(
                "commit_cell_swap: injected crash between cell swaps"
                " (test hook)"
            )
    os.rename(scratch, os.path.join(root, f"gen-{new}"))
    _flip_manifest(root, new)
    _gc_generations(root, keep=new)
    shutil.rmtree(stage, ignore_errors=True)
    return os.path.join(root, f"gen-{new}")


# ------------------------- LSM run-store compaction (round 13, item #3)
#
# The streamed merge-on-read artifacts (stream_dedup_incremental's
# per-batch fingerprint runs, stream_sketch_cms's partial-counter
# runs) accumulate one ``ingest_batch=<id>`` run directory per
# micro-batch forever; merge-on-read cost degrades linearly in batches
# ingested. This section is the promised maintenance pass
# (llm_pipeline's docstring), built on the SAME manifest commit:
#
# - the store root carries the manifest; the streaming sink writes its
#   dynamic-overwrite runs into the CURRENT generation dir
#   (lsm_run_dir);
# - compaction folds every live run into ONE base run (written as
#   ``ingest_batch=-1`` in the NEXT generation) and flips the manifest
#   with a ``folded_through`` watermark = the highest batch id folded;
# - readers (lsm_read) take the base plus runs ABOVE the watermark.
#   That watermark is what keeps ingest-after-compact idempotent for
#   NON-idempotent folds (CMS counters SUM): a crashed micro-batch
#   replayed after its run was folded rewrites ``ingest_batch=b`` with
#   b <= folded_through, which readers ignore — the rows are already
#   in the base, and counting them twice is exactly the bug the
#   watermark exists to prevent.
#
# A crash anywhere inside lsm_compact leaves the old manifest current:
# the new generation dir is unreferenced until the flip (the
# commit_cell_swap guarantee, applied to run folding).

#: The base run's ingest_batch id. Micro-batch ids are >= 0, so -1 can
#: never collide with a live run.
LSM_BASE_BATCH = -1


def lsm_run_dir(root: str) -> str:
    """Resolve (initializing on first use) the directory a streaming
    sink writes its ``ingest_batch=<id>`` runs into — the current
    generation of the manifest-rooted store."""
    if current_generation(root) is None:
        gen_dir = os.path.join(root, "gen-1")
        os.makedirs(gen_dir, exist_ok=True)
        _flip_manifest(root, 1, {"folded_through": None})
    return index_data_dir(root)


def lsm_folded_through(root: str) -> int | None:
    man = read_manifest(root) or {}
    ft = man.get("folded_through")
    return None if ft is None else int(ft)


def lsm_read(spark, root: str):
    """The merge-on-read view: base run + every run ABOVE the
    folded_through watermark. Runs at or below the watermark are
    replayed ghosts — their content is already inside the base."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(index_data_dir(root))
    ft = lsm_folded_through(root)
    if ft is not None:
        df = df.filter(
            (F.col("ingest_batch") == LSM_BASE_BATCH)
            | (F.col("ingest_batch") > ft)
        )
    return df


def lsm_live_runs(root: str) -> list[int]:
    """Run ids a reader currently merges (directory listing only)."""
    ft = lsm_folded_through(root)
    data = index_data_dir(root)
    out = []
    for d in os.listdir(data):
        if d.startswith("ingest_batch="):
            b = int(d.split("=", 1)[1])
            if b == LSM_BASE_BATCH or ft is None or b > ft:
                out.append(b)
    return sorted(out)


def lsm_compact(
    spark, root: str, fold, _fail_before_flip: bool = False
) -> int | None:
    """Fold every live run into ONE base run published as the next
    generation (atomic manifest flip; old generation intact until
    then, GC'd after). ``fold`` maps the merged run frame (without
    ingest_batch) to the folded frame with the same columns — min for
    fingerprint indexes, sum for CMS counters. Returns the new
    folded_through watermark. ``_fail_before_flip`` is the
    crash-injection hook for the kill-mid-compact test."""
    from pyspark.sql import functions as F

    cur = current_generation(root)
    if cur is None:
        raise ValueError(f"lsm_compact: {root} has no manifest")
    live = lsm_read(spark, root)
    real = [b for b in lsm_live_runs(root) if b != LSM_BASE_BATCH]
    new_ft = max(real) if real else lsm_folded_through(root)
    base = fold(live.drop("ingest_batch")).withColumn(
        "ingest_batch", F.lit(LSM_BASE_BATCH)
    )
    new = cur + 1
    gen_dir = os.path.join(root, f"gen-{new}")
    base.write.mode("overwrite").partitionBy("ingest_batch").parquet(gen_dir)
    if _fail_before_flip:
        raise RuntimeError(
            "lsm_compact: injected crash before the manifest flip"
            " (test hook)"
        )
    _flip_manifest(root, new, {"folded_through": new_ft})
    _gc_generations(root, keep=new)
    return new_ft
