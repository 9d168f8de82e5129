"""Per-process scratch isolation (round-11 verdict item #4): two
processes running the same sink/index query must never share a
directory — reproduced in round 10 as a sink_compact
TASK_WRITE_FAILED when pytest and the gate overlapped. The
process-level proof lives in the round log (two concurrent gate runs,
both green); these pin the path contract and the stale-root pruning —
including the round-12 PID-recycling hardening (the directory name
carries the owner's /proc start token, so a dead run's directory
whose PID was reissued to a live process is still recognized as
stale instead of being inherited)."""

from __future__ import annotations

import os
import shutil


def test_scratch_root_is_pid_and_boot_token_keyed():
    from dist_mapreduce_spark.scratch import _start_token, scratch_root

    root = scratch_root()
    base = os.path.basename(root)
    assert base.startswith(f"run_{os.getpid()}")
    tok = _start_token(os.getpid())
    if tok is not None:  # Linux: the token must be embedded
        assert base == f"run_{os.getpid()}_{tok}"
    assert os.path.isdir(root)


def test_sink_and_index_dirs_live_under_process_root():
    from dist_mapreduce_spark.plans.ann_index import _index_dir
    from dist_mapreduce_spark.plans.formats import _sink_dir
    from dist_mapreduce_spark.scratch import scratch_root

    root = scratch_root()
    assert _sink_dir("x").startswith(root + os.sep)
    assert _index_dir("ivf_index", "/root/testdata/sf0.001").startswith(
        root + os.sep
    )


def test_stale_roots_pruned_live_roots_kept():
    import dist_mapreduce_spark.scratch as sc

    base = sc._BASE
    os.makedirs(base, exist_ok=True)
    # A PID that cannot exist (> kernel pid_max default ceiling).
    dead = os.path.join(base, "run_99999999")
    os.makedirs(dead, exist_ok=True)
    live = os.path.join(base, sc.scratch_name())
    os.makedirs(live, exist_ok=True)
    sc._PRUNED = False
    try:
        sc.scratch_root()
        assert not os.path.isdir(dead)
        assert os.path.isdir(live)
    finally:
        shutil.rmtree(dead, ignore_errors=True)


def test_recycled_pid_root_pruned():
    """A directory naming a LIVE pid but a WRONG boot token belongs to
    a dead process whose PID was recycled — it must be pruned, not
    treated as alive (and never inherited by the live process, whose
    own root carries the matching token)."""
    import dist_mapreduce_spark.scratch as sc

    if sc._start_token(os.getpid()) is None:
        return  # no /proc: token discipline unavailable on this OS
    base = sc._BASE
    os.makedirs(base, exist_ok=True)
    recycled = os.path.join(base, f"run_{os.getpid()}_0")
    os.makedirs(recycled, exist_ok=True)
    own = os.path.join(base, sc.scratch_name())
    os.makedirs(own, exist_ok=True)
    sc._PRUNED = False
    try:
        root = sc.scratch_root()
        assert not os.path.isdir(recycled)
        assert os.path.isdir(own)
        assert root == own  # the live process serves from its own dir
    finally:
        shutil.rmtree(recycled, ignore_errors=True)
