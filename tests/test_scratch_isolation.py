"""Per-process scratch isolation (round-11 verdict item #4): two
processes running the same sink/index query must never share a
directory — reproduced in round 10 as a sink_compact
TASK_WRITE_FAILED when pytest and the gate overlapped. The
process-level proof lives in the round log (two concurrent gate runs,
both green); these pin the path contract and the stale-root pruning."""

from __future__ import annotations

import os
import shutil


def test_scratch_root_is_pid_keyed():
    from dist_mapreduce_spark.scratch import scratch_root

    root = scratch_root()
    assert root.endswith(f"run_{os.getpid()}")
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
    live = os.path.join(base, f"run_{os.getpid()}")
    os.makedirs(live, exist_ok=True)
    sc._PRUNED = False
    try:
        sc.scratch_root()
        assert not os.path.isdir(dead)
        assert os.path.isdir(live)
    finally:
        shutil.rmtree(dead, ignore_errors=True)
