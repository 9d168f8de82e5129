"""Per-process scratch root (round-11 verdict item #4).

Every sink, index build, and streaming stage used to write under one
shared ``.scratch/`` — so a gate sweep and a pytest run executing the
same query concurrently raced on identical directories (reproduced:
``sink_compact`` TASK_WRITE_FAILED on ``.scratch/compact_fragmented``
when pytest and the full gate overlapped). Keying the root by PID
gives every process its own namespace; within a process the paths are
stable, so the per-process memoizations (built-index registries,
trained-quantizer cache) keep working unchanged.

Stale roots from dead processes are pruned opportunistically on first
use — liveness is checked via os.kill(pid, 0), so a crashed run's
directory is reclaimed by the next one instead of accumulating.
"""

from __future__ import annotations

import os
import shutil

_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
)

_PRUNED = False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return False
    return True


def _prune_stale() -> None:
    global _PRUNED
    if _PRUNED:
        return
    _PRUNED = True
    try:
        entries = os.listdir(_BASE)
    except OSError:
        return
    for name in entries:
        if not name.startswith("run_"):
            continue
        try:
            pid = int(name[4:])
        except ValueError:
            continue
        if pid != os.getpid() and not _pid_alive(pid):
            shutil.rmtree(os.path.join(_BASE, name), ignore_errors=True)


def scratch_root() -> str:
    """This process's private scratch directory (created on demand)."""
    _prune_stale()
    root = os.path.join(_BASE, f"run_{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    return root
