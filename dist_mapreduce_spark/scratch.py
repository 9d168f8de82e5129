"""Per-process scratch root (round-11 verdict item #4, hardened in
round 12 against PID recycling).

Every sink, index build, and streaming stage used to write under one
shared ``.scratch/`` — so a gate sweep and a pytest run executing the
same query concurrently raced on identical directories (reproduced:
``sink_compact`` TASK_WRITE_FAILED on ``.scratch/compact_fragmented``
when pytest and the full gate overlapped). Keying the root by PID
gives every process its own namespace; within a process the paths are
stable, so the per-process memoizations (built-index registries,
trained-quantizer cache) keep working unchanged.

Round 12: the directory name carries the owning process's BOOT TOKEN
(its start time from ``/proc/<pid>/stat`` field 22) in addition to the
PID. Liveness via ``os.kill(pid, 0)`` alone is wrong under PID
recycling: a dead run's directory whose PID was reissued to any
unrelated live process looked alive forever (never pruned), and a new
framework process that happened to receive a recycled PID INHERITED
the stale directory's contents. With the token, a recycled-PID
directory is recognized as stale (the token never matches the new
process's start time) and pruned, and two processes can never alias
the same root — (pid, starttime) is unique for the machine's uptime.

Stale roots from dead processes are pruned opportunistically on first
use, so a crashed run's directory is reclaimed by the next one instead
of accumulating.
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


def _start_token(pid: int) -> str | None:
    """The process's start time (clock ticks since boot — field 22 of
    /proc/<pid>/stat), the kernel's own disambiguator for recycled
    PIDs. None where /proc is unavailable (non-Linux) — the caller
    falls back to PID-only naming and liveness-only pruning there."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            data = f.read()
    except OSError:
        return None
    try:
        # comm (field 2) may contain spaces and parens; everything
        # after the LAST ')' is fields 3+, so starttime is index 19.
        rest = data.rsplit(b")", 1)[1].split()
        return rest[19].decode("ascii")
    except (IndexError, UnicodeDecodeError):
        return None


def _is_stale(name: str) -> bool:
    """True for a run_* directory whose owning process is provably
    gone: PID dead, or PID alive but with a DIFFERENT start token
    (i.e. the PID was recycled by an unrelated process)."""
    parts = name.split("_")
    try:
        pid = int(parts[1])
    except (IndexError, ValueError):
        return False
    if pid == os.getpid() and len(parts) < 3:
        return False  # legacy own-pid dir (token unavailable)
    if not _pid_alive(pid):
        return True
    if len(parts) >= 3:
        tok = _start_token(pid)
        # Token readable and different → the PID belongs to a NEW
        # process; the directory's owner is dead. Unreadable token
        # (race: process exited between kill(0) and the read) → leave
        # it for the next sweep.
        return tok is not None and tok != parts[2]
    return False


def _prune_stale() -> None:
    global _PRUNED
    if _PRUNED:
        return
    _PRUNED = True
    try:
        entries = os.listdir(_BASE)
    except OSError:
        return
    own = os.path.basename(scratch_name())
    for name in entries:
        if not name.startswith("run_") or name == own:
            continue
        if _is_stale(name):
            shutil.rmtree(os.path.join(_BASE, name), ignore_errors=True)


def scratch_name() -> str:
    """This process's scratch directory basename: run_<pid>_<boot
    token> (run_<pid> where /proc is unavailable)."""
    pid = os.getpid()
    tok = _start_token(pid)
    return f"run_{pid}_{tok}" if tok else f"run_{pid}"


def scratch_root() -> str:
    """This process's private scratch directory (created on demand)."""
    _prune_stale()
    root = os.path.join(_BASE, scratch_name())
    os.makedirs(root, exist_ok=True)
    return root
