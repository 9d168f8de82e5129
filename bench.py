"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once with a cheap action that still runs the full
plan (count of the result). Timing includes plan + execution, not
session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — word-count core, partitioning,
# relational (joins/windows/rollup), events windows, LLM-pipeline ops,
# plus the four canonical TPC-H shapes (scan-agg, selective-join top-k,
# pure-scan predicate, semi-join + having).
HEADLINE = [
    "tokenize",
    "filter_regex",
    "partition_hash",
    "join_inner",
    "join_broadcast",
    "window_topk",
    "rollup_agg",
    "agg_window_tumbling",
    "dedup_exact",
    "dedup_minhash",
    "dedup_cluster",
    "sim_topk_bruteforce",
    "text_stats",
    "sample_temperature",
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q18",
]


def _run_ab_snapshot(ref: str) -> dict | None:
    """A/B control (round-9 verdict item #8, standing practice): bench
    the UNMODIFIED snapshot `git archive <ref>` as a subprocess on the
    SAME host state, so a round-over-round delta can be attributed to
    code vs host regime (the box's whole-host regime moves ±25% within
    a day — docs/BENCH_VARIANCE.md). Returns the snapshot's parsed
    JSON result, or None if the snapshot could not be benched."""
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    tmp = tempfile.mkdtemp(prefix="bench_ab_")
    try:
        tar = subprocess.run(
            ["git", "archive", ref],
            cwd=repo,
            capture_output=True,
            check=True,
        )
        subprocess.run(
            ["tar", "-x", "-C", tmp], input=tar.stdout, check=True
        )
        out = subprocess.run(
            [sys.executable, os.path.join(tmp, "bench.py")],
            cwd=tmp,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                parsed = json.loads(line)
                parsed["ref"] = ref
                return parsed
        print(f"# ab: no JSON from snapshot {ref}", file=sys.stderr)
        return None
    except Exception as exc:  # noqa: BLE001 - control is best-effort
        print(f"# ab snapshot {ref} failed: {exc}", file=sys.stderr)
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


#: The stress-scale headline subset (round-10 verdict item #8): the
#: queries whose 20× behavior each round records in
#: docs/BENCH_VARIANCE.md — two TPC-H join shapes, the two heaviest
#: dedup rows, and dense index-pruned serving (listed twice: the first
#: run pays the index build, the second is serve-only off the
#: memoized index).
STRESS20 = [
    "tpch_q3",
    "tpch_q18",
    "dedup_minhash",
    "dedup_cluster",
    "search_dense_maxp_pruned",
    "search_dense_maxp_pruned",
]


def _run_stress20() -> list | None:
    """`bench.py --stress20`: run the stress subset at 20× of the
    bench corpus (SPARK_GRAFT_SF_DIR, the same env var every other
    bench path honors; default sf0.1) through tools/stress.py (its
    replication + timing protocol) and return [(label, rows, sec),
    ...] in run order."""
    import re
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cmd = [
        sys.executable,
        os.path.join(repo, "tools", "stress.py"),
        "20",
        base,
        *STRESS20,
    ]
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, cwd=repo
        ).stdout
    except Exception as exc:  # noqa: BLE001
        print(f"# stress20 failed: {exc}", file=sys.stderr)
        return None
    rows = re.findall(r"^x20\s+(\S+)\s+(\d+) rows\s+([\d.]+)s", out, re.M)
    seen: dict[str, int] = {}
    labeled = []
    for name, n, sec in rows:
        k = seen.get(name, 0)
        seen[name] = k + 1
        label = f"{name}:serve_only" if k else name
        labeled.append((label, int(n), float(sec)))
    return labeled


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--stress20" in sys.argv:
        rows = _run_stress20() or []
        for label, n, sec in rows:
            print(f"# x20 {label}: {n} rows in {sec}s", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "stress20",
                    "unit": "sec",
                    "value": round(sum(s for _l, _n, s in rows), 3),
                    "queries": {l: s for l, _n, s in rows},
                }
            )
        )
        return
    ab_ref = None
    if "--ab" in sys.argv:
        i = sys.argv.index("--ab")
        if i + 1 < len(sys.argv):
            ab_ref = sys.argv[i + 1]
    # Snapshot FIRST, then the working tree, on the same host minutes —
    # the same-session control that settled round 9's regime question.
    ab = _run_ab_snapshot(ab_ref) if ab_ref else None
    import __spark_entry__ as e
    from dist_mapreduce_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm the session outside timing: JVM JIT, the whole-stage-codegen
    # compiler, shuffle machinery, parquet reader. Each headline PLAN
    # SHAPE is executed once on the sf0.001 tables — 1/100th of the
    # benchmarked scale, so no benchmarked DATA is pre-read — which
    # populates the codegen class cache (generated code is identical
    # across scale factors; only scan metadata differs). Profiling
    # showed cold-compile dominates small-SF timings (dedup_exact:
    # 6.6 s cold vs 0.57 s warm at sf0.1); on a long-running cluster —
    # the 100 TB posture — compilation is a session property, not a
    # query property, so the bench measures warm execution.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).count()
        except Exception as exc:  # pragma: no cover - warmup is best-effort
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    # Best-of-2 per query: single-shot timings at this scale are
    # dominated by one-off effects (page-cache state, GC pauses, AQE
    # stat collection on first materialization) — round-2 showed 3-7×
    # single-run swings on UNCHANGED plans. The min of two runs is the
    # steady-state number a long-running cluster sees.
    timings: dict[str, float] = {}
    for name in names:
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            best = min(best, round(time.time() - t0, 3))
        timings[name] = best
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if ab is not None:
        # Same one-line contract; the control rides inside the object.
        result["ab"] = {
            "ref": ab.get("ref"),
            "value": ab.get("value"),
            "queries": ab.get("queries"),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
