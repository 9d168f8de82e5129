#!/bin/bash
# ABBA-ordered bench A/B: A = r12 snapshot (.abba_r12), B = current tree.
# Alternating order removes the tree-always-second host-drift bias flagged
# in round 13 (docs/BENCH_VARIANCE.md round-13 closing section).
set -u
OUT=/root/repo/docs/r14/abba_r14.jsonl
: > "$OUT"
run() {  # $1 = label, $2 = dir
  cd "$2"
  line=$(timeout 600 python bench.py 2>/dev/null | tail -1)
  echo "{\"arm\": \"$1\", \"dir\": \"$2\", \"result\": $line}" >> "$OUT"
}
run A /root/repo/.abba_r12
run B /root/repo
run B /root/repo
run A /root/repo/.abba_r12
echo DONE >> "$OUT"
