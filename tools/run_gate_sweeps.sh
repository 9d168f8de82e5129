#!/bin/bash
# One wave of full-registry gate sweeps: $1 = assignment mode
# (literal|gemm). Runs the three scale factors CONCURRENTLY — safe
# since round-12's per-(pid,boot-token) scratch isolation; timings in
# the logs are informational only.
set -u
MODE=$1
OUT=${2:-/root/repo/docs/r15/gate}
cd /root/repo
pids=()
for SF in sf0.01 sf0.1 sf0.001; do
  SPARK_GRAFT_ASSIGN=$MODE SPARK_GRAFT_CPUS=16 \
    python tools/check_correctness.py /root/testdata/$SF \
    > "$OUT/${MODE}_${SF}.log" 2>"$OUT/${MODE}_${SF}.err" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=1; done
echo "wave $MODE done rc=$rc" >> "$OUT/waves.log"
