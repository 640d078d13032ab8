#!/bin/bash
# Round-5 queue 5: retry the eikonal-arm error-budget probe (queue 3's
# run died on a transient TPU FailedPrecondition during a host transfer)
# and run the isolated hash-gather microbench on the real chip.
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue4.pid" ]; then
  while kill -0 "$(cat "$Q/queue4.pid")" 2>/dev/null; do sleep 20; done
fi

stage() {
  local name=$1 tmo=$2 cmd=$3
  if [ -f "$Q/$name.done" ]; then echo "skip $name (done)"; return 0; fi
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$Q/queue.log"
  timeout "$tmo" bash -c "$cmd" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%H:%M:%S) ===" >> "$Q/queue.log"
  if [ $rc -eq 0 ]; then touch "$Q/$name.done"; fi
  return 0
}

stage budget_nerv5_eik_retry 3600 "python nerv_error_budget.py --data ../data/mesh_gear_nerv5 --models models_eik5 --out-json ../results/nerv_error_budget_eik.json"
stage hash_gather_bench 3600 "python bench_hash_gather.py"

echo "QUEUE5 COMPLETE $(date)" >> "$Q/queue.log"
