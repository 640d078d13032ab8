#!/bin/bash
# Round-5 queue 9 (TPU, after queue 8's CPU stages drain): the hash
# gather microbench with the fwd-only / fwd+bwd split — separates
# "TPU gather is slow" from "the scatter-add table-gradient backward
# is slow" at the flagship shape, so the documented HashSDF next-lever
# points at the right op.
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue8.pid" ]; then
  while kill -0 "$(cat "$Q/queue8.pid")" 2>/dev/null; do sleep 30; done
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

stage hash_gather_split 1800 "python bench_hash_gather.py --reps 5"

echo "QUEUE9 COMPLETE $(date)" >> "$Q/queue.log"
