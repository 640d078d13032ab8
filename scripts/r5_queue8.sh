#!/bin/bash
# Round-5 queue 8 (CPU, after the TPU queue drains — the 1-CPU VM must
# never run heavy CPU work concurrently with TPU training, CLAUDE.md):
#  (a) the full-shape 8-way dryrun (VERDICT r4 weak #5: the automated
#      driver only compiles crop 24; this runs the flagship crop-80
#      program once per round),
#  (b) the full pytest suite at HEAD,
#  (c) a bench.py sanity run on the then-idle host.
set -u
cd /root/repo
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue7.pid" ]; then
  while kill -0 "$(cat "$Q/queue7.pid")" 2>/dev/null; do sleep 30; done
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

stage dryrun_crop80 5400 "NRT_DRYRUN_CROP=80 python -c 'import __graft_entry__ as g; g.dryrun_multichip(8); print(\"CROP80 DRYRUN OK\")'"
stage pytest_head 2400 "python -m pytest tests/ -q"
stage bench_sanity 1200 "python bench.py"

echo "QUEUE8 COMPLETE $(date)" >> "$Q/queue.log"
