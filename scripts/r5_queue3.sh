#!/bin/bash
# Round-5 queue 3: error-budget fix arm — retrain the nerv5 gear model
# with the full-space eikonal term and re-run the budget probe, measuring
# whether better field regularity (normals) buys back specular error
# (the #1 term: 62.8% of tone-mapped MSE, median normal error 34.5 deg).
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue2.pid" ]; then
  while kill -0 "$(cat "$Q/queue2.pid")" 2>/dev/null; do sleep 20; done
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

stage train_nerv5_eik 10800 "python nerv.py --data ../data/mesh_gear_nerv5 --size 200 --iters 25000 --space-eikonal 1.0 --no-ssim --nan-skip --device-data --clip-norm 10 --models models_eik5"
stage budget_nerv5_eik 3600 "python nerv_error_budget.py --data ../data/mesh_gear_nerv5 --models models_eik5 --out-json ../results/nerv_error_budget_eik.json"

echo "QUEUE3 COMPLETE $(date)" >> "$Q/queue.log"
