#!/bin/bash
# Round-5 queue 4: mirror fog-basin fix arm.
#
# Forensics (r5): the eikonal-only arm (weight 1.0 ~ 3% of the 10-47
# photometric loss) did NOT restore the field — the trained mirror200b
# checkpoints still read max SDF 0.0055 over the whole volume with
# gradient norm ~0.04 (128 near-unit sphere gradients cancelling in the
# smooth-min), i.e. a fog that satisfies the silhouette min-scan while
# the sphere trace stalls.  This arm adds the IGR/SAL off-surface
# repulsion term exp(-100|f|) at the same uniform points (pushes
# free-space |f| up directly) and raises both weights to 5.0 (~15-30%
# of the typical loss), then re-runs the trained Path-vs-Direct duel.
# Waits for r5_queue3.sh (single-process TPU discipline).
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue3.pid" ]; then
  while kill -0 "$(cat "$Q/queue3.pid")" 2>/dev/null; do sleep 20; done
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

stage train_mirror_fog 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator path --space-eikonal 5.0 --space-repulsion 5.0 --no-ssim --nan-skip --device-data --clip-norm 10 --models models_fog"
stage duel_fog_d2 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --models models_fog --out-json ../results/duel_mirror200b_fog_d2_hard.json"
stage duel_fog_d1 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --models models_fog --out-json ../results/duel_mirror200b_fog_d1_hard.json"

echo "QUEUE4 COMPLETE $(date)" >> "$Q/queue.log"
