#!/bin/bash
# Round-5 queue 2: eikonal-stabilized mirror retrain arms.
#
# The first reference-scale mirror200b run (r5_queue.sh train_mirror_b)
# collapsed to an unmarchable near-zero field (max SDF 0.005 — RESULTS.md
# r5); these arms retrain with the full-space eikonal term
# (--space-eikonal 1.0) that restores unit gradients along the marched
# region, then re-run the trained Path-vs-Direct duel.  Waits for
# r5_queue.sh to finish first (single-process TPU discipline).
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"

# wait for queue 1 by pid (recorded at launch in $Q/queue.pid)
if [ -f "$Q/queue.pid" ]; then
  while kill -0 "$(cat "$Q/queue.pid")" 2>/dev/null; do sleep 20; done
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

# Path-trained + full-space eikonal (separate model dir; the collapsed
# checkpoint in models/ stays for forensics)
stage train_mirror_e1 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator path --space-eikonal 1.0 --no-ssim --nan-skip --device-data --clip-norm 10 --models models_eik"
stage duel_e1_d2 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --models models_eik --out-json ../results/duel_mirror200b_eik_d2_hard.json"
stage duel_e1_d1 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --models models_eik --out-json ../results/duel_mirror200b_eik_d1_hard.json"

# Direct-trained control with the same stabilizer (double-count direction)
stage train_mirror_dir_e1 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator direct --space-eikonal 1.0 --no-ssim --nan-skip --device-data --clip-norm 10 --models models_direik"
stage duel_dir_e1_d2 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --models models_direik --out-json ../results/duel_mirror200b_direik_d2_hard.json"
stage duel_dir_e1_d1 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --models models_direik --out-json ../results/duel_mirror200b_direik_d1_hard.json"

# Deferred from queue 1: blocks rig GT regen + hash stacked-gather timing
stage gen_rig256_q2 2400 "python make_mesh_dataset.py --out ../data/mesh_blocks_rig256 --kind blocks --size 256 --up z --elev-range 8 55 --n-lights 3"
stage hash_time_q2 5400 "python nerf_synthetic.py --data ../data/mesh_blocks_rig256 --size 256 --crop-size 80 --n-views 6 --iters 300 --surface hash --surface-lr 5e-3 --device-data --no-ssim --nan-skip --clip-norm 10 --skip-test"

echo "QUEUE2 COMPLETE $(date)" >> "$Q/queue.log"
