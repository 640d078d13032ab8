#!/bin/bash
# Round-5 queue 6: geometry-seeded mirror arm (the reference's own
# hard-scene practice — its DTU scripts resume from PRETRAINED
# checkpoints, reference scripts/dtu.py:98-109 — translated to this
# stack: seed_shape.py fits the SphereSDF to the known GT geometry,
# then nerv.py trains materials/lights/geometry from the seed).
# This sidesteps the fog basin that from-scratch + volumetric
# regularizers could not escape (RESULTS.md r5), and re-runs the
# trained Path-vs-Direct duel on the first marchable mirror model.
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue5.pid" ]; then
  while kill -0 "$(cat "$Q/queue5.pid")" 2>/dev/null; do sleep 20; done
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

stage seed_fit 1800 "python seed_shape.py --kind gear --mirror-plate 0.7 --models models_seed --name nerv_mesh_gear_mirror200b"
stage train_mirror_seed 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator path --load --calibrate-exposure --space-eikonal 1.0 --no-ssim --nan-skip --device-data --clip-norm 10 --models models_seed"
stage duel_seed_d2 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --models models_seed --out-json ../results/duel_mirror200b_seed_d2_hard.json"
stage duel_seed_d1 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --models models_seed --out-json ../results/duel_mirror200b_seed_d1_hard.json"

echo "QUEUE6 COMPLETE $(date)" >> "$Q/queue.log"
