#!/bin/bash
# Round-5 queue 7:
#  (a) Direct-trained geometry-seeded mirror arm — the clean trained
#      Path-vs-Direct comparison on a MARCHABLE model (queue 6's Path
#      arm reached 25.2 dB; the eik-arm +4.1 dB gap was measured on
#      below-black models).  Identical deterministic seed fit + flags;
#      ONLY --train-integrator differs.
#  (b) Second-rig self-shadowing ablation (VERDICT r4 weak #4): blocks
#      mesh under the NeRV protocol, then the occ {none,learned,hard}
#      ablation harness.
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"
if [ -f "$Q/queue6.pid" ]; then
  while kill -0 "$(cat "$Q/queue6.pid")" 2>/dev/null; do sleep 20; done
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

stage seed_fit_dir 1800 "python seed_shape.py --kind gear --mirror-plate 0.7 --models models_seed_dir --name nerv_mesh_gear_mirror200b"
stage train_mirror_seed_dir 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator direct --load --calibrate-exposure --space-eikonal 1.0 --no-ssim --nan-skip --device-data --clip-norm 10 --models models_seed_dir"
stage duel_seed_dir_d2 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --models models_seed_dir --out-json ../results/duel_mirror200b_seeddir_d2_hard.json"
stage duel_seed_dir_d1 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --models models_seed_dir --out-json ../results/duel_mirror200b_seeddir_d1_hard.json"

stage gen_blocks_nerv 1800 "python make_mesh_dataset.py --out ../data/mesh_blocks_nerv --kind blocks --format nerv --size 200 --up z --elev-range 8 55 --light-noise 0.35"
stage train_blocks_nerv 10800 "python nerv.py --data ../data/mesh_blocks_nerv --size 200 --iters 25000 --no-ssim --nan-skip --device-data --clip-norm 10"
stage occ_ablation_blocks 7200 "python nerv_occ_ablation.py --data ../data/mesh_blocks_nerv --model models/nerv_mesh_blocks_nerv && cp outputs/nerv_occ_ablation.json ../results/nerv_blocks_occ_ablation.json && cp outputs/nerv_occ_ablation_strip.png ../results/nerv_blocks_occ_ablation_strip.png"

echo "QUEUE7 COMPLETE $(date)" >> "$Q/queue.log"
