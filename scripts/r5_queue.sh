#!/bin/bash
# Round-5 carry-over queue (VERDICT r4 #4 trained Path-vs-Direct duel,
# #5 NeRV error budget, hash stacked-gather TPU re-measure).
#
# Serialized single-process TPU queue: the 1-CPU VM + axon tunnel wedge
# under CPU contention (CLAUDE.md), so stages never overlap.  Each stage
# is timeout-bounded, logs to /tmp/r5q/<stage>.log, and drops a .done
# marker so a dead session can relaunch this script and skip finished
# stages.  Run:  nohup bash r5_queue.sh > /tmp/r5q/queue.out 2>&1 &
set -u
cd /root/repo/scripts
Q=/tmp/r5q
mkdir -p "$Q"

stage() {
  local name=$1 tmo=$2 cmd=$3
  if [ -f "$Q/$name.done" ]; then echo "skip $name (done)"; return 0; fi
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$Q/queue.log"
  timeout "$tmo" bash -c "$cmd" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%H:%M:%S) ===" >> "$Q/queue.log"
  if [ $rc -eq 0 ]; then touch "$Q/$name.done"; fi
  return 0  # keep the queue moving; failures are analyzed from logs
}

# 1. NeRV gear GT for the error budget (Direct GT, 1 bounce, hard occ,
#    auto-calibrated light scale; same healthy-rig recipe as r4 nerv3).
stage gen_nerv5 1800 "python make_mesh_dataset.py --out ../data/mesh_gear_nerv5 --kind gear --format nerv --size 200 --up z --elev-range 8 55 --light-noise 0.35"

# 2. Analytic Path-vs-Direct gate on the regenerated mirror GT
#    (cam-dist 2.0, plate 0.7 — the first mirror200 GT had cameras
#    touching the plate).
stage path_demo_b 3600 "python path_demo.py --data ../data/mesh_gear_mirror200b --out-json ../results/path_demo200b.json"

# 3. Reference-scale Path-TRAINED model on the mirror GT (transport-
#    consistent training; Direct-trained models double-count under a
#    Path eval — r5 toy measurement).  --dist 3.4 covers cam 2.0 +
#    scene extent 1.02; --no-ssim per the dark-GT rule.
stage train_mirror_b 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator path --no-ssim --nan-skip --device-data --clip-norm 10"

# 4. Trained duel: same harness, only --max-depth differs (Path depth 1
#    == Direct's emitter arm).  Hard + learned shadow arms (the plate
#    can self-block the marched shadow test).
stage duel_d2_hard 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --out-json ../results/duel_mirror200b_d2_hard.json"
stage duel_d1_hard 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --out-json ../results/duel_mirror200b_d1_hard.json"
stage duel_d2_learned 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows learned --out-json ../results/duel_mirror200b_d2_learned.json"
stage duel_d1_learned 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows learned --out-json ../results/duel_mirror200b_d1_learned.json"

# 5. NeRV gear retrain for the error budget (VERDICT r4 #5).
stage train_nerv5 10800 "python nerv.py --data ../data/mesh_gear_nerv5 --size 200 --iters 25000 --no-ssim --nan-skip --device-data --clip-norm 10"

# 6. Ranked error budget on the retrained model.
stage budget_nerv5 3600 "python nerv_error_budget.py --data ../data/mesh_gear_nerv5 --out-json ../results/nerv_error_budget.json"

# 7. Direct-trained mirror control (separate model dir): quantifies the
#    double-count direction at reference scale.
stage train_mirror_b_direct 10800 "python nerv.py --data ../data/mesh_gear_mirror200b --size 200 --iters 25000 --dist 3.4 --train-integrator direct --no-ssim --nan-skip --device-data --clip-norm 10 --models models_dirtrain"
stage duel_dir_d2_hard 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 2 --shadows hard --models models_dirtrain --out-json ../results/duel_mirror200b_dirtrain_d2_hard.json"
stage duel_dir_d1_hard 3600 "python path_nerv.py --data ../data/mesh_gear_mirror200b --dist 3.4 --samples 32 --max-depth 1 --shadows hard --models models_dirtrain --out-json ../results/duel_mirror200b_dirtrain_d1_hard.json"

# 8. Blocks rig GT regen (died with the old VM) + hash stacked-gather
#    TPU re-measure (commit 6fb9965, unmeasured on TPU; prior 1.62 s/step).
stage gen_rig256 2400 "python make_mesh_dataset.py --out ../data/mesh_blocks_rig256 --kind blocks --size 256 --up z --elev-range 8 55 --n-lights 3"
stage hash_time 5400 "python nerf_synthetic.py --data ../data/mesh_blocks_rig256 --size 256 --crop-size 80 --n-views 6 --iters 300 --surface hash --surface-lr 5e-3 --device-data --no-ssim --nan-skip --clip-norm 10 --skip-test"

echo "QUEUE COMPLETE $(date)" >> "$Q/queue.log"
