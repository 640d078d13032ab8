"""DTU-protocol quality duel, OUR side: config twin of ref_parity_dtu.py.

Same GT, same architecture (SphereSDF n=128 / 6 x NeuralBSDF(softplus)
spatially-varying mixture / LightField), same protocol (train_dtu
semantics, training_utils.py:347-434: mask-centered crops, masked loss at
mask_weight=10 + eikonal, AdamW 8e-5 everywhere wd=0, march 64 train AND
test), same data transform (pose decomposition + unit-sphere distance
normalization, dtu.py:70-89), same masked test_dtu metric protocol
(training_utils.py:436-485: exp AND got masked, per-view L1/L2/PSNR,
one batched SSIM).

    python scripts/ref_parity_dtu_jax.py --data ../data/dtu_gear64 \
        --iters 2000
"""

import argparse
import json
import os
import time

import numpy as np

from _common import chunk_for, fresh_path, save_image


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--crop-size", type=int, default=20)
    ap.add_argument("--n-views", type=int, default=2)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--march", type=int, default=64)
    ap.add_argument("--n-bases", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outputs", type=str, default="outputs/ref_parity")
    ap.add_argument("--tag", type=str, default="dtu_jax")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="full masked test protocol every N train iters "
                         "(rows -> results/ref_parity/convergence_{tag}"
                         ".jsonl), mirroring ref_parity_dtu.py")
    args = ap.parse_args()
    os.makedirs(args.outputs, exist_ok=True)
    os.makedirs("../results/ref_parity", exist_ok=True)

    import jax
    from dtu import build_scene

    from neural_raytracing_tpu.cameras import DTUCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.ops.math import eikonal_loss
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, make_optimizer, rand_uv_mask, train,
    )
    from neural_raytracing_tpu.training.datasets import load_dtu

    data = load_dtu(args.data, args.size)   # normalize_dist=True: dtu.py:87-89
    n = len(data.images)
    test_idx = np.arange(0, n, 10)
    train_idx = np.asarray([i for i in range(n) if i not in set(test_idx)])
    src = np.asarray(data.src_size, np.float32)

    scene = build_scene(max_steps=args.march, n_bases=args.n_bases)
    opt = make_optimizer({"shape": 8e-5, "bsdf": 8e-5, "lights": 8e-5})
    state = init_train_state(scene, opt, jax.random.PRNGKey(args.seed))

    def make_camera(idxs):
        idxs = np.asarray(idxs)
        return DTUCamera(pose=data.poses[idxs],
                         intrinsic=data.intrinsics[idxs], src_size=src)

    curve_path = fresh_path(
        f"../results/ref_parity/curve_{args.tag}.jsonl")
    conv_path = f"../results/ref_parity/convergence_{args.tag}.jsonl"
    metrics: list = []

    # test march stays at the train budget — test_dtu never bumps
    # max_steps (training_utils.py:436-460), unlike test_nerf
    eval_integrator = Direct(training=False)

    def run_test(save_images=False):
        return evaluate(
            scene, state.params,
            lambda i: make_camera([test_idx[i]]),
            data.images[test_idx], eval_integrator,
            size=args.size, chunk_size=chunk_for(args.size),
            masks=data.masks[test_idx],
            save_fn=(lambda i, im: save_image(
                f"{args.outputs}/test_{args.tag}_{i:03}.png", im))
            if save_images else None)

    train_integrator = Direct(training=True)
    ex_loss = lambda it, got, exp, mask: eikonal_loss(it.raw_normals)
    train_wall = 0.0
    seg = args.eval_every if args.eval_every else args.iters
    done = 0
    while done < args.iters:
        k = min(seg, args.iters - done)
        seg_metrics: list = []
        t0 = time.time()
        state, _ = train(
            scene, train_integrator, opt, state,
            lambda idxs: make_camera(train_idx[np.asarray(idxs)]),
            data.images[train_idx], data.masks[train_idx],
            jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), done),
            size=args.size, crop_size=args.crop_size, iters=k,
            n_views=args.n_views, uv_select=rand_uv_mask,
            mask_weight=10.0,            # train_dtu, training_utils.py:404
            extra_loss=ex_loss, metrics=seg_metrics, log_every=100)
        train_wall += time.time() - t0
        metrics.extend(seg_metrics)      # already global-step labeled
        done += k
        if args.eval_every:
            results = run_test(save_images=done >= args.iters)
            row = {"after_step": done, "avg_psnr": results["psnr"],
                   "ssim": results["ssim"], "avg_l1": results["l1"],
                   "avg_l2": results["l2"], "train_wall_s": train_wall}
            with open(conv_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[eval@{done}] PSNR {results['psnr']:.3f} "
                  f"SSIM {results['ssim']:.4f}", flush=True)
    with open(curve_path, "w") as f:
        for m in metrics:
            f.write(json.dumps(m) + "\n")

    if not args.eval_every:
        results = run_test(save_images=True)

    result = {
        "impl": "neural_raytracing_tpu",
        "protocol": "dtu",
        "config": {"size": args.size, "crop": args.crop_size,
                   "n_views": args.n_views, "iters": args.iters,
                   "march": args.march, "sphere_n": 128,
                   "n_bases": args.n_bases, "seed": args.seed,
                   "data": args.data},
        "train_wall_s": train_wall,
        "rays_per_sec": (args.iters * args.n_views * args.crop_size ** 2
                         / max(train_wall, 1e-9)),
        "avg_l1": results["l1"], "avg_l2": results["l2"],
        "avg_psnr": results["psnr"], "ssim": results["ssim"],
    }
    out = fresh_path(f"../results/ref_parity/{args.tag}.json")
    json.dump(result, open(out, "w"), indent=1)
    print(json.dumps(result, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
