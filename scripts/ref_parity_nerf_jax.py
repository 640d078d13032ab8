"""Quality-parity check, OUR side: exact config twin of ref_parity_nerf.py.

Same GT, same architecture (SphereSDF n / 8xNeuralBSDF(softplus) spatially-
varying mixture / LightField), same protocol (train_nerf semantics: mask-
centered crops, masked L1+L2+RMSE-logSSIM + mask BCE @15 + eikonal, AdamW
per-component LRs 8e-5/8e-4/8e-5 wd=0), same march budgets, same metric
protocol (per-view L1/L2/PSNR on clamped renders + one batched SSIM).

    python scripts/ref_parity_nerf_jax.py --data ../data/mesh_blocks_par64 \
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
    ap.add_argument("--march", type=int, default=32)
    ap.add_argument("--test-march", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outputs", type=str, default="outputs/ref_parity")
    ap.add_argument("--tag", type=str, default="jax")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="run the full test protocol every N train iters "
                         "(rows -> results/ref_parity/convergence_{tag}"
                         ".jsonl), mirroring ref_parity_nerf.py's "
                         "convergence curve")
    args = ap.parse_args()
    os.makedirs(args.outputs, exist_ok=True)
    os.makedirs("../results/ref_parity", exist_ok=True)

    import jax
    from nerf_synthetic import build_scene

    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.ops.math import eikonal_loss
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, make_optimizer, rand_uv_mask, train,
    )
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

    data = load_nerf_synthetic(args.data, args.size, "train")
    scene = build_scene(max_steps=args.march)
    opt = make_optimizer({"shape": 8e-5, "bsdf": 8e-4, "lights": 8e-5})
    state = init_train_state(scene, opt, jax.random.PRNGKey(args.seed))
    c2ws = data.cam_to_worlds

    def make_camera(idxs):
        return NeRFCamera(cam_to_world=c2ws[np.asarray(idxs)],
                          focal=data.focal)

    curve_path = fresh_path(
        f"../results/ref_parity/curve_{args.tag}.jsonl")
    conv_path = f"../results/ref_parity/convergence_{args.tag}.jsonl"
    metrics: list = []

    test = load_nerf_synthetic(args.data, args.size, "test")
    test_scene = build_scene(max_steps=args.test_march)
    eval_integrator = Direct(training=False)

    def run_test(save_images=False):
        return evaluate(
            test_scene, state.params,
            lambda i: NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                                 focal=test.focal),
            test.images, eval_integrator,
            size=args.size, chunk_size=chunk_for(args.size),
            save_fn=(lambda i, im: save_image(
                f"{args.outputs}/test_{args.tag}_{i:03}.png", im))
            if save_images else None)

    train_integrator = Direct(training=True)
    ex_loss = lambda it, got, exp, mask: eikonal_loss(it.raw_normals)
    train_wall = 0.0
    seg = args.eval_every if args.eval_every else args.iters
    done = 0
    while done < args.iters:
        n = min(seg, args.iters - done)
        seg_metrics: list = []
        t0 = time.time()
        state, _ = train(
            scene, train_integrator, opt, state, make_camera,
            data.images, data.masks,
            jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), done),
            size=args.size, crop_size=args.crop_size, iters=n,
            n_views=args.n_views, uv_select=rand_uv_mask,
            extra_loss=ex_loss, metrics=seg_metrics, log_every=100)
        train_wall += time.time() - t0
        # train() labels metrics with the global step (base = state.step
        # at entry), so segment rows are already absolute
        metrics.extend(seg_metrics)
        done += n
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
        "config": {"size": args.size, "crop": args.crop_size,
                   "n_views": args.n_views, "iters": args.iters,
                   "march": args.march, "test_march": args.test_march,
                   "sphere_n": 128, "seed": args.seed, "data": args.data},
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
