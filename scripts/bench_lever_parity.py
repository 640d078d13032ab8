"""Training-semantics check for the march-geometry levers (VERDICT r3 #2).

A perf lever (march_bound / omega / stable_min) may only become a train
default if training is unchanged where it matters.  This runs N short
training segments from the same init/seed/data — baseline vs lever — and
reports:

  * per-step loss overlay (max |Δloss| and relative drift)
  * final-params distance per component subtree
  * hit-mask agreement + depth deltas of the marched interaction on a
    held-out probe batch

stable_min is EXPECTED to differ (it changes the far-field value of the
sdf — a deliberate beyond-reference option); march_bound/omega claim
near-parity on scenes inside the bound.

    python scripts/bench_lever_parity.py --steps 300 \
        --lever march_bound --value 1.2
"""

import argparse
import json
import os

import numpy as np

from _common import enable_compile_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lever", type=str, required=True,
                    choices=["march_bound", "omega", "stable_min",
                             "half_res"])
    ap.add_argument("--value", type=float, default=1.2)
    ap.add_argument("--data", type=str, default="../data/mesh_blocks_rig256")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--crop-size", type=int, default=64)
    ap.add_argument("--n-views", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, NeuralBSDF
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import LightField
    from neural_raytracing_tpu.ops.math import eikonal_loss
    from neural_raytracing_tpu.shapes import SDF, SphereSDF
    from neural_raytracing_tpu.training import (
        init_train_state, make_optimizer, train,
    )
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

    def build(lever=None):
        kw = {}
        sphere_kw = {}
        if lever == "march_bound":
            kw["march_bound"] = args.value
        elif lever == "omega":
            kw["omega"] = args.value
        elif lever == "stable_min":
            sphere_kw["stable_min"] = True
        elif lever == "half_res":
            kw["throughput_mode"] = "half_res"
        return nrt.Scene(
            shape=SDF(SphereSDF(n=128, **sphere_kw), max_steps=32,
                      throughput_steps=64, **kw),
            bsdf=ComposeSpatialVarying(
                [NeuralBSDF(activation="softplus") for _ in range(8)]),
            lights=LightField())

    data = load_nerf_synthetic(args.data, args.size, "train")
    c2ws = data.cam_to_worlds

    def make_camera(idxs):
        return NeRFCamera(cam_to_world=c2ws[np.asarray(idxs)],
                          focal=data.focal)

    results = {}
    states = {}
    for tag, lever in (("baseline", None), ("lever", args.lever)):
        scene = build(lever)
        opt = make_optimizer({"shape": 8e-5, "bsdf": 8e-4, "lights": 8e-5})
        state = init_train_state(scene, opt, jax.random.PRNGKey(0))
        metrics: list = []
        state, _ = train(
            scene, Direct(training=True), opt, state, make_camera,
            data.images, data.masks, jax.random.PRNGKey(1),
            size=args.size, crop_size=args.crop_size, iters=args.steps,
            n_views=args.n_views, log_every=100,
            extra_loss=lambda it, g, e, m: eikonal_loss(it.raw_normals),
            metrics=metrics)
        results[tag] = [m["loss"] for m in metrics if "loss" in m]
        states[tag] = state

    a = np.asarray(results["baseline"], np.float64)
    b = np.asarray(results["lever"], np.float64)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    # losses are stochastic-crop noisy; compare the trajectories
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-6)
    tail = slice(max(0, n - 50), n)
    out = {
        "lever": args.lever, "value": args.value, "steps": args.steps,
        "max_rel_step_diff": float(rel.max()),
        "mean_rel_step_diff": float(rel.mean()),
        "tail_mean_baseline": float(a[tail].mean()),
        "tail_mean_lever": float(b[tail].mean()),
    }

    # params distance per subtree
    pa, pb = states["baseline"].params, states["lever"].params
    for k in pa:
        la = jax.tree_util.tree_leaves(pa[k])
        lb = jax.tree_util.tree_leaves(pb[k])
        num = float(sum(jnp.sum((x - y) ** 2) for x, y in zip(la, lb)))
        den = float(sum(jnp.sum(x ** 2) for x in la))
        out[f"param_rel_dist_{k}"] = float(np.sqrt(num / max(den, 1e-12)))

    # probe-batch intersection agreement at the FINAL baseline params
    scene_a, scene_b = build(None), build(args.lever)
    key = jax.random.PRNGKey(7)
    r_o = jax.random.normal(key, (4096, 3)) * 0.1
    r_o = r_o.at[:, 2].add(2.0)
    r_d = -jax.random.normal(jax.random.fold_in(key, 1), (4096, 3)) * 0.2
    r_d = r_d.at[:, 2].add(-1.0)
    r_d = r_d / jnp.linalg.norm(r_d, axis=-1, keepdims=True)
    rays = jnp.concatenate([r_o, r_d], -1)
    sp = states["baseline"].params["shape"]
    it_a, hit_a = scene_a.shape.intersect(sp, rays, primary=False)
    it_b, hit_b = scene_b.shape.intersect(sp, rays, primary=False)
    agree = float(jnp.mean((hit_a == hit_b).astype(jnp.float32)))
    both = np.asarray(hit_a & hit_b)
    dt = np.abs(np.asarray(it_a.t) - np.asarray(it_b.t))[both]
    out["hit_agreement"] = agree
    out["hit_depth_max_abs_diff"] = float(dt.max()) if dt.size else 0.0
    print(json.dumps(out, indent=1))
    os.makedirs("outputs", exist_ok=True)
    json.dump(out, open(
        f"outputs/lever_parity_{args.lever}.json", "w"), indent=1)


if __name__ == "__main__":
    main()
