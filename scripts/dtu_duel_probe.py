"""Mechanism probe for the DTU-duel eval oscillation (round 5).

The toy-scale DTU duel (ref_parity_dtu_jax.py) oscillates between healthy
(~23.5 PSNR) and EXACTLY the masked black baseline (15.91) at adjacent
100-step eval checkpoints.  evaluate() clamps renders to [0, 1], so an
exact-black row means either (a) the march misses everywhere (geometry
receded) or (b) hits exist but the radiance went non-positive across the
whole mask — the LightField's positive-octant direction clamp (reference
lights.py:191 ``clamp(min=1e-6, max=1)``) combined with the UNCLAMPED
Diffuse/NeuralBSDF cosine (reference bsdfs.py:108-118) makes whole-frame
negative radiance reachable when the learned direction field swings.

This script replays the probe run's exact key schedule (seed 0, segments
of 100 steps, ``fold_in(PRNGKey(seed+1), done)`` per segment — the same
stream ref_parity_dtu_jax.py produces with --eval-every 100) to a chosen
step, then measures, per test view:

  * march hit fraction inside the GT mask (distinguishes (a) vs (b)),
  * raw UNCLAMPED radiance stats at the hit pixels,
  * cos(light d, normal) distribution and the fraction of hits whose
    radiance is non-positive in every channel.

    python scripts/dtu_duel_probe.py --data ../data/dtu_gear64 --steps 700
    python scripts/dtu_duel_probe.py --data ../data/dtu_gear64 --steps 800
"""

import argparse
import json
import os

import numpy as np

from _common import chunk_for


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--crop-size", type=int, default=20)
    ap.add_argument("--n-views", type=int, default=2)
    ap.add_argument("--march", type=int, default=64)
    ap.add_argument("--n-bases", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="../results/dtu_duel_probe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dtu import build_scene

    from neural_raytracing_tpu.cameras import DTUCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.ops.math import eikonal_loss
    from neural_raytracing_tpu.render import pathtrace_sample
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, make_optimizer, rand_uv_mask, train,
    )
    from neural_raytracing_tpu.training.datasets import load_dtu

    data = load_dtu(args.data, args.size)
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

    train_integrator = Direct(training=True)
    ex_loss = lambda it, got, exp, mask: eikonal_loss(it.raw_normals)
    done = 0
    while done < args.steps:
        k = min(100, args.steps - done)
        state, _ = train(
            scene, train_integrator, opt, state,
            lambda idxs: make_camera(train_idx[np.asarray(idxs)]),
            data.images[train_idx], data.masks[train_idx],
            jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), done),
            size=args.size, crop_size=args.crop_size, iters=k,
            n_views=args.n_views, uv_select=rand_uv_mask,
            mask_weight=10.0, extra_loss=ex_loss, log_every=100)
        done += k

    eval_integrator = Direct(training=False)
    results = evaluate(
        scene, state.params, lambda i: make_camera([test_idx[i]]),
        data.images[test_idx], eval_integrator, size=args.size,
        chunk_size=chunk_for(args.size), masks=data.masks[test_idx])
    print(f"[probe@{args.steps}] clamped-eval PSNR {results['psnr']:.3f}")

    report = {"steps": args.steps, "clamped_psnr": float(results["psnr"]),
              "views": []}
    for vi, ti in enumerate(test_idx):
        cam = make_camera([ti])
        # full-frame crop render, training=False: raw values + interaction
        vals, active, it = pathtrace_sample(
            scene, eval_integrator, state.params, cam, (0, 0),
            jax.random.PRNGKey(7), crop_size=args.size, size=args.size,
            training=False)
        raw = np.asarray(vals)[0, ..., 0, :3]
        hit = np.asarray(active)[0, ..., 0].astype(bool)
        mask = np.squeeze(np.asarray(data.masks[ti])) > 0.5
        if mask.ndim == 3:
            mask = mask.any(-1)
        # light geometry at the hit points
        ds, spectrum = scene.lights.sample_direction(
            state.params["lights"], it)
        cos = np.asarray(jnp.sum(ds.d * it.n, axis=-1))[0, ..., 0]
        spec = np.asarray(spectrum)[0, ..., 0, :]
        row = {
            "view": int(ti),
            "mask_frac": float(mask.mean()),
            "hit_frac_in_mask": float(hit[mask].mean()) if mask.any() else 0,
            "raw_min": float(raw[hit].min()) if hit.any() else None,
            "raw_max": float(raw[hit].max()) if hit.any() else None,
            "raw_mean": float(raw[hit].mean()) if hit.any() else None,
            "frac_hits_nonpos_all_ch":
                float((raw[hit].max(-1) <= 0).mean()) if hit.any() else None,
            "cos_neg_frac": float((cos[hit] < 0).mean()) if hit.any() else None,
            "cos_mean": float(cos[hit].mean()) if hit.any() else None,
            "spectrum_mean": float(spec[hit].mean()) if hit.any() else None,
        }
        report["views"].append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out = f"{args.out}_{args.steps}.json"
    json.dump(report, open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
