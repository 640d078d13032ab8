"""Path-traced NeRV relighting evaluation (secondary bounces).

Parity with scripts/path_nerv.py in the reference: load a trained NeRV
scene, render the test views with the multi-bounce ``Path`` integrator
(hard shadows), averaging ``--samples`` independent stochastic passes per
view (path_nerv.py:92-104 uses 32).

    python scripts/path_nerv.py --data nerv/armadillo --samples 32
"""

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image
from nerv import build_scene


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--dist", type=float, default=2.2)
    ap.add_argument("--shadows", type=str, default="hard",
                    choices=["hard", "learned", "none"],
                    help="occlusion for the eval scene.  'hard' is the "
                         "reference path_nerv parity default; 'learned' "
                         "uses the model's own trained occ MLP — required "
                         "on fields whose plate-like geometry self-blocks "
                         "the marched shadow test (the mirror-plate GT: "
                         "hard-shadow evals render exact black there while "
                         "learned-occ evals are healthy, RESULTS.md r5)")
    ap.add_argument("--out-json", type=str, default=None,
                    help="optional JSON dump of per-view metrics")
    ap.add_argument("--stable-min", action="store_true",
                    help="build the eval scene with the logsumexp "
                         "smooth-min — REQUIRED when evaluating a model "
                         "trained with nerv.py --stable-min (the min op is "
                         "part of the field, not the checkpoint)")
    ap.set_defaults(size=200, iters=0)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Path
    from neural_raytracing_tpu.ops.math import mse2psnr
    from neural_raytracing_tpu.training import init_train_state, load_scene, \
        make_optimizer
    from neural_raytracing_tpu.training.datasets import load_nerv

    name = args.data.rstrip("/").split("/")[-1]
    test = load_nerv(args.data, args.size, "test")
    from _common import eval_bound
    # match nerv.py's in-script eval scene (bounded-march eval default);
    # see RESULTS.md round 5 on toy checkpoints rendering black without it
    scene = build_scene(max_steps=128, dist=args.dist,
                        occlusion=args.shadows,
                        stable_min=args.stable_min,
                        march_bound=eval_bound(args))
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/nerv_{name}", params)

    integrator = Path(max_depth=args.max_depth, training=False)
    l1s, l2s, psnrs = [], [], []
    for i in range(len(test.images)):
        params_i = dict(params)
        params_i["lights"] = dict(
            params_i["lights"], location=jnp.asarray(test.light_locs[i:i + 1]))
        cam = NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                         focal=test.focal)
        acc = None
        for s in range(args.samples):
            img, _ = nrt.pathtrace(
                scene, params_i, cam, integrator, size=args.size,
                chunk_size=chunk_for(args.size), bundle_size=1,
                background=0.0, key=jax.random.PRNGKey(1000 * i + s))
            acc = img if acc is None else acc + img
        got = np.clip(np.asarray(acc) / args.samples, 0, 1)[..., :3]
        exp = test.images[i]
        l2 = float(np.mean((got - exp) ** 2))
        l1s.append(float(np.mean(np.abs(got - exp))))
        l2s.append(l2)
        psnrs.append(float(mse2psnr(jnp.asarray(l2))))
        save_image(f"{args.outputs}/path_nerv_{name}_d{args.max_depth}"
                   f"_{i:03}.png", got)
        print(f"view {i:3d} L1 {l1s[-1]:.5f} PSNR {psnrs[-1]:.3f}")
    print(f"avg L1 {np.mean(l1s):.5f} L2 {np.mean(l2s):.6f} "
          f"PSNR {np.mean(psnrs):.3f}")
    if args.out_json:
        import json
        json.dump({"data": args.data, "samples": args.samples,
                   "max_depth": args.max_depth, "shadows": args.shadows,
                   "avg_l1": float(np.mean(l1s)),
                   "avg_psnr": float(np.mean(psnrs)),
                   "per_view_psnr": psnrs},
                  open(args.out_json, "w"), indent=1)


if __name__ == "__main__":
    main()
