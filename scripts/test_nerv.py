"""NeRV test including multi-light frames.

Parity with scripts/test_nerv.py in the reference: test frames may carry
``light_weights`` over several light positions (test_nerv.py:86-103); the
render runs one pass per light and sums them weighted (:133-149).

    python scripts/test_nerv.py --data nerv/armadillo
"""

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image
from nerv import build_scene


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--dist", type=float, default=2.2)
    ap.add_argument("--shadows", type=str, default="hard",
                    choices=["hard", "learned", "none"])
    ap.set_defaults(size=200)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.ops.math import mse2psnr
    from neural_raytracing_tpu.ops.ssim import ssim as ssim_fn
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_nerv

    name = args.data.rstrip("/").split("/")[-1]
    test = load_nerv(args.data, args.size, "test")
    from _common import eval_bound
    # same eval-scene config as nerv.py's in-script test (incl. the
    # bounded-march eval default): without the bound, toy-scale
    # checkpoints whose field plateaus low render all-miss black here
    # while the in-script eval is healthy (RESULTS.md round 5)
    scene = build_scene(max_steps=128, dist=args.dist,
                        occlusion=args.shadows,
                        march_bound=eval_bound(args))
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/nerv_{name}", params)

    integrator = Direct(training=False)
    l1s, psnrs, gots, exps = [], [], [], []
    for i in range(len(test.images)):
        locs = test.light_locs[i]
        if locs.ndim == 1:
            locs = locs[None]
        weights = (test.light_weights[i] if test.light_weights is not None
                   else np.ones(len(locs)) / len(locs))
        cam = NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                         focal=test.focal)
        acc = None
        # one pass per light position, weighted sum (test_nerv.py:133-149)
        for l, w in zip(locs, np.atleast_1d(weights)):
            params_l = dict(params)
            params_l["lights"] = dict(params_l["lights"],
                                      location=jnp.asarray(l[None]))
            img, _ = nrt.pathtrace(scene, params_l, cam, integrator,
                                   size=args.size,
                                   chunk_size=chunk_for(args.size),
                                   background=0.0,
                                   key=jax.random.PRNGKey(i))
            contrib = float(w) * np.asarray(img)[..., :3]
            acc = contrib if acc is None else acc + contrib
        got = np.clip(acc, 0, 1)
        exp = test.images[i]
        got_tm, exp_tm = got / (1 + got), exp / (1 + exp)
        l2 = float(np.mean((got_tm - exp_tm) ** 2))
        l1s.append(float(np.mean(np.abs(got_tm - exp_tm))))
        psnrs.append(float(mse2psnr(jnp.asarray(l2))))
        gots.append(got_tm)
        exps.append(exp_tm)
        save_image(f"{args.outputs}/test_nerv_{name}_{i:03}.png", got)
        print(f"view {i:3d} L1 {l1s[-1]:.5f} PSNR {psnrs[-1]:.3f}")

    g = jnp.transpose(jnp.asarray(np.stack(gots)), (0, 3, 1, 2))
    e = jnp.transpose(jnp.asarray(np.stack(exps)), (0, 3, 1, 2))
    print(f"avg L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.3f} "
          f"SSIM {float(ssim_fn(g, e)):.4f}")


if __name__ == "__main__":
    main()
