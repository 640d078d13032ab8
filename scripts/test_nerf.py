"""Test-set evaluation + scene EDITING of trained nerf_synthetic models.

Parity with scripts/test_nerf.py in the reference: load the saved
surface/bsdf/light artifacts, optionally compose the SDF with edit warps
(bend / translate / hole / scale; test_nerf.py:59-103), then run the
test-split eval.

    python scripts/test_nerf.py --data nerf_synthetic/lego --edit bend
"""

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image
from nerf_synthetic import build_scene


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--dataset-name", type=str, default=None)
    ap.add_argument("--edit", type=str, default="none",
                    choices=["none", "bend", "trans", "hole", "scale_z",
                             "disp"])
    ap.add_argument("--bend-k", type=float, default=2.5)
    ap.add_argument("--test-max-steps", type=int, default=256)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    from neural_raytracing_tpu import edits
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.shapes import SDF
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

    name = args.dataset_name or args.data.rstrip("/").split("/")[-1]
    test = load_nerf_synthetic(args.data, args.size, "test")

    scene = build_scene(max_steps=args.test_max_steps)
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/{name}", params)

    # compose the loaded SDF with an edit (checkpoints are params-only, so
    # edits are plain function composition over the same module)
    sdf = scene.shape
    if args.edit == "bend":
        sdf = sdf.with_warp(edits.bend(k=args.bend_k))
    elif args.edit == "trans":
        sdf = sdf.with_warp(edits.translate_above(a=0.1))
    elif args.edit == "scale_z":
        sdf = sdf.with_warp(edits.scale_axis(s=0.2))
    elif args.edit == "hole":
        sdf = SDF(edits.EditedModule(sdf.module, edits.add_hole),
                  epsilon=sdf.epsilon, max_steps=sdf.max_steps,
                  dist=sdf.dist, throughput_steps=sdf.throughput_steps)
    elif args.edit == "disp":
        sdf = SDF(edits.EditedModule(sdf.module, edits.displace),
                  epsilon=sdf.epsilon, max_steps=sdf.max_steps,
                  dist=sdf.dist, throughput_steps=sdf.throughput_steps)
    scene = scene.replace(shape=sdf)

    evaluate(
        scene, params,
        lambda i: NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                             focal=test.focal),
        test.images, Direct(training=False), size=args.size,
        chunk_size=chunk_for(args.size),
        save_fn=lambda i, im: save_image(
            f"{args.outputs}/edit_{args.edit}_{name}_{i:03}.png", im))


if __name__ == "__main__":
    main()
