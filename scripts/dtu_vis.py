"""Visualize a trained DTU model: per-basis sphere renders, weight maps,
normal maps, and Direct renders.

Parity with scripts/dtu_vis.py in the reference (:100-157).

    python scripts/dtu_vis.py --data DTU/scan97
"""

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image
from dtu import build_scene


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--views", type=int, default=4)
    ap.set_defaults(size=128)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import DTUCamera
    from neural_raytracing_tpu.integrators import BasisBRDF, Debug, Direct
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_dtu
    from neural_raytracing_tpu.utils import sphere_examples

    name = args.data.rstrip("/").split("/")[-1]
    data = load_dtu(args.data, args.size)
    src = np.asarray(data.src_size, np.float32)

    scene = build_scene(max_steps=128)
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/dtu_{name}", params)

    # per-basis sphere renders (utils.sphere_examples)
    for b, img in enumerate(sphere_examples(scene.bsdf, params["bsdf"],
                                            size=args.size)):
        save_image(f"{args.outputs}/dtu_{name}_sphere_basis_{b}.png", img)

    def cam(i):
        return DTUCamera(pose=data.poses[i:i + 1],
                         intrinsic=data.intrinsics[i:i + 1], src_size=src)

    for i in range(min(args.views, len(data.images))):
        weights, _ = nrt.pathtrace(scene, params, cam(i),
                                   BasisBRDF(scene.bsdf), size=args.size,
                                   chunk_size=args.size, background=0.0,
                                   key=jax.random.PRNGKey(i))
        for b in range(weights.shape[-1]):
            save_image(f"{args.outputs}/dtu_{name}_w{b}_view{i}.png",
                       weights[..., b:b + 1])
        normals, _ = nrt.pathtrace(scene, params, cam(i), Debug(),
                                   size=args.size, chunk_size=args.size,
                                   background=0.0, key=jax.random.PRNGKey(i))
        save_image(f"{args.outputs}/dtu_{name}_normals_{i}.png", normals)
        render, _ = nrt.pathtrace(scene, params, cam(i),
                                  Direct(training=False), size=args.size,
                                  chunk_size=args.size, background=0.0,
                                  key=jax.random.PRNGKey(i))
        save_image(f"{args.outputs}/dtu_{name}_render_{i}.png", render)


if __name__ == "__main__":
    main()
