"""NeRV visualization: basis sphere renders, weight maps, normal maps.

Parity with scripts/nerv_vis.py in the reference.

    python scripts/nerv_vis.py --data nerv/armadillo
"""

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image
from nerv import build_scene


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--dist", type=float, default=2.2)
    ap.add_argument("--views", type=int, default=4)
    ap.set_defaults(size=128)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import (
        BasisBRDF, Debug, Depth, Silhouette,
    )
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_nerv
    from neural_raytracing_tpu.utils import depth_image, sphere_examples

    name = args.data.rstrip("/").split("/")[-1]
    data = load_nerv(args.data, args.size, "train")
    scene = build_scene(max_steps=128, dist=args.dist)
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/nerv_{name}", params)

    for b, img in enumerate(sphere_examples(scene.bsdf, params["bsdf"],
                                            size=args.size)):
        save_image(f"{args.outputs}/nerv_{name}_sphere_basis_{b}.png", img)

    def cam(i):
        return NeRFCamera(cam_to_world=data.cam_to_worlds[i:i + 1],
                          focal=data.focal)

    for i in range(min(args.views, len(data.images))):
        weights, _ = nrt.pathtrace(scene, params, cam(i),
                                   BasisBRDF(scene.bsdf), size=args.size,
                                   chunk_size=args.size, background=0.0,
                                   key=jax.random.PRNGKey(i))
        for b in range(weights.shape[-1]):
            save_image(f"{args.outputs}/nerv_{name}_w{b}_view{i}.png",
                       weights[..., b:b + 1])
        for integ, tag in ((Debug(), "normals"), (Silhouette(), "sil")):
            img, _ = nrt.pathtrace(scene, params, cam(i), integ,
                                   size=args.size, chunk_size=args.size,
                                   background=0.0,
                                   key=jax.random.PRNGKey(i))
            save_image(f"{args.outputs}/nerv_{name}_{tag}_{i}.png", img)


if __name__ == "__main__":
    main()
