"""Visualization of trained nerf_synthetic models.

Parity with scripts/visualize.py in the reference: 9x9 orbit-view renders,
per-basis BasisBRDF weight maps, per-basis sphere renders, normal maps,
and parameter counts (visualize.py:41-57).

    python scripts/visualize.py --data nerf_synthetic/lego
"""

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image
from nerf_synthetic import build_scene


def count_parameters(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--dataset-name", type=str, default=None)
    ap.add_argument("--n-orbit", type=int, default=9)
    ap.set_defaults(size=128)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import BasisBRDF, Debug, Direct
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic
    from neural_raytracing_tpu.utils import sphere_examples

    name = args.dataset_name or args.data.rstrip("/").split("/")[-1]
    data = load_nerf_synthetic(args.data, args.size, "test")

    scene = build_scene(max_steps=128)
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/{name}", params)

    for comp in ("shape", "bsdf", "lights"):
        print(f"{comp} params: {count_parameters(params.get(comp, {})):,}")

    def cam(i):
        return NeRFCamera(cam_to_world=data.cam_to_worlds[i:i + 1],
                          focal=data.focal)

    n = min(args.n_orbit * args.n_orbit, len(data.images))
    for i in range(0, n, max(n // 9, 1)):
        img, _ = nrt.pathtrace(scene, params, cam(i), Direct(training=False),
                               size=args.size, chunk_size=args.size,
                               background=0.0, key=jax.random.PRNGKey(i))
        save_image(f"{args.outputs}/vis_{name}_orbit_{i:03}.png", img)
        normals, _ = nrt.pathtrace(scene, params, cam(i), Debug(),
                                   size=args.size, chunk_size=args.size,
                                   background=0.0, key=jax.random.PRNGKey(i))
        save_image(f"{args.outputs}/vis_{name}_normals_{i:03}.png", normals)

    # per-basis weight maps
    weights, _ = nrt.pathtrace(scene, params, cam(0), BasisBRDF(scene.bsdf),
                               size=args.size, chunk_size=args.size,
                               background=0.0, key=jax.random.PRNGKey(0))
    for b in range(weights.shape[-1]):
        save_image(f"{args.outputs}/vis_{name}_basis_{b}.png",
                   weights[..., b:b + 1])

    # per-basis sphere renders
    for b, img in enumerate(sphere_examples(scene.bsdf, params["bsdf"],
                                            size=args.size)):
        save_image(f"{args.outputs}/vis_{name}_sphere_basis_{b}.png", img)


if __name__ == "__main__":
    main()
