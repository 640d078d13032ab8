"""Scene editing on trained DTU models: SDF warps + BSDF swaps.

Parity with scripts/edit_dtu.py in the reference: bend/displacement warps
over the loaded SDF (:85-100), BSDF recolor/swap experiments (:119-141),
light postprocessing hooks, re-render via the DTU eval path (:147-153).

    python scripts/edit_dtu.py --data DTU/scan97 --edit bend
"""

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image
from dtu import build_scene


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--edit", type=str, default="bend",
                    choices=["none", "bend", "disp"])
    ap.add_argument("--bend-k", type=float, default=-10.0)
    ap.add_argument("--recolor", type=int, default=-1,
                    help="swap basis i for a flat diffuse color")
    ap.add_argument("--views", type=int, default=4)
    ap.set_defaults(size=128)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu import edits
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import DTUCamera
    from neural_raytracing_tpu.integrators import Debug, Direct
    from neural_raytracing_tpu.shapes import SDF
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_dtu

    name = args.data.rstrip("/").split("/")[-1]
    data = load_dtu(args.data, args.size)
    src = np.asarray(data.src_size, np.float32)

    scene = build_scene(max_steps=128)
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/dtu_{name}", params)

    sdf = scene.shape
    if args.edit == "bend":
        sdf = sdf.with_warp(edits.bend(k=args.bend_k, axis=2))
    elif args.edit == "disp":
        sdf = SDF(edits.EditedModule(sdf.module, edits.displace),
                  epsilon=sdf.epsilon, max_steps=sdf.max_steps,
                  dist=sdf.dist, throughput_steps=sdf.throughput_steps)
    scene = scene.replace(shape=sdf)

    if args.recolor >= 0:
        # swap one learned basis for a flat diffuse lobe (edit_dtu.py:119-141)
        bases = list(scene.bsdf.bsdfs)
        bparams = list(params["bsdf"]["bsdfs"])
        flat = Diffuse((1.0, 0.3, 0.1))
        bases[args.recolor] = flat
        bparams[args.recolor] = flat.init(jax.random.PRNGKey(0))
        from neural_raytracing_tpu.bsdf import ComposeSpatialVarying
        scene = scene.replace(bsdf=ComposeSpatialVarying(
            bases, sp_var_fn=scene.bsdf.sp_var_fn))
        params = dict(params)
        params["bsdf"] = dict(params["bsdf"], bsdfs=tuple(bparams))

    def cam(i):
        return DTUCamera(pose=data.poses[i:i + 1],
                         intrinsic=data.intrinsics[i:i + 1], src_size=src)

    for i in range(min(args.views, len(data.images))):
        for integ, tag in ((Direct(training=False), "render"),
                           (Debug(), "normals")):
            img, _ = nrt.pathtrace(scene, params, cam(i), integ,
                                   size=args.size, chunk_size=args.size,
                                   background=0.0,
                                   key=jax.random.PRNGKey(i))
            save_image(
                f"{args.outputs}/edit_dtu_{name}_{args.edit}_{tag}_{i}.png",
                img)


if __name__ == "__main__":
    main()
