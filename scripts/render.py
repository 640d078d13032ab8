"""Standalone renderer: load trained artifacts and render orbit frames.

Serving-style utility (no reference equivalent): renders an elev/azim
orbit of a trained scene with any integrator, optionally sharding rays
over all local devices.

    python scripts/render.py --models models/lego --workload nerf \
        --frames 16 --size 256
"""

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--workload", type=str, default="nerf",
                    choices=["nerf", "colocate", "dtu", "nerv"],
                    help="which workload's scene config to rebuild")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--dist", type=float, default=1.0)
    ap.add_argument("--elev", type=float, default=20.0)
    ap.add_argument("--integrator", type=str, default="direct",
                    choices=["direct", "debug", "depth", "silhouette",
                             "path"])
    ap.add_argument("--max-steps", type=int, default=128)
    ap.add_argument("--omega", type=float, default=1.0,
                    help="sphere-trace overrelaxation (1.0 = off; ~1.4 "
                         "converges in fewer march iterations)")
    ap.set_defaults(size=128, iters=0)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import (
        Debug, Depth, Direct, Path, Silhouette,
    )
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )

    if args.workload == "nerf":
        from nerf_synthetic import build_scene
        scene = build_scene(max_steps=args.max_steps)
    elif args.workload == "colocate":
        from colocate import build_scene
        scene = build_scene(max_steps=args.max_steps)
    elif args.workload == "dtu":
        from dtu import build_scene
        scene = build_scene(max_steps=args.max_steps)
    else:
        from nerv import build_scene
        scene = build_scene(max_steps=args.max_steps)

    if args.omega != 1.0:
        scene.shape.omega = args.omega

    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(args.models, params)

    integrator = {"direct": Direct(training=False), "debug": Debug(),
                  "depth": Depth(scale=True), "silhouette": Silhouette(),
                  "path": Path(training=False)}[args.integrator]

    for f in range(args.frames):
        azim = -180.0 + 360.0 * f / args.frames
        r, t = look_at_view_transform(dist=args.dist, elev=args.elev,
                                      azim=azim)
        cam = FoVPerspectiveCamera(R=r, T=t)
        p = params
        if args.workload in ("colocate", "nerv"):
            loc = np.asarray(cam.camera_center()) * 1.05
            p = dict(params)
            p["lights"] = dict(p["lights"], location=jnp.asarray(loc))
        img, _ = nrt.pathtrace(scene, p, cam, integrator, size=args.size,
                               chunk_size=chunk_for(args.size),
                               background=0.0, key=jax.random.PRNGKey(f))
        save_image(f"{args.outputs}/orbit_{args.workload}_{f:03}.png", img)
        print(f"frame {f + 1}/{args.frames}")


if __name__ == "__main__":
    main()
