"""Self-contained synthetic workload: fit an SDF scene to rendered GT.

No external dataset needed — ground truth is rendered from an analytic
sphere scene (the reference's ``pathtrace_labels`` pattern,
training_utils.py:35-51).  Useful as a smoke/demo run of the full
training stack: SDF sphere trace + BSDF + point light + Direct +
masked loss + eikonal.

    python scripts/fit_sphere.py --size 64 --iters 500 --cpu
"""

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image


def main():
    ap = base_parser(__doc__)
    ap.set_defaults(size=64, iters=1000, crop_size=32, n_views=3)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import Diffuse
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct, Mask
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.shapes import SDF, Sphere, SphereSDF
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, make_optimizer, save_scene, train,
    )

    size = args.size

    # ground truth scene + views
    gt = nrt.Scene(shape=Sphere((0.0, 0.0, 0.0), 0.7),
                   bsdf=Diffuse((0.8, 0.3, 0.2)),
                   lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))
    gtp = gt.init(jax.random.PRNGKey(0))
    n_data = 16
    r, t = look_at_view_transform(
        dist=2.0, elev=np.tile(np.linspace(0, 40, 4), 4),
        azim=np.repeat(np.linspace(-60, 60, 4), 4))
    cams = FoVPerspectiveCamera(R=r, T=t)
    print("rendering ground truth ...")
    img, _ = nrt.pathtrace(gt, gtp, cams, Mask(Direct(training=False)),
                           size=size, chunk_size=min(size, 64),
                           bundle_size=1, background=0.0,
                           key=jax.random.PRNGKey(1), squeeze_first=False)
    imgs, masks = np.asarray(img[..., :3]), np.asarray(img[..., 3])
    save_image(f"{args.outputs}/fit_sphere_gt.png", imgs[0])

    # learnable scene
    scene = nrt.Scene(
        shape=SDF(SphereSDF(n=32), max_steps=32, throughput_steps=64,
                  dist=4.0),
        bsdf=Diffuse((0.5, 0.5, 0.5)),
        lights=PointLights(location=(0.0, 1.0, 4.0), scale=50.0))
    opt = make_optimizer({"shape": 1e-3, "bsdf": 5e-3, "lights": 0.0})
    state = init_train_state(scene, opt, jax.random.PRNGKey(args.seed))

    def make_camera(idxs):
        return FoVPerspectiveCamera(R=cams.R[np.asarray(idxs)],
                                    T=cams.T[np.asarray(idxs)])

    state, losses = train(
        scene, Direct(training=True), opt, state, make_camera, imgs, masks,
        jax.random.PRNGKey(args.seed + 1), size=size,
        crop_size=args.crop_size, iters=args.iters, n_views=args.n_views,
        log_every=args.log_every)

    save_scene(f"{args.models}/fit_sphere", state.params, step=args.iters)

    if not args.skip_test:
        metrics = evaluate(
            scene, state.params,
            lambda i: make_camera([i]), imgs[:4], Direct(training=False),
            size=size, chunk_size=min(size, 64),
            save_fn=lambda i, im: save_image(
                f"{args.outputs}/fit_sphere_test_{i}.png", im))
        print("final:", metrics)


if __name__ == "__main__":
    main()
