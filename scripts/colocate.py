"""Colocated camera+light reconstruction (own mitsuba dataset).

Parity with scripts/colocate.py in the reference: 8x8 elev/azim view grid at
dist=1; SDF surface + ComposeSpatialVarying([NeuralBSDF x 2, Diffuse,
Conductor]); learnable PointLights(scale=5) moved to 1.05x the camera
center every step (colocate.py:109); learned-occlusion emitter sampling
(occ MLP in_size=5); then hard-shadow test + relight grid eval.

    python scripts/colocate.py --data mitsuba_scenes/cbox_relight/outputs \
        --kind bunny --size 200
"""

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image


def build_scene(max_steps=64):
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import (
        ComposeSpatialVarying, Conductor, Diffuse, NeuralBSDF,
    )
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.shapes import SDF, SphereSDF

    return nrt.Scene(
        shape=SDF(SphereSDF(n=128), max_steps=max_steps,
                  throughput_steps=128, dist=2.2),
        bsdf=ComposeSpatialVarying([
            NeuralBSDF(activation="softplus"),
            NeuralBSDF(activation="softplus"),
            Diffuse(),
            Conductor(),
        ]),
        lights=PointLights(scale=5.0),
        occlusion="learned")


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--kind", type=str, default="bunny",
                    choices=["bunny", "buddha", "teapot", "armadillo"])
    ap.add_argument("--n-elev", type=int, default=8)
    ap.add_argument("--n-azim", type=int, default=8)
    ap.add_argument("--surface-lr", type=float, default=8e-5)
    ap.add_argument("--bsdf-lr", type=float, default=8e-4)
    ap.add_argument("--light-lr", type=float, default=8e-5)
    ap.set_defaults(size=200, crop_size=64, n_views=4)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, load_scene, make_optimizer, save_scene,
        train,
    )
    from neural_raytracing_tpu.training.datasets import load_colocate

    data = load_colocate(args.data, args.kind, args.size,
                         n_elev=args.n_elev, n_azim=args.n_azim)
    r, t = look_at_view_transform(dist=data.dist, elev=data.elevs,
                                  azim=data.azims)
    cams = FoVPerspectiveCamera(R=r, T=t)
    centers = np.asarray(cams.camera_center())

    scene = build_scene()
    opt = make_optimizer({"shape": args.surface_lr, "bsdf": args.bsdf_lr,
                          "lights": args.light_lr, "occ": args.bsdf_lr},
                         clip_norm=args.clip_norm)
    state = init_train_state(scene, opt, jax.random.PRNGKey(args.seed))
    model_dir = f"{args.models}/colocate_{args.kind}"
    if args.load:
        state = state._replace(params=load_scene(model_dir, state.params))

    def make_camera(idxs):
        idxs = np.asarray(idxs)
        return FoVPerspectiveCamera(R=cams.R[idxs], T=cams.T[idxs])

    def light_update(params, camera, idxs):
        # colocated light: at 1.05x the camera center (colocate.py:109)
        loc = centers[np.asarray(idxs)] * 1.05
        params = dict(params)
        params["lights"] = dict(params["lights"], location=jnp.asarray(loc))
        return params

    if args.iters > 0:
        state, _ = train(
            scene, Direct(training=True), opt, state, make_camera,
            data.images, data.masks, jax.random.PRNGKey(args.seed + 1),
            size=args.size, crop_size=args.crop_size, iters=args.iters,
            n_views=args.n_views, light_update=light_update,
            log_every=args.log_every,
            save_fn=lambda st, i: save_scene(model_dir, st.params, step=i),
            ckpt_freq=max(args.iters // 5 - 1, 1))
        save_scene(model_dir, state.params, step=args.iters)

    if not args.skip_test:
        # test with hard shadows instead of the learned occlusion
        test_scene = build_scene(max_steps=128).replace(occlusion="hard")

        def eval_light_update(params, camera, i):
            return light_update(params, camera, [i])

        evaluate(
            test_scene, state.params, lambda i: make_camera([i]),
            data.images[:8], Direct(training=False), size=args.size,
            chunk_size=min(args.size, 100),
            light_update=eval_light_update,
            save_fn=lambda i, im: save_image(
                f"{args.outputs}/colocate_{args.kind}_test_{i:02}.png", im))


if __name__ == "__main__":
    main()
