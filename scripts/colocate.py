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

from _common import base_parser, chunk_for, force_cpu_if_requested, nan_policy, save_image


def build_scene(max_steps=64, stable_init=False, light_scale=5.0):
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import (
        ComposeSpatialVarying, Conductor, Diffuse, NeuralBSDF,
    )
    from neural_raytracing_tpu.kernels import FusedSkipConnMLP
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.shapes import SDF, SphereSDF

    bases = [
        NeuralBSDF(activation="softplus"),
        NeuralBSDF(activation="softplus"),
        Diffuse(),
        Conductor(),
    ]
    sp_var_fn = None
    if stable_init:
        # zero-out head: mixture weights start at 0.5 everywhere instead of
        # xavier noise (prevents the sigmoid-saturation collapse seen in
        # long runs; the reference's all-xavier init is the default)
        sp_var_fn = FusedSkipConnMLP(
            in_size=3, out=len(bases), num_layers=16, hidden_size=256,
            freqs=128, sigma=128.0, init="xavier", zero_out=True)
    return nrt.Scene(
        shape=SDF(SphereSDF(n=128), max_steps=max_steps,
                  throughput_steps=128, dist=2.2),
        bsdf=ComposeSpatialVarying(bases, sp_var_fn=sp_var_fn),
        lights=PointLights(scale=light_scale),
        occlusion="learned")


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--kind", type=str, default="bunny",
                    help="dataset object name ({kind}_{i}_{j}.png files): "
                         "the reference's bunny/buddha/teapot/armadillo, or "
                         "any make_dataset/make_mesh_dataset kind (ico, "
                         "knot, gear, ...)")
    ap.add_argument("--n-elev", type=int, default=8)
    ap.add_argument("--n-azim", type=int, default=8)
    ap.add_argument("--stable-init", action="store_true",
                    help="zero-out weight-net head (collapse-resistant)")
    ap.add_argument("--light-scale", type=float, default=5.0,
                    help="initial learnable light scale (reference: 5)")
    ap.add_argument("--relight-data", type=str, default=None,
                    help="dir with gt_{kind}_{i}_{j}_{k}_{l}.png relight "
                         "grid (test_colocate_resources equivalent)")
    ap.add_argument("--no-ssim", action="store_true",
                    help="drop the -log SSIM color-loss term (ablation; "
                         "the term is net-darkening on dark GT at fine "
                         "resolutions, RESULTS.md)")
    ap.add_argument("--surface-lr", type=float, default=8e-5)
    ap.add_argument("--bsdf-lr", type=float, default=8e-5)  # colocate.py:87
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
        evaluate, init_train_state, load_scene, make_optimizer,
        rand_uv_mask, save_scene, train,
    )
    from neural_raytracing_tpu.training.datasets import load_colocate

    data = load_colocate(args.data, args.kind, args.size,
                         n_elev=args.n_elev, n_azim=args.n_azim)
    r, t = look_at_view_transform(dist=data.dist, elev=data.elevs,
                                  azim=data.azims)
    cams = FoVPerspectiveCamera(R=r, T=t)
    centers = np.asarray(cams.camera_center())

    scene = build_scene(stable_init=args.stable_init,
                        light_scale=args.light_scale)
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

    def extra_loss(it, got, exp, mask):
        # eikonal + weight-diversity regularizer (colocate.py:97-106)
        from neural_raytracing_tpu.ops.math import eikonal_loss
        loss = eikonal_loss(it.raw_normals)
        if it.normalized_weights is not None:
            # std via clamped sqrt: at zero-out init the variance is
            # EXACTLY 0 and jnp.std's sqrt gradient would be NaN
            var = jnp.var(it.normalized_weights, axis=-1)
            loss = loss + 1e-2 * jnp.mean(jnp.sqrt(jnp.maximum(var, 1e-12)))
        return loss

    if args.iters > 0:
        state, _ = train(
            scene, Direct(training=True), opt, state, make_camera,
            data.images, data.masks, jax.random.PRNGKey(args.seed + 1),
            size=args.size, crop_size=args.crop_size, iters=args.iters, nan_policy=nan_policy(args),
            with_ssim=not args.no_ssim,
            # mask-centered crops: the reference train_sample default
            # (training_utils.py:138 rand_uv_mask)
            uv_select=rand_uv_mask,
            n_views=args.n_views, light_update=light_update,
            extra_loss=extra_loss,
            log_every=args.log_every,
            save_fn=lambda st, i: save_scene(model_dir, st.params,
                                             step=int(st.step)),
            ckpt_freq=max(args.iters // 5 - 1, 1))
        save_scene(model_dir, state.params, step=args.iters)

    if not args.skip_test:
        # test with hard shadows instead of the learned occlusion
        test_scene = build_scene(max_steps=128,
                                 stable_init=args.stable_init,
                                 light_scale=args.light_scale)\
            .replace(occlusion="hard")

        def eval_light_update(params, camera, i):
            return light_update(params, camera, [i])

        evaluate(
            test_scene, state.params, lambda i: make_camera([i]),
            data.images[:8], Direct(training=False), size=args.size,
            chunk_size=chunk_for(args.size),
            light_update=eval_light_update,
            save_fn=lambda i, im: save_image(
                f"{args.outputs}/colocate_{args.kind}_test_{i:02}.png", im))

    if args.relight_data is not None:
        # novel-light generalization: 4x4 cameras x 3x3 light positions
        # (the reference's test_colocate_resources grid,
        # training_utils.py:538-570 / mitsuba gt.py:29-46)
        from neural_raytracing_tpu.ops.math import mse2psnr
        from neural_raytracing_tpu.training.datasets import (
            load_colocate_relight_grid,
        )

        grid = load_colocate_relight_grid(args.relight_data, args.kind,
                                          args.size)
        cam_elevs = np.linspace(0.0, 45.0, 4)
        cam_azims = np.linspace(-135.0, 135.0, 4)
        light_elevs = np.linspace(10.0, 60.0, 3)
        light_azims = np.linspace(-90.0, 90.0, 3)
        test_scene = build_scene(max_steps=128).replace(occlusion="hard")
        psnrs = []
        for (i, j, k, l), gt_img in sorted(grid.items()):
            r, t = look_at_view_transform(dist=1.0, elev=cam_elevs[i],
                                          azim=cam_azims[j])
            cam = FoVPerspectiveCamera(R=r, T=t)
            lr_, lt_ = look_at_view_transform(dist=1.05,
                                              elev=light_elevs[k],
                                              azim=light_azims[l])
            loc = np.asarray(
                FoVPerspectiveCamera(R=lr_, T=lt_).camera_center())
            p = dict(state.params)
            p["lights"] = dict(p["lights"], location=jnp.asarray(loc))
            img, _ = nrt.pathtrace(test_scene, p, cam,
                                   Direct(training=False), size=args.size,
                                   chunk_size=chunk_for(args.size),
                                   background=0.0,
                                   key=jax.random.PRNGKey(i * 64 + j))
            got = np.clip(np.asarray(img)[..., :3], 0, 1)
            l2 = max(float(np.mean((got - gt_img[..., :3]) ** 2)), 1e-10)
            psnrs.append(float(mse2psnr(jnp.asarray(l2))))
            save_image(f"{args.outputs}/relight_{args.kind}_"
                       f"{i}_{j}_{k}_{l}.png", got)
        print(f"relight grid: {len(psnrs)} renders, "
              f"avg PSNR {np.mean(psnrs):.3f}")


if __name__ == "__main__":
    main()
