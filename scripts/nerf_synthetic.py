"""NeRF-synthetic reconstruction (the flagship workload).

Parity with scripts/nerf_synthetic.py in the reference: SDF(SphereSDF)
surface + ComposeSpatialVarying(NeuralBSDF x 8, softplus) reflectance +
LightField lighting + Direct integrator; AdamW with per-component LRs
(surface 8e-5 / bsdf 8e-4 / light 8e-5); eikonal extra loss; crop 80,
N=6 views/step; march 64 steps train / 256 test; then test-split eval.

    python scripts/nerf_synthetic.py --data nerf_synthetic/lego --size 256
"""

import numpy as np

from _common import (base_parser, chunk_for, force_cpu_if_requested,
                     metrics_writer, nan_policy, save_image)


def build_scene(max_steps=64, surface="spheres", stable_init=False,
                stable_min=False, throughput_mode="full",
                march_bound=None):
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, NeuralBSDF
    from neural_raytracing_tpu.kernels import FusedSkipConnMLP
    from neural_raytracing_tpu.lights import LightField
    from neural_raytracing_tpu.shapes import SDF, SphereSDF

    if surface == "hash":
        from neural_raytracing_tpu.nn.hash_encoding import HashSDF
        module = HashSDF()
    else:
        module = SphereSDF(n=128, stable_min=stable_min)
    sp_var_fn = None
    if stable_init:
        # zero-out head: collapse-resistant start (weights all 0.5);
        # see RESULTS.md on the sigmoid-saturation failure mode
        sp_var_fn = FusedSkipConnMLP(
            in_size=3, out=8, num_layers=16, hidden_size=256,
            freqs=128, sigma=128.0, init="xavier", zero_out=True)
    return nrt.Scene(
        shape=SDF(module, max_steps=max_steps, throughput_steps=128,
                  dist=2.2, throughput_mode=throughput_mode,
                  march_bound=march_bound),
        bsdf=ComposeSpatialVarying(
            [NeuralBSDF(activation="softplus") for _ in range(8)],
            sp_var_fn=sp_var_fn),
        lights=LightField())


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True,
                    help="dataset dir with transforms_{train,test}.json")
    ap.add_argument("--dataset-name", type=str, default=None)
    ap.add_argument("--surface-lr", type=float, default=8e-5)
    ap.add_argument("--bsdf-lr", type=float, default=8e-4)
    ap.add_argument("--light-lr", type=float, default=8e-5)
    ap.add_argument("--test-max-steps", type=int, default=256)
    ap.add_argument("--surface", type=str, default="spheres",
                    choices=["spheres", "hash"],
                    help="surface model: reference SphereSDF or the "
                         "hash-encoding HashSDF extension")
    ap.add_argument("--resume", action="store_true",
                    help="resume params + optimizer state + step")
    ap.add_argument("--stable-init", action="store_true",
                    help="zero-out weight-net head (collapse-resistant)")
    ap.add_argument("--stable-min", action="store_true",
                    help="exact logsumexp smooth-min (no 0.288 saturation "
                         "plateau; marchable far field — deliberate "
                         "divergence from the reference clamp)")
    ap.add_argument("--weight-reg", type=float, default=0.0,
                    help="weight-diversity regularizer coefficient")
    ap.add_argument("--sat-guard", type=float, default=0.0,
                    help="saturation-guard coefficient: penalizes raw "
                         "weight-net logits below -6 (softplus(-(raw+6))), "
                         "acting BEFORE the sigmoid so the pull-back "
                         "gradient does not vanish in saturation — the "
                         "collapse mode at the reference bsdf lr 8e-4 "
                         "(RESULTS.md) drives sigmoid weights to ~1e-34 "
                         "where any post-sigmoid penalty is inert")
    ap.add_argument("--no-ssim", action="store_true",
                    help="drop the -log SSIM term from the color loss "
                         "(ablation; reference keeps it, utils.py:328-347)")
    ap.add_argument("--mask-weight", type=float, default=15.0,
                    help="miss-loss (mask BCE) weight (reference: 15, "
                         "training_utils.py:270-272)")
    ap.add_argument("--load-from", type=str, default=None,
                    help="seed params from another model dir (progressive "
                         "resolution: scene params are resolution-"
                         "independent 3D MLPs, so a size-64-trained model "
                         "fine-tunes at 256 — from-scratch 256 runs darken "
                         "to black on low-coverage GT, RESULTS.md)")
    ap.add_argument("--mask-crops", action="store_true",
                    help="center training crops on random object-mask "
                         "pixels (rand_uv_mask — the reference HARNESS "
                         "default, training_utils.py:233; its "
                         "nerf_synthetic script overrides to uniform "
                         "rand_uv at :115, which suits high-coverage "
                         "scenes like lego but starves training on "
                         "low-coverage GT: uniform 80^2 crops of a ~11%%-"
                         "coverage 256^2 object collapse to black)")
    ap.add_argument("--device-data", action="store_true",
                    help="ON-DEVICE data path: upload the split once and "
                         "sample views/crops inside the jitted step — no "
                         "per-step GT/camera transfers (view selection is "
                         "uniform instead of loss-proportional)")
    ap.add_argument("--half-res-throughput", action="store_true",
                    help="evaluate the silhouette min-scan on the 2x-"
                         "subsampled crop grid (the reference's own "
                         "half_res_throughput evaluator, sdfs.py:250-254, "
                         "which it defines but never wires into training). "
                         "4x fewer min-scan rays = the largest single "
                         "block of the train step: bench 662k -> 936k "
                         "rays/s (+41%%). Training mask supervision is at "
                         "half resolution (2x2-duplicated logits)")
    ap.add_argument("--half-res-warmup", type=int, default=0,
                    help="SCHEDULED variant of --half-res-throughput: the "
                         "first N steps run the half-res silhouette min-"
                         "scan (+41%% throughput), the remainder finishes "
                         "at full resolution so mask supervision re-"
                         "sharpens — targets the speed without the always-"
                         "on variant's -2.6 dB (r4 pricing). One extra "
                         "jit compile at the phase switch")
    ap.add_argument("--valid-freq", type=int, default=2500,
                    help="full-frame validation render + PSNR every N steps "
                         "(0 disables); curves land in the metrics file")
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import os

    import jax
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, load_scene, load_train_state,
        make_optimizer, rand_uv_mask, save_scene, save_train_state, train,
    )
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

    name = args.dataset_name or args.data.rstrip("/").split("/")[-1]
    print(f"{name}, Size: {args.size}, Iters: {args.iters}")
    data = load_nerf_synthetic(args.data, args.size, "train")

    if args.half_res_warmup and args.half_res_throughput:
        ap.error("--half-res-warmup and --half-res-throughput are exclusive")
    tp_mode = "half_res" if args.half_res_throughput else "full"
    if args.half_res_warmup:
        k = int(min(args.half_res_warmup, args.iters))
        phases = [("half_res", k), ("full", args.iters - k)]
    else:
        phases = [(tp_mode, args.iters)]
    phases = [(m, n) for m, n in phases if n > 0]
    scene = build_scene(max_steps=64, surface=args.surface,
                        stable_init=args.stable_init,
                        stable_min=args.stable_min,
                        throughput_mode=phases[0][0] if phases else tp_mode)
    opt = make_optimizer({"shape": args.surface_lr, "bsdf": args.bsdf_lr,
                          "lights": args.light_lr},
                          clip_norm=args.clip_norm)
    state = init_train_state(scene, opt, jax.random.PRNGKey(args.seed))
    model_dir = f"{args.models}/{name}"
    state_path = os.path.join(model_dir, "train_state.msgpack")
    if args.resume and os.path.exists(state_path):
        # full resume: params + OPTIMIZER STATE + step (the reference could
        # only reload params and restarted AdamW)
        params, opt_state, step = load_train_state(state_path, state.params,
                                                   state.opt_state)
        state = state._replace(params=params, opt_state=opt_state,
                               step=jax.numpy.int32(step))
        print(f"resumed from step {step}")
    elif args.load:
        state = state._replace(params=load_scene(model_dir, state.params))
    elif args.load_from:
        state = state._replace(
            params=load_scene(args.load_from, state.params))
        print(f"seeded params from {args.load_from}")

    c2ws = data.cam_to_worlds

    def make_camera(idxs):
        return NeRFCamera(cam_to_world=c2ws[np.asarray(idxs)],
                          focal=data.focal)

    mesh = None
    if args.data_parallel:
        from neural_raytracing_tpu.parallel import make_mesh
        mesh = make_mesh()
        print(f"data-parallel over {mesh.devices.size} devices")

    def extra_loss(it, got, exp, mask):
        import jax.numpy as jnp
        from neural_raytracing_tpu.ops.math import eikonal_loss
        loss = eikonal_loss(it.raw_normals)
        if args.weight_reg and it.normalized_weights is not None:
            var = jnp.var(it.normalized_weights, axis=-1)
            loss = loss + args.weight_reg * jnp.mean(
                jnp.sqrt(jnp.maximum(var, 1e-12)))
        if args.sat_guard and it.nonnormalized_weights is not None:
            loss = loss + args.sat_guard * jnp.mean(
                jax.nn.softplus(-(it.nonnormalized_weights + 6.0)))
        return loss

    # per-step scalars + periodic validation PSNR, persisted as JSONL so
    # convergence (vs early-stop or collapse) is auditable after the run
    import math as _math

    import neural_raytracing_tpu as nrt

    metrics, flush_metrics = metrics_writer(args.outputs, name)
    cur = [scene]  # rebound per phase by the half-res-warmup schedule

    def valid_fn(st, i):
        img, _ = nrt.pathtrace(
            cur[0], st.params, make_camera([0]), Direct(training=False),
            size=args.size, chunk_size=chunk_for(args.size), background=0.0,
            key=jax.random.PRNGKey(0))
        got = np.clip(np.asarray(img)[..., :3], 0.0, 1.0)
        mse = float(np.mean((got - np.asarray(
            data.images[0][..., :3])) ** 2))
        psnr = 10.0 * _math.log10(1.0 / max(mse, 1e-10))
        metrics.append({"step": int(i), "valid_psnr": psnr})
        save_image(f"{args.outputs}/valid_{name}_{int(i):06}.png", got)
        print(f"valid @ {int(i)}: PSNR {psnr:.2f}")

    device_data = camera_builder = None
    if args.device_data:
        assert not args.data_parallel, "--device-data is single-chip"
        from neural_raytracing_tpu.training import device_dataset
        device_data = device_dataset(data.images, data.masks, c2ws,
                                     args.crop_size)
        camera_builder = lambda c: NeRFCamera(cam_to_world=c,
                                              focal=data.focal)

    if args.iters > 0:
        try:
            for pi, (ph_mode, ph_iters) in enumerate(phases):
                if ph_mode != cur[0].shape.throughput_mode:
                    cur[0] = build_scene(
                        max_steps=64, surface=args.surface,
                        stable_init=args.stable_init,
                        stable_min=args.stable_min,
                        throughput_mode=ph_mode)
                if len(phases) > 1:
                    print(f"phase {pi}: throughput_mode={ph_mode} "
                          f"({ph_iters} steps)")
                tkey = jax.random.PRNGKey(args.seed + 1)
                if pi:
                    tkey = jax.random.fold_in(tkey, pi)
                state, _ = train(
                    cur[0], Direct(training=True), opt, state, make_camera,
                    data.images, data.masks, tkey,
                    size=args.size, crop_size=args.crop_size, iters=ph_iters,
                    nan_policy=nan_policy(args),
                    with_ssim=not args.no_ssim, mask_weight=args.mask_weight,
                    uv_select=rand_uv_mask if args.mask_crops else None,
                    n_views=args.n_views, log_every=args.log_every,
                    mesh=mesh, extra_loss=extra_loss, metrics=metrics,
                    device_data=device_data, camera_builder=camera_builder,
                    valid_fn=valid_fn if args.valid_freq else None,
                    valid_freq=args.valid_freq,
                    save_fn=lambda st, i: (
                        save_scene(model_dir, st.params, step=int(st.step)),
                        save_train_state(state_path, st.params, st.opt_state,
                                         int(st.step)),
                        flush_metrics()),
                    ckpt_freq=max(ph_iters // 5 - 1, 1))
        finally:
            flush_metrics()
        save_scene(model_dir, state.params, step=int(state.step))
        save_train_state(state_path, state.params, state.opt_state,
                         int(state.step))

    if not args.skip_test:
        print("Running on test set")
        test = load_nerf_synthetic(args.data, args.size, "test")
        from _common import eval_bound
        test_scene = build_scene(max_steps=args.test_max_steps,
                                 surface=args.surface,
                                 stable_init=args.stable_init,
                                 stable_min=args.stable_min,
                                 march_bound=eval_bound(args))
        results = evaluate(
            test_scene, state.params,
            lambda i: NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                                 focal=test.focal),
            test.images, Direct(training=False),
            size=args.size, chunk_size=chunk_for(args.size),
            save_fn=lambda i, im: save_image(
                f"{args.outputs}/test_{name}_{i:03}.png", im))
        metrics.append({"step": int(state.step), "test": results})
        flush_metrics()


if __name__ == "__main__":
    main()
