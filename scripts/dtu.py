"""DTU multi-view reconstruction with unknown lighting.

Parity with scripts/dtu.py in the reference: DTU images+masks with
cameras.npz (world_mat * scale_mat decomposed to pose+intrinsics, poses
normalized into the unit sphere); SDF surface + ComposeSpatialVarying
BSDF + learned LightField; every-10th-view test split; crop 96.

    python scripts/dtu.py --data DTU/scan97 --size 200
"""

import numpy as np

from _common import (base_parser, chunk_for, force_cpu_if_requested,
                     metrics_writer, nan_policy, save_image)


def build_scene(max_steps=64, n_bases=6, march_bound=None):
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, NeuralBSDF
    from neural_raytracing_tpu.lights import LightField
    from neural_raytracing_tpu.shapes import SDF, SphereSDF

    return nrt.Scene(
        shape=SDF(SphereSDF(n=128), max_steps=max_steps,
                  throughput_steps=128, dist=2.2,
                  march_bound=march_bound),
        bsdf=ComposeSpatialVarying(
            [NeuralBSDF(activation="softplus") for _ in range(n_bases)]),
        lights=LightField())


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--surface-lr", type=float, default=8e-5)
    ap.add_argument("--bsdf-lr", type=float, default=8e-5)  # dtu.py:124
    ap.add_argument("--light-lr", type=float, default=8e-5)
    ap.add_argument("--device-data", action="store_true",
                    help="on-device data path (views/crops AND the "
                         "DTU pose+intrinsic camera pair sampled inside "
                         "the jitted step; ~1.5x on host-constrained VMs)")
    ap.add_argument("--test-every", type=int, default=10,
                    help="every k-th view is held out (dtu.py:115-121)")
    ap.add_argument("--mask-weight", type=float, default=10.0,
                    help="miss-loss (mask BCE) weight. The DTU protocol "
                         "uses 10 (train_dtu, training_utils.py:404), NOT "
                         "the train_nerf 15 — r1-r4 runs of this script "
                         "used the default 15, a parity gap found by the "
                         "r5 duel")
    ap.set_defaults(size=200, crop_size=96, n_views=3)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    from neural_raytracing_tpu.cameras import DTUCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.training import (
        evaluate, init_train_state, load_scene, make_optimizer,
        rand_uv_mask, save_scene, train,
    )
    from neural_raytracing_tpu.training.datasets import load_dtu

    name = args.data.rstrip("/").split("/")[-1]
    data = load_dtu(args.data, args.size)
    n = len(data.images)
    test_idx = np.arange(0, n, args.test_every)
    train_idx = np.asarray([i for i in range(n) if i not in set(test_idx)])
    src = np.asarray(data.src_size, np.float32)

    scene = build_scene()
    opt = make_optimizer({"shape": args.surface_lr, "bsdf": args.bsdf_lr,
                          "lights": args.light_lr},
                          clip_norm=args.clip_norm)
    state = init_train_state(scene, opt, jax.random.PRNGKey(args.seed))
    model_dir = f"{args.models}/dtu_{name}"
    if args.load:
        state = state._replace(params=load_scene(model_dir, state.params))

    def make_camera(idxs):
        idxs = np.asarray(idxs)
        return DTUCamera(pose=data.poses[idxs],
                         intrinsic=data.intrinsics[idxs], src_size=src)

    # per-step scalar curve, persisted as JSONL (the r3 dtu run had no
    # curve at HEAD — VERDICT r3 missing #5)
    metrics, flush_metrics = metrics_writer(args.outputs, f"dtu_{name}")

    device_data = camera_builder = None
    if args.device_data:
        assert not args.data_parallel, "--device-data is single-chip"
        from neural_raytracing_tpu.training import device_dataset
        # DTU cameras are a (pose, intrinsic) PAIR per view; pack both
        # into one [V, 2, 4, 4] array so the generic device path can
        # gather them with the same per-view indexing as a c2w
        packed = np.stack([data.poses[train_idx],
                           data.intrinsics[train_idx]], axis=1)
        device_data = device_dataset(data.images[train_idx],
                                     data.masks[train_idx], packed,
                                     args.crop_size)
        camera_builder = lambda c: DTUCamera(pose=c[:, 0],
                                             intrinsic=c[:, 1],
                                             src_size=src)

    if args.iters > 0:
        try:
            state, _ = train(
                scene, Direct(training=True), opt, state,
                lambda idxs: make_camera(train_idx[np.asarray(idxs)]),
                data.images[train_idx], data.masks[train_idx],
                jax.random.PRNGKey(args.seed + 1), size=args.size,
                crop_size=args.crop_size, iters=args.iters, nan_policy=nan_policy(args),
                mask_weight=args.mask_weight,
                uv_select=rand_uv_mask,
                n_views=args.n_views, log_every=args.log_every,
                metrics=metrics,
                device_data=device_data, camera_builder=camera_builder,
                save_fn=lambda st, i: (save_scene(model_dir, st.params,
                                                  step=int(st.step)),
                                       flush_metrics()),
                ckpt_freq=max(args.iters // 5 - 1, 1))
        finally:
            flush_metrics()
        save_scene(model_dir, state.params, step=int(state.step))

    if not args.skip_test:
        from _common import eval_bound
        test_scene = build_scene(max_steps=128,
                                 march_bound=eval_bound(args))
        results = evaluate(
            test_scene, state.params,
            lambda i: make_camera([test_idx[i]]),
            data.images[test_idx], Direct(training=False),
            size=args.size, chunk_size=chunk_for(args.size),
            masks=data.masks[test_idx],
            save_fn=lambda i, im: save_image(
                f"{args.outputs}/dtu_{name}_test_{i:02}.png", im))
        # stamp with the GLOBAL applied step (checkpoints record the same
        # convention since r4); args.iters is only the REMAINING count on
        # a resumed run (ADVICE r4)
        metrics.append({"step": int(state.step), "test": results})
        flush_metrics()


if __name__ == "__main__":
    main()
