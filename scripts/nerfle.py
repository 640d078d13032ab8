"""NeRF+PT / NeRF+LE volumetric baselines on the colocated dataset.

Parity with scripts/nerfle.py in the reference: an ``NeRFLE`` volume
(light conditioning = point-light location, or an envmap probe with
``--envmap``) rendered through ``NeRFReproduce``; MSE-only training on
small crops (nerfle.py:62-158 uses crop 16, 300k iters); relight test.

    python scripts/nerfle.py --data mitsuba_scenes/cbox_relight/outputs \
        --kind bunny --envmap
"""

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--kind", type=str, default="bunny")
    ap.add_argument("--n-elev", type=int, default=8)
    ap.add_argument("--n-azim", type=int, default=8)
    ap.add_argument("--envmap", action="store_true")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.set_defaults(size=200, crop_size=16, iters=300_000, n_views=4)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp
    import optax
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import NeRFReproduce
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.render import pathtrace_sample
    from neural_raytracing_tpu.shapes import NeRFLE
    from neural_raytracing_tpu.training import (
        LossSampler, evaluate, load_scene, make_optimizer, rand_uv,
        save_scene,
    )
    from neural_raytracing_tpu.training.datasets import load_colocate

    data = load_colocate(args.data, args.kind, args.size,
                         n_elev=args.n_elev, n_azim=args.n_azim)
    r, t = look_at_view_transform(dist=data.dist, elev=data.elevs,
                                  azim=data.azims)
    cams = FoVPerspectiveCamera(R=r, T=t)
    centers = np.asarray(cams.camera_center())

    nerf = NeRFLE(envmap=args.envmap)
    lights = PointLights(scale=100.0)
    scene = nrt.Scene(shape=nerf, lights=lights)
    opt = make_optimizer({"shape": args.lr, "lights": args.lr})
    params = scene.init(jax.random.PRNGKey(args.seed))
    opt_state = opt.init(params)
    model_dir = f"{args.models}/nerfle_{args.kind}"
    if args.load:
        params = load_scene(model_dir, params)

    integrator = NeRFReproduce()
    crop = args.crop_size

    @jax.jit
    def step(params, opt_state, camera, uv, exp, key):
        def loss_fn(p):
            got, _, _ = pathtrace_sample(
                scene, integrator, p, camera, uv, key,
                crop_size=crop, bundle_size=1, size=args.size)
            got = jnp.mean(got, axis=-2)
            return jnp.mean(jnp.square(got - exp))  # MSE-only (nerfle.py)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    selector = LossSampler(len(data.images))
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    for i in range(args.iters):
        idxs = selector.sample(n=args.n_views)
        camera = FoVPerspectiveCamera(R=cams.R[idxs], T=cams.T[idxs])
        u, v = rand_uv(rng, args.size, args.size, crop)
        exp = jnp.asarray(data.images[idxs, u:u + crop, v:v + crop])
        params_i = dict(params)
        params_i["lights"] = dict(
            params_i["lights"], location=jnp.asarray(centers[idxs] * 1.05))
        key, skey = jax.random.split(key)
        params, opt_state, loss = step(
            params_i, opt_state, camera, (jnp.float32(u), jnp.float32(v)),
            exp, skey)
        selector.update_idxs(idxs, float(loss))
        if i % args.log_every == 0:
            print(f"step {i:6d} loss {float(loss):.6f}")
    save_scene(model_dir, params, step=args.iters)

    if not args.skip_test:
        def light_update(p, camera, i):
            p = dict(p)
            p["lights"] = dict(p["lights"],
                               location=jnp.asarray(centers[i:i + 1] * 1.05))
            return p

        evaluate(
            scene, params,
            lambda i: FoVPerspectiveCamera(R=cams.R[i:i + 1],
                                           T=cams.T[i:i + 1]),
            data.images[:8], integrator, size=args.size,
            chunk_size=chunk_for(args.size), light_update=light_update,
            save_fn=lambda i, im: save_image(
                f"{args.outputs}/nerfle_{args.kind}_{i:02}.png", im))


if __name__ == "__main__":
    main()
