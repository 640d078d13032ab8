"""GAN-NeRF experiment: PlainNeRF generator + DCGAN critic.

Parity with exp.py at the reference repo root (:73-150): a ``PlainNeRF``
conditioned on a latent code renders random views through the standard
driver; a DCGAN discriminator judges crops against a folder of real
images; non-saturating GAN losses train both (the reference version is
exploratory and partly broken — this is a working equivalent).

    python scripts/exp_gan.py --data images_dir --size 64 --iters 2000
"""

import os

import numpy as np

from _common import base_parser, force_cpu_if_requested, save_image


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True,
                    help="directory of training images")
    ap.add_argument("--latent", type=int, default=32)
    ap.add_argument("--g-lr", type=float, default=1e-4)
    ap.add_argument("--d-lr", type=float, default=2e-4)
    ap.set_defaults(size=64, iters=2000, n_views=4)
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
    from neural_raytracing_tpu.nn import Discriminator
    from neural_raytracing_tpu.render import pathtrace_sample
    from neural_raytracing_tpu.shapes import PlainNeRF
    from neural_raytracing_tpu.training.datasets import load_image

    files = [os.path.join(args.data, f) for f in sorted(os.listdir(args.data))
             if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    reals = np.stack([load_image(f, resize=(args.size, args.size))[..., :3]
                      for f in files])
    print(f"{len(reals)} real images")

    nerf = PlainNeRF(latent_size=args.latent, steps=24)
    disc = Discriminator()
    scene = nrt.Scene(shape=nerf)
    integrator = NeRFReproduce()

    key = jax.random.PRNGKey(args.seed)
    kg, kd, key = jax.random.split(key, 3)
    g_params = scene.init(kg)
    d_params = disc.init(kd)
    g_opt = optax.adam(args.g_lr, b1=0.5)
    d_opt = optax.adam(args.d_lr, b1=0.5)
    g_state = g_opt.init(g_params)
    d_state = d_opt.init(d_params)

    n = args.n_views
    size = args.size

    def render_fake(g_params, latents, cam, key):
        # latent conditioning rides in the shape params subtree
        p = dict(g_params)
        p["shape"] = dict(p["shape"], latent=latents)
        values, _, _ = pathtrace_sample(
            scene, integrator, p, cam,
            (jnp.float32(0.0), jnp.float32(0.0)), key,
            crop_size=size, bundle_size=1, size=size)
        return jnp.mean(values, axis=-2)          # [n, S, S, 3]

    @jax.jit
    def d_step(d_params, d_state, g_params, latents, cam, real, key):
        def loss_fn(dp):
            fake = render_fake(g_params, latents, cam, key)
            fake_logits = disc(dp, jnp.transpose(fake, (0, 3, 1, 2)))
            real_logits = disc(dp, jnp.transpose(real, (0, 3, 1, 2)))
            return (jnp.mean(jax.nn.softplus(fake_logits))
                    + jnp.mean(jax.nn.softplus(-real_logits)))
        loss, g = jax.value_and_grad(loss_fn)(d_params)
        updates, d_state = d_opt.update(g, d_state)
        return optax.apply_updates(d_params, updates), d_state, loss

    @jax.jit
    def g_step(g_params, g_state, d_params, latents, cam, key):
        def loss_fn(gp):
            fake = render_fake(gp, latents, cam, key)
            fake_logits = disc(d_params, jnp.transpose(fake, (0, 3, 1, 2)))
            return jnp.mean(jax.nn.softplus(-fake_logits))
        loss, g = jax.value_and_grad(loss_fn)(g_params)
        updates, g_state = g_opt.update(g, g_state)
        return optax.apply_updates(g_params, updates), g_state, loss

    rng = np.random.default_rng(args.seed)
    for i in range(args.iters):
        key, k1, k2, k3 = jax.random.split(key, 4)
        latents = jax.random.normal(k1, (n, args.latent))
        r, t = look_at_view_transform(
            dist=2.0, elev=rng.uniform(0, 30, n), azim=rng.uniform(-180, 180, n))
        cam = FoVPerspectiveCamera(R=r, T=t)
        real = jnp.asarray(reals[rng.integers(0, len(reals), n)])
        d_params, d_state, d_loss = d_step(d_params, d_state, g_params,
                                           latents, cam, real, k2)
        g_params, g_state, g_loss = g_step(g_params, g_state, d_params,
                                           latents, cam, k3)
        if i % args.log_every == 0:
            print(f"step {i:6d} d {float(d_loss):.4f} g {float(g_loss):.4f}")
    print("done")


if __name__ == "__main__":
    main()
