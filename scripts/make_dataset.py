"""Dataset generation: colocated-light grids rendered with our own tracer.

Functional replacement for the reference's mitsuba generator
(mitsuba_scenes/cbox_relight/{cbox.py,gt.py}): an 8x8 elev/azim grid of
colocated camera+light renders ``{kind}_{i}_{j}.png`` (light at 1.05x the
camera radius, cbox.py:29-44) and a 4x4 camera x 3x3 light relight grid
``gt_{kind}_{i}_{j}_{k}_{l}.png`` (gt.py:29-46) — RGBA with hit-mask alpha.

The reference renders OBJ meshes through Mitsuba's GPU backend; without an
external renderer this uses procedural analytic scenes per kind, which
exercises the identical data layout and training pipeline.

    python scripts/make_dataset.py --out outputs/cbox --kind bunny
"""

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested


def procedural_shape(kind: str):
    """A procedural SDF stand-in per dataset kind."""
    import jax.numpy as jnp
    from neural_raytracing_tpu.shapes import (
        SDF, FunctionalSDF, box_sdf, capsule_sdf, sphere_sdf,
    )

    def smin(a, b, k=8.0):
        return -jnp.log(jnp.exp(-k * a) + jnp.exp(-k * b)) / k

    if kind == "bunny":
        def sdf(p):
            body = sphere_sdf(p * jnp.asarray([1.0, 1.2, 1.0]), 0.42)
            head = sphere_sdf(p - jnp.asarray([0.0, 0.45, 0.1]), 0.25)
            ear1 = capsule_sdf(p, jnp.asarray([-0.12, 0.6, 0.05]),
                               jnp.asarray([-0.16, 0.95, 0.0]), 0.07)
            ear2 = capsule_sdf(p, jnp.asarray([0.12, 0.6, 0.05]),
                               jnp.asarray([0.16, 0.95, 0.0]), 0.07)
            return smin(smin(body, head), jnp.minimum(ear1, ear2))
    elif kind == "teapot":
        def sdf(p):
            body = sphere_sdf(p * jnp.asarray([1.0, 1.4, 1.0]), 0.45)
            spout = capsule_sdf(p, jnp.asarray([0.35, 0.0, 0.0]),
                                jnp.asarray([0.62, 0.25, 0.0]), 0.08)
            handle = capsule_sdf(p, jnp.asarray([-0.4, 0.2, 0.0]),
                                 jnp.asarray([-0.4, -0.2, 0.0]), 0.06)
            lid = sphere_sdf(p - jnp.asarray([0.0, 0.38, 0.0]), 0.12)
            return smin(smin(body, spout), jnp.minimum(handle, lid))
    elif kind == "buddha":
        def sdf(p):
            base = box_sdf(p + jnp.asarray([0.0, 0.45, 0.0]),
                           jnp.asarray([0.35, 0.1, 0.25]))
            torso = sphere_sdf((p + jnp.asarray([0.0, 0.1, 0.0]))
                               * jnp.asarray([1.2, 1.0, 1.4]), 0.35)
            head = sphere_sdf(p - jnp.asarray([0.0, 0.38, 0.0]), 0.18)
            return smin(smin(base, torso), head)
    else:  # armadillo
        def sdf(p):
            body = sphere_sdf(p * jnp.asarray([1.1, 1.0, 1.3]), 0.4)
            tail = capsule_sdf(p, jnp.asarray([0.0, -0.2, 0.35]),
                               jnp.asarray([0.0, -0.45, 0.75]), 0.08)
            l1 = capsule_sdf(p, jnp.asarray([-0.2, -0.3, 0.0]),
                             jnp.asarray([-0.25, -0.6, 0.0]), 0.09)
            l2 = capsule_sdf(p, jnp.asarray([0.2, -0.3, 0.0]),
                             jnp.asarray([0.25, -0.6, 0.0]), 0.09)
            return smin(smin(body, tail), jnp.minimum(l1, l2))

    return SDF(FunctionalSDF(sdf), max_steps=64, dist=4.0)


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--kind", type=str, default="bunny",
                    choices=["bunny", "buddha", "teapot", "armadillo"])
    ap.add_argument("--n-elev", type=int, default=8)
    ap.add_argument("--n-azim", type=int, default=8)
    ap.add_argument("--relight", action="store_true",
                    help="also render the 4x4 cam x 3x3 light GT grid")
    ap.add_argument("--light-scale", type=float, default=1.5,
                    help="point-light scale; keep low enough that the GT "
                         "is not clipped at 1.0 (saturated GT destabilizes "
                         "inverse rendering)")
    ap.set_defaults(size=200)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import (
        ComposeSpatialVarying, Conductor, Diffuse, NeuralBSDF,
    )
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct, Mask
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.nn import SkipConnMLP

    os.makedirs(args.out, exist_ok=True)
    shape = procedural_shape(args.kind)
    # a fixed spatially-varying material so relighting is non-trivial
    bsdf = ComposeSpatialVarying(
        [Diffuse((0.7, 0.3, 0.2)), Diffuse((0.2, 0.4, 0.7)), Conductor()],
        sp_var_fn=SkipConnMLP(in_size=3, out=3, num_layers=2, hidden_size=32,
                              freqs=8, sigma=8.0))
    lights = PointLights(scale=args.light_scale)
    scene = nrt.Scene(shape=shape, bsdf=bsdf, lights=lights,
                      occlusion="hard")
    params = scene.init(jax.random.PRNGKey(7))
    integrator = Mask(Direct(training=False, horizon_mask=True))

    def render(elev, azim, light_loc, name):
        r, t = look_at_view_transform(dist=1.0, elev=elev, azim=azim)
        cam = FoVPerspectiveCamera(R=r, T=t)
        p = dict(params)
        p["lights"] = dict(p["lights"], location=jnp.asarray(light_loc))
        img, _ = nrt.pathtrace(scene, p, cam, integrator, size=args.size,
                               chunk_size=chunk_for(args.size),
                               background=0.0, key=jax.random.PRNGKey(0))
        rgba = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(rgba, "RGBA").save(os.path.join(args.out, name))
        return cam

    elevs = np.linspace(0.0, 45.0, args.n_elev)
    azims = np.linspace(-135.0, 135.0, args.n_azim)
    for i, elev in enumerate(elevs):
        for j, azim in enumerate(azims):
            r, t = look_at_view_transform(dist=1.0, elev=elev, azim=azim)
            center = np.asarray(FoVPerspectiveCamera(R=r, T=t).camera_center())
            render(elev, azim, center * 1.05, f"{args.kind}_{i}_{j}.png")
        print(f"row {i + 1}/{args.n_elev} done")

    if args.relight:
        cam_elevs = np.linspace(0.0, 45.0, 4)
        cam_azims = np.linspace(-135.0, 135.0, 4)
        light_elevs = np.linspace(10.0, 60.0, 3)
        light_azims = np.linspace(-90.0, 90.0, 3)
        for i, ce in enumerate(cam_elevs):
            for j, ca in enumerate(cam_azims):
                for k, le in enumerate(light_elevs):
                    for l, la in enumerate(light_azims):
                        r, t = look_at_view_transform(dist=1.05, elev=le,
                                                      azim=la)
                        loc = np.asarray(
                            FoVPerspectiveCamera(R=r, T=t).camera_center())
                        render(ce, ca, loc,
                               f"gt_{args.kind}_{i}_{j}_{k}_{l}.png")
            print(f"relight row {i + 1}/4 done")


if __name__ == "__main__":
    main()
