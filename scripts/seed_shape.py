"""Pre-fit the learnable SphereSDF to an analytic GT geometry (seeding).

The reference's own hard-scene practice is to NOT train geometry from
scratch: its DTU scripts resume from pretrained checkpoints
(/root/reference/scripts/dtu.py:98-109).  r5 measured why that matters —
on the plate-dominated mirror GT the from-scratch field falls into a fog
basin (max SDF ~0.005 everywhere, smooth-min gradient cancellation) that
volumetric eikonal/repulsion terms up to ~30% of the loss cannot escape
(RESULTS.md r5).  This script is the TPU-stack equivalent of the
reference's pretrained seed: fit the SphereSDF to the KNOWN GT geometry
by direct distance supervision, write a fresh-init scene with the fitted
shape into --models, then train materials/lights/geometry from there
with ``nerv.py --load --calibrate-exposure``.

    python scripts/seed_shape.py --kind gear --mirror-plate 0.7 \
        --models models_seed --name nerv_mesh_gear_mirror200b
"""

import argparse
import os

import numpy as np

from _common import enable_compile_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kind", type=str, default="gear")
    ap.add_argument("--obj-scale", type=float, default=1.0)
    ap.add_argument("--mirror-plate", type=float, default=0.0)
    ap.add_argument("--dist", type=float, default=3.4,
                    help="scene dist passed to build_scene (static config "
                         "only; params layout is what matters)")
    ap.add_argument("--models", type=str, default="models_seed")
    ap.add_argument("--name", type=str, required=True,
                    help="model dir name nerv.py will look for, e.g. "
                         "nerv_mesh_gear_mirror200b")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--n-uniform", type=int, default=32768)
    ap.add_argument("--n-surface", type=int, default=32768)
    ap.add_argument("--inset", type=float, default=0.01,
                    help="subtract from the unsigned mesh distance so the "
                         "fitted field dips negative at the surface "
                         "(hit registration + min-scan logits)")
    ap.add_argument("--cap", type=float, default=0.26,
                    help="clip targets at the smooth-min plateau "
                         "(-log(1e-4)/32 = 0.288; healthy trained fields "
                         "sit ~0.26)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from make_mesh_dataset import MESHES, _box_tris
    from nerv import build_scene  # NeRV layout: shape/bsdf/lights/occ
    from neural_raytracing_tpu.raster.meshops import point_face_distance
    from neural_raytracing_tpu.training import save_scene

    key = jax.random.PRNGKey(args.seed)

    # --- target geometry: object mesh (+ optional mirror plate box),
    #     exactly the make_mesh_dataset recipe (make_mesh_dataset.py:246-268)
    verts, faces = MESHES[args.kind]()
    verts = np.asarray(verts, np.float32) * np.float32(args.obj_scale)
    tris = [verts[np.asarray(faces)]]
    if args.mirror_plate > 0.0:
        plate_top = float(verts[:, 2].min()) - 0.005
        pv, pf = _box_tris((0.0, 0.0, plate_top - 0.03),
                           (args.mirror_plate, args.mirror_plate, 0.03))
        tris.append(np.asarray(pv, np.float32)[np.asarray(pf)])
    tris = jnp.asarray(np.concatenate(tris, axis=0))        # [F, 3, 3]
    print(f"target geometry: {tris.shape[0]} triangles")

    # --- probe set: uniform volume + near-surface shells
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts_u = jax.random.uniform(k1, (args.n_uniform, 3),
                               minval=-1.25, maxval=1.25)
    fidx = jax.random.randint(k2, (args.n_surface,), 0, tris.shape[0])
    bary = jax.random.dirichlet(k3, jnp.ones(3), (args.n_surface,))
    on_surf = jnp.einsum("pk,pkd->pd", bary, tris[fidx])
    pts_s = on_surf + 0.08 * jax.random.normal(k4, on_surf.shape)
    pts = jnp.concatenate([pts_u, pts_s], axis=0)

    @jax.jit
    def targets_of(p):
        d2, _ = point_face_distance(p, tris)
        return jnp.minimum(jnp.sqrt(jnp.maximum(d2, 0.0)) - args.inset,
                           args.cap)

    targets = jnp.concatenate(
        [targets_of(c) for c in jnp.split(pts, 8)], axis=0)

    # --- fit the SphereSDF params by distance regression
    scene = build_scene(dist=args.dist)
    params = scene.init(jax.random.PRNGKey(args.seed))
    shape_params = params["shape"]

    opt = optax.adam(1e-2)
    opt_state = opt.init(shape_params)

    @jax.jit
    def step(sp, ost, k):
        idx = jax.random.randint(k, (args.batch,), 0, pts.shape[0])
        p, t = pts[idx], targets[idx]

        def loss_fn(sp):
            f = scene.shape.sdf(sp, p)
            return jnp.mean(optax.huber_loss(f, t, delta=0.05))

        loss, grads = jax.value_and_grad(loss_fn)(sp)
        upd, ost = opt.update(grads, ost)
        return optax.apply_updates(sp, upd), ost, loss

    fit_key = jax.random.PRNGKey(args.seed + 1)
    for i in range(args.iters):
        fit_key, k = jax.random.split(fit_key)
        shape_params, opt_state, loss = step(shape_params, opt_state, k)
        if i % 500 == 0 or i == args.iters - 1:
            print(f"fit step {i:5d} huber {float(loss):.6f}")

    # --- fit quality + field-health report
    f_all = scene.shape.sdf(shape_params, pts)
    err = np.asarray(jnp.abs(f_all - targets))
    grid = jnp.stack(jnp.meshgrid(*([jnp.linspace(-1.25, 1.25, 25)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)
    v = np.asarray(scene.shape.sdf(shape_params, grid))
    print(f"|f - d| p50 {np.percentile(err, 50):.4f} "
          f"p90 {np.percentile(err, 90):.4f} max {err.max():.4f}")
    print(f"volume: min {v.min():.4f} max {v.max():.4f} "
          f"p50 {np.median(v):.4f} frac_neg {(v < 0).mean():.3f}")

    params["shape"] = shape_params
    model_dir = os.path.join(args.models, args.name)
    save_scene(model_dir, params, step=0)
    print(f"seeded scene (fitted shape + fresh bsdf/lights/occ) -> "
          f"{model_dir}")


if __name__ == "__main__":
    main()
