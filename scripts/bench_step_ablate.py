"""Ablation profile of the flagship train step's ~10 ms non-march tail.

VERDICT r2 weak #2: march+min-scan are ~60% of the 25 ms step; the rest
(second-order normals, shading backward, loss glue) was named but never
broken down.  This measures the step under targeted ablations — each
variant removes ONE cost while keeping shapes identical — so the deltas
attribute the tail:

  full          the bench.py parity step
  no_ssim       masked loss without the -log SSIM term        (loss glue)
  no_eik        extra_loss = 0                                (2nd-order eikonal)
  sg_normals    normals stop-gradded before use               (ALL 2nd-order)
  fwd_only      loss value only, no grad/update               (whole backward)

Timing is dependency-chained (state feeds the next step) — per-op timing
through the axon tunnel lies (CLAUDE.md).

    python scripts/bench_step_ablate.py --steps 20
"""

import argparse
import json
import time

import numpy as np

from _common import enable_compile_cache

N_VIEWS, CROP, SIZE = 4, 64, 256
MARCH_STEPS, THROUGHPUT_STEPS = 32, 64
RAYS = N_VIEWS * CROP * CROP


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, NeuralBSDF
    from neural_raytracing_tpu.cameras import (
        FoVPerspectiveCamera, look_at_view_transform,
    )
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.lights import LightField
    from neural_raytracing_tpu.shapes import SDF, SphereSDF
    from neural_raytracing_tpu.training import (
        init_train_state, make_optimizer, make_train_step,
    )

    class SGNormalsSDF(SDF):
        """Ablation: sever the second-order path through the normals."""

        def normals(self, params, p):
            return lax.stop_gradient(super().normals(params, p))

    def scene_with(sdf_cls=SDF):
        return nrt.Scene(
            shape=sdf_cls(SphereSDF(n=128), max_steps=MARCH_STEPS,
                          throughput_steps=THROUGHPUT_STEPS),
            bsdf=ComposeSpatialVarying(
                [NeuralBSDF(activation="softplus") for _ in range(8)]),
            lights=LightField())

    r, t = look_at_view_transform(dist=2.0,
                                  elev=np.linspace(0, 30, N_VIEWS),
                                  azim=np.linspace(-45, 45, N_VIEWS))
    camera = FoVPerspectiveCamera(R=r, T=t)
    exp = jnp.zeros((N_VIEWS, CROP, CROP, 3))
    mask = jnp.ones((N_VIEWS, CROP, CROP))
    uv = (jnp.float32(64.0), jnp.float32(64.0))
    opt = make_optimizer({"shape": 8e-5, "bsdf": 8e-4, "lights": 8e-5})

    def timeit(step, state):
        aux = None
        for i in range(args.warmup):
            state, aux = step(state, camera, uv, exp, mask,
                              jax.random.PRNGKey(i))
        float(np.asarray(aux["loss"]))
        # host-transfer sync: block_until_ready returns early through the
        # axon tunnel (measured: 3.58 "ms" for a 25 ms step)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, aux = step(state, camera, uv, exp, mask,
                              jax.random.PRNGKey(100 + i))
        float(np.asarray(aux["loss"]))
        dt = (time.perf_counter() - t0) / args.steps
        return dt

    results = {}

    def run(tag, scene, donate=False, **kw):
        state = init_train_state(scene, opt, jax.random.PRNGKey(0))
        step = make_train_step(scene, Direct(training=True), opt, size=SIZE,
                               crop_size=CROP, bundle_size=1, donate=donate,
                               **kw)
        dt = timeit(step, state)
        results[tag] = dt
        print(f"{tag:>12}: {dt * 1e3:7.2f} ms  ({RAYS / dt / 1e3:6.0f} "
              "krays/s)", flush=True)

    run("full", scene_with())
    run("no_ssim", scene_with(), with_ssim=False)
    run("no_eik", scene_with(), extra_loss=lambda it, g, e, m: 0.0)
    run("sg_normals", scene_with(SGNormalsSDF))
    run("donate", scene_with(), donate=True)

    # forward-only: loss value without grad/update
    scene = scene_with()
    state = init_train_state(scene, opt, jax.random.PRNGKey(0))
    from neural_raytracing_tpu.integrators import Direct as D
    from neural_raytracing_tpu.ops.losses import masked_loss
    from neural_raytracing_tpu.training.loop import (
        NeRFIntegrator, _tile_positions, default_extra_loss,
    )

    integ = NeRFIntegrator(D(training=True))

    @jax.jit
    def fwd(params, key, carry):
        # ``carry`` forces a data dependency between iterations (the axon
        # tunnel lets independent dispatches overlap, faking the timing)
        key = jax.random.fold_in(key, (carry * 0.0).astype(jnp.int32))
        ckey, ikey = jax.random.split(key)
        positions = _tile_positions(uv[0], uv[1], CROP)
        rays = camera.sample_positions(positions, key=ckey, bundle_size=1,
                                       size=SIZE)
        values, active, it = integ.sample(scene, params, rays, key=ikey,
                                          training=True)
        got = jnp.mean(values, axis=-2)
        tp = jnp.mean(it.throughput, axis=-1)
        loss = masked_loss(got[..., :3], exp, tp, mask, mask_weight=15.0,
                           with_ssim=True)
        return loss + default_extra_loss(it, got, exp, mask)

    l = jnp.float32(0.0)
    for i in range(args.warmup):
        l = fwd(state.params, jax.random.PRNGKey(i), l)
    float(np.asarray(l))
    t0 = time.perf_counter()
    for i in range(args.steps):
        l = fwd(state.params, jax.random.fold_in(jax.random.PRNGKey(7), i),
                l)
    float(np.asarray(l))
    dt = (time.perf_counter() - t0) / args.steps
    results["fwd_only"] = dt
    print(f"{'fwd_only':>12}: {dt * 1e3:7.2f} ms")

    full = results["full"]
    print("\nattribution (delta vs full):")
    for k, v in results.items():
        if k != "full":
            print(f"  {k:>12}: {(full - v) * 1e3:+6.2f} ms")
    json.dump({k: v * 1e3 for k, v in results.items()},
              open("outputs/bench_step_ablate.json", "w"), indent=1)


if __name__ == "__main__":
    main()
