"""Eval-render bench on the TRAINED flagship checkpoint.

The random-init bench_eval scene has near-degenerate coverage; this
measures the serving path on the real ico_rig256 model (march 256 test
config, LightField, no shadow rays — the nerf_synthetic eval arm) with
and without the march_bound clip, and reports image agreement.

    python scripts/bench_eval_trained.py --model models/ico_rig256
"""

import argparse
import time

import numpy as np

from _common import chunk_for, enable_compile_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", type=str, default="models/ico_rig256")
    ap.add_argument("--data", type=str, default="../data/mesh_ico_rig256")
    ap.add_argument("--bound", type=float, default=1.2)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    enable_compile_cache()

    import jax

    import neural_raytracing_tpu as nrt
    from nerf_synthetic import build_scene
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.shapes import SDF
    from neural_raytracing_tpu.training import load_scene
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

    data = load_nerf_synthetic(args.data, 256, "test")
    cam = NeRFCamera(cam_to_world=data.cam_to_worlds[:1], focal=data.focal)

    scene = build_scene(max_steps=256)
    params = scene.init(jax.random.PRNGKey(0))
    params = load_scene(args.model, params)
    base_shape = scene.shape
    bounded = scene.replace(shape=SDF(
        base_shape.module, max_steps=256, throughput_steps=128, dist=2.2,
        march_bound=args.bound))

    imgs = {}
    for tag, sc in (("default", scene), ("march_bound", bounded)):
        img, _ = nrt.pathtrace(sc, params, cam, Direct(training=False),
                               size=256, chunk_size=chunk_for(256),
                               background=0.0, key=jax.random.PRNGKey(0),
                               scan_tiles=True)
        t0 = time.perf_counter()
        for i in range(args.reps):
            img, _ = nrt.pathtrace(sc, params, cam, Direct(training=False),
                                   size=256, chunk_size=chunk_for(256),
                                   background=0.0,
                                   key=jax.random.PRNGKey(1 + i),
                                   scan_tiles=True)
            float(np.asarray(img).sum())
        dt = (time.perf_counter() - t0) / args.reps
        imgs[tag] = np.asarray(img)
        print(f"{tag}: {dt * 1e3:.1f} ms  ({256 * 256 / dt / 1e3:.0f}k "
              "rays/s)")

    d = np.abs(imgs["default"] - imgs["march_bound"])
    npix = int((d.max(axis=-1) > 0.01).sum())
    print(f"image max|delta| {d.max():.3e}, pixels >0.01: {npix}/65536")


if __name__ == "__main__":
    main()
