"""Generate a NeRV-format dataset (per-frame point lights) with our renderer.

Produces ``{out}/train_point/transforms_train.json`` (+test) with a
``light_loc`` per frame and RGBA renders — the exact layout
`scripts/nerv.py` consumes, enabling end-to-end NeRV pipeline runs.

    python scripts/make_nerv_dataset.py --out /tmp/nerv_ds --size 64
"""

import json
import math
import os

import numpy as np

from _common import base_parser, enable_compile_cache, force_cpu_if_requested


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--kind", type=str, default="armadillo")
    ap.add_argument("--train-views", type=int, default=12)
    ap.add_argument("--test-views", type=int, default=4)
    ap.add_argument("--light-scale", type=float, default=1.5)
    ap.set_defaults(size=64)
    args = ap.parse_args()
    force_cpu_if_requested(args)
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.bsdf import ComposeSpatialVarying, Diffuse
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct, Mask
    from neural_raytracing_tpu.lights import PointLights
    from neural_raytracing_tpu.nn import SkipConnMLP
    from make_dataset import procedural_shape

    from neural_raytracing_tpu.cameras import nerf_c2w

    size = args.size
    scene = nrt.Scene(
        shape=procedural_shape(args.kind),
        bsdf=ComposeSpatialVarying(
            [Diffuse((0.7, 0.4, 0.2)), Diffuse((0.3, 0.3, 0.6))],
            sp_var_fn=SkipConnMLP(in_size=3, out=2, num_layers=2,
                                  hidden_size=32, freqs=8, sigma=8.0)),
        lights=PointLights(scale=args.light_scale),
        occlusion="hard")
    params = scene.init(jax.random.PRNGKey(7))
    ca = math.radians(60.0)
    focal = 0.5 * size / math.tan(0.5 * ca)
    rng = np.random.default_rng(0)

    for split, n in [("train", args.train_views), ("test", args.test_views)]:
        base = os.path.join(args.out, f"{split}_point")
        os.makedirs(os.path.join(base, split), exist_ok=True)
        frames = []
        for i in range(n):
            c2w = nerf_c2w(rng.uniform(5, 40), rng.uniform(-180, 180),
                           dist=1.0)
            # independent per-frame light position on a shell
            le, la = math.radians(rng.uniform(10, 60)), math.radians(
                rng.uniform(-180, 180))
            light = 1.3 * np.asarray([
                math.cos(le) * math.sin(la), math.sin(le),
                math.cos(le) * math.cos(la)], np.float32)
            p = dict(params)
            p["lights"] = dict(p["lights"],
                               location=jnp.asarray(light[None]))
            cam = NeRFCamera(cam_to_world=jnp.asarray(c2w[None, :3, :4]),
                             focal=focal)
            img, _ = nrt.pathtrace(scene, p, cam,
                                   Mask(Direct(training=False, horizon_mask=True)),
                                   size=size,
                                   chunk_size=size, background=0.0,
                                   key=jax.random.PRNGKey(i))
            Image.fromarray(
                (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8),
                "RGBA").save(os.path.join(base, split, f"r_{i}.png"))
            frames.append({"file_path": f"{split}/r_{i}",
                           "transform_matrix": c2w.tolist(),
                           "light_loc": light.tolist()})
            print(split, i + 1, "/", n)
        json.dump({"camera_angle_x": ca, "frames": frames},
                  open(os.path.join(base, f"transforms_{split}.json"), "w"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
