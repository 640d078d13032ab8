"""Analytic Path-vs-Direct demonstration on an interreflection GT.

VERDICT r4 next #4 (capability half): on a mirror-plate dataset generated
by ``make_mesh_dataset --mirror-plate R --gt-bounces 2`` the ground truth
contains secondary-bounce light a single-bounce integrator structurally
cannot transport (delta point light + delta conductor: the plate's only
radiance is the reflected OBJECT).  This script rebuilds the exact
analytic GT scene (same seed / light scale from meta.json), renders every
test frame with ``Direct`` and with ``Path`` at matching sample counts,
and reports per-view PSNR against the stored GT — quantifying how much
image the multi-bounce arm recovers (reference rationale:
/root/reference/scripts/path_nerv.py:92-104, integrators.py:275-354).

    python scripts/path_demo.py --data ../data/mesh_gear_mirror100
"""

import json
import os

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--samples", type=int, default=16,
                    help="stochastic Path passes averaged per view")
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--out-json", type=str,
                    default="../results/path_demo.json")
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp

    import neural_raytracing_tpu as nrt
    from make_mesh_dataset import build_gt_scene
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct, Mask, Path
    from neural_raytracing_tpu.ops.math import mse2psnr
    from neural_raytracing_tpu.training.datasets import load_nerv

    meta = json.load(open(os.path.join(args.data, "meta.json")))
    size = int(meta["size"])
    test = load_nerv(args.data, size, "test")
    scene = build_gt_scene(meta["kind"], light_scale=meta["light_scale"],
                           occlusion="hard", material=meta["material"],
                           mirror_plate=meta["mirror_plate"])
    params = scene.init(jax.random.PRNGKey(7))
    chunk = chunk_for(size)

    def render(integ, light, cam, spp):
        p = dict(params)
        p["lights"] = dict(p["lights"],
                           location=jnp.atleast_2d(jnp.asarray(light)))
        acc = None
        for s in range(spp):
            img, _ = nrt.pathtrace(scene, p, cam, integ, size=size,
                                   chunk_size=chunk, background=0.0,
                                   key=jax.random.PRNGKey(1 + s))
            acc = img if acc is None else acc + img
        return np.clip(np.asarray(acc)[..., :3] / spp, 0.0, 1.0)

    rows = []
    strip = []
    for i in range(len(test.images)):
        cam = NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                         focal=test.focal)
        light = test.light_locs[i]
        exp = np.clip(np.asarray(test.images[i]), 0.0, 1.0)
        d = render(Mask(Direct(training=False, horizon_mask=True)),
                   light, cam, 1)
        pth = render(Mask(Path(max_depth=args.max_depth, training=False,
                               horizon_mask=True)),
                     light, cam, args.samples)
        psnr_d = float(mse2psnr(jnp.asarray(
            max(float(np.mean((d - exp) ** 2)), 1e-10))))
        psnr_p = float(mse2psnr(jnp.asarray(
            max(float(np.mean((pth - exp) ** 2)), 1e-10))))
        rows.append({"view": i, "psnr_direct": psnr_d, "psnr_path": psnr_p})
        print(f"view {i}: Direct {psnr_d:.2f}  Path {psnr_p:.2f}  "
              f"delta {psnr_p - psnr_d:+.2f}", flush=True)
        if i < 3:
            strip.append(np.concatenate([exp, d, pth], axis=1))
    if strip:
        save_image("../results/path_demo_gt_direct_path.png",
                   np.concatenate(strip, axis=0))

    avg_d = float(np.mean([r["psnr_direct"] for r in rows]))
    avg_p = float(np.mean([r["psnr_path"] for r in rows]))
    out = {"data": args.data, "samples": args.samples,
           "max_depth": args.max_depth,
           "avg_psnr_direct": avg_d, "avg_psnr_path": avg_p,
           "delta": avg_p - avg_d, "per_view": rows}
    json.dump(out, open(args.out_json, "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_view"},
                     indent=1))


if __name__ == "__main__":
    main()
