"""Diagnose the NeRV brightness miscalibration (VERDICT r3 next #4).

Theory under test: `PointLights` spectrum is
``scale * normalize(intensity) / (c + l d + q d^2)`` (lights.py:89-110 in
the reference — intensity is NORMALIZED, so its magnitude cannot absorb a
scale error), and at light-lr 4e-5 AdamW moves the scalar `scale`/falloff
params by at most ~lr*steps ~ 1.0 over 25k steps.  The generator's GT used
light_scale ~11 (meta.json); the model initializes scale=100 — a ~5x
radiance error that the scalars cannot close, leaving the BSDF to slowly
darken and the run to equilibrate off-brightness.

Probes:
  1. trained light params vs the generator's effective spectrum at d=1.3
  2. per-frame masked brightness ratio render/GT + GT clip fraction
  3. global exposure sweep: tone-mapped PSNR(s * render) over s — if the
     best s is far from 1 and recovers several dB, brightness IS the gap

    python scripts/nerv_brightness_probe.py --data ../data/mesh_gear_nerv3 \
        --model models/nerv_mesh_gear_nerv3
"""

import argparse
import json
import os

import numpy as np

from _common import chunk_for, enable_compile_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=str, default="../data/mesh_gear_nerv3")
    ap.add_argument("--model", type=str,
                    default="models/nerv_mesh_gear_nerv3")
    ap.add_argument("--size", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import neural_raytracing_tpu as nrt
    from nerv import build_scene
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.training import load_scene
    from neural_raytracing_tpu.training.datasets import load_nerv

    test = load_nerv(args.data, args.size, "test")
    meta = json.load(open(f"{args.data}/meta.json"))
    gt_scale = float(meta["light_scale"])

    scene = build_scene(max_steps=128, occlusion="hard")
    params = scene.init(jax.random.PRNGKey(0))
    params = load_scene(args.model, params)

    lp = params["lights"]
    inten = np.asarray(lp["intensity"]).ravel()
    c, l, q, s = (float(lp["const"]), float(lp["linear"]),
                  float(lp["square"]), float(lp["scale"]))
    print(f"learned light: scale {s:.3f} (init 100.0)  "
          f"intensity {np.round(inten, 4).tolist()} "
          f"(|normalized| -> magnitude inert)  falloff c {c:.4f} l {l:.4f} "
          f"q {q:.4f}")
    d = 1.3
    model_spec = s * (inten / max(np.linalg.norm(inten), 1e-9)).mean() / (
        max(c, 1e-6) + max(l, 1e-6) * d + max(q, 1e-6) * d * d)
    gt_spec = gt_scale * (1.0 / np.sqrt(3.0)) / (1e-8 + 1e-8 * d + d * d)
    print(f"mean per-channel spectrum @ d={d}: model {model_spec:.3f} "
          f"vs GT generator {gt_spec:.3f}  (ratio {model_spec / gt_spec:.2f}x)")

    # renders (hard shadows — occlusion arm irrelevant to global brightness)
    n = len(test.images)
    renders = []
    for i in range(n):
        p = dict(params)
        p["lights"] = dict(p["lights"],
                           location=jnp.asarray(test.light_locs[i:i + 1]))
        cam = NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                         focal=test.focal)
        img, _ = nrt.pathtrace(scene, p, cam, Direct(training=False),
                               size=args.size, chunk_size=chunk_for(args.size),
                               background=0.0, key=jax.random.PRNGKey(0))
        renders.append(np.asarray(img)[..., :3])
    renders = np.stack(renders)
    gt = np.stack([np.asarray(im)[..., :3] for im in test.images])
    masks = np.stack([np.asarray(m) for m in test.masks]) > 0.5

    ratios, clipfracs = [], []
    for i in range(n):
        m = masks[i]
        rm = float(renders[i][m].mean())
        gm = float(gt[i][m].mean())
        ratios.append(rm / max(gm, 1e-9))
        clipfracs.append(float((gt[i][m].max(-1) >= 0.99).mean()))
    print(f"masked render/GT brightness ratio: "
          f"median {np.median(ratios):.3f}  per-frame "
          f"{np.round(ratios, 2).tolist()}")
    print(f"GT clip fraction (masked pixels at >=0.99): "
          f"median {np.median(clipfracs):.4f}")

    def tone(x):
        return x / (1.0 + x)

    def psnr_at(scale_mult):
        mse = np.mean((tone(np.clip(renders * scale_mult, 0, None))
                       - tone(gt)) ** 2, axis=(1, 2, 3))
        return float(np.mean(-10.0 * np.log10(np.maximum(mse, 1e-10))))

    sweep = np.exp(np.linspace(np.log(0.2), np.log(5.0), 41))
    vals = [psnr_at(sv) for sv in sweep]
    best = int(np.argmax(vals))
    print(f"exposure sweep: PSNR@1.0 {psnr_at(1.0):.2f}  best "
          f"{vals[best]:.2f} at s={sweep[best]:.3f}")

    os.makedirs("outputs", exist_ok=True)
    json.dump({
        "learned_light": {"scale": s, "const": c, "linear": l, "square": q,
                          "intensity": inten.tolist()},
        "gt_light_scale": gt_scale,
        "spectrum_ratio_model_over_gt": float(model_spec / gt_spec),
        "masked_brightness_ratio_median": float(np.median(ratios)),
        "gt_clip_fraction_median": float(np.median(clipfracs)),
        "psnr_at_1": psnr_at(1.0),
        "psnr_best": vals[best], "s_best": float(sweep[best]),
    }, open("outputs/nerv_brightness_probe.json", "w"), indent=1)
    print("wrote outputs/nerv_brightness_probe.json")


if __name__ == "__main__":
    main()
