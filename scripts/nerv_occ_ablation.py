"""Self-shadowing ablation on a trained NeRV model (VERDICT r2 missing #4).

Round-2 recorded "soft == hard to 0.01 dB" and concluded the learned
occlusion was a no-op.  Direct probing (round 3) shows the opposite: the
marched shadow test DOES detect blockers (~37% of shadow rays on a test
frame) and the occ MLP learned attenuation ~0.02 at blocked points — soft
agrees with hard because the occlusion converged to (correct) near-hard
shadows.  The discriminating ablation is therefore soft (learned occ) vs
NO occlusion: if the GT has self-shadowing and the occlusion is real, the
no-occ arm must score measurably worse.

Renders the full test split under occlusion in {none, learned, hard},
reports tone-mapped PSNR per arm + per-frame deltas, and saves a
GT/none/learned strip for the most-shadowed frame.

    python scripts/nerv_occ_ablation.py --data ../data/mesh_gear_nerv2 \
        --model models/nerv_mesh_gear_nerv2
"""

import argparse
import json

import numpy as np

from _common import chunk_for, enable_compile_cache, save_image


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=str, default="../data/mesh_gear_nerv2")
    ap.add_argument("--model", type=str,
                    default="models/nerv_mesh_gear_nerv2")
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
    n = len(test.images)

    def tone(x):
        return x / (1.0 + x)

    renders = {}
    arms = (("none", False), ("learned", False), ("hard", False),
            ("learned+hm", True))
    for arm, horizon in arms:
        occ_mode = arm.split("+")[0]
        scene = build_scene(max_steps=128, occlusion=occ_mode)
        params = scene.init(jax.random.PRNGKey(0))
        params = load_scene(args.model, params)
        integ = Direct(training=False, horizon_mask=horizon)
        out = []
        for i in range(n):
            p = dict(params)
            p["lights"] = dict(p["lights"],
                               location=jnp.asarray(test.light_locs[i:i + 1]))
            cam = NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                             focal=test.focal)
            img, _ = nrt.pathtrace(scene, p, cam, integ,
                                   size=args.size,
                                   chunk_size=chunk_for(args.size),
                                   background=0.0, key=jax.random.PRNGKey(0))
            out.append(np.asarray(img)[..., :3])
        renders[arm] = np.stack(out)
        print(f"{arm}: rendered {n} views, mean {renders[arm].mean():.4f}")

    gt = np.stack([np.asarray(im)[..., :3] for im in test.images])
    report = {}
    per_frame = {}
    for occ_mode, r in renders.items():
        mse = np.mean((tone(np.clip(r, 0, None)) - tone(gt)) ** 2,
                      axis=(1, 2, 3))
        psnr = -10.0 * np.log10(np.maximum(mse, 1e-10))
        report[occ_mode] = float(psnr.mean())
        per_frame[occ_mode] = psnr
        print(f"{occ_mode}: tone-mapped PSNR avg {psnr.mean():.2f} "
              f"(per-frame {np.round(psnr, 2).tolist()})")
    black = -10.0 * np.log10(np.maximum(
        np.mean(tone(gt) ** 2, axis=(1, 2, 3)), 1e-10))
    print(f"black baseline avg {black.mean():.2f}")

    d = per_frame["learned"] - per_frame["none"]
    print(f"\nlearned - none: avg {d.mean():+.2f} dB, "
          f"best frame {d.max():+.2f}, worst {d.min():+.2f}")
    dh = per_frame["learned"] - per_frame["hard"]
    print(f"learned - hard: avg {dh.mean():+.2f} dB")
    dm = per_frame["learned+hm"] - per_frame["learned"]
    print(f"horizon mask on top of learned: avg {dm.mean():+.2f} dB "
          f"(per-frame {np.round(dm, 2).tolist()})")

    # image strip of the frame where occlusion matters most
    k = int(np.argmax(d))
    strip = np.concatenate([
        np.clip(tone(gt[k]), 0, 1),
        np.clip(tone(np.clip(renders["none"][k], 0, None)), 0, 1),
        np.clip(tone(np.clip(renders["learned"][k], 0, None)), 0, 1),
        np.clip(tone(np.clip(renders["hard"][k], 0, None)), 0, 1),
    ], axis=1)
    save_image("outputs/nerv_occ_ablation_strip.png", strip)
    print(f"strip (GT | none | learned | hard) for frame {k} -> "
          "outputs/nerv_occ_ablation_strip.png")
    json.dump({"avg_psnr": report, "black": float(black.mean()),
               "learned_minus_none": d.tolist(),
               "strip_frame": k},
              open("outputs/nerv_occ_ablation.json", "w"), indent=1)


if __name__ == "__main__":
    main()
