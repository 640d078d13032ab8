"""Per-scene golden-image gate for the ``march_bound`` eval accelerator.

VERDICT r3 stretch #9: ``march_bound`` (clip the primary march to the
scene's bounding sphere; reference sdfs.py:111-160 marches unbounded to
``max_t``) is worth 1.36x on eval renders, but its images can differ on
isolated grazing rays whose sphere-trace converges differently from the
clipped start point.  Before it may be used as a default anywhere, this
gate renders default-vs-bounded on TRAINED checkpoints over several test
views per scene and asserts the divergence stays below tolerance:

  * ``max |delta|`` per image <= --tol-max (a grazing ray that lands on
    the other side of a silhouette edge can differ by O(1) in color, so
    the hard cap is on the COUNT of such pixels, not their magnitude)
  * pixels with channel delta > 0.01 <= --tol-pixels per million
  * mean |delta| <= --tol-mean

Writes ``results/march_bound_gate.json`` and exits non-zero on failure —
wire into CI or run manually after a training campaign:

    python scripts/verify_march_bound.py \
        --spec models/blocks_rig256mc:../data/mesh_blocks_rig256 \
        --spec models/dtu_knot200:../data/dtu_knot200:dtu
"""

import argparse
import json
import os
import time

import numpy as np

from _common import chunk_for, enable_compile_cache


def render_pair(scene, bounded, params, cam, size, key):
    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.integrators import Direct

    out = {}
    for tag, sc in (("default", scene), ("bounded", bounded)):
        t0 = time.perf_counter()
        img, _ = nrt.pathtrace(sc, params, cam, Direct(training=False),
                               size=size, chunk_size=chunk_for(size),
                               background=0.0, key=key, scan_tiles=True)
        out[tag] = np.clip(np.asarray(img), 0.0, 1.0)
        out[tag + "_ms"] = (time.perf_counter() - t0) * 1e3
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", action="append", required=True,
                    help="model_dir:data_dir[:family] (family = nerf|dtu; "
                         "default nerf)")
    ap.add_argument("--bound", type=float, default=1.2)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--march", type=int, default=256)
    ap.add_argument("--tol-max", type=float, default=1.0,
                    help="hard cap on per-pixel |delta| (1.0 = any single "
                         "grazing flip tolerated; the count caps below)")
    ap.add_argument("--tol-pixels", type=float, default=100.0,
                    help="max flipped pixels (>0.01) per MILLION rendered")
    ap.add_argument("--tol-mean", type=float, default=1e-4)
    ap.add_argument("--out", type=str,
                    default="../results/march_bound_gate.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    import jax

    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.shapes import SDF
    from neural_raytracing_tpu.training import load_scene
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic

    report = {"bound": args.bound, "size": args.size, "scenes": []}
    ok = True
    for spec in args.spec:
        parts = spec.split(":")
        model_dir, data_dir = parts[0], parts[1]
        family = parts[2] if len(parts) > 2 else "nerf"
        if family == "nerf":
            from nerf_synthetic import build_scene
            scene = build_scene(max_steps=args.march)
            data = load_nerf_synthetic(data_dir, args.size, "test")
            cams = [NeRFCamera(cam_to_world=data.cam_to_worlds[i:i + 1],
                               focal=data.focal)
                    for i in range(min(args.views, len(data.cam_to_worlds)))]
        elif family == "dtu":
            from dtu import build_scene as build_dtu
            from neural_raytracing_tpu.cameras import DTUCamera
            from neural_raytracing_tpu.training.datasets import load_dtu
            scene = build_dtu(max_steps=args.march)
            data = load_dtu(data_dir, args.size)
            src = np.asarray(data.src_size, np.float32)
            cams = [DTUCamera(pose=data.poses[i:i + 1],
                              intrinsic=data.intrinsics[i:i + 1],
                              src_size=src)
                    for i in range(min(args.views, len(data.poses)))]
        else:
            raise SystemExit(f"unknown family {family!r}")

        params = scene.init(jax.random.PRNGKey(0))
        params = load_scene(model_dir, params)
        # copy-based clone: the two configs differ ONLY in march_bound,
        # regardless of what fields SDF grows later
        bounded = scene.replace(
            shape=scene.shape.replace(march_bound=args.bound))

        row = {"model": model_dir, "family": family, "views": []}
        for i, cam in enumerate(cams):
            pair = render_pair(scene, bounded, params, cam, args.size,
                               jax.random.PRNGKey(7 + i))
            d = np.abs(pair["default"] - pair["bounded"])
            flipped = int((d.max(axis=-1) > 0.01).sum())
            per_m = flipped * 1e6 / (args.size * args.size)
            view = {
                "view": i,
                "max_abs_delta": float(d.max()),
                "mean_abs_delta": float(d.mean()),
                "flipped_pixels": flipped,
                "flipped_per_million": per_m,
                "default_ms": pair["default_ms"],
                "bounded_ms": pair["bounded_ms"],
                "pass": bool(d.max() <= args.tol_max
                             and per_m <= args.tol_pixels
                             and d.mean() <= args.tol_mean),
            }
            row["views"].append(view)
            ok = ok and view["pass"]
            print(f"{model_dir} view {i}: max|d|={view['max_abs_delta']:.3e}"
                  f" flipped={flipped} ({per_m:.1f}/M) "
                  f"mean|d|={view['mean_abs_delta']:.2e} "
                  f"{'PASS' if view['pass'] else 'FAIL'}", flush=True)
        report["scenes"].append(row)

    report["pass"] = ok
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(report, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}; gate {'PASS' if ok else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
