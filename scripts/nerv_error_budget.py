"""Ranked error budget for a trained NeRV model (what costs the dB?).

VERDICT r4 next #5: the gear NeRV model meets the +4-dB-over-black bar
but nothing attributes the remaining error to geometry vs shadows vs
specular.  This probe partitions every test frame into regions derived
from the ANALYTIC GT scene (rebuildable because the generator is seeded
and meta.json records its args):

  * silhouette  — pixels where the model's hit mask disagrees with GT alpha
  * shadow      — GT pixels that change when GT occlusion is disabled
                  (hard-vs-none re-render of the analytic scene)
  * specular    — GT-hit pixels whose conductor mixture weight > 0.5
  * diffuse-lit — the remaining object pixels

and reports each region's share of the total tone-mapped MSE (the NeRV
metric space, training_utils.py:795-853) plus its isolated PSNR, ranked.
Also measures the trained field's normal error against GT mesh normals
at true surface points (field_probe companion).

    python scripts/nerv_error_budget.py --data ../data/mesh_gear_nerv5
"""

import json
import os

import numpy as np

from _common import base_parser, chunk_for, force_cpu_if_requested, save_image


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--dist", type=float, default=2.2)
    ap.add_argument("--shadows", type=str, default="learned",
                    choices=["hard", "learned", "none"],
                    help="model-render occlusion mode (the NeRV eval "
                         "default is the learned occ MLP)")
    ap.add_argument("--shadow-thresh", type=float, default=0.01,
                    help="per-pixel |hard - none| threshold defining the "
                         "GT shadow region")
    ap.add_argument("--out-json", type=str,
                    default="../results/nerv_error_budget.json")
    ap.set_defaults(size=200)
    args = ap.parse_args()
    force_cpu_if_requested(args)

    import jax
    import jax.numpy as jnp

    import neural_raytracing_tpu as nrt
    from make_mesh_dataset import MESHES, build_gt_scene
    from nerv import build_scene
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct, Mask
    from neural_raytracing_tpu.ops.math import mse2psnr, normalize
    from neural_raytracing_tpu.training import (
        init_train_state, load_scene, make_optimizer,
    )
    from neural_raytracing_tpu.training.datasets import load_nerv

    name = args.data.rstrip("/").split("/")[-1]
    meta = json.load(open(os.path.join(args.data, "meta.json")))
    size = args.size
    test = load_nerv(args.data, size, "test")
    chunk = chunk_for(size)

    # trained model
    scene = build_scene(max_steps=128, dist=args.dist,
                        occlusion=args.shadows)
    opt = make_optimizer({"shape": 1e-4})
    params = init_train_state(scene, opt, jax.random.PRNGKey(0)).params
    params = load_scene(f"{args.models}/nerv_{name}", params)

    # analytic GT scene (same seed/palette as the generator)
    gt_scene = build_gt_scene(meta["kind"],
                              light_scale=meta["light_scale"],
                              occlusion="hard",
                              material=meta.get("material", "default"),
                              mirror_plate=meta.get("mirror_plate", 0.0))
    gt_params = gt_scene.init(jax.random.PRNGKey(7))
    gt_none = gt_scene.replace(occlusion="none")

    def render(sc, p, cam, light, with_mask=True):
        p = dict(p)
        p["lights"] = dict(p["lights"],
                           location=jnp.atleast_2d(jnp.asarray(light)))
        integ = (Mask(Direct(training=False, horizon_mask=True)) if with_mask
                 else Direct(training=False, horizon_mask=True))
        img, _ = nrt.pathtrace(sc, p, cam, integ, size=size,
                               chunk_size=chunk, background=0.0,
                               key=jax.random.PRNGKey(3))
        return np.asarray(img)

    def tone(x):
        return x / (1.0 + x)

    region_sse = {k: 0.0 for k in
                  ("silhouette", "shadow", "specular", "diffuse_lit")}
    region_px = {k: 0 for k in region_sse}
    total_sse, total_px = 0.0, 0
    rows = []
    for i in range(len(test.images)):
        cam = NeRFCamera(cam_to_world=test.cam_to_worlds[i:i + 1],
                         focal=test.focal)
        light = test.light_locs[i]
        exp = np.clip(np.asarray(test.images[i]), 0.0, 1.0)

        got4 = render(scene, params, cam, light)
        got = np.clip(got4[..., :3], 0.0, 1.0)
        model_hit = got4[..., 3] > 0.5

        gt_hard = render(gt_scene, gt_params, cam, light)
        gt_alpha = gt_hard[..., 3] > 0.5
        gt_soft = render(gt_none, gt_params, cam, light)
        shadow = (np.abs(gt_hard[..., :3] - gt_soft[..., :3]).max(-1)
                  > args.shadow_thresh) & gt_alpha

        # conductor weight at true hit points -> specular region
        from neural_raytracing_tpu.render import _tile_positions
        rays = np.asarray(cam.sample_positions(
            _tile_positions(0.0, 0.0, size), size=size,
            bundle_size=1))[0, ..., 0, :]
        it, hit = gt_scene.shape.intersect(gt_params["shape"],
                                           jnp.asarray(rays))
        w, _ = gt_scene.bsdf.normalized_weights(gt_params["bsdf"], it.p)
        spec = (np.asarray(w)[..., -1] > 0.5) & np.asarray(hit) & gt_alpha

        err = (tone(got) - tone(exp)) ** 2
        err_px = err.mean(-1)
        sil = model_hit != gt_alpha
        masks = {
            "silhouette": sil,
            "shadow": shadow & ~sil,
            "specular": spec & ~shadow & ~sil,
            "diffuse_lit": gt_alpha & ~spec & ~shadow & ~sil,
        }
        for k, m in masks.items():
            region_sse[k] += float(err_px[m].sum())
            region_px[k] += int(m.sum())
        total_sse += float(err_px.sum())
        total_px += err_px.size
        rows.append({"view": i,
                     "psnr": float(mse2psnr(jnp.asarray(
                         max(float(err_px.mean()), 1e-10))))})
        if i < 3:
            viz = np.zeros(err_px.shape + (3,), np.float32)
            viz[masks["shadow"]] = [0.2, 0.2, 1.0]
            viz[masks["specular"]] = [1.0, 1.0, 0.2]
            viz[masks["silhouette"]] = [1.0, 0.2, 0.2]
            save_image(f"../results/nerv_budget_regions_{i}.png",
                       np.concatenate([exp, got, viz], axis=1))
        print(f"view {i}: PSNR {rows[-1]['psnr']:.2f}", flush=True)

    budget = []
    for k in region_sse:
        px = max(region_px[k], 1)
        budget.append({
            "region": k,
            "share_of_total_mse": region_sse[k] / max(total_sse, 1e-12),
            "pixel_fraction": region_px[k] / max(total_px, 1),
            "region_psnr": float(mse2psnr(jnp.asarray(
                max(region_sse[k] / px, 1e-10)))),
        })
    budget.sort(key=lambda r: -r["share_of_total_mse"])

    # normals error at true surface points (GT mesh faces, area-weighted)
    verts, faces = MESHES[meta["kind"]]()
    rng = np.random.default_rng(0)
    tri = verts[faces]
    n_f = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = np.linalg.norm(n_f, axis=-1) / 2.0
    n_f = n_f / np.maximum(np.linalg.norm(n_f, axis=-1, keepdims=True),
                           1e-12)
    fi = rng.choice(len(faces), 4096, p=area / area.sum())
    r1, r2 = rng.uniform(size=(2, 4096))
    s = np.sqrt(r1)
    pts = (tri[fi, 0] * (1 - s)[:, None]
           + tri[fi, 1] * (s * (1 - r2))[:, None]
           + tri[fi, 2] * (s * r2)[:, None]).astype(np.float32)
    model_n = np.asarray(normalize(
        scene.shape.normals(params["shape"], jnp.asarray(pts)), eps=1e-6))
    cosang = np.clip(np.abs((model_n * n_f[fi]).sum(-1)), 0, 1)
    ang = np.degrees(np.arccos(cosang))
    normals = {"median_deg": float(np.median(ang)),
               "p90_deg": float(np.percentile(ang, 90)),
               "mean_deg": float(np.mean(ang))}

    out = {"data": args.data, "shadows": args.shadows,
           "avg_psnr_tonemapped": float(np.mean([r["psnr"] for r in rows])),
           "budget": budget, "normals_vs_gt_mesh": normals,
           "per_view": rows}
    json.dump(out, open(args.out_json, "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_view"},
                     indent=1))


if __name__ == "__main__":
    main()
