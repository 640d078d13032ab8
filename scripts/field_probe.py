"""Probe a TRAINED SphereSDF field's geometry (degenerate-field forensics).

CLAUDE.md records that trained SphereSDF fields are degenerate distance
fields (|sdf| ~ 0.005 everywhere outside), so the sphere-trace crawls and
the fused kernels' block early-exit barely fires at eval (VERDICT r2 weak
#3) and shadow marches detect no blockers (missing #4).  This probe
measures the actual field against the TRUE distance to the GT mesh:

  * field value vs true point-to-mesh distance on shells around the object
  * along-ray profiles from test cameras (what the march actually sees)
  * the safe step-scale curve: for each field value s, the minimum true
    distance among probe points with field <= s — i.e. how far a march
    could SAFELY step when it reads s (the calibration evidence for any
    step-amplification scheme)

    python scripts/field_probe.py --model models/ico_rig256 --kind ico
"""

import argparse
import json

import numpy as np

from _common import enable_compile_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", type=str, default="models/ico_rig256")
    ap.add_argument("--kind", type=str, default="ico")
    ap.add_argument("--obj-scale", type=float, default=1.0)
    ap.add_argument("--n-probe", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import os

    from make_mesh_dataset import MESHES
    from nerf_synthetic import build_scene
    from neural_raytracing_tpu.raster.meshops import point_face_distance
    from neural_raytracing_tpu.training.checkpoint import load_pytree

    scene = build_scene(max_steps=64)
    sdf = scene.shape
    params = scene.init(jax.random.PRNGKey(0))
    # load ONLY the shape subtree: every pipeline shares the SphereSDF
    # layout even when bsdf/light layouts differ (nerv has 7 lobes)
    params["shape"] = load_pytree(os.path.join(args.model, "shape.msgpack"),
                                  params["shape"])

    verts, faces = MESHES[args.kind]()
    verts = verts * np.float32(args.obj_scale)
    tris = jnp.asarray(verts)[jnp.asarray(faces)]          # [F, 3, 3]

    def true_dist(p):
        # unsigned point-to-mesh distance (sign doesn't matter outside)
        d2, _ = point_face_distance(jnp.asarray(p, jnp.float32), tris)
        return np.sqrt(np.maximum(np.asarray(d2), 0.0))

    rng = np.random.default_rng(0)
    # probe points: uniform in a radius-1.3 ball (march territory)
    p = rng.normal(size=(args.n_probe, 3))
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    p *= rng.uniform(0.05, 1.3, size=(args.n_probe, 1)) ** (1 / 3) * 1.3

    field = np.asarray(sdf.sdf(params["shape"], jnp.asarray(p)))
    td = true_dist(p)
    outside = td > 0.02

    print(f"probe points: {args.n_probe}, outside-surface: {outside.sum()}")
    print("true_dist deciles:", np.round(np.percentile(
        td[outside], [10, 30, 50, 70, 90]), 4))
    print("field deciles:    ", np.round(np.percentile(
        field[outside], [10, 30, 50, 70, 90]), 4))

    # field-vs-distance table: bucket by true distance
    bins = [0.02, 0.05, 0.1, 0.2, 0.4, 0.8, 1.6]
    rows = []
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = (td >= lo) & (td < hi)
        if m.sum() == 0:
            continue
        rows.append({
            "true_dist": f"[{lo},{hi})", "n": int(m.sum()),
            "field_min": float(field[m].min()),
            "field_med": float(np.median(field[m])),
            "field_max": float(field[m].max()),
        })
        r = rows[-1]
        print(f"d in {r['true_dist']:>12}: field min {r['field_min']:+.4f} "
              f"med {r['field_med']:+.4f} max {r['field_max']:+.4f}")

    # safe step-scale curve: for field-value buckets, the minimum true
    # distance — the largest UNIVERSALLY safe step when the march reads s
    print("\nsafe-step curve (step the march could take per field value):")
    fbins = np.percentile(field[outside], [0, 20, 40, 60, 80, 95, 100])
    curve = []
    for lo, hi in zip(fbins[:-1], fbins[1:]):
        m = outside & (field >= lo) & (field <= hi)
        if m.sum() < 10:
            continue
        safe = float(td[m].min())
        med = float(np.median(td[m]))
        curve.append({"field_lo": float(lo), "field_hi": float(hi),
                      "n": int(m.sum()), "safe_step": safe,
                      "median_true": med})
        print(f"field in [{lo:+.4f},{hi:+.4f}]: safe step {safe:.4f} "
              f"(median true dist {med:.4f}, ratio {med / max(1e-6, (lo + hi) / 2):+.1f})")

    # along-ray profile from a test-style camera (what the march sees)
    r_o = np.asarray([0.0, 0.0, 1.2], np.float32)
    for ang in (0.0, 0.15, 0.3):
        r_d = np.asarray([np.sin(ang), 0.0, -np.cos(ang)], np.float32)
        ts = np.linspace(0.0, 2.2, 45).astype(np.float32)
        pts = r_o[None] + ts[:, None] * r_d[None]
        f = np.asarray(sdf.sdf(params["shape"], jnp.asarray(pts)))
        t_true = true_dist(pts)
        print(f"\nray angle {ang:.2f}: t, field, true_dist")
        for i in range(0, 45, 4):
            print(f"  t={ts[i]:.2f} field={f[i]:+.4f} true={t_true[i]:.4f}")

    json.dump({"rows": rows, "curve": curve},
              open("outputs/field_probe.json", "w"), indent=1)
    print("\nwrote outputs/field_probe.json")


if __name__ == "__main__":
    main()
