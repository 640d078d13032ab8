"""Torch-side probe of the REFERENCE's -log SSIM loss term on our GT.

VERDICT r2 item 1a: round-2 forensics measured — in JAX, with our SSIM
(bit-exact vs pytorch_msssim to 5 decimals) — that the -log SSIM color
term is NET-DARKENING on this GT at 256 scale (positive d(term)/d(render)
pixel sum at ~11x the L1+L2+RMSE magnitude) while balanced at size 64.
The conclusion "the reference's loss would behave identically" was argued
but never demonstrated on the reference's side of the fence.  This probe
closes that: it re-runs the same measurement through an independent TORCH
implementation of the reference's exact loss structure
(/root/reference/pytorch3d/pathtracer/utils.py:337-348 — active-masked
images, F.l1_loss + F.mse_loss + clamped-sqrt RMSE, and
``-ssim(...).log()`` with pytorch_msssim's gaussian-11/sigma-1.5/
valid-conv/K=(0.01,0.03) ssim; the package itself is not installed here,
so the ssim is re-implemented below and cross-checked numerically against
our JAX version on the same tensors).

Stage ``render`` (JAX): render the trained model at sizes 256 and 64,
save got/exp/mask arrays.  Stage ``probe`` (torch, CPU): compute the
reference's per-term losses and d(term)/d(got) gradient sums.  A POSITIVE
ssim-term gradient sum means its net per-pixel pull is downward
(darkening); the base terms' sum is the comparison scale.

    python scripts/ssim_probe.py --stage render --model models/ico_rig256 \
        --data ../data/mesh_ico_rig256
    python scripts/ssim_probe.py --stage probe
"""

import argparse
import json
import os

import numpy as np

from _common import chunk_for, enable_compile_cache

PROBE_NPZ = "outputs/ssim_probe_{size}.npz"


def stage_render(args):
    enable_compile_cache()
    import jax

    import neural_raytracing_tpu as nrt
    from neural_raytracing_tpu.cameras import NeRFCamera
    from neural_raytracing_tpu.integrators import Direct
    from neural_raytracing_tpu.training import load_scene
    from neural_raytracing_tpu.training.datasets import load_nerf_synthetic
    from nerf_synthetic import build_scene

    for size in args.sizes:
        data = load_nerf_synthetic(args.data, size, "train")
        scene = build_scene(max_steps=256)
        params = scene.init(jax.random.PRNGKey(0))
        params = load_scene(args.model, params)
        cam = NeRFCamera(cam_to_world=data.cam_to_worlds[:1],
                         focal=data.focal)
        img, _ = nrt.pathtrace(scene, params, cam, Direct(training=False),
                               size=size, chunk_size=chunk_for(size),
                               background=0.0, key=jax.random.PRNGKey(0))
        got = np.clip(np.asarray(img)[..., :3], 0.0, 1.0)
        exp = np.asarray(data.images[0][..., :3])
        mask = np.asarray(data.masks[0]).astype(np.float32)
        np.savez(PROBE_NPZ.format(size=size), got=got, exp=exp, mask=mask)
        print(f"size {size}: wrote {PROBE_NPZ.format(size=size)} "
              f"(render mean {got.mean():.4f}, GT mean {exp.mean():.4f})")


def torch_ssim(x, y, data_range=1.0, win_size=11, sigma=1.5,
               k1=0.01, k2=0.03):
    """pytorch_msssim's ssim: separable gaussian window, valid conv,
    per-(batch,channel) maps averaged (size_average=True).  NCHW."""
    import torch
    import torch.nn.functional as F

    coords = torch.arange(win_size, dtype=x.dtype) - win_size // 2
    g = torch.exp(-coords.square() / (2.0 * sigma * sigma))
    g = g / g.sum()
    c = x.shape[1]
    kh = g.reshape(1, 1, win_size, 1).expand(c, 1, win_size, 1)
    kw = g.reshape(1, 1, 1, win_size).expand(c, 1, 1, win_size)

    def blur(t):
        t = F.conv2d(t, kh, groups=c)
        return F.conv2d(t, kw, groups=c)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x, mu_y = blur(x), blur(y)
    sxx = blur(x * x) - mu_x * mu_x
    syy = blur(y * y) - mu_y * mu_y
    sxy = blur(x * y) - mu_x * mu_y
    cs = (2.0 * sxy + c2) / (sxx + syy + c2)
    lum = (2.0 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)
    return (lum * cs).mean()


def stage_probe(args):
    import torch
    import torch.nn.functional as F

    report = {}
    for size in args.sizes:
        d = np.load(PROBE_NPZ.format(size=size))
        got = torch.tensor(d["got"][None], dtype=torch.float64,
                           requires_grad=True)
        exp = torch.tensor(d["exp"][None], dtype=torch.float64)
        active = torch.tensor(d["mask"][None], dtype=torch.float64)

        # the reference's color-loss block, verbatim in structure
        # (utils.py:337-348): active-masked images, per-term sums
        got_active = got * active[..., None]
        exp_active = exp * active[..., None]
        l1_loss = F.l1_loss(got_active, exp_active)
        l2_loss = F.mse_loss(got_active, exp_active)
        rmse_loss = l2_loss.clamp(min=1e-10).sqrt()
        ssim_val = torch_ssim(got_active.permute(0, 3, 1, 2),
                              exp_active.permute(0, 3, 1, 2))
        ssim_loss = -ssim_val.log()

        base = l1_loss + l2_loss + rmse_loss
        g_base = torch.autograd.grad(base, got, retain_graph=True)[0]
        g_ssim = torch.autograd.grad(ssim_loss, got)[0]

        # cross-check our JAX implementation on the SAME tensors: value AND
        # gradient sums must match torch — that is the "the reference loss
        # behaves identically" statement, demonstrated from both sides
        import jax
        import jax.numpy as jnp

        from neural_raytracing_tpu.ops.ssim import ssim as jax_ssim

        def jax_ssim_term(got_np):
            ga = (jnp.asarray(got_np) * d["mask"][None][..., None])
            ea = (jnp.asarray(d["exp"][None]) * d["mask"][None][..., None])
            return -jnp.log(jax_ssim(jnp.transpose(ga, (0, 3, 1, 2)),
                                     jnp.transpose(ea, (0, 3, 1, 2))))

        jv = float(jnp.exp(-jax_ssim_term(d["got"][None])))
        g_jax = jax.grad(lambda g: jax_ssim_term(g))(
            jnp.asarray(d["got"][None], jnp.float32))
        g_jax_sum = float(jnp.sum(g_jax))

        row = {
            "ssim_torch": float(ssim_val),
            "ssim_jax": jv,
            "base_terms": float(base),
            "ssim_term": float(ssim_loss),
            "g_base_sum": float(g_base.sum()),
            "g_base_abs_mean": float(g_base.abs().mean()),
            "g_ssim_sum": float(g_ssim.sum()),
            "g_ssim_abs_mean": float(g_ssim.abs().mean()),
            "g_ssim_sum_jax": g_jax_sum,
        }
        report[str(size)] = row
        print(f"size {size}: torch ssim {row['ssim_torch']:.5f} "
              f"(jax {row['ssim_jax']:.5f})  base {row['base_terms']:.4f} "
              f"ssim_term {row['ssim_term']:.4f}")
        print(f"  torch d(base)/d(got): sum {row['g_base_sum']:+.3e}  "
              f"|mean| {row['g_base_abs_mean']:.3e}")
        print(f"  torch d(-logSSIM)/d(got): sum {row['g_ssim_sum']:+.3e}  "
              f"|mean| {row['g_ssim_abs_mean']:.3e}")
        print(f"  jax   d(-logSSIM)/d(got): sum {row['g_ssim_sum_jax']:+.3e}")

    out = "outputs/ssim_probe_report.json"
    json.dump(report, open(out, "w"), indent=1)
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["render", "probe"], required=True)
    ap.add_argument("--model", type=str, default="models/ico_rig256")
    ap.add_argument("--data", type=str, default="../data/mesh_ico_rig256")
    ap.add_argument("--sizes", type=int, nargs="+", default=[256, 64])
    args = ap.parse_args()
    os.makedirs("outputs", exist_ok=True)
    if args.stage == "render":
        stage_render(args)
    else:
        stage_probe(args)


if __name__ == "__main__":
    main()
