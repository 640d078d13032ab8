"""Benchmark: training-step rays/sec of the flagship inverse-rendering model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

``value`` is rays/sec of the full jitted training step (ray-gen, SDF sphere
trace, spatially-varying neural BSDF shading, light field, masked loss,
grads, AdamW update) on the default JAX device (one TPU chip under the
driver).

``vs_baseline`` is the speedup over a PyTorch-CPU implementation of the
SAME workload at EQUAL sample counts (BASELINE.md procedure: the reference
publishes no numbers, so the baseline is measured here; the north star is
>= 10x PyTorch-CPU rays/sec).  The torch step is an independent
implementation of the identical math: same MLP sizes, march steps, ray
count, loss structure.
"""

import os
import argparse
import json
import sys
import time

import numpy as np

# workload config (mirrors the nerf_synthetic training shapes:
# crop 64^2 x 4 views = 16384 rays/step, SDF march 32 steps)
N_VIEWS = int(os.environ.get("NRT_BENCH_VIEWS", "4"))
CROP = int(os.environ.get("NRT_BENCH_CROP", "64"))
SIZE = 256
MARCH_STEPS = 32
THROUGHPUT_STEPS = 64
RAYS_PER_STEP = N_VIEWS * CROP * CROP


def bench_jax(steps: int, warmup: int = 2) -> float:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the remote compile service has been
    # measured at 10-28 min for fresh programs; cached reruns start in
    # seconds (same knobs as scripts/_common.enable_compile_cache)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("NRT_COMPILE_CACHE",
                           os.path.expanduser("~/.nrt_jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

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

    # experiment knobs (RESULTS.md variants); the parity default is "full"
    # march with no bound/overrelaxation and the reference clamped smooth-min
    tp_mode = os.environ.get("NRT_BENCH_THROUGHPUT_MODE", "full")
    mb = os.environ.get("NRT_BENCH_MARCH_BOUND")
    omega = float(os.environ.get("NRT_BENCH_OMEGA", "1.0"))
    stable_min = os.environ.get("NRT_BENCH_STABLE_MIN", "0") == "1"
    scene = nrt.Scene(
        shape=SDF(SphereSDF(n=128, stable_min=stable_min),
                  max_steps=MARCH_STEPS,
                  throughput_steps=THROUGHPUT_STEPS,
                  throughput_mode=tp_mode, omega=omega,
                  march_bound=float(mb) if mb else None),
        bsdf=ComposeSpatialVarying(
            [NeuralBSDF(activation="softplus") for _ in range(8)]),
        lights=LightField())
    opt = make_optimizer({"shape": 8e-5, "bsdf": 8e-4, "lights": 8e-5})
    state = init_train_state(scene, opt, jax.random.PRNGKey(0))
    step = make_train_step(scene, Direct(training=True), opt,
                           size=SIZE, crop_size=CROP, bundle_size=1,
                           donate=False)

    r, t = look_at_view_transform(dist=2.0,
                                  elev=np.linspace(0, 30, N_VIEWS),
                                  azim=np.linspace(-45, 45, N_VIEWS))
    camera = FoVPerspectiveCamera(R=r, T=t)
    exp = jnp.zeros((N_VIEWS, CROP, CROP, 3))
    mask = jnp.ones((N_VIEWS, CROP, CROP))
    uv = (jnp.float32(64.0), jnp.float32(64.0))

    for i in range(warmup):
        state, aux = step(state, camera, uv, exp, mask,
                          jax.random.PRNGKey(i))
    float(np.asarray(aux["loss"]))

    # the end-of-loop sync is a HOST TRANSFER of the chained loss, not
    # block_until_ready: through the axon tunnel block_until_ready can
    # return before the device work drains (CLAUDE.md), inflating rays/s;
    # np.asarray cannot complete until the dependency chain has executed
    t0 = time.perf_counter()
    for i in range(steps):
        state, aux = step(state, camera, uv, exp, mask,
                          jax.random.PRNGKey(100 + i))
    float(np.asarray(aux["loss"]))
    dt = time.perf_counter() - t0
    return steps * RAYS_PER_STEP / dt


def bench_torch_cpu(steps: int = 1, warmup: int = 1) -> float:
    """Equal-sample-count PyTorch-CPU baseline (independent implementation)."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    device = "cpu"

    class FourierMLP(torch.nn.Module):
        def __init__(self, in_size, out, layers, hidden, freqs, sigma,
                     skip=3, act=F.leaky_relu):
            super().__init__()
            self.register_buffer("B", sigma * torch.randn(in_size, freqs))
            enc = in_size + 2 * freqs
            self.inp = torch.nn.Linear(enc, hidden)
            self.layers = torch.nn.ModuleList()
            self.skip = skip
            self.nl = layers
            for i in range(layers):
                w = enc + hidden if (i % skip == 0 and i != layers - 1) else hidden
                self.layers.append(torch.nn.Linear(w, hidden))
            self.out = torch.nn.Linear(hidden, out)
            self.act = act

        def forward(self, x):
            m = x @ self.B
            e = torch.cat([x, m.sin(), m.cos()], -1)
            h = self.inp(e)
            for i, l in enumerate(self.layers):
                if i % self.skip == 0 and i != self.nl - 1:
                    h = torch.cat([h, e], -1)
                h = l(self.act(h))
            return self.out(self.act(h))

    class TorchWorkload(torch.nn.Module):
        def __init__(self):
            super().__init__()
            n = 128
            self.centers = torch.nn.Parameter(0.3 * torch.rand(n, 3) - 0.15)
            self.radii = torch.nn.Parameter(0.2 * torch.rand(n) - 0.1)
            self.shift = FourierMLP(3, 1, 8, 128, 32, 32.0, act=F.softplus)
            self.weights = FourierMLP(3, 8, 16, 256, 128, 128.0)
            self.lobes = torch.nn.ModuleList(
                [FourierMLP(3, 3, 6, 96, 64, 32.0) for _ in range(8)])
            self.light = FourierMLP(3, 3, 10, 256, 16, 32.0)

        def sdf(self, p):
            d = (p[:, None, :] - self.centers).norm(dim=-1) - self.radii
            sm = -torch.log(torch.exp(-32.0 * d).sum(-1).clamp(min=1e-4)) / 32.0
            return sm + self.shift(p)[..., 0]

        def forward(self, r_o, r_d):
            depths = torch.zeros(r_o.shape[0])
            with torch.no_grad():
                for _ in range(MARCH_STEPS):
                    depths = depths + self.sdf(r_o + depths[:, None] * r_d)
                # silhouette min-scan at equal sample count
                best = self.sdf(r_o)
                idx = torch.zeros_like(best, dtype=torch.long)
                for i in range(THROUGHPUT_STEPS):
                    t = (i + 1) * (2.2 / THROUGHPUT_STEPS)
                    sd = self.sdf(r_o + t * r_d)
                    idx = torch.where(sd < best, i + 1, idx)
                    best = torch.minimum(best, sd)
            bp = r_o + (idx[:, None].float() * (2.2 / THROUGHPUT_STEPS)) * r_d
            throughput = -1000.0 * self.sdf(bp)
            p = (r_o + depths[:, None] * r_d).requires_grad_()
            sd = self.sdf(p)
            (n,) = torch.autograd.grad(sd.sum(), p, create_graph=True)
            n = F.normalize(n, dim=-1, eps=1e-6)
            w = torch.sigmoid(self.weights(p))
            light_dir = F.normalize(self.light(p), dim=-1)
            shaded = sum(w[:, i:i + 1] * torch.sigmoid(m(light_dir))
                         for i, m in enumerate(self.lobes))
            return shaded, throughput, n

    model = TorchWorkload()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0)
    r_o = torch.zeros(RAYS_PER_STEP, 3)
    r_o[:, 2] = 2.0
    r_d = F.normalize(torch.randn(RAYS_PER_STEP, 3) * 0.2
                      - torch.tensor([0.0, 0.0, 1.0]), dim=-1)
    target = torch.rand(RAYS_PER_STEP, 3)
    mask = torch.ones(RAYS_PER_STEP)

    def one_step():
        opt.zero_grad()
        shaded, tp, n = model(r_o, r_d)
        color = F.l1_loss(shaded, target) + F.mse_loss(shaded, target)
        sil = F.binary_cross_entropy_with_logits(tp, mask)
        eik = (n.norm(dim=-1) - 1).square().mean()
        (10 * color + 15 * sil + eik).backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return steps * RAYS_PER_STEP / dt


def main():
    import os

    ap = argparse.ArgumentParser()
    # 50-step window: the final host-transfer sync pays one fixed tunnel
    # round trip (~50-60 ms) that belongs to the MEASUREMENT, not the step;
    # at 20 steps it inflates per-step time ~10% (r1-r3 recorded ~651k
    # where the independent 50-step ablate harness and this bench both
    # measure ~706-726k on an idle host — RESULTS.md round 4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--torch-steps", type=int, default=1)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    value = bench_jax(args.steps)

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_baseline.json")
    # baselines are cached PER SHAPE — per-ray torch cost is
    # batch-dependent, so a NRT_BENCH_VIEWS/CROP override gets its own
    # entry instead of re-measuring the ~80 s torch step on every run
    # (ADVICE r4).  Legacy single-shape cache files are migrated in place.
    shape_key = f"{RAYS_PER_STEP}-{MARCH_STEPS}-{THROUGHPUT_STEPS}"

    def load_baselines():
        if not os.path.exists(cache):
            return {}
        cached = json.load(open(cache))
        if "baselines" in cached:
            return dict(cached["baselines"])
        legacy_key = (f"{cached.get('rays_per_step', RAYS_PER_STEP)}-"
                      f"{cached.get('march_steps', MARCH_STEPS)}-"
                      f"{cached.get('throughput_steps', THROUGHPUT_STEPS)}")
        return {legacy_key: cached.get("torch_cpu_rays_per_sec")}

    baseline = None
    if not args.no_cache:
        baselines = load_baselines()
        baseline = baselines.get(shape_key)
        if baseline is None and baselines:
            print(f"# no cached baseline for shape {shape_key} "
                  f"(have: {sorted(baselines)})", file=sys.stderr)
    if args.skip_torch:
        vs = 0.0 if baseline is None else value / baseline
    else:
        if baseline is None:
            # one torch-cpu step at equal sample counts (~80 s); cached so
            # subsequent runs at this shape skip it
            baseline = bench_torch_cpu(args.torch_steps, warmup=0)
            baselines = load_baselines()
            baselines[shape_key] = baseline
            with open(cache, "w") as f:
                json.dump({"baselines": baselines}, f)
        vs = value / baseline

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 2),
    }))
    if baseline is not None:
        print(f"# pytorch-cpu baseline: {baseline:,.1f} rays/s "
              f"(north star: vs_baseline >= 10)", file=sys.stderr)


if __name__ == "__main__":
    main()
