"""Training step and host loop.

Behavioral parity: the reference's per-dataset harnesses share one skeleton
(training_utils.py:211-300 ``train_nerf`` and siblings):
  LossSampler picks N views -> build camera batch -> random crop ->
  ``pathtrace_sample`` with NeRFIntegrator(sub) -> ``masked_loss``
  (+ eikonal / regularizers) -> AdamW step -> periodic checkpoint/validation.

TPU-first: the entire step — camera ray-gen, sphere trace, shading, loss,
grads, optimizer update — is ONE jitted pure function with static crop
shapes; the host loop only does view selection, crop-index RNG and data
slicing.  The same step function is shard-mapped over a device mesh by
``neural_raytracing_tpu.parallel`` (rays sharded over the view axis,
params replicated, grads psum'd by jit autosharding).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..integrators import NeRFIntegrator
from ..ops.losses import masked_loss
from ..ops.math import eikonal_loss
from ..render import _tile_positions
from ..scene import Scene
from .loss_sampler import LossSampler


class TrainState(NamedTuple):
    params: dict
    opt_state: object
    step: jax.Array


def default_extra_loss(it, got, exp, mask):
    """Eikonal regularizer on the raw SDF gradients (nerf_synthetic.py:86-90)."""
    if it.raw_normals is None:
        return 0.0
    return eikonal_loss(it.raw_normals)


def build_step_fn(scene: Scene, integrator, optimizer, *, size: int,
                  crop_size: int, bundle_size: int = 1,
                  mask_weight: float = 15.0, tone_mapping: bool = False,
                  with_ssim: bool = True, with_noise=False,
                  extra_loss: Callable = default_extra_loss,
                  space_reg: Optional[Callable] = None,
                  n_real_views: Optional[int] = None,
                  skip_nan_updates: bool = False):
    """The un-jitted ``(state, camera, uv, exp, mask, key) -> (state, aux)``.

    ``exp``/``mask`` are the ``[N, S, S, 3]`` / ``[N, S, S]`` ground-truth
    crop; ``uv`` the crop offset; ``camera`` a pytree camera batch.

    ``n_real_views``: when the view axis was padded to a device-mesh
    multiple (parallel.pad_batch), the loss — including extra_loss — runs
    on the first ``n_real_views`` views only, so padded views contribute
    zero gradient and the step exactly matches its unsharded counterpart.

    ``space_reg(params, key) -> scalar``: an optional volumetric
    regularizer sampled at fresh random points each step (e.g. the
    full-space eikonal term the reference's nerv.py:110 leaves as a TODO
    — the at-hit eikonal in ``extra_loss`` goes silent exactly when the
    field degenerates and nothing hits).
    """
    import optax

    train_integrator = NeRFIntegrator(integrator)

    def slice_views(tree, n_padded):
        return jax.tree_util.tree_map(
            lambda leaf: leaf[:n_real_views]
            if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == n_padded) else leaf,
            tree)

    def loss_fn(params, camera, uv, exp, mask, key):
        if space_reg is None:
            ckey, ikey = jax.random.split(key)
            rkey = None
        else:
            # 3-way split ONLY when the volumetric term is on, so existing
            # runs/tests keep their exact PRNG streams
            ckey, ikey, rkey = jax.random.split(key, 3)
        positions = _tile_positions(uv[0], uv[1], crop_size)
        rays = camera.sample_positions(positions, key=ckey,
                                       bundle_size=bundle_size, size=size,
                                       with_noise=with_noise)
        values, active, it = train_integrator.sample(scene, params, rays,
                                                     key=ikey, training=True)
        got = jnp.mean(values, axis=-2)                     # over bundle
        throughput = jnp.mean(it.throughput, axis=-1)       # over bundle
        if n_real_views is not None:
            n_padded = got.shape[0]
            got, throughput, it = (got[:n_real_views],
                                   throughput[:n_real_views],
                                   slice_views(it, n_padded))
            exp, mask = exp[:n_real_views], mask[:n_real_views]
        loss = masked_loss(got[..., :3], exp, throughput, mask,
                           mask_weight=mask_weight,
                           tone_mapping=tone_mapping, with_ssim=with_ssim)
        loss = loss + extra_loss(it, got, exp, mask)
        if space_reg is not None:
            loss = loss + space_reg(params, rkey)
        return loss, (got, it)

    def step(state: TrainState, camera, uv, exp, mask, key):
        (loss, (got, it)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, camera, uv, exp, mask, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        if skip_nan_updates:
            # reference ``train`` skips steps whose loss is NaN
            # (training_utils.py:112); done branch-free inside the jitted
            # step so the host pipeline never stalls: a bad step keeps the
            # old params/opt state and does not advance the counter
            good = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
            keep = lambda new, old: jnp.where(good, new, old)
            params = jax.tree_util.tree_map(keep, params, state.params)
            opt_state = jax.tree_util.tree_map(keep, opt_state,
                                               state.opt_state)
            new_step = state.step + good.astype(state.step.dtype)
        else:
            new_step = state.step + 1
        new_state = TrainState(params, opt_state, new_step)
        return new_state, {"loss": loss, "got": got}

    return step


def make_train_step(scene: Scene, integrator, optimizer, donate: bool = True,
                    **kwargs):
    """Jitted single-host train step (see :func:`build_step_fn`)."""
    step = build_step_fn(scene, integrator, optimizer, **kwargs)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def device_dataset(images, masks, cam_to_worlds, crop_size: int,
                   light_locs=None, max_mask_px: Optional[int] = None):
    """Pack a train split for the ON-DEVICE data path (see
    :func:`make_device_data_step`).

    Precomputes per-view object-mask pixel coordinates (padded to a fixed
    length) so mask-centered crop sampling (rand_uv_mask semantics) runs
    inside the jitted step.  Everything is uploaded once; per-step host
    traffic drops to (state, key).
    """
    images = jnp.asarray(np.asarray(images)[..., :3], jnp.float32)
    masks = jnp.asarray(np.asarray(masks), jnp.float32)
    v = images.shape[0]
    px, counts = [], []
    cap = 0
    host_masks = np.asarray(masks)
    coords = []
    for i in range(v):
        ys, xs = np.nonzero(host_masks[i] > 0.5)
        coords.append((ys, xs))
        cap = max(cap, len(ys))
    cap = max(1, cap if max_mask_px is None else min(cap, max_mask_px))
    for ys, xs in coords:
        n = min(len(ys), cap)
        arr = np.zeros((cap, 2), np.int32)
        if n:
            sel = np.linspace(0, len(ys) - 1, n).astype(np.int64)
            arr[:n, 0] = ys[sel]
            arr[:n, 1] = xs[sel]
        px.append(arr)
        counts.append(max(n, 1))
    data = {
        "images": images,
        "masks": masks,
        "c2ws": jnp.asarray(np.asarray(cam_to_worlds), jnp.float32),
        "mask_px": jnp.asarray(np.stack(px)),
        "mask_counts": jnp.asarray(np.asarray(counts, np.int32)),
    }
    if light_locs is not None:
        data["light_locs"] = jnp.asarray(np.asarray(light_locs), jnp.float32)
    return jax.device_put(data)


def make_device_data_step(scene: Scene, integrator, optimizer,
                          camera_builder: Callable, *, n_views: int,
                          size: int, crop_size: int, mask_crops: bool = True,
                          with_light_locs: bool = False,
                          donate: bool = True, **kwargs):
    """A jitted ``(state, data, key) -> (state, aux)`` step whose view
    selection, crop sampling, GT gather, and camera construction all run
    ON DEVICE.

    TPU-first data path: the host loop otherwise re-slices and re-ships
    ~n_views*crop² of GT plus a camera pytree through the (high-latency)
    interconnect every step.  ``data`` comes from :func:`device_dataset`;
    ``camera_builder(c2w_batch) -> camera pytree`` is traced inside the
    step (e.g. ``lambda c: NeRFCamera(cam_to_world=c, focal=focal)``).
    View selection is uniform (the host path's loss-proportional
    LossSampler needs host feedback); crops are mask-centered on the
    first view (rand_uv_mask semantics) or uniform.
    """
    step = build_step_fn(scene, integrator, optimizer, size=size,
                         crop_size=crop_size, **kwargs)
    half = crop_size // 2

    def dstep(state: TrainState, data, key):
        kv, ku, skey = jax.random.split(key, 3)
        v = data["images"].shape[0]
        idxs = jax.random.randint(kv, (n_views,), 0, v)
        if mask_crops:
            cnt = data["mask_counts"][idxs[0]]
            j = jax.random.randint(ku, (), 0, cnt)
            yx = data["mask_px"][idxs[0], j]
            u = jnp.clip(yx[0] - half, 0, size - crop_size)
            w = jnp.clip(yx[1] - half, 0, size - crop_size)
        else:
            u = jax.random.randint(ku, (), 0, size - crop_size + 1)
            w = jax.random.randint(jax.random.fold_in(ku, 1), (), 0,
                                   size - crop_size + 1)

        def crop_img(vi):
            return jax.lax.dynamic_slice(data["images"][vi], (u, w, 0),
                                         (crop_size, crop_size, 3))

        def crop_mask(vi):
            return jax.lax.dynamic_slice(data["masks"][vi], (u, w),
                                         (crop_size, crop_size))

        exp = jax.vmap(crop_img)(idxs)
        mask = jax.vmap(crop_mask)(idxs)
        camera = camera_builder(data["c2ws"][idxs])
        if with_light_locs:
            params = dict(state.params)
            params["lights"] = dict(params["lights"],
                                    location=data["light_locs"][idxs])
            state = state._replace(params=params)
        return step(state, camera, (u.astype(jnp.float32),
                                    w.astype(jnp.float32)), exp, mask, skey)

    return jax.jit(dstep, donate_argnums=(0,) if donate else ())


def init_train_state(scene: Scene, optimizer, key) -> TrainState:
    params = scene.init(key)
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def rand_uv(rng: np.random.Generator, w: int, h: int, size: int):
    return (int(rng.integers(0, w - size + 1)),
            int(rng.integers(0, h - size + 1)))


def rand_uv_mask(rng: np.random.Generator, mask: np.ndarray, size: int):
    """Crop corner centered on a random nonzero mask pixel (utils.py:378-383).

    Falls back to a uniform crop when the mask interior is empty.
    """
    h, w = mask.shape[:2]
    half = size // 2
    ys, xs = np.nonzero(np.asarray(mask) > 0.5)
    if len(ys) == 0:
        return rand_uv(rng, h, w, size)
    i = int(rng.integers(0, len(ys)))
    u = int(np.clip(ys[i] - half, 0, h - size))
    v = int(np.clip(xs[i] - half, 0, w - size))
    return u, v


def train(scene: Scene, integrator, optimizer, state: TrainState,
          make_camera: Callable, exp_imgs: np.ndarray, exp_masks: np.ndarray,
          key, *, size: int, crop_size: int, iters: int, n_views: int = 3,
          bundle_size: int = 1, mask_weight: float = 15.0,
          tone_mapping: bool = False, with_ssim: bool = True,
          extra_loss: Callable = default_extra_loss,
          space_reg: Optional[Callable] = None,
          light_update: Optional[Callable] = None,
          save_fn: Optional[Callable] = None, ckpt_freq: int = 0,
          valid_freq: int = 0, valid_fn: Optional[Callable] = None,
          log_every: int = 100, log_fn: Callable = print,
          metrics: Optional[list] = None,
          mesh=None, seed: int = 0, step_fn=None,
          uv_select: Optional[Callable] = None,
          nan_policy: str = "raise", device_data=None,
          camera_builder: Optional[Callable] = None):
    """Generic host training loop shared by all dataset harnesses.

    ``make_camera(idxs) -> camera pytree`` builds the view batch;
    ``light_update(params, camera, idxs) -> params`` implements per-step
    light moves (colocated-light training, colocate.py:109);
    ``exp_imgs [V, H, W, 3]``, ``exp_masks [V, H, W]``;
    ``valid_fn(state, step)`` runs every ``valid_freq`` steps (periodic
    validation renders, training_utils.py:289-299); per-step scalars are
    appended to ``metrics`` when a list is passed.
    ``nan_policy``: "raise" aborts on a non-finite loss (the reference's
    train_nerf, training_utils.py:274-278); "skip" drops the update and
    continues (the reference's train, training_utils.py:112), aborting only
    after 200 CONSECUTIVE bad steps (params stay clean when skipping, so a
    persistent NaN means the batch itself diverges).
    Returns (state, losses).
    """
    assert nan_policy in ("raise", "skip"), nan_policy
    skip_nan = nan_policy == "skip"
    # label metrics/logs/valid callbacks with the GLOBAL attempted step so
    # resumed and multi-phase runs (e.g. half-res warmup -> full-res) emit
    # one continuous curve; state.step holds the applied-step count at entry
    base = int(np.asarray(state.step))
    if device_data is not None:
        # ON-DEVICE data path: view selection / crop sampling / GT gather /
        # camera construction run inside the jitted step — per-step host
        # traffic is (state, key) only.  ``device_data`` comes from
        # :func:`device_dataset`; ``camera_builder`` traces the camera.
        assert camera_builder is not None
        if uv_select is not None and uv_select is not rand_uv_mask:
            # the device path implements only the built-in mask-centered
            # sampling (rand_uv_mask); silently swapping in a different crop
            # distribution would diverge from the host path without warning
            raise ValueError(
                "device_data supports uv_select in (None, rand_uv_mask) only; "
                "use the host path for custom crop samplers")
        dstep = make_device_data_step(
            scene, integrator, optimizer, camera_builder, n_views=n_views,
            size=size, crop_size=crop_size,
            mask_crops=uv_select is not None,
            with_light_locs="light_locs" in device_data,
            bundle_size=bundle_size, mask_weight=mask_weight,
            tone_mapping=tone_mapping, with_ssim=with_ssim,
            extra_loss=extra_loss, space_reg=space_reg,
            skip_nan_updates=skip_nan, donate=False)
        losses = []
        t0 = time.time()
        rays_per_step = n_views * crop_size * crop_size * bundle_size
        pending = None
        consecutive_bad = 0
        for i in range(iters):
            key, skey = jax.random.split(key)
            state, aux = dstep(state, device_data, skey)
            if pending is not None:
                loss = float(pending)
                if not np.isfinite(loss):
                    if not skip_nan:
                        raise FloatingPointError(
                            f"Unexpected NaN loss at step {i - 1}")
                    consecutive_bad += 1
                    if consecutive_bad >= 200:
                        raise FloatingPointError(
                            f"200 consecutive non-finite losses at {i - 1}")
                else:
                    consecutive_bad = 0
                    losses.append(loss)
                    if log_every and ((i - 1) % log_every) == 0:
                        rps = (i * rays_per_step) / max(time.time() - t0,
                                                        1e-9)
                        log_fn(f"step {base + i - 1:6d} loss {loss:.5f} "
                               f"rays/s {rps:,.0f}")
                    if metrics is not None:
                        metrics.append({
                            "step": base + i - 1, "loss": loss,
                            "rays_per_sec": (i * rays_per_step) / max(
                                time.time() - t0, 1e-9)})
            pending = aux["loss"]
            if save_fn is not None and ckpt_freq and (i % ckpt_freq) == 0 \
                    and i:
                save_fn(state, base + i)
            if valid_fn is not None and valid_freq and (i % valid_freq) == 0:
                valid_fn(state, base + i)
        if pending is not None:
            losses.append(float(pending))
        return state, losses
    if step_fn is None:
        if mesh is not None:
            from ..parallel import make_parallel_train_step, replicate
            step_fn = make_parallel_train_step(
                scene, integrator, optimizer, mesh, n_views=n_views,
                size=size, crop_size=crop_size, bundle_size=bundle_size,
                mask_weight=mask_weight, tone_mapping=tone_mapping,
                with_ssim=with_ssim, extra_loss=extra_loss,
                space_reg=space_reg, skip_nan_updates=skip_nan)
            state = replicate(state, mesh)
        else:
            step_fn = make_train_step(
                scene, integrator, optimizer, size=size, crop_size=crop_size,
                bundle_size=bundle_size, mask_weight=mask_weight,
                tone_mapping=tone_mapping, with_ssim=with_ssim,
                extra_loss=extra_loss, space_reg=space_reg,
                skip_nan_updates=skip_nan)

    selector = LossSampler(len(exp_imgs))
    rng = np.random.default_rng(seed)
    losses = []
    t0 = time.time()
    rays_done = 0
    # the loss scalar is resolved ONE step behind so the host never blocks
    # on the device mid-pipeline (matters on high-latency interconnects)
    pending = None

    consecutive_bad = [0]

    def resolve(pending, i):
        p_idxs, p_loss = pending
        loss = float(p_loss)
        if not np.isfinite(loss):
            if not skip_nan:
                raise FloatingPointError(
                    f"Unexpected NaN loss at step {base + i - 1}")
            consecutive_bad[0] += 1
            log_fn(f"step {base + i - 1:6d} non-finite loss — update "
                   f"skipped ({consecutive_bad[0]} consecutive)")
            if consecutive_bad[0] >= 200:
                raise FloatingPointError(
                    f"200 consecutive non-finite losses at step "
                    f"{base + i - 1}")
            return
        consecutive_bad[0] = 0
        losses.append(loss)
        selector.update_idxs(p_idxs, loss)
        if log_every and ((i - 1) % log_every) == 0:
            dt = time.time() - t0
            rps = rays_done / max(dt, 1e-9)
            log_fn(f"step {base + i - 1:6d} loss {loss:.5f} "
                   f"rays/s {rps:,.0f}")
        if metrics is not None:
            metrics.append({"step": base + i - 1, "loss": loss,
                            "rays_per_sec": rays_done / max(
                                time.time() - t0, 1e-9)})

    for i in range(iters):
        idxs = selector.sample(n=n_views)
        camera = make_camera(idxs)
        if uv_select is not None:
            u, v = uv_select(rng, exp_masks[idxs[0]], crop_size)
        else:
            u, v = rand_uv(rng, size, size, crop_size)
        exp = jnp.asarray(exp_imgs[idxs, u:u + crop_size, v:v + crop_size, :3])
        mask = jnp.asarray(exp_masks[idxs, u:u + crop_size, v:v + crop_size])
        key, skey = jax.random.split(key)
        if light_update is not None:
            state = state._replace(
                params=light_update(state.params, camera, idxs))
        if mesh is not None:
            from ..parallel import shard_batch
            camera = shard_batch(camera, mesh, n_views)
            exp = shard_batch(exp, mesh, n_views)
            mask = shard_batch(mask, mesh, n_views)
        state, aux = step_fn(state, camera,
                             (jnp.float32(u), jnp.float32(v)), exp, mask,
                             skey)
        rays_done += n_views * crop_size * crop_size * bundle_size
        if pending is not None:
            resolve(pending, i)
        pending = (idxs, aux["loss"])

        if save_fn is not None and ckpt_freq and (i % ckpt_freq) == 0 and i:
            save_fn(state, base + i)
        if valid_fn is not None and valid_freq and (i % valid_freq) == 0:
            valid_fn(state, base + i)

    if pending is not None:
        resolve(pending, iters)
    return state, losses
