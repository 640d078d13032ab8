"""Evaluation harness: held-out-view metrics.

Behavioral parity: test_nerf / test_dtu / test / test_nerv_ptl
(training_utils.py:302-344, 436-485, 487-534, 792-853): per-view average
L1, L2, PSNR and a set-level SSIM (tone-mapped MS-SSIM+SSIM for NeRV).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import mse2psnr
from ..ops.ssim import ms_ssim as ms_ssim_fn
from ..ops.ssim import ssim as ssim_fn
from ..render import pathtrace
from ..scene import Scene


def evaluate(scene: Scene, params: dict, make_camera: Callable,
             exp_imgs: np.ndarray, integrator, *, size: int,
             chunk_size: int = 64, bundle_size: int = 1,
             masks: Optional[np.ndarray] = None,
             tone_map: bool = False, with_ms_ssim: bool = False,
             key=None, light_update: Optional[Callable] = None,
             save_fn: Optional[Callable] = None, log_fn: Callable = print):
    """Render every view and compute L1/L2/PSNR per view + set-level SSIM.

    ``make_camera(i) -> camera`` for view i; ``exp_imgs [V, H, W, 3]``;
    optional ``masks [V, H, W]`` restrict the metrics (DTU-style).
    Returns a dict of floats.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    l1s, l2s, psnrs = [], [], []
    got_all, exp_all = [], []
    for i in range(len(exp_imgs)):
        camera = make_camera(i)
        if light_update is not None:
            params = light_update(params, camera, i)
        img, _ = pathtrace(scene, params, camera, integrator, size=size,
                           chunk_size=chunk_size, bundle_size=bundle_size,
                           background=0.0, key=jax.random.fold_in(key, i),
                           training=False, squeeze_first=True)
        got = np.clip(np.asarray(img)[..., :3], 0.0, 1.0)
        exp_raw = np.asarray(exp_imgs[i])[..., :3]
        # reference protocol: test_nerv_ptl clamps the GT for the per-view
        # L1/L2/PSNR ONLY (training_utils.py:810 exp_imgs[i].clamp(0,1));
        # test_nerf (:321-343) never clamps the GT; and BOTH build the
        # set-level SSIM/MS-SSIM stack from the RAW exp_imgs (:340, :836),
        # tone-mapping x/(1+x) in the NeRV case — so ``exp_all`` below
        # carries the unclamped GT
        exp = np.clip(exp_raw, 0.0, 1.0) if tone_map else exp_raw
        exp_set = exp_raw
        if masks is not None:
            # test_dtu (:467-474): got AND exp masked for the per-view
            # metrics and for the SSIM stack
            m = np.asarray(masks[i])[..., None]
            got = got * m
            exp = exp * m
            exp_set = exp_set * m
        l1 = float(np.mean(np.abs(got - exp)))
        l2 = float(np.mean((got - exp) ** 2))
        l1s.append(l1)
        l2s.append(l2)
        # clamp: an exactly-zero L2 (e.g. empty crops) would give inf PSNR
        psnrs.append(float(mse2psnr(jnp.asarray(max(l2, 1e-10)))))
        got_all.append(got)
        exp_all.append(exp_set)
        if save_fn is not None:
            save_fn(i, got)
        log_fn(f"view {i:3d} L1 {l1:.5f} L2 {l2:.6f} PSNR {psnrs[-1]:.3f}")

    got_n = np.stack(got_all)
    exp_n = np.stack(exp_all)
    if tone_map:
        got_n = got_n / (1.0 + got_n)
        exp_n = exp_n / (1.0 + exp_n)
    got_n = jnp.transpose(jnp.asarray(got_n), (0, 3, 1, 2))
    exp_n = jnp.transpose(jnp.asarray(exp_n), (0, 3, 1, 2))
    out = {
        "l1": float(np.mean(l1s)),
        "l2": float(np.mean(l2s)),
        "psnr": float(np.mean(psnrs)),
        "ssim": float(ssim_fn(got_n, exp_n, data_range=1.0)),
    }
    if with_ms_ssim:
        out["ms_ssim"] = float(ms_ssim_fn(got_n, exp_n, data_range=1.0))
    log_fn(f"avg L1 {out['l1']:.5f} L2 {out['l2']:.6f} "
           f"PSNR {out['psnr']:.3f} SSIM {out['ssim']:.4f}"
           + (f" MS-SSIM {out['ms_ssim']:.4f}" if with_ms_ssim else ""))
    return out
