"""Fragment blending — TPU-native counterpart of the reference's
csrc/blending (sigmoid_alpha_blend fwd/bwd, ext.cpp:45-46) and the
renderer-side hard/softmax blends that consume rasterizer fragments.

All blends are pure batched elementwise math on the ``[H, W, K]``
fragment buffers (VPU-friendly, differentiable by JAX AD — the csrc
hand-written backward is unnecessary).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .rasterize import Fragments


def hard_rgb_blend(colors: jax.Array, fragments: Fragments,
                   background: Tuple[float, float, float] = (1.0, 1.0, 1.0)
                   ) -> jax.Array:
    """Opaque blend: nearest fragment wins (renderer/blending.py
    hard_rgb_blend).  colors ``[H, W, K, 3]`` -> RGBA ``[H, W, 4]``."""
    valid = fragments.idx[..., 0] >= 0
    bg = jnp.asarray(background, colors.dtype)
    rgb = jnp.where(valid[..., None], colors[..., 0, :], bg)
    return jnp.concatenate(
        [rgb, valid[..., None].astype(colors.dtype)], axis=-1)


def sigmoid_alpha_blend(fragments: Fragments,
                        sigma: float = 1e-4) -> jax.Array:
    """Soft silhouette alpha (sigmoid_alpha_blend.cu): per fragment
    prob = sigmoid(-dist / sigma), alpha = 1 - prod_k (1 - prob_k).
    -> ``[H, W]``.  ``dists`` are the signed squared edge distances from
    :func:`rasterize_meshes` (negative inside)."""
    valid = fragments.idx >= 0
    prob = jax.nn.sigmoid(-fragments.dists / sigma)
    prob = jnp.where(valid, prob, 0.0)
    return 1.0 - jnp.prod(1.0 - prob, axis=-1)


def softmax_rgb_blend(colors: jax.Array, fragments: Fragments,
                      sigma: float = 1e-4, gamma: float = 1e-4,
                      background: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                      znear: float = 1.0, zfar: float = 100.0) -> jax.Array:
    """SoftRas aggregation (renderer/blending.py softmax_rgb_blend):
    coverage prob x depth softmax with a background weight.

    colors ``[H, W, K, 3]`` -> RGBA ``[H, W, 4]``.
    """
    eps = 1e-10
    valid = fragments.idx >= 0
    prob = jnp.where(valid, jax.nn.sigmoid(-fragments.dists / sigma), 0.0)
    alpha = 1.0 - jnp.prod(1.0 - prob, axis=-1)

    z_inv = jnp.where(valid, (zfar - fragments.zbuf) / (zfar - znear), 0.0)
    z_inv_max = jnp.maximum(jnp.max(z_inv, axis=-1, keepdims=True), eps)
    weights = prob * jnp.exp((z_inv - z_inv_max) / gamma)
    delta = jnp.exp((eps - z_inv_max[..., 0]) / gamma)
    denom = jnp.sum(weights, axis=-1) + delta
    bg = jnp.asarray(background, colors.dtype)
    rgb = (jnp.sum(weights[..., None] * colors, axis=-2)
           + delta[..., None] * bg) / denom[..., None]
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
