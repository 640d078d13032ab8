"""Point-splat compositing — TPU-native counterpart of
pytorch3d/csrc/compositing (accum_alphacomposite / accum_weightedsum /
accum_weightedsumnorm + backwards, ext.cpp:49-54).

The csrc kernels walk the K fragment list per pixel accumulating
front-to-back; here the walk is an exclusive cumprod over the K axis —
one fused elementwise expression, differentiable by JAX AD.  (This is the
POINT-SPLAT compositing; the volumetric ray compositing the NeRF path
uses lives in ``kernels/composite.py`` as a Pallas kernel.)

Layout: idx ``[H, W, K]`` int32 (-1 = empty, as produced by
``rasterize_points``), alphas ``[H, W, K]``, features ``[P, C]``
-> image ``[H, W, C]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather(features: jax.Array, idx: jax.Array) -> jax.Array:
    safe = jnp.maximum(idx, 0)
    f = features[safe]                                    # [H, W, K, C]
    return jnp.where((idx >= 0)[..., None], f, 0.0)


def _masked_alpha(alphas: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.where(idx >= 0, alphas, 0.0)


def alpha_composite(features: jax.Array, alphas: jax.Array,
                    idx: jax.Array) -> jax.Array:
    """Front-to-back over blend: out = sum_k a_k prod_{j<k}(1-a_j) f_k
    (alpha_composite.cu accumulation rule)."""
    a = _masked_alpha(alphas, idx)
    trans = jnp.cumprod(1.0 - a, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    w = a * trans
    return jnp.sum(w[..., None] * _gather(features, idx), axis=-2)


def weighted_sum(features: jax.Array, alphas: jax.Array,
                 idx: jax.Array) -> jax.Array:
    """Plain weighted sum (weighted_sum.cu): out = sum_k a_k f_k."""
    a = _masked_alpha(alphas, idx)
    return jnp.sum(a[..., None] * _gather(features, idx), axis=-2)


def norm_weighted_sum(features: jax.Array, alphas: jax.Array,
                      idx: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Normalized weighted sum (weighted_sum_norm accumulation):
    out = sum_k a_k f_k / max(sum_k a_k, eps)."""
    a = _masked_alpha(alphas, idx)
    denom = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), eps)
    return jnp.sum((a / denom)[..., None] * _gather(features, idx),
                   axis=-2)
