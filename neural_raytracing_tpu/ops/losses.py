"""Training losses.

Behavioral parity: ``masked_loss`` (pytorch3d/pathtracer/utils.py:306-359):
  * active pixels = throughput > 0 AND mask == 1
  * color loss = L1 + L2 + RMSE - log(SSIM) over the ACTIVE-masked images,
    where masking multiplies both prediction and target by the active mask
    and the means run over the FULL crop (reference uses F.l1_loss/F.mse_loss
    on the zeroed tensors)
  * optional Reinhard tone mapping x/(1+x) before the color terms
  * miss loss = BCE(-with-logits) of throughput vs mask over MISS pixels only
  * total = mask_weight * miss + 10 * color

JAX deviations from the reference, both jit-necessitated and behavior
preserving: the ``active.any()`` / ``misses.any()`` python branches become
masked means (a crop with zero active pixels contributes zero color loss,
exactly like the reference's skipped branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ssim import ssim as ssim_fn


def binary_cross_entropy_with_logits(logits, targets):
    # numerically stable log(1+exp(-|x|)) formulation
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def binary_cross_entropy(probs, targets, eps: float = 1e-12):
    probs = jnp.clip(probs, eps, 1.0 - eps)
    return -(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))


def masked_loss(got: jax.Array, exp: jax.Array, throughput: jax.Array,
                exp_mask: jax.Array, mask_weight: float = 1.0,
                with_logits: bool = True, tone_mapping: bool = False,
                with_ssim: bool = True) -> jax.Array:
    """Photometric + silhouette loss on an ``[N, W, H, 3]`` crop.

    ``throughput``/``exp_mask`` are ``[N, W, H]`` (logit alpha / binary mask).
    """
    active = (throughput > 0) & (exp_mask == 1)
    misses = ~active

    got_active = got * active[..., None]
    exp_active = exp * active[..., None]
    if tone_mapping:
        got_active = got_active / (1.0 + got_active)
        exp_active = exp_active / (1.0 + exp_active)

    l1_loss = jnp.mean(jnp.abs(got_active - exp_active))
    l2_loss = jnp.mean(jnp.square(got_active - exp_active))
    rmse_loss = jnp.sqrt(jnp.maximum(l2_loss, 1e-10))
    color_loss = l1_loss + l2_loss + rmse_loss
    if with_ssim:
        ssim_val = ssim_fn(
            jnp.transpose(got_active, (0, 3, 1, 2)),
            jnp.transpose(exp_active, (0, 3, 1, 2)),
            data_range=1.0)
        color_loss = color_loss - jnp.log(jnp.maximum(ssim_val, 1e-10))
    # a crop with no active pixels contributes no color loss (reference skips
    # the branch entirely in that case)
    any_active = jnp.any(active)
    color_loss = jnp.where(any_active, color_loss, 0.0)

    if with_logits:
        bce = binary_cross_entropy_with_logits(throughput, exp_mask)
    else:
        bce = binary_cross_entropy(throughput, exp_mask)
    miss_count = jnp.sum(misses)
    mask_loss = jnp.sum(jnp.where(misses, bce, 0.0)) / jnp.maximum(miss_count, 1)

    return mask_weight * mask_loss + 10.0 * color_loss
