"""Remaining small utilities from the reference's grab-bag.

Behavioral parity: pytorch3d/pathtracer/utils.py —
  * cartesian_to_log_polar (:53-60), log_polar_indices (:65-82),
    cartesian_indices (:92-97) — partition helpers for partitioned
    auto-decoders
  * finite_diff_ray (:284-292) — orthogonally-jittered neighbor rays
  * edge_detection (:297-304) — 3x3 Laplacian edge filter
  * gaussian_kernel (:265-270) — 2D gaussian stencil
  * inverse_tan_activation (:262-263), crop (:372)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .math import nonzero_eps

PI = math.pi
TWO_PI = 2.0 * math.pi


def cartesian_to_log_polar(p: jax.Array, eps: float = 1e-6) -> jax.Array:
    r = jnp.maximum(jnp.sum(jnp.square(p), axis=-1, keepdims=True), eps)
    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    phi = jnp.arctan2(nonzero_eps(y, eps), nonzero_eps(x, eps))
    theta = jnp.arctan2(jnp.sqrt(jnp.maximum(x * x + y * y, eps)),
                        nonzero_eps(z, eps))
    return jnp.concatenate([jnp.log(r), phi, theta], axis=-1)


def log_polar_indices(lp: jax.Array, max_lr: float = 15.0, n_lr: int = 8,
                      n_phi: int = 8, n_theta: int = 8):
    """Bin log-polar coords; returns (integer bin indices, local coords)."""
    lr = jnp.clip(lp[..., 0:1], 0.0, max_lr)
    phi = jnp.clip(lp[..., 1:2] + PI, 0.0, TWO_PI)
    theta = jnp.clip(lp[..., 2:3] + PI, 0.0, TWO_PI)
    lr_idx = jnp.clip(lr * (n_lr / max_lr), 0, n_lr)
    phi_idx = jnp.clip(phi * (n_phi / TWO_PI), 0, n_phi)
    theta_idx = jnp.clip(theta * (n_theta / TWO_PI), 0, n_theta)
    idx = jnp.floor(jnp.concatenate([lr_idx, phi_idx, theta_idx],
                                    axis=-1)).astype(jnp.int32) - 1
    local = jnp.concatenate([
        lr - lr_idx * (max_lr / n_lr),
        phi - phi_idx * (PI / n_phi),
        theta - theta_idx * (PI / n_theta),
    ], axis=-1)
    return idx, local


def cartesian_indices(xyz: jax.Array, bound: float = 3.0, n: int = 8):
    """Bin xyz in [-bound, bound]^3; returns (int indices, local in [0,1))."""
    xyz = jnp.clip(xyz, -bound, bound) + bound
    inv = (n - 1) / (2.0 * bound)
    idx = jnp.clip((xyz * inv).astype(jnp.int32), 0, n - 1)
    local = xyz * inv - idx
    return idx, local


def finite_diff_ray(r_d: jax.Array, eps: float = 1e-5):
    """Two neighboring rays offset along directions orthogonal to ``r_d``."""
    x, y, z = r_d[..., 0:1], r_d[..., 1:2], r_d[..., 2:3]
    sign = jnp.sign(z)
    a = 1.0 / (-(sign + z) + 1e-5)
    b = x * y * a
    s = jnp.concatenate([x * x * a * sign + 1.0, b * sign, x * -sign],
                        axis=-1)
    t = jnp.concatenate([b, sign + y * y * a, -y], axis=-1)
    return r_d + s * eps, r_d + t * eps


def edge_detection(img: jax.Array) -> jax.Array:
    """3x3 Laplacian edge filter of an [H, W, C] image (valid conv)."""
    k = jnp.asarray([[-1.0, -1, -1], [-1, 8, -1], [-1, -1, -1]])
    c = img.shape[-1]
    x = jnp.transpose(img, (2, 0, 1))[None]           # [1, C, H, W]
    w = jnp.tile(k[None, None], (c, 1, 1, 1))
    out = lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)
    return jnp.transpose(out[0], (1, 2, 0))


def gaussian_kernel(n: int, sigma: float = 3.0) -> jax.Array:
    """(2n+1)^2 gaussian stencil normalized to sum 1."""
    coords = np.arange(-n, n + 1, dtype=np.float32)
    g = np.exp(-coords ** 2 / (2.0 * sigma ** 2))
    k = np.outer(g, g)
    return jnp.asarray(k / k.sum())


def inverse_tan_activation(x: jax.Array, eps: float = 1e-1) -> jax.Array:
    """[-1, 1] -> approximately unbounded via tan."""
    return jnp.tan(x * math.pi / (2.0 + eps))


def crop(img: jax.Array, u: int, v: int, size: int) -> jax.Array:
    return img[u:u + size, v:v + size]
