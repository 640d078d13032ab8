"""Sampling-space warps (unit square -> disk / sphere / hemisphere) + pdfs.

Behavioral parity: pytorch3d/pathtracer/warps.py:10-64 (Mitsuba warp ports).
All functions take uniform samples in ``[0, 1]^2`` in the last axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math import normalize


def circ(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(1.0 - jnp.square(x), 1e-10))


def square_to_uniform_disk_concentric(sample: jax.Array) -> jax.Array:
    """Shirley-Chiu concentric map; branchless/masked like the reference."""
    v = 2.0 * sample - 1.0
    is_zero = jnp.all(v == 0.0, axis=-1, keepdims=True)
    quadrant_1_or_3 = (jnp.abs(v[..., 0:1]) < jnp.abs(v[..., 1:2]))
    x, y = v[..., 0:1], v[..., 1:2]

    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)

    r_safe = jnp.sign(r) * jnp.maximum(jnp.abs(r), 1e-12)
    phi = 0.25 * math.pi * rp / r_safe
    phi = jnp.where(quadrant_1_or_3, 0.5 * math.pi - phi, phi)
    phi = jnp.where(is_zero, jnp.zeros_like(phi), phi)

    return jnp.concatenate([r * jnp.sin(phi), r * jnp.cos(phi)], axis=-1)


def square_to_uniform_sphere(sample: jax.Array) -> jax.Array:
    z = 1.0 - 2.0 * sample[..., 1]
    r = circ(z)
    tmp = 2.0 * math.pi * sample[..., 0] - math.pi
    return jnp.stack([r * jnp.cos(tmp), r * jnp.sin(tmp), z], axis=-1)


def square_to_uniform_sphere_pdf(sample: jax.Array) -> float:
    return 1.0 / (4.0 * math.pi)


def square_to_cos_hemisphere(sample: jax.Array) -> jax.Array:
    p = square_to_uniform_disk_concentric(sample)
    z = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(p * p, axis=-1, keepdims=True), 1e-7))
    return jnp.concatenate([p, z], axis=-1)


def square_to_cos_hemisphere_pdf(d: jax.Array) -> jax.Array:
    return d[..., 2] / math.pi


def random_on_sphere(key: jax.Array, batches: int, dtype=jnp.float32):
    """Uniform sphere directions plus the uv samples that generated them."""
    uv = jax.random.uniform(key, (batches, 2), dtype=dtype)
    u, v = uv[..., 0:1], uv[..., 1:2]
    theta = 2.0 * math.pi * u
    phi = jnp.arccos(jnp.clip(2.0 * v - 1.0, -1.0, 1.0))
    d = jnp.concatenate([
        jnp.sin(theta) * jnp.cos(phi),
        jnp.sin(theta) * jnp.sin(phi),
        jnp.cos(theta),
    ], axis=-1)
    return d, uv
