"""Direction <-> (elevation, azimuth) <-> uv conversions.

Behavioral parity: pytorch3d/pathtracer/utils.py:461-503.  These feed the
learned-occlusion MLP (direction conditioning) and the NeRF view-direction
encodings, so the clamping constants are kept identical.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math import nonzero_eps, normalize


def uv_to_elev_azim(uv: jax.Array) -> jax.Array:
    uv = jnp.clip(uv, -1.0 + 1e-7, 1.0 - 1e-7)
    u, v = uv[..., 0:1], uv[..., 1:2]
    elev = jnp.arcsin(v)
    azim = jnp.arctan2(u, jnp.sqrt(jnp.maximum(1.0 - u * u - v * v, 1e-8)))
    return jnp.concatenate([elev, azim], axis=-1)


def elev_azim_to_uv(elev_azim: jax.Array) -> jax.Array:
    elev, azim = elev_azim[..., 0:1], elev_azim[..., 1:2]
    u = jnp.cos(elev) * jnp.sin(azim)
    v = jnp.sin(elev)
    return jnp.concatenate([u, v], axis=-1)


def elev_azim_to_dir(elev_azim: jax.Array) -> jax.Array:
    limit = math.pi - 1e-7
    ea = jnp.clip(elev_azim, -limit, limit)
    elev, azim = ea[..., 0:1], ea[..., 1:2]
    return jnp.concatenate([
        jnp.sin(azim) * jnp.cos(elev),
        jnp.cos(azim) * jnp.cos(elev),
        jnp.sin(elev),
    ], axis=-1)


def dir_to_elev_azim(direction: jax.Array) -> jax.Array:
    d = jnp.clip(normalize(direction), -1.0 + 1e-7, 1.0 - 1e-7)
    x, z = d[..., 0:1], d[..., 2:3]
    elev = jnp.arcsin(z)
    azim = jnp.arctan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x - z * z, 1e-10)))
    return jnp.concatenate([elev, azim], axis=-1)


def uv_to_dir(uv: jax.Array) -> jax.Array:
    return elev_azim_to_dir(uv_to_elev_azim(uv))


def dir_to_uv(d: jax.Array) -> jax.Array:
    return elev_azim_to_uv(dir_to_elev_azim(d))
